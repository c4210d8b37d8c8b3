package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusPrep, TrainingExport}
import graft.sources.Tables

/** Coverage for the training-export endgame (q151): token conservation
  * through the chain, the closed-form packing law, shard stability, and
  * the atomic commit round trip.
  */
class TrainingExportSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  test("q151 conserves the survivors' token mass exactly") {
    val survTok = TrainingExport.survivorTokens(Tables.documents(spark, sf))
      .agg(sum(col("n_tokens"))).head.getLong(0)
    val manifestTok = TrainingExport.exportManifest(spark, sf)
      .agg(sum(col("n_tokens"))).head.getLong(0)
    assert(manifestTok == survTok, "packing must not create or drop tokens")
  }

  test("packing law: every sequence is full except each source's last") {
    val seqs = TrainingExport.exportSequences(Tables.documents(spark, sf))
    val bad = seqs
      .withColumn("max_seq", max(col("seq"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
      .filter(
        (col("seq") < col("max_seq") && col("n_tok") =!= CorpusPrep.PackBudget) ||
        col("n_tok") <= 0L || col("n_tok") > CorpusPrep.PackBudget)
      .count()
    assert(bad == 0L)
    // fill can never exceed the budget
    val overfull = TrainingExport.exportManifest(spark, sf)
      .filter(col("fill_ppm") > 1000000L).count()
    assert(overfull == 0L)
  }

  test("shard assignment is stable across reruns (incremental-append safety)") {
    val a = TrainingExport.exportSequences(Tables.documents(spark, sf))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val b = TrainingExport.exportSequences(Tables.documents(spark, sf))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(a == b)
  }

  test("commitExport round trip: committed shards equal the sequence relation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString
    val paths = TrainingExport.commitExport(spark, sf, dir)
    assert(paths.nonEmpty)
    val back = spark.read.option("basePath", dir).parquet(paths.values.toSeq: _*)
      .select("source", "seq", "n_tok")
      .collect().map(_.toSeq).toSet
    val expect = TrainingExport.exportSequences(Tables.documents(spark, sf))
      .select("source", "seq", "n_tok")
      .collect().map(_.toSeq).toSet
    assert(back == expect)
  }

  test("q165 interleave is a collision-free round-robin, stable across reruns") {
    val rows = TrainingExport.interleaveOrder(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // global positions are unique (a loader can sort by them alone)
    assert(rows.map(_._4).distinct.length === rows.length)
    // round-robin law: pos ≡ src_idx (mod n_sources), rank = pos div n
    val sources = rows.map(_._2).distinct.sorted
    val idx = sources.zipWithIndex.toMap
    val n = sources.length.toLong
    rows.foreach { case (_, src, rank, pos) =>
      assert(pos % n === idx(src).toLong, s"$src slot")
      assert(pos / n === rank, s"$src rank")
    }
    // ranks are contiguous per source (0..count-1)
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (0L until rs.length.toLong),
        s"$src ranks")
    }
    // rerun yields the identical order
    val again = TrainingExport.interleaveOrder(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    rows.foreach { case (id, _, _, pos) => assert(again(id) === pos) }
  }
}
