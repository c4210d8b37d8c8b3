package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.HeaderFlatten
import graft.ingest.HeaderFlatten.Merge
import graft.operators.{Profiler, SkewJoin}

class IngestProfilerSpec extends AnyFunSuite {

  // --- HeaderFlatten (S4/P8/P9/P10/P11) ---

  test("merged-cell fill propagates top-left value across the region") {
    val grid = Vector(
      Vector("A", "", "", "B"),
      Vector("x", "y", "", ""))
    val filled = HeaderFlatten.fillMerged(grid,
      Seq(Merge(0, 0, 0, 2), Merge(1, 1, 1, 2)))
    assert(filled(0) == Vector("A", "A", "A", "B"))
    assert(filled(1) == Vector("x", "y", "y", ""))
  }

  test("multi-row header flattens with _ join and consecutive dedup") {
    val grid = Vector(
      Vector("fund", "fund", "admin"),
      Vector("fund", "wifi", "admin"),
      Vector("", "grant", "salary"),
      Vector("", "", ""))
    val names = HeaderFlatten.flattenHeader(grid, headerRows = 4)
    assert(names == Vector("fund", "fund_wifi_grant", "admin_salary"))
  }

  test("duplicate column names get _N suffixes") {
    assert(HeaderFlatten.dedupeNames(Vector("a", "b", "a", "a")) ==
      Vector("a", "b", "a_2", "a_3"))
  }

  test("Thai month and type mapping with passthrough") {
    assert(HeaderFlatten.mapThaiMonth("ตค66") == "2023-10")
    assert(HeaderFlatten.mapThaiMonth("กย67") == "2024-09")
    assert(HeaderFlatten.mapThaiMonth("มค67") == "2024-01")
    assert(HeaderFlatten.mapThaiMonth("not-a-month") == "not-a-month")
    assert(HeaderFlatten.mapType("ยอดงบประมาณ") == "budget")
    assert(HeaderFlatten.mapType("ยอดใช้ไป") == "spent")
    assert(HeaderFlatten.mapType("other") == "other")
  }

  test("forward fill and all-null column drop") {
    assert(HeaderFlatten.forwardFill(Vector(None, Some("a"), None, Some("b"), None))
      == Vector(None, Some("a"), Some("a"), Some("b"), Some("b")))
    val (h, rows) = HeaderFlatten.dropAllNullColumns(
      Vector("a", "empty", "b"),
      Vector(Vector("1", "", "2"), Vector("3", " ", "4")))
    assert(h == Vector("a", "b"))
    assert(rows == Vector(Vector("1", "2"), Vector("3", "4")))
  }

  // --- Profiler / SkewJoin (100 TB tooling) ---

  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  test("cardinality profile: HLL estimates within rsd of exact") {
    val row = Profiler.cardinalityProfile(spark, sf, "orders").collect()(0)
    val nRows = row.getLong(0)
    assert(nRows == 1500)
    val ndvCust = row.getLong(row.fieldIndex("ndv_o_custkey"))
    import org.apache.spark.sql.functions._
    val exact = graft.sources.Tables.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(math.abs(ndvCust - exact).toDouble / exact < 0.15,
      s"hll=$ndvCust exact=$exact")
  }

  test("checked profile: an all-NULL column reports ndv 0 and hll_ok true") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k")
      .withColumn("dead", lit(null).cast("string"))
    val row = Profiler.cardinalityProfileCheckedFor(df).collect()(0)
    assert(row.getLong(row.fieldIndex("n_rows")) == 3)
    assert(row.getLong(row.fieldIndex("ndv_id")) == 3)
    assert(row.getLong(row.fieldIndex("ndv_k")) == 2)
    // COUNT(DISTINCT dead) = 0, and the HLL estimate of all-null is also
    // 0 — the pivot's NULL cell must not leak through as NULL/NULL
    assert(row.getLong(row.fieldIndex("ndv_dead")) == 0)
    assert(row.getBoolean(row.fieldIndex("hll_ok_dead")))
  }

  test("key skew profile surfaces the hot key") {
    import spark.implicits._
    val skewed = (Seq.fill(1000)("hot") ++ (1 to 100).map(i => s"k$i"))
      .toDF("k")
    val prof = Profiler.keySkewProfile(skewed, "k").collect()(0)
    assert(prof.getLong(prof.fieldIndex("max_n")) == 1000)
    assert(prof.getLong(prof.fieldIndex("n_keys")) == 101)
    // sketch half: 100 keys at n=1, one at n=1000 — p50 exact-ish, p99
    // within GK accuracy of either tail value
    val qs = Profiler.keySkewQuantiles(skewed, "k").collect()(0)
    assert(qs.getLong(qs.fieldIndex("p50_n")) == 1)
    assert(Set(1L, 1000L).contains(qs.getLong(qs.fieldIndex("p99_n"))))
    // q80 audit form: 101 sorted counts [1×100, 1000] — p50 at rank 51
    // is 1, p99 at rank 100 is 1, and the GK answers sit inside their
    // rank-error contract
    val chk = Profiler.keySkewQuantilesChecked(skewed, "k").collect()(0)
    assert(chk.getLong(chk.fieldIndex("p50_n")) == 1)
    assert(chk.getLong(chk.fieldIndex("p99_n")) == 1)
    assert(chk.getBoolean(chk.fieldIndex("gk_ok")))
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    val fact = ((1 to 2000).map(i => ("hot", i)) ++
      (1 to 200).map(i => (s"k${i % 20}", i))).toDF("k", "v")
    val dim = (Seq("hot") ++ (0 until 20).map(i => s"k$i"))
      .zipWithIndex.toDF("k", "attr")
    val plain = fact.join(dim, "k").select("k", "v", "attr").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val salted = SkewJoin.saltedJoin(fact, dim, "k", saltBy = Seq("v"))
      .select("k", "v", "attr").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(salted == plain)
  }

  test("q240 salt planner: heavy key gets its ceil factor, light keys 1") {
    val spark = GraftSession.local(4)
    import spark.implicits._
    // key 1 holds 60% of 100 rows → heavy, factor ceil(600000/10000)=60;
    // singles hold 1% each → not heavy, factor 1; top-10 = {1, 2..10}
    val facts = (Seq.fill(60)(1L) ++ (2L to 41L)).toDF("k")
    val out = SkewJoin.saltPlannerFor(facts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getBoolean(4), r.getLong(5))).sortBy(_._1)
    assert(out.map(_._1).toSeq == (1L to 10L))
    assert(out.head == ((1L, 60L, 600000L, true, 60L)))
    assert(out.tail.forall { case (_, c, s, h, f) =>
      c == 1L && s == 10000L && !h && f == 1L })
  }
}
