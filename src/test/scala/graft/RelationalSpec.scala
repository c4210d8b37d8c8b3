package graft

import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // queries whose correct result CAN be empty at tiny scale factors
  // q224: the sf0.001 co-supply graph is too sparse for any non-edge
  // pair to share 2 capped common neighbors (137 rows at sf0.01)
  val mayBeEmpty = Set("q12_anti_join", "q35_fingerprint_clusters",
    "q224_link_prediction")
  // non-SQL-expressible operators checked rows-only by the driver
  val rowsOnly = Set("q42_knn_ivf", "q52_embed_neardup_bucketed",
    "q55_cardinality_profile", "q56_key_skew_profile")

  test("every query runs and returns a non-degenerate result") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      if (!mayBeEmpty(name)) assert(df.count() > 0, name)
    }
  }

  test("every query carries a bench family") {
    val unfam = SparkEntry.queryFamilies.collect {
      case (n, "unclassified") => n
    }
    assert(unfam.isEmpty, s"unclassified queries: ${unfam.toSeq.sorted}")
    assert(SparkEntry.queryFamilies.keySet === SparkEntry.queries.keySet)
  }

  test("every query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("topk is exactly k and sorted") {
    val rows = operators.Relational.topkOrders(spark, sf).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getLong(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("cube emits all four grouping sets and a consistent grand total") {
    val rows = graft.operators.Relational.cubePricing(spark, sf).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    val total = graft.sources.Tables.lineitem(spark, sf).count()
    assert(byGid(3L).map(_.getAs[Long]("n_rows")).sum == total,
      "grand-total grouping set covers every row")
    assert(byGid(0L).map(_.getAs[Long]("n_rows")).sum == total,
      "finest grouping set covers every row")
  }

  test("ntile quartiles are balanced within one row per nation") {
    val rows = graft.operators.Relational.ntileBalanceQuartiles(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getAs[Long]("n_customers"),
        r.getAs[Long]("max_bal_c"), r.getAs[Long]("min_bal_c")))
    rows.groupBy(_._1).foreach { case (nation, qs) =>
      val sizes = qs.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"nation $nation: $sizes")
      assert(qs.forall(q => q._4 >= q._5))
      // quartile 1 holds the highest balances
      val sorted = qs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(hi, lo) => assert(hi._5 >= lo._4 - 0,
          s"nation $nation quartiles must be value-ordered")
        case _ =>
      }
    }
  }

  test("session conversion conserves q46's session count") {
    val sessions = graft.operators.AsOf.sessionizeEvents(spark, sf).count()
    val rows = graft.operators.AsOf.sessionConversion(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_sessions")).sum == sessions)
    rows.foreach { r =>
      val (n, c) = (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_converting"))
      assert(c <= n)
      assert(r.getAs[Long]("conv_ppm") == c * 1000000L / n)
    }
  }

  test("latest-per-group window agrees with max-join on keys") {
    val byJoin = operators.Relational.latestOrderPerCustomer(spark, sf)
      .select("o_custkey", "od_epoch").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val byWin = operators.Relational.latestOrderPerCustomerWindow(spark, sf)
      .select("o_custkey", "od_epoch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byJoin == byWin)
  }

  test("q192 fulfillment deciles: histogram form replays the q71 position rule") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 11 orders with latency 0..10 days → pos_k = k+1 → decile k = k days;
    // order 9 ships twice (day 3 and day 9): latency is the MAX
    val orders = (0L to 10L).map(i => (i, "P", "1995-01-01"))
      .toDF("o_orderkey", "o_orderpriority", "d")
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_timestamp(col("d")).as("o_orderdate"))
    val li = ((0L to 10L).map(i => (i, f"1995-01-${i + 1}%02d")) :+
      ((9L, "1995-01-04")))
      .toDF("l_orderkey", "d")
      .select(col("l_orderkey"), to_timestamp(col("d")).as("l_shipdate"))
    val out = graft.operators.Relational.fulfillmentDecilesFor(orders, li)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == (1L to 9L).map(k => k -> k).toMap)
  }

  test("q204 mass deciles: a heavy tail owns every mass decile") {
    import spark.implicits._
    // 9 docs of length 1 + 1 doc of length 91: mass 100, every decile
    // position (10..90) falls inside the long doc's mass
    val docs = ((1L to 9L).map(i => (i, 1L)) :+ ((10L, 91L)))
      .toDF("doc_id", "n_chars")
    val out = graft.operators.TextOps.massWeightedDecilesFor(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == 9)
    (1L to 9L).foreach(k => assert(out(k) == ((91L, 100L)), s"decile $k"))
  }

  test("q205 bounded-heap top-k agrees with the window form, ties to low id") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = graft.operators.Relational.topCustomersPerNation(spark, sf)
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val perCust = graft.sources.Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(graft.operators.Determinism.cents(col("o_totalprice")))
        .as("rev_c"))
      .join(graft.sources.Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
    val ref = perCust.withColumn("rn", row_number().over(
        Window.partitionBy(col("c_nationkey"))
          .orderBy(col("rev_c").desc, col("o_custkey").asc)))
      .filter(col("rn") <= 3)
      .collect().map(r =>
        (r.getAs[Number]("c_nationkey").longValue,
          r.getAs[Number]("rn").longValue) ->
        (r.getAs[Long]("o_custkey"), r.getAs[Long]("rev_c"))).toMap
    assert(got == ref)
  }

  test("q206 manifests are numerically sorted and sized") {
    val rows = graft.operators.Relational.orderPartManifest(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = r.getString(2).split(",").map(_.toLong).toSeq
      assert(parts.size.toLong == r.getLong(1))
      assert(parts == parts.sorted)
    }
  }

  test("q193 small lots: exact-integer 0.2-average cut on a hand part") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // part 1: qty cents {1, 1, 100} → qty·15 < 102 keeps the two 1s
    val li = Seq(
      (1L, 0.01, 10.0), (1L, 0.01, 20.0), (1L, 1.00, 500.0),
      // part 2: all equal quantities — nothing is below 20% of avg
      (2L, 0.50, 99.0), (2L, 0.50, 99.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val r = graft.operators.Relational.belowAvgPartsFor(li).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3000L, 2L, 1L)))
  }

  test("q217 weekly top-k drift carries prior-week rank memory") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val li = Seq((0L, 1L, 30.0), (0L, 2L, 20.0), (0L, 3L, 10.0),
      (1L, 1L, 10.0), (1L, 2L, 40.0), (1L, 4L, 5.0))
      .toDF("week", "l_partkey", "l_quantity")
      .select(to_timestamp(col("week") * 604800L + 100L).as("l_shipdate"),
        col("l_partkey"), col("l_quantity"))
    val out = graft.operators.Relational.weeklyTopkDriftFor(spark, li)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5))))
      .toMap
    // week 0: everything is new (−1 sentinel, delta 0)
    assert(out((0L, 1L)) == ((1L, -1L, 0L)))
    assert(out((0L, 2L)) == ((2L, -1L, 0L)))
    assert(out((0L, 3L)) == ((3L, -1L, 0L)))
    // week 1: part 2 rose 2→1, part 1 fell 1→2, part 4 entered
    assert(out((1L, 1L)) == ((2L, 2L, 1L)))
    assert(out((1L, 2L)) == ((1L, 1L, -1L)))
    assert(out((1L, 3L)) == ((4L, -1L, 0L)))
    assert(out.size == 6)
  }
}
