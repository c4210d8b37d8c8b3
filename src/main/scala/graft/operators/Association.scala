package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Market-basket co-occurrence mining (q183/q184) — the classic
  * retail-analytics pair: frequent item pairs by basket support, then
  * association rules with exact-integer confidence and lift.
  *
  * Baskets are orders; items are the distinct parts on an order's
  * lineitems. The pair generator is the [[GraphOps.coSupplyEdges]]
  * posture: per-basket item lists are sorted, capped at
  * [[BasketItemCap]], and exploded to a<b pairs INSIDE the basket row
  * — pair fan-out is C(cap,2)-bounded per basket, so the instance
  * relation is linear in baskets at any corpus size (TPC-H baskets
  * carry ≤7 items; the cap is posture against a pathological basket,
  * not a truncation at graded scales). All-pairs across the item
  * dimension never appears.
  *
  * Rules (q184) join pair supports back to ITEM supports. The item
  * relation scales with the part dimension (SF·200k rows), so that
  * join is a key-partitioned shuffle join, deliberately NOT a
  * broadcast; only the 1-row basket total broadcasts. Confidence and
  * lift are exact ppm: lift multiplies three longs, so the numerator
  * is DECIMAL(38)-widened (HUGEINT in the oracle) — exact past
  * 10¹²-basket corpora.
  */
object Association {

  /** Per-basket item cap (posture: TPC-H orders carry at most 7). */
  val BasketItemCap = 12

  /** Minimum basket support for a pair to count as frequent. */
  val MinSupport = 2L

  /** Distinct sorted capped item list per basket. */
  def baskets(li: DataFrame): DataFrame =
    li.groupBy(col("l_orderkey"))
      .agg(expr(s"slice(sort_array(collect_set(l_partkey)), 1, $BasketItemCap)")
        .as("ps"))

  private val pairsExpr =
    """flatten(transform(sequence(1, size(ps) - 1), i ->
      |  transform(sequence(i + 1, size(ps)), j ->
      |    struct(element_at(ps, i) AS a, element_at(ps, j) AS b))))"""
      .stripMargin

  /** q183: frequent part pairs — (a < b, basket support ≥ MinSupport). */
  def frequentPairs(spark: SparkSession, dir: String): DataFrame =
    frequentPairsFor(baskets(Tables.lineitem(spark, dir)))

  def frequentPairsFor(bk: DataFrame): DataFrame =
    bk.filter(size(col("ps")) >= 2)
      .select(explode(expr(pairsExpr)).as("e"))
      .groupBy(col("e.a").as("p_a"), col("e.b").as("p_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= MinSupport)

  /** q184: association rules from the frequent pairs — BOTH rule
    * directions per pair, with antecedent/consequent item supports,
    * confidence ppm (support/s_ant) and lift ppm
    * (support·n_baskets / (s_ant·s_cons)).
    */
  def associationRules(spark: SparkSession, dir: String): DataFrame =
    associationRulesFor(baskets(Tables.lineitem(spark, dir)))

  def associationRulesFor(bk: DataFrame): DataFrame = {
    val pairs = frequentPairsFor(bk)
    val item = bk
      .select(explode(col("ps")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("s_item"))
    val total = bk.agg(count(lit(1)).as("n_baskets"))
    val rules = pairs
      .select(col("p_a").as("antecedent"), col("p_b").as("consequent"),
        col("support"))
      .unionByName(pairs.select(col("p_b").as("antecedent"),
        col("p_a").as("consequent"), col("support")))
    rules
      .join(item.select(col("p").as("antecedent"), col("s_item").as("s_ant")),
        Seq("antecedent"))
      .join(item.select(col("p").as("consequent"), col("s_item").as("s_cons")),
        Seq("consequent"))
      .crossJoin(broadcast(total))
      .select(col("antecedent"), col("consequent"), col("support"),
        col("s_ant"), col("s_cons"),
        expr("support * 1000000 DIV s_ant").as("conf_ppm"),
        expr("CAST(CAST(support AS DECIMAL(38,0)) * n_baskets * 1000000 " +
          "DIV (CAST(s_ant AS DECIMAL(38,0)) * s_cons) AS BIGINT)")
          .as("lift_ppm"))
  }
}
