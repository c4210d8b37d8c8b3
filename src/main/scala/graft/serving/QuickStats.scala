package graft.serving

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference dashboard's golden serving queries (SURVEY §3.3 —
  * `dashboard/components/sidebar.py`), as library operators over the
  * curated long table (`date, details, year, category, amount`), plus the
  * 300-second TTL result cache of the sidebar (Q7 — `@st.cache_data`).
  */
class QuickStats(spark: SparkSession, curatedDir: String,
    ttlSeconds: Long = 300, clock: () => Long = () => System.currentTimeMillis()) {

  private def long(): DataFrame = spark.read.parquet(curatedDir)

  /** `SELECT DISTINCT year ORDER BY year DESC` (A4/O2). */
  def availableYears(): Seq[Int] = cached("years") {
    long().select(col("year")).distinct()
      .orderBy(col("year").desc).collect().map(_.getInt(0)).toSeq
  }

  final case class Totals(budget: Double, spent: Double) {
    /** Derived metrics (A7 — `dashboard/components/sidebar.py:117-119`). */
    def remaining: Double = budget - spent
    def percentUsed: Double = if (budget == 0) 0 else spent / budget * 100
  }

  /** Filtered global sums (A2): total budget = the all-year-budget
    * sentinel row; total spent = every spent row.
    */
  def totals(year: Int): Totals = cached(s"totals:$year") {
    val row = long().filter(col("year") === year).agg(
      sum(when(col("details") === "budget" &&
        col("date") === "all-year-budget", col("amount")).otherwise(0.0)),
      sum(when(col("details") === "spent", col("amount")).otherwise(0.0))
    ).collect()(0)
    Totals(
      if (row.isNullAt(0)) 0.0 else row.getDouble(0),
      if (row.isNullAt(1)) 0.0 else row.getDouble(1))
  }

  /** Latest remaining per category (J1 — the canonical latest-per-group
    * read of the non-additive `remaining` measure): inner join to
    * `SELECT category, MAX(date) GROUP BY category`, exactly the blessed
    * pattern of `dashboard/components/sidebar.py:44-62`.
    */
  def latestRemaining(year: Int): DataFrame = {
    val rem = long().filter(col("year") === year &&
      col("details") === "remaining" && col("date").rlike("^\\d{4}-\\d{2}$"))
    val latest = rem.groupBy(col("category")).agg(max(col("date")).as("date"))
    rem.join(latest, Seq("category", "date"))
      .select(col("category"), col("date"), col("amount"))
  }

  /** Negative-remaining screen (A8): categories overspent as of their
    * latest month, worst first.
    */
  def negativeCategories(year: Int): Seq[(String, Double)] =
    cached(s"neg:$year") {
      latestRemaining(year)
        .filter(col("amount") < 0)
        .orderBy(col("amount").asc)
        .collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    }

  // --- TTL cache (Q7) ---
  private val cache = new ConcurrentHashMap[String, (Long, Any)]()

  private def cached[T](key: String)(f: => T): T = {
    val now = clock()
    val hit = cache.get(key)
    if (hit != null && now - hit._1 < ttlSeconds * 1000) hit._2.asInstanceOf[T]
    else {
      val v = f
      cache.put(key, (now, v))
      v
    }
  }

  def invalidate(): Unit = cache.clear()
}
