package graft
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val sf = "/root/testdata/sf0.01"
    println("=== q02 scan_filter_project ===")
    operators.Relational.scanFilterProject(spark, sf).explain("formatted")
    println("=== q04 region_revenue ===")
    operators.Relational.regionRevenue(spark, sf).explain("formatted")
    println("=== q06 latest window ===")
    operators.Relational.latestOrderPerCustomerWindow(spark, sf).explain()
    spark.stop()
  }
}
