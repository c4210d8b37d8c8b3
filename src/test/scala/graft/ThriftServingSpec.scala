package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.serving.ThriftServing

/** End-to-end serving parity: register a table in the engine catalog,
  * start the thrift endpoint, and query it back over plain HiveServer2
  * JDBC — the exact client path the reference dashboard uses
  * (`dashboard/services/hive_gpt.py:34-41`).
  */
class ThriftServingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  test("JDBC client reads engine catalog tables over thrift") {
    // a persistent external table, not a temp view: thrift serves each
    // JDBC connection from its own session, and only catalog tables are
    // visible across sessions — the same registration path the lake uses
    spark.sql("DROP TABLE IF EXISTS nation_served")
    spark.sql(
      "CREATE TABLE nation_served USING PARQUET " +
        "LOCATION '/root/testdata/sf0.001/nation.parquet'")
    val endpoint = ThriftServing.start(spark, port = 0)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // the server's services come up asynchronously after start returns
      val conn = retry(20, 500) {
        DriverManager.getConnection(endpoint.jdbcUrl, "anonymous", "")
      }
      try {
        val rs = conn.createStatement().executeQuery(
          "SELECT n_regionkey, count(*) AS n FROM nation_served " +
            "GROUP BY n_regionkey ORDER BY n_regionkey")
        val rows = Iterator.continually(rs)
          .takeWhile(_.next()).map(r => (r.getInt(1), r.getLong(2))).toList
        assert(rows == List((0, 5), (1, 5), (2, 5), (3, 5), (4, 5)))

        // DDL over the wire hits the same catalog the engine sees
        val rs2 = conn.createStatement().executeQuery("SHOW TABLES")
        val tables = Iterator.continually(rs2)
          .takeWhile(_.next()).map(_.getString(2)).toList
        assert(tables.contains("nation_served"))
      } finally conn.close()
    } finally endpoint.close()
  }

  private def retry[A](attempts: Int, sleepMs: Long)(f: => A): A =
    try f catch {
      case e: Throwable if attempts > 1 =>
        Thread.sleep(sleepMs); retry(attempts - 1, sleepMs)(f)
    }
}
