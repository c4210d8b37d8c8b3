package graft.serving

import java.net.ServerSocket

import org.apache.hive.service.server.HiveServer2
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

/** External SQL endpoint: the reference dashboard speaks HiveServer2
  * thrift to the warehouse (`dashboard/services/hive_gpt.py:34-41`,
  * `docker-compose.yaml:182-195`). The Spark-native equivalent is the
  * built-in Thrift JDBC/ODBC server started over the engine's own
  * session, so every table registered by [[graft.lake.Catalog]] is
  * immediately queryable by any HiveServer2/JDBC client — same wire
  * protocol the reference serves, no separate Hive deployment.
  *
  * At scale this is the right topology too: the thrift server shares the
  * SparkSession (and thus cluster resources, AQE, and the catalog) with
  * the batch engine, so a dashboard query is just another Spark job over
  * the same partitioned parquet — no second metastore to drift.
  */
object ThriftServing {

  /** A running thrift endpoint bound to `port`. (Held as the public
    * `HiveServer2` supertype — Spark's `HiveThriftServer2` subclass is
    * `private[hive]` as a Scala type.)
    */
  final class Endpoint private[ThriftServing] (
      server: HiveServer2, val port: Int) extends AutoCloseable {
    def jdbcUrl: String = s"jdbc:hive2://localhost:$port/default"
    override def close(): Unit = server.stop()
  }

  /** Start the HiveServer2-compatible endpoint on `port` (0 = pick a free
    * ephemeral port first). Serves the session's current catalog.
    */
  def start(spark: SparkSession, port: Int = 10000): Endpoint = {
    val bound = if (port == 0) freePort() else port
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", "localhost")
    spark.sqlContext.setConf("hive.server2.thrift.port", bound.toString)
    val server = HiveThriftServer2.startWithContext(spark.sqlContext)
    new Endpoint(server, bound)
  }

  private def freePort(): Int = {
    val s = new ServerSocket(0)
    try s.getLocalPort finally s.close()
  }
}
