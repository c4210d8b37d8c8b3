package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/** `SparkSessionExtensions` installer for the engine's native
  * expressions — the standard deployment hook
  * (`spark.sql.extensions=graft.functions.GraftExtensions` on
  * spark-submit, or `.withExtensions(new GraftExtensions)` on a
  * builder, which [[graft.GraftSession]] does). Unlike the per-session
  * `ensureRegistered` temp-function path, extension-injected functions
  * exist in EVERY session derived from the context — including the
  * sessions the Thrift server spawns per JDBC connection, so external
  * SQL clients can call `graft_quantized_dot` & co directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(ext.injectFunction)
    // conf-gated (spark.graft.rangeJoin.binSize): rescues plain
    // point-in-interval theta joins from nested-loop plans
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
