package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake.{AtomicPartitionWriter, LakeFs}
import graft.operators.CurationPipeline

/** End-to-end drive of the composed curation endgame (q140): dedup
  * survivors → span scrub → token-budget selection, the ledger
  * classifying every document, the kept corpus COMMITTED atomically per
  * split through the swap protocol, and the published report consistent
  * with the committed artifact. The constituent operators are each
  * oracle-graded (q87/q91/q94/q95); this spec grades the COMPOSITION —
  * the production run a curation team actually ships.
  */
class CurationEndgameSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(8)
  val sf = "/root/testdata/sf0.01"
  val sfSmall = "/root/testdata/sf0.001"

  test("endgame ledger partitions the corpus; report aggregates it exactly") {
    val ledger = CurationPipeline.endgameLedger(spark, sf).cache()
    try {
      // every scored doc classified exactly once, into the four statuses
      val statuses = ledger.select("status").distinct()
        .collect().map(_.getString(0)).toSet
      assert(statuses.subsetOf(Set(
        "removed_dup", "removed_budget", "kept_trimmed", "kept_clean")))
      assert(ledger.groupBy("doc_id").count()
        .filter(col("count") > 1).count() == 0, "one ledger row per doc")
      // removed docs spend nothing; kept docs spend their scrubbed mass
      assert(ledger.filter(col("status").startsWith("removed"))
        .filter(col("tok_after") =!= 0).count() == 0)
      assert(ledger.filter(col("status").startsWith("kept"))
        .filter(col("tok_after") =!= col("n_scrubbed")).count() == 0)
      // kept_trimmed ⇔ the scrub touched it
      assert(ledger.filter(col("status") === "kept_trimmed")
        .filter(col("n_covered") <= 0).count() == 0)
      assert(ledger.filter(col("status") === "kept_clean")
        .filter(col("n_covered") =!= 0).count() == 0)
      // the report is exactly the ledger rollup
      val report = CurationPipeline.endgameReport(spark, sf)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val rolled = ledger.groupBy("status")
        .agg(count(lit(1)).as("n"), sum("n_tok").as("b"), sum("tok_after").as("a"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(report == rolled)
    } finally ledger.unpersist()
  }

  test("commitEndgame writes exactly the kept docs, atomically per split") {
    val tableDir = Files.createTempDirectory("graft-endgame").toString
    val committed = CurationPipeline.commitEndgame(spark, sf, tableDir)
    assert(committed.keySet == Set("train", "val", "test"))
    committed.values.foreach(p => assert(new java.io.File(p).isDirectory, p))
    // no staging litter survives a clean commit
    val leftovers = new java.io.File(tableDir).listFiles()
      .map(_.getName).filter(n => n.endsWith("_tmp") || n.endsWith("_old"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
    // the committed corpus is exactly the ledger's kept set
    val keptIds = CurationPipeline.endgameLedger(spark, sf)
      .filter(col("status").startsWith("kept"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val readBack = spark.read.parquet(tableDir)
    assert(readBack.select("doc_id").collect().map(_.getLong(0)).toSet == keptIds)
    // split dirs carry the hash-split assignment (partition pruning works)
    val train = spark.read.parquet(s"$tableDir/split=train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expectTrain = graft.operators.Sampling.split(
        readBack.select("doc_id"), "doc_id")
      .filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(train == expectTrain)
    // every committed row carries its scrub accounting
    assert(readBack.columns.toSet ==
      Set("doc_id", "source", "lang", "text", "n_covered", "n_scrubbed",
        "status", "split"))
  }

  test("re-commit swaps in place; crash litter is reaped by repair") {
    val tableDir = Files.createTempDirectory("graft-endgame2").toString
    val first = CurationPipeline.commitEndgame(spark, sfSmall, tableDir)
    val n1 = spark.read.parquet(tableDir).count()
    // idempotent: second run swaps each split dir, same content
    val second = CurationPipeline.commitEndgame(spark, sfSmall, tableDir)
    assert(first == second)
    assert(spark.read.parquet(tableDir).count() == n1)
    // crash litter: a dangling _tmp staging dir and an orphan _old are
    // exactly what the writer's repair contract reaps
    val tmpLitter = new java.io.File(s"$tableDir/split=train_tmp")
    val oldLitter = new java.io.File(s"$tableDir/split=val_old")
    assert(tmpLitter.mkdir() && oldLitter.mkdir())
    val writer = new AtomicPartitionWriter(LakeFs.local(), spark)
    val reaped = writer.repair(tableDir)
    assert(reaped.map(_.split('/').last).toSet ==
      Set("split=train_tmp", "split=val_old"))
    assert(!tmpLitter.exists && !oldLitter.exists)
    assert(spark.read.parquet(tableDir).count() == n1)
  }
}
