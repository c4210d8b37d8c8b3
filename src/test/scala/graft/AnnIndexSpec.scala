package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIndex, Similarity}

/** The persisted-index contract: the committed artifact serves searches
  * hash-equal to the live-computed q106/q108 (commit-then-serve row
  * identity, the ThriftServingSpec pattern applied to the index), the
  * SERVING plans carry zero corpus re-assignment work (the whole point
  * of committing an index), and the lifecycle is idempotent +
  * version-gated.
  */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("served IVF search is row-identical to the live q106") {
    assert(rows(AnnIndex.ivfServe(spark, sf)) ===
      rows(Similarity.ivfKnnAuto(spark, sf)))
  }

  test("served IVF-PQ search is row-identical to the live q108") {
    assert(rows(AnnIndex.ivfPqServe(spark, sf)) ===
      rows(Similarity.ivfPqSearchAuto(spark, sf)))
  }

  test("serving plans carry zero corpus re-assignment; live plans do") {
    AnnIndex.ensureCommitted(spark, sf)
    // plans render expressions by CLASS prettyName (lowercased), not by
    // the registered SQL function name
    val argmax = "quantizedargmaxdot"
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    // the live searches assign the corpus per invocation — the argmax
    // expression sits over the corpus scan (the seam this module closes)
    assert(plan(Similarity.ivfKnnAuto(spark, sf)).contains(argmax))
    assert(plan(Similarity.ivfPqSearchAuto(spark, sf)).contains(argmax))
    // the served searches read the committed artifact: no assignment
    // expression anywhere, and the candidate scan is the index path
    val pIvf = plan(AnnIndex.ivfServe(spark, sf))
    val pPq = plan(AnnIndex.ivfPqServe(spark, sf))
    assert(!pIvf.contains(argmax),
      s"served IVF plan must not re-assign the corpus:\n${pIvf.take(2000)}")
    assert(!pPq.contains(argmax),
      s"served IVF-PQ plan must not re-assign the corpus:\n${pPq.take(2000)}")
    assert(pIvf.contains("graft_ann_index"),
      s"served IVF must scan the committed members:\n${pIvf.take(2000)}")
    assert(pPq.contains("graft_ann_index"),
      s"served IVF-PQ must scan the committed codes:\n${pPq.take(2000)}")
    // the PQ L2 tables run ONLY over the query embedding (the 8 LUT
    // columns); applying one to the CORPUS embedding column is the
    // per-invocation coding pass the artifact commits away — the live
    // plan carries exactly that shape, the served plan must not
    val corpusCoding = "quantizedl2table\\(slice\\(embedding".r
    assert(corpusCoding.findFirstIn(
      plan(Similarity.ivfPqSearchAuto(spark, sf))).isDefined)
    assert(corpusCoding.findFirstIn(pPq).isEmpty,
      s"served ADC must not re-code candidates:\n${pPq.take(2000)}")
  }

  test("ensureCommitted is idempotent and version+corpus gated") {
    val meta = AnnIndex.ensureCommitted(spark, sf)
    assert(meta.version === AnnIndex.IndexVersion)
    val lakeFs = graft.lake.LakeFs.forSpark(spark)
    val sidecar = s"${AnnIndex.indexRoot(spark, sf)}/_index_version.json"
    val before = lakeFs.fs.getFileStatus(
      new org.apache.hadoop.fs.Path(sidecar)).getModificationTime
    // a second call is a sidecar read — no rebuild, no rewrite
    assert(AnnIndex.ensureCommitted(spark, sf) === meta)
    val after = lakeFs.fs.getFileStatus(
      new org.apache.hadoop.fs.Path(sidecar)).getModificationTime
    assert(after === before, "second ensureCommitted must not rebuild")
    // a missing sidecar certifies an incomplete commit → rebuild
    lakeFs.delete(sidecar)
    assert(AnnIndex.readMeta(spark, sf).isEmpty)
    assert(AnnIndex.ensureCommitted(spark, sf) === meta)
    assert(AnnIndex.readMeta(spark, sf) === Some(meta))
  }

  test("staleness report covers every committed bucket and stamps the version") {
    val got = AnnIndex.stalenessReport(spark, sf).collect()
    val audit = AnnIndex.commitAudit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.map(_.getLong(0)).toSet === audit.keySet)
    got.foreach { r =>
      assert(r.getLong(1) === audit(r.getLong(0))) // n_index = committed count
      assert(r.getLong(5) === AnnIndex.IndexVersion)
      assert(r.getLong(2) <= r.getLong(1)) // arrivals are a corpus subset
    }
    // the ≥0.9 split is ~10% of the corpus: some bucket must see arrivals
    assert(got.map(_.getLong(2)).sum > 0L)
  }
}
