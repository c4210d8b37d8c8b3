package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.LakeFs
import graft.streaming.StreamingIngest

class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  val schemaDdl =
    "date STRING, details STRING, total_amount DOUBLE, wifi DOUBLE, cloud DOUBLE"

  val goodCsv =
    """date,details,total_amount,wifi,cloud
      |all-year-budget,budget,100,60,40
      |2024-10,spent,30,20,10
      |2024-10,remaining,70,40,30""".stripMargin

  val badCsv =
    """date,details,total_amount,wifi,cloud
      |,budget,100,60,40""".stripMargin

  test("streaming ingest commits good years, quarantines bad ones, is exactly-once") {
    val base = Files.createTempDirectory("graft-sing").toString
    val fs = LakeFs.local()
    fs.writeString(s"$base/raw/year=2024/finance_2024.csv", goodCsv)
    fs.writeString(s"$base/raw/year=2023/finance_2023.csv", badCsv)
    val alerts = scala.collection.mutable.ArrayBuffer.empty[String]
    val ingest = new StreamingIngest(spark, fs, s"$base/staging",
      s"$base/chk", alert = (s, _) => alerts.synchronized { alerts += s })
    val q1 = ingest.start(ingest.read(s"$base/raw", schemaDdl))
    q1.awaitTermination()
    assert(spark.read.parquet(s"$base/staging/year=2024").count() == 3)
    assert(!fs.exists(s"$base/staging/year=2023"))
    assert(alerts.exists(_.contains("year=2023")))

    // second run with the same checkpoint: nothing re-read (exactly-once),
    // and a NEW file in an old year re-triggers just that year
    alerts.clear()
    fs.writeString(s"$base/raw/year=2024/finance_2024_fix.csv", goodCsv)
    val q2 = ingest.start(ingest.read(s"$base/raw", schemaDdl))
    q2.awaitTermination()
    assert(alerts.isEmpty, "quarantined file must not re-alert after checkpoint")
    // the new file's rows MERGE with the committed partition — the
    // checkpoint never re-reads the first file, so an overwrite would
    // silently drop its rows (3 committed + 3 new = 6)
    assert(spark.read.parquet(s"$base/staging/year=2024").count() == 6)

    // replay idempotence: wipe the checkpoint so the next run re-delivers
    // EVERY file (the worst-case crash-after-swap replay). The lineage
    // anti-join must replace the committed rows from the replayed files,
    // not union duplicates on top of them.
    fs.delete(s"$base/chk")
    val q3 = ingest.start(ingest.read(s"$base/raw", schemaDdl))
    q3.awaitTermination()
    assert(spark.read.parquet(s"$base/staging/year=2024").count() == 6,
      "replaying committed files must not duplicate rows")
  }
}
