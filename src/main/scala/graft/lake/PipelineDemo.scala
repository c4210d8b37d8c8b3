package graft.lake

import graft.GraftSession

/** CLI demonstration of the incremental lake pipeline: seeds a raw zone
  * (or uses an existing one passed as arg 0), runs two cycles, prints the
  * outcome of each step. `runMain graft.lake.PipelineDemo [baseDir]`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val base = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val cfg = FinancePipeline.Config(
      rawDir = s"$base/raw", stagingDir = s"$base/staging",
      curatedDir = s"$base/curated", versionsRoot = s"$base/versions")
    val fs = LakeFs.local()
    if (!fs.exists(s"${cfg.rawDir}/year=2024/finance_2024.csv")) {
      fs.writeString(s"${cfg.rawDir}/year=2024/finance_2024.csv",
        """date,details,total_amount,wifi,cloud,siem
          |all-year-budget,budget,1000,400,350,250
          |2024-10,spent,100,40,30,30
          |2024-10,remaining,900,360,320,220
          |2024-11,spent,150,60,50,40
          |2024-11,remaining,750,300,270,180
          |total spent,spent,250,100,80,70
          |remaining,remaining,750,300,270,180""".stripMargin)
      fs.writeString(s"${cfg.rawDir}/year=2023/finance_2023.csv",
        "date,details,total_amount,wifi\n,budget,10,10") // poison pill
    }
    val pipe = new FinancePipeline(spark, fs, cfg)
    println(s"[demo] base=$base")
    pipe.run().foreach(r => println(s"[demo] cycle1 $r"))
    println(s"[demo] cycle2 (expect no-op): ${pipe.run()}")
    val long = spark.read.parquet(s"${cfg.curatedDir}/year=2024")
    println(s"[demo] curated long rows=${long.count()}")
    long.show(5, truncate = false)
    val versions = new Versioning(fs, spark, cfg.versionsRoot)
    println(s"[demo] versions(2024)=${versions.list(2024)}")
    println(s"[demo] failed marker exists=${fs.exists(s"${cfg.rawDir}/year=2023/finance_2023.csv.failed")}")
    spark.stop()
  }
}
