package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Multimodal column conventions for a 100 TB training-data lake:
  * image/audio/video payloads travel as opaque `BINARY` columns next to a
  * typed metadata struct, so the (huge) bytes stay columnar-compressed
  * and prunable — a query that never touches `content` never reads it
  * from Parquet.
  *
  * The decode/feature-extract step is the seam where real codec libraries
  * would plug in (via `mapPartitions` here, `mapInPandas` from PySpark).
  * No codec libraries exist in this environment, so [[decodeStub]] is a
  * clearly-marked deterministic fake — the Spark-side plumbing (schema,
  * batch shape, partition-parallel execution, no driver collect) is real
  * and tested.
  */
object Multimodal {

  val metadataType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Manufacture a media table from the documents corpus: the text bytes
    * stand in for an encoded payload, with deterministic synthetic
    * metadata. (In production this is the ingest boundary.)
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"),
        (col("n_chars") * 40L).as("duration_ms")).as("meta"))

  final case class MediaFeature(
      media_id: Long, size_bytes: Long, content_md5: String,
      feat: Array[Float])

  /** STUB decode / feature-extract. A real implementation would hand each
    * partition's batch of byte arrays to a codec + model runtime; the
    * fake derives a deterministic 8-dim feature from the md5 of the
    * payload so tests can assert exact values. Runs partition-parallel
    * via `mapPartitions`, never on the driver.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          // === stubbed codec boundary: replace with real decode ===
          md.reset()
          val digest = md.digest(bytes)
          val hex = digest.map("%02x".format(_)).mkString
          val feat = Array.tabulate(8)(i =>
            ((digest(i) & 0xFF) / 255.0f))
          MediaFeature(id, bytes.length.toLong, hex, feat)
        }
      }
    out.toDF()
  }

  /** Frame sampling for video-typed rows: one row per sampled frame
    * offset, derived from metadata only (`sequence` + `explode`, pure
    * Catalyst — the bytes column is untouched and unread).
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame =
    media
      .filter(col("meta.mime") === "video/mp4" && col("meta.duration_ms") > 0)
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"))
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))

  /** Resize planning: pure-metadata transformation producing the target
    * geometry per image (aspect-preserving fit into maxDim); the actual
    * pixel work belongs behind the decode seam.
    */
  def planResize(media: DataFrame, maxDim: Int = 256): DataFrame =
    media
      .filter(col("meta.mime") === "image/png")
      .select(col("media_id"),
        col("meta.width").as("w"), col("meta.height").as("h"))
      .withColumn("scale_ppm",
        expr(s"least(${maxDim * 1000000L} DIV w, ${maxDim * 1000000L} DIV h, 1000000)"))
      .withColumn("target_w", expr("CAST(w * scale_ppm DIV 1000000 AS INT)"))
      .withColumn("target_h", expr("CAST(h * scale_ppm DIV 1000000 AS INT)"))
}
