package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the continuous twin of
  * [[graft.operators.CorpusPrep.sequencePacking]]: as documents stream
  * in per source shard, each is assigned its slice of the shard's
  * endless packed-token tape (start/end sequence and offset under the
  * same [[graft.operators.CorpusPrep.PackBudget]] chunking).
  *
  * The batch operator gets the running token total from a window; a
  * stream cannot window over its whole past, so the cumulative offset
  * IS the state: one long per source shard, carried by
  * `flatMapGroupsWithState` — constant-size state per group, the
  * smallest possible state store footprint, no watermark needed (the
  * tape never closes). Within a micro-batch, documents pack in doc_id
  * order, making replays of a deterministic source deterministic.
  */
object PackStream {

  case class DocIn(source: String, doc_id: Long, n_tokens: Long)
  case class PackedDoc(source: String, doc_id: Long, n_tokens: Long,
      start_seq: Long, end_seq: Long, start_offset: Long)

  val Budget: Long = graft.operators.CorpusPrep.PackBudget

  /** Per-group packing step: fold this batch's docs (doc_id order) over
    * the carried cumulative token count.
    */
  def packGroup(source: String, docs: Iterator[DocIn],
      state: GroupState[Long]): Iterator[PackedDoc] = {
    var cum = state.getOption.getOrElse(0L)
    val out = docs.toSeq.sortBy(_.doc_id).map { d =>
      val p = PackedDoc(source, d.doc_id, d.n_tokens,
        cum / Budget, (cum + math.max(d.n_tokens - 1, 0)) / Budget, cum % Budget)
      cum += d.n_tokens
      p
    }
    state.update(cum)
    out.iterator
  }

  /** Wire the stateful packing over a streaming documents frame (schema
    * of [[DocStream.schema]]). Output mode: append.
    */
  def packStream(docs: DataFrame): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source"), col("doc_id"),
        size(graft.operators.TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .as[DocIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(packGroup)
  }
}
