package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing exact integer moment sums over a cents
  * value (count, Σx, Σx²) — the user-facing custom-aggregation surface
  * (`Aggregator[IN, BUF, OUT]`), kept deterministic by doing ALL
  * accumulation in exact long arithmetic: mean/variance are derived from
  * the exact moments only at `finish`, so results are identical under any
  * partitioning or merge order (unlike a floating-point Welford buffer).
  */
final case class CentsStatsBuf(n: Long, sum: Long, sumSq: Long)
final case class CentsStatsOut(n: Long, sum_c: Long, sum_sq_c: Long,
    mean_c: Double, variance_c: Double)

object CentsStats extends Aggregator[Long, CentsStatsBuf, CentsStatsOut] {
  type Buf = CentsStatsBuf
  type Out = CentsStatsOut

  override def zero: Buf = CentsStatsBuf(0L, 0L, 0L)

  override def reduce(b: Buf, x: Long): Buf =
    CentsStatsBuf(b.n + 1, b.sum + x, b.sumSq + x * x)

  override def merge(a: Buf, b: Buf): Buf =
    CentsStatsBuf(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)

  override def finish(b: Buf): Out = {
    val n = b.n.toDouble
    val mean = if (b.n == 0) 0.0 else b.sum / n
    val variance =
      if (b.n == 0) 0.0 else (b.sumSq - b.sum.toDouble * b.sum / n) / n
    CentsStatsOut(b.n, b.sum, b.sumSq, mean, variance)
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Out] = Encoders.product[Out]
}
