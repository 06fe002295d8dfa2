package graft.udf

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass numeric profile. */
final case class NumProfile(n: Long, sum: Double, min: Double, max: Double) {
  def mean: Double = if (n == 0) Double.NaN else sum / n
}

/** Typed `Aggregator[IN, BUF, OUT]` — the SURVEY §7.3 mechanism for
  * algebraic aggregates the reference's reduceF slot cannot partial-merge:
  * Catalyst runs `reduce` map-side and `merge` on the shuffled partial
  * buffers, so one `NumProfile` per (partition, key) crosses the wire
  * instead of every value. Usable typed (`.agg(NumProfileAgg.toColumn)`)
  * or registered untyped via `functions.udaf(NumProfileAgg)`.
  */
object NumProfileAgg extends Aggregator[Double, NumProfile, NumProfile] {
  override def zero: NumProfile =
    NumProfile(0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)

  override def reduce(b: NumProfile, a: Double): NumProfile =
    NumProfile(b.n + 1, b.sum + a, math.min(b.min, a), math.max(b.max, a))

  override def merge(x: NumProfile, y: NumProfile): NumProfile =
    NumProfile(x.n + y.n, x.sum + y.sum, math.min(x.min, y.min), math.max(x.max, y.max))

  override def finish(b: NumProfile): NumProfile = b

  override def bufferEncoder: Encoder[NumProfile] = Encoders.product[NumProfile]
  override def outputEncoder: Encoder[NumProfile] = Encoders.product[NumProfile]
}
