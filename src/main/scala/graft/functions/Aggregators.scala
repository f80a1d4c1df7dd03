package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators (SURVEY §2.10).
  *
  * `AvgAggregator` re-expresses the reference's typed
  * `Aggregator[Long, SumAndCount, Double]` average
  * (`P/DatasetPerformance.scala:102-128`); `GeometricMean` re-expresses
  * the reference's untyped `UserDefinedAggregateFunction`
  * (`performance.dashboard.scala:53-87`) on the public `Aggregator` +
  * `functions.udaf` API (UDAF was removed in Spark 3+).
  *
  * Both are algebraic (commutative monoid merge), so Spark computes
  * them with map-side partial aggregation — no skew risk at scale.
  */
object Aggregators {

  case class SumCount(var sum: Double, var count: Long)

  /** Typed average over Double input. */
  object AvgAggregator extends Aggregator[Double, SumCount, Double] {
    override def zero: SumCount = SumCount(0.0, 0L)
    override def reduce(b: SumCount, a: Double): SumCount = {
      b.sum += a; b.count += 1; b
    }
    override def merge(b1: SumCount, b2: SumCount): SumCount =
      SumCount(b1.sum + b2.sum, b1.count + b2.count)
    override def finish(r: SumCount): Double =
      if (r.count == 0) Double.NaN else r.sum / r.count
    override def bufferEncoder: Encoder[SumCount] = Encoders.product[SumCount]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Like AvgAggregator but finishes with the raw (sum, count) buffer,
    * letting the caller apply a deterministic fixed-point division
    * (see graft.workloads.Parity) instead of the order-dependent
    * float sum/count. */
  object SumCountAggregator extends Aggregator[Double, SumCount, SumCount] {
    override def zero: SumCount = SumCount(0.0, 0L)
    override def reduce(b: SumCount, a: Double): SumCount = {
      b.sum += a; b.count += 1; b
    }
    override def merge(b1: SumCount, b2: SumCount): SumCount =
      SumCount(b1.sum + b2.sum, b1.count + b2.count)
    override def finish(r: SumCount): SumCount = r
    override def bufferEncoder: Encoder[SumCount] = Encoders.product[SumCount]
    override def outputEncoder: Encoder[SumCount] = Encoders.product[SumCount]
  }

  case class LongSumCount(var sum: Long, var count: Long)

  /** Fixed-point typed aggregator: each input is scaled to integer
    * units (`round(x * 10^scale)`) **before** accumulation and summed
    * as Long, so the partial sums are exact and independent of row
    * order / partitioning — the typed-API twin of
    * `graft.workloads.Parity.dsum`. Use this (not a Double-buffer
    * aggregator) whenever the result feeds the hash-identical oracle
    * gate. */
  class FixedPointSumCount(scale: Int)
      extends Aggregator[Double, LongSumCount, LongSumCount] {
    private val f = math.pow(10, scale)
    override def zero: LongSumCount = LongSumCount(0L, 0L)
    override def reduce(b: LongSumCount, a: Double): LongSumCount = {
      b.sum += math.round(a * f); b.count += 1; b
    }
    override def merge(b1: LongSumCount, b2: LongSumCount): LongSumCount =
      LongSumCount(b1.sum + b2.sum, b1.count + b2.count)
    override def finish(r: LongSumCount): LongSumCount = r
    override def bufferEncoder: Encoder[LongSumCount] = Encoders.product[LongSumCount]
    override def outputEncoder: Encoder[LongSumCount] = Encoders.product[LongSumCount]
  }

  case class LogSumCount(var logSum: Double, var count: Long)

  /** Geometric mean = exp(mean(ln x)); log-domain buffer avoids the
    * product overflow of the reference's count×product buffer. */
  object GeometricMean extends Aggregator[Double, LogSumCount, Double] {
    override def zero: LogSumCount = LogSumCount(0.0, 0L)
    override def reduce(b: LogSumCount, a: Double): LogSumCount = {
      b.logSum += math.log(a); b.count += 1; b
    }
    override def merge(b1: LogSumCount, b2: LogSumCount): LogSumCount =
      LogSumCount(b1.logSum + b2.logSum, b1.count + b2.count)
    override def finish(r: LogSumCount): Double =
      if (r.count == 0) Double.NaN else math.exp(r.logSum / r.count)
    override def bufferEncoder: Encoder[LogSumCount] = Encoders.product[LogSumCount]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
