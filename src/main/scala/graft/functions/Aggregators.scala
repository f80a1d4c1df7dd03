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

  case class Scored(score: Double, id: Long)
  case class TopKBuf(items: Seq[Scored])

  /** Bounded top-k by (score desc, id asc ties). The buffer never holds
    * more than k elements and merge is associative + commutative, so
    * Spark computes it with map-side partial aggregation: each map task
    * ships at most k rows per group to the reducer. This is the
    * scale-safe replacement for
    * `row_number().over(Window.partitionBy(g).orderBy(score.desc))`
    * top-k, which shuffles the ENTIRE scored stream to |groups|
    * reducers and fully sorts it — a parallelism collapse when
    * |groups| is small (e.g. 10 ANN query vectors vs a 100 TB corpus).
    */
  class TopKByScore(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {
    require(k >= 1, s"k must be >= 1, got $k")
    private def beats(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    // items kept sorted best-first, length <= k
    private def insert(items: Seq[Scored], a: Scored): Seq[Scored] =
      if (items.length >= k && beats(items.last, a)) items
      else {
        val (pre, post) = items.span(beats(_, a))
        (pre ++ (a +: post)).take(k)
      }
    override def zero: TopKBuf = TopKBuf(Vector.empty)
    override def reduce(b: TopKBuf, a: Scored): TopKBuf =
      TopKBuf(insert(b.items, a))
    override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
      TopKBuf(y.items.foldLeft(x.items)(insert))
    override def finish(r: TopKBuf): TopKBuf = r
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
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
