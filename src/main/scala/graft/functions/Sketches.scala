package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed frequency sketches.
  *
  * `MisraGries(k)` is the classic heavy-hitters summary as a typed
  * Aggregator: at most k counters, and the MERGE is the mergeable-
  * summaries formulation (sum counter-wise, then subtract the (k+1)-th
  * largest count and drop non-positives), so Spark computes it with
  * map-side partial aggregation — each map task ships ≤ k counters per
  * group, never the token stream. After summing n items the sketch
  * guarantees:
  *   - every item with true frequency > n/(k+1) is present;
  *   - every estimate e satisfies  true − n/(k+1) ≤ e ≤ true.
  *
  * Like all Misra–Gries variants the ESTIMATES (not the guarantees)
  * depend on merge order, so this is a spec-gated operator (bounds
  * checked against exact counts), not an oracle-gated one.
  */
object Sketches {

  case class MGBuf(counts: Map[String, Long])
  case class TokenCount(token: String, count: Long)
  case class MGOut(items: Seq[TokenCount])

  class MisraGries(k: Int)
      extends Aggregator[String, MGBuf, MGOut] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: MGBuf = MGBuf(Map.empty)

    override def reduce(b: MGBuf, item: String): MGBuf = {
      val m = b.counts
      if (m.contains(item)) MGBuf(m.updated(item, m(item) + 1L))
      else if (m.size < k) MGBuf(m.updated(item, 1L))
      else {
        // decrement every counter; evict zeros (the classic MG step:
        // one arriving item cancels one unit of k tracked items)
        MGBuf(m.flatMap { case (t, c) =>
          if (c > 1L) Some(t -> (c - 1L)) else None
        })
      }
    }

    override def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val summed = b.counts.foldLeft(a.counts) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (summed.size <= k) MGBuf(summed)
      else {
        // subtract the (k+1)-th largest count from everything
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        MGBuf(summed.flatMap { case (t, c) =>
          if (c > cut) Some(t -> (c - cut)) else None
        })
      }
    }

    override def finish(r: MGBuf): MGOut =
      MGOut(r.counts.toSeq
        .map { case (t, c) => TokenCount(t, c) }
        .sortBy(tc => (-tc.count, tc.token)))

    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[MGOut] = Encoders.product[MGOut]
  }
}
