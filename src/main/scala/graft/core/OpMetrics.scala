package graft.core

import scala.collection.mutable

/** Driver-side sub-phase timing channel for operators whose single
  * bench number conflates phases with different cost stories (ss03's
  * KMeans sample-fit vs its probe+rerank — three rounds of driver
  * benches showed ss03 "episodes" that never reproduced isolated, and
  * the undecomposed number could not say which phase the episode hit).
  *
  * Operators record named sub-phase durations at build time; Bench
  * drains the per-key samples and emits medians in its digest line, so
  * the next episode attributes itself mechanically. Keys are
  * "<query>_<phase>". Thread-safe; recording is append-only so
  * median-of-N reps works without coordination with the bench loop.
  */
object OpMetrics {
  private val samples = mutable.Map.empty[String, mutable.ArrayBuffer[Double]]

  def record(key: String, seconds: Double): Unit = synchronized {
    samples.getOrElseUpdate(key, mutable.ArrayBuffer.empty) += seconds
  }

  /** Time `body`, record it under `key`, return its result. */
  def timed[T](key: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body finally record(key, (System.nanoTime() - t0) / 1e9)
  }

  /** Median per key of everything recorded so far, then clear. */
  def drainMedians(): Map[String, Double] = synchronized {
    val out = samples.map { case (k, vs) =>
      k -> vs.sorted.apply(vs.size / 2)
    }.toMap
    samples.clear()
    out
  }
}
