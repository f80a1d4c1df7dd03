package graft

/** Per-query bench noise floors (seconds, sf0.1, local[32]).
  *
  * Why they exist: the global sentinel (Bench.scala) catches whole-run
  * environment degradation but not LOCALIZED episodes — in the r9
  * driver bench the sentinel passed (ratio 0.86) while ~25-30s of
  * phantom time landed on 6 queries (ss03 was charged 14.26s that
  * re-runs at 1.06s). A per-query floor lets the bench flag any
  * reading that exceeds FLAG_RATIO x its own historical cost, so a
  * consumer can mechanically separate "this query regressed" from
  * "a VM episode intersected this query's reps".
  *
  * Values = the builder's median over spread catalog passes at sf0.1
  * (three full passes, reps non-adjacent — see Bench.scala). Only
  * queries with floor >= 0.5s are pinned: below that, scheduler
  * jitter alone exceeds the flag ratio and the flag would cry wolf.
  * Re-pin a query's floor only when its code changes.
  */
object BenchFloors {
  /** A reading above FLAG_RATIO x floor is flagged as a suspected
    * environment episode (or a real regression — the flag marks it
    * for isolated re-run, it does not excuse it). */
  val FlagRatio = 3.0

  val floors: Map[String, Double] = Map.empty
}
