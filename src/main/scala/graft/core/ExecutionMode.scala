package graft.core

/** How a benchmarked query's DataFrame is driven to completion
  * (reference `P/ExecutionMode.scala:24-56`). All modes are
  * executor-side terminal actions — nothing materializes on the driver
  * except bounded scalars — which is the 100 TB design rule.
  */
sealed trait ExecutionMode { def name: String }

object ExecutionMode {

  /** Collect to the driver — only for bounded (limited) outputs. */
  case object CollectResults extends ExecutionMode { val name = "collect" }

  /** Compute fully but discard rows on executors. */
  case object ForeachResults extends ExecutionMode { val name = "foreach" }

  /** Count rows (the default: full computation, one long back). */
  case object CountResults extends ExecutionMode { val name = "count" }

  /** Write to parquet at `location/<queryName>.parquet`. */
  case class WriteParquet(location: String) extends ExecutionMode { val name = "write" }

  /** Order-independent result checksum:
    * sum(crc32(concat_ws(',', *))) — the reference's correctness gate
    * (`P/Query.scala:130-136`), comparable across runs and configs. */
  case object HashResults extends ExecutionMode { val name = "hash" }
}
