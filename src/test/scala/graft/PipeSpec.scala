package graft

import graft.sources.PipeSource
import graft.sources.Tables

/** External-process pipe sources. */
class PipeSpec extends SparkSpec {

  test("per-partition process generator: one child per partition") {
    // each child emits "child <i> of <n>" plus 3 data lines
    val df = PipeSource.perPartitionProcess(spark,
      "seq 1 3 | sed \"s/^/p$1-/\"; echo done-$1", parallelism = 4)
    val lines = df.collect().map(_.getString(0))
    assert(lines.count(_.startsWith("done-")) == 4)
    assert(lines.count(_.contains("-1")) >= 4)
  }

  test("pipeRows transforms rows through a shell command") {
    val df = PipeSource.pipeRows(
      Tables.table(spark, sfDir, "region"), "tr a-z A-Z")
    val lines = df.collect().map(_.getString(0))
    assert(lines.length == 5)
    assert(lines.exists(_.contains("ASIA")))
    assert(lines.forall(l => l == l.toUpperCase))
  }
}
