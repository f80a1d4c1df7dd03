package graft

import org.apache.spark.sql.functions._

import graft.ext.AnnIndex

/** Persistent bucketed ANN index: build-once/query-many semantics,
  * bucket pruning on the read path, and recall vs the exact baseline. */
class AnnIndexSpec extends SparkSpec {

  private val table = "ann_index_spec"

  private def vectors = {
    graft.functions.VectorOps.register(spark)
    sources.Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        graft.functions.VectorOps.normalize(
          col("embedding").cast("array<double>")).as("v"))
  }

  test("index query equals live LSH search and prunes buckets") {
    val vs = vectors
    AnnIndex.build(spark, vs, table, nBuckets = 256)
    val queries = vs.filter(col("vec_id") < 3)

    val got = AnnIndex.topK(spark, table, queries)
    got.collect() // materialize so the executed plan is final
    val plan = got.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

    // the scan must prune: only buckets matching probe signatures read
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning in scan:\n$plan")
    assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
      s"no buckets pruned: ${sel.get.matched}")

    // shape: <= 5 ranked neighbors per query, ranks 1..n contiguous
    val rows = got.collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks.head == 1 && ranks.length <= 5 &&
        ranks.sameElements(1L to ranks.length),
        s"bad rank sequence for query $q: ${ranks.toSeq}")
    }

    // recall floor vs the exact baseline (same floor as live ss02 —
    // the index is the same signatures, so it can't do worse)
    val exact = run("ss01_ann_bruteforce").select("q_id", "neighbor_id")
      .filter(col("q_id") < 3)
    val nExact = exact.count()
    val overlap = exact.join(got.select("q_id", "neighbor_id"),
      Seq("q_id", "neighbor_id"), "left_semi").count()
    assert(overlap.toDouble / nExact >= 0.3,
      s"index recall collapsed: $overlap/$nExact")

    // reported cosines are exact: recompute the dot for every hit
    val joined = got
      .join(vs.select(col("vec_id").as("q_id"), col("v").as("qv")), "q_id")
      .join(vs.select(col("vec_id").as("neighbor_id"), col("v").as("nv")),
        "neighbor_id")
      .withColumn("expected",
        round(graft.functions.VectorOps.dot(col("qv"), col("nv")) * 1e6)
          .cast("long"))
      .filter(col("expected") =!= col("cos_e6"))
    assert(joined.count() == 0, "index cosines diverge from exact dots")
  }

  test("a second session-independent query path reuses the index files") {
    // no rebuild: query again with different query vectors; the scan
    // must still hit the same managed table
    val vs = vectors
    val queries = vs.filter(col("vec_id").between(10, 14))
    val got = AnnIndex.topK(spark, table, queries, k = 3)
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rank")).forall(_ <= 3))
  }
}
