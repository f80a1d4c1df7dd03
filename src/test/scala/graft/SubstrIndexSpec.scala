package graft

import org.apache.spark.sql.functions._
import graft.ext.SubstrIndex
import graft.sources.Tables

/** The persisted ExactSubstr window-key index vs dd25's in-query
  * history fold — the DedupIndexSpec convention applied to suffix
  * dedup. */
class SubstrIndexSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists) { loc.listFiles.foreach(_.delete()); loc.delete() }
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

  test("index-backed probe equals in-query dd25 value-for-value; index side stays shuffle-free") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    dropTable("substr_idx_test")
    val d = Tables.table(spark, sfDir, "documents").select("doc_id", "text")
    val isBatch = pmod(col("doc_id"), lit(5)) === 4
    SubstrIndex.build(d.filter(!isBatch), "substr_idx_test")

    val got = rows(SubstrIndex.probe(spark, "substr_idx_test",
      d.filter(isBatch)))
    val want = rows(run("dd25_incremental_substring"))
    assert(want.nonEmpty && got == want,
      s"index probe diverged from dd25: got=${got.take(5)}... " +
        s"want=${want.take(5)}...")
    // some batch doc must actually know windows, or the parity is vacuous
    assert(want.exists(_._4 > 0), s"no known windows in the fixture batch")

    // the storage property: grouping the index by its own key is
    // shuffle-free (bucketBy(h1, h2) pre-partitioned the data)
    val agg = spark.table("substr_idx_test")
      .groupBy(col("h1"), col("h2")).count()
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed index still shuffles on its own key:\n$plan")
  }

  test("build + append equals a from-scratch build over the union; the table stays a SET") {
    dropTable("substr_idx_inc")
    dropTable("substr_idx_all")
    val d = Tables.table(spark, sfDir, "documents").select("doc_id", "text")
    val isBatch = pmod(col("doc_id"), lit(5)) === 4
    val hist = d.filter(!isBatch)
    // the two halves SHARE keys (planted dups + common short windows):
    // append must add only the genuinely new ones
    val (hA, hB) = (hist.filter(col("doc_id") % 2 === 0),
      hist.filter(col("doc_id") % 2 =!= 0))
    SubstrIndex.build(hA, "substr_idx_inc")
    SubstrIndex.append(hB, "substr_idx_inc")
    SubstrIndex.build(hist, "substr_idx_all")

    def keys(t: String) = spark.table(t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val (inc, all) = (keys("substr_idx_inc"), keys("substr_idx_all"))
    assert(inc.toSet == all.toSet,
      s"incremental index content diverged: +${(inc.toSet -- all.toSet).size} " +
        s"-${(all.toSet -- inc.toSet).size}")
    // set property: no key appears twice after the append (a dup key
    // would double every later probe count for windows it carries)
    assert(inc.size == inc.toSet.size, "append introduced duplicate keys")

    val batch = d.filter(isBatch)
    assert(rows(SubstrIndex.probe(spark, "substr_idx_inc", batch)) ==
      rows(SubstrIndex.probe(spark, "substr_idx_all", batch)))
  }

  test("re-appending an already-indexed batch is a no-op (idempotent acceptance)") {
    dropTable("substr_idx_idem")
    val d = Tables.table(spark, sfDir, "documents").select("doc_id", "text")
    val isBatch = pmod(col("doc_id"), lit(5)) === 4
    SubstrIndex.build(d.filter(!isBatch), "substr_idx_idem")
    val batch = d.filter(isBatch)
    SubstrIndex.append(batch, "substr_idx_idem")
    val n1 = spark.table("substr_idx_idem").count()
    SubstrIndex.append(batch, "substr_idx_idem") // accidental re-run
    val n2 = spark.table("substr_idx_idem").count()
    assert(n1 == n2, s"re-append grew the index: $n1 -> $n2")
    // and the post-acceptance probe sees the batch as fully known
    val probed = rows(SubstrIndex.probe(spark, "substr_idx_idem", batch))
    assert(probed.nonEmpty && probed.forall(r => r._3 == 0 || r._4 == r._3),
      s"accepted batch not fully known to its own index: ${probed.take(5)}")
  }
}
