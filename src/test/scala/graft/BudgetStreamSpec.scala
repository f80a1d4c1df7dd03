package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.BudgetStream

/** Streaming token-budget enforcement: cross-batch consumption
  * accrual, prefix-cut semantics, unbudgeted-source rejection, and
  * replay exclusion of the current batch's own state. */
class BudgetStreamSpec extends SparkSpec {

  private def words(k: Int) = (1 to k).map(i => s"w$i").mkString(" ")

  test("budget stream: admits until each source's budget drains across batches; unplanned source admits nothing") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("budget-stream").toString
    val budgets = Seq(("A", 10L), ("B", 5L)).toDF("source", "budget_tokens")
    val ms = MemoryStream[(Long, String, String)]
    val q = BudgetStream.budgetAdmission(spark,
      ms.toDF().toDF("doc_id", "source", "text"), budgets,
      s"$base/state", s"$base/decisions", s"$base/ck")
    try {
      // batch 0: A consumes 4+4 of 10, B 3 of 5 — all admitted
      ms.addData((1L, "A", words(4)), (2L, "A", words(4)), (3L, "B", words(3)))
      q.processAllAvailable()
      // batch 1: A's 3 more tokens overflow (8+3 > 10, REJECTED —
      // consumption survived the batch boundary); B's 2 exactly drain
      // the budget (3+2 = 5, admitted); C has no budget row (rejected)
      ms.addData((4L, "A", words(3)), (5L, "B", words(2)), (6L, "C", words(1)))
      q.processAllAvailable()
    } finally q.stop()
    val dec = spark.read.parquet(s"$base/decisions")
      .select("doc_id", "admitted").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dec == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 0L, 5L -> 1L, 6L -> 0L), s"got $dec")
    // standing state: one row per (batch, source) carrying tokens SEEN
    // (the durable cut) and tokens admitted (the reporting number)
    val state = spark.read.parquet(s"$base/state")
      .select("source", "tokens_seen", "tokens_admitted").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(state == Seq(("A", 8L, 8L), ("B", 3L, 3L),
      ("A", 3L, 0L), ("B", 2L, 2L), ("C", 1L, 0L)).sorted, s"got $state")
  }

  test("the prefix cut is durable across batches: a rejected doc's tokens never free up") {
    // budget A=10; batch 0 admits doc 1 (4 tok) and rejects doc 2
    // (cum 12 > 10). Doc 3's 5 tokens WOULD fit against admitted-only
    // consumption (4+5 <= 10) — counting tokens SEEN (12) keeps the
    // cut closed, matching dp14 over the concatenated table
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("budget-cut").toString
    val budgets = Seq(("A", 10L)).toDF("source", "budget_tokens")
    val ms = MemoryStream[(Long, String, String)]
    val q = BudgetStream.budgetAdmission(spark,
      ms.toDF().toDF("doc_id", "source", "text"), budgets,
      s"$base/state", s"$base/decisions", s"$base/ck")
    try {
      ms.addData((1L, "A", words(4)), (2L, "A", words(8)))
      q.processAllAvailable()
      ms.addData((3L, "A", words(5)))
      q.processAllAvailable()
    } finally q.stop()
    val dec = spark.read.parquet(s"$base/decisions")
      .select("doc_id", "admitted").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dec == Map(1L -> 1L, 2L -> 0L, 3L -> 0L),
      s"budget reopened after the cut: $dec")
  }

  test("prefix semantics: once a source's cumsum overflows, later smaller docs are rejected too") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val budgets = Seq(("A", 8L)).toDF("source", "budget_tokens")
    val zero = Seq.empty[(String, Long)].toDF("source", "consumed")
    val batch = Seq((1L, "A", words(4)), (2L, "A", words(6)), (3L, "A", words(2)))
      .toDF("doc_id", "source", "text")
    val got = BudgetStream.decide(budgets, zero, batch)
      .select("doc_id", "admitted").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 3 WOULD fit under knapsack filling (4+2 <= 8) but the prefix
    // cut already fired at doc 2 (cum 10 > 8) — the documented contract
    assert(got == Map(1L -> 1L, 2L -> 0L, 3L -> 0L), s"got $got")
  }

  test("consumedState excludes the current batch id (replay safety)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("budget-state").toString
    Seq(("A", 5L, 5L)).toDF("source", "tokens_seen", "tokens_admitted")
      .write.parquet(s"$base/batch_id=0")
    Seq(("A", 7L, 4L), ("B", 2L, 2L)).toDF("source", "tokens_seen", "tokens_admitted")
      .write.parquet(s"$base/batch_id=1")
    val got = BudgetStream.consumedState(spark, base, excludeBatchId = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("A" -> 5L), s"replayed batch leaked into state: $got")
  }
}
