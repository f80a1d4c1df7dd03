package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.streaming.EventsStream

/** The driver regenerates the parquet fixtures between rounds and has
  * changed physical types across generations (r8: events.ts parquet
  * TIMESTAMP(NANOS) → TIMESTAMP_MICROS/NTZ, which took down the bench
  * and 11 correctness rows). These specs feed Tables/EventsStream every
  * fixture generation seen so far — legacy nanos-as-long, current
  * micros, and NTZ — and assert they all normalize to the identical
  * session-TIMESTAMP values, plus that NON-benign drift fails loudly.
  */
class FixtureDriftSpec extends SparkSpec {

  /** Six-column events table in the CURRENT generation (session
    * TIMESTAMP, written as parquet TIMESTAMP_MICROS). */
  private def baseEvents: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "2024-01-01 00:10:00", 10L, "click", 1.5, "{}"),
      (2L, "2024-01-01 00:40:00", 10L, "purchase", 9.0, "{}"),
      (3L, "2024-01-01 02:05:00", 11L, "click", 2.0, "{}"),
      (4L, "2024-01-01 03:30:00", 12L, "view", 0.5, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Write `df` as <tmp>/events.parquet and return the fixture dir. */
  private def writeFixture(df: DataFrame, tag: String): String = {
    val dir = Files.createTempDirectory(s"graft-drift-$tag").toString
    df.coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  private def legacyNanos: DataFrame = baseEvents
    .withColumn("ts", unix_micros(col("ts")) * 1000L) // int64 nanos
  private def ntzGen: DataFrame = baseEvents
    .withColumn("ts", col("ts").cast("timestamp_ntz"))

  test("Tables.events normalizes all three fixture generations identically") {
    val dirs = Map(
      "micros" -> writeFixture(baseEvents, "micros"),
      "nanos" -> writeFixture(legacyNanos, "nanos"),
      "ntz" -> writeFixture(ntzGen, "ntz"))
    val results = dirs.map { case (tag, d) =>
      val df = Tables.events(spark, d)
      assert(df.schema("ts").dataType == TimestampType,
        s"$tag generation should land on session TIMESTAMP")
      tag -> df.orderBy("event_id")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .collect().map(_.toString).toSeq
    }
    assert(results("nanos") == results("micros"),
      "legacy nanos generation must decode to the same instants")
    assert(results("ntz") == results("micros"),
      "NTZ generation must decode to the same instants (UTC session)")
  }

  test("lineitem timestamp drift (DATE generation) normalizes to TIMESTAMP") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, 100L, 1, 5.0, 1000.0, 0.05, 0.02, "N", "O", "2024-03-01"),
      (2L, 11L, 101L, 1, 3.0, 500.0, 0.0, 0.01, "R", "F", "2024-03-02"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_ship_s")
    val dir = Files.createTempDirectory("graft-drift-li").toString
    rows.withColumn("l_shipdate", to_date(col("l_ship_s"))).drop("l_ship_s")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    val df = graft.sources.Tables.table(spark, dir, "lineitem")
    assert(df.schema("l_shipdate").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.select(date_format(col("l_shipdate"), "yyyy-MM-dd"))
      .orderBy("l_shipdate").collect().map(_.getString(0)).toSeq ==
      Seq("2024-03-01", "2024-03-02"))
  }

  test("missing fixture column fails loudly, naming the table and column") {
    val d = writeFixture(baseEvents.drop("props"), "missing")
    val e = intercept[Exception](Tables.events(spark, d))
    assert(e.getMessage.contains("events") && e.getMessage.contains("props"),
      s"drift error should name table+column, got: ${e.getMessage}")
  }

  test("kind drift (string column arriving numeric) fails loudly") {
    val d = writeFixture(
      baseEvents.withColumn("event_type", lit(42L)), "kind")
    val e = intercept[Exception](Tables.events(spark, d))
    assert(e.getMessage.contains("event_type"),
      s"drift error should name the column, got: ${e.getMessage}")
  }

  test("Verify.runOne records an explicit _error file for a thrown query") {
    val out = Files.createTempDirectory("graft-verify-err").toString
    val ok = Verify.runOne(spark, sfDir, out, "boom",
      (_, _) => sys.error("synthetic failure"))
    assert(!ok)
    val rec = Files.readString(java.nio.file.Paths.get(s"$out/boom._error"))
    assert(rec.contains("synthetic failure"))
    // success writes parquet and clears any stale error record
    val ok2 = Verify.runOne(spark, sfDir, out, "boom",
      (s, _) => s.range(3).toDF("id"))
    assert(ok2 &&
      !Files.exists(java.nio.file.Paths.get(s"$out/boom._error")) &&
      spark.read.parquet(s"$out/boom").count() == 3)
  }

  test("EventsStream.readEvents handles both timestamp generations") {
    val microsDir = writeFixture(baseEvents, "stream-micros")
    val nanosDir = writeFixture(legacyNanos, "stream-nanos")
    val out = Seq("m" -> microsDir, "n" -> nanosDir).map { case (tag, d) =>
      val got = EventsStream.runToMemory(spark,
        EventsStream.tumblingCounts(EventsStream.readEvents(spark, d)),
        s"drift_stream_$tag", OutputMode.Append())
        .orderBy("hour_start", "event_type").collect().map(_.toString).toSeq
      tag -> got
    }.toMap
    assert(out("m").nonEmpty, "watermarked windows should close on this spread")
    assert(out("m") == out("n"),
      "both fixture generations must stream to identical windows")
  }
}
