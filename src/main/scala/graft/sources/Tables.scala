package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Catalog of the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Mirrors the reference's notion of a named-table registry
  * (`Benchmark.scala:292-294` `case class Table(name, data)` in
  * summerDG/spark-sql-perf) re-expressed as a plain loader: tables are
  * `DataFrame`s registered as temp views; Catalyst sees parquet scans
  * directly so filter pushdown / column pruning reach the file source.
  *
  * The fixtures are an EXTERNAL interface: the driver regenerates them
  * and has changed physical types across generations (r8: `events.ts`
  * went parquet TIMESTAMP(NANOS) → TIMESTAMP_MICROS/NTZ and took down
  * the whole bench). So the loader validates each table's expected
  * columns loudly and adapts benign physical drift instead of assuming
  * a frozen schema — see [[adapt]].
  */
object Tables {

  /** All fixture tables, in dependency-ish order (dims first). */
  val names: Seq[String] = Seq(
    "region", "nation", "supplier", "customer", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to always broadcast in a join. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Logical column kinds the engine requires of each fixture column.
    * Widths within a kind are benign (DuckDB reads the same file, so
    * the oracle agrees by construction); timestamps are normalized
    * because Spark can't even read/operate on some physical flavors
    * without help (NANOS → legacy long; NTZ breaks interval
    * arithmetic vs session-zone TIMESTAMP).
    */
  private sealed trait Kind
  private case object KInt extends Kind // any integral width
  private case object KFloat extends Kind // float or double
  private case object KStr extends Kind
  private case object KTs extends Kind // any timestamp flavor, or nanos-as-long
  private case object KVec extends Kind // array<float|double>

  private val expectedSchemas: Map[String, Seq[(String, Kind)]] = Map(
    "region" -> Seq("r_regionkey" -> KInt, "r_name" -> KStr),
    "nation" -> Seq("n_nationkey" -> KInt, "n_name" -> KStr,
      "n_regionkey" -> KInt),
    "supplier" -> Seq("s_suppkey" -> KInt, "s_name" -> KStr,
      "s_nationkey" -> KInt, "s_acctbal" -> KFloat),
    "customer" -> Seq("c_custkey" -> KInt, "c_name" -> KStr,
      "c_nationkey" -> KInt, "c_acctbal" -> KFloat, "c_mktsegment" -> KStr),
    "part" -> Seq("p_partkey" -> KInt, "p_name" -> KStr, "p_brand" -> KStr,
      "p_type" -> KStr, "p_size" -> KInt, "p_retailprice" -> KFloat),
    "orders" -> Seq("o_orderkey" -> KInt, "o_custkey" -> KInt,
      "o_orderstatus" -> KStr, "o_totalprice" -> KFloat,
      "o_orderdate" -> KTs, "o_orderpriority" -> KStr),
    "lineitem" -> Seq("l_orderkey" -> KInt, "l_partkey" -> KInt,
      "l_suppkey" -> KInt, "l_linenumber" -> KInt, "l_quantity" -> KFloat,
      "l_extendedprice" -> KFloat, "l_discount" -> KFloat, "l_tax" -> KFloat,
      "l_returnflag" -> KStr, "l_linestatus" -> KStr, "l_shipdate" -> KTs),
    "events" -> Seq("event_id" -> KInt, "ts" -> KTs, "user_id" -> KInt,
      "event_type" -> KStr, "value" -> KFloat, "props" -> KStr),
    "documents" -> Seq("doc_id" -> KInt, "text" -> KStr, "lang" -> KStr,
      "source" -> KStr, "n_chars" -> KInt),
    "embeddings" -> Seq("vec_id" -> KInt, "embedding" -> KVec,
      "label" -> KInt))

  /** One table as a DataFrame. Plain parquet scan — no caching here, so
    * every query re-derives a fresh plan (cf. reference `Query.scala:29-31`
    * by-name `buildDataFrame`). The legacy nanos conf is set BEFORE the
    * read so a TIMESTAMP(NANOS)-generation fixture loads at all (Spark 4
    * otherwise throws PARQUET_TYPE_ILLEGAL); [[adapt]] then branches on
    * what actually arrived.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    adapt(name, spark.read.parquet(path(dir, name)))
  }

  /** Validate `raw` against the expected logical schema for `name` and
    * normalize benign physical drift:
    *   - timestamp columns: session TIMESTAMP passes through; NTZ/DATE
    *     cast to session TIMESTAMP; LongType (the nanos-as-long legacy
    *     read) divides to micros — all three generations land on the
    *     identical microsecond TIMESTAMP that DuckDB derives from the
    *     same file, so oracle comparisons line up;
    *   - integral / floating widths pass through untouched (the oracle
    *     reads the same physical file);
    * anything else — a missing/renamed column, a kind change — fails
    * fast with the drift named, instead of surfacing as a cryptic
    * AnalysisException deep inside some query's plan.
    */
  private[graft] def adapt(name: String, raw: DataFrame): DataFrame = {
    val exp = expectedSchemas(name)
    val actual = raw.schema
    val missing = exp.map(_._1).filterNot(actual.fieldNames.contains)
    require(missing.isEmpty,
      s"fixture drift: $name.parquet is missing column(s) " +
        s"${missing.mkString(", ")} — actual schema ${actual.simpleString}")
    exp.foldLeft(raw) { case (df, (c, kind)) =>
      val dt = actual(c).dataType
      (kind, dt) match {
        case (KTs, TimestampType) => df
        case (KTs, LongType) =>
          df.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
        case (KTs, TimestampNTZType | DateType) =>
          df.withColumn(c, col(c).cast("timestamp"))
        case (KInt, ByteType | ShortType | IntegerType | LongType) => df
        case (KFloat, FloatType | DoubleType) => df
        case (KStr, StringType) => df
        case (KVec, ArrayType(FloatType | DoubleType, _)) => df
        case _ => sys.error(
          s"fixture drift: $name.parquet column `$c` arrived as " +
            s"${dt.sql}, which the engine can't treat as $kind — " +
            "extend Tables.adapt if the drift is benign")
      }
    }
  }

  /** `events.parquet` — kept as a named entry point (streaming + event
    * queries call it directly); the schema-generation handling now
    * lives in [[adapt]], shared by every table.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")

  /** Register every fixture as a temp view so SQL-text queries resolve. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
