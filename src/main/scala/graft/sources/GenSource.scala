package graft.sources

import java.util.{Map => JMap}

import java.util.OptionalLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Native DataSource V2 generator: the deterministic synthetic-table
  * family (datagen.Generators' value = pure-hash-of-id contract)
  * exposed as a first-class Spark source —
  * `spark.read.format("graft-gen").option("rows", n)` — instead of a
  * `spark.range` + expressions pipeline.
  *
  * Exists to exercise the connector surface the engine's other sources
  * don't: schema inference via [[TableProvider]], column pruning via
  * [[SupportsPushDownRequiredColumns]] (the reader materializes ONLY
  * requested fields — a pruned scan does less work, not just less
  * copying), id-range filter pushdown via [[SupportsPushDownFilters]]
  * (range predicates narrow the generated id span BEFORE partition
  * planning, the generator's equivalent of partition pruning), and
  * explicit [[InputPartition]] planning (contiguous id spans, so a
  * 1000-executor read is 1000 independent spans with zero coordination
  * — the same property `spark.range` has, kept under a custom source).
  *
  * Also pushes LIMIT (exact span truncation) and complete aggregates
  * (COUNT(*) / COUNT(id) / MIN(id) / MAX(id) are closed-form on the
  * post-filter id span — the generator's analog of parquet
  * footer-stats pushdown) via [[SupportsPushDownLimit]] /
  * [[SupportsPushDownAggregates]].
  *
  * Options: `rows` (default 1000), `seed` (42), `partitions` (4) —
  * case-insensitive, validated (rows >= 0, partitions >= 1).
  * Schema: id BIGINT, grp BIGINT (100 groups), val BIGINT (1e6 range),
  * tag STRING (8 values) — all pure splitmix64 functions of (id, seed),
  * identical under any partitioning or pushdown.
  */
class GenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-gen"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // Case-insensitive reads: `.option("Rows", n)` must configure the
    // source, not silently fall back to the default.
    val opts = new CaseInsensitiveStringMap(properties)
    def opt(k: String, d: String) = opts.getOrDefault(k, d)
    val rows = opt("rows", "1000").toLong
    val parts = opt("partitions", "4").toInt
    val perBatch = opt("rowsPerBatch", "1000").toLong
    // Validate up front: a negative/zero config must fail loudly, not
    // plan an empty scan that silently returns zero rows.
    require(rows >= 0, s"graft-gen: rows must be >= 0, got $rows")
    require(parts >= 1, s"graft-gen: partitions must be >= 1, got $parts")
    require(perBatch >= 1, s"graft-gen: rowsPerBatch must be >= 1, got $perBatch")
    // standard streaming-source admission option: when set, the source
    // ASKS the engine for a ReadMaxRows limit (getDefaultReadLimit) and
    // latestOffset honors whatever limit comes back
    val maxPerTrigger = Option(opts.get("maxRowsPerTrigger")).map(_.toLong)
    maxPerTrigger.foreach(m => require(m >= 1,
      s"graft-gen: maxRowsPerTrigger must be >= 1, got $m"))
    new GenTable(rows, opt("seed", "42").toLong, parts, perBatch,
      maxPerTrigger)
  }
}

object GenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", LongType, nullable = false),
    StructField("val", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** splitmix64 of (id, seed) — the same pure-function-of-id value
    * contract as datagen.Generators, implementable anywhere. */
  def mix(id: Long, seed: Long): Long = {
    var z = id * 0x9e3779b97f4a7c15L + seed * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

private[graft] class GenTable(rows: Long, seed: Long, parts: Int,
    perBatch: Long = 1000L, maxPerTrigger: Option[Long] = None)
    extends Table with SupportsRead {
  override def name(): String = s"graft_gen(rows=$rows, seed=$seed)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, seed, parts, perBatch, maxPerTrigger)
}

private[graft] class GenScanBuilder(rows: Long, seed: Long, parts: Int,
    perBatch: Long = 1000L, maxPerTrigger: Option[Long] = None)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownAggregates {
  private var required: StructType = GenSource.schema
  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var limit = -1L
  private var agg: Option[Aggregation] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Range predicates on `id` narrow the generated span (generator-
    * side partition pruning); everything else stays post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (acc, rest) = filters.partition {
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case GreaterThan("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Long) => true
      case LessThanOrEqual("id", _: java.lang.Long) => true
      case EqualTo("id", _: java.lang.Long) => true
      case _ => false
    }
    acc.foreach {
      case GreaterThanOrEqual("id", v: java.lang.Long) =>
        lo = math.max(lo, v.longValue)
      case GreaterThan("id", v: java.lang.Long) =>
        lo = math.max(lo, v.longValue + 1)
      case LessThan("id", v: java.lang.Long) =>
        hi = math.min(hi, v.longValue)
      case LessThanOrEqual("id", v: java.lang.Long) =>
        hi = math.min(hi, v.longValue + 1)
      case EqualTo("id", v: java.lang.Long) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case _ => ()
    }
    accepted = acc
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted

  /** LIMIT truncates the generated id span EXACTLY (any `limit` rows
    * satisfy an unordered LIMIT, and a narrowed range is the cheapest
    * way to produce them), so the push is complete — Spark may drop
    * its own limit node above the scan. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed(): Boolean = false

  private def isId(e: V2Expression): Boolean = e match {
    case r: NamedReference =>
      r.fieldNames.length == 1 && r.fieldNames()(0) == "id"
    case _ => false
  }
  // Closed-form aggregates on a generated range: COUNT(*) = span
  // length, MIN(id)/MAX(id) = span ends, COUNT(id) = COUNT(*) (id is
  // non-null by schema). grp/val/tag extrema are NOT closed-form (they
  // are hash functions of id), so those stay post-scan.
  private def supportedAgg(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    case c: Count => !c.isDistinct && isId(c.column)
    case m: Min => isId(m.column)
    case m: Max => isId(m.column)
    case _ => false
  }
  /** Complete, not partial: the scan emits the final single aggregate
    * row, no partial-merge above it. Only claimed when every function
    * is closed-form on the id span and there is no grouping. */
  override def supportCompletePushDown(a: Aggregation): Boolean =
    a.groupByExpressions.isEmpty && a.aggregateExpressions.nonEmpty &&
      a.aggregateExpressions.forall(supportedAgg)
  override def pushAggregation(a: Aggregation): Boolean = {
    if (!supportCompletePushDown(a)) return false
    agg = Some(a)
    true
  }

  override def build(): Scan = {
    agg match {
      // DSv2 semantics (cf. JDBC): a limit pushed alongside a pushed
      // aggregate applies to the AGGREGATED output, not the input span
      // — the agg scan emits exactly one row, so any limit >= 1 is a
      // no-op and must NOT truncate the pre-aggregate id span (a
      // truncated span would make COUNT(*) = min(n, limit)). Today
      // EliminateLimits removes Limit above a global aggregate
      // (maxRows = 1) so the combination is unreachable, but we don't
      // couple correctness to that optimizer internal.
      case Some(a) => new GenAggScan(lo, hi, a)
      case None =>
        // filters narrowed [lo, hi) first; a pushed limit truncates it
        // EXACTLY (any `limit` rows satisfy an unordered LIMIT)
        val hiL = if (limit >= 0) math.min(hi, lo + limit) else hi
        new GenScan(lo, hiL, seed, parts, required, perBatch, maxPerTrigger)
    }
  }
}

/** Completely-pushed aggregate scan: one partition, one row, values
  * computed closed-form from the (post-filter, post-limit) id span —
  * the generator's analog of parquet footer-stats aggregate pushdown. */
private[graft] class GenAggScan(lo: Long, hi: Long, agg: Aggregation)
    extends Scan with Batch with SupportsReportStatistics {
  private val n = math.max(hi - lo, 0L)
  /** A completely-pushed global aggregate emits exactly one row. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(8L * agg.aggregateExpressions.length.max(1))
    override def numRows(): OptionalLong = OptionalLong.of(1L)
  }
  private val funcs = agg.aggregateExpressions.toIndexedSeq
  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case (f, i) =>
      val countLike = f.isInstanceOf[CountStar] || f.isInstanceOf[Count]
      StructField(s"agg_$i", LongType, nullable = !countLike)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-gen [$lo, $hi) PushedAggregates: [${funcs.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GenPartition(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = funcs.map {
      case _: CountStar => n
      case _: Count => n // count(id), id non-null
      case _: Min => if (n > 0) lo else null
      case _: Max => if (n > 0) hi - 1 else null
      case f => throw new IllegalStateException(s"unsupported pushed agg $f")
    }.toArray
    new GenAggReaderFactory(values)
  }
}

private[graft] class GenAggReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(values.toSeq)
      override def close(): Unit = ()
    }
  }
}

private[graft] class GenScan(lo0: Long, hi0: Long, seed: Long, parts: Int,
    required: StructType, perBatch: Long = 1000L,
    maxPerTrigger: Option[Long] = None) extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeV2Filtering {
  // Runtime-narrowed span: starts at the compile-time pushed range and
  // shrinks further if a runtime filter (DPP subquery result) arrives
  // before partition planning.
  private var lo = lo0
  private var hi = hi0

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-gen [$lo, $hi) seed=$seed PushedIdRange: [$lo, $hi)"

  /** Post-pushdown stats (numRows = the narrowed span, width = the
    * PRUNED schema) so Catalyst's join planning sees the real scan
    * output size — a filtered graft-gen side under the broadcast
    * threshold broadcasts like a filtered parquet scan would. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(hi - lo, 0L)
    private val rowBytes = required.fields.map(_.dataType match {
      case StringType => 20L // "t<d>" + UTF8String overhead estimate
      case _ => 8L
    }).sum.max(8L)
    override def sizeInBytes(): OptionalLong = OptionalLong.of(n * rowBytes)
    override def numRows(): OptionalLong = OptionalLong.of(n)
  }

  /** Runtime partition pruning (the DSv2 analog of dynamic partition
    * pruning): `id` is span-partitioned, so any runtime predicate that
    * bounds `id` — the IN-set a DPP subquery produces, or a range —
    * narrows [lo, hi) BEFORE planInputPartitions, and pruned spans are
    * simply never generated. Narrowing keeps the span contiguous
    * (IN-set → [min, max]): dropping non-matching rows is the join's
    * job either way; the win here is skipping whole partitions. */
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))
  override def filter(predicates: Array[Predicate]): Unit = {
    def idRef(e: V2Expression): Boolean = e match {
      case r: NamedReference =>
        r.fieldNames.length == 1 && r.fieldNames()(0) == "id"
      case _ => false
    }
    // match via the public Literal interface (the Scala case class's
    // companion is pickled private[sql] in Spark 4.x)
    def lit(e: V2Expression): Option[Long] = e match {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        l.value match {
          case v: java.lang.Long => Some(v.longValue)
          case v: java.lang.Integer => Some(v.longValue)
          case _ => None
        }
      case _ => None
    }
    predicates.foreach { p =>
      (p.name, p.children) match {
        case ("IN", cs) if cs.nonEmpty && idRef(cs.head) =>
          val vs = cs.tail.flatMap(lit)
          // only narrow when EVERY member is a literal we understand —
          // a partially-parsed IN-set must not drop valid spans
          if (vs.length == cs.length - 1 && vs.nonEmpty) {
            lo = math.max(lo, vs.min); hi = math.min(hi, vs.max + 1)
          }
        case ("=", Array(a, b)) if idRef(a) =>
          lit(b).foreach { v => lo = math.max(lo, v); hi = math.min(hi, v + 1) }
        case (">=", Array(a, b)) if idRef(a) =>
          lit(b).foreach(v => lo = math.max(lo, v))
        case (">", Array(a, b)) if idRef(a) =>
          lit(b).foreach(v => lo = math.max(lo, v + 1))
        case ("<=", Array(a, b)) if idRef(a) =>
          lit(b).foreach(v => hi = math.min(hi, v + 1))
        case ("<", Array(a, b)) if idRef(a) =>
          lit(b).foreach(v => hi = math.min(hi, v))
        case _ => () // unrecognized predicates are advisory — keep the span
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    (0 until parts).map { p =>
      GenPartition(lo + n * p / parts, lo + n * (p + 1) / parts)
        : InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(seed, required.fieldNames)

  /** Micro-batch streaming read of the same deterministic rows: ids
    * advance `rowsPerBatch` per trigger from lo until the span is
    * exhausted, so `readStream.format("graft-gen")` is a bounded,
    * replayable event feed (offsets are plain id positions — a
    * restarted query resumes from the checkpointed id and regenerates
    * IDENTICAL rows, the pure-hash-of-id contract doing the
    * exactly-once work). Column pruning applies to the stream exactly
    * as to the batch scan (`required` is shared). */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GenMicroBatchStream(lo, hi, seed, parts, perBatch,
      required.fieldNames, maxPerTrigger)
}

private[graft] class GenOffset(val endId: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = endId.toString
}

private[graft] class GenMicroBatchStream(lo: Long, hi: Long, seed: Long,
    parts: Int, perBatch: Long, fields: Array[String],
    maxPerTrigger: Option[Long] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}
  // STATELESS offsets: the next offset is a pure function of the START
  // offset the engine hands in (SupportsAdmissionControl), so a
  // restarted query structurally cannot regress below its checkpoint —
  // a mutable high-water mark would reset with the new stream instance
  // and re-emit committed id ranges (caught by the restart spec).
  override def initialOffset(): Offset = new GenOffset(lo)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-gen uses the SupportsAdmissionControl latestOffset(start, limit)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // honor the engine's admission control: ReadMaxRows (set by
    // maxRowsPerTrigger-style options or Trigger.AvailableNow's
    // chunking) CAPS the advance below this source's own perBatch —
    // maxRowsPerTrigger is a TIGHTENING-ONLY knob by contract (a limit
    // looser than rowsPerBatch leaves rowsPerBatch in charge; raise
    // rowsPerBatch to grow batches). A CompositeReadLimit contributes
    // exactly its ReadMaxRows component (a max-rows bound inside a
    // composite is still a hard row cap); ReadAllAvailable, a
    // composite without one, and anything unrecognized keep perBatch
    // (this source has no rate concept beyond rows, so ReadMaxFiles-
    // style components have nothing to bound here).
    import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadMaxRows}
    def maxRowsOf(l: ReadLimit): Option[Long] = l match {
      case r: ReadMaxRows => Some(r.maxRows)
      case c: CompositeReadLimit =>
        val caps = c.getReadLimits.toSeq.flatMap(maxRowsOf)
        if (caps.isEmpty) None else Some(caps.min)
      case _ => None
    }
    val cap = maxRowsOf(limit).fold(perBatch)(math.min(perBatch, _))
    new GenOffset(
      math.min(hi, start.asInstanceOf[GenOffset].endId + cap))
  }
  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(m => ReadLimit.maxRows(m))
      .getOrElse(ReadLimit.allAvailable())
  override def deserializeOffset(json: String): Offset =
    new GenOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GenOffset].endId
    val e = end.asInstanceOf[GenOffset].endId
    val n = math.max(e - s, 0L)
    (0 until parts).map { p =>
      GenPartition(s + n * p / parts, s + n * (p + 1) / parts): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(seed, fields)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[graft] case class GenPartition(start: Long, end: Long)
    extends InputPartition

private[graft] class GenReaderFactory(seed: Long, fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var cur = gp.start - 1
      override def next(): Boolean = { cur += 1; cur < gp.end }
      override def get(): InternalRow = {
        // materialize ONLY the pruned fields, in the pruned order
        val vals: Seq[Any] = fields.toSeq.map {
          case "id" => cur
          case "grp" => java.lang.Math.floorMod(GenSource.mix(cur, seed), 100L)
          case "val" =>
            java.lang.Math.floorMod(GenSource.mix(cur, seed + 1), 1000000L)
          case "tag" => UTF8String.fromString(
            "t" + java.lang.Math.floorMod(GenSource.mix(cur, seed + 2), 8L))
        }
        InternalRow.fromSeq(vals)
      }
      override def close(): Unit = ()
    }
  }
}
