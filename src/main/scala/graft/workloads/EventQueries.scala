package graft.workloads

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.CatalogQuery
import graft.sources.Tables

/** Event-stream analytics over the `events` fixture, expressed in batch
  * so the DuckDB oracle can check them. The same transforms are reused
  * by the Structured Streaming workloads (graft.streaming) — windowed
  * aggregation, sessionization, dedup are the stateful-op semantics
  * mandated by SURVEY.md §7.5 (the reference itself has no streaming,
  * SURVEY §2.9).
  *
  * Scale notes: every query keys its shuffle by (window/user) so state
  * partitions evenly; sessionization is a single window-function pass
  * (one shuffle on user_id), not a per-user collect.
  */
object EventQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  val all: Seq[CatalogQuery] = Seq(

    CatalogQuery(
      "e01_tumbling_window",
      "Tumbling 1-hour window aggregation by event type (window() → epoch-aligned buckets)",
      (s, dir) => {
        ev(s, dir)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), Parity.dsum(col("value"), 2).as("total_value"))
          .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("total_value"))
          .orderBy(col("hour_start"), col("event_type"))
      },
      Some(s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
             |  count(*) AS n, ${Parity.dsumSql("value", 2)} AS total_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY hour_start, event_type""".stripMargin)),

    CatalogQuery(
      "e02_sliding_window",
      "Sliding window (1 hour every 30 min) counts — each event lands in two overlapping windows",
      (s, dir) => {
        ev(s, dir)
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"), Parity.davg(col("value"), 2).as("avg_value"))
          .select(col("window.start").as("win_start"), col("n"), col("avg_value"))
          .orderBy(col("win_start"))
      },
      Some(s"""WITH hits AS (
             |  SELECT unnest([b, b - INTERVAL 30 MINUTE]) AS win_start, value
             |  FROM (SELECT make_timestamp(CAST(floor(epoch(ts)/1800)*1800 AS BIGINT)*1000000) AS b,
             |               value FROM events))
             |SELECT win_start, count(*) AS n, ${Parity.davgSql("value", 2)} AS avg_value
             |FROM hits
             |GROUP BY win_start
             |ORDER BY win_start""".stripMargin)),

    CatalogQuery(
      "e03_sessionize",
      "Gap-based sessionization (30-min inactivity) via lag + running sum — one shuffle on user_id",
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gapUs = 30L * 60 * 1000000
        val marked = ev(s, dir)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("is_new",
            when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1L)
              .otherwise(0L))
        marked
          .withColumn("session_id",
            sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"), Parity.dsum(col("value"), 2).as("session_value"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some(s"""WITH marked AS (
             |  SELECT user_id, ts, event_id, value,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |         THEN 1 ELSE 0 END AS is_new
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, value,
             |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM marked)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |  count(*) AS n_events, ${Parity.dsumSql("value", 2)} AS session_value
             |FROM sess
             |GROUP BY 1, 2
             |ORDER BY user_id, session_id""".stripMargin)),

    CatalogQuery(
      "e04_first_event_dedup",
      "Keyed dedup keeping earliest event per (user, type) — row_number()=1 (streaming dropDuplicates semantics)",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        ev(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""SELECT user_id, event_type, event_id, ts
             |FROM (SELECT user_id, event_type, event_id, ts,
             |        row_number() OVER (PARTITION BY user_id, event_type
             |          ORDER BY ts, event_id) AS rn
             |      FROM events)
             |WHERE rn = 1
             |ORDER BY user_id, event_type""".stripMargin)),

    CatalogQuery(
      "e05_json_extract",
      "Semi-structured extraction: JSON props field → typed aggregation (get_json_object)",
      (s, dir) => {
        ev(s, dir)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"),
            coalesce(sum(col("k")), lit(0L)).as("sum_k"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(k) AS DOUBLE) / count(k) AS avg_k,
             |  CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k
             |FROM (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    CatalogQuery(
      "e06_stream_enrich",
      "Stream-static enrichment: events joined to the customer dimension (broadcast), hourly counts by market segment",
      (s, dir) => {
        // batch twin of EventsStream.enrichedSegmentCounts: the
        // dimension is static and small relative to the stream, so the
        // join must broadcast — the stream side never shuffles for the
        // enrichment, only for the windowed aggregate.
        val dim = broadcast(Tables.table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")))
        ev(s, dir)
          .join(dim, col("user_id") === col("c_custkey"))
          .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), Parity.dsum(col("value"), 2).as("total_value"))
          .select(col("window.start").as("hour_start"), col("c_mktsegment"),
            col("n"), col("total_value"))
          .orderBy(col("hour_start"), col("c_mktsegment"))
      },
      Some(s"""SELECT date_trunc('hour', ts) AS hour_start, c_mktsegment,
             |  count(*) AS n, ${Parity.dsumSql("value", 2)} AS total_value
             |FROM events JOIN customer ON user_id = c_custkey
             |GROUP BY 1, 2
             |ORDER BY hour_start, c_mktsegment""".stripMargin)),

    CatalogQuery(
      "e07_interval_join",
      "Purchase-to-click attribution: each purchase joined to the same user's clicks in the preceding hour — batch twin of the stream-stream interval join (EventsStream.purchaseAttribution)",
      (s, dir) => {
        // The equi-key (user_id) carries the shuffle; the time range is
        // a join-condition filter evaluated on co-partitioned rows, so
        // no time-bucketing blowup and no cross join. The streaming
        // twin bounds the same computation's state with watermarks
        // (EventsStream.purchaseAttribution); lag is an exact integer
        // microsecond difference so the row set value-oracles with no
        // fp parity concern.
        val e = ev(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
            unix_micros(col("ts")).as("click_us"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"),
            col("event_id").as("purchase_id"),
            unix_micros(col("ts")).as("purchase_us"))
        purchases.join(clicks,
            col("p_user") === col("c_user") &&
              col("click_us") >= col("purchase_us") - lit(3600000000L) &&
              col("click_us") <= col("purchase_us"))
          .select(col("p_user").as("user_id"), col("purchase_id"),
            col("click_id"),
            (col("purchase_us") - col("click_us")).as("lag_us"))
          .orderBy(col("user_id"), col("purchase_id"), col("click_id"))
      },
      Some("""SELECT p.user_id, p.event_id AS purchase_id,
             |  c.event_id AS click_id,
             |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
             |FROM events p JOIN events c
             |  ON c.user_id = p.user_id AND c.event_type = 'click'
             |  AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
             |  AND epoch_us(c.ts) <= epoch_us(p.ts)
             |WHERE p.event_type = 'purchase'
             |ORDER BY 1, 2, 3""".stripMargin)),

    CatalogQuery(
      "e07b_interval_join_outer",
      "Left-outer purchase-to-click attribution: every purchase kept, null click columns when no click preceded it within the hour — batch twin of EventsStream.purchaseAttributionOuter",
      (s, dir) => {
        // Same equi-key + range-condition shape as e07 but LEFT joined:
        // the outer flavor is the one whose streaming twin
        // (EventsStream.purchaseAttributionOuter) must wait out the
        // watermark before emitting a null-padded row, so its batch
        // ground truth earns a full value oracle — unmatched purchases
        // must appear exactly once with null click_id/lag_us, and the
        // matched subset must equal e07 row-for-row.
        val e = ev(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
            unix_micros(col("ts")).as("click_us"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"),
            col("event_id").as("purchase_id"),
            unix_micros(col("ts")).as("purchase_us"))
        purchases.join(clicks,
            col("p_user") === col("c_user") &&
              col("click_us") >= col("purchase_us") - lit(3600000000L) &&
              col("click_us") <= col("purchase_us"),
            "left")
          .select(col("p_user").as("user_id"), col("purchase_id"),
            col("click_id"),
            (col("purchase_us") - col("click_us")).as("lag_us"))
          .orderBy(col("user_id"), col("purchase_id"),
            col("click_id").asc_nulls_first)
      },
      Some("""SELECT p.user_id, p.event_id AS purchase_id,
             |  c.event_id AS click_id,
             |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON c.user_id = p.user_id
             |  AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
             |  AND epoch_us(c.ts) <= epoch_us(p.ts)
             |ORDER BY 1, 2, 3 NULLS FIRST""".stripMargin)),

    CatalogQuery(
      "e08_funnel_conversion",
      "Strict-order funnel view -> click -> purchase: first view, first click AFTER it, first purchase after THAT — per-stage user counts + e6 conversion from the previous stage (the ordered-sequence pattern the windowed/join e-ops don't cover)",
      (s, dir) => {
        // The min-timestamp cascade: each stage is one type-filtered
        // hashed aggregate on user_id joined to the previous stage's
        // watermark — three O(users) relations, no window, no
        // sequence explosion, order enforced by strict ts comparison
        // (a click BEFORE the user's first view does not convert). The
        // e6 conversion uses integer division in both engines.
        val e = ev(s, dir).select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("us") > col("v_us"))
          .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("us") > col("c_us"))
          .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
        def stage(df: DataFrame, n: Long, name: String) =
          df.agg(count(lit(1)).as("n_users"))
            .select(lit(n).as("stage"), lit(name).as("stage_name"),
              col("n_users"))
        val rows = stage(v, 1L, "view")
          .unionByName(stage(c, 2L, "click_after_view"))
          .unionByName(stage(p, 3L, "purchase_after_click"))
        // the conv window runs over the 3 STAGE rows, never event data;
        // stage 1's conversion is definitionally 1e6, later stages go
        // NULL when the previous stage is empty (an empty funnel must
        // not read as 100% conversion)
        rows
          .select(col("stage"), col("stage_name"), col("n_users"),
            when(col("stage") === 1, lit(1000000L))
              .otherwise(expr("n_users * 1000000L div " +
                "nullif(lag(n_users, 1) over (order by stage), 0L)"))
              .as("conv_e6"))
          .orderBy(col("stage"))
      },
      Some("""WITH v AS (SELECT user_id, min(epoch_us(ts)) AS v_us
             |  FROM events WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS c_us
             |  FROM events e JOIN v ON v.user_id = e.user_id
             |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.v_us
             |  GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
             |  FROM events e JOIN c ON c.user_id = e.user_id
             |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c_us
             |  GROUP BY e.user_id),
             |st AS (
             |  SELECT 1 AS stage, 'view' AS stage_name,
             |    (SELECT count(*) FROM v) AS n_users
             |  UNION ALL SELECT 2, 'click_after_view', (SELECT count(*) FROM c)
             |  UNION ALL SELECT 3, 'purchase_after_click', (SELECT count(*) FROM p))
             |SELECT CAST(stage AS BIGINT) AS stage, stage_name,
             |  CAST(n_users AS BIGINT) AS n_users,
             |  CAST(CASE WHEN stage = 1 THEN 1000000
             |    ELSE n_users * 1000000 //
             |      nullif(lag(n_users, 1) OVER (ORDER BY stage), 0) END
             |    AS BIGINT) AS conv_e6
             |FROM st ORDER BY stage""".stripMargin)),

    CatalogQuery(
      "e09_stream_drift",
      "Distribution-drift monitor: per-day event-type PSI contributions against the global reference histogram (tx24's Laplace-smoothed arithmetic on event-time windows) — the traffic-shift alarm; batch twin of EventsStream.driftContributions",
      (s, dir) => {
        // Fully relational here so DuckDB mirrors it (the streaming
        // form takes the reference as driver data and keeps ONE
        // stateful agg — EventsStream.driftContributions; the
        // StreamingSpec pins value-parity between the two). Every
        // relation is (days x types)-bounded after map-combined
        // counts: window-type cells cross-joined from the broadcast
        // reference so ZERO-count cells exist and smoothing prices
        // them; absent-from-window types are the drift signal.
        val e = ev(s, dir)
        val day = window(col("ts"), "1 day").getField("start")
        val wt = e.groupBy(day.as("day_start"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val wtot = e.groupBy(day.as("day_start"))
          .agg(count(lit(1)).as("n_w"))
        val ref = e.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
        val g = e.agg(count(lit(1)).as("nn"))
          .crossJoin(ref.agg(count(lit(1)).as("t")))
        val cells = wtot.crossJoin(broadcast(ref))
          .join(wt, Seq("day_start", "event_type"), "left")
          .withColumn("n", coalesce(col("n"), lit(0L)))
          .crossJoin(broadcast(g))
        cells.select(col("day_start"), col("event_type"), col("n"),
          graft.ext.TextOps.psiCellExpr(col("n"), col("n_w"),
            col("n_t"), col("nn"), col("t")).as("psi_contrib"))
          .orderBy(col("day_start"), col("event_type"))
      },
      Some("""WITH wt AS (
             |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
             |    event_type, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |wtot AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)
             |      AS day_start,
             |    count(*) AS n_w
             |  FROM events GROUP BY 1),
             |ref AS (SELECT event_type, count(*) AS n_t
             |  FROM events GROUP BY 1),
             |g AS (SELECT (SELECT count(*) FROM events) AS nn,
             |  (SELECT count(*) FROM ref) AS t),
             |cells AS (
             |  SELECT w.day_start, r.event_type, w.n_w, r.n_t,
             |    coalesce(wt.n, 0) AS n
             |  FROM wtot w CROSS JOIN ref r
             |  LEFT JOIN wt ON wt.day_start = w.day_start
             |    AND wt.event_type = r.event_type)
             |SELECT c.day_start, c.event_type, CAST(c.n AS BIGINT) AS n,
             |  round((CAST(c.n + 1 AS DOUBLE) / (c.n_w + g.t)
             |       - CAST(c.n_t + 1 AS DOUBLE) / (g.nn + g.t))
             |    * ln((CAST(c.n + 1 AS DOUBLE) / (c.n_w + g.t))
             |        / (CAST(c.n_t + 1 AS DOUBLE) / (g.nn + g.t))), 6)
             |    AS psi_contrib
             |FROM cells c, g ORDER BY c.day_start, c.event_type""".stripMargin)),

    CatalogQuery(
      "e11_attribution_window",
      "Windowed attribution funnel: view -> click -> purchase where each step must land within 24h of the previous stage's watermark — e08's strict order plus the attribution-window constraint every analytics pipeline bills by; reports per-stage users, conversion, and mean step delay",
      (s, dir) => {
        // e08's min-timestamp cascade with a bounded qualifying
        // window: the stage watermark is the FIRST qualifying event
        // (strictly after the previous watermark AND within W of it),
        // so a click 3 days later no longer converts. Same scale
        // shape — three type-filtered hashed O(users) aggregates, no
        // window over event data; the previous stage's watermark
        // rides along each aggregate (min of a per-user constant) so
        // the delay sums need no extra join.
        val W = 86400000000L // 24h in microseconds
        val e = ev(s, dir).select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id")
          .filter(col("us") > col("v_us") && col("us") <= col("v_us") + W)
          .groupBy(col("user_id"))
          .agg(min(col("us")).as("c_us"), min(col("v_us")).as("v_us"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c.select(col("user_id"), col("c_us")), "user_id")
          .filter(col("us") > col("c_us") && col("us") <= col("c_us") + W)
          .groupBy(col("user_id"))
          .agg(min(col("us")).as("p_us"), min(col("c_us")).as("c_us"))
        def stage(df: DataFrame, n: Long, name: String,
            delay: Option[org.apache.spark.sql.Column]) =
          df.agg(count(lit(1)).as("n_users"),
              delay.map(sum(_)).getOrElse(lit(null).cast("long"))
                .as("dsum"))
            .select(lit(n).as("stage"), lit(name).as("stage_name"),
              col("n_users"),
              expr("dsum div nullif(n_users, 0)").as("avg_delay_us"))
        val rows = stage(v, 1L, "view", None)
          .unionByName(stage(c, 2L, "click_within_24h",
            Some(col("c_us") - col("v_us"))))
          .unionByName(stage(p, 3L, "purchase_within_24h",
            Some(col("p_us") - col("c_us"))))
        rows
          .select(col("stage"), col("stage_name"), col("n_users"),
            col("avg_delay_us"),
            when(col("stage") === 1, lit(1000000L))
              .otherwise(expr("n_users * 1000000L div " +
                "nullif(lag(n_users, 1) over (order by stage), 0L)"))
              .as("conv_e6"))
          .orderBy(col("stage"))
      },
      Some("""WITH v AS (SELECT user_id, min(epoch_us(ts)) AS v_us
             |  FROM events WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS c_us,
             |    min(v.v_us) AS v_us
             |  FROM events e JOIN v ON v.user_id = e.user_id
             |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.v_us
             |    AND epoch_us(e.ts) <= v.v_us + 86400000000
             |  GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS p_us,
             |    min(c.c_us) AS c_us
             |  FROM events e JOIN c ON c.user_id = e.user_id
             |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.c_us
             |    AND epoch_us(e.ts) <= c.c_us + 86400000000
             |  GROUP BY e.user_id),
             |st AS (
             |  SELECT 1 AS stage, 'view' AS stage_name,
             |    (SELECT count(*) FROM v) AS n_users,
             |    CAST(NULL AS BIGINT) AS avg_delay_us
             |  UNION ALL SELECT 2, 'click_within_24h',
             |    (SELECT count(*) FROM c),
             |    (SELECT sum(c_us - v_us) // nullif(count(*), 0) FROM c)
             |  UNION ALL SELECT 3, 'purchase_within_24h',
             |    (SELECT count(*) FROM p),
             |    (SELECT sum(p_us - c_us) // nullif(count(*), 0) FROM p))
             |SELECT CAST(stage AS BIGINT) AS stage, stage_name,
             |  CAST(n_users AS BIGINT) AS n_users,
             |  CAST(avg_delay_us AS BIGINT) AS avg_delay_us,
             |  CAST(CASE WHEN stage = 1 THEN 1000000
             |    ELSE n_users * 1000000 //
             |      nullif(lag(n_users, 1) OVER (ORDER BY stage), 0) END
             |    AS BIGINT) AS conv_e6
             |FROM st ORDER BY stage""".stripMargin)),

    CatalogQuery(
      "e12_retention_cohorts",
      "Retention triangle: users grouped by first-seen day, re-activity counted at day offsets 0-3 with e6 retention vs the cohort size — the product-analytics table behind every retention chart; two map-combined aggregates + one hashed join, (days x 4) rows out at any scale",
      (s, dir) => {
        // The third classic events report alongside sessions (e03) and
        // funnels (e08/e11): cohort users by FIRST-seen day, then ask
        // what fraction was active again k days later. Scale shape:
        // the distinct (user, day) activity relation folds map-side,
        // first-seen is one O(users) min aggregate, the offset join is
        // hashed on user_id, and the report is (days x offsets) rows.
        // Day-0 retention is definitionally 1e6 (a user is active on
        // their own first day), which the oracle equality makes a
        // built-in sanity row per cohort.
        val a = ev(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        val f = a.groupBy(col("user_id")).agg(min(col("d")).as("fd"))
        val j = a.join(f, "user_id")
          .withColumn("off", datediff(col("d"), col("fd")))
          .filter(col("off").between(0, 3))
          .groupBy(col("fd").as("cohort_day"), col("off"))
          .agg(count(lit(1)).as("n_active"))
        val size = j.filter(col("off") === 0)
          .select(col("cohort_day"), col("n_active").as("cohort_n"))
        j.join(size, Seq("cohort_day"))
          // presented as TIMESTAMP (e09's day_start precedent: Spark
          // DATE arrives as python date objects and dtype-fails the
          // driver compare against DuckDB's datetime64)
          .select(col("cohort_day").cast("timestamp").as("cohort_day"),
            col("off").cast("long").as("off"),
            col("n_active"), col("cohort_n"),
            expr("n_active * 1000000 div cohort_n").as("retention_e6"))
          .orderBy(col("cohort_day"), col("off"))
      },
      Some("""WITH a AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
             |f AS (SELECT user_id, min(d) AS fd FROM a GROUP BY user_id),
             |j AS (
             |  SELECT a.d - f.fd AS off, f.fd AS cohort_day
             |  FROM a JOIN f ON f.user_id = a.user_id
             |  WHERE a.d - f.fd BETWEEN 0 AND 3),
             |g AS (SELECT cohort_day, off, count(*) AS n_active
             |      FROM j GROUP BY 1, 2),
             |sz AS (SELECT cohort_day, n_active AS cohort_n FROM g
             |       WHERE off = 0)
             |SELECT CAST(g.cohort_day AS TIMESTAMP) AS cohort_day,
             |  CAST(g.off AS BIGINT) AS off,
             |  CAST(g.n_active AS BIGINT) AS n_active,
             |  CAST(sz.cohort_n AS BIGINT) AS cohort_n,
             |  CAST(g.n_active * 1000000 // sz.cohort_n AS BIGINT)
             |    AS retention_e6
             |FROM g JOIN sz ON sz.cohort_day = g.cohort_day
             |ORDER BY g.cohort_day, g.off""".stripMargin)),

    CatalogQuery(
      "e10_heavy_users",
      "Bounded-memory heavy-user summary: Misra-Gries (k=8) over event traffic — exact map-combined counts compressed by the (k+1)-th-largest subtraction, with the deterministic est/err/n_seen triple whose est <= true <= est+err bound holds at ANY scale; batch twin of HeavyHittersStream",
      (s, dir) => {
        // The whole-table single-batch run of the streaming tracker's
        // compress step (HeavyHittersStream — Misra-Gries, Agarwal et
        // al. PODS'12). Corpus-sized work is ONE map-combined groupBy;
        // the top-(k+1) collect is bounded at 9 rows by construction
        // (the ss11/ss03 driver-page precedent). Unlike tx05's CMS
        // sketch this summary is merge-order-DETERMINISTIC, which is
        // what lets the streaming form promise replay-stable state.
        import s.implicits._
        val sum = graft.streaming.HeavyHittersStream
          .summarizeBatch(ev(s, dir), "user_id", 8)
        sum.counters.map { case (key, est) => (key, est, sum.err, sum.nSeen) }
          .toDF("user_id", "est", "err", "n_seen")
          .orderBy(col("est").desc, col("user_id"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
             |r AS (SELECT user_id, cnt,
             |    row_number() OVER (ORDER BY cnt DESC, user_id) AS rn
             |  FROM c),
             |t AS (SELECT coalesce((SELECT cnt FROM r WHERE rn = 9), 0) AS t,
             |    (SELECT count(*) FROM events) AS n)
             |SELECT CAST(user_id AS BIGINT) AS user_id,
             |  CAST(cnt - t.t AS BIGINT) AS est, CAST(t.t AS BIGINT) AS err,
             |  CAST(t.n AS BIGINT) AS n_seen
             |FROM r, t WHERE rn <= 8 AND cnt - t.t > 0
             |ORDER BY est DESC, user_id""".stripMargin)),
  )
}
