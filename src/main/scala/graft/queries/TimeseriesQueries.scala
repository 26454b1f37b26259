package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.bars.Ohlcv
import graft.discovery.Discovery
import graft.indicators.Indicators
import graft.ops.{AsOfJoin, SequentialOps}

/** Time-series operator coverage over the `events` stream table
  * (SURVEY §2.5 windows/indicators, §2.3 J1 as-of, §2.4 A1 resample).
  *
  * events(ts) is nanosecond-precision parquet; all timestamps surface as
  * epoch-ms longs (`Tables.events` / DuckDB `epoch_ms`) so both engines
  * hash identical values. Every window is ordered by the raw nano value
  * (`ts_ns` / `epoch_ns(ts)`), which is unique in this data — total order,
  * deterministic results.
  */
object TimeseriesQueries extends QueryPack {

  /** Shared DuckDB CTE exposing the same normalized event columns as
    * [[Tables.events]]. */
  private val BaseCte =
    """base AS (SELECT event_id, user_id, event_type, value, ts,
      |  epoch_ns(ts) AS ts_ns, epoch_ms(ts) AS ts_ms FROM events)""".stripMargin

  override def queries: Seq[(String, QueryDef)] = Seq(

    // A1: tick→OHLCV resample, hourly buckets per user.
    "q15_ohlcv_hourly" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        Ohlcv.render(ev, Seq(col("user_id")),
            unix_millis(date_trunc("hour", col("ts_utc"))),
            col("value"), col("value"), col("ts_ns"), col("event_id"))
          .withColumnRenamed("bucket", "bucket_ms")
          .withColumn("volume", round(col("volume"), 2))
          .orderBy(col("user_id"), col("bucket_ms"))
      },
      Some(s"""WITH $BaseCte,
        r AS (SELECT *, epoch_ms(date_trunc('hour', ts)) AS bucket_ms,
          row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                             ORDER BY ts_ns, event_id) AS rn_a,
          row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                             ORDER BY ts_ns DESC, event_id DESC) AS rn_d
          FROM base)
        SELECT user_id, bucket_ms,
          max(CASE WHEN rn_a = 1 THEN value END) AS open,
          max(value) AS high, min(value) AS low,
          max(CASE WHEN rn_d = 1 THEN value END) AS close,
          round(sum(value), 2) AS volume, count(*) AS tick_count
        FROM r GROUP BY user_id, bucket_ms ORDER BY user_id, bucket_ms"""),
      "Tick→OHLCV resample; empty buckets yield no rows (SURVEY A1/ST3)"),

    // W3 + A19: gap detection and category counts.
    "q16_gap_report" -> QueryDef(
      (s, dir) => {
        Discovery.gaps(Tables.events(s, dir), Seq("user_id"), "ts_ms",
            expectedIntervalMs = 600000L, gapFactor = 2.0)
          .groupBy(col("category"))
          .agg(count(lit(1)).as("n_gaps"),
            round(avg(col("delta_ms")), 4).as("avg_gap_ms"),
            max(col("delta_ms")).as("max_gap_ms"))
          .orderBy(col("category"))
      },
      Some(s"""WITH $BaseCte,
        d AS (SELECT ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ns) AS delta_ms
          FROM base),
        g AS (SELECT delta_ms,
          CASE WHEN delta_ms <= 3600000 THEN 'short'
               WHEN delta_ms <= 21600000 THEN 'moderate'
               WHEN delta_ms <= 172800000 THEN 'large'
               ELSE 'extended' END AS category
          FROM d WHERE delta_ms > 1200000)
        SELECT category, count(*) AS n_gaps, round(avg(delta_ms), 4) AS avg_gap_ms,
          max(delta_ms) AS max_gap_ms
        FROM g GROUP BY category ORDER BY category"""),
      "Consecutive-gap detect + classify + count (SURVEY W3/A19)"),

    // F16: the same gap detection, classified by the forex market
    // calendar — weekend closures and fixed holidays are benign, not
    // outages. The holiday branch fires on this data (Jan 1 in range);
    // weekend-pattern branches are pinned by MarketCalendarSpec.
    "q45_calendar_gaps" -> QueryDef(
      (s, dir) => {
        Discovery.gapsCalendar(Tables.events(s, dir), Seq("user_id"), "ts_ms",
            expectedIntervalMs = 600000L, gapFactor = 2.0)
          .groupBy(col("category"))
          .agg(count(lit(1)).as("n_gaps"),
            round(avg(col("delta_ms")), 4).as("avg_gap_ms"),
            max(col("delta_ms")).as("max_gap_ms"))
          .orderBy(col("category"))
      },
      Some(s"""WITH $BaseCte,
        d AS (SELECT ts_ms, lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ns) AS p
          FROM base),
        g AS (SELECT p, ts_ms, ts_ms - p AS delta_ms,
          (ts_ms - p) / 1000.0 AS gap_s, (ts_ms - p) / 1000.0 / 3600.0 AS gap_h,
          (p // 86400000 + 3) % 7 AS sd_dow, (p % 86400000) // 3600000 AS sd_hour,
          (ts_ms // 86400000 + 3) % 7 AS ed_dow, (ts_ms % 86400000) // 3600000 AS ed_hour,
          make_timestamp(p * 1000)::DATE AS sdate,
          make_timestamp(ts_ms * 1000)::DATE AS edate
          FROM d WHERE ts_ms - p > 1200000),
        c AS (SELECT delta_ms,
          CASE WHEN gap_s < 5.0 THEN 'seamless'
               WHEN (sd_dow = 4 AND sd_hour >= 20 AND ed_dow = 6 AND ed_hour <= 22
                     AND gap_h BETWEEN 40.0 AND 80.0)
                 OR (sd_dow = 5 AND ed_dow = 6 AND ed_hour <= 22
                     AND gap_h BETWEEN 24.0 AND 50.0) THEN 'weekend'
               WHEN gap_h >= 20.0 AND (
                 (CASE WHEN make_date(year(sdate), 12, 25) >= sdate
                       THEN make_date(year(sdate), 12, 25)
                       ELSE make_date(year(sdate) + 1, 12, 25) END) <= edate
                 OR
                 (CASE WHEN make_date(year(sdate), 1, 1) >= sdate
                       THEN make_date(year(sdate), 1, 1)
                       ELSE make_date(year(sdate) + 1, 1, 1) END) <= edate)
                 THEN 'holiday'
               WHEN gap_h < 0.5 THEN 'short'
               WHEN gap_h < 4.0 THEN 'moderate'
               ELSE 'large' END AS category
          FROM g)
        SELECT category, count(*) AS n_gaps, round(avg(delta_ms), 4) AS avg_gap_ms,
          max(delta_ms) AS max_gap_ms
        FROM c GROUP BY category ORDER BY category"""),
      "Market-calendar gap classification: weekend/holiday-aware (F16)"),

    // F3 + A5: session tagging and per-session stats.
    "q17_session_stats" -> QueryDef(
      (s, dir) => {
        Tables.events(s, dir)
          .withColumn("session", Discovery.sessionFromUtcHour(hour(col("ts_utc"))))
          .groupBy(col("session"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            round(sum(col("value")), 2).as("sum_value"),
            round(avg(col("value")), 4).as("avg_value"))
          .orderBy(col("session"))
      },
      Some(s"""WITH $BaseCte,
        t AS (SELECT *, extract(hour FROM ts) AS h FROM base),
        se AS (SELECT *,
          CASE WHEN h >= 22 OR h < 8 THEN 'sydney_tokyo'
               WHEN h >= 8 AND h < 16 THEN 'london'
               WHEN h >= 16 AND h < 21 THEN 'new_york'
               ELSE 'transition' END AS session FROM t)
        SELECT session, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
          round(sum(value), 2) AS sum_value, round(avg(value), 4) AS avg_value
        FROM se GROUP BY session ORDER BY session"""),
      "UTC-hour session mapping + session summaries (SURVEY F3/A5)"),

    // J1: backward as-of join (purchases ← latest prior view per user).
    "q18_asof_join" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val ticks = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_ns"), col("ts_ms"))
        val signals = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts_ns"),
            col("event_id").as("sig_id"), col("value").as("sig_value"),
            col("ts_ms").as("sig_ts_ms"))
        AsOfJoin.backward(ticks, signals, Seq("user_id"), "ts_ns", "ts_ns",
            Seq("sig_id", "sig_value", "sig_ts_ms"))
          .withColumn("staleness_ms", col("ts_ms") - col("sig_ts_ms"))
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            col("sig_id"), col("sig_value"), col("staleness_ms"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT t.event_id, t.user_id, epoch_ms(t.ts) AS ts_ms,
          s.sig_id, s.sig_value, epoch_ms(t.ts) - s.sig_ts_ms AS staleness_ms
        FROM (SELECT * FROM events WHERE event_type = 'purchase') t
        ASOF LEFT JOIN (SELECT user_id, ts, event_id AS sig_id, value AS sig_value,
                        epoch_ms(ts) AS sig_ts_ms
                        FROM events WHERE event_type = 'view') s
          ON t.user_id = s.user_id AND t.ts >= s.ts
        ORDER BY t.event_id"""),
      "Backward as-of join, union+window idiom vs native ASOF (SURVEY J1)"),

    // J1 mirrored: FORWARD as-of — each purchase attaches the NEXT view
    // at or after it (bisect_left vs backward's bisect_right - 1). Same
    // union+window idiom with the time axis reversed; DuckDB's ASOF
    // supports the direction natively (ON t.ts <= s.ts).
    "q79_asof_forward" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val ticks = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_ns"), col("ts_ms"))
        val signals = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts_ns"),
            col("event_id").as("sig_id"), col("value").as("sig_value"),
            col("ts_ms").as("sig_ts_ms"))
        AsOfJoin.forward(ticks, signals, Seq("user_id"), "ts_ns", "ts_ns",
            Seq("sig_id", "sig_value", "sig_ts_ms"))
          .withColumn("lead_ms", col("sig_ts_ms") - col("ts_ms"))
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            col("sig_id"), col("sig_value"), col("lead_ms"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT t.event_id, t.user_id, epoch_ms(t.ts) AS ts_ms,
          s.sig_id, s.sig_value, s.sig_ts_ms - epoch_ms(t.ts) AS lead_ms
        FROM (SELECT * FROM events WHERE event_type = 'purchase') t
        ASOF LEFT JOIN (SELECT user_id, ts, event_id AS sig_id, value AS sig_value,
                        epoch_ms(ts) AS sig_ts_ms
                        FROM events WHERE event_type = 'view') s
          ON t.user_id = s.user_id AND t.ts <= s.ts
        ORDER BY t.event_id"""),
      "Forward as-of join: next right row at/after (SURVEY J1 mirrored)"),

    // J1 at scale: the SAME as-of semantics through the skew-safe
    // time-bucket-salted path (bounded tasks under a dominant key, carry
    // repair across sparse buckets) — verified against the identical
    // native-ASOF oracle as q18, so the salted rewrite is proven
    // result-equivalent, not just spec'd.
    "q73_asof_salted" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val ticks = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_ns"), col("ts_ms"))
        val signals = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts_ns"),
            col("event_id").as("sig_id"), col("value").as("sig_value"),
            col("ts_ms").as("sig_ts_ms"))
        // 6h buckets on the nano axis
        AsOfJoin.backwardSalted(ticks, signals, Seq("user_id"), "ts_ns", "ts_ns",
            Seq("sig_id", "sig_value", "sig_ts_ms"), bucketMs = 6L * 3600 * 1000 * 1000000L)
          .withColumn("staleness_ms", col("ts_ms") - col("sig_ts_ms"))
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            col("sig_id"), col("sig_value"), col("staleness_ms"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT t.event_id, t.user_id, epoch_ms(t.ts) AS ts_ms,
          s.sig_id, s.sig_value, epoch_ms(t.ts) - s.sig_ts_ms AS staleness_ms
        FROM (SELECT * FROM events WHERE event_type = 'purchase') t
        ASOF LEFT JOIN (SELECT user_id, ts, event_id AS sig_id, value AS sig_value,
                        epoch_ms(ts) AS sig_ts_ms
                        FROM events WHERE event_type = 'view') s
          ON t.user_id = s.user_id AND t.ts >= s.ts
        ORDER BY t.event_id"""),
      "Skew-safe bucketed as-of join, result-equal to q18 (SURVEY J1 at scale)"),

    // J1 as a first-class Catalyst operator: custom logical node +
    // planner strategy + physical sort-merge as-of
    // (graft.plans.NativeAsOf), checked against the IDENTICAL native
    // DuckDB ASOF oracle as q18/q73 — all three join paths are proven
    // result-equal on the same data.
    "q74_asof_native" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val ticks = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_ns"), col("ts_ms"))
        val signals = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts_ns"),
            col("event_id").as("sig_id"), col("value").as("sig_value"),
            col("ts_ms").as("sig_ts_ms"))
        graft.plans.NativeAsOf.backward(ticks, signals, Seq("user_id"),
            "ts_ns", "ts_ns", Seq("sig_id", "sig_value", "sig_ts_ms"))
          .withColumn("staleness_ms", col("ts_ms") - col("sig_ts_ms"))
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            col("sig_id"), col("sig_value"), col("staleness_ms"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT t.event_id, t.user_id, epoch_ms(t.ts) AS ts_ms,
          s.sig_id, s.sig_value, epoch_ms(t.ts) - s.sig_ts_ms AS staleness_ms
        FROM (SELECT * FROM events WHERE event_type = 'purchase') t
        ASOF LEFT JOIN (SELECT user_id, ts, event_id AS sig_id, value AS sig_value,
                        epoch_ms(ts) AS sig_ts_ms
                        FROM events WHERE event_type = 'view') s
          ON t.user_id = s.user_id AND t.ts >= s.ts
        ORDER BY t.event_id"""),
      "Native Catalyst as-of node (custom plan + strategy), result-equal to q18 (SURVEY §4)"),

    // The SAME native as-of operator through SQL SYNTAX: the parser
    // interceptor + resolution rule (graft.plans.AsofSql) turn
    // `ASOF JOIN ... ON keys AND l.ts >= r.ts` into AsOfJoinNode —
    // checked against the identical DuckDB native-ASOF oracle as
    // q18/q73/q74, so all FOUR as-of paths are proven result-equal.
    "q76_asof_sql" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_ns"), col("ts_ms"))
          .createOrReplaceTempView("graft_asof_ticks")
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts_ns").as("sig_ts_ns"),
            col("event_id").as("sig_id"), col("value").as("sig_value"),
            col("ts_ms").as("sig_ts_ms"))
          .createOrReplaceTempView("graft_asof_signals")
        s.sql("""
          SELECT t.event_id, t.user_id, t.ts_ms, s.sig_id, s.sig_value,
                 t.ts_ms - s.sig_ts_ms AS staleness_ms
          FROM graft_asof_ticks t ASOF JOIN graft_asof_signals s
            ON t.user_id = s.user_id AND t.ts_ns >= s.sig_ts_ns
          ORDER BY t.event_id""")
      },
      Some("""SELECT t.event_id, t.user_id, epoch_ms(t.ts) AS ts_ms,
          s.sig_id, s.sig_value, epoch_ms(t.ts) - s.sig_ts_ms AS staleness_ms
        FROM (SELECT * FROM events WHERE event_type = 'purchase') t
        ASOF LEFT JOIN (SELECT user_id, ts, event_id AS sig_id, value AS sig_value,
                        epoch_ms(ts) AS sig_ts_ms
                        FROM events WHERE event_type = 'view') s
          ON t.user_id = s.user_id AND t.ts >= s.ts
        ORDER BY t.event_id"""),
      "ASOF JOIN SQL syntax (parser interceptor + resolution rule) planning to the native merge exec"),

    // W9: OBV running signed-volume sum.
    "q19_obv" -> QueryDef(
      (s, dir) => {
        Indicators.obv(Tables.events(s, dir), Seq("user_id"), Seq("ts_ns"),
            close = "value", volume = "value")
          .select(col("user_id"), col("event_id"), round(col("obv"), 2).as("obv"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some(s"""WITH $BaseCte,
        d AS (SELECT *, lag(value) OVER w AS prev FROM base
              WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns)),
        sv AS (SELECT *, CASE WHEN prev IS NULL THEN 0
                              WHEN value > prev THEN value
                              WHEN value < prev THEN -value ELSE 0 END AS signed_v FROM d)
        SELECT user_id, event_id,
          round(sum(signed_v) OVER (PARTITION BY user_id ORDER BY ts_ns
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS obv
        FROM sv ORDER BY user_id, event_id"""),
      "OBV cumulative signed volume (SURVEY W9)"),

    // W7: Bollinger bands + %B.
    "q20_bollinger" -> QueryDef(
      (s, dir) => {
        Indicators.bollinger(Tables.events(s, dir), Seq("user_id"), Seq("ts_ns"),
            close = "value", period = 20, k = 2.0)
          .filter(col("bb_mid").isNotNull)
          .select(col("user_id"), col("event_id"),
            round(col("bb_mid"), 4).as("bb_mid"),
            round(col("bb_upper"), 4).as("bb_upper"),
            round(col("bb_lower"), 4).as("bb_lower"),
            round(col("bb_pct_b"), 4).as("bb_pct_b"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some(s"""WITH $BaseCte,
        f AS (SELECT *, count(*) OVER fr AS n, avg(value) OVER fr AS mid,
                stddev_samp(value) OVER fr AS sd
              FROM base
              WINDOW fr AS (PARTITION BY user_id ORDER BY ts_ns
                            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        SELECT user_id, event_id, round(mid, 4) AS bb_mid,
          round(mid + 2.0 * sd, 4) AS bb_upper,
          round(mid - 2.0 * sd, 4) AS bb_lower,
          round(CASE WHEN sd > 0 THEN (value - (mid - 2.0 * sd)) / (4.0 * sd) END, 4) AS bb_pct_b
        FROM f WHERE n >= 20 ORDER BY user_id, event_id"""),
      "Bollinger bands + raw %B over trailing window (SURVEY W7)"),

    // W6: RSI (simple-mean variant).
    "q21_rsi" -> QueryDef(
      (s, dir) => {
        Indicators.rsi(Tables.events(s, dir), Seq("user_id"), Seq("ts_ns"),
            close = "value", period = 14)
          .filter(col("rsi").isNotNull)
          .select(col("user_id"), col("event_id"), round(col("rsi"), 4).as("rsi"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some(s"""WITH $BaseCte,
        d AS (SELECT *, value - lag(value) OVER (PARTITION BY user_id ORDER BY ts_ns) AS d
              FROM base),
        f AS (SELECT *, count(d) OVER fr AS nd,
                avg(CASE WHEN d > 0 THEN d ELSE 0 END) OVER fr AS gain,
                avg(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER fr AS loss
              FROM d
              WINDOW fr AS (PARTITION BY user_id ORDER BY ts_ns
                            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        SELECT user_id, event_id,
          round(CASE WHEN loss = 0 THEN 100.0
                     ELSE 100.0 - 100.0 / (1.0 + gain / loss) END, 4) AS rsi
        FROM f WHERE nd >= 14 ORDER BY user_id, event_id"""),
      "RSI simple-mean variant over trailing deltas (SURVEY W6)"),

    // W4: sliding extreme-move scan over global hourly bars.
    "q22_extreme_moves" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir).withColumn("sym", lit("ALL"))
        val bars = Ohlcv.render(ev, Seq(col("sym")),
            unix_millis(date_trunc("hour", col("ts_utc"))),
            col("value"), col("value"), col("ts_ns"), col("event_id"))
          .withColumnRenamed("bucket", "bucket_ms")
        val withTr = Indicators.trueRange(bars, Seq("sym"), Seq("bucket_ms"),
          "high", "low", "close")
        val trailing = Window.partitionBy(col("sym")).orderBy(col("bucket_ms"))
          .rowsBetween(-13, 0)
        val withAtr = withTr
          .withColumn("atr",
            when(count(col("tr")).over(trailing) >= 14, avg(col("tr")).over(trailing)))
        val moves = Discovery.extremeMoves(withAtr, Seq("sym"), Seq("bucket_ms"),
          "open", "high", "low", "close", "atr",
          size = 8, moveAtr = 1.5, adverseAtr = 1.0)
        moves.select(col("bucket_ms"), col("direction"),
            round(col("entry"), 4).as("entry"), round(col("exit"), 4).as("exit_px"),
            round(col("move_atr_multiple"), 4).as("move_atr_multiple"))
          .orderBy(col("direction"), col("bucket_ms"))
      },
      Some(s"""WITH $BaseCte,
        r AS (SELECT *, epoch_ms(date_trunc('hour', ts)) AS bucket_ms,
          row_number() OVER (PARTITION BY date_trunc('hour', ts)
                             ORDER BY ts_ns, event_id) AS rn_a,
          row_number() OVER (PARTITION BY date_trunc('hour', ts)
                             ORDER BY ts_ns DESC, event_id DESC) AS rn_d
          FROM base),
        bars AS (SELECT bucket_ms,
            max(CASE WHEN rn_a = 1 THEN value END) AS open,
            max(value) AS high, min(value) AS low,
            max(CASE WHEN rn_d = 1 THEN value END) AS close
          FROM r GROUP BY bucket_ms),
        tr AS (SELECT *, CASE WHEN lag(close) OVER w IS NULL THEN high - low
            ELSE greatest(high - low, abs(high - lag(close) OVER w),
                          abs(low - lag(close) OVER w)) END AS tr
          FROM bars WINDOW w AS (ORDER BY bucket_ms)),
        atr AS (SELECT *, CASE WHEN count(tr) OVER fr >= 14 THEN avg(tr) OVER fr END AS atr
          FROM tr WINDOW fr AS (ORDER BY bucket_ms ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
        scan AS (SELECT *, row_number() OVER (ORDER BY bucket_ms) AS idx,
            max(high) OVER fwd AS win_high, min(low) OVER fwd AS win_low,
            lead(close, 7) OVER (ORDER BY bucket_ms) AS exit_px,
            avg(atr) OVER fwd AS mean_atr, count(*) OVER fwd AS n
          FROM atr WINDOW fwd AS (ORDER BY bucket_ms ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)),
        eligible AS (SELECT * FROM scan
          WHERE (idx - 1) % 2 = 0 AND n = 8 AND mean_atr IS NOT NULL AND mean_atr > 0)
        SELECT bucket_ms, 'LONG' AS direction, round(open, 4) AS entry, round(exit_px, 4) AS exit_px,
          round((exit_px - open) / mean_atr, 4) AS move_atr_multiple
        FROM eligible
        WHERE (exit_px - open) / mean_atr >= 1.5 AND (open - win_low) / mean_atr <= 1.0
        UNION ALL
        SELECT bucket_ms, 'SHORT' AS direction, round(open, 4) AS entry, round(exit_px, 4) AS exit_px,
          round((open - exit_px) / mean_atr, 4) AS move_atr_multiple
        FROM eligible
        WHERE (open - exit_px) / mean_atr >= 1.5 AND (win_high - open) / mean_atr <= 1.0
        ORDER BY direction, bucket_ms"""),
      "Sliding extreme-move scan: bars→TR→SMA-ATR→windows (SURVEY W1/W4)"),

    // W2: pct_change outlier counts.
    "q23_pct_outliers" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"))
        Tables.events(s, dir)
          .withColumn("prev", lag(col("value"), 1).over(w))
          .withColumn("pct",
            when(col("prev").isNotNull && col("prev") =!= 0.0,
              abs(col("value") / col("prev") - 1.0)))
          .groupBy(col("user_id"))
          .agg(sum(when(col("pct") > 5.0, 1L).otherwise(0L)).as("n_outliers"),
            round(max(col("pct")), 4).as("max_pct"))
          .filter(col("n_outliers") > 0)
          .orderBy(col("user_id"))
      },
      Some(s"""WITH $BaseCte,
        d AS (SELECT *, lag(value) OVER (PARTITION BY user_id ORDER BY ts_ns) AS prev FROM base),
        p AS (SELECT *, CASE WHEN prev IS NOT NULL AND prev <> 0
                             THEN abs(value / prev - 1.0) END AS pct FROM d)
        SELECT user_id, sum(CASE WHEN pct > 5.0 THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
          round(max(pct), 4) AS max_pct
        FROM p GROUP BY user_id HAVING sum(CASE WHEN pct > 5.0 THEN 1 ELSE 0 END) > 0
        ORDER BY user_id"""),
      "pct_change outlier quality gate (SURVEY W2/P5)"),

    // §4.1: recursive EMA — the custom sequential kernel vs recursive CTE.
    "q24_ema" -> QueryDef(
      (s, dir) => {
        SequentialOps.ema(Tables.events(s, dir), Seq("user_id"), Seq("ts_ns"),
            "value", alpha = 0.2, "ema")
          .select(col("user_id"), col("event_id"), round(col("ema"), 6).as("ema"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH RECURSIVE ordered AS (
          SELECT user_id, event_id, value,
            row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)) AS rn
          FROM events),
        ema AS (
          SELECT user_id, event_id, rn, value, value AS ema FROM ordered WHERE rn = 1
          UNION ALL
          SELECT o.user_id, o.event_id, o.rn, o.value, 0.2 * o.value + 0.8 * e.ema
          FROM ordered o JOIN ema e ON o.user_id = e.user_id AND o.rn = e.rn + 1)
        SELECT user_id, event_id, round(ema, 6) AS ema
        FROM ema ORDER BY user_id, event_id"""),
      "Recursive EMA via per-key sequential scan kernel (SURVEY §4.1)"),

    // A3+A4: hourly volatility profiling -> regime classification vs the
    // global mean -> regime distribution (the reference's volatility
    // profile chain, volatility_profile_analyzer.py:449-624).
    "q41_volatility_regimes" -> QueryDef(
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(unix_millis(date_trunc("hour", col("ts_utc"))).as("bucket_ms"))
          .agg(count(lit(1)).as("tick_count"),
            (max(col("value")) - min(col("value"))).as("range_val"))
          .filter(col("tick_count") > 0)
        val g = hourly.agg(avg(col("range_val")).as("g_avg"))
        hourly.crossJoin(broadcast(g))
          .withColumn("ratio", col("range_val") / col("g_avg"))
          .withColumn("regime",
            when(col("ratio") < 0.3, "very_low")
              .when(col("ratio") < 0.8, "low")
              .when(col("ratio") < 1.2, "medium")
              .when(col("ratio") < 2.0, "high")
              .otherwise("very_high"))
          .groupBy(col("regime"))
          .agg(count(lit(1)).as("n_periods"),
            sum(col("tick_count")).as("sum_ticks"),
            round(avg(col("ratio")), 6).as("avg_ratio"))
          .orderBy(col("regime"))
      },
      Some(s"""WITH $BaseCte,
        hourly AS (
          SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms,
            count(*) AS tick_count, max(value) - min(value) AS range_val
          FROM base GROUP BY 1),
        g AS (SELECT avg(range_val) AS g_avg FROM hourly),
        r AS (SELECT h.*, range_val / g_avg AS ratio,
          CASE WHEN range_val / g_avg < 0.3 THEN 'very_low'
               WHEN range_val / g_avg < 0.8 THEN 'low'
               WHEN range_val / g_avg < 1.2 THEN 'medium'
               WHEN range_val / g_avg < 2.0 THEN 'high'
               ELSE 'very_high' END AS regime
          FROM hourly h, g)
        SELECT regime, count(*) AS n_periods, sum(tick_count)::BIGINT AS sum_ticks,
          round(avg(ratio), 6) AS avg_ratio
        FROM r GROUP BY regime ORDER BY regime"""),
      "Hourly profiling -> regime classify -> distribution (SURVEY A3/A4)"),

    // W11: percentile rank of each period's activity within its user.
    "q42_percentile_rank" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("value_pct_rank", round(percent_rank().over(w), 6))
          .select(col("user_id"), col("event_id"), col("value_pct_rank"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
          round(percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id), 6)
            AS value_pct_rank
        FROM events ORDER BY user_id, event_id"""),
      "percent_rank within partition (SURVEY W11)"),

    // §4 stretch goal: recursive EMA as a native Catalyst
    // AggregateWindowFunction — same oracle as q24, exercised through
    // `ema(value, 0.2) OVER (PARTITION BY ... ORDER BY ...)` instead of
    // the mapPartitions kernel. State lives in the window operator's
    // aggregate buffer; the plan is Exchange+Sort+Window, nothing else.
    "q43_ema_window_function" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"))
        Tables.events(s, dir)
          .withColumn("ema", graft.functions.GraftFunctions.ema(col("value"), 0.2).over(w))
          .select(col("user_id"), col("event_id"), round(col("ema"), 6).as("ema"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH RECURSIVE ordered AS (
          SELECT user_id, event_id, value,
            row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)) AS rn
          FROM events),
        ema AS (
          SELECT user_id, event_id, rn, value, value AS ema FROM ordered WHERE rn = 1
          UNION ALL
          SELECT o.user_id, o.event_id, o.rn, o.value, 0.2 * o.value + 0.8 * e.ema
          FROM ordered o JOIN ema e ON o.user_id = e.user_id AND o.rn = e.rn + 1)
        SELECT user_id, event_id, round(ema, 6) AS ema
        FROM ema ORDER BY user_id, event_id"""),
      "Custom Catalyst AggregateWindowFunction ema() (SURVEY §4 stretch)")
  )
}
