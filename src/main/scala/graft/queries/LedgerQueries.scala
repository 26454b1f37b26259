package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Ledger-style operator coverage on `events`: last-wins dedup (J6),
  * JSON attribute extraction (F13), sweep-style ranking (A16), and OFAT
  * sensitivity (A17). */
object LedgerQueries extends QueryPack {

  private val Priority =
    """CASE event_type WHEN 'purchase' THEN 0 WHEN 'signup' THEN 1
      | WHEN 'click' THEN 2 WHEN 'view' THEN 3 ELSE 4 END""".stripMargin

  override def queries: Seq[(String, QueryDef)] = Seq(

    // J6: last-wins dedup — highest-priority row per (user, day).
    "q36_lastwins_dedup" -> QueryDef(
      (s, dir) => {
        val prio = expr(Priority)
        val w = Window.partitionBy(col("user_id"), col("day_ms"))
          .orderBy(prio.asc, col("ts_ns").asc)
        Tables.events(s, dir)
          .withColumn("day_ms", unix_millis(date_trunc("day", col("ts_utc"))))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(col("user_id"), col("day_ms"), col("event_id"), col("event_type"))
          .orderBy(col("user_id"), col("day_ms"))
      },
      Some(s"""SELECT user_id, day_ms, event_id, event_type FROM (
          SELECT user_id, epoch_ms(date_trunc('day', ts)) AS day_ms, event_id, event_type,
            row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                               ORDER BY $Priority, epoch_ns(ts)) AS rn
          FROM events) t
        WHERE rn = 1 ORDER BY user_id, day_ms"""),
      "Last-wins priority dedup per key+bucket (SURVEY J6)"),

    // F13: JSON-encoded attribute extraction + aggregation.
    "q37_props_json" -> QueryDef(
      (s, dir) => {
        Tables.events(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy((col("k") % 10).as("k_bucket"))
          .agg(count(lit(1)).as("n_events"),
            round(avg(col("value")), 4).as("avg_value"),
            max(col("k")).as("max_k"))
          .orderBy(col("k_bucket"))
      },
      Some("""SELECT k % 10 AS k_bucket, count(*) AS n_events,
          round(avg(value), 4) AS avg_value, max(k) AS max_k
        FROM (SELECT json_extract_string(props, '$.k')::INT AS k, value FROM events) t
        GROUP BY k % 10 ORDER BY k_bucket"""),
      "JSON attribute extract + agg (SURVEY F13)"),

    // A16: sweep-style ranking with stable tie-break. Ranked via the
    // scalable two-pass GlobalRank (range partition + zipWithIndex), not
    // an unpartitioned window — this query must not single-task at scale.
    "q38_user_ranking" -> QueryDef(
      (s, dir) => {
        val ranked = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(round(sum(col("value")), 2).as("objective"),
            count(lit(1)).as("n_events"))
        graft.ops.GlobalRank.withRowNumber(ranked,
            Seq(col("objective").desc, col("user_id").asc), "rank")
          .select(col("rank").cast("int").as("rank"), col("user_id"),
            col("objective"), col("n_events"))
          .orderBy(col("rank"))
      },
      Some("""SELECT row_number() OVER (ORDER BY round(sum(value), 2) DESC, user_id) AS rank,
          user_id, round(sum(value), 2) AS objective, count(*) AS n_events
        FROM events GROUP BY user_id ORDER BY rank"""),
      "Deterministic objective ranking, stable tie-break (SURVEY A16/W15)"),

    // A17: OFAT sensitivity across two categorical parameters.
    "q39_ofat_sensitivity" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("session",
            graft.discovery.Discovery.sessionFromUtcHour(hour(col("ts_utc"))))
        val exploded = ev.select(col("value"),
          expr("stack(2, 'event_type', event_type, 'session', session) as (param, level)"))
        exploded.groupBy(col("param"), col("level"))
          .agg(avg(col("value")).as("mean_value"), count(lit(1)).as("n"))
          .groupBy(col("param"))
          .agg(round(max(col("mean_value")) - min(col("mean_value")), 6).as("influence"),
            countDistinct(col("level")).as("n_levels"))
          .orderBy(col("param"))
      },
      Some("""WITH se AS (SELECT value, event_type,
          CASE WHEN extract(hour FROM ts) >= 22 OR extract(hour FROM ts) < 8 THEN 'sydney_tokyo'
               WHEN extract(hour FROM ts) >= 8 AND extract(hour FROM ts) < 16 THEN 'london'
               WHEN extract(hour FROM ts) >= 16 AND extract(hour FROM ts) < 21 THEN 'new_york'
               ELSE 'transition' END AS session FROM events),
        exploded AS (
          SELECT value, 'event_type' AS param, event_type AS level FROM se
          UNION ALL SELECT value, 'session', session FROM se),
        lvl AS (SELECT param, level, avg(value) AS mean_value FROM exploded GROUP BY 1, 2)
        SELECT param, round(max(mean_value) - min(mean_value), 6) AS influence,
          count(DISTINCT level) AS n_levels
        FROM lvl GROUP BY param ORDER BY param"""),
      "OFAT sensitivity: influence = max-min of level means (SURVEY A17)"),

    // §3.1 phase 6: the sequential simulation kernel, replaying the
    // reference's benchmark workload (40 scenarios, ~1.5M ticks,
    // RSI+Bollinger strategy, seeded latency). Rows-only: the kernel is
    // not SQL-expressible; correctness is covered by SimKernelSpec's
    // exact-P&L scripted trades, determinism by byte-identical reruns.
    "q40_tick_replay" -> QueryDef(
      (s, _) => graft.sim.TickReplay.run(s)
        .orderBy(col("scenarioId")),
      None,
      "Per-scenario simulation kernel: 1.5M-tick replay (SURVEY ST5/ST9/ST10)")
  )
}
