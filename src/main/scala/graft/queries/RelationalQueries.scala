package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator coverage (SURVEY §2.2 filters, §2.3 joins,
  * §2.4 aggregations, §2.6 sorts/limits, §2.7 set ops, §2.8 scalar fns)
  * over the TPC-H-ish testdata. Each query is deliberately shaped to
  * exercise one operator family with a plan that scales: filters push to
  * the parquet scan, dimension joins broadcast, fact aggregations partial-
  * aggregate map-side.
  */
object RelationalQueries extends QueryPack {

  override def queries: Seq[(String, QueryDef)] = Seq(

    // A-family: the flagship grouped aggregation (TPC-H Q1 shape).
    "q01_pricing_summary" -> QueryDef(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(avg(col("l_discount")), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        round(avg(l_quantity), 4) AS avg_qty,
        round(avg(l_extendedprice), 4) AS avg_price,
        round(avg(l_discount), 6) AS avg_disc,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-01-01'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
      "Grouped aggregation with partial map-side agg (SURVEY A1/A7 family)"),

    // P-family: predicate + projection, pushed to the scan.
    "q02_filter_project" -> QueryDef(
      (s, dir) => {
        Tables.orders(s, dir)
          .filter(col("o_orderdate").between(
            lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))
            && col("o_orderstatus") === "O")
          .select(
            col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            date_trunc("month", col("o_orderdate")).as("order_month"),
            when(col("o_orderpriority").startsWith("1") ||
              col("o_orderpriority").startsWith("2"), "high")
              .otherwise("normal").as("priority_class"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
        date_trunc('month', o_orderdate)::TIMESTAMP AS order_month,
        CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
             THEN 'high' ELSE 'normal' END AS priority_class
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
          AND o_orderstatus = 'O'
        ORDER BY o_orderkey"""),
      "Time-range filter + projection, parquet pushdown (SURVEY P1/P3)"),

    // J4: dimension lookup joins (broadcast).
    "q03_region_rollup" -> QueryDef(
      (s, dir) => {
        Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_customers"),
            round(sum(col("c_acctbal")), 2).as("sum_acctbal"),
            round(avg(col("c_acctbal")), 4).as("avg_acctbal"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name, count(*) AS n_customers,
        round(sum(c_acctbal), 2) AS sum_acctbal,
        round(avg(c_acctbal), 4) AS avg_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name"""),
      "Snowflake dimension joins, broadcast both dims (SURVEY J4)"),

    // Fact-to-fact join + aggregation. The join and the segment
    // aggregate carry ORDERS, not line items: lineitem pre-aggregates to
    // (orderkey, revenue partial, line count) before the join (guide
    // §2.3 aggregate-before-shuffle), so the orderkey exchange moves one
    // row per order in the date range, the countDistinct disappears
    // outright (post-join each surviving orderkey is exactly one row —
    // o_orderkey is unique in orders — so n_orders is a plain count),
    // and n_lines is the sum of the per-order counts. Revenue
    // reassociates the per-order partial sums, the same FP-sum class as
    // every partial aggregate; the 2-dp round + oracle hash gate it.
    "q04_revenue_segment" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(col("l_orderkey"))
          .agg(
            sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("__rev"),
            count(lit(1)).as("__nl"))
        li.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            round(sum(col("__rev")), 2).as("revenue"),
            count(lit(1)).as("n_orders"),
            sum(col("__nl")).as("n_lines"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        count(DISTINCT o_orderkey) AS n_orders,
        count(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      "Fact join + shuffled agg + countDistinct (SURVEY A18 family)"),

    // J5-style semi/anti semantics in ONE shuffle: left-join the distinct
    // order-custkey set and count conditionally — same answer as separate
    // left_semi + left_anti + total aggregations at a third of the plan.
    // (The left_anti operator itself is exercised by TickIngest.dedup.)
    "q05_semi_anti" -> QueryDef(
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val nat = broadcast(Tables.nation(s, dir))
        val orderCust = Tables.orders(s, dir).select(col("o_custkey")).distinct()
        cust.join(orderCust, col("c_custkey") === col("o_custkey"), "left")
          .join(nat, col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_customers"),
            sum(when(col("o_custkey").isNotNull, 1L).otherwise(0L)).as("n_with_orders"),
            sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_without_orders"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, count(*) AS n_customers,
        sum(CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
                 THEN 1 ELSE 0 END)::BIGINT AS n_with_orders,
        sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
                 THEN 1 ELSE 0 END)::BIGINT AS n_without_orders
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name"""),
      "Semi/anti-join counts in one shuffle (SURVEY J5 family)"),

    // O6/W5: top-N per partition.
    "q06_top_orders" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .withColumn("price_rank", row_number().over(w))
          .filter(col("price_rank") <= 3)
          .select(col("o_orderpriority"), col("price_rank"),
            col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderpriority"), col("price_rank"))
      },
      Some("""SELECT o_orderpriority, price_rank, o_orderkey, o_totalprice FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
          FROM orders) t
        WHERE price_rank <= 3 ORDER BY o_orderpriority, price_rank"""),
      "Deterministic top-N per group via row_number (SURVEY W5/O6)"),

    // Grouping sets (beyond-reference per SURVEY §2.4 'missing vs classic').
    "q07_rollup" -> QueryDef(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"),
            grouping(col("l_returnflag")).as("__g_rf"),
            grouping(col("l_linestatus")).as("__g_ls"))
          .select(
            when(col("__g_rf") === 1, "ALL")
              .otherwise(col("l_returnflag")).as("returnflag"),
            when(col("__g_ls") === 1, "ALL")
              .otherwise(col("l_linestatus")).as("linestatus"),
            col("sum_qty"), col("n_rows"))
          .orderBy(col("returnflag"), col("linestatus"))
      },
      Some("""SELECT
        CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
        CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
        sum(l_quantity) AS sum_qty, count(*) AS n_rows
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus"""),
      "ROLLUP grouping sets (north-star operator beyond the reference)"),

    // U4 + set operations.
    "q08_setops" -> QueryDef(
      (s, dir) => {
        val custN = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey")).distinct()
        val suppN = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")).distinct()
        val both = custN.intersect(suppN).withColumn("tag", lit("both"))
        val custOnly = custN.except(suppN).withColumn("tag", lit("customer_only"))
        both.unionByName(custOnly)
          .select(col("tag"), col("nationkey"))
          .orderBy(col("tag"), col("nationkey"))
      },
      Some("""SELECT 'both' AS tag, nationkey FROM (
          SELECT DISTINCT c_nationkey AS nationkey FROM customer
          INTERSECT SELECT DISTINCT s_nationkey FROM supplier) a
        UNION ALL
        SELECT 'customer_only' AS tag, nationkey FROM (
          SELECT DISTINCT c_nationkey AS nationkey FROM customer
          EXCEPT SELECT DISTINCT s_nationkey FROM supplier) b
        ORDER BY tag, nationkey"""),
      "distinct / intersect / except / union (SURVEY U1-U4)"),

    // A4: regime classification against a global statistic.
    "q09_qty_regime" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val globalAvg = li.agg(avg(col("l_quantity")).as("g_avg"))
        li.crossJoin(broadcast(globalAvg))
          .withColumn("ratio", col("l_quantity") / col("g_avg"))
          .withColumn("regime",
            when(col("ratio") < 0.5, "very_low")
              .when(col("ratio") < 0.9, "low")
              .when(col("ratio") < 1.1, "normal")
              .when(col("ratio") < 1.5, "high")
              .otherwise("very_high"))
          .groupBy(col("regime"))
          .agg(count(lit(1)).as("n_lines"), round(avg(col("ratio")), 6).as("avg_ratio"))
          .orderBy(col("regime"))
      },
      Some("""WITH g AS (SELECT avg(l_quantity) AS g_avg FROM lineitem)
        SELECT regime, count(*) AS n_lines, round(avg(ratio), 6) AS avg_ratio FROM (
          SELECT l_quantity / g_avg AS ratio,
            CASE WHEN l_quantity / g_avg < 0.5 THEN 'very_low'
                 WHEN l_quantity / g_avg < 0.9 THEN 'low'
                 WHEN l_quantity / g_avg < 1.1 THEN 'normal'
                 WHEN l_quantity / g_avg < 1.5 THEN 'high'
                 ELSE 'very_high' END AS regime
          FROM lineitem, g) t
        GROUP BY regime ORDER BY regime"""),
      "Regime classification vs global mean (SURVEY A4), broadcast scalar"),

    // A12/A13: order statistics. Exact percentiles via distributed
    // selection (ops/OrderStats) rather than the `percentile` aggregate:
    // the aggregate buffers every group value in ONE buffer (3 groups =
    // 3 buffers holding the whole table — a scale-killer for near-unique
    // doubles like l_extendedprice); OrderStats range-partitions the sort
    // so a big group spans partitions, and collects only the ≤2 rows per
    // (group, percentile) that the interpolation needs. Same exact
    // results (bit-compatible interpolation formula), spec'd + oracle'd.
    "q10_stats" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val base = li.groupBy(col("l_returnflag"))
          .agg(
            round(stddev_pop(col("l_quantity")), 6).as("sd_qty"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"),
            count(lit(1)).as("n"))
        val pct = graft.ops.OrderStats.groupedPercentiles(li, "l_returnflag",
          Seq(graft.ops.OrderStats.PctSpec("l_quantity", 0.5, "median_raw"),
            graft.ops.OrderStats.PctSpec("l_extendedprice", 0.95, "p95_raw")))
        base.join(broadcast(pct), Seq("l_returnflag"))
          .select(col("l_returnflag"),
            round(col("median_raw"), 6).as("median_qty"),
            round(col("p95_raw"), 4).as("p95_price"),
            col("sd_qty"), col("min_qty"), col("max_qty"), col("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
        round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
        round(stddev_pop(l_quantity), 6) AS sd_qty,
        min(l_quantity) AS min_qty, max(l_quantity) AS max_qty, count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      "Exact percentiles + population stddev (SURVEY A12/A13)"),

    // F6/F7: string normalization functions.
    "q11_part_strings" -> QueryDef(
      (s, dir) => {
        Tables.part(s, dir)
          .withColumn("type_norm",
            lower(regexp_replace(col("p_type"), "[^A-Za-z0-9]+", "_")))
          .groupBy(col("type_norm"))
          .agg(count(lit(1)).as("n_parts"),
            countDistinct(col("p_brand")).as("n_brands"),
            max(col("p_size")).as("max_size"),
            round(sum(col("p_retailprice")), 2).as("sum_price"))
          .orderBy(col("type_norm"))
      },
      Some("""SELECT lower(regexp_replace(p_type, '[^A-Za-z0-9]+', '_', 'g')) AS type_norm,
        count(*) AS n_parts, count(DISTINCT p_brand) AS n_brands,
        max(p_size) AS max_size, round(sum(p_retailprice), 2) AS sum_price
        FROM part GROUP BY 1 ORDER BY type_norm"""),
      "String normalize (lower + regexp_replace, SURVEY F6) + agg"),

    // F2/F4/F5: datetime bucketing + epoch conversion.
    "q12_monthly_orders" -> QueryDef(
      (s, dir) => {
        Tables.orders(s, dir)
          .withColumn("order_month", date_trunc("month", col("o_orderdate")))
          .groupBy(col("order_month"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("sum_totalprice"))
          .withColumn("month_epoch_ms", unix_millis(col("order_month")))
          .select(col("order_month"), col("month_epoch_ms"),
            col("n_orders"), col("sum_totalprice"))
          .orderBy(col("order_month"))
      },
      Some("""SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS order_month,
        epoch_ms(date_trunc('month', o_orderdate)::TIMESTAMP) AS month_epoch_ms,
        count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_totalprice
        FROM orders GROUP BY 1 ORDER BY order_month"""),
      "date_trunc bucketing + epoch-ms conversion (SURVEY F2/F4/F5)"),

    // J3-style range predicate join + interval arithmetic.
    "q13_ship_latency" -> QueryDef(
      (s, dir) => {
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(when(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"), 1L)
              .otherwise(0L)).as("n_within_30d"),
            count(lit(1)).as("n_lines"))
          .withColumn("within_ratio",
            round(col("n_within_30d").cast("double") / col("n_lines"), 6))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
        sum(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 1 ELSE 0 END)::BIGINT AS n_within_30d,
        count(*) AS n_lines,
        round(sum(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 1 ELSE 0 END)::DOUBLE
              / count(*), 6) AS within_ratio
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      "Interval arithmetic + range predicate on join (SURVEY J3/F2)"),

    // Running cumulative window over a fact table.
    "q14_running_totals" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir)
          .filter(col("o_custkey") <= 50)
          .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
          .withColumn("order_seq", row_number().over(
            Window.partitionBy(col("o_custkey"))
              .orderBy(col("o_orderdate"), col("o_orderkey"))))
          .select(col("o_custkey"), col("order_seq"), col("o_orderkey"),
            col("o_totalprice"), col("running_spend"))
          .orderBy(col("o_custkey"), col("order_seq"))
      },
      Some("""SELECT o_custkey,
        row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq,
        o_orderkey, o_totalprice,
        round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        FROM orders WHERE o_custkey <= 50
        ORDER BY o_custkey, order_seq"""),
      "Running cumulative sums (SURVEY W9/A20 family)"),

    // F15: currency display formatting, pure codegen'd built-ins
    // (format_number + translate + map-literal symbol lookup). The
    // currency is derived deterministically from the key so both engines
    // exercise every style family (EN / DE / CH / identity-symbol /
    // FMT_NONE fallback) and the sign-dropping abs() on real negatives
    // (c_acctbal < 0 exists in TPC-H customers).
    "q77_currency_format" -> QueryDef(
      (s, dir) => {
        val codes = Seq("USD", "EUR", "GBP", "JPY", "CHF", "SEK", "BRL", "ZZZ")
        Tables.customer(s, dir)
          .withColumn("currency",
            element_at(typedlit(codes), (pmod(col("c_custkey"), lit(8)) + 1).cast("int")))
          .select(
            col("c_custkey"),
            col("currency"),
            graft.functions.CurrencyFormat.symbol(col("currency")),
            graft.functions.CurrencyFormat
              .formatCurrency(col("c_acctbal"), col("currency")))
          .orderBy(col("c_custkey"))
      },
      Some("""WITH c AS (
          SELECT c_custkey, c_acctbal,
            (['USD','EUR','GBP','JPY','CHF','SEK','BRL','ZZZ'])[(c_custkey % 8)::INT + 1] AS currency
          FROM customer),
        f AS (
          SELECT c_custkey, currency, c_acctbal,
            CASE currency
              WHEN 'USD' THEN '$' WHEN 'EUR' THEN '€' WHEN 'GBP' THEN '£'
              WHEN 'JPY' THEN '¥' WHEN 'SEK' THEN 'kr' WHEN 'BRL' THEN 'R$'
              ELSE currency END AS symbol,
            -- DuckDB's format() refuses thousands grouping on floats:
            -- group the integer cents instead (c_acctbal is 2-dp).
            format('{:,}', (round(abs(c_acctbal) * 100)::BIGINT // 100))
              || '.' || lpad((round(abs(c_acctbal) * 100)::BIGINT % 100)::VARCHAR, 2, '0') AS base
          FROM c),
        g AS (
          SELECT c_custkey, currency, symbol,
            CASE
              WHEN currency IN ('EUR','BRL') THEN translate(base, ',.', '.,')
              WHEN currency = 'CHF' THEN replace(base, ',', chr(39))
              WHEN currency IN ('USD','GBP','JPY') THEN base
              ELSE replace(base, ',', '') END AS styled
          FROM f)
        SELECT c_custkey, currency, symbol,
          CASE WHEN symbol = currency THEN currency || ' ' || styled
               ELSE symbol || styled END AS formatted
        FROM g ORDER BY c_custkey"""),
      "Currency display formatting, all style families (SURVEY F15)")
  )
}
