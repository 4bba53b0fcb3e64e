package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator classes from SURVEY.md §2.1/§2.2/§2.5/§2.6/§2.7
  * expressed over the driver star schema, each with a DuckDB oracle.
  *
  * Parity conventions (see SparkEntry scaladoc): decimal-exact double
  * aggregation, full deterministic ordering, identical aliases.
  */
object Relational {

  import QueryUtil.{dec, dsum}

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1/S2/P2: scan + projection + filter — predicate and column
    // pruning must reach the parquet scan (indexer.py:191-236 analogue).
    "s2_scan_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
                col("l_shipdate") <  lit(java.sql.Timestamp.valueOf("1995-04-01 00:00:00")) &&
                col("l_quantity") > lit(45.0))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Q6-shape selective single-row aggregate (decimal-exact product).
    "q6_selective_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
                col("l_shipdate") <  lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
                col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("revenue"),
             count(lit(1)).as("n_rows"))
    }),

    // P3: anti-semijoin (exclude-set) — customers with no URGENT orders
    // (search.py:69-70 exclude_ids analogue). The exclude set is a
    // filtered orders subset so the gate is non-vacuous on this corpus
    // (every customer has *some* order).
    "p3_anti_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
                .select(col("o_custkey").as("c_custkey")),
              Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // P5: LIKE predicate (search.py:130-144 analogue).
    "p5_like_filter" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_name").contains("red"))
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    }),

    // §2.7: union + dedup (capsule.py:209-270 pivot union analogue).
    "p6_union_dedup" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy(col("nationkey"))
    }),

    // §2.7: EXISTS / left-semi — orders having a max-quantity line.
    "j_semi_join" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") === 50.0)
                .select(col("l_orderkey").as("o_orderkey")),
              Seq("o_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // O6: equi-join + contains + distinct + ordered (search.py:188-204).
    "o6_contains_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_name").contains("ATION_1"))
        .select(col("n_name"), col("c_mktsegment"))
        .distinct()
        .orderBy(col("n_name"), col("c_mktsegment"))
    }),

    // §2.6: top-k — Catalyst plans TakeOrderedAndProject.
    "o7_topk_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // A13: GROUP_CONCAT / string_agg with pinned element order
    // (search.py:225,247 — SQLite hides the order; we make it explicit).
    "o8_string_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 500)
        .groupBy(col("l_orderkey"))
        .agg(concat_ws(",", transform(sort_array(collect_list(col("l_partkey"))),
                                      x => x.cast("string"))).as("part_keys"),
             count(lit(1)).as("n_lines"))
        .orderBy(col("l_orderkey"))
    }),

    // A2: project-stats rollup — several counts in one row
    // (patterns.py:22-53 analogue): agg-crossjoin of 1-row frames.
    "a2_rollup_stats" -> ((s, d) => {
      val c = Tables.customer(s, d).agg(count(lit(1)).as("n_customer"),
        countDistinct(col("c_mktsegment")).as("n_segments"))
      val o = Tables.orders(s, d).agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_orderpriority")).as("n_priorities"))
      val n = Tables.nation(s, d).agg(count(lit(1)).as("n_nation"))
      c.crossJoin(o).crossJoin(n)
    }),

    // A3: mode (most common) per group — single pass with a ranking
    // window instead of the reference's per-layer loop (patterns.py:196-202).
    "a3_mode_per_group" -> ((s, d) => {
      val counted = Tables.orders(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("cnt").desc, col("o_orderpriority"))
      counted.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .orderBy(col("o_orderstatus"))
    }),

    // A5: explode + frequency top-10 (patterns.py:268-279 tag counts).
    "a5_explode_count" -> ((s, d) => {
      Tables.part(s, d)
        .select(explode(split(col("p_type"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(10)
    }),

    // A10: time-windowed usage analytics (usage.py:57-127): daily
    // counts + exact avg via decimal sum / count.
    "a10_events_daily" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             (dsum(col("value")) / count(lit(1))).as("avg_value"))
        .orderBy(col("day"), col("event_type"))
    }),

    // A11: recent-N (usage.py:129-137).
    "a11_recent_events" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy(col("event_id").desc)
        .limit(20)
    }),

    // A14: exact interpolated percentiles (benchmarks/run.py:56-60).
    // One percentile(..., array(...)) aggregate, not three scalar ones:
    // Spark's exact Percentile builds a per-group value-counts buffer
    // PER AGGREGATE EXPRESSION, so the scalar form paid the
    // build+merge+sort of the full column three times; the array form
    // pays it once and evaluates all three points off the same sorted
    // buffer — bit-identical values (same interpolation code path).
    "a14_percentiles" -> ((s, d) => {
      Tables.orders(s, d)
        .agg(expr("percentile(o_totalprice, array(0.5D, 0.95D, 0.99D))").as("ps"))
        .select(col("ps").getItem(0).as("p50"),
          col("ps").getItem(1).as("p95"),
          col("ps").getItem(2).as("p99"))
    }),

    // C9: greedy budgeted fill — running-sum window + cutoff; the
    // monotone running total makes break≡filter (capsule.py:334-396).
    "c9_budget_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .withColumn("running_qty", sum(col("l_quantity")).over(w))
        .filter(col("running_qty") <= 100.0)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // O4: min-max normalization within a group (search.py:38-45), with
    // the all-equal → 1.0 guard.
    "o4_minmax_norm" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
      Tables.customer(s, d)
        .withColumn("mn", min(col("c_acctbal")).over(w))
        .withColumn("mx", max(col("c_acctbal")).over(w))
        .select(col("c_custkey"), col("c_nationkey"),
          when(col("mx") === col("mn"), lit(1.0))
            .otherwise((col("c_acctbal") - col("mn")) / (col("mx") - col("mn")))
            .as("norm_bal"))
        .orderBy(col("c_custkey"))
    }),

    // O5: hybrid weighted re-rank (search.py:73-104): fixed-weight
    // linear blend of normalized signals, deterministic top-k.
    "o5_hybrid_rank" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val ordCnt = Tables.orders(s, d).groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      // localCheckpoint: the customer⋈orders aggregate feeds both the
      // global-max scalar and the scoring projection; without it both
      // scans and the join run twice (exchange reuse does not fire
      // across the differently-pruned branches).
      val joined = cust.join(ordCnt, Seq("c_custkey"), "left")
        .na.fill(0L, Seq("n_orders"))
        .localCheckpoint()
      val mx = joined.agg(max(col("n_orders")).as("mx_orders"),
                          max(col("c_acctbal")).as("mx_bal"))
      joined.crossJoin(broadcast(mx))
        .select(col("c_custkey"),
          (col("c_acctbal") / col("mx_bal") * 0.55 +
           col("n_orders").cast("double") / col("mx_orders").cast("double") * 0.20 +
           when(col("c_mktsegment") === "BUILDING", 0.25).otherwise(0.0)).as("score"))
        .orderBy(col("score").desc, col("c_custkey"))
        .limit(25)
    }),

    // Q3-shape: join + group + top-k revenue (shipping priority).
    "q3_shipping_priority" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1995-03-15 00:00:00")))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1995-03-15 00:00:00")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
               .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q5-shape star join: broadcast dims, shuffle only the fact table.
    "q5_star_join" -> ((s, d) => {
      val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val nation = Tables.nation(s, d)
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
                col("o_orderdate") <  lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      val li = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
                               col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
               .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Sessionization: gap-based sessions via lag window + running flag
    // sum — the windowed-event-analytics class over the events table.
    "w_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
               col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "s2_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'
        |  AND l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q6_selective_agg" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "p3_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "p5_like_filter" ->
      "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%red%' ORDER BY p_partkey",
    "p6_union_dedup" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,
    "j_semi_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity = 50.0)
        |ORDER BY o_orderkey""".stripMargin,
    "o6_contains_join" ->
      """SELECT DISTINCT n_name, c_mktsegment
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE contains(n_name, 'ATION_1')
        |ORDER BY n_name, c_mktsegment""".stripMargin,
    "o7_topk_orders" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20",
    "o8_string_agg" ->
      """SELECT l_orderkey,
        |  string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey) AS part_keys,
        |  COUNT(*) AS n_lines
        |FROM lineitem WHERE l_orderkey < 500
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "a2_rollup_stats" ->
      """SELECT (SELECT COUNT(*) FROM customer) AS n_customer,
        |       (SELECT COUNT(DISTINCT c_mktsegment) FROM customer) AS n_segments,
        |       (SELECT COUNT(*) FROM orders) AS n_orders,
        |       (SELECT COUNT(DISTINCT o_orderpriority) FROM orders) AS n_priorities,
        |       (SELECT COUNT(*) FROM nation) AS n_nation""".stripMargin,
    "a3_mode_per_group" ->
      """SELECT o_orderstatus, o_orderpriority, cnt FROM (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,
    "a5_explode_count" ->
      """SELECT token, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split(p_type, ' ')) AS token FROM part)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 10""".stripMargin,
    "a10_events_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "a11_recent_events" ->
      "SELECT event_id, event_type, value FROM events ORDER BY event_id DESC LIMIT 20",
    "a14_percentiles" ->
      """SELECT quantile_cont(o_totalprice, 0.5) AS p50,
        |       quantile_cont(o_totalprice, 0.95) AS p95,
        |       quantile_cont(o_totalprice, 0.99) AS p99
        |FROM orders""".stripMargin,
    "c9_budget_running_sum" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, running_qty FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |  FROM lineitem WHERE l_orderkey < 1000)
        |WHERE running_qty <= 100.0 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "o4_minmax_norm" ->
      """SELECT c_custkey, c_nationkey,
        |  CASE WHEN mx = mn THEN 1.0 ELSE (c_acctbal - mn) / (mx - mn) END AS norm_bal
        |FROM (SELECT c_custkey, c_nationkey, c_acctbal,
        |        MIN(c_acctbal) OVER (PARTITION BY c_nationkey) AS mn,
        |        MAX(c_acctbal) OVER (PARTITION BY c_nationkey) AS mx
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "o5_hybrid_rank" ->
      """WITH j AS (
        |  SELECT c_custkey, c_acctbal, c_mktsegment,
        |         COALESCE((SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey), 0) AS n_orders
        |  FROM customer),
        |m AS (SELECT MAX(n_orders) AS mx_orders, MAX(c_acctbal) AS mx_bal FROM j)
        |SELECT c_custkey,
        |  c_acctbal / mx_bal * 0.55
        |  + CAST(n_orders AS DOUBLE) / CAST(mx_orders AS DOUBLE) * 0.20
        |  + CASE WHEN c_mktsegment = 'BUILDING' THEN 0.25 ELSE 0.0 END AS score
        |FROM j, m ORDER BY score DESC, c_custkey LIMIT 25""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_star_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "w_sessionize" ->
      """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT user_id, ts, event_id,
        |          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
