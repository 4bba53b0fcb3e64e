package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Second relational batch: multi-dimensional aggregation (ROLLUP /
  * CUBE), set operations (INTERSECT / EXCEPT), outer joins,
  * HAVING-shape filters, the ranking/offset window battery, and
  * scalar/date/array function batteries — broadening SURVEY.md §2
  * coverage so a reference user finds every operator class they use.
  */
object Relational2 {

  import QueryUtil.{dec, dsum}

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ROLLUP with grouping_id to disambiguate the subtotal rows.
    "a_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }),

    // CUBE over two order dimensions.
    "a_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
    }),

    // INTERSECT: nations having both customers and suppliers.
    "p7_intersect" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))
    }),

    // EXCEPT: customers minus customers-with-orders (set difference).
    "p8_except" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_custkey").as("k"))
        .except(Tables.orders(s, d).filter(col("o_orderpriority") === "5-LOW")
                  .select(col("o_custkey").as("k")))
        .orderBy(col("k"))
    }),

    // FULL OUTER join: order count per customer incl. orphans both ways.
    "j_full_outer" -> ((s, d) => {
      val oc = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
        .join(oc, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          col("c_name").isNotNull.as("known_customer"))
        .orderBy(col("custkey"))
    }),

    // Q13 shape: customer count per order-count bucket.
    "q13_distribution" -> ((s, d) => {
      val perCust = Tables.customer(s, d).select(col("c_custkey"))
        .join(Tables.orders(s, d).select(col("o_custkey").as("c_custkey"), col("o_orderkey")),
          Seq("c_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q18 shape: HAVING sum(qty) > threshold, then enrich.
    "q18_having" -> ((s, d) => {
      val big = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300.0)
      big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
    }),

    // Q2 shape: row matching a per-group minimum (min acctbal per nation).
    "q2_min_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("s_nationkey"))
      Tables.supplier(s, d)
        .withColumn("mn", min(col("s_acctbal")).over(w))
        .filter(col("s_acctbal") === col("mn"))
        .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"))
        .orderBy(col("s_nationkey"), col("s_suppkey"))
    }),

    // Ranking window battery: rank, dense_rank, ntile, percent_rank.
    "w_rank_battery" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 9).as("prnk"))
        .orderBy(col("o_orderstatus"), col("rnk"))
    }),

    // Offset window battery: lead/lag deltas along each customer's
    // order history.
    "w_lead_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_orderkey")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("first_orderkey"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // As-of join (event attribution): each purchase matched to the
    // user's most recent STRICTLY-earlier click — the time-series join
    // Spark has no native operator for. Expressed as the single-shuffle
    // UNION trick instead of a range join: tag both sides, sort each
    // user's merged stream once (purchases sort BEFORE clicks at equal
    // ts, which is exactly the strict < semantics), and carry the last
    // click forward with last(ignoreNulls) over the running frame. At
    // scale this is ONE hash partition by user + one sort — no
    // per-pair range explosion (a naive range join is O(clicks ×
    // purchases) per user), no broadcast requirement, and skew is
    // bounded by a single user's event count. Epoch-seconds output
    // (the a10/st_ house rule: raw timestamp columns don't round-trip
    // encodings portably; `CAST AS LONG` ≡ DuckDB floor(epoch())).
    "j_asof_attrib" -> ((s, d) => asofAttrib(s, d, lookbackS = None)),

    // Bounded-lookback as-of join: real attribution always carries a
    // window (here 24 h) — a purchase whose most recent prior click is
    // older than the bound stays UNattributed (all click fields NULL).
    // Same single-shuffle union+window plan; the bound is one filter
    // on the carried struct, applied AFTER the carry (the most recent
    // prior click either qualifies or the purchase is unattributed —
    // an older in-window click never resurrects it, which is the as-of
    // semantics: nearest-prior, then bound).
    "j_asof_attrib_win" -> ((s, d) =>
      asofAttrib(s, d, lookbackS = Some(24L * 3600))),

    // PIVOT: order counts status × priority — Spark's dedicated
    // RelationalGroupedDataset.pivot with a pinned value list (required
    // at scale anyway: an unpinned pivot runs an extra distinct scan).
    "a_pivot" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnsRenamed(Map("1-URGENT" -> "p1", "2-HIGH" -> "p2",
          "3-MEDIUM" -> "p3", "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5"))
        .orderBy(col("o_orderstatus"))
    }),

    // Statistical aggregate battery: stddev/variance/corr/covar —
    // rounded (2dp absolute for ~1e10-magnitude moments, 6dp for the
    // unit-scale correlation) because sum-of-squares accumulation
    // order differs across engines in the last ulps.
    "a_stats_battery" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          round(stddev_samp(col("o_totalprice")), 2).as("sd"),
          round(var_samp(col("o_totalprice")), 2).as("vr"),
          round(corr(col("o_totalprice"), col("o_custkey").cast("double")), 6).as("price_cust_corr"),
          round(covar_samp(col("o_totalprice"), col("o_custkey").cast("double")), 2).as("cv"))
        .orderBy(col("o_orderstatus"))
    }),

    // Native session_window (gap 30 min): Spark's dedicated session
    // operator in batch mode; boundary rule is diff >= gap (an event at
    // exactly prev+gap starts a new session), mirrored in the oracle's
    // microsecond arithmetic.
    "w_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_micros(col("session_window.start")).as("sess_start_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("sess_start_us"))
    }),

    // Skew-resistant two-stage aggregation: salt the hot grouping key,
    // pre-aggregate per (key, salt), then merge — identical result to a
    // plain groupBy (the oracle), but the first shuffle spreads a hot
    // key over 8 reducers. Decimal partials keep the merge exact.
    "a_salted_topk" -> ((s, d) => {
      val partial = Tables.lineitem(s, d)
        .withColumn("salt", pmod(col("l_linenumber"), lit(8)))
        .groupBy(col("l_partkey"), col("salt"))
        .agg(sum(dec(col("l_quantity"))).as("part_qty"), count(lit(1)).as("part_n"))
      partial.groupBy(col("l_partkey"))
        .agg(sum(col("part_qty")).cast("double").as("total_qty"),
          sum(col("part_n")).as("n_lines"))
        .orderBy(col("total_qty").desc, col("l_partkey"))
        .limit(25)
    }),

    // Skew-safe JOIN (the join-side companion to a_salted_topk): 90%
    // of lineitem rows funnel onto one hot key, so an unsalted shuffle
    // join would put ~90% of the probe side on a single reducer — the
    // classic straggler at 100 TB. The dim side is replicated ×8 and
    // the fact side salted deterministically (xxhash64 of the row key),
    // so the hot key spreads over 8 reducers; the post-join regroup by
    // k collapses the salt. Merge-hinted: broadcast would dodge the
    // skew demonstration (and at real dim sizes isn't available).
    // PlanSpec asserts the SMJ keys include the salt.
    "j_skew_salted" -> ((s, d) => {
      val Salts = 8
      val k = when(col("l_orderkey") % 100 < 90, lit(0L))
        .otherwise(col("l_orderkey") % 100)
      val fact = Tables.lineitem(s, d)
        .select(k.as("k"), col("l_extendedprice"), col("l_discount"),
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(Salts))
            .as("salt"))
      val dim = Tables.orders(s, d)
        .groupBy((col("o_orderkey") % 100).as("k"))
        .agg(count(lit(1)).as("k_orders"))
        .crossJoin(s.range(Salts).select(col("id").as("salt")))
      fact.hint("merge").join(dim, Seq("k", "salt"))
        .groupBy(col("k"))
        .agg(max(col("k_orders")).as("k_orders"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("k"))
    }),

    // Scalar string-function battery.
    "f_string_battery" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") <= 100)
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 1, 5).as("pfx"),
          length(col("p_name")).as("len"),
          instr(col("p_name"), "o").as("pos_o"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
          reverse(col("p_name")).as("rev"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
          concat_ws("|", col("p_type"), col("p_brand")).as("joined"))
        .orderBy(col("p_partkey"))
    }),

    // Date/time function battery over order dates.
    "f_date_battery" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 1000)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("q"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          datediff(lit(java.sql.Date.valueOf("1999-01-01")),
            col("o_orderdate").cast("date")).as("days_to_1999"),
          date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"))
        .orderBy(col("o_orderkey"))
    }),

    // Array-function battery over document token arrays (stringified
    // outputs so the comparison stays scalar).
    "f_array_battery" -> ((s, d) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(toks).as("n"),
          concat_ws(",", sort_array(array_distinct(toks))).as("sorted_distinct"),
          concat_ws(",", slice(toks, 1, 5)).as("first5"),
          array_contains(toks, "spark").cast("int").as("has_spark"),
          element_at(toks, 1).as("first_tok"),
          element_at(toks, -1).as("last_tok"),
          concat_ws(",", array_remove(toks, "the")).as("no_the"))
        .orderBy(col("doc_id"))
    })
  )

  /** The as-of attribution body shared by `j_asof_attrib` (unbounded)
    * and `j_asof_attrib_win` (lookback-bounded). The three attributed
    * fields ride ONE carried struct (r13 ADVICE: three independent
    * last(ignoreNulls) windows could mix fields across click rows if
    * any field were NULL on a click row — the struct is null exactly
    * on non-click rows, so id/ts/value always come from the same
    * click). `lookbackS = Some(T)` null-outs the attribution when the
    * nearest prior click is older than T seconds. */
  private def asofAttrib(s: SparkSession, d: String,
      lookbackS: Option[Long]): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        when(col("event_type") === "purchase", lit(0)).otherwise(lit(1)).as("side"),
        when(col("event_type") === "click",
          struct(col("event_id").as("c_id"), col("ts").as("c_ts"),
            col("value").as("c_value"))).as("clk"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = ev
      .select(col("event_id"), col("user_id"), col("ts"), col("value"), col("side"),
        last(col("clk"), ignoreNulls = true).over(w).as("clk"))
      .filter(col("side") === 0)
    val bounded = lookbackS match {
      case Some(t) => carried.select(
        col("event_id"), col("user_id"), col("ts"), col("value"),
        when(col("ts").cast("long") - col("clk.c_ts").cast("long") <= t,
          col("clk")).as("clk"))
      case None => carried
    }
    bounded
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").cast("long").as("purchase_ts_s"),
        col("value").as("purchase_value"),
        col("clk.c_id").as("click_id"),
        col("clk.c_ts").cast("long").as("click_ts_s"),
        (col("ts").cast("long") - col("clk.c_ts").cast("long")).as("gap_s"),
        (col("value") - col("clk.c_value")).as("value_delta"))
      .orderBy(col("purchase_id"))
  }

  /** The as-of oracle, mirroring [[asofAttrib]]'s struct carry: one
    * LAST_VALUE(struct IGNORE NULLS) — the struct is null exactly on
    * non-click rows — unpacked after the optional lookback filter. */
  private def asofOracle(lookbackS: Option[Long]): String = {
    val bound = lookbackS
      .map(t => s"CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - " +
        s"CAST(floor(epoch((clk0).c_ts)) AS BIGINT) <= $t THEN clk0 END")
      .getOrElse("clk0")
    s"""WITH ev AS (
       |  SELECT event_id, user_id, ts, value,
       |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side,
       |    CASE WHEN event_type = 'click' THEN
       |      struct_pack(c_id := event_id, c_ts := ts, c_value := value) END AS clk
       |  FROM events WHERE event_type IN ('purchase', 'click')),
       |f AS (
       |  SELECT event_id, user_id, ts, value, side,
       |    LAST_VALUE(clk IGNORE NULLS) OVER w AS clk0
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |g AS (SELECT event_id, user_id, ts, value, $bound AS clk
       |      FROM f WHERE side = 0)
       |SELECT event_id AS purchase_id, user_id,
       |  CAST(floor(epoch(ts)) AS BIGINT) AS purchase_ts_s,
       |  value AS purchase_value,
       |  (clk).c_id AS click_id,
       |  CAST(floor(epoch((clk).c_ts)) AS BIGINT) AS click_ts_s,
       |  CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch((clk).c_ts)) AS BIGINT) AS gap_s,
       |  value - (clk).c_value AS value_delta
       |FROM g ORDER BY purchase_id""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "a_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n, GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "a_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  GROUPING(o_orderstatus, o_orderpriority) AS gid
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,
    "p7_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin,
    "p8_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY k""".stripMargin,
    "j_full_outer" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        |  COALESCE(n_orders, 0) AS n_orders,
        |  c_name IS NOT NULL AS known_customer
        |FROM customer
        |FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "q13_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q18_having" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, sum_qty FROM (
        |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 300.0)
        |JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin,
    "q2_min_per_group" ->
      """SELECT s_nationkey, s_suppkey, s_acctbal FROM (
        |  SELECT s_nationkey, s_suppkey, s_acctbal,
        |    MIN(s_acctbal) OVER (PARTITION BY s_nationkey) AS mn
        |  FROM supplier)
        |WHERE s_acctbal = mn ORDER BY s_nationkey, s_suppkey""".stripMargin,
    "w_rank_battery" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
        |  NTILE(4) OVER w AS quartile,
        |  round(PERCENT_RANK() OVER w, 9) AS prnk
        |FROM orders WHERE o_orderkey < 2000
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderstatus, rnk""".stripMargin,
    "w_lead_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price,
        |  FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_orderkey
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "j_asof_attrib" -> asofOracle(lookbackS = None),
    "j_asof_attrib_win" -> asofOracle(lookbackS = Some(24L * 3600)),
    "a_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a_stats_battery" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  round(stddev_samp(o_totalprice), 2) AS sd,
        |  round(var_samp(o_totalprice), 2) AS vr,
        |  round(corr(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS price_cust_corr,
        |  round(covar_samp(o_totalprice, CAST(o_custkey AS DOUBLE)), 2) AS cv
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "w_session_window" ->
      """SELECT user_id, MIN(us) AS sess_start_us, COUNT(*) AS n_events FROM (
        |  SELECT user_id, us,
        |    SUM(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |          LAG(epoch_us(CAST(ts AS TIMESTAMP)))
        |            OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev_us
        |        FROM events))
        |GROUP BY user_id, sess_id ORDER BY user_id, sess_start_us""".stripMargin,
    "a_salted_topk" ->
      """SELECT l_partkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
        |  COUNT(*) AS n_lines
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY total_qty DESC, l_partkey LIMIT 25""".stripMargin,
    "j_skew_salted" ->
      """WITH f AS (
        |  SELECT CASE WHEN l_orderkey % 100 < 90 THEN 0 ELSE l_orderkey % 100 END AS k,
        |         l_extendedprice, l_discount
        |  FROM lineitem),
        |d AS (SELECT o_orderkey % 100 AS k, COUNT(*) AS k_orders FROM orders GROUP BY 1)
        |SELECT k, MAX(k_orders) AS k_orders,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM f JOIN d USING (k)
        |GROUP BY k ORDER BY k""".stripMargin,
    "f_string_battery" ->
      """SELECT p_partkey, upper(p_name) AS up, substr(p_name, 1, 5) AS pfx,
        |  length(p_name) AS len, strpos(p_name, 'o') AS pos_o,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        |  translate(p_name, 'aeiou', 'AEIOU') AS tr, reverse(p_name) AS rev,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
        |  concat_ws('|', p_type, p_brand) AS joined
        |FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""".stripMargin,
    "f_date_battery" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  day(o_orderdate) AS dom, quarter(o_orderdate) AS q,
        |  strftime(o_orderdate, '%Y-%m') AS ym,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS days_to_1999,
        |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30
        |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin,
    "f_array_battery" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS sorted_distinct,
        |  array_to_string(string_split(text, ' ')[1:5], ',') AS first5,
        |  CAST(list_contains(string_split(text, ' '), 'spark') AS INT) AS has_spark,
        |  string_split(text, ' ')[1] AS first_tok,
        |  string_split(text, ' ')[-1] AS last_tok,
        |  array_to_string(list_filter(string_split(text, ' '), t -> t <> 'the'), ',') AS no_the
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
