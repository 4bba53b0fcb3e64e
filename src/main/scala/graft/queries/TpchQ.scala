package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** TPC-H-shape analytical queries adapted to the driver star schema
  * (no partsupp table; ship-mode columns absent → nearest available
  * dimension substituted). Covers the remaining classic shapes:
  * multi-nation volume joins, conditional aggregation, percentage-of-
  * total, disjunctive multi-predicate joins, and the correlated
  * avg-subquery + anti-join (Q22).
  */
object TpchQ {

  import QueryUtil.dec
  private def revenue: Column =
    sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
      .cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q7 shape: bilateral volume between two nations by year.
    "q7_nation_volume" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .filter((col("s_nationkey") === 1 && col("c_nationkey") === 2) ||
          (col("s_nationkey") === 2 && col("c_nationkey") === 1))
        .groupBy(col("s_nationkey"), col("c_nationkey"),
          year(col("l_shipdate")).as("l_year"))
        .agg(revenue.as("volume"))
        .orderBy(col("s_nationkey"), col("c_nationkey"), col("l_year"))
    }),

    // Q10 shape: top returned-revenue customers.
    "q10_returned" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      li.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .agg(revenue.as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q12 shape: conditional aggregation — priority class counts per
    // lineitem status bucket.
    "q12_priority_class" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("low_count"))
        .orderBy(col("l_linestatus"))
    }),

    // Q14 shape: percentage-of-total (promo revenue share by brand
    // prefix), decimal-exact both numerator and denominator.
    "q14_promo_share" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("p_type") === "PROMO",
            dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") * 100.0 /
            revenue).as("promo_pct"))
    }),

    // Q19 shape: disjunctive multi-predicate join (brand × size ×
    // quantity windows OR'd together).
    "q19_disjunctive" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey") &&
          ((col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 40))))
        .agg(revenue.as("revenue"), count(lit(1)).as("n_lines"))
    }),

    // Q22 shape: customers with above-average balance and no URGENT
    // orders (scalar subquery + anti-join). Anti side is a filtered
    // orders subset so the gate is non-vacuous (every customer orders).
    // Q4 shape: EXISTS correlated subquery → left-semi join with a
    // non-equi conjunct (late-shipment proxy: any lineitem shipped
    // after its order date).
    "q4_order_priority" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q15 shape: revenue "view" + global-max selection (the correlated
    // = (SELECT MAX(..)) decorrelated as a 1-row broadcast). The view
    // is localCheckpoint'ed so the fact scan + revenue groupBy run
    // ONCE and both consumers (global max, join side) read the
    // materialized aggregate — exchange reuse does not fire here
    // because the max branch prunes to a narrower schema.
    "q15_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey")).agg(revenue.as("total_revenue"))
        .localCheckpoint()
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // Q16 shape: distinct-supplier counts per part attribute with a
    // NOT-IN exclusion (negative-balance suppliers) as an anti-join
    // before the distinct aggregation.
    "q16_supplier_cnt" -> ((s, d) => {
      val bad = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("l_suppkey"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), Seq("l_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    }),

    // Q17 shape: correlated per-part average subquery, decorrelated as
    // a window average over the part key — a single lineitem scan
    // (the grouped-agg-join-back form scanned and aggregated the fact
    // twice). Because p_partkey is unique, the Brand#1 join keeps
    // every lineitem row of each surviving part, so the window
    // average over the joined frame equals the whole-table per-part
    // average. Threshold arithmetic (decimal sum → double / count *
    // 0.2) is replicated exactly so both engines produce identical
    // doubles.
    "q17_small_quantity" -> ((s, d) => {
      val w = Window.partitionBy(col("l_partkey"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#1")),
          col("l_partkey") === col("p_partkey"))
        .withColumn("thresh",
          sum(dec(col("l_quantity"))).over(w).cast("double") / count(lit(1)).over(w) * 0.2)
        .filter(col("l_quantity") < col("thresh"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"))
    }),

    "q22_global_sales" -> ((s, d) => {
      // The customer projection is localCheckpoint'ed so the scan runs
      // once for both the global-average scalar and the main filter —
      // only the three consumed columns are materialized.
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        .localCheckpoint()
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg(avg(dec(col("c_acctbal"))).cast("double").as("avg_bal"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
                .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
        .orderBy(col("c_nationkey"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q7_nation_volume" ->
      """SELECT s_nationkey, c_nationkey, year(l_shipdate) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE (s_nationkey = 1 AND c_nationkey = 2) OR (s_nationkey = 2 AND c_nationkey = 1)
        |GROUP BY 1, 2, 3 ORDER BY s_nationkey, c_nationkey, l_year""".stripMargin,
    "q10_returned" ->
      """SELECT c_custkey, c_name, c_acctbal,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q12_priority_class" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q14_promo_share" ->
      """SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "q19_disjunctive" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        | AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40))""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q15_top_supplier" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        |  FROM lineitem GROUP BY l_suppkey),
        |m AS (SELECT MAX(total_revenue) AS mx FROM r)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM r, m
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = mx
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    "q17_small_quantity" ->
      """WITH a AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) * 0.2 AS thresh
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN a USING (l_partkey)
        |WHERE p_brand = 'Brand#1' AND l_quantity < thresh""".stripMargin,
    "q22_global_sales" ->
      """WITH a AS (SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS avg_bal
        |           FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer, a
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  )
}
