package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The remaining five classic TPC-H shapes (Q8, Q9, Q11, Q20, Q21),
  * adapted to the driver star schema: there is no partsupp table and
  * no commit/receipt dates, so supply cost is proxied by
  * `p_retailprice` and "late" by `l_shipdate > o_orderdate + 60 days`
  * — the PLAN shapes (8-table conditional-share join, multi-join
  * profit expression, HAVING over a global scalar, nested semi-join
  * chain, EXISTS + NOT EXISTS double correlation) are the point, not
  * the constants. Completes the 22-shape sweep started in
  * [[TpchQ]]/[[Relational]].
  *
  * Scale notes mirror the rest of the suite: dimensions broadcast
  * (part/supplier/nation/customer), fact-to-fact joins shuffle on
  * their keys, global scalars ride the localCheckpoint + 1-row
  * broadcast crossJoin idiom so the fact scan runs once (the Q15
  * lesson from round 5), and all money arithmetic routes through
  * DECIMAL(18,2) so both engines produce bit-identical doubles.
  */
object TpchQ2 {

  import QueryUtil.dec
  private def vol: Column =
    dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q8 shape: national market share — of all PROMO-part revenue sold
    // into region ASIA (customer side), the fraction supplied by
    // NATION_2, by order year. Conditional numerator over the same
    // joined frame as the denominator: one pass, no second scan.
    "q8_market_share" -> ((s, d) => {
      val cnat = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nationkey"), col("n_regionkey"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate").between(lit("1995-01-01").cast("timestamp"),
          lit("1998-12-31").cast("timestamp")))
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(cnat), Seq("c_nationkey"))
        .filter(col("n_regionkey") === 2)
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("s_nationkey") === 2, vol)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(vol).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // Q9 shape: product-type profit by supplier nation and year.
    // Profit = revenue minus retail-price × quantity (the partsupp
    // supply-cost proxy); the whole expression stays in decimal until
    // the final cast so the sum is exact.
    "q9_product_profit" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, d).filter(col("p_name").like("%red%"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(vol - dec(col("p_retailprice")) * dec(col("l_quantity")))
          .cast("double").as("sum_profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    }),

    // Q11 shape: important stock — parts whose shipped value (from
    // NATION_7 suppliers) exceeds twice the per-part average. The
    // canonical HAVING > fraction-of-total scalar is made
    // scale-invariant (a fixed fraction degenerates as part count
    // grows). Per-part values stay decimal through the checkpoint so
    // the global average (decimal sum → one double divide) is
    // bit-identical across engines; the fact scan + groupBy run once.
    "q11_important_value" -> ((s, d) => {
      val sup7 = Tables.supplier(s, d).filter(col("s_nationkey") === 7)
        .select(col("s_suppkey").as("l_suppkey"))
      val v = Tables.lineitem(s, d)
        .join(broadcast(sup7), Seq("l_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_quantity"))).as("val_dec"))
        .localCheckpoint()
      val ap = v.agg((sum(col("val_dec")).cast("double") / count(lit(1))).as("ap"))
      v.crossJoin(broadcast(ap))
        .filter(col("val_dec").cast("double") > lit(2) * col("ap"))
        .select(col("l_partkey"), col("val_dec").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    }),

    // Q20 shape: potential part promotion — suppliers in region AFRICA
    // who shipped > 300 units of 'small%' parts in 1997. Nested
    // semi-join chain: part filter feeds the lineitem aggregate, whose
    // qualifying supplier set semi-joins supplier. The aggregate's
    // distinct supplier ids are the only thing crossing the join.
    "q20_potential_promo" -> ((s, d) => {
      val smallParts = Tables.part(s, d).filter(col("p_name").like("small%"))
        .select(col("p_partkey").as("l_partkey"))
      val hot = Tables.lineitem(s, d)
        .join(broadcast(smallParts), Seq("l_partkey"))
        .filter(year(col("l_shipdate")) === 1997)
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 300)
        .select(col("l_suppkey").as("s_suppkey"))
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_regionkey") === 0)
        .join(hot, Seq("s_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),

    // Q21 shape: suppliers who kept finished orders waiting — the
    // EXISTS + NOT EXISTS double correlation. A lineitem is "late"
    // when it ships > 60 days after its order date (receipt/commit
    // proxy). Keep a late line iff its order is multi-supplier
    // (semi-join: some other-supplier line exists) and it is the SOLE
    // late supplier (anti-join: no other-supplier late line exists).
    // Same-order lines share o_orderstatus, so the l2/l3 sides need
    // no second orders join; the late set is checkpointed once and
    // reused as both the base and the anti side.
    "q21_waiting_supplier" -> ((s, d) => {
      val ordF = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val late = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(ordF, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"))
        .localCheckpoint()
      val anyLine = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2"))
      val lateOther = late.select(col("l_orderkey").as("k3"), col("l_suppkey").as("sk3"))
      late
        .join(anyLine, col("k2") === col("l_orderkey") && col("sk2") =!= col("l_suppkey"),
          "left_semi")
        .join(lateOther, col("k3") === col("l_orderkey") && col("sk3") =!= col("l_suppkey"),
          "left_anti")
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(25)
    })
  )

  def oracles: Map[String, String] = Map(
    "q8_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  CAST(SUM(CASE WHEN s_nationkey = 2
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |  AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE p_type = 'PROMO' AND n_regionkey = 2
        |  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1998-12-31'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name, year(o_orderdate) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |         - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin,
    "q11_important_value" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS val_dec
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 7)
        |  GROUP BY l_partkey),
        |a AS (SELECT CAST(SUM(val_dec) AS DOUBLE) / COUNT(*) AS ap FROM v)
        |SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
        |FROM v, a WHERE CAST(val_dec AS DOUBLE) > 2 * ap
        |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "q20_potential_promo" ->
      """WITH sq AS (
        |  SELECT l_suppkey, SUM(l_quantity) AS qty
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |    AND year(l_shipdate) = 1997
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_regionkey = 0
        |  AND s_suppkey IN (SELECT l_suppkey FROM sq WHERE qty > 300)
        |ORDER BY s_suppkey""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25""".stripMargin
  )
}
