package graft.queries

import graft.QueryDef
import graft.QueryDef.table
import org.apache.spark.sql.functions._

/** TPC-H classics q44–q52 (Q3, Q4, Q5, Q6, Q9, Q18, Q19, Q21, Q22),
  * adapted where the driver's synthetic schema lacks a TPC-H column
  * (no partsupp, l_commitdate/l_receiptdate/l_shipmode, p_container,
  * c_phone) — every adaptation keeps the ORIGINAL plan shape (the join
  * tree, the semi/anti-join structure, the scalar subquery), swapping
  * only the filter column. Determinism follows q40–q43: revenue terms
  * quantize per-row to DECIMAL(18,4) before aggregation so reduction
  * order cannot drift a cent between Spark and DuckDB; timestamps are
  * emitted as epoch microseconds; every query ends in a total order.
  *
  * Scale notes (100 TB): dimension sides (nation, region, filtered
  * part) broadcast explicitly; lineitem⋈orders stays the one keyed
  * shuffle; top-k outputs are TakeOrdered (per-partition heads merged
  * on the driver), never a global sort.
  */
object TpchMore {

  /** epoch-microseconds of a timestamp_ntz column under UTC session. */
  private def us(c: String) = unix_micros(col(c).cast("timestamp"))

  /** per-row DECIMAL(18,4) revenue term — see q40's determinism note. */
  private def rev = (col("l_extendedprice") *
    (lit(1) - col("l_discount"))).cast("decimal(18,4)")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q44_tpch_q3",
      (s, d) => {
        // TPC-H Q3 (shipping priority): top-10 undelivered orders by
        // potential revenue. Both date filters push into the scans;
        // customer's segment filter makes it broadcast-able; the
        // top-10 is a TakeOrdered.
        val cust = table(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val ord = table(s, d, "orders")
          .filter(col("o_orderdate") < "1996-07-01")
        val li = table(s, d, "lineitem")
          .filter(col("l_shipdate") > "1996-07-01")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), us("o_orderdate").as("o_orderdate_us"),
            col("o_orderpriority"))
          .agg(round(sum(rev), 2).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
             |       o_orderpriority,
             |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
             |                      AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1996-07-01'
             |  AND l_shipdate > TIMESTAMP '1996-07-01'
             |GROUP BY 1, 2, 3
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    QueryDef(
      "q45_tpch_q4",
      (s, d) => {
        // TPC-H Q4 (order-priority checking), late-shipment adaptation:
        // the schema has no l_commitdate/l_receiptdate, so "late" =
        // shipped more than 60 days after the order date — the same
        // correlated-EXISTS shape (semi-join on the order key with a
        // cross-table residual), the same priority histogram.
        val ord = table(s, d, "orders")
          .filter(col("o_orderdate").between("1995-07-01", "1995-09-30"))
        val li = table(s, d, "lineitem")
          .select(col("l_orderkey").as("lk"), col("l_shipdate"))
        ord.join(li,
            col("o_orderkey") === col("lk") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate BETWEEN TIMESTAMP '1995-07-01'
             |                      AND TIMESTAMP '1995-09-30'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "q46_tpch_q5",
      (s, d) => {
        // TPC-H Q5 (local supplier volume): revenue where the customer
        // and supplier share a nation inside one region. nation⋈region
        // collapses to a broadcast dimension; the c_nationkey =
        // s_nationkey equi-term rides the join condition so no
        // post-join filter re-reads the frame.
        val nAsia = broadcast(table(s, d, "nation")
          .join(table(s, d, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name"))
        val ord = table(s, d, "orders")
          .filter(col("o_orderdate").between("1995-01-01", "1995-12-31"))
        table(s, d, "lineitem")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(table(s, d, "supplier"),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(nAsia, col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(rev), 2).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
             |                      AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |               AND c_nationkey = s_nationkey
             |JOIN nation   ON s_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
             |                      AND TIMESTAMP '1995-12-31'
             |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin)),

    QueryDef(
      "q47_tpch_q6",
      (s, d) =>
        // TPC-H Q6 (forecasting revenue change): pure scan-aggregate —
        // every predicate reaches the parquet scan (range filters on
        // three columns), one partial-then-final sum, zero joins. The
        // 100 TB shape: a single pass with min/max row-group pruning.
        table(s, d, "lineitem")
          .filter(col("l_shipdate").between("1996-01-01", "1996-12-31") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(round(sum((col("l_extendedprice") * col("l_discount"))
            .cast("decimal(18,4)")), 2).cast("double").as("revenue")),
      Some("""SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
             |                      AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
             |FROM lineitem
             |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01'
             |                     AND TIMESTAMP '1996-12-31'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    QueryDef(
      "q48_tpch_q9",
      (s, d) => {
        // TPC-H Q9 (product-type profit), adapted: no partsupp table →
        // profit is the discounted revenue (no ps_supplycost term).
        // The plan shape is Q9's: a name-filtered part broadcast prunes
        // lineitem FIRST, then the orderkey shuffle join, supplier and
        // nation as broadcast dimensions, grouped by nation × year.
        val pts = broadcast(table(s, d, "part")
          .filter(col("p_name").contains("gear")).select("p_partkey"))
        val nat = broadcast(table(s, d, "nation")
          .select("n_nationkey", "n_name"))
        table(s, d, "lineitem")
          .join(pts, col("l_partkey") === col("p_partkey"))
          .join(table(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(table(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(nat, col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).as("o_year"))
          .agg(round(sum(rev), 2).cast("double").as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS nation,
             |       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
             |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
             |                      AS DECIMAL(18,4))), 2) AS DOUBLE)
             |         AS sum_profit
             |FROM lineitem
             |JOIN part     ON l_partkey = p_partkey
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation   ON s_nationkey = n_nationkey
             |WHERE p_name LIKE '%gear%'
             |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)),

    QueryDef(
      "q49_tpch_q18",
      (s, d) => {
        // TPC-H Q18 (large-volume customers): the HAVING on a
        // first-stage aggregate keys the second join — the per-order
        // quantity sum is map-side combined, its survivors are tiny
        // and broadcast back against orders/customer.
        // filter on the EXACT decimal sum (the oracle's HAVING is on
        // the unrounded sum — filtering the rounded value would flip
        // membership for sums in (300, 300.005)); round only for output
        val big = table(s, d, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("exact_qty"))
          .filter(col("exact_qty") > 300)
          .select(col("l_orderkey"),
            round(col("exact_qty"), 2).cast("double").as("sum_qty"))
        val ord = table(s, d, "orders")
        ord.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
          .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            us("o_orderdate").as("o_orderdate_us"), col("o_totalprice"),
            col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey,
             |       epoch_us(o_orderdate) AS o_orderdate_us, o_totalprice,
             |       sum_qty
             |FROM (SELECT l_orderkey,
             |             CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2)
             |                  AS DOUBLE) AS sum_qty
             |      FROM lineitem GROUP BY 1
             |      HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 300) big
             |JOIN orders   ON o_orderkey = l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    QueryDef(
      "q50_tpch_q19",
      (s, d) => {
        // TPC-H Q19 (discounted revenue), adapted: no p_container →
        // the three OR'd branch predicates pair p_brand/p_size with
        // l_quantity ranges. The partkey equi-term extracts so the
        // join is a broadcast hash join with the OR residual evaluated
        // post-match — never a nested-loop over the fact table.
        val p = broadcast(table(s, d, "part")
          .select("p_partkey", "p_brand", "p_size"))
        val branch1 = col("p_brand") === "Brand#1" &&
          col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
        val branch2 = col("p_brand") === "Brand#13" &&
          col("p_size").between(5, 25) && col("l_quantity").between(10, 20)
        val branch3 = col("p_brand") === "Brand#20" &&
          col("p_size").between(15, 50) && col("l_quantity").between(20, 30)
        table(s, d, "lineitem")
          .join(p, col("l_partkey") === col("p_partkey") &&
            (branch1 || branch2 || branch3))
          .agg(round(sum(rev), 2).cast("double").as("revenue"))
      },
      Some("""SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
             |                      AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
             |       AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 5 AND 25
             |       AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 15 AND 50
             |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    QueryDef(
      "q51_tpch_q21",
      (s, d) => {
        // TPC-H Q21 (suppliers who kept orders waiting), adapted: no
        // l_receiptdate/l_commitdate → "late" is l_returnflag = 'R'.
        // The shape is Q21's exactly: a fact self-semi-join (another
        // supplier touched the order) plus a self-anti-join (no OTHER
        // supplier was late), both keyed on the orderkey — at 100 TB
        // all three lineitem sides share one hash partitioning, so
        // the exchange is reused across the semi and anti joins.
        val li = table(s, d, "lineitem")
        val l1 = li.filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_suppkey")
        val ordF = table(s, d, "orders")
          .filter(col("o_orderstatus") === "F").select("o_orderkey")
        val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2"))
        val l3 = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("k3"), col("l_suppkey").as("sk3"))
        l1.join(ordF, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .join(l2, col("k2") === col("l_orderkey") &&
            col("sk2") =!= col("l_suppkey"), "left_semi")
          .join(l3, col("k3") === col("l_orderkey") &&
            col("sk3") =!= col("l_suppkey"), "left_anti")
          .join(table(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""SELECT s_name, count(*) AS numwait
             |FROM lineitem l1
             |JOIN supplier ON l1.l_suppkey = s_suppkey
             |WHERE l1.l_returnflag = 'R'
             |  AND EXISTS (SELECT 1 FROM orders
             |              WHERE o_orderkey = l1.l_orderkey
             |                AND o_orderstatus = 'F')
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_returnflag = 'R')
             |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20"""
        .stripMargin)),

    QueryDef(
      "q52_tpch_q22",
      (s, d) => {
        // TPC-H Q22 (global sales opportunity), adapted: no c_phone →
        // grouped by nation instead of phone country code, and
        // "dormant" = no order since 1999 (the synthetic generator
        // gives every customer SOME order, so the literal no-order
        // gate is empty). The shape is Q22's: a scalar-subquery
        // threshold (1-row broadcast kept IN the plan — single job),
        // an anti-join against orders, and a small grouped aggregate.
        // The non-equi threshold compiles to a BroadcastNestedLoopJoin
        // whose build side is ONE row (same as q27) — the textbook
        // scalar-subquery shape, not a scale hazard.
        val cust = table(s, d, "customer")
        val thr = broadcast(cust.filter(col("c_acctbal") > 0)
          .agg(avg("c_acctbal").as("__avg_bal")))
        val nat = broadcast(table(s, d, "nation")
          .select("n_nationkey", "n_name"))
        cust.crossJoin(thr)
          .filter(col("c_acctbal") > col("__avg_bal"))
          .join(table(s, d, "orders")
            .filter(col("o_orderdate") >= "1999-01-01").select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .join(nat, col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("numcust"),
            round(sum("c_acctbal"), 2).as("totacctbal"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(*) AS numcust,
             |       round(sum(c_acctbal), 2) AS totacctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
             |                   WHERE c_acctbal > 0)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
             |GROUP BY 1 ORDER BY n_name""".stripMargin)),

    QueryDef(
      "q53_tpch_q2",
      (s, d) => {
        // TPC-H Q2 (minimum-cost supplier), adapted: no partsupp →
        // the supply relation is the DISTINCT (partkey, suppkey) pairs
        // observed in lineitem, and the "cost" is s_acctbal. The shape
        // is Q2's: a region-filtered supplier dimension, a per-part
        // minimum over the supply relation, and the correlated
        // "equals the min" selection — expressed as one window
        // row_number per part (cheaper than the self-join the SQL
        // implies: one shuffle on p_partkey, no second aggregate).
        val eurSup = broadcast(table(s, d, "supplier")
          .join(table(s, d, "nation"),
            col("s_nationkey") === col("n_nationkey"))
          .join(table(s, d, "region").filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
        val pts = broadcast(table(s, d, "part")
          .filter(col("p_type") === "LARGE")
          .select("p_partkey", "p_name"))
        // No pre-distinct on the supply pairs: duplicate (partkey,
        // suppkey) observations produce IDENTICAL candidate rows (the
        // window orders by (s_acctbal, s_suppkey), unique per supplier,
        // so ties are only ever payload-identical duplicates and the
        // rn=1 row is the same either way). The explicit distinct only
        // added a full-lineitem exchange BEFORE the selective part /
        // region broadcast filters; without it the window's own
        // exchange is the single shuffle and it carries filtered rows.
        val supply = table(s, d, "lineitem")
          .select("l_partkey", "l_suppkey")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("p_partkey").orderBy(col("s_acctbal"), col("s_suppkey"))
        supply
          .join(pts, col("l_partkey") === col("p_partkey"))
          .join(eurSup, col("l_suppkey") === col("s_suppkey"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal")
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      Some("""WITH supply AS (
             |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
             |eur AS (
             |  SELECT s_suppkey, s_name, s_acctbal, n_name
             |  FROM supplier
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'EUROPE'),
             |ranked AS (
             |  SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
             |         row_number() OVER (PARTITION BY p_partkey
             |                            ORDER BY s_acctbal, s_suppkey) AS rn
             |  FROM supply
             |  JOIN part ON l_partkey = p_partkey
             |  JOIN eur  ON l_suppkey = s_suppkey
             |  WHERE p_type = 'LARGE')
             |SELECT p_partkey, p_name, s_name, n_name, s_acctbal
             |FROM ranked WHERE rn = 1
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
             |LIMIT 100""".stripMargin)),

    QueryDef(
      "q54_tpch_q13",
      (s, d) => {
        // TPC-H Q13 (customer order-count distribution), adapted: the
        // excluded order class is priority '1-URGENT' (no o_comment).
        // Left-outer join so zero-order customers survive into the
        // c_count = 0 bucket; two aggregations, both map-side combined
        // (the second one's input is one row per customer).
        val ord = table(s, d, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_orderkey", "o_custkey")
        table(s, d, "customer").select("c_custkey")
          .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             |      FROM customer
             |      LEFT JOIN orders ON c_custkey = o_custkey
             |                       AND o_orderpriority <> '1-URGENT'
             |      GROUP BY 1)
             |GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""
        .stripMargin)),

    QueryDef(
      "q55_tpch_q15",
      (s, d) => {
        // TPC-H Q15 (top supplier): per-supplier revenue in a quarter,
        // keep the supplier(s) AT the maximum. The max is a 1-row
        // broadcast back over the aggregated frame (two jobs' work in
        // one plan, no driver round-trip); revenue stays DECIMAL until
        // the output so the equality join cannot be foiled by double
        // rounding.
        val revs = table(s, d, "lineitem")
          .filter(col("l_shipdate").between("1996-01-01", "1996-03-31"))
          .groupBy("l_suppkey")
          .agg(sum(rev).as("total_rev"))
        val top = broadcast(revs.agg(max("total_rev").as("__max_rev")))
        revs.crossJoin(top)
          .filter(col("total_rev") === col("__max_rev"))
          .join(table(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("total_rev"), 2).cast("double").as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some("""WITH revs AS (
             |  SELECT l_suppkey,
             |         sum(CAST(l_extendedprice * (1 - l_discount)
             |             AS DECIMAL(18,4))) AS total_rev
             |  FROM lineitem
             |  WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01'
             |                       AND TIMESTAMP '1996-03-31'
             |  GROUP BY 1)
             |SELECT s_suppkey, s_name,
             |       CAST(round(total_rev, 2) AS DOUBLE) AS total_revenue
             |FROM revs JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_rev = (SELECT max(total_rev) FROM revs)
             |ORDER BY s_suppkey""".stripMargin)),

    QueryDef(
      "q56_tpch_q16",
      (s, d) => {
        // TPC-H Q16 (parts/supplier relationship), adapted: the supply
        // relation is lineitem's distinct pairs; the excluded-supplier
        // set ("complaints" in the original) is negative-balance
        // suppliers — same anti-join + grouped COUNT(DISTINCT) shape.
        val excl = table(s, d, "supplier")
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
        val pts = broadcast(table(s, d, "part")
          .filter(col("p_brand") =!= "Brand#1" &&
            col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
          .select("p_partkey", "p_brand", "p_type", "p_size"))
        // No pre-distinct on the pairs: countDistinct(l_suppkey) dedups
        // within each group and the anti-join is row-independent, so the
        // explicit distinct only added a full-lineitem shuffle BEFORE the
        // selective part filter. Joining raw pairs lets the broadcast
        // filter run first and the distinct-aggregate's map-side partial
        // dedup the survivors (one shuffle of distinct pairs, not two).
        table(s, d, "lineitem")
          .select("l_partkey", "l_suppkey")
          .join(pts, col("l_partkey") === col("p_partkey"))
          .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"),
            "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct("l_suppkey").as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
             |       count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
             |JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#1'
             |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
             |                        WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""
        .stripMargin)),

    QueryDef(
      "q57_tpch_q17",
      (s, d) => {
        // TPC-H Q17 (small-quantity-order revenue): lineitems under
        // 20% of their part's average quantity. The correlated average
        // is one per-part aggregate joined back; the comparison is
        // cross-multiplied (5·cnt·qty < sum_qty) over exact DECIMAL
        // terms so no engine's division rounding can flip a boundary
        // row. Output scaled by 1/7 per the spec.
        val pts = broadcast(table(s, d, "part")
          .filter(col("p_brand") === "Brand#13").select("p_partkey"))
        val li = table(s, d, "lineitem")
          .join(pts, col("l_partkey") === col("p_partkey"))
        val avgq = li.groupBy(col("l_partkey").as("ak"))
          .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("sum_qty"),
            count(lit(1)).as("cnt"))
        li.join(broadcast(avgq), col("l_partkey") === col("ak"))
          .filter(lit(5) * col("cnt") * col("l_quantity").cast("decimal(18,4)")
            < col("sum_qty"))
          .agg(round(sum(col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double") / 7.0, 2).as("avg_yearly"))
      },
      Some("""WITH li AS (
             |  SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,4)) AS qty,
             |         l_extendedprice
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE p_brand = 'Brand#13'),
             |avgq AS (
             |  SELECT l_partkey AS ak, sum(qty) AS sum_qty, count(*) AS cnt
             |  FROM li GROUP BY 1)
             |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
             |                  AS DOUBLE) / 7.0, 2) AS avg_yearly
             |FROM li JOIN avgq ON l_partkey = ak
             |WHERE 5 * cnt * qty < sum_qty""".stripMargin)),

    QueryDef(
      "q58_tpch_q12",
      (s, d) => {
        // TPC-H Q12 (shipping modes and order priority), adapted: no
        // l_shipmode/l_receiptdate → the mode is l_linestatus and
        // "late" is shipped more than 90 days after the order date.
        // Same shape: one fact⋈fact join on the orderkey, conditional
        // sums splitting critical from non-critical priorities.
        val li = table(s, d, "lineitem")
          .select("l_orderkey", "l_linestatus", "l_shipdate")
        val ord = table(s, d, "orders")
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .groupBy("l_linestatus")
          .agg(
            sum(when(col("o_orderpriority") === "1-URGENT" ||
              col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
              .as("high_line_count"),
            sum(when(col("o_orderpriority") =!= "1-URGENT" &&
              col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
              .as("low_line_count"))
          .orderBy("l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "q59_tpch_q11",
      (s, d) => {
        // TPC-H Q11 (important stock identification), adapted: no
        // partsupp → "stock value" is each part's shipped revenue from
        // suppliers of one nation, kept when it exceeds a fixed
        // fraction of that nation's total. The shape is Q11's: a
        // grouped aggregate filtered by a scalar aggregate OVER THE
        // SAME frame — the 1-row total broadcasts back over the
        // per-part rows (a 1-row BroadcastNestedLoopJoin, the
        // textbook scalar-subquery shape — see q27), one shuffle
        // total.
        val sup = broadcast(table(s, d, "supplier")
          .join(table(s, d, "nation").filter(col("n_name") === "NATION_3"),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey"))
        val vals = table(s, d, "lineitem")
          .join(sup, col("l_suppkey") === col("s_suppkey"), "left_semi")
          .groupBy("l_partkey")
          .agg(sum(rev).as("value"))
        val total = broadcast(vals.agg(sum("value").as("__total")))
        vals.crossJoin(total)
          .filter(col("value") > col("__total") * lit(0.001))
          .select(col("l_partkey"),
            round(col("value"), 2).cast("double").as("part_value"))
          .orderBy(col("part_value").desc, col("l_partkey"))
      },
      Some("""WITH vals AS (
             |  SELECT l_partkey,
             |         sum(CAST(l_extendedprice * (1 - l_discount)
             |             AS DECIMAL(18,4))) AS value
             |  FROM lineitem
             |  WHERE l_suppkey IN (
             |    SELECT s_suppkey FROM supplier
             |    JOIN nation ON s_nationkey = n_nationkey
             |    WHERE n_name = 'NATION_3')
             |  GROUP BY 1)
             |SELECT l_partkey, CAST(round(value, 2) AS DOUBLE) AS part_value
             |FROM vals
             |WHERE value > (SELECT sum(value) FROM vals) * 0.001
             |ORDER BY part_value DESC, l_partkey""".stripMargin)),

    QueryDef(
      "q60_tpch_q20",
      (s, d) => {
        // TPC-H Q20 (potential part promotion), adapted: no partsupp →
        // a supplier qualifies when, for some name-filtered part, it
        // shipped MORE THAN HALF of that part's 1996 volume (the
        // original's "availqty > half the shipped quantity" gate,
        // re-anchored on observable data). Shape preserved: an inner
        // per-(part, supplier) aggregate, a per-part total, the
        // half-share comparison, then a semi-join up to the supplier
        // dimension — both aggregates share the l_partkey shuffle key.
        val pts = broadcast(table(s, d, "part")
          .filter(col("p_name").startsWith("old")).select("p_partkey"))
        val li96 = table(s, d, "lineitem")
          .filter(col("l_shipdate").between("1996-01-01", "1996-12-31"))
          .join(pts, col("l_partkey") === col("p_partkey"), "left_semi")
        val perPair = li96.groupBy("l_partkey", "l_suppkey")
          .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("sq"))
        val perPart = li96.groupBy(col("l_partkey").as("pk"))
          .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("tq"))
        val dominant = perPair
          .join(perPart, col("l_partkey") === col("pk"))
          .filter(col("sq") * lit(2) > col("tq"))
          .select("l_suppkey")
        table(s, d, "supplier")
          .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey")
      },
      Some("""WITH li96 AS (
             |  SELECT l_partkey, l_suppkey,
             |         CAST(l_quantity AS DECIMAL(18,4)) AS qty
             |  FROM lineitem
             |  WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01'
             |                       AND TIMESTAMP '1996-12-31'
             |    AND l_partkey IN (SELECT p_partkey FROM part
             |                      WHERE p_name LIKE 'old%')),
             |pair AS (SELECT l_partkey, l_suppkey, sum(qty) AS sq
             |         FROM li96 GROUP BY 1, 2),
             |tot AS (SELECT l_partkey AS pk, sum(qty) AS tq
             |        FROM li96 GROUP BY 1)
             |SELECT s_suppkey, s_name FROM supplier
             |WHERE s_suppkey IN (
             |  SELECT l_suppkey FROM pair JOIN tot ON l_partkey = pk
             |  WHERE sq * 2 > tq)
             |ORDER BY s_suppkey""".stripMargin))
  )
}
