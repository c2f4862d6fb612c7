package graft.queries

import graft.QueryDef
import graft.QueryDef.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query battery over the driver testdata (SURVEY.md §2.7
  * Q1–Q5 plus the Spark-builtin surface: window, sort/limit, set ops,
  * distinct aggregates, rollup, semi-join, scalar functions).
  *
  * Determinism rules (driver hash-compares against DuckDB):
  *  - every query ends with a total ORDER BY over its output key;
  *  - timestamp outputs are emitted as epoch microseconds (BIGINT) —
  *    `unix_micros(cast ntz→tz)` in Spark == `epoch_us(ts)` in DuckDB
  *    under a UTC session;
  *  - double aggregates are rounded (sum→2dp, avg/ratio→4dp) so the
  *    1-ulp accumulation-order differences between engines vanish.
  *
  * Scale notes (100 TB design): all queries are pure DataFrame plans —
  * filters/projections reach the parquet scan via Catalyst pushdown,
  * aggregations are partial (map-side combine) by construction, and the
  * only broadcast-able dimensions (customer, orders at TPC-H ratios
  * orders≪lineitem is false — orders is large, so that join stays
  * shuffle-based and AQE picks the strategy at runtime).
  */
object Relational {

  /** epoch-microseconds of a timestamp_ntz column under UTC session. */
  private def us(c: String) = unix_micros(col(c).cast("timestamp"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q01_full_scan",
      (s, d) =>
        table(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax"), col("l_returnflag"),
            col("l_linestatus"), us("l_shipdate").as("l_shipdate_us"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
             |       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
             |       epoch_us(l_shipdate) AS l_shipdate_us
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef(
      "q02_projection",
      (s, d) =>
        table(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef(
      "q03_filter_pushdown",
      (s, d) =>
        table(s, d, "lineitem")
          .filter(col("l_shipdate") < expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'") &&
            col("l_discount") > 0.05)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"),
            us("l_shipdate").as("l_shipdate_us"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             |       l_discount, epoch_us(l_shipdate) AS l_shipdate_us
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1998-01-01' AND l_discount > 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef(
      "q04_tpch_q1_agg",
      (s, d) =>
        table(s, d, "lineitem")
          .filter(col("l_shipdate") <= expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
              (lit(1) + col("l_tax"))), 2).as("sum_charge"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            round(avg("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |       round(sum(l_quantity), 2) AS sum_qty,
             |       round(sum(l_extendedprice), 2) AS sum_base_price,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             |       round(avg(l_quantity), 4) AS avg_qty,
             |       round(avg(l_discount), 4) AS avg_disc,
             |       count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef(
      "q05_join3_agg",
      (s, d) => {
        val li = table(s, d, "lineitem")
        val o = table(s, d, "orders")
        val c = table(s, d, "customer")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("revenue"),
            countDistinct("o_orderkey").as("n_orders"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |       count(DISTINCT o_orderkey) AS n_orders
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    QueryDef(
      "q13_window_funcs",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        table(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .withColumn("running_spend",
            round(sum("o_totalprice").over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "running_spend")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, running_spend FROM (
             |  SELECT o_custkey, o_orderkey,
             |         row_number() OVER w AS rn,
             |         round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    QueryDef(
      "q14_topn",
      (s, d) =>
        table(s, d, "orders")
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    QueryDef(
      "q15_setops",
      (s, d) => {
        val urgent = table(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("custkey"))
        val highBal = table(s, d, "customer")
          .filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("custkey"))
        highBal.except(urgent).orderBy("custkey")
      },
      Some("""SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
             |EXCEPT
             |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY custkey""".stripMargin)),

    QueryDef(
      "q16_distinct_agg",
      (s, d) =>
        table(s, d, "lineitem").agg(
          countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
             |       count(DISTINCT l_suppkey) AS n_supps,
             |       count(*) AS n_rows
             |FROM lineitem""".stripMargin)),

    QueryDef(
      "q17_rollup",
      (s, d) =>
        table(s, d, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("status"),
            col("n"), col("qty"))
          .orderBy("flag", "status"),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
             |       coalesce(l_linestatus, 'ALL') AS status,
             |       count(*) AS n, round(sum(l_quantity), 2) AS qty
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY flag, status""".stripMargin)),

    QueryDef(
      "q18_semijoin",
      (s, d) => {
        val hot = table(s, d, "lineitem").filter(col("l_discount") >= 0.09)
        table(s, d, "orders")
          .join(hot, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_discount >= 0.09)
             |ORDER BY o_orderkey""".stripMargin)),

    QueryDef(
      "q19_antijoin",
      (s, d) => {
        val bulk = table(s, d, "lineitem").filter(col("l_quantity") >= 48)
        table(s, d, "part")
          .join(bulk, col("p_partkey") === col("l_partkey"), "left_anti")
          .select("p_partkey", "p_name")
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem
             |                  WHERE l_partkey = p_partkey AND l_quantity >= 48)
             |ORDER BY p_partkey""".stripMargin)),

    QueryDef(
      "q20_scalar_funcs",
      (s, d) =>
        table(s, d, "part")
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_uc"),
            substring(col("p_name"), 1, 8).as("name8"),
            length(col("p_type")).as("type_len"),
            round(col("p_retailprice") * 1.1, 2).as("marked_up"),
            when(col("p_size") >= 25, lit("L"))
              .when(col("p_size") >= 10, lit("M"))
              .otherwise(lit("S")).as("size_class"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_uc,
             |       substr(p_name, 1, 8) AS name8,
             |       length(p_type) AS type_len,
             |       round(p_retailprice * 1.1, 2) AS marked_up,
             |       CASE WHEN p_size >= 25 THEN 'L'
             |            WHEN p_size >= 10 THEN 'M' ELSE 'S' END AS size_class
             |FROM part ORDER BY p_partkey""".stripMargin)),

    QueryDef(
      "q21_broadcast_star_join",
      (s, d) => {
        // region/nation are tiny dims: broadcast explicitly — at 100 TB the
        // fact side never shuffles for these joins.
        val n = table(s, d, "nation")
        val r = table(s, d, "region")
        val c = table(s, d, "customer")
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n_cust"),
            round(sum("c_acctbal"), 2).as("total_bal"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name, count(*) AS n_cust,
             |       round(sum(c_acctbal), 2) AS total_bal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin)),

    QueryDef(
      "q22_events_sessionize",
      (s, d) => {
        // events.ts normalized to epoch-micros (type-robust — the
        // driver has generated both TIMESTAMP(NANOS) and MICROS);
        // hourly tumbling agg.
        val ev = table(s, d, "events")
        ev
          .withColumn("ts_us", QueryDef.tsUs(ev, "ts"))
          .withColumn("hour_us", expr("ts_us div 3600000000 * 3600000000"))
          .groupBy("hour_us", "event_type")
          .agg(count(lit(1)).as("n_events"),
            round(sum("value"), 2).as("total_value"),
            countDistinct("user_id").as("n_users"))
          .orderBy("hour_us", "event_type")
      },
      Some("""SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS hour_us,
             |       event_type, count(*) AS n_events,
             |       round(sum(value), 2) AS total_value,
             |       count(DISTINCT user_id) AS n_users
             |FROM events
             |GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin))
  )
}
