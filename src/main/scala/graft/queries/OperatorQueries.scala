package graft.queries

import graft.QueryDef
import graft.QueryDef.table
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** Custom-operator queries: as-of join (checked against DuckDB's
  * native ASOF JOIN) and skew-resistant salted join (checked against
  * the plain join it must be row-identical to).
  */
object OperatorQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q31_asof_join",
      (s, d) => {
        // for each purchase, the most recent prior click by that user;
        // ts normalized to epoch-micros longs up front (AsOfJoin's
        // two-cursor merge compares raw longs)
        val ev0 = table(s, d, "events")
        val ev = ev0.withColumn("ts_us", QueryDef.tsUs(ev0, "ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts_us")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us"),
            col("ts_us").as("click_ts_us"), col("value").as("click_value"))
        AsOfJoin.join(purchases, clicks, keyCol = "user_id", tsCol = "ts_us",
            valueCols = Seq("click_ts_us", "click_value"))
          .select(
            col("event_id"), col("user_id"), col("ts_us"),
            col("click_ts_us"),
            round(col("click_value"), 2).as("click_value"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
             |       epoch_us(r.ts) AS click_ts_us,
             |       round(r.value, 2) AS click_value
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
             |  ON l.user_id = r.user_id AND l.ts >= r.ts
             |ORDER BY l.event_id""".stripMargin)),

    QueryDef(
      "q32_salted_join",
      (s, d) => {
        // skew-resistant join must be row-identical to the plain join
        val li = table(s, d, "lineitem")
          .select(col("l_orderkey").as("okey"), col("l_extendedprice"),
            col("l_discount"))
        val o = table(s, d, "orders")
          .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
        AsOfJoin.saltedJoin(li, o, "okey", salt = 8)
          .groupBy("o_orderpriority")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |       count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))
  )
}
