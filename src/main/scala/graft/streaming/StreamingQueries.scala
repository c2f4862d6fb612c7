package graft.streaming

import graft.QueryDef
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table.
  *
  * st01 runs a real streaming query (file source → event-time tumbling
  * window + watermark → memory sink) and returns the final result; the
  * DuckDB oracle is the equivalent batch aggregation, so the check
  * proves the streaming pipeline computes the same answer as batch.
  *
  * `events.ts` has been generated as both parquet TIMESTAMP(NANOS)
  * (surfacing as LongType epoch-nanos under
  * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS)
  * (surfacing as timestamp_ntz). A streaming file source needs an
  * explicit schema, so [[eventsTs]] probes the file's footer with a
  * batch read (one metadata access) and returns the matching schema
  * plus the normalizing epoch-micros expression.
  */
object StreamingQueries {

  import org.apache.spark.sql.{Column, SparkSession}

  /** (streaming schema matching the file, epoch-micros-of-ts column). */
  private def eventsTs(s: SparkSession, d: String): (StructType, Column) = {
    val tsType = s.read.option("pathGlobFilter", "events.parquet")
      .parquet(d).schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val tsUs = tsType match {
      case LongType => expr("ts div 1000") // epoch nanos
      case _ => unix_micros(col("ts").cast(TimestampType))
    }
    (schema, tsUs)
  }


  /** Shared oracle for all three sessionization implementations:
    * batch gaps-and-islands in DuckDB.
    */
  private final val SessionOracle: String =
    ("""WITH ev AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us,
             |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |              THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
             |), sess AS (
             |  SELECT user_id,
             |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
             |  FROM ev
             |), per AS (
             |  SELECT user_id, sess_id, count(*) AS n_events
             |  FROM sess GROUP BY user_id, sess_id
             |)
             |SELECT count(*) AS n_sessions,
             |       round(avg(n_events), 4) AS avg_events_per_session,
             |       max(n_events) AS max_session_len
             |FROM per""".stripMargin)

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "st01_stream_hourly",
      (s, d) => {
        val sink = s"st01_out_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val (schema, tsUs) = eventsTs(s, d)
        val stream = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .withColumn("event_ts", timestamp_micros(tsUs))
          .withWatermark("event_ts", "1 hour")
          .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            round(sum("value"), 2).as("total_value"))
        val q = stream.writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(sink)
          .select(
            unix_micros(col("window.start")).as("hour_us"),
            col("event_type"), col("n_events"), col("total_value"))
          .orderBy("hour_us", "event_type")
      },
      Some("""SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS hour_us,
             |       event_type, count(*) AS n_events,
             |       round(sum(value), 2) AS total_value
             |FROM events
             |GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin)),

    QueryDef(
      "st04_stream_dedup",
      (s, d) => {
        // Streaming exact dedup: dropDuplicates holds one state row
        // per (user_id, event_type) key and emits only first
        // occurrences — the streaming half of the dedup family
        // (dd01's batch hash-dedup shape, as a stateful operator).
        // The deduped stream lands in the sink, then a batch
        // aggregate over it must equal batch COUNT(DISTINCT).
        val sink = s"st04_out_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val (schema, tsUs) = eventsTs(s, d)
        val q = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .withColumn("event_ts", timestamp_micros(tsUs))
          .withWatermark("event_ts", "1 hour")
          .dropDuplicates("user_id", "event_type")
          .writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(sink)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_unique_users"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_unique_users
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    QueryDef(
      "st02_stateful_sessions",
      (s, d) => {
        // Custom streaming state: flatMapGroupsWithState sessionizes
        // each user's event stream (30-min idle gap). The oracle is the
        // batch gaps-and-islands SQL — streaming-state result must
        // equal batch semantics.
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
        import s.implicits._
        val sink = s"st02_out_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val gapUs = 1800000000L
        val (schema, tsUs) = eventsTs(s, d)
        val parsed = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .select(col("user_id"), tsUs.as("ts_us"))
          .as[(Long, Long)]
        val sessions = parsed
          .groupByKey(_._1)
          .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            // state = (lastTs, openSessionIndex) stitches batches
            case (uid, evs, state: GroupState[(Long, Long)]) =>
              val ts = evs.map(_._2).toArray.sorted
              var (lastTs, sess) = state.getOption.getOrElse((Long.MinValue, 0L))
              val out = Seq.newBuilder[(Long, Long, Long)]
              var count = 0L
              ts.foreach { t =>
                if (lastTs == Long.MinValue || t - lastTs > gapUs) {
                  if (count > 0) out += ((uid, sess, count))
                  sess += 1
                  count = 0
                }
                count += 1
                lastTs = t
              }
              if (count > 0) out += ((uid, sess, count))
              state.update((lastTs, sess))
              out.result().iterator
          }
          .toDF("user_id", "sess_id", "n_events")
        val q = sessions.writeStream
          .format("memory")
          .queryName(sink)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(sink)
          .groupBy()
          .agg(count(lit(1)).as("n_sessions"),
            round(avg("n_events"), 4).as("avg_events_per_session"),
            max("n_events").as("max_session_len"))
      },
      Some(SessionOracle)),

    QueryDef(
      "st03_session_window",
      (s, d) => {
        // Spark's NATIVE session_window operator (dynamic-gap session
        // aggregation) — third implementation of the same semantics;
        // must agree with the window-function batch (q23) and the
        // flatMapGroupsWithState (st02) versions.
        val ev0 = s.read.parquet(s"$d/events.parquet")
        val ev = ev0
          .withColumn("event_ts", timestamp_micros(graft.QueryDef.tsUs(ev0, "ts")))
        val perSession = ev
          .groupBy(col("user_id"), session_window(col("event_ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"))
        perSession
          .groupBy()
          .agg(count(lit(1)).as("n_sessions"),
            round(avg("n_events"), 4).as("avg_events_per_session"),
            max("n_events").as("max_session_len"))
      },
      Some(SessionOracle)),

    QueryDef(
      "st05_stream_ingest",
      (s, d) => {
        // Streaming INGESTION into a graft table: file stream →
        // foreachBatch, each micro-batch an atomic snapshot commit
        // through the same DSv2 write path as batch appends (on a real
        // deployment the micro-batch cadence gives a commit-per-batch
        // history that expire_snapshots trims). The oracle is the batch
        // view of the same input — streamed-in content must be
        // indistinguishable from a batch load.
        if (s.conf.getOption("spark.sql.catalog.gst").isEmpty) {
          s.conf.set("spark.sql.catalog.gst",
            classOf[graft.spark.GraftCatalog].getName)
          s.conf.set("spark.sql.catalog.gst.warehouse",
            java.nio.file.Files.createTempDirectory("graft-gst").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS gst.ns1")
        s.sql("DROP TABLE IF EXISTS gst.ns1.events_in")
        s.sql("""CREATE TABLE gst.ns1.events_in (
                   event_id BIGINT, user_id BIGINT, event_type STRING,
                   value DOUBLE)""")
        val checkpoint =
          java.nio.file.Files.createTempDirectory("graft-st05").toString
        val (schema, _) = eventsTs(s, d)
        val q = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .select("event_id", "user_id", "event_type", "value")
          .writeStream
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) => batch.writeTo("gst.ns1.events_in").append()
          }
          .option("checkpointLocation", checkpoint)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.sql("""SELECT event_type, count(*) AS n,
                        count(DISTINCT user_id) AS n_users,
                        round(sum(value), 2) AS total
                 FROM gst.ns1.events_in
                 GROUP BY event_type ORDER BY event_type""")
      },
      Some("""SELECT event_type, count(*) AS n,
             |       count(DISTINCT user_id) AS n_users,
             |       round(sum(value), 2) AS total
             |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)),

    QueryDef(
      "st06_stream_table_source",
      (s, d) => {
        // A graft table as a streaming SOURCE: stream offsets are
        // snapshot ids, so each trigger discovers new commits from ONE
        // metadata-document read (no directory listing), and a
        // micro-batch reads exactly the appended files. Three commits
        // land across two triggers; the streamed union must equal the
        // batch view of all three slices.
        if (s.conf.getOption("spark.sql.catalog.gsr").isEmpty) {
          s.conf.set("spark.sql.catalog.gsr",
            classOf[graft.spark.GraftCatalog].getName)
          s.conf.set("spark.sql.catalog.gsr.warehouse",
            java.nio.file.Files.createTempDirectory("graft-gsr").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS gsr.ns1")
        s.sql("DROP TABLE IF EXISTS gsr.ns1.ord_src")
        s.sql("""CREATE TABLE gsr.ns1.ord_src (
                   o_orderkey BIGINT, o_orderpriority STRING,
                   o_totalprice DOUBLE)""")
        def slice(m: Int): Unit =
          s.sql(s"""INSERT INTO gsr.ns1.ord_src
                    SELECT o_orderkey, o_orderpriority, o_totalprice
                    FROM parquet.`$d/orders.parquet`
                    WHERE o_orderkey % 3 = $m""")
        slice(0)
        val sink = s"st06_out_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val checkpoint =
          java.nio.file.Files.createTempDirectory("graft-st06").toString
        val q = s.readStream.table("gsr.ns1.ord_src")
          .writeStream
          .format("memory").queryName(sink)
          .option("checkpointLocation", checkpoint)
          .start()
        try {
          q.processAllAvailable()
          slice(1); slice(2)
          q.processAllAvailable()
        } finally q.stop()
        s.table(sink)
          .groupBy("o_orderpriority")
          .agg(count("*").as("n"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |       round(sum(o_totalprice), 2) AS total
             |FROM orders
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      "st07_stream_changes",
      (s, d) => {
        // The CDC feed as a STREAM: `<table>$changes` emits each
        // commit's row-level changes per micro-batch (append →
        // inserts; merge-on-read delete → deletes; position-delta
        // update → delete+insert), bounded to one snapshot per trigger.
        // The streamed ledger must replay to the same per-priority
        // totals DuckDB computes from the raw operations.
        if (s.conf.getOption("spark.sql.catalog.gsc").isEmpty) {
          s.conf.set("spark.sql.catalog.gsc",
            classOf[graft.spark.GraftCatalog].getName)
          s.conf.set("spark.sql.catalog.gsc.warehouse",
            java.nio.file.Files.createTempDirectory("graft-gsc").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS gsc.ns1")
        s.sql("DROP TABLE IF EXISTS gsc.ns1.ord_cdc")
        s.sql("""CREATE TABLE gsc.ns1.ord_cdc (
                   o_orderkey BIGINT, o_orderpriority STRING,
                   o_totalprice DOUBLE)
                 TBLPROPERTIES ('graft.update.mode' = 'merge-on-read',
                                'graft.delete.mode' = 'merge-on-read')""")
        s.sql(s"""INSERT INTO gsc.ns1.ord_cdc
                  SELECT o_orderkey, o_orderpriority, o_totalprice
                  FROM parquet.`$d/orders.parquet`""")
        // equality predicate: translatable to a V2 filter, so the mor
        // DELETE commits a predicate (a non-translatable one would fall
        // back to copy-on-write, which the per-file feed refuses)
        s.sql("DELETE FROM gsc.ns1.ord_cdc WHERE o_orderpriority = '1-URGENT'")
        s.sql("""UPDATE gsc.ns1.ord_cdc SET o_totalprice = 0.0
                 WHERE o_orderkey % 7 = 1""")
        val sink = s"st07_out_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val checkpoint =
          java.nio.file.Files.createTempDirectory("graft-st07").toString
        val q = s.readStream
          .option("max-snapshots-per-trigger", "1")
          .table("gsc.ns1.`ord_cdc$changes`")
          .writeStream
          .format("memory").queryName(sink)
          .option("checkpointLocation", checkpoint)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination(300000) finally q.stop()
        // replay the ledger: inserts count +1, deletes −1; net rows
        // and the net totals must equal the operations' direct result
        s.table(sink)
          .groupBy("o_orderpriority")
          .agg(
            sum(when(col("_change_type") === "insert", 1L).otherwise(-1L))
              .as("n"),
            round(sum(when(col("_change_type") === "insert",
              col("o_totalprice")).otherwise(-col("o_totalprice"))), 2)
              .as("total"))
          // the fully-deleted priority nets to zero rows — not a group
          // in the oracle's direct view
          .where(col("n") > 0)
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |       round(sum(CASE WHEN o_orderkey % 7 = 1 THEN 0.0
             |                      ELSE o_totalprice END), 2) AS total
             |FROM orders WHERE o_orderpriority <> '1-URGENT'
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      "st08_stream_upsert",
      (s, d) => {
        // Native streaming UPSERT sink: writeStream into a graft table
        // whose `graft.write.upsert-keys` property names key columns.
        // Each micro-batch commits data files + an equality-delete
        // object of the batch's keys — rows with those keys in
        // strictly-older files are logically replaced, nothing is
        // rewritten. Three keyed epochs stream from a graft source
        // table (snapshot-sliced batches: deterministic epochs); the
        // oracle is "latest version per key" computed directly.
        if (s.conf.getOption("spark.sql.catalog.gup").isEmpty) {
          s.conf.set("spark.sql.catalog.gup",
            classOf[graft.spark.GraftCatalog].getName)
          s.conf.set("spark.sql.catalog.gup.warehouse",
            java.nio.file.Files.createTempDirectory("graft-gup").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS gup.ns1")
        s.sql("DROP TABLE IF EXISTS gup.ns1.cust_src")
        s.sql("DROP TABLE IF EXISTS gup.ns1.cust_state")
        s.sql("""CREATE TABLE gup.ns1.cust_src (
                   k BIGINT, seg STRING, bal DOUBLE, ver INT)""")
        s.sql("""CREATE TABLE gup.ns1.cust_state (
                   k BIGINT, seg STRING, bal DOUBLE, ver INT)
                 TBLPROPERTIES ('graft.write.upsert-keys' = 'k')""")
        def slice(mod: Int, ver: Int): Unit =
          s.sql(s"""INSERT INTO gup.ns1.cust_src
                    SELECT c_custkey, c_mktsegment,
                           round(c_acctbal, 2) + ${100 * ver}, $ver
                    FROM parquet.`$d/customer.parquet`
                    WHERE c_custkey % $mod = 0""")
        slice(1, 0) // every key, version 0
        val checkpoint =
          java.nio.file.Files.createTempDirectory("graft-st08").toString
        val q = s.readStream.table("gup.ns1.cust_src")
          .writeStream
          .option("checkpointLocation", checkpoint)
          .toTable("gup.ns1.cust_state")
        try {
          q.processAllAvailable() // epoch 0
          slice(2, 1); q.processAllAvailable() // epoch 1: even keys
          slice(4, 2); q.processAllAvailable() // epoch 2: keys % 4 = 0
        } finally q.stop()
        s.sql("""SELECT ver, count(*) AS n, round(sum(bal), 2) AS total
                 FROM gup.ns1.cust_state GROUP BY ver ORDER BY ver""")
      },
      Some("""WITH latest AS (
             |  SELECT CASE WHEN c_custkey % 4 = 0 THEN 2
             |              WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END AS ver,
             |         round(c_acctbal, 2) +
             |           100 * (CASE WHEN c_custkey % 4 = 0 THEN 2
             |                       WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END) AS bal
             |  FROM customer)
             |SELECT ver, count(*) AS n, round(sum(bal), 2) AS total
             |FROM latest GROUP BY ver ORDER BY ver""".stripMargin)),

    QueryDef(
      "st09_stream_stream_join",
      (s, d) => {
        // Stream-STREAM interval join (attribution): every purchase a
        // user makes within 30 minutes of their click joins to that
        // click. Both sides are watermarked and the join condition
        // bounds event time on both ends, so Spark's state store
        // retains each side only inside the watermark horizon — state
        // is bounded by (rate × window), not by stream length, which
        // is what lets the same query run forever on an unbounded
        // production stream. The oracle is the equivalent batch
        // interval self-join: streamed results must equal batch.
        val sink =
          s"st09_out_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        // state partitioning is a (rate × window)-sizing decision,
        // DECOUPLED from the batch shuffle width: every partition
        // carries four state stores whose per-batch checkpoint commit
        // is pure fixed cost when state is small (32 partitions: 13.8s
        // for 183 pairs; 8: 3.8s — measured at sf0.1). The streaming
        // query runs in a DERIVED session so the caller's batch
        // setting is untouched; production raises the conf to match
        // its state volume.
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions",
          s.conf.getOption("spark.graft.stream.join-partitions")
            .getOrElse("8"))
        val (schema, tsUs) = eventsTs(ss, d)
        def side(tpe: String, p: String) = ss.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .withColumn("event_ts", timestamp_micros(tsUs))
          .filter(col("event_type") === tpe)
          .select(col("user_id").as(s"${p}_user"),
            col("event_ts").as(s"${p}_ts"),
            col("value").as(s"${p}_value"))
          .withWatermark(s"${p}_ts", "1 hour")
        val joined = side("click", "c").join(side("purchase", "p"),
          col("p_user") === col("c_user") &&
            col("p_ts") >= col("c_ts") &&
            col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"))
        val q = joined.writeStream
          .format("memory").queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        ss.table(sink)
          .agg(count(lit(1)).as("n_pairs"),
            count_distinct(col("c_user")).as("n_users"),
            round(sum("p_value"), 2).as("attributed_value"))
      },
      Some("""SELECT count(*) AS n_pairs,
             |       count(DISTINCT c.user_id) AS n_users,
             |       round(sum(p.value), 2) AS attributed_value
             |FROM events c JOIN events p
             |  ON p.user_id = c.user_id
             | AND c.event_type = 'click' AND p.event_type = 'purchase'
             | AND epoch_us(p.ts) >= epoch_us(c.ts)
             | AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000"""
        .stripMargin)),

    QueryDef(
      "st10_stream_outer_join",
      (s, d) => {
        // LEFT OUTER stream-stream join: a click with no purchase
        // within 30 minutes emits as a NULL-extended row only when
        // the WATERMARK passes its join window — state eviction IS
        // the emission trigger, the subtlety outer streaming joins
        // add over st09's inner join. Clicks inside the stream's
        // final watermark horizon (delay + window) are never evicted,
        // so their outer rows never emit; both the stream and the
        // batch oracle therefore bound the left side to
        // ts ≤ cutoff − 2 h. The cutoff derives from the LESSER of
        // the two sides' max event times — each side's watermark
        // tracks only its own rows, so the join watermark is
        // min(max_click, max_purchase) − delay, and a cutoff from the
        // global max would strand a boundary click un-evicted when
        // the last click/purchase trails the last event by more than
        // the margin (observed at sf0.001's sparse tail).
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions",
          s.conf.getOption("spark.graft.stream.join-partitions")
            .getOrElse("8"))
        val sink =
          s"st10_out_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val (schema, tsUs) = eventsTs(ss, d)
        val ev0 = ss.read.option("pathGlobFilter", "events.parquet").parquet(d)
        val evTs = graft.QueryDef.tsUs(ev0, "ts")
        val mx = ev0.agg(
          max(when(col("event_type") === "click", evTs)).as("mc"),
          max(when(col("event_type") === "purchase", evTs)).as("mp")).head
        val cutoff = math.min(mx.getLong(0), mx.getLong(1)) - 7200000000L
        def side(tpe: String, p: String) = ss.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .withColumn("event_ts", timestamp_micros(tsUs))
          .filter(col("event_type") === tpe)
          .select(col("user_id").as(s"${p}_user"),
            col("event_ts").as(s"${p}_ts"),
            col("value").as(s"${p}_value"))
          .withWatermark(s"${p}_ts", "1 hour")
        val clicks = side("click", "c")
          .filter(col("c_ts") <= timestamp_micros(lit(cutoff)))
        val joined = clicks.join(side("purchase", "p"),
          col("p_user") === col("c_user") &&
            col("p_ts") >= col("c_ts") &&
            col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES"),
          "left_outer")
        val q = joined.writeStream
          .format("memory").queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        ss.table(sink)
          .agg(count(lit(1)).as("n_rows"),
            count(col("p_value")).as("n_matched"),
            sum(when(col("p_value").isNull, 1L).otherwise(0L))
              .as("n_unmatched"))
      },
      Some("""WITH mx AS (SELECT least(
             |        max(epoch_us(ts)) FILTER (event_type = 'click'),
             |        max(epoch_us(ts)) FILTER (event_type = 'purchase'))
             |        AS m FROM events),
             |c AS (SELECT user_id, ts FROM events, mx
             |      WHERE event_type = 'click'
             |        AND epoch_us(ts) <= m - 7200000000),
             |p AS (SELECT user_id, ts, value FROM events
             |      WHERE event_type = 'purchase')
             |SELECT count(*) AS n_rows,
             |       count(p.value) AS n_matched,
             |       CAST(sum(CASE WHEN p.value IS NULL THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_unmatched
             |FROM c LEFT JOIN p
             |  ON p.user_id = c.user_id
             | AND epoch_us(p.ts) >= epoch_us(c.ts)
             | AND epoch_us(p.ts) <= epoch_us(c.ts) + 1800000000"""
        .stripMargin)),

    QueryDef(
      "st11_stream_static_join",
      (s, d) => {
        // Stream-STATIC enrichment: each purchase event joins a graft
        // DIMENSION table (customer → market segment) inside the
        // micro-batch — the most common production streaming shape
        // (enrich then aggregate). The static side is a native DSv2
        // graft-table scan re-planned per batch (catalog metadata
        // serves the file list) and BROADCASTS into the stream: no
        // shuffle, and — unlike st09/st10 — no state store at all,
        // because a stream-static join keeps no streaming state (which
        // is also why no watermark is needed). Per-segment revenue
        // must equal the batch join.
        if (s.conf.getOption("spark.sql.catalog.gsj").isEmpty) {
          s.conf.set("spark.sql.catalog.gsj",
            classOf[graft.spark.GraftCatalog].getName)
          s.conf.set("spark.sql.catalog.gsj.warehouse",
            java.nio.file.Files.createTempDirectory("graft-gsj").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS gsj.ns1")
        s.sql("DROP TABLE IF EXISTS gsj.ns1.dim")
        s.sql("CREATE TABLE gsj.ns1.dim (cust BIGINT, segment STRING)")
        s.sql(s"""INSERT INTO gsj.ns1.dim
                  SELECT c_custkey, c_mktsegment
                  FROM parquet.`$d/customer.parquet`""")
        val (schema, _) = eventsTs(s, d)
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(d)
          .filter(col("event_type") === "purchase")
        val sink =
          s"st11_out_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val q = stream
          .join(broadcast(s.table("gsj.ns1.dim")),
            col("user_id") === col("cust"))
          .writeStream.format("memory").queryName(sink)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(sink).groupBy(col("segment"))
          .agg(count(lit(1)).as("n_purchases"),
            round(sum("value"), 2).as("revenue"))
          .orderBy("segment")
      },
      Some("""SELECT c_mktsegment AS segment, count(*) AS n_purchases,
             |       round(sum(value), 2) AS revenue
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey
             |WHERE e.event_type = 'purchase'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    QueryDef(
      "st12_stream_curation",
      (s, d) => {
        // Streaming CURATION: the quality gate runs per micro-batch on
        // a live ingest stream — the shape a 100 TB/day pipeline
        // actually deploys (filter at ingest, never a full-corpus
        // batch pass later). Documents arrive in two commits; each
        // micro-batch applies the scan-local word-count + stopword
        // rules (stateless — no watermark, no state store, executors
        // never hold more than a batch partition), and the admitted
        // stream must aggregate to exactly the batch answer over the
        // whole corpus.
        if (s.conf.getOption("spark.sql.catalog.gcur").isEmpty) {
          s.conf.set("spark.sql.catalog.gcur",
            classOf[graft.spark.GraftCatalog].getName)
          s.conf.set("spark.sql.catalog.gcur.warehouse",
            java.nio.file.Files.createTempDirectory("graft-gcur").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS gcur.ns1")
        s.sql("DROP TABLE IF EXISTS gcur.ns1.doc_src")
        s.sql("""CREATE TABLE gcur.ns1.doc_src (
                   doc_id BIGINT, text STRING, lang STRING)""")
        def slice(m: Int): Unit =
          s.sql(s"""INSERT INTO gcur.ns1.doc_src
                    SELECT doc_id, text, lang
                    FROM parquet.`$d/documents.parquet`
                    WHERE doc_id % 2 = $m""")
        slice(0)
        val stop = Seq("the", "a", "of", "to", "and", "in", "is", "it")
          .map(w => s"'$w'").mkString(", ")
        val sink =
          s"st12_out_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val checkpoint =
          java.nio.file.Files.createTempDirectory("graft-st12").toString
        val q = s.readStream.table("gcur.ns1.doc_src")
          .withColumn("ws", split(trim(col("text")), "\\s+"))
          .withColumn("n_words", size(col("ws")))
          .filter(col("n_words") >= 10 &&
            expr(s"size(filter(ws, w -> lower(w) IN ($stop))) >= 1"))
          .select("doc_id", "lang", "n_words")
          .writeStream
          .format("memory").queryName(sink)
          .option("checkpointLocation", checkpoint)
          .start()
        try {
          q.processAllAvailable()
          slice(1)
          q.processAllAvailable()
        } finally q.stop()
        s.table(sink)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_words").as("total_tokens"))
          .orderBy("lang")
      },
      Some("""WITH m AS (
             |  SELECT lang,
             |         len(string_split_regex(trim(text), '\s+')) AS n_words,
             |         len(list_filter(string_split_regex(trim(text), '\s+'),
             |             w -> lower(w) IN ('the', 'a', 'of', 'to', 'and',
             |                               'in', 'is', 'it'))) AS n_stop
             |  FROM documents)
             |SELECT lang, count(*) AS n_docs,
             |       CAST(sum(n_words) AS BIGINT) AS total_tokens
             |FROM m WHERE n_words >= 10 AND n_stop >= 1
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    QueryDef(
      "st13_stream_mv",
      (s, d) => {
        // Streaming ingest KEEPS A MATERIALIZED VIEW FRESH: orders
        // arrive on a landing stream; each micro-batch appends to the
        // graft source table and refreshes the MV, and every one of
        // those refreshes must take the INCREMENTAL path (aggregate
        // the batch-sized delta, merge — never a full recompute while
        // the ingest only appends). This is the 100 TB serving
        // pattern: the dashboard aggregate is maintained at the cost
        // of the ARRIVING data, and GraftMvRewrite serves queries
        // from it between batches. The final MV state must hash-match
        // DuckDB's from-scratch aggregate over everything streamed.
        if (s.conf.getOption("spark.sql.catalog.gsmv").isEmpty) {
          s.conf.set("spark.sql.catalog.gsmv",
            classOf[graft.spark.GraftCatalog].getName)
          s.conf.set("spark.sql.catalog.gsmv.warehouse",
            java.nio.file.Files.createTempDirectory("graft-gsmv").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS gsmv.ns1")
        s.sql("DROP TABLE IF EXISTS gsmv.ns1.mv")
        s.sql("DROP TABLE IF EXISTS gsmv.ns1.ord")
        s.sql("DROP TABLE IF EXISTS gsmv.ns1.landing")
        Seq("ord", "landing").foreach(t =>
          s.sql(s"""CREATE TABLE gsmv.ns1.$t (
                      o_orderkey BIGINT, o_orderstatus STRING,
                      o_totalprice DOUBLE, o_orderpriority STRING)"""))
        def slice(m: Int, into: String): Unit =
          s.sql(s"""INSERT INTO gsmv.ns1.$into
                    SELECT o_orderkey, o_orderstatus, o_totalprice,
                           o_orderpriority
                    FROM parquet.`$d/orders.parquet`
                    WHERE o_orderkey % 3 = $m""")
        // seed the source with slice 0 so the MV starts from a live
        // snapshot, then stream slices 1 and 2 through the landing
        // table in two micro-batches
        slice(0, "ord")
        s.sql("""CALL gsmv.system.create_materialized_view(
                   namespace => 'ns1', name => 'mv',
                   source_namespace => 'ns1', source_table => 'ord',
                   group_by => 'o_orderstatus,o_orderpriority',
                   aggs => 'n:count:1;total:sum:CAST(o_totalprice AS DECIMAL(18,2));mx:max:o_totalprice')""")
        val modes = scala.collection.mutable.ArrayBuffer.empty[String]
        val checkpoint =
          java.nio.file.Files.createTempDirectory("graft-st13").toString
        val q = s.readStream.table("gsmv.ns1.landing")
          .writeStream
          .option("checkpointLocation", checkpoint)
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batch.writeTo("gsmv.ns1.ord").append()
            modes += s.sql("""CALL gsmv.system.refresh_materialized_view(
                                namespace => 'ns1', name => 'mv')""")
              .head.getString(0)
            ()
          }
          .start()
        try {
          slice(1, "landing")
          q.processAllAvailable()
          slice(2, "landing")
          q.processAllAvailable()
        } finally q.stop()
        require(modes.nonEmpty && modes.forall(_ == "incremental"),
          s"every micro-batch must refresh incrementally, took: $modes")
        s.sql("""SELECT o_orderstatus AS status, o_orderpriority AS prio,
                        n, CAST(total AS DOUBLE) AS total, mx
                 FROM gsmv.ns1.mv ORDER BY status, prio""")
      },
      Some("""SELECT o_orderstatus AS status, o_orderpriority AS prio,
             |       count(*) AS n,
             |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             |            AS DOUBLE) AS total,
             |       max(o_totalprice) AS mx
             |FROM orders
             |GROUP BY 1, 2 ORDER BY status, prio""".stripMargin))
  )

}
