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
  * `events.ts` is parquet TIMESTAMP(NANOS) — sessions set
  * `spark.sql.legacy.parquet.nanosAsLong=true`, so it arrives as a
  * LongType of epoch-nanos and is converted with integer division.
  */
object StreamingQueries {

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // epoch nanos (nanosAsLong)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "st01_stream_hourly",
      (s, d) => {
        val sink = s"st01_out_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val stream = s.readStream
          .schema(eventsSchema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(d)
          .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
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
             |GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin))
  )
}
