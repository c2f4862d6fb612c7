package graft.pipeline

import graft.QueryDef
import graft.QueryDef.table
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with a typed metadata struct, batch feature extraction via
  * `mapPartitions`.
  *
  * The real decode step (image/audio codecs) is STUBBED — this
  * container has no media libraries — with a deterministic fake
  * (`FakeDecoder`). Everything Spark-side is real: the binary column,
  * the metadata schema, per-partition batch processing (one decoder
  * instance per partition, not per row), and the output schema. At
  * 100 TB the binary column rides the parquet scan and each partition
  * decodes independently — no shuffle, no driver involvement.
  */
object Multimodal {

  /** Deterministic stand-in for a codec: "decodes" payload bytes into
    * (n_bytes, mean_byte, max_byte). Swap for a real codec off-line.
    */
  private object FakeDecoder {
    def decode(payload: Array[Byte]): (Long, Double, Int) = {
      var sum = 0L; var max = 0; var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        sum += b; if (b > max) max = b; i += 1
      }
      val mean = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length
      (payload.length.toLong, mean, max)
    }
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_kind", StringType),
    StructField("n_bytes", LongType),
    StructField("mean_byte", DoubleType),
    StructField("max_byte", IntegerType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "mm01_media_ingest",
      (s, d) =>
        // Ingest: attach a binary payload + typed metadata struct.
        // (Payload here is the utf-8 text bytes — a stand-in for real
        // media blobs; the schema/partitioning is what is exercised.)
        table(s, d, "documents")
          .withColumn("media", encode(col("text"), "utf-8"))
          .withColumn("media_kind",
            when(pmod(col("doc_id"), lit(3)) === 0, "image")
              .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
              .otherwise("video"))
          .select(
            col("doc_id"), col("media_kind"),
            length(col("media")).as("media_len"),
            col("source").as("meta_source"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       CASE doc_id % 3 WHEN 0 THEN 'image'
             |                       WHEN 1 THEN 'audio'
             |                       ELSE 'video' END AS media_kind,
             |       octet_length(encode(text)) AS media_len,
             |       source AS meta_source
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "mm02_feature_extract",
      (s, d) => {
        // Batch feature extraction: mapPartitions so the (stubbed)
        // decoder initializes once per partition; rows stream through.
        val rows = table(s, d, "documents")
          .withColumn("media", encode(col("text"), "utf-8"))
          .select("doc_id", "media")
        val out = rows.mapPartitions { it =>
          // per-partition decoder init would go here (codec handle etc.)
          it.map { r =>
            val id = r.getLong(0)
            val payload = r.getAs[Array[Byte]](1)
            val (n, mean, max) = FakeDecoder.decode(payload)
            val kind = (id % 3) match {
              case 0 => "image"; case 1 => "audio"; case _ => "video"
            }
            Row(id, kind, n, mean, max)
          }
        }(org.apache.spark.sql.Encoders.row(featureSchema))
        out.withColumn("mean_byte", round(col("mean_byte"), 4)).orderBy("doc_id")
      },
      // the stand-in decoder computes plain byte statistics, which ARE
      // DuckDB-expressible (hex-decode the payload, fold the bytes) —
      // so the whole mapPartitions extraction pipeline grades against
      // a real oracle instead of a rows-only check
      Some("""WITH h AS (
             |  SELECT doc_id, hex(encode(text)) AS hx,
             |         octet_length(encode(text)) AS n
             |  FROM documents
             |), b AS (
             |  SELECT doc_id, n,
             |    list_transform(range(0, CAST(n AS INT)),
             |      i -> (strpos('0123456789ABCDEF', substr(hx, i*2+1, 1)) - 1) * 16
             |         + (strpos('0123456789ABCDEF', substr(hx, i*2+2, 1)) - 1)) AS bytes
             |  FROM h
             |)
             |SELECT doc_id,
             |       CASE doc_id % 3 WHEN 0 THEN 'image'
             |                       WHEN 1 THEN 'audio'
             |                       ELSE 'video' END AS media_kind,
             |       CAST(n AS BIGINT) AS n_bytes,
             |       round(CASE WHEN n = 0 THEN 0.0
             |                  ELSE list_aggregate(bytes, 'sum') / CAST(n AS DOUBLE)
             |             END, 4) AS mean_byte,
             |       CAST(CASE WHEN n = 0 THEN 0
             |                 ELSE list_aggregate(bytes, 'max') END AS INT) AS max_byte
             |FROM b ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "mm03_frame_sample",
      (s, d) => {
        // frame sampling: treat the payload as a fake "video" of
        // fixed-size frames and emit every k-th frame's feature row —
        // one input row explodes into per-frame rows with typed
        // metadata, the exact shape a real decoder feeds downstream.
        // Deterministic stand-in (frame = 64-byte slice, stride 4).
        val frameBytes = 64
        val stride = 4
        val rows = table(s, d, "documents")
          .withColumn("media", encode(col("text"), "utf-8"))
          .select("doc_id", "media")
        val out = rows.mapPartitions { it =>
          it.flatMap { r =>
            val id = r.getLong(0)
            val payload = r.getAs[Array[Byte]](1)
            val nFrames = payload.length / frameBytes
            (0 until nFrames by stride).map { f =>
              val slice = java.util.Arrays.copyOfRange(
                payload, f * frameBytes, (f + 1) * frameBytes)
              var sum = 0L
              slice.foreach { b => sum += (b & 0xff) }
              // HALF_UP to 4dp — the same decimal rounding DuckDB's
              // round() applies, so the oracle compares exactly
              // (sum/64 is dyadic: the double is exact on both sides)
              val mean = new java.math.BigDecimal(sum)
                .divide(new java.math.BigDecimal(slice.length))
                .setScale(4, java.math.RoundingMode.HALF_UP)
                .doubleValue()
              Row(id, f, slice.length.toLong, mean)
            }
          }
        }(org.apache.spark.sql.Encoders.row(StructType(Seq(
          StructField("doc_id", LongType),
          StructField("frame_idx", IntegerType),
          StructField("frame_bytes", LongType),
          StructField("mean_byte", DoubleType)))))
        out.orderBy("doc_id", "frame_idx")
      },
      // the fixed-size frame slicing is closed-form over the payload
      // bytes — hex-decode per frame in DuckDB and fold, so the whole
      // explode-to-frames pipeline grades against a value oracle
      Some("""WITH h AS (
             |  SELECT doc_id, hex(encode(text)) AS hx,
             |         octet_length(encode(text)) AS n
             |  FROM documents
             |), f AS (
             |  SELECT doc_id, hx, CAST(fi AS INT) AS frame_idx
             |  FROM h, UNNEST(range(0, CAST(n // 64 AS BIGINT), 4)) AS t(fi)
             |)
             |SELECT doc_id, frame_idx, CAST(64 AS BIGINT) AS frame_bytes,
             |  round(list_aggregate(list_transform(range(0, 64),
             |    i -> (strpos('0123456789ABCDEF',
             |            substr(hx, (frame_idx*64 + CAST(i AS INT))*2 + 1, 1)) - 1) * 16
             |       + (strpos('0123456789ABCDEF',
             |            substr(hx, (frame_idx*64 + CAST(i AS INT))*2 + 2, 1)) - 1)),
             |    'sum') / 64.0, 4) AS mean_byte
             |FROM f ORDER BY doc_id, frame_idx""".stripMargin)),

    QueryDef(
      "mm04_frame_inventory",
      (s, d) => {
        // Graded audit of mm03's frame plumbing: per-document sampled
        // frame count and last sampled index must match closed-form
        // arithmetic the oracle computes from the payload length
        // (64-byte frames, stride 4; the synthetic corpus is pure
        // ASCII, so DuckDB's length(text) IS the byte length). Any
        // off-by-one in the slicing/striding — the classic decoder
        // integration bug — fails the compare per document.
        import org.apache.spark.sql.functions.{count, max}
        defs.find(_.name == "mm03_frame_sample").get.fn(s, d)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_sampled"),
            max(col("frame_idx")).as("last_idx"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |       (length(text) // 64 + 3) // 4 AS n_sampled,
             |       CAST(((length(text) // 64 - 1) // 4) * 4 AS INT) AS last_idx
             |FROM documents WHERE length(text) >= 64
             |ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "mm05_media_dedup",
      (s, d) =>
        // Content-hash dedup over the BINARY payload — the multimodal
        // first pass (byte-identical images/audio recur constantly in
        // web corpora, and hashing bytes needs no decoder). One
        // map-side-combined hash aggregate keyed on the 128-bit
        // digest; at 100 TB the shuffle carries (hash, count) pairs,
        // not payloads. The graded output is the dedup SUMMARY
        // (distinct payloads, dup groups, rows a drop pass would
        // remove); dd14 is where per-group keeper selection lives.
        table(s, d, "documents")
          .withColumn("media", encode(col("text"), "utf-8"))
          .groupBy(md5(col("media")).as("content_hash"))
          .agg(count(lit(1)).as("n_copies"))
          .agg(count(lit(1)).as("distinct_payloads"),
            sum("n_copies").as("total_payloads"),
            sum(when(col("n_copies") > 1, 1L).otherwise(0L))
              .as("n_dup_groups"),
            sum(when(col("n_copies") > 1, col("n_copies") - 1)
              .otherwise(0L)).as("n_dropped")),
      // utf-8 text bytes stand in for the payload, so DuckDB's md5 of
      // the string hashes the same byte sequence
      Some("""SELECT count(*) AS distinct_payloads,
             |       CAST(sum(n) AS BIGINT) AS total_payloads,
             |       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_dup_groups,
             |       CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
             |         AS n_dropped
             |FROM (SELECT md5(text) AS h, count(*) AS n
             |      FROM documents GROUP BY 1)""".stripMargin)),

    QueryDef(
      "mm06_media_batch_pack",
      (s, d) => {
        // Modality-aware batch assembly: media items pack greedily
        // (doc_id order, PER MODALITY — batches never mix codecs, the
        // loader constraint) into training batches of ≤ 8 KB payload
        // — batch = floor(exclusive-cumsum(bytes) / budget), sp02's
        // integer-exact recipe applied to the binary column's sizes.
        // One shuffle on media_kind (3 partitions of metadata-sized
        // (id, len) rows — the payloads themselves never move: batch
        // assignment is a pure function of the scan-local length).
        val items = table(s, d, "documents")
          .withColumn("media_len",
            length(encode(col("text"), "utf-8")).cast("long"))
          .withColumn("media_kind",
            when(pmod(col("doc_id"), lit(3)) === 0, "image")
              .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
              .otherwise("video"))
        val w = Window.partitionBy("media_kind").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        items
          .withColumn("batch_id",
            floor((sum(col("media_len")).over(w) - col("media_len")) /
              lit(8192)))
          .groupBy("media_kind", "batch_id")
          .agg(count(lit(1)).as("n_items"),
            sum("media_len").as("batch_bytes"))
          .orderBy("media_kind", "batch_id")
      },
      Some("""SELECT media_kind, batch_id, count(*) AS n_items,
             |       CAST(sum(media_len) AS BIGINT) AS batch_bytes
             |FROM (
             |  SELECT media_kind, doc_id, media_len,
             |         CAST(floor((sum(media_len) OVER (
             |                PARTITION BY media_kind ORDER BY doc_id
             |                ROWS UNBOUNDED PRECEDING) - media_len)
             |              / 8192) AS BIGINT) AS batch_id
             |  FROM (
             |    SELECT doc_id,
             |           CASE doc_id % 3 WHEN 0 THEN 'image'
             |                           WHEN 1 THEN 'audio'
             |                           ELSE 'video' END AS media_kind,
             |           octet_length(encode(text)) AS media_len
             |    FROM documents))
             |GROUP BY media_kind, batch_id
             |ORDER BY media_kind, batch_id""".stripMargin)),

    QueryDef(
      "mm07_scene_detect",
      (s, d) => {
        // Scene-change detection over mm03's frame stream: a boundary
        // where consecutive frame features jump (|Δmean| > 3.0) — the
        // shot-segmentation step video curation runs before per-scene
        // dedup/captioning. Plan shape: one window pass per document
        // (lag + running boundary sum = scene ids), then two hash
        // aggregations — frames of different videos never meet, so
        // the shuffle keys on doc_id and scales with corpus width.
        // Frame means are dyadic rationals (sum/64): the Δ compare is
        // exact on both engines, no float-boundary flake.
        import org.apache.spark.sql.expressions.Window
        val frames = defs.find(_.name == "mm03_frame_sample").get.fn(s, d)
          .select("doc_id", "frame_idx", "mean_byte")
        val w = Window.partitionBy("doc_id").orderBy("frame_idx")
        val scenes = frames
          .withColumn("prev", lag("mean_byte", 1).over(w))
          .withColumn("new_scene",
            when(col("prev").isNull ||
              abs(col("mean_byte") - col("prev")) > 3.0, 1L).otherwise(0L))
          .withColumn("scene_id", sum("new_scene")
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        scenes.groupBy("doc_id", "scene_id")
          .agg(count(lit(1)).as("scene_frames"))
          .groupBy("doc_id")
          .agg(sum("scene_frames").as("n_frames"),
            max("scene_id").as("n_scenes"),
            max("scene_frames").as("longest_scene"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (
             |  SELECT doc_id, hex(encode(text)) AS hx,
             |         octet_length(encode(text)) AS n
             |  FROM documents
             |), f AS (
             |  SELECT doc_id, hx, CAST(fi AS INT) AS frame_idx
             |  FROM h, UNNEST(range(0, CAST(n // 64 AS BIGINT), 4)) AS t(fi)
             |), m AS (
             |  SELECT doc_id, frame_idx,
             |    round(list_aggregate(list_transform(range(0, 64),
             |      i -> (strpos('0123456789ABCDEF',
             |              substr(hx, (frame_idx*64 + CAST(i AS INT))*2 + 1, 1)) - 1) * 16
             |         + (strpos('0123456789ABCDEF',
             |              substr(hx, (frame_idx*64 + CAST(i AS INT))*2 + 2, 1)) - 1)),
             |      'sum') / 64.0, 4) AS mean_byte
             |  FROM f
             |), sc AS (
             |  SELECT doc_id, frame_idx,
             |         CASE WHEN lag(mean_byte) OVER w IS NULL
             |               OR abs(mean_byte - lag(mean_byte) OVER w) > 3.0
             |              THEN 1 ELSE 0 END AS new_scene
             |  FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
             |), sid AS (
             |  SELECT doc_id,
             |         sum(new_scene) OVER (PARTITION BY doc_id ORDER BY frame_idx
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene_id
             |  FROM sc
             |), per AS (
             |  SELECT doc_id, scene_id, count(*) AS scene_frames
             |  FROM sid GROUP BY doc_id, scene_id)
             |SELECT doc_id, CAST(sum(scene_frames) AS BIGINT) AS n_frames,
             |       CAST(max(scene_id) AS BIGINT) AS n_scenes,
             |       max(scene_frames) AS longest_scene
             |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  )
}
