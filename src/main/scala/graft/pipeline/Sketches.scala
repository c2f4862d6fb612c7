package graft.pipeline

import graft.QueryDef
import graft.QueryDef.table
import org.apache.spark.sql.functions._

/** Sketch-based profiling over `events`: the constant-memory,
  * MERGEABLE aggregates a 100 TB corpus is profiled with. Exact
  * distinct counts and exact percentiles need a shuffle of every
  * distinct value (or a full sort); the HLL++ and quantile-digest
  * sketches below keep fixed-size state per partition and merge — one
  * map-side pass over the corpus, KBs over the wire, which is why
  * production table stats, dataset cards, and ingest monitors use
  * them. Each query computes BOTH the exact answer (the graded
  * values) and the sketch, and grades the sketch's error in-line —
  * the same shape as the ANN recall gates (ss03/ss05).
  */
object Sketches {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sk01_hll_distinct",
      (s, d) => {
        // HyperLogLog++ distinct users per event type, graded against
        // the exact count: the sketch must land within 5% (its rsd is
        // configured at 2%). At scale the exact side is the expensive
        // one (distinct shuffle); the sketch side is what survives —
        // and Spark's HLL state merges across partitions, so the
        // aggregation is one map-side pass.
        table(s, d, "events")
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_exact"),
            approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
          .select(col("event_type"), col("n_exact"),
            (abs(col("n_approx") - col("n_exact")).cast("double") /
              col("n_exact") <= 0.05).as("within_tol"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_exact,
             |       true AS within_tol
             |FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin)),

    QueryDef(
      "sk02_quantile_sketch",
      (s, d) => {
        // Quantile digest per event type: approx_percentile (a
        // mergeable KLL-style digest) graded against the exact
        // interpolated percentile — within 2% relative (or 0.5
        // absolute for near-zero quantiles). The exact values are the
        // graded output; at 100 TB only the digest is computable
        // without a per-group sort.
        def ok(p: Double) = {
          val exact = expr(s"percentile(value, $p)")
          val approx = expr(s"approx_percentile(value, $p, 10000)")
          abs(approx - exact) <= greatest(abs(exact) * 0.02, lit(0.5))
        }
        table(s, d, "events")
          .groupBy("event_type")
          .agg(
            round(expr("percentile(value, 0.5)"), 4).as("p50"),
            round(expr("percentile(value, 0.95)"), 4).as("p95"),
            ok(0.5).as("p50_ok"),
            ok(0.95).as("p95_ok"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |       round(quantile_cont(value, 0.5), 4) AS p50,
             |       round(quantile_cont(value, 0.95), 4) AS p95,
             |       true AS p50_ok, true AS p95_ok
             |FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin)),

    QueryDef(
      "sk03_cms_heavy_hitters",
      (s, d) => {
        // Count-Min-Sketch heavy hitters (Cormode & Muthukrishnan
        // 2005) over the corpus bigram stream: the streaming-friendly
        // complement of ta12's exact top-20. The sketch is a fixed
        // d×w counter grid (here 80 KB at eps=1e-3, conf=0.99) built
        // in ONE map-side-combined pass — `count_min_sketch` is a
        // mergeable Spark aggregate, so 100 TB of text reduces to KBs
        // over the wire with no per-key shuffle at all; the exact side
        // (the graded values, shared with ta12) is what gets
        // impossible first at scale. Graded in-line like sk01/sk02:
        // `lower_ok` is CMS's DETERMINISTIC never-underestimate
        // guarantee; `upper_ok` is the eps·N overestimate bound
        // (probabilistic per row, deterministic here under the fixed
        // seed). The probe side is a driver-held 80 KB blob applied to
        // exactly 20 rows — metadata-sized by construction.
        val eps = 0.001
        val bigrams = table(s, d, "documents")
          .select(split(trim(col("text")), "\\s+").as("ws"))
          .select(explode(
            graft.pipeline.TextAnalysis.wordGrams("ws", 2, hashed = false))
            .as("bigram"))
        val row = bigrams.agg(
          count_min_sketch(col("bigram"), lit(eps), lit(0.99), lit(42))
            .as("cms"),
          count(lit(1)).as("n_total")).head()
        val bytes = row.getAs[Array[Byte]](0)
        val bound = math.ceil(eps * row.getLong(1)).toLong
        val estimate = udf { bg: String =>
          org.apache.spark.util.sketch.CountMinSketch
            .readFrom(new java.io.ByteArrayInputStream(bytes))
            .estimateCount(bg)
        }
        bigrams.groupBy("bigram")
          .agg(count(lit(1)).as("n_exact"))
          .orderBy(col("n_exact").desc, col("bigram"))
          .limit(20)
          .withColumn("est", estimate(col("bigram")))
          .select(col("bigram"), col("n_exact"),
            (col("est") >= col("n_exact")).as("lower_ok"),
            (col("est") <= col("n_exact") + lit(bound)).as("upper_ok"))
      },
      Some("""WITH w AS (
             |  SELECT string_split_regex(trim(text), '\s+') AS ws
             |  FROM documents),
             |bg AS (
             |  SELECT array_to_string(ws[u.i:u.i+1], ' ') AS bigram
             |  FROM w, unnest(range(1, greatest(len(ws) - 1, 0) + 1)) u(i))
             |SELECT bigram, count(*) AS n_exact,
             |       true AS lower_ok, true AS upper_ok
             |FROM bg GROUP BY bigram
             |ORDER BY n_exact DESC, bigram LIMIT 20""".stripMargin)),

    QueryDef(
      "sk04_theta_setops",
      (s, d) => {
        // Theta sketches: the mergeable distinct sketch that supports
        // SET OPERATIONS — HLL unions but cannot intersect, so
        // "how many (user, day) active pairs do event types A and B
        // share?" needs either a full distinct self-join (what the
        // exact side below does, and what 100 TB cannot afford per
        // pair) or theta intersection over per-type sketches built in
        // ONE pass. Shape: each partition builds local UpdateSketches
        // (constant memory), compact bytes reduce by type (KBs over
        // the wire), and the K(K-1)/2 pair intersections/unions happen
        // on metadata-sized driver state. Graded like sk01-sk03: exact
        // values are the output, sketch error is gated in-line (below
        // 4 096 distincts a theta sketch is exact, so the gate is
        // deterministic at test SF; at scale it holds to its rse).
        import org.apache.datasketches.memory.Memory
        import org.apache.datasketches.theta.{SetOperation, Sketch, UpdateSketch}
        val ev0 = table(s, d, "events")
        val ev = ev0
          .withColumn("ts_us", QueryDef.tsUs(ev0, "ts"))
          .select(col("event_type"),
            (col("user_id") * 100000L + expr("ts_us div 86400000000"))
              .as("ud"))
        val du = ev.distinct()
        val sizes = du.groupBy("event_type").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val common = du.as("a").join(du.as("b"),
            col("a.ud") === col("b.ud") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
          .agg(count(lit(1)).as("n_common")).collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        val skBytes = ev.rdd.mapPartitions { it =>
          val m = scala.collection.mutable.Map.empty[String, UpdateSketch]
          it.foreach { r =>
            m.getOrElseUpdate(r.getString(0), UpdateSketch.builder().build())
              .update(r.getLong(1))
          }
          m.iterator.map { case (t, sk) => (t, sk.compact().toByteArray) }
        }.reduceByKey { (x, y) =>
          val u = SetOperation.builder().buildUnion()
          u.union(Memory.wrap(x)); u.union(Memory.wrap(y))
          u.getResult.toByteArray
        }.collectAsMap()
        val sk = skBytes.map { case (t, b) => t -> Sketch.wrap(Memory.wrap(b)) }
        val types = sizes.keys.toSeq.sorted
        val rows = for {
          i <- types.indices
          j <- (i + 1) until types.length
        } yield {
          val (ta, tb) = (types(i), types(j))
          val nc = common.getOrElse((ta, tb), 0L)
          val nu = sizes(ta) + sizes(tb) - nc
          val interEst = SetOperation.builder().buildIntersection()
            .intersect(sk(ta), sk(tb)).getEstimate
          val un = SetOperation.builder().buildUnion()
          un.union(sk(ta)); un.union(sk(tb))
          val unionEst = un.getResult.getEstimate
          (ta, tb, sizes(ta), sizes(tb), nc, nu,
            math.abs(interEst - nc) <= math.max(0.05 * nc, 1.0),
            math.abs(unionEst - nu) <= math.max(0.05 * nu, 1.0))
        }
        import s.implicits._
        rows.toDF("ta", "tb", "n_a", "n_b", "n_common", "n_union",
          "inter_ok", "union_ok").orderBy("ta", "tb")
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT event_type,
             |         user_id * 100000 + epoch_us(ts) // 86400000000 AS ud
             |  FROM events),
             |sizes AS (SELECT event_type, count(*) AS n FROM du GROUP BY 1),
             |pairs AS (
             |  SELECT sa.event_type AS ta, sb.event_type AS tb,
             |         sa.n AS n_a, sb.n AS n_b
             |  FROM sizes sa JOIN sizes sb ON sa.event_type < sb.event_type),
             |common AS (
             |  SELECT a.event_type AS ta, b.event_type AS tb,
             |         count(*) AS n_common
             |  FROM du a JOIN du b
             |    ON a.ud = b.ud AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT p.ta, p.tb, p.n_a, p.n_b,
             |       coalesce(c.n_common, 0) AS n_common,
             |       p.n_a + p.n_b - coalesce(c.n_common, 0) AS n_union,
             |       true AS inter_ok, true AS union_ok
             |FROM pairs p LEFT JOIN common c ON p.ta = c.ta AND p.tb = c.tb
             |ORDER BY p.ta, p.tb""".stripMargin))
  )
}
