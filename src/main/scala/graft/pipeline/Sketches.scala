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
        .stripMargin))
  )
}
