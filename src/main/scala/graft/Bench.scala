package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query against SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout. Queries are timed over a full action
  * (noop write) after the plan is built — wall time includes scan +
  * shuffle.
  *
  * Isolation: queries run grouped by family (c*, dd*, q*, ss*, st*,
  * ta*, ...) with a FRESH SparkSession per family, warmed up before
  * the first timed query. A single shared session accumulates state
  * across 50+ queries (streaming memory-sink tables, state-store
  * maintenance threads, listener/codegen caches) that inflated
  * round-1 per-query times up to 30x by the tail of the run; session
  * boundaries make per-query times order-independent signals.
  */
object Bench {

  private def family(name: String): String = name.takeWhile(!_.isDigit)

  private def freshSession(cpus: String): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = Verify.sessionBuilder(cpus)
      // bound driver-side bookkeeping growth within a family
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    // warm the JVM/codegen/parquet/shuffle paths so the first
    // measured query isn't charged session initialization: a scan, a
    // shuffle join, an aggregate, and a sort cover the executor code
    // paths most queries hit
    spark.range(1000).selectExpr("sum(id)").collect()
    val r = spark.read.parquet(s"$sfDir/region.parquet")
    val n = spark.read.parquet(s"$sfDir/nation.parquet")
    n.join(r, n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("c"))
      .orderBy("r_name")
      .write.format("noop").mode("overwrite").save()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // optional args = family prefixes (e.g. `q st`) to bench a subset
    // in local iteration; no args (the driver's invocation) runs all
    val asc = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => args.isEmpty || args.contains(family(q._1)))
    // audit knob: SPARK_GRAFT_ORDER=reverse runs families and queries
    // backwards — per-query times should be order-independent (<2x)
    val ordered =
      if (sys.env.get("SPARK_GRAFT_ORDER").contains("reverse")) asc.reverse else asc
    // group by family, preserving order of first appearance
    val families = ordered.map(q => family(q._1)).distinct
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val status = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (fam <- families) {
      val spark = freshSession(cpus)
      try {
        warmup(spark, sfDir)
        val famQueries = ordered.filter(q => family(q._1) == fam)
        // the family's first query additionally warms family-specific
        // class loading (Arrow/Jackson for c*, streaming for st*, ...)
        // with one untimed run, so position in the family stops
        // mattering for the timed numbers
        try famQueries.head._2(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        spark.streams.active.foreach(_.stop())
        for ((name, fn) <- famQueries) {
          // adaptive min-of-N: the first runs anywhere in a family pay
          // one-time JIT/codegen for that query's shapes — keep
          // re-running (up to 4) while the time is still improving by
          // >1.4x, then report the best; per-query times become
          // independent of run order
          var best = Double.MaxValue
          var prev = Double.MaxValue
          var runs = 0
          var done = false
          while (!done && status.getOrElse(name, "ok") == "ok") {
            val t0 = System.nanoTime()
            // noop sink: materializes every output row (count() would
            // let Catalyst prune columns and drop sorts, flattering
            // the numbers)
            try {
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              status(name) = "ok"
            } catch {
              case e: Throwable =>
                System.err.println(s"[bench] $name failed: ${e.getMessage}")
                status(name) = "failed"
            }
            val took = (System.nanoTime() - t0) / 1e9
            // a query that started streams must not bill its successors
            spark.streams.active.foreach(_.stop())
            runs += 1
            best = math.min(best, took)
            done = runs >= 4 || (runs >= 2 && !(took < prev / 1.4))
            prev = took
          }
          times(name) = best
        }
      } finally {
        spark.stop()
        System.gc()
      }
    }
    val qs = times.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val st = status.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = times.values.sum
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"status":$st,"sf":"$sfDir"}"""
    println(full)
    // With 218 queries the line above is ~10 KB, and a consumer that
    // keeps only a short tail of stdout loses its head (metric/value/
    // queries). Persist the identical JSON to a file and ALSO print a
    // compact machine-parseable total line LAST so it lands inside any
    // tail window. Additions only: the long line stays as-is.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), full + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_out.json write failed: $e")
    }
    val nFailed = status.values.count(_ == "failed")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${times.size},"failed":$nFailed,"queries_file":"bench_out.json","sf":"$sfDir"}""")
    if (nFailed > 0) sys.exit(1)
  }
}
