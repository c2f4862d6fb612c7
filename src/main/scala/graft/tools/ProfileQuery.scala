package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkEntry
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev-only: step-level profile of a query's internal Spark actions.
  *
  * Scenario queries (c*, st*) run dozens of statements — DDL, inserts,
  * refreshes — before the returned frame; the bench only sees the sum.
  * This main registers a QueryExecutionListener, runs the named
  * queries once untimed (JIT/codegen warm) and once timed, and prints
  * every action's duration plus the top of its physical plan, so the
  * expensive STEP inside an 8-second scenario is visible.
  *
  *   sbt "runMain graft.tools.ProfileQuery c73_mv_nary_join"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // diagnostic conf overrides: SPARK_GRAFT_PROFILE_CONF="k=v;k=v"
    val builder = sys.env.get("SPARK_GRAFT_PROFILE_CONF")
      .map(_.split(';').filter(_.contains('=')))
      .getOrElse(Array.empty)
      .foldLeft(graft.Verify.sessionBuilder(cpus)) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Act(name: String, ms: Double, plan: String)
    val acts = new ConcurrentLinkedQueue[Act]()
    @volatile var record = false

    // job-level timeline: description, wall ms, #tasks — shows how many
    // tiny jobs an expensive action fans into (driver/stage overhead)
    final class Job(val id: Int, val t0: Long, val tasks: Int,
        val stages: Int, val call: String) {
      @volatile var t1: Long = 0L
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (record) {
            import scala.jdk.CollectionConverters._
            val nt = e.stageInfos.map(_.numTasks).sum
            // properties itself can be null — an NPE here is swallowed
            // by the listener bus and silently drops the job
            val call = Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short")))
              .getOrElse("")
            jobs.put(e.jobId,
              new Job(e.jobId, e.time, nt, e.stageIds.size, call))
          }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val j = jobs.get(e.jobId); if (j != null) j.t1 = e.time
        }
      })
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = if (record) {
        val head = qe.executedPlan.toString.linesIterator
          .take(4).mkString(" | ").take(220)
        acts.add(Act(funcName, durationNs / 1e6, head))
        // full plan dump for the expensive steps
        if (durationNs > 400e6) {
          val dir = java.nio.file.Paths.get("/tmp/profplans")
          java.nio.file.Files.createDirectories(dir)
          val f = dir.resolve(
            f"${System.nanoTime()}%d-${durationNs / 1e6}%.0fms-$funcName.txt")
          java.nio.file.Files.writeString(f, qe.executedPlan.toString)
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    // in-process stack sampler: every 25 ms, one signature frame per
    // RUNNABLE thread (first spark/graft/parquet frame) — attributes
    // driver-side gap time (planning, commits, stats) to code
    val hot = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicInteger]()
    val sampling = new java.util.concurrent.atomic.AtomicBoolean(false)
    val samplerOn = sys.env.get("SPARK_GRAFT_PROFILE_SAMPLER").contains("1")
    val sampler = new Thread(() => {
      while (true) {
        if (samplerOn && sampling.get()) {
          val all = Thread.getAllStackTraces
          all.forEach { (t, frames) =>
            if (t.getState == Thread.State.RUNNABLE &&
                !t.getName.contains("sampler")) {
              val sig = frames.iterator.map(_.toString).find(f =>
                f.startsWith("org.apache.spark.sql.catalyst") ||
                f.startsWith("org.apache.spark.sql.execution") ||
                f.startsWith("org.apache.spark.sql.classic") ||
                f.startsWith("graft") ||
                f.startsWith("org.apache.parquet") ||
                f.startsWith("org.apache.spark.scheduler") ||
                f.startsWith("org.apache.spark.util"))
                .orElse(frames.headOption.map(_.toString))
              sig.foreach { s0 =>
                val s = s0.replaceAll(":\\d+\\)", ")")
                hot.computeIfAbsent(s,
                  _ => new java.util.concurrent.atomic.AtomicInteger)
                  .incrementAndGet()
              }
            }
          }
        }
        Thread.sleep(25)
      }
    }, "profile-sampler")
    sampler.setDaemon(true)
    sampler.start()

    for (name <- args) {
      val fn = SparkEntry.queries(name)
      // warm pass (also warms JIT the way the bench's min-of-N does)
      try fn(spark, sf).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"warm $name failed: $e") }
      spark.streams.active.foreach(_.stop())
      // min-of-3 like the bench's adaptive min-of-N: damp JIT/GC noise
      var totalMs = Double.MaxValue
      for (r <- 1 to 3) {
        acts.clear()
        jobs.clear()
        hot.clear()
        sampling.set(true)
        record = true
        val t0 = System.nanoTime()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        totalMs = math.min(totalMs, (System.nanoTime() - t0) / 1e6)
        record = false
        sampling.set(false)
        spark.streams.active.foreach(_.stop())
      }
      spark.streams.active.foreach(_.stop())
      // drain the async listener bus before reading
      Thread.sleep(500)
      // acts/jobs/hot are cleared per round, so the printed breakdown
      // is the LAST round's — which may not be the round the min total
      // came from; label it so step attributions aren't misread
      println(s"\n======== $name  total=${totalMs.round} ms (min of 3; " +
        "breakdown below is from the LAST round) ========")
      import scala.jdk.CollectionConverters._
      val all = acts.asScala.toSeq
      println(s"actions=${all.size}  sumActionMs=${all.map(_.ms).sum.round}")
      all.sortBy(-_.ms).take(30).foreach { a =>
        println(f"${a.ms}%8.1f ms  ${a.name}%-12s ${a.plan}")
      }
      // job timeline: wall per job + the GAP since the previous job
      // ended (gap = driver-side work: planning, commits, tree I/O)
      val js = jobs.values.asScala.toSeq.sortBy(_.t0)
      val withGap = js.zip(new Job(-1, js.headOption.map(_.t0)
        .getOrElse(0L), 0, 0, "") +: js.map(identity))
      println(s"jobs=${js.size}  jobWallMs=" +
        js.map(j => (j.t1 - j.t0).max(0)).sum +
        s"  gapMs=${withGap.map { case (j, p) => (j.t0 - (if (p.t1 > 0) p.t1 else j.t0)).max(0) }.sum}")
      withGap.sortBy { case (j, _) => -(j.t1 - j.t0) }.take(20)
        .foreach { case (j, p) =>
          val gap = (j.t0 - (if (p.t1 > 0) p.t1 else j.t0)).max(0)
          println(f"  job ${j.id}%4d ${(j.t1 - j.t0).max(0)}%6d ms  gapBefore=$gap%5d ms tasks=${j.tasks}%4d stages=${j.stages}%2d  ${j.call.take(60)}")
        }
      println("hot frames (25ms samples, RUNNABLE):")
      hot.asScala.toSeq.sortBy(-_._2.get).take(25).foreach { case (f, c) =>
        println(f"  ${c.get}%5d  ${f.take(160)}")
      }
    }
    spark.stop()
  }
}
