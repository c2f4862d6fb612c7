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
    val spark = graft.Verify.sessionBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Act(name: String, ms: Double, plan: String)
    val acts = new ConcurrentLinkedQueue[Act]()
    @volatile var record = false
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = if (record) {
        val head = qe.executedPlan.toString.linesIterator
          .take(4).mkString(" | ").take(220)
        acts.add(Act(funcName, durationNs / 1e6, head))
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)

    for (name <- args) {
      val fn = SparkEntry.queries(name)
      // warm pass (also warms JIT the way the bench's min-of-N does)
      try fn(spark, sf).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"warm $name failed: $e") }
      spark.streams.active.foreach(_.stop())
      acts.clear()
      record = true
      val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      val totalMs = (System.nanoTime() - t0) / 1e6
      record = false
      spark.streams.active.foreach(_.stop())
      // drain the async listener bus before reading
      Thread.sleep(500)
      println(s"\n======== $name  total=${totalMs.round} ms ========")
      import scala.jdk.CollectionConverters._
      val all = acts.asScala.toSeq
      println(s"actions=${all.size}  sumActionMs=${all.map(_.ms).sum.round}")
      all.sortBy(-_.ms).take(30).foreach { a =>
        println(f"${a.ms}%8.1f ms  ${a.name}%-12s ${a.plan}")
      }
    }
    spark.stop()
  }
}
