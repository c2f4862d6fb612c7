package graft.tools

import graft.SparkEntry

/** Dev-only: dump physical plans of representative queries to audit
  * pushdown / pruning / join strategy / codegen coverage.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.Verify.sessionBuilder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val targets = if (args.nonEmpty) args.toSeq
      else Seq("q03_filter_pushdown", "q02_projection", "q04_tpch_q1_agg",
        "q05_join3_agg", "q21_broadcast_star_join", "c01_catalog_scan_pushdown",
        "dd05_embedding_dup", "ss01_brute_topk")
    targets.foreach { name =>
      println(s"\n======== $name ========")
      val df = SparkEntry.queries(name)(spark, sf)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
