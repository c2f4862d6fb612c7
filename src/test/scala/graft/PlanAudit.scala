package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Verify.sessionBuilder("4").getOrCreate()
    args.foreach { q =>
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      val bad = Seq("BroadcastNestedLoopJoin", "CartesianProduct")
        .filter(plan.contains)
      println(s"PLANAUDIT $q: " +
        (if (bad.isEmpty) "clean" else s"HAS ${bad.mkString(",")}"))
    }
    spark.stop()
  }
}
