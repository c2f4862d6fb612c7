package graft

/** Ad-hoc wall-time probe for individual registered queries (test
  * sources only — not part of the shipped library).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Verify.sessionBuilder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    args.foreach { q =>
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, sf).count()
        println(f"TIMEQ $q run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
