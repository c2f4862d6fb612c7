package graft

import graft.QueryDef.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for q68's iteration shape (test sources
  * only — not part of the shipped library).
  */
object Q68Probe {
  def phases(s: SparkSession, d: String): Unit = {
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
    }
    val e0 = table(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(table(s, d, "lineitem").select("l_orderkey", "l_suppkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 10 + 1).as("c"),
        (col("l_suppkey") * 10 + 2).as("s"))
      .distinct()
      .localCheckpoint()
    lap("e0_cp")
    val edges = e0.select(col("c").as("src"), col("s").as("dst"))
      .union(e0.select(col("s").as("src"), col("c").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("src", "node").localCheckpoint()
    lap("deg_cp")
    val n = deg.count().toDouble
    lap("n_count")
    val degB = deg.withColumnRenamed("node", "dnode")
    var rank = deg
      .select(col("node"), round(lit(1.0) / n, 10).as("rank"))
    var lastCp: DataFrame = null
    (1 to 5).foreach { i =>
      val cb = rank
        .join(broadcast(degB), rank("node") === degB("dnode"))
        .select(col("node"),
          round(col("rank") / col("deg"), 10)
            .cast("decimal(18,10)").as("cb"))
      val next = edges
        .join(broadcast(cb), edges("src") === cb("node"))
        .groupBy("dst")
        .agg(round(lit(0.15 / n) +
          lit(0.85) * sum("cb").cast("double"), 10).as("rank"))
        .withColumnRenamed("dst", "node")
      rank = if (i % 2 == 0 || i == 5) {
        val cp = next.localCheckpoint()
        if (lastCp != null) lastCp.unpersist()
        lastCp = cp
        lap(s"iter$i cp")
        cp
      } else next
    }
    val out = rank.select(col("node"),
        when(pmod(col("node"), lit(10)) === 1, "customer")
          .otherwise("supplier").as("kind"),
        round(col("rank"), 8).as("rank"))
      .orderBy(col("rank").desc, col("node")).limit(20).count()
    lap(s"final n=$out")
    e0.unpersist()
    deg.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Verify.sessionBuilder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    (1 to runs).foreach { i =>
      println(s"PROBE phases run$i")
      phases(spark, sf)
    }
    spark.stop()
  }
}
