package graft.spark

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Commit-time stats harvesting must scale with commit size: beyond a
  * handful of files the parquet-footer reads fan out as a Spark job
  * (tasks touch the footers, only ~100 B of stats per file return to
  * the driver) instead of a sequential driver loop.
  */
class CommitStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4").getOrCreate()

  test("large commit harvests footer stats in a distributed job, same stats") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stats").toString + "/out"
    (1 to 4000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(40).write.parquet(dir)
    val paths = Files.list(java.nio.file.Paths.get(dir)).iterator()
    val files = scala.jdk.javaapi.CollectionConverters.asScala(paths)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toSeq.sorted
    assert(files.size == 40)

    // a Spark job with one task per file must run during the harvest
    @volatile var harvestTasks = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        harvestTasks += js.stageInfos.map(_.numTasks).sum
    }
    spark.sparkContext.addSparkListener(listener)
    val harvested =
      try {
        val h = GraftTable.harvestStats(files)
        // listener delivery is async; poll briefly
        val expected = math.min(files.size,
          spark.sparkContext.defaultParallelism * 2)
        val deadline = System.nanoTime() + 5_000_000_000L
        while (harvestTasks < expected && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(harvestTasks >= expected,
          s"expected a distributed harvest job (>=$expected tasks), saw $harvestTasks")
        h
      } finally spark.sparkContext.removeSparkListener(listener)

    // stats identical to sequential driver-side reads
    files.foreach { p =>
      val seq = graft.format.ParquetStats.read(p)
      val (dist, size) = harvested(p)
      assert(dist == seq, s"stats mismatch for $p")
      assert(size == java.nio.file.Files.size(java.nio.file.Paths.get(p)))
    }
    val total = harvested.values.map(_._1.rowCount).sum
    assert(total == 4000L)
  }

  test("small commits stay on the driver (no job overhead)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stats-sm").toString + "/out"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1).write.parquet(dir)
    val files = scala.jdk.javaapi.CollectionConverters.asScala(
      Files.list(java.nio.file.Paths.get(dir)).iterator())
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toSeq
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val h = GraftTable.harvestStats(files)
      Thread.sleep(500) // listener delivery is async
      assert(h(files.head)._1.rowCount == 2L)
      assert(jobs == 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
