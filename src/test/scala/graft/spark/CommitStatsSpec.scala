package graft.spark

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{InMemoryObjectStoreClient, LocalStorageOps, ObjectStoreOps}

/** Commit-time stats harvesting must scale with commit size AND stay
  * inside the [[graft.storage.StorageOps]] contract: beyond a handful
  * of files the parquet-footer reads fan out as a Spark job (tasks
  * reopen storage from its descriptor, touch the footers, and only
  * ~100 B of stats per file return to the driver); every listing,
  * size, and footer read goes through the storage API so a remote
  * object store (no filesystem view at all) works identically.
  */
class CommitStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4").getOrCreate()

  test("large commit harvests footer stats in a distributed job, same stats") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-stats").toString
    val storage = new LocalStorageOps(root)
    (1 to 4000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(40).write.parquet(s"$root/out")
    val keys = storage.listDeep("out").filter(_.endsWith(".parquet")).sorted
    assert(keys.size == 40)

    // a Spark job with one task per file must run during the harvest
    @volatile var harvestTasks = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        harvestTasks += js.stageInfos.map(_.numTasks).sum
    }
    spark.sparkContext.addSparkListener(listener)
    val harvested =
      try {
        val h = GraftTable.harvestStats(storage, keys)
        // listener delivery is async; poll briefly
        val expected = math.min(keys.size,
          spark.sparkContext.defaultParallelism * 2)
        val deadline = System.nanoTime() + 5_000_000_000L
        while (harvestTasks < expected && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(harvestTasks >= expected,
          s"expected a distributed harvest job (>=$expected tasks), saw $harvestTasks")
        h
      } finally spark.sparkContext.removeSparkListener(listener)

    // stats identical to sequential driver-side reads
    keys.foreach { k =>
      val abs = storage.absolute(k)
      val seq = graft.format.ParquetStats.read(abs)
      val (dist, size, _) = harvested(k)
      assert(dist == seq, s"stats mismatch for $k")
      assert(size == java.nio.file.Files.size(java.nio.file.Paths.get(abs)))
    }
    val total = harvested.values.map(_._1.rowCount).sum
    assert(total == 4000L)
  }

  test("small commits stay on the driver (no job overhead)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-stats-sm").toString
    val storage = new LocalStorageOps(root)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$root/out")
    val keys = storage.listDeep("out").filter(_.endsWith(".parquet"))
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val h = GraftTable.harvestStats(storage, keys)
      Thread.sleep(500) // listener delivery is async
      assert(h(keys.head)._1.rowCount == 2L)
      assert(jobs == 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("commit finalize against a pure object store — no filesystem view exists") {
    // The in-memory store's "absolute" paths are opaque mem:// URIs:
    // ANY direct filesystem access to the keyspace crashes. Passing
    // proves listCommitFiles/harvestStats/fileEntry reduce entirely to
    // the narrow client API (LIST / HEAD / GET), as a real bucket
    // requires.
    import spark.implicits._
    val scratch = Files.createTempDirectory("graft-stats-os").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1)
      .write.parquet(s"$scratch/w")
    val parquetBytes = {
      val f = Files.list(java.nio.file.Paths.get(s"$scratch/w")).iterator()
      val it = scala.jdk.javaapi.CollectionConverters.asScala(f)
      Files.readAllBytes(it.find(_.toString.endsWith(".parquet")).get)
    }
    val client = new InMemoryObjectStoreClient
    val ops = new ObjectStoreOps(client)
    // one plain commit file + one under a Hive partition segment
    client.put("data/ns1/t/files/c1/part-00000.parquet", parquetBytes)
    client.put("data/ns1/t/files/c1/p=7/part-00001.parquet", parquetBytes)
    client.put("data/ns1/t/files/c1/_SUCCESS", Array.emptyByteArray)

    val entries = GraftTable.listCommitFiles(ops, "data/ns1/t/files/c1")
    assert(entries.map(_.path).sorted == Seq(
      "data/ns1/t/files/c1/p=7/part-00001.parquet",
      "data/ns1/t/files/c1/part-00000.parquet"))
    entries.foreach { e =>
      assert(e.rowCount == 3L)
      assert(e.sizeBytes == parquetBytes.length.toLong)
      assert(e.minValues.get("k").contains("1"))
      assert(e.maxValues.get("k").contains("3"))
    }
    val part = entries.find(_.path.contains("p=7")).get
    assert(part.minValues.get("p").contains("7") &&
      part.maxValues.get("p").contains("7"),
      "partition segment must become the column's min and max")
  }
}
