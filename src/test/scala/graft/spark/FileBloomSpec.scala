package graft.spark

import java.nio.file.Files

import graft.format.FileBloom
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** File-level bloom sidecars (`graft.file-bloom.columns`): point
  * lookups on a key the layout is NOT sorted by must prune whole files
  * that min/max stats cannot discriminate. Bloom bit patterns are
  * deterministic (fixed seeds), so these asserts are exact, not flaky.
  */
class FileBloomSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-fbwh").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.fb", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.fb.warehouse", warehouse)
    .getOrCreate()

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("fb").asInstanceOf[GraftCatalog]

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.count()
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputRDD.getNumPartitions.toLong
    }.sum
  }

  test("serialize/deserialize round-trips multi-column filters") {
    val a = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (1L to 50L).foreach(a.putLong)
    val b = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq("x", "y").foreach(b.putString)
    val back = FileBloom.deserialize(FileBloom.serialize(Map("k" -> a, "s" -> b)))
    assert(back.keySet == Set("k", "s"))
    assert(back("k").mightContainLong(7L) && !back("k").mightContainLong(9999L))
    assert(back("s").mightContainString("x") && !back("s").mightContainString("zz"))
  }

  test("point lookup on an unsorted key prunes files min/max cannot") {
    spark.sql("CREATE NAMESPACE fb.ns1")
    spark.sql("""CREATE TABLE fb.ns1.pts (k BIGINT, tag STRING)
                 TBLPROPERTIES (
                   'graft.file-bloom.columns' = 'k,tag',
                   'graft.file-bloom.ndv' = '1000',
                   'graft.file-bloom.fpp' = '0.0001')""")
    // 4 appends with INTERLEAVED, sparse (even-only) keys: every
    // file's [min, max] spans nearly the whole domain, so zone maps
    // keep all four for any in-range probe — only the bloom separates
    (0 until 4).foreach { i =>
      spark.sql(s"""INSERT INTO fb.ns1.pts
                    SELECT id * 8 + ${i * 2}, concat('t', id * 8 + ${i * 2})
                    FROM range(0, 100, 1, 1)""")
    }
    assert(spark.table("fb.ns1.pts").count() == 400)
    // sidecars written next to each data file
    val dataDir = graft.objects.FileLocations.tableDataDir("ns1", "pts")
    val sidecars = cat.storage.listDeep(dataDir).filter(_.endsWith(".bloom"))
    assert(sidecars.size == 4, s"expected 4 sidecars, got $sidecars")

    // k = 18 lives only in the i=1 file (18 = 8*2 + 2? no: 18 % 8 = 2
    // → i=1 writes keys ≡ 2 (mod 8)); exactly one file survives
    val one = spark.sql("SELECT * FROM fb.ns1.pts WHERE k = 18")
    assert(one.count() == 1)
    assert(scannedFiles(one) == 1, "bloom should isolate the one file")

    // IN across two residue classes → exactly two files
    val two = spark.sql("SELECT * FROM fb.ns1.pts WHERE k IN (18, 20)")
    assert(two.count() == 2)
    assert(scannedFiles(two) == 2)

    // an IN-RANGE but ABSENT key (odd) — min/max keeps all 4 files,
    // the blooms drop every one: zero files opened
    val none = spark.sql("SELECT * FROM fb.ns1.pts WHERE k = 19")
    assert(none.count() == 0)
    assert(scannedFiles(none) == 0, "absent in-range key should open no files")

    // string column blooms prune the same way
    val s1 = spark.sql("SELECT * FROM fb.ns1.pts WHERE tag = 't18'")
    assert(s1.count() == 1)
    assert(scannedFiles(s1) == 1)
    val s0 = spark.sql("SELECT * FROM fb.ns1.pts WHERE tag = 't19'")
    assert(s0.count() == 0)
    assert(scannedFiles(s0) == 0)
  }

  test("partitioned tables: sidecars land beside the MOVED final files") {
    // the partitioned commit path stages then MOVES files into shared
    // hive dirs — blooms must build after the move so sidecar keys
    // match the committed entry paths
    spark.sql("""CREATE TABLE fb.ns1.ptd (k BIGINT, region STRING)
                 PARTITIONED BY (region)
                 TBLPROPERTIES ('graft.file-bloom.columns' = 'k',
                                'graft.file-bloom.fpp' = '0.0001')""")
    spark.sql("""INSERT INTO fb.ns1.ptd
                 SELECT id, CASE WHEN id % 2 = 0 THEN 'east' ELSE 'west' END
                 FROM range(0, 200, 1, 1)""")
    val dataDir = graft.objects.FileLocations.tableDataDir("ns1", "ptd")
    val sidecars = cat.storage.listDeep(dataDir).filter(_.endsWith(".bloom"))
    assert(sidecars.size == 2, s"one sidecar per partition file: $sidecars")
    assert(sidecars.forall(sc =>
      cat.storage.exists(sc.stripSuffix(".bloom"))),
      "sidecar keys must match final (moved) data file keys")
    // bloom + partition pruning compose: absent key in one partition
    val none = spark.sql(
      "SELECT * FROM fb.ns1.ptd WHERE region = 'east' AND k = 3")
    assert(none.count() == 0)
    assert(scannedFiles(none) == 0)
    val one = spark.sql(
      "SELECT * FROM fb.ns1.ptd WHERE region = 'east' AND k = 4")
    assert(one.count() == 1)
    assert(scannedFiles(one) == 1)
  }

  test("streaming epochs write sidecars too; point scans prune across epochs") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("""CREATE TABLE fb.ns1.stream (k BIGINT, v STRING)
                 TBLPROPERTIES ('graft.file-bloom.columns' = 'k',
                                'graft.file-bloom.fpp' = '0.0001')""")
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-fb-ck").toString)
      .toTable("fb.ns1.stream")
    // interleaved residue classes per epoch — min/max can't separate
    in.addData((0L until 50L).map(i => (i * 4, "a")): _*)
    q.processAllAvailable()
    in.addData((0L until 50L).map(i => (i * 4 + 1, "b")): _*)
    q.processAllAvailable()
    q.stop()
    val dataDir = graft.objects.FileLocations.tableDataDir("ns1", "stream")
    assert(cat.storage.listDeep(dataDir).count(_.endsWith(".bloom")) == 2,
      "each micro-batch commit writes its file's sidecar")
    val one = spark.sql("SELECT * FROM fb.ns1.stream WHERE k = 5")
    assert(one.count() == 1)
    assert(scannedFiles(one) == 1, "bloom should isolate the epoch's file")
    val none = spark.sql("SELECT * FROM fb.ns1.stream WHERE k = 6")
    assert(none.count() == 0)
    assert(scannedFiles(none) == 0)
  }

  test("compaction rebuilds sidecars; orphan cleanup removes stale ones only") {
    spark.sql("""CREATE TABLE fb.ns1.cmp (k BIGINT)
                 TBLPROPERTIES ('graft.file-bloom.columns' = 'k',
                                'graft.file-bloom.fpp' = '0.0001')""")
    (0 until 3).foreach { i =>
      spark.sql(s"INSERT INTO fb.ns1.cmp SELECT id * 4 + $i FROM range(0, 50, 1, 1)")
    }
    val dataDir = graft.objects.FileLocations.tableDataDir("ns1", "cmp")
    val before = cat.storage.listDeep(dataDir).filter(_.endsWith(".bloom"))
    assert(before.size == 3)
    spark.sql("CALL fb.system.compact_table(namespace => 'ns1', table => 'cmp')")
    // compacted file carries its own sidecar and still bloom-prunes
    val none = spark.sql("SELECT * FROM fb.ns1.cmp WHERE k = 3")
    assert(none.count() == 0)
    assert(scannedFiles(none) == 0, "compacted file should bloom-prune")
    // expire old snapshots, then orphan-clean: the three pre-compaction
    // files AND their sidecars go; the live file's sidecar stays
    import org.apache.spark.sql.connector.catalog.Identifier
    val ident = Identifier.of(Array("ns1"), "cmp")
    graft.maintain.Maintenance.expireSnapshots(cat, ident, keepLast = 1)
    val removed = graft.maintain.Maintenance.removeOrphanFiles(cat, ident)
    assert(removed.count(_.endsWith(".bloom")) == 3,
      s"stale sidecars should be removed with their files: $removed")
    val after = cat.storage.listDeep(dataDir).filter(_.endsWith(".bloom"))
    assert(after.size == 1, s"live sidecar must survive: $after")
    assert(spark.table("fb.ns1.cmp").count() == 150)
  }
}
