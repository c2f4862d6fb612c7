package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot-stats file pruning: selective filters must exclude whole
  * files before the parquet scan is even constructed.
  */
class FilePruningSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-pwh").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.pcat", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.pcat.warehouse", warehouse)
    .getOrCreate()

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    val plans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    df.count() // materialize for metrics
    plans.map {
      case s: FileSourceScanExec => s.metrics.get("numFiles").map(_.value).getOrElse(0L)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputRDD.getNumPartitions.toLong
    }.sum
  }

  test("min/max stats exclude files whose range cannot match") {
    spark.sql("CREATE NAMESPACE pcat.ns1")
    spark.sql("CREATE TABLE pcat.ns1.ranged (k BIGINT, v STRING)")
    // 4 appends with DISJOINT key ranges → 4 files with tight stats
    (0 until 4).foreach { i =>
      spark.sql(
        s"INSERT INTO pcat.ns1.ranged SELECT id + ${i * 1000}, 'x' FROM range(0, 100, 1, 1)")
    }
    val all = spark.table("pcat.ns1.ranged")
    assert(all.count() == 400)

    // selective point-range filter → at most 1 of 4 files survives
    val one = spark.sql("SELECT * FROM pcat.ns1.ranged WHERE k >= 2010 AND k < 2050")
    assert(one.count() == 40)
    assert(scannedFiles(one) == 1, "pruning should leave exactly one file")

    // range that no file covers → empty scan, zero partitions
    val none = spark.sql("SELECT * FROM pcat.ns1.ranged WHERE k > 100000")
    assert(none.count() == 0)
    assert(scannedFiles(none) == 0)

    // string equality pruning
    val s = spark.sql("SELECT * FROM pcat.ns1.ranged WHERE v = 'zzz'")
    assert(s.count() == 0)
    assert(scannedFiles(s) == 0)
  }

  test("partitioned table: clustered writes give exact partition pruning") {
    spark.sql(
      "CREATE TABLE pcat.ns1.parted (k BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql("""INSERT INTO pcat.ns1.parted
      SELECT id, CASE WHEN id % 3 = 0 THEN 'asia'
                      WHEN id % 3 = 1 THEN 'emea' ELSE 'amer' END
      FROM range(0, 300, 1, 4)""")
    assert(spark.table("pcat.ns1.parted").count() == 300)
    // identity partitioning reported through the V2 API
    import org.apache.spark.sql.connector.catalog.Identifier
    val cat = spark.sessionState.catalogManager.catalog("pcat")
      .asInstanceOf[GraftCatalog]
    val t = cat.loadTable(Identifier.of(Array("ns1"), "parted"))
    assert(t.partitioning().map(_.toString).sameElements(Array("identity(region)")))
    // a single-partition filter scans only that partition's file(s)
    val one = spark.sql("SELECT * FROM pcat.ns1.parted WHERE region = 'emea'")
    assert(one.count() == 100)
    assert(scannedFiles(one) == 1,
      "partition-clustered write should confine 'emea' to one file")
  }

  test("row counts recorded in snapshot metadata") {
    val files = spark.table("pcat.ns1.`ranged$files`").collect()
    assert(files.length == 4)
    val txn = graft.catalog.Graft.beginTransaction(
      spark.sessionState.catalogManager.catalog("pcat")
        .asInstanceOf[GraftCatalog].storage)
    val cat = spark.sessionState.catalogManager.catalog("pcat")
      .asInstanceOf[GraftCatalog]
    val td = graft.catalog.Graft.describeTable(cat.storage, txn, "ns1", "ranged")
    val meta = graft.format.TableMetadata.read(cat.storage, td.metadataLocation)
    assert(meta.currentFiles(cat.storage).forall(_.rowCount == 100))
    assert(meta.currentFiles(cat.storage).forall(f =>
      f.minValues.contains("k") && f.maxValues.contains("k")))
  }
}
