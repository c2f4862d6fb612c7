package graft.spark

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hive-style partition layout: writes land in col=value directories
  * (external readers can path-prune graft tables), the scan restores
  * partition columns via basePath discovery, and file pruning covers
  * partition predicates through the path-derived stats.
  */
class PartitionedTableSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-part").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.pc", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.pc.warehouse", warehouse)
    .getOrCreate()

  test("partitioned table: layout, full readback, pruning, delete, compaction") {
    spark.sql("CREATE NAMESPACE pc.ns1")
    spark.sql(
      "CREATE TABLE pc.ns1.sales (k BIGINT, region STRING, amount DOUBLE) PARTITIONED BY (region)")
    // Hive convention: partition columns move to the END of the
    // schema, so positional INSERT binds (k, amount, region)
    assert(spark.table("pc.ns1.sales").schema.fieldNames.toSeq ==
      Seq("k", "amount", "region"))
    spark.sql("""INSERT INTO pc.ns1.sales VALUES
      (1, 10.0, 'eu'), (2, 20.0, 'eu'), (3, 30.0, 'us'), (4, 40.0, 'apac')""")

    // Hive-style directories on disk — the external-interop contract
    val dataDir = Paths.get(warehouse, "data", "ns1", "sales")
    val partDirs = java.nio.file.Files.walk(dataDir).iterator()
    val dirNames = scala.jdk.javaapi.CollectionConverters.asScala(partDirs)
      .filter(java.nio.file.Files.isDirectory(_))
      .map(_.getFileName.toString).toSet
    assert(dirNames.contains("region=eu") && dirNames.contains("region=us"),
      s"expected region=... dirs, got $dirNames")

    // partition columns come back on read (basePath discovery)
    val rows = spark.table("pc.ns1.sales").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("region"),
        r.getAs[Double]("amount"))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "eu", 10.0), (2L, "eu", 20.0),
      (3L, "us", 30.0), (4L, "apac", 40.0)))

    // a partition predicate prunes files BEFORE the parquet scan:
    // only the region=eu file survives the snapshot-stats filter
    val cat = spark.sessionState.catalogManager.catalog("pc")
      .asInstanceOf[GraftCatalog]
    import org.apache.spark.sql.connector.catalog.Identifier
    val meta = {
      val t = cat.loadTable(Identifier.of(Array("ns1"), "sales"))
        .asInstanceOf[GraftTable]
      t.meta
    }
    val euFiles = meta.currentFiles(cat.storage).filter(f =>
      f.minValues.get("region").contains("eu"))
    assert(euFiles.nonEmpty)
    assert(meta.currentFiles(cat.storage).forall(f => f.minValues.contains("region")))
    assert(spark.sql(
      "SELECT sum(amount) FROM pc.ns1.sales WHERE region = 'eu'")
      .collect().head.getDouble(0) == 30.0)

    // copy-on-write DELETE preserves the partitioned layout
    spark.sql("DELETE FROM pc.ns1.sales WHERE k = 2")
    assert(spark.table("pc.ns1.sales").count() == 3)
    assert(spark.sql("SELECT k FROM pc.ns1.sales WHERE region = 'eu'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))

    // compaction keeps partition columns and content
    spark.sql("INSERT INTO pc.ns1.sales VALUES (5, 50.0, 'eu')")
    val res = graft.maintain.Maintenance.compactDataFiles(
      spark, cat, Identifier.of(Array("ns1"), "sales"))
    assert(res.filesAfter <= res.filesBefore)
    val after = spark.table("pc.ns1.sales").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("region"))).sortBy(_._1)
    assert(after.toSeq == Seq((1L, "eu"), (3L, "us"), (4L, "apac"), (5L, "eu")))
  }

  test("partitioned table works on the object-store backend") {
    val osWarehouse = Files.createTempDirectory("graft-part-os").toString
    spark.conf.set("spark.sql.catalog.po", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.po.warehouse", osWarehouse)
    spark.conf.set("spark.sql.catalog.po.storage", "object")
    spark.sql("CREATE NAMESPACE po.ns1")
    spark.sql(
      "CREATE TABLE po.ns1.ev (k BIGINT, kind STRING) PARTITIONED BY (kind)")
    spark.sql("INSERT INTO po.ns1.ev VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    assert(spark.sql("SELECT k FROM po.ns1.ev WHERE kind = 'a'")
      .collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 3L)))
    spark.sql("DELETE FROM po.ns1.ev WHERE k = 1")
    assert(spark.table("po.ns1.ev").count() == 2)
  }

  test("$partitions metadata table summarizes per-partition state") {
    val rows = spark.table("pc.ns1.`sales$partitions`").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    // after the earlier delete/insert/compaction: eu{1,5}, us{3}, apac{4}
    assert(rows.map(_._1).toSeq == Seq("region=apac", "region=eu", "region=us"))
    assert(rows.map(_._3).sum == 4) // total rows across partitions
  }

  test("partition values with special characters round-trip") {
    spark.sql(
      "CREATE TABLE pc.ns1.esc (k BIGINT, tag STRING) PARTITIONED BY (tag)")
    spark.sql("INSERT INTO pc.ns1.esc VALUES (1, 'a b'), (2, 'x:y')")
    val rows = spark.table("pc.ns1.esc").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "a b"), (2L, "x:y")))
    assert(spark.sql("SELECT k FROM pc.ns1.esc WHERE tag = 'a b'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
