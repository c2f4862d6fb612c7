package graft.spark

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Scan construction must not touch the filesystem per data file: the
  * snapshot's commit-time stats pre-warm Spark's shared
  * FileStatusCache, so the delegated parquet index serves every root
  * path from cache. At 100 TB that's the difference between O(files)
  * object-store HEAD requests per query planning and zero.
  */
class FileIndexSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-fidx").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.fidx", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.fidx.warehouse", warehouse)
    .getOrCreate()

  test("scan builds without listing data files from the filesystem") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS fidx.ns")
    spark.sql("CREATE TABLE fidx.ns.t (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO fidx.ns.t SELECT id, concat('v', id) FROM range(0, 100, 1, 1)")
    val paths = spark.sql("SELECT path FROM fidx.ns.`t$files`")
      .collect().map(_.getString(0))
    assert(paths.length == 1)
    // fresh session: nothing cached yet from the insert-side planning
    org.apache.spark.sql.execution.datasources.FileStatusCache.resetForTesting()
    val t = spark.sessionState.catalogManager.catalog("fidx")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "t")).asInstanceOf[GraftTable]
    val abs = Paths.get(t.dataRootAbs).getParent.getParent.getParent
      .resolve(java.nio.file.Paths.get(paths.head)).normalize()
    val storageAbs = Paths.get(t.storageOps.absolute(paths.head))
    val hidden = Paths.get(storageAbs.toString + ".hidden")
    // with the file GONE, any real listing/stat would fail — a
    // successful build + partition planning proves the index was
    // served entirely from snapshot stats
    Files.move(storageAbs, hidden, StandardCopyOption.ATOMIC_MOVE)
    try {
      val scan = t.newScanBuilder(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap())).build()
      val parts = scan.toBatch.planInputPartitions()
      assert(parts.nonEmpty, "partition planning must come from metadata")
    } finally Files.move(hidden, storageAbs, StandardCopyOption.ATOMIC_MOVE)
    // and with the file back, the planned read returns the rows
    assert(spark.sql("SELECT count(*) FROM fidx.ns.t").head.getLong(0) == 100)
  }
}
