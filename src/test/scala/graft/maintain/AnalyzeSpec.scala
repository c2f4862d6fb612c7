package graft.maintain

import java.nio.file.Files

import graft.format.{Puffin, TableMetadata}
import graft.spark.GraftCatalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier
import org.scalatest.funsuite.AnyFunSuite

/** ANALYZE: theta-sketch column NDVs persisted as a real Iceberg
  * Puffin statistics file, recorded in table metadata, served over the
  * REST payload, replaced on re-analyze, and expired with the snapshot
  * they cover. Sketches are exact below their retention threshold, so
  * every assert here is deterministic.
  */
class AnalyzeSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-anz").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.anz", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.anz.warehouse", warehouse)
    .getOrCreate()

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("anz").asInstanceOf[GraftCatalog]

  private def meta(t: String): TableMetadata = {
    val txn = graft.catalog.Graft.beginTransaction(cat.storage)
    val td = graft.catalog.Graft.describeTable(cat.storage, txn, "ns1", t)
    TableMetadata.read(cat.storage, td.metadataLocation)
  }

  test("ndv per column; puffin file is real; REST metadata serves it") {
    spark.sql("CREATE NAMESPACE anz.ns1")
    spark.sql("CREATE TABLE anz.ns1.t (k BIGINT, seg STRING, v DOUBLE)")
    spark.sql("""INSERT INTO anz.ns1.t
                 SELECT id, concat('s', id % 7), CAST(id % 131 AS DOUBLE)
                 FROM range(0, 1000, 1, 4)""")
    val rows = spark.sql(
      "CALL anz.system.analyze_table(namespace => 'ns1', table => 't')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("k" -> 1000L, "seg" -> 7L, "v" -> 131L))

    val st = meta("t").stats.get
    assert(st.blobs.map(_.ndv).sorted == Seq(7L, 131L, 1000L))
    // the file is REAL puffin: magic + footer parse, blobs are
    // standard theta compact sketches with the recorded estimates
    val pf = Puffin.read(cat.storage.read(st.path))
    assert(pf.blobs.map(_.blobType).distinct ==
      Seq("apache-datasketches-theta-v1"))
    pf.blobs.foreach { b =>
      val sk = org.apache.datasketches.theta.Sketch.wrap(
        org.apache.datasketches.memory.Memory.wrap(pf.blobData(b)))
      assert(math.round(sk.getEstimate).toString == b.properties("ndv"))
    }
    assert(pf.blobs.forall(_.fields.nonEmpty), "field ids recorded")

    // NATIVE consumption: the next scan reports the NDVs as DSv2
    // column statistics, the numbers Spark's CBO estimates with
    val scan = spark.table("anz.ns1.t").queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }.head
    val colStats = scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics().columnStats()
    import scala.jdk.CollectionConverters._
    val ndvByName = colStats.asScala.map { case (ref, cs) =>
      ref.fieldNames().mkString(".") -> cs.distinctCount().getAsLong
    }.toMap
    assert(ndvByName == Map("k" -> 1000L, "seg" -> 7L, "v" -> 131L))

    // served Iceberg metadata carries the spec's `statistics` entry
    val txn = graft.catalog.Graft.beginTransaction(cat.storage)
    val td = graft.catalog.Graft.describeTable(cat.storage, txn, "ns1", "t")
    val node = graft.serve.IcebergRest.tableMetadataJson(td, meta("t"),
      "loc", "dataLoc", Map(meta("t").currentSnapshotId -> "ml.avro"),
      Some("abs.puffin"))
    val stats = node.get("statistics")
    assert(stats != null && stats.size() == 1)
    assert(stats.get(0).get("statistics-path").asText() == "abs.puffin")
    assert(stats.get(0).get("blob-metadata").size() == 3)
  }

  test("re-analyze replaces; merge-on-read deletes respected; expiry drops") {
    spark.sql("""CREATE TABLE anz.ns1.t2 (k BIGINT, v STRING)
                 TBLPROPERTIES ('graft.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO anz.ns1.t2 SELECT id, 'x' FROM range(0, 100, 1, 2)")
    spark.sql("CALL anz.system.analyze_table(namespace => 'ns1', table => 't2')")
    val first = meta("t2").stats.get
    assert(first.blobs.find(_.fields.nonEmpty).isDefined)

    // MoR delete half the keys: NDV must describe the LOGICAL table
    spark.sql("DELETE FROM anz.ns1.t2 WHERE k >= 50")
    val after = spark.sql(
      """CALL anz.system.analyze_table(namespace => 'ns1', table => 't2',
         columns => 'k')""").collect()
    assert(after.length == 1 && after(0).getLong(1) == 50L)
    val second = meta("t2").stats.get
    assert(second.snapshotId != first.snapshotId)

    // appending moves the head; expiring history drops the stats ref
    // (its covered snapshot is gone) and deletes the puffin object
    spark.sql("INSERT INTO anz.ns1.t2 VALUES (999, 'y')")
    Maintenance.expireSnapshots(cat, Identifier.of(Array("ns1"), "t2"),
      keepLast = 1)
    assert(meta("t2").stats.isEmpty, "stale stats ref must not survive")
    assert(!cat.storage.exists(second.path), "puffin object deleted")
  }
}
