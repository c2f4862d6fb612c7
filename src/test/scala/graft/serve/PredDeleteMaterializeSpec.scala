package graft.serve

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.format.TableMetadata
import graft.spark.GraftCatalog

/** Predicate-delete materialization at volume: the deleted positions
  * are written by EXECUTORS into a storage-side scratch prefix and
  * moved into place — the driver never iterates positions or holds
  * the finished object, so a large predicate delete is bounded by
  * storage, not driver heap (and the path works when executors do not
  * share the driver's local filesystem: everything stages under the
  * warehouse).
  */
class PredDeleteMaterializeSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-pdm").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.pdm", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.pdm.warehouse", warehouse)
    .getOrCreate()

  test("a 200k-position predicate delete materializes through storage " +
      "with exact row count and a cleaned scratch prefix") {
    spark.sql("CREATE NAMESPACE pdm.ns1")
    spark.sql("""CREATE TABLE pdm.ns1.t (k BIGINT, v DOUBLE)
                 TBLPROPERTIES ('graft.delete.mode' = 'merge-on-read')""")
    spark.sql("""INSERT INTO pdm.ns1.t
                 SELECT id, CAST(id AS DOUBLE) FROM range(0, 400000, 1, 4)""")
    spark.sql("DELETE FROM pdm.ns1.t WHERE k < 200000")
    assert(spark.table("pdm.ns1.t").count() == 200000L)

    val cat = spark.sessionState.catalogManager.catalog("pdm")
      .asInstanceOf[GraftCatalog]
    val storage = cat.storage
    val txn = graft.catalog.Graft.beginTransaction(storage)
    val meta = try {
      val td = graft.catalog.Graft.describeTable(storage, txn, "ns1", "t")
      TableMetadata.read(storage, td.metadataLocation)
    } finally txn.close()
    val snap = meta.currentSnapshot.get
    assert(snap.deletes.nonEmpty, "expected pending predicate deletes")
    val files = graft.format.Manifests.filesOf(storage, snap)

    val dest = "serve/pdm-test/pred.parquet"
    IcebergDeleteObjects.materializePredicateDeletes(
      spark, storage, files, snap.deletes, dest)
    assert(storage.exists(dest))
    assert(IcebergDeleteObjects.parquetRowCount(storage, dest) == 200000L,
      "every deleted position must be in the materialized object")
    // scratch prefix cleaned: only the destination remains
    val leftovers = storage.listDeep("serve/pdm-test/")
      .filterNot(_ == dest)
    assert(leftovers.isEmpty, s"scratch not cleaned: $leftovers")

    // the no-op shape still writes a valid empty object
    val destEmpty = "serve/pdm-test2/empty.parquet"
    IcebergDeleteObjects.materializePredicateDeletes(
      spark, storage, Seq.empty, Seq.empty, destEmpty)
    assert(storage.exists(destEmpty))
    assert(IcebergDeleteObjects.parquetRowCount(storage, destEmpty) == 0L)
  }
}
