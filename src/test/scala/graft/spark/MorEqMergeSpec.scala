package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Batch MERGE as equality deletes
  * (`graft.merge.mode = 'merge-on-read-eq'`): matched keys commit into
  * a small key object, replacement/insert rows append, and no existing
  * data file is read back or rewritten by the write — the batch
  * edition of the streaming upsert shape.
  */
class MorEqMergeSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-meq").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.meq", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.meq.warehouse", warehouse)
    .getOrCreate()

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("meq").asInstanceOf[GraftCatalog]

  private def meta(table: String): graft.format.TableMetadata = {
    val txn = graft.catalog.Graft.beginTransaction(cat.storage)
    try {
      val td = graft.catalog.Graft.describeTable(cat.storage, txn, "ns", table)
      graft.format.TableMetadata.read(cat.storage, td.metadataLocation)
    } finally txn.close()
  }

  test("MERGE commits an equality delete, rewrites nothing") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS meq.ns")
    spark.sql("""CREATE TABLE meq.ns.t (k BIGINT NOT NULL, v STRING, ver INT)
                 TBLPROPERTIES ('graft.write.upsert-keys' = 'k',
                                'graft.merge.mode' = 'merge-on-read-eq')""")
    spark.sql("INSERT INTO meq.ns.t VALUES " +
      "(1, 'a', 0), (2, 'b', 0), (3, 'c', 0)")
    val filesBefore = meta("t").currentFiles(cat.storage).map(_.path).toSet
    spark.sql("""MERGE INTO meq.ns.t t
                 USING (SELECT * FROM VALUES (2L, 'b1', 1), (4L, 'd1', 1)
                        AS s(k, v, ver)) s
                 ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val snap = meta("t").currentSnapshot.get
    assert(snap.operation == "merge")
    assert(snap.eqDeletes.nonEmpty, "the merge committed an equality delete")
    assert(snap.eqDeletes.head.cols == Seq("k"))
    assert(snap.eqDeletes.head.rowCount == 1, "one matched key (k=2)")
    val filesAfter = meta("t").currentFiles(cat.storage).map(_.path).toSet
    assert(filesBefore.subsetOf(filesAfter),
      "no pre-merge data file was rewritten or removed")
    val rows = spark.table("meq.ns.t").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.toSeq == Seq((1L, "a", 0), (2L, "b1", 1), (3L, "c", 0),
      (4L, "d1", 1)))
  }

  test("MERGE delete clause removes by key; time travel sees through") {
    graft.maintain.Maintenance.createTag(cat,
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "t"), "pre_delete_merge")
    spark.sql("""MERGE INTO meq.ns.t t
                 USING (SELECT * FROM VALUES (1L), (4L) AS s(k)) s
                 ON t.k = s.k
                 WHEN MATCHED THEN DELETE""")
    val rows = spark.table("meq.ns.t").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((2L, "b1"), (3L, "c")))
    // delete-only merge: a key object, no data files
    val snap = meta("t").currentSnapshot.get
    assert(snap.eqDeletes.size >= 2)
    val pre = spark.sql(
      "SELECT k FROM meq.ns.t VERSION AS OF 'pre_delete_merge' ORDER BY k")
      .collect().map(_.getLong(0))
    assert(pre.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("stacked eq merges compose; compaction materializes them") {
    spark.sql("""MERGE INTO meq.ns.t t
                 USING (SELECT * FROM VALUES (3L, 'c2', 2), (5L, 'e2', 2)
                        AS s(k, v, ver)) s
                 ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val rows = spark.table("meq.ns.t").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((2L, "b1"), (3L, "c2"), (5L, "e2")))
    graft.maintain.Maintenance.compactDataFiles(spark, cat,
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "t"), targetFiles = 1)
    val snap = meta("t").currentSnapshot.get
    assert(snap.eqDeletes.isEmpty, "compaction cleared the key objects")
    assert(snap.totalRows == 3)
    val after = spark.table("meq.ns.t").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(after.toSeq == rows.toSeq)
  }

  test("CDC surfaces an eq merge as delete(old) + insert(new)") {
    spark.sql("""CREATE TABLE meq.ns.cdc (k BIGINT NOT NULL, v STRING)
                 TBLPROPERTIES ('graft.write.upsert-keys' = 'k',
                                'graft.merge.mode' = 'merge-on-read-eq')""")
    spark.sql("INSERT INTO meq.ns.cdc VALUES (1, 'a'), (2, 'b')")
    spark.sql("""MERGE INTO meq.ns.cdc t
                 USING (SELECT * FROM VALUES (2L, 'b9'), (3L, 'c9')
                        AS s(k, v)) s
                 ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val changes = spark.table("meq.ns.`cdc$changes`")
      .select("k", "v", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val inserts = changes.filter(_._3 == "insert").map(t => (t._1, t._2)).sorted
    val deletes = changes.filter(_._3 == "delete").map(t => (t._1, t._2)).sorted
    assert(inserts.toSeq ==
      Seq((1L, "a"), (2L, "b"), (2L, "b9"), (3L, "c9")))
    assert(deletes.toSeq == Seq((2L, "b")),
      "the matched key's old row surfaces as a delete")
  }
}
