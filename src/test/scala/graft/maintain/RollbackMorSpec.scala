package graft.maintain

import java.nio.file.Files

import graft.spark.{GraftCatalog, GraftSparkExtensions, TableChanges}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Rollback across pending merge-on-read state: a rollback restores a
  * historic snapshot's ENTIRE state — file inventory AND the pending
  * delete predicates / position deltas / equality deletes — so rows a
  * restored delete had logically removed stay removed (nothing is
  * resurrected), an un-delete rollback makes rows live again, and the
  * CDC derivation over a rollback range diffs the endpoints LOGICALLY
  * instead of trusting the file diff.
  */
class RollbackMorSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-rbm").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.rbm", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.rbm.warehouse", warehouse)
    .getOrCreate()

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("rbm").asInstanceOf[GraftCatalog]

  private def meta(table: String): graft.format.TableMetadata = {
    val txn = graft.catalog.Graft.beginTransaction(cat.storage)
    try {
      val td = graft.catalog.Graft.describeTable(cat.storage, txn, "ns", table)
      graft.format.TableMetadata.read(cat.storage, td.metadataLocation)
    } finally txn.close()
  }

  private def snapshotIds(table: String): Seq[Long] =
    spark.sql(s"SELECT snapshot_id FROM rbm.ns.`$table$$snapshots` " +
      "ORDER BY snapshot_id").collect().map(_.getLong(0)).toSeq

  test("rollback past a compaction keeps mor-predicate deletes applied") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rbm.ns")
    spark.sql("""CREATE TABLE rbm.ns.pd (k BIGINT, v STRING)
                 TBLPROPERTIES ('graft.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO rbm.ns.pd SELECT id, concat('v', id) FROM range(20)")
    spark.sql("DELETE FROM rbm.ns.pd WHERE k >= 15") // pending predicate
    val pendingSnap = meta("pd").currentSnapshotId
    assert(meta("pd").currentSnapshot.get.deletes.nonEmpty,
      "precondition: the DELETE is a pending predicate, not a rewrite")
    // compaction materializes the deletes and clears the pending list
    Maintenance.compactDataFiles(spark, cat,
      Identifier.of(Array("ns"), "pd"), targetFiles = 1)
    assert(meta("pd").currentSnapshot.get.deletes.isEmpty)
    assert(spark.table("rbm.ns.pd").count() == 15)
    // rollback to the PRE-compaction snapshot: its pending delete must
    // come back with it — the deleted rows stay deleted
    Maintenance.rollbackToSnapshot(cat,
      Identifier.of(Array("ns"), "pd"), pendingSnap)
    assert(meta("pd").currentSnapshot.get.deletes.nonEmpty,
      "restored snapshot carries its pending delete predicates")
    assert(spark.table("rbm.ns.pd").count() == 15,
      "logically-deleted rows must not resurrect after rollback")
    assert(spark.table("rbm.ns.pd").agg(org.apache.spark.sql.functions
      .max("k")).collect()(0).getLong(0) == 14L)
  }

  test("rollback past a compaction keeps position deltas applied") {
    spark.sql("""CREATE TABLE rbm.ns.pp (k BIGINT, v DOUBLE)
                 TBLPROPERTIES ('graft.update.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO rbm.ns.pp SELECT id, CAST(id AS DOUBLE) FROM range(10)")
    spark.sql("UPDATE rbm.ns.pp SET v = -1.0 WHERE k % 3 = 0") // pos delta
    val pendingSnap = meta("pp").currentSnapshotId
    assert(meta("pp").currentSnapshot.get.posDeletes.nonEmpty,
      "precondition: the UPDATE is a pending position delta")
    Maintenance.compactDataFiles(spark, cat,
      Identifier.of(Array("ns"), "pp"), targetFiles = 1)
    assert(meta("pp").currentSnapshot.get.posDeletes.isEmpty)
    Maintenance.rollbackToSnapshot(cat,
      Identifier.of(Array("ns"), "pp"), pendingSnap)
    val rows = spark.table("rbm.ns.pp").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 10, "no duplicated old/new row pairs")
    assert(rows.filter(_._1 % 3 == 0).forall(_._2 == -1.0),
      "restored position deltas keep the updated values visible")
    assert(rows.filter(_._1 % 3 != 0).forall(t => t._2 == t._1.toDouble))
  }

  test("rollback past a compaction keeps equality deletes applied") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("""CREATE TABLE rbm.ns.eq (k BIGINT, v STRING)
                 TBLPROPERTIES ('graft.write.upsert-keys' = 'k')""")
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("k", "v").writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-rbm-ck").toString)
      .toTable("rbm.ns.eq")
    in.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
    in.addData((1L, "a2")); q.processAllAvailable()
    q.stop()
    val pendingSnap = meta("eq").currentSnapshotId
    assert(meta("eq").currentSnapshot.get.eqDeletes.nonEmpty,
      "precondition: the upsert left a pending equality delete")
    Maintenance.compactDataFiles(spark, cat,
      Identifier.of(Array("ns"), "eq"), targetFiles = 1)
    assert(meta("eq").currentSnapshot.get.eqDeletes.isEmpty)
    Maintenance.rollbackToSnapshot(cat,
      Identifier.of(Array("ns"), "eq"), pendingSnap)
    val rows = spark.table("rbm.ns.eq").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((1L, "a2"), (2L, "b")),
      "the shadowed (1,'a') row must not resurrect after rollback")
  }

  test("rollback of a rollback re-restores pending state") {
    spark.sql("""CREATE TABLE rbm.ns.rr (k BIGINT)
                 TBLPROPERTIES ('graft.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO rbm.ns.rr SELECT id FROM range(10)")
    val clean = meta("rr").currentSnapshotId
    spark.sql("DELETE FROM rbm.ns.rr WHERE k >= 5")
    val withDelete = meta("rr").currentSnapshotId
    val ident = Identifier.of(Array("ns"), "rr")
    // un-delete: back to the snapshot BEFORE the pending delete
    Maintenance.rollbackToSnapshot(cat, ident, clean)
    assert(spark.table("rbm.ns.rr").count() == 10,
      "un-delete rollback makes the rows live again")
    // …and back again: the pending delete returns with its snapshot
    Maintenance.rollbackToSnapshot(cat, ident, withDelete)
    assert(spark.table("rbm.ns.rr").count() == 5)
    assert(meta("rr").currentSnapshot.get.deletes.nonEmpty)
  }

  test("rollback is O(1) metadata: target manifest segments reused verbatim") {
    spark.sql("""CREATE TABLE rbm.ns.big (k BIGINT)
                 TBLPROPERTIES ('graft.manifest.inline-max' = '2')""")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO rbm.ns.big VALUES ($i), (${i + 100})"))
    val target = meta("big").currentSnapshot.get
    assert(target.manifests.nonEmpty,
      "precondition: the table has spilled manifest segments")
    spark.sql("INSERT OVERWRITE rbm.ns.big VALUES (999)")
    Maintenance.rollbackToSnapshot(cat,
      Identifier.of(Array("ns"), "big"), target.id)
    val restored = meta("big").currentSnapshot.get
    assert(restored.manifests == target.manifests,
      "rollback reuses the target's segment keys — no inventory rewrite")
    assert(restored.files == target.files)
    assert(spark.table("rbm.ns.big").count() == 8)
  }

  test("expiring the rollback's source keeps the shared segments alive") {
    // RestoreSnapshot shares the target's manifest segments verbatim;
    // expiration ref-counts shared keys, so dropping the TARGET from
    // history must not delete segments the rollback snapshot reads
    spark.sql("""CREATE TABLE rbm.ns.shx (k BIGINT)
                 TBLPROPERTIES ('graft.manifest.inline-max' = '2')""")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO rbm.ns.shx VALUES ($i), (${i + 100})"))
    val target = meta("shx").currentSnapshot.get
    assert(target.manifests.nonEmpty)
    spark.sql("INSERT OVERWRITE rbm.ns.shx VALUES (999)")
    val ident = Identifier.of(Array("ns"), "shx")
    Maintenance.rollbackToSnapshot(cat, ident, target.id)
    // keepLast = 1 expires everything but the rollback snapshot —
    // including the target whose segments it shares
    Maintenance.expireSnapshots(cat, ident, keepLast = 1)
    Maintenance.removeOrphanFiles(cat, ident)
    assert(meta("shx").currentSnapshot.get.manifests == target.manifests,
      "the rollback snapshot still references the shared segments")
    assert(spark.table("rbm.ns.shx").count() == 8,
      "shared segments survive expiring the snapshot that created them")
  }

  test("CDC across a rollback range diffs the endpoints logically") {
    spark.sql("""CREATE TABLE rbm.ns.cdc (k BIGINT)
                 TBLPROPERTIES ('graft.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO rbm.ns.cdc SELECT id FROM range(10)")
    val clean = meta("cdc").currentSnapshotId
    spark.sql("DELETE FROM rbm.ns.cdc WHERE k >= 6")
    val withDelete = meta("cdc").currentSnapshotId
    val ident = Identifier.of(Array("ns"), "cdc")
    Maintenance.compactDataFiles(spark, cat, ident, targetFiles = 1)
    Maintenance.rollbackToSnapshot(cat, ident, withDelete)
    // state at the range end is identical to the range start (the
    // rollback restored it): the net change feed must be EMPTY — a
    // file-diff derivation would wrongly emit the 4 logically-deleted
    // rows of the restored raw files as inserts
    val roundTrip = TableChanges.between(spark, cat, ident,
      startSnapshotId = withDelete)
    assert(roundTrip.count() == 0,
      s"rollback round-trip nets to no changes: ${roundTrip.collect().toSeq}")
    // un-delete rollback: rows 6..9 become live again — the logical
    // diff emits them as inserts (a file diff would emit nothing)
    Maintenance.rollbackToSnapshot(cat, ident, clean)
    val unDelete = TableChanges.between(spark, cat, ident,
      startSnapshotId = withDelete)
    val changes = unDelete.collect()
      .map(r => (r.getLong(0), r.getString(r.fieldIndex("_change_type"))))
    assert(changes.forall(_._2 == "insert"))
    assert(changes.map(_._1).sorted.toSeq == Seq(6L, 7L, 8L, 9L))
  }

  test("the streaming change feed refuses rollback snapshots loudly") {
    spark.sql("CREATE TABLE rbm.ns.feed (k BIGINT)")
    spark.sql("INSERT INTO rbm.ns.feed VALUES (1)")
    val first = meta("feed").currentSnapshotId
    spark.sql("INSERT INTO rbm.ns.feed VALUES (2)")
    Maintenance.rollbackToSnapshot(cat,
      Identifier.of(Array("ns"), "feed"), first)
    val e = intercept[Exception] {
      spark.table("rbm.ns.`feed$changes`").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("rollback")),
      s"error should name the rollback snapshot: $e")
  }
}
