package graft.maintain

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Delete-object minor compaction: `rewrite_position_deletes` folds
  * the many small position-delete objects an update-heavy merge-on-read
  * table accretes into a few sorted ones — dropping dead-file
  * references, never touching data files, never changing logical
  * content.
  */
class RewritePosDeletesSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-rwpd").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions",
      classOf[graft.spark.GraftSparkExtensions].getName)
    .config("spark.sql.catalog.rw", classOf[graft.spark.GraftCatalog].getName)
    .config("spark.sql.catalog.rw.warehouse", warehouse)
    .getOrCreate()

  private def files(): Set[String] =
    spark.sql("SELECT path FROM rw.ns.`t$files`")
      .collect().map(_.getString(0)).toSet

  private def pendingDeletes(): Seq[(String, String, Long)] =
    spark.sql("SELECT kind, detail, n_rows FROM rw.ns.`t$deletes`")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

  private def contents(): Set[(Long, Double)] =
    spark.sql("SELECT k, amt FROM rw.ns.t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

  test("rewrite coalesces pending delete objects without data movement") {
    spark.sql("CREATE NAMESPACE rw.ns")
    spark.sql("""CREATE TABLE rw.ns.t (k BIGINT, amt DOUBLE)
      TBLPROPERTIES ('graft.update.mode' = 'merge-on-read')""")
    spark.sql(
      "INSERT INTO rw.ns.t SELECT id, CAST(id AS DOUBLE) FROM range(0, 1000, 1, 4)")
    // four updates → four (or more) small delete objects
    (0 until 4).foreach { i =>
      spark.sql(s"UPDATE rw.ns.t SET amt = -1.0 * k WHERE k % 10 = $i")
    }
    val before = pendingDeletes()
    assert(before.size >= 4 && before.forall(_._1 == "position"))
    val rowsBefore = before.map(_._3).sum
    assert(rowsBefore == 400)
    val dataBefore = files()
    val want = contents()

    val r = spark.sql(
      "CALL rw.system.rewrite_position_deletes(namespace => 'ns', `table` => 't')")
      .collect().head
    assert(r.getInt(0) == before.size && r.getInt(1) == 1, s"got $r")
    assert(r.getLong(2) == rowsBefore)

    val after = pendingDeletes()
    assert(after.size == 1 && after.head._1 == "position")
    // every named position referenced a LIVE file (the four updates
    // stacked on the original files; replacement rows were never
    // re-deleted) so no rows drop here
    assert(after.head._3 == rowsBefore)
    assert(files() == dataBefore, "rewrite must not touch data files")
    assert(contents() == want, "logical content must be unchanged")
  }

  test("rewrite drops positions naming files gone from the inventory") {
    // one more delta, then a copy-on-write DELETE rewrites the top
    // original file ([750,1000) of the 4-partition range): ReplaceFiles
    // prunes that file from every pending object's REFS, but the
    // objects' parquet rows still name it — the rewrite is what drops
    // those rows
    spark.sql("UPDATE rw.ns.t SET amt = 0.0 WHERE k % 10 = 4")
    spark.sql("DELETE FROM rw.ns.t WHERE k >= 900")
    val before = pendingDeletes()
    // the coalesced object from the previous test + the new update's
    // object(s) (one per delta-write task)
    assert(before.size >= 2)
    // object rowCounts are commit-time metadata: 400 + 100
    assert(before.map(_._3).sum == 500)
    val r = spark.sql(
      "CALL rw.system.rewrite_position_deletes('ns', 't')")
      .collect().head
    assert(r.getInt(0) == before.size && r.getInt(1) == 1, s"got $r")
    assert(r.getLong(2) == 500)
    // dead rows named the rewritten [750,1000) file: 100 from the four
    // k%10<=3 updates + 25 from k%10=4 → 375 live positions remain
    assert(r.getLong(3) == 375, s"got $r")
    assert(pendingDeletes().map(_._3).sum == 375)
    assert(contents().size == 900)
    assert(spark.sql("SELECT sum(amt) FROM rw.ns.t WHERE k % 10 = 4")
      .head.getDouble(0) == 0.0)
    assert(spark.sql("SELECT count(*) FROM rw.ns.t WHERE amt = -1.0 * k AND k % 10 < 4")
      .head.getLong(0) == 360, "delta-updated rows below 900 survive")
  }

  test("CDC across a rewrite emits no changes") {
    val beforeSnap = spark.sql("SELECT max(snapshot_id) FROM rw.ns.`t$snapshots`")
      .head.getLong(0)
    spark.sql("CALL rw.system.rewrite_position_deletes('ns', 't', 1)")
    val cat = spark.sessionState.catalogManager.catalog("rw")
      .asInstanceOf[graft.spark.GraftCatalog]
    val changes = graft.spark.TableChanges.between(spark, cat,
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("ns"), "t"),
      startSnapshotId = beforeSnap)
    assert(changes.count() == 0,
      "a pure delete-object rewrite is logically a no-op")
  }

  test("time travel before the rewrite still reads the old objects") {
    // the rewrite replaced the pending list, but prior snapshots pin
    // the ORIGINAL objects — orphan cleanup must keep them and the old
    // snapshot must still serve correct data through them
    val removed = spark.sql(
      "CALL rw.system.remove_orphan_files(namespace => 'ns', `table` => 't')")
      .collect().map(_.getString(0))
    val firstUpdate = spark.sql(
      """SELECT min(snapshot_id) FROM rw.ns.`t$snapshots`
         WHERE operation = 'update'""").head.getLong(0)
    spark.sql("CALL rw.system.create_tag('ns', 't', 'pre_rewrite', " +
      s"$firstUpdate)")
    val n = spark.sql(
      "SELECT count(*) FROM rw.ns.t VERSION AS OF 'pre_rewrite'")
      .head.getLong(0)
    assert(n == 1000, s"time travel through pre-rewrite deltas (removed: " +
      s"${removed.filter(_.contains("/deletes/")).mkString(", ")})")
  }
}
