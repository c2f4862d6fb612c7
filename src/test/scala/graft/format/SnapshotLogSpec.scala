package graft.format

import java.nio.file.Files

import graft.spark.GraftCatalog
import graft.storage.LocalStorageOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot-log segmentation: the metadata document keeps a bounded
  * inline snapshot window and spills history into immutable snaplog
  * segments — without it every commit rewrites an O(history) document
  * (the round-5 deferred scale flaw). Covers the spill policy, id
  * lookup through segment bounds, the segment-merge bound, history
  * listing, expiration cutting into the log, and orphan collection of
  * stray segments.
  */
class SnapshotLogSpec extends AnyFunSuite {

  private def entry(i: Int) =
    DataFileEntry(s"data/ns/t/files/f$i.parquet", 1L, 10L)

  private def commitN(storage: LocalStorageOps, n: Int,
      inlineMax: Int): TableMetadata = {
    var m = TableMetadata.empty("{\"type\":\"struct\",\"fields\":[]}")
    (1 to n).foreach { i =>
      m = m.withSnapshotEdit(storage, "data/ns/t/manifests", "append",
        AppendFiles(Seq(entry(i))), snapshotsInlineMax = inlineMax)
    }
    m
  }

  test("the inline window stays bounded and history stays complete") {
    val s = new LocalStorageOps(Files.createTempDirectory("graft-sl").toString)
    val m = commitN(s, 80, inlineMax = 4)
    assert(m.snapshots.size <= 4, s"inline window ${m.snapshots.size} > 4")
    assert(m.snapshotLog.nonEmpty)
    assert(m.totalSnapshots == 80)
    assert(m.currentSnapshotId == 79)
    val all = m.allSnapshots(s)
    assert(all.map(_.id) == (0L to 79L), "history must be ordered + complete")
    // parent chain survives the spill
    assert(all.tail.forall(x => x.parentId == x.id - 1))
  }

  test("findSnapshot opens exactly the segment whose bounds cover the id") {
    val s = new LocalStorageOps(Files.createTempDirectory("graft-sl").toString)
    val m = commitN(s, 40, inlineMax = 4)
    val hit = m.findSnapshot(s, 17L)
    assert(hit.exists(_.id == 17L))
    assert(hit.get.totalFiles == 18, "0-based ids: snapshot i holds i+1 files")
    assert(m.findSnapshot(s, 39L).exists(_.id == 39L), "inline hit")
    assert(m.findSnapshot(s, 99L).isEmpty)
    // ref bounds are tight: every segment's [firstId,lastId] matches
    m.snapshotLog.foreach { r =>
      val seg = SnapshotLog.read(s, r.key)
      assert(seg.head.id == r.firstId && seg.last.id == r.lastId)
      assert(seg.size.toLong == r.count)
    }
  }

  test("snapshotsInRange opens only the segments the range touches") {
    val s = new LocalStorageOps(Files.createTempDirectory("graft-sl").toString)
    val m = commitN(s, 40, inlineMax = 4)
    assert(m.snapshotsInRange(s, 10L, 20L).map(_.id) == (11L to 20L))
    assert(m.snapshotsInRange(s, -1L, 39L).map(_.id) == (0L to 39L))
    assert(m.snapshotsInRange(s, 39L, 39L).isEmpty)
    // the hot case — a range inside the inline window — must read NO
    // spilled segments: prove it by removing them all first
    val inlineLow = m.snapshots.map(_.id).min
    s.deleteBatch(m.snapshotLog.map(_.key))
    assert(m.snapshotsInRange(s, inlineLow, 39L).map(_.id) ==
      ((inlineLow + 1) to 39L))
  }

  test("the segment-count bound merges the log instead of growing forever") {
    val s = new LocalStorageOps(Files.createTempDirectory("graft-sl").toString)
    // inlineMax=2 spills one snapshot per commit past the window, so
    // the ref list would hit SegmentsMax quickly without the merge
    val m = commitN(s, SnapshotLog.SegmentsMax + 10, inlineMax = 2)
    assert(m.snapshotLog.size <= SnapshotLog.SegmentsMax,
      s"log refs must stay bounded, saw ${m.snapshotLog.size}")
    assert(m.totalSnapshots == SnapshotLog.SegmentsMax + 10)
    assert(m.allSnapshots(s).map(_.id) ==
      (0L until (SnapshotLog.SegmentsMax + 10).toLong))
  }

  test("documents without a snapshotLog field read as inline-only") {
    val s = new LocalStorageOps(Files.createTempDirectory("graft-sl").toString)
    val legacyJson =
      """{"schemaJson":"{\"type\":\"struct\",\"fields\":[]}",
        |"currentSnapshotId":1,
        |"snapshots":[{"id":1,"parentId":-1,"timestampMillis":1,
        |"operation":"append",
        |"files":[{"path":"data/x/p.parquet","rowCount":7,"sizeBytes":9}]}]}"""
        .stripMargin.replaceAll("\n", "")
    val m = graft.objects.Json.readString(legacyJson, classOf[TableMetadata])
    assert(m.snapshotLog.isEmpty && m.refs.isEmpty)
    assert(m.totalSnapshots == 1)
    assert(m.allSnapshots(s).map(_.id) == Seq(1L))
  }
}

/** The same behavior end-to-end through SQL commits, `$snapshots`,
  * expiration, and orphan collection.
  */
class SnapshotLogSqlSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-slq").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions",
      classOf[graft.spark.GraftSparkExtensions].getName)
    .config("spark.sql.catalog.sl", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.sl.warehouse", warehouse)
    .getOrCreate()

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("sl").asInstanceOf[GraftCatalog]

  private def meta(table: String): TableMetadata = {
    val txn = graft.catalog.Graft.beginTransaction(cat.storage)
    try {
      val td = graft.catalog.Graft.describeTable(cat.storage, txn, "ns", table)
      TableMetadata.read(cat.storage, td.metadataLocation)
    } finally txn.close()
  }

  test("SQL commits spill history and $snapshots lists all of it") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sl.ns")
    spark.sql("""CREATE TABLE sl.ns.t (k BIGINT)
      TBLPROPERTIES ('graft.snapshot-log.inline-max'='4')""")
    (1 to 10).foreach(i => spark.sql(s"INSERT INTO sl.ns.t VALUES ($i)"))
    val m = meta("t")
    assert(m.snapshots.size <= 4, "metadata document must stay O(window)")
    assert(m.snapshotLog.nonEmpty)
    assert(m.totalSnapshots == 10)
    val hist = spark.sql(
      "SELECT snapshot_id, is_current FROM sl.ns.`t$snapshots` ORDER BY snapshot_id")
      .collect()
    assert(hist.length == 10)
    assert(hist.map(_.getLong(0)).toSeq == (0L to 9L))
    assert(hist.count(_.getBoolean(1)) == 1)
    assert(spark.table("sl.ns.t").count() == 10)
  }

  test("expiration cuts into the log and deletes dead segments") {
    val before = meta("t")
    val deadKeys = before.snapshotLog.map(_.key)
    assert(deadKeys.nonEmpty)
    val expired = graft.maintain.Maintenance.expireSnapshots(
      cat, Identifier.of(Array("ns"), "t"), keepLast = 2)
    assert(expired == 8)
    val after = meta("t")
    assert(after.totalSnapshots == 2)
    assert(after.allSnapshots(cat.storage).map(_.id) == Seq(8L, 9L))
    deadKeys.foreach(k => assert(!cat.storage.exists(k),
      s"dead snaplog segment survived: $k"))
    assert(spark.table("sl.ns.t").count() == 10)
    assert(spark.sql("SELECT count(*) FROM sl.ns.`t$snapshots`")
      .collect()(0).getLong(0) == 2)
  }

  test("stray snaplog segments are collected as orphans, live ones kept") {
    // rebuild some history so a live segment exists again
    (11 to 18).foreach(i => spark.sql(s"INSERT INTO sl.ns.t VALUES ($i)"))
    val live = meta("t").snapshotLog.map(_.key)
    assert(live.nonEmpty)
    val stray = SnapshotLog.write(cat.storage, "data/ns/t/manifests",
      Seq(Snapshot(999L, -1L, 1L, "append", Seq.empty))).key
    val removed = graft.maintain.Maintenance.removeOrphanFiles(
      cat, Identifier.of(Array("ns"), "t"))
    assert(removed.contains(stray))
    assert(!cat.storage.exists(stray))
    live.foreach(k => assert(cat.storage.exists(k),
      s"live snaplog segment deleted: $k"))
    assert(spark.table("sl.ns.t").count() == 18)
  }
}
