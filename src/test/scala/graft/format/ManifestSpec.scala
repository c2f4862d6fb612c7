package graft.format

import java.nio.file.Files

import graft.spark.GraftCatalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier
import org.scalatest.funsuite.AnyFunSuite

/** Manifest-segment snapshot storage: past the inline threshold a
  * commit writes one DELTA manifest and reuses the parent's segments,
  * a row-level replace rewrites only segments containing replaced
  * paths, and the metadata document stays small however many files
  * and snapshots accumulate — the property that keeps the commit path
  * O(delta), not O(table), at 100 TB.
  *
  * `graft.manifest.inline-max` is pinned low (4) so a handful of
  * single-file INSERTs exercises the manifest path.
  */
class ManifestSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-mf").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions",
      classOf[graft.spark.GraftSparkExtensions].getName)
    .config("spark.sql.catalog.mf", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.mf.warehouse", warehouse)
    .getOrCreate()

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("mf").asInstanceOf[GraftCatalog]

  private def meta(table: String): TableMetadata = {
    val txn = graft.catalog.Graft.beginTransaction(cat.storage)
    try {
      val td = graft.catalog.Graft.describeTable(cat.storage, txn, "ns", table)
      TableMetadata.read(cat.storage, td.metadataLocation)
    } finally txn.close()
  }

  test("appends past the inline threshold reuse the parent's segments") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mf.ns")
    spark.sql("""CREATE TABLE mf.ns.t (k BIGINT, v STRING)
      TBLPROPERTIES ('graft.manifest.inline-max'='4')""")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO mf.ns.t VALUES ($i, 'a$i')"))
    val m4 = meta("t")
    assert(m4.currentSnapshot.get.manifests.isEmpty,
      "4 files fit inline under inline-max=4")
    assert(m4.currentSnapshot.get.files.size == 4)

    spark.sql("INSERT INTO mf.ns.t VALUES (5, 'a5')")
    ManifestSpec.versionAtFive =
      graft.tree.TreeOps.findLatestRoot(cat.storage).get.version
    val m5 = meta("t")
    val s5 = m5.currentSnapshot.get
    assert(s5.manifests.size == 1, "5th file tips into a delta manifest")
    assert(s5.files.size == 4, "inline entries carry over unchanged")
    assert(s5.totalFiles == 5 && s5.totalRows == 5)

    spark.sql("INSERT INTO mf.ns.t VALUES (6, 'a6')")
    val s6 = meta("t").currentSnapshot.get
    assert(s6.manifests.size == 2)
    assert(s6.manifests.head == s5.manifests.head,
      "append must REUSE the parent's segment, not rewrite it")
    assert(spark.table("mf.ns.t").count() == 6)
  }

  test("row-level replace rewrites only segments containing replaced files") {
    val before = meta("t").currentSnapshot.get
    // row 5 lives in the first manifest's file; row 6 in the second's
    spark.sql("UPDATE mf.ns.t SET v = 'u5' WHERE k = 5")
    val after = meta("t").currentSnapshot.get
    assert(after.manifests.size == 2)
    assert(!after.manifests.contains(before.manifests.head),
      "the segment holding the rewritten file must be replaced")
    assert(after.manifests.contains(before.manifests(1)),
      "the untouched segment must carry over verbatim")
    assert(after.files == before.files, "inline entries untouched")
    assert(after.totalFiles == 6)
    val rows = spark.sql("SELECT v FROM mf.ns.t WHERE k IN (5, 6) ORDER BY k")
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("u5", "a6"))
  }

  test("time travel resolves manifests of historic snapshots") {
    // the catalog version captured right after the 5th insert (the
    // first manifest commit) must still read exactly 5 rows
    val n = spark.sql(
      s"SELECT count(*) FROM mf.ns.t VERSION AS OF ${ManifestSpec.versionAtFive}")
      .collect()(0).getLong(0)
    assert(n == 5)
  }

  test("$manifests shows the segment inventory") {
    val rows = spark.sql(
      "SELECT manifest, n_files FROM mf.ns.`t$manifests` ORDER BY manifest")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(rows.count(_._1 == "<inline>") == 1)
    assert(rows.find(_._1 == "<inline>").get._2 == 4)
    assert(rows.count(_._1 != "<inline>") == 2)
    assert(rows.map(_._2).sum == 6)
  }

  test("$files and $partitions resolve segments; $snapshots uses totals") {
    val files = spark.sql("SELECT count(*) FROM mf.ns.`t$files`")
      .collect()(0).getLong(0)
    assert(files == 6)
    val nFiles = spark.sql(
      "SELECT n_files FROM mf.ns.`t$snapshots` ORDER BY snapshot_id DESC LIMIT 1")
      .collect()(0).getInt(0)
    assert(nFiles == 6)
  }

  test("expireSnapshots deletes segments only dead snapshots reference") {
    val all = meta("t")
    val liveRefs = all.currentSnapshot.get.manifests.toSet
    val allRefs = all.snapshots.flatMap(_.manifests).distinct
    assert(allRefs.size > liveRefs.size, "history must hold dead segments")
    val expired = graft.maintain.Maintenance.expireSnapshots(
      cat, Identifier.of(Array("ns"), "t"), keepLast = 1)
    assert(expired > 0)
    liveRefs.foreach(k => assert(cat.storage.exists(k),
      s"live segment deleted: $k"))
    allRefs.filterNot(liveRefs).foreach(k => assert(!cat.storage.exists(k),
      s"dead segment survived: $k"))
    assert(spark.table("mf.ns.t").count() == 6)
  }

  test("compaction folds a manifest table back inline") {
    val res = graft.maintain.Maintenance.compactDataFiles(
      spark, cat, Identifier.of(Array("ns"), "t"), targetFiles = 1)
    assert(res.filesBefore == 6 && res.filesAfter == 1)
    val s = meta("t").currentSnapshot.get
    assert(s.manifests.isEmpty && s.files.size == 1,
      "1 file fits back inline")
    assert(spark.table("mf.ns.t").count() == 6)
  }

  test("segment-count bound merges segments instead of growing forever") {
    spark.sql("DROP TABLE IF EXISTS mf.ns.m")
    spark.sql("""CREATE TABLE mf.ns.m (k BIGINT)
      TBLPROPERTIES ('graft.manifest.inline-max'='0')""")
    // every insert is its own segment until the merge bound trips
    (1 to Manifests.SegmentsMax + 2).foreach(i =>
      spark.sql(s"INSERT INTO mf.ns.m VALUES ($i)"))
    val s = meta("m").currentSnapshot.get
    assert(s.manifests.size <= Manifests.SegmentsMax + 1,
      s"segments must stay bounded, saw ${s.manifests.size}")
    assert(s.totalFiles == Manifests.SegmentsMax + 2)
    assert(spark.table("mf.ns.m").count() == Manifests.SegmentsMax + 2)
  }

  test("orphaned segments from lost commit races are collected") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val live = meta("m").snapshots.flatMap(_.manifests).toSet
    assert(live.nonEmpty)
    // plant a stray segment, as a commit that lost its root race and
    // replayed would leave behind
    val stray = Manifests.write(cat.storage, "data/ns/m/manifests",
      Seq(DataFileEntry("data/ns/m/files/ghost.parquet", 1, 1)))
    val removed = graft.maintain.Maintenance.removeOrphanFiles(
      cat, Identifier.of(Array("ns"), "m"))
    assert(removed.contains(stray))
    assert(!cat.storage.exists(stray))
    live.foreach(k => assert(cat.storage.exists(k), s"live segment deleted: $k"))
    assert(spark.table("mf.ns.m").count() == Manifests.SegmentsMax + 2)
  }

  test("legacy inline-only documents (no manifest fields) still read") {
    val legacyJson =
      """{"schemaJson":"{\"type\":\"struct\",\"fields\":[]}",
        |"currentSnapshotId":1,
        |"snapshots":[{"id":1,"parentId":-1,"timestampMillis":1,
        |"operation":"append",
        |"files":[{"path":"data/x/p.parquet","rowCount":7,"sizeBytes":9}]}]}"""
        .stripMargin.replaceAll("\n", "")
    val m = graft.objects.Json.readString(legacyJson, classOf[TableMetadata])
    val s = m.currentSnapshot.get
    assert(s.manifests.isEmpty)
    assert(s.totalFiles == 1 && s.totalRows == 7 && s.totalBytes == 9)
    assert(m.currentFiles(cat.storage).map(_.path) == Seq("data/x/p.parquet"))
  }
}

object ManifestSpec {
  @volatile var versionAtFive: Long = -1L
}
