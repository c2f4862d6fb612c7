package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read UPDATE/MERGE via position deltas: with
  * `graft.update.mode` / `graft.merge.mode` = `merge-on-read`, a
  * row-level operation commits small position-delete objects plus the
  * replacement rows — existing data files are NOT rewritten. At 100 TB
  * a 10-row upsert writes a few KB instead of re-copying gigabyte
  * files; reads apply each file's delete set where the file is read.
  */
class MorUpdateSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-morup").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.mu", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.mu.warehouse", warehouse)
    .getOrCreate()

  private def files(t: String): Seq[String] =
    spark.sql(s"SELECT path FROM mu.ns.`$t$$files`")
      .collect().map(_.getString(0)).toSeq

  test("_pos metadata column yields true file row positions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mu.ns")
    spark.sql("CREATE TABLE mu.ns.p (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO mu.ns.p SELECT id, concat('v', id) FROM range(0, 1000, 1, 2)")
    val rows = spark.sql("SELECT k, _pos, _file FROM mu.ns.p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 1000)
    // per file, positions are exactly 0..n-1
    rows.groupBy(_._3).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (0L until rs.length).toSeq)
    }
    // positions are stable under pushdown: a filtered read sees the
    // same (k, pos) pairs the full read saw
    val byK = rows.map(r => r._1 -> r._2).toMap
    val filtered = spark.sql("SELECT k, _pos FROM mu.ns.p WHERE k >= 990")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(filtered.length == 10)
    filtered.foreach { case (k, p) => assert(byK(k) == p, s"k=$k") }
  }

  test("mor UPDATE commits a position delta, not a rewrite") {
    spark.sql("""CREATE TABLE mu.ns.t (k BIGINT, v STRING, amt DOUBLE)
      TBLPROPERTIES ('graft.update.mode' = 'merge-on-read',
                     'graft.merge.mode' = 'merge-on-read')""")
    spark.sql("""INSERT INTO mu.ns.t
      SELECT id, concat('v', id), CAST(id AS DOUBLE) FROM range(0, 1000, 1, 4)""")
    val before = files("t")
    spark.sql("UPDATE mu.ns.t SET v = 'touched', amt = amt * 2 WHERE k % 100 = 7")
    assert(files("t").toSet.intersect(before.toSet) == before.toSet,
      "a mor update must keep every pre-existing data file in the snapshot")
    assert(spark.sql("SELECT count(*) FROM mu.ns.t").head.getLong(0) == 1000)
    assert(spark.sql("SELECT count(*) FROM mu.ns.t WHERE v = 'touched'")
      .head.getLong(0) == 10)
    assert(spark.sql("SELECT sum(amt) FROM mu.ns.t WHERE v = 'touched'")
      .head.getDouble(0) == (0 until 1000).filter(_ % 100 == 7).map(_ * 2.0).sum)
    // untouched rows unchanged
    assert(spark.sql("SELECT sum(amt) FROM mu.ns.t").head.getDouble(0) ==
      (0 until 1000).map(i => if (i % 100 == 7) i * 2.0 else i.toDouble).sum)
  }

  test("mor MERGE upserts through a position delta") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW src AS
      SELECT id AS k, concat('new', id) AS v, CAST(-1 AS DOUBLE) AS amt
      FROM range(990, 1010)""")
    val before = files("t")
    spark.sql("""MERGE INTO mu.ns.t AS tgt USING src
      ON tgt.k = src.k
      WHEN MATCHED THEN UPDATE SET v = src.v, amt = src.amt
      WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (src.k, src.v, src.amt)""")
    assert(files("t").toSet.intersect(before.toSet) == before.toSet,
      "a mor merge must keep every pre-existing data file in the snapshot")
    assert(spark.sql("SELECT count(*) FROM mu.ns.t").head.getLong(0) == 1010)
    assert(spark.sql("SELECT count(*) FROM mu.ns.t WHERE v LIKE 'new%'")
      .head.getLong(0) == 20)
    assert(spark.sql("SELECT sum(amt) FROM mu.ns.t WHERE k >= 990")
      .head.getDouble(0) == -20.0)
  }

  test("mor MERGE delete clause deletes by position") {
    spark.sql("""CREATE OR REPLACE TEMP VIEW victims AS
      SELECT id AS k FROM range(0, 1000, 250)""")
    spark.sql("""MERGE INTO mu.ns.t AS tgt USING victims
      ON tgt.k = victims.k
      WHEN MATCHED THEN DELETE""")
    assert(spark.sql("SELECT count(*) FROM mu.ns.t").head.getLong(0) == 1006)
    assert(spark.sql("SELECT count(*) FROM mu.ns.t WHERE k IN (0, 250, 500, 750)")
      .head.getLong(0) == 0)
  }

  test("stacked deltas compose and time travel sees through them") {
    spark.sql("CALL mu.system.create_tag('ns', 't', 'pre_second_update')")
    // a second delta UPDATE hits rows living in files that already
    // carry pending position deletes — the delete sets must union
    spark.sql("UPDATE mu.ns.t SET v = 'again' WHERE v = 'touched'")
    assert(spark.sql("SELECT count(*) FROM mu.ns.t WHERE v = 'again'")
      .head.getLong(0) == 10)
    assert(spark.sql("SELECT count(*) FROM mu.ns.t WHERE v = 'touched'")
      .head.getLong(0) == 0)
    assert(spark.sql("SELECT count(*) FROM mu.ns.t").head.getLong(0) == 1006)
    assert(spark.sql(
      "SELECT count(*) FROM mu.ns.t VERSION AS OF 'pre_second_update' WHERE v = 'touched'")
      .head.getLong(0) == 10)
  }

  test("$deletes metadata table lists pending position deltas") {
    val dels = spark.sql("SELECT kind, n_rows FROM mu.ns.`t$deletes`")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(dels.nonEmpty && dels.forall(_._1 == "position"))
    // deltas so far: update(10) + merge-update(10) + merge-delete(4)
    // + second update(10)
    assert(dels.map(_._2).sum == 34, s"got ${dels.toSeq}")
  }

  test("CDC surfaces a position delta as delete(old) + insert(new)") {
    val cat = spark.sessionState.catalogManager.catalog("mu")
      .asInstanceOf[GraftCatalog]
    val before = spark.sql("SELECT max(snapshot_id) FROM mu.ns.`t$snapshots`")
      .head.getLong(0)
    spark.sql("UPDATE mu.ns.t SET amt = 123.0 WHERE k = 501")
    val changes = TableChanges.between(spark, cat,
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("ns"), "t"),
      startSnapshotId = before)
      .select("_change_type", "k", "amt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(changes.toSet == Set(("delete", 501L, 501.0),
      ("insert", 501L, 123.0)), s"got ${changes.toSeq}")
  }

  test("copy-on-write DELETE does not resurrect delta-deleted rows") {
    // delete.mode is default (copy-on-write): the selective rewrite
    // reads files carrying pending position deletes — survivors only
    spark.sql("DELETE FROM mu.ns.t WHERE k < 100")
    // pre-delete state: 1006 rows; k<100 held 100 original rows minus
    // the delta-deleted k=0 → 99 removed
    assert(spark.sql("SELECT count(*) FROM mu.ns.t").head.getLong(0) == 907)
    assert(spark.sql("SELECT count(*) FROM mu.ns.t WHERE v = 'again'")
      .head.getLong(0) == 9, "k=7 left with the rewrite")
  }

  test("orphan cleanup keeps pending delete objects") {
    val removed = spark.sql(
      "CALL mu.system.remove_orphan_files(namespace => 'ns', `table` => 't')")
      .collect().map(_.getString(0))
    assert(!removed.exists(_.contains("/deletes/")),
      s"live delete objects removed: ${removed.filter(_.contains("/deletes/")).toSeq}")
    assert(spark.sql("SELECT count(*) FROM mu.ns.t").head.getLong(0) == 907)
  }

  test("compaction materializes position deltas and clears them") {
    assert(spark.sql("SELECT count(*) FROM mu.ns.`t$deletes`")
      .head.getLong(0) > 0)
    spark.sql("CALL mu.system.compact_table(namespace => 'ns', `table` => 't')")
    assert(spark.sql("SELECT count(*) FROM mu.ns.`t$deletes`")
      .head.getLong(0) == 0, "compaction must clear the pending delta list")
    assert(spark.sql("SELECT count(*) FROM mu.ns.t").head.getLong(0) == 907)
    assert(spark.sql("SELECT count(*) FROM mu.ns.t WHERE v = 'again'")
      .head.getLong(0) == 9)
    assert(spark.sql("SELECT sum(amt) FROM mu.ns.t WHERE k = 501")
      .head.getDouble(0) == 123.0)
  }

  test("partitioned table: position deltas respect hidden partitioning") {
    spark.sql("""CREATE TABLE mu.ns.pt (k BIGINT, region STRING, amt DOUBLE)
      PARTITIONED BY (region)
      TBLPROPERTIES ('graft.update.mode' = 'merge-on-read')""")
    spark.sql("""INSERT INTO mu.ns.pt (k, region, amt)
      SELECT id, CASE WHEN id % 2 = 0 THEN 'east' ELSE 'west' END,
             CAST(id AS DOUBLE)
      FROM range(0, 400, 1, 4)""")
    val before = files("pt")
    spark.sql("UPDATE mu.ns.pt SET amt = -1.0 WHERE k % 50 = 3")
    assert(files("pt").toSet.intersect(before.toSet) == before.toSet)
    assert(spark.sql("SELECT count(*) FROM mu.ns.pt WHERE amt = -1.0")
      .head.getLong(0) == 8)
    assert(spark.sql("SELECT count(*) FROM mu.ns.pt").head.getLong(0) == 400)
    // partition pruning still serves correct data under deltas
    assert(spark.sql(
      "SELECT count(*) FROM mu.ns.pt WHERE region = 'west' AND amt = -1.0")
      .head.getLong(0) == 8, "k%50=3 is always odd → west")
  }

  test("reads stay COLUMNAR under pending position deltas") {
    spark.sql("""CREATE TABLE mu.ns.vec (k BIGINT, v DOUBLE)
                 TBLPROPERTIES ('graft.update.mode' = 'merge-on-read')""")
    spark.sql(
      "INSERT INTO mu.ns.vec SELECT id, CAST(id AS DOUBLE) FROM range(1000)")
    spark.sql("UPDATE mu.ns.vec SET v = -1.0 WHERE k % 100 = 7")
    val cat = spark.sessionState.catalogManager.catalog("mu")
      .asInstanceOf[GraftCatalog]
    val txn = graft.catalog.Graft.beginTransaction(cat.storage)
    val pending = try {
      val td = graft.catalog.Graft.describeTable(cat.storage, txn, "ns", "vec")
      graft.format.TableMetadata.read(cat.storage, td.metadataLocation)
        .currentSnapshot.get.posDeletes
    } finally txn.close()
    assert(pending.nonEmpty, "precondition: a position delta is pending")
    val df = spark.table("mu.ns.vec")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"pending deltas dropped the scan to row-at-a-time:\n$plan")
    // and the columnar read serves delta-exact values
    assert(df.where(org.apache.spark.sql.functions.col("v") === -1.0)
      .count() == 10)
    assert(df.count() == 1000)
    assert(df.agg(org.apache.spark.sql.functions.sum("k")).head.getLong(0)
      == (0L until 1000L).sum)
  }
}
