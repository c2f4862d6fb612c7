package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Identifier
import org.scalatest.funsuite.AnyFunSuite

/** Incremental reads: `start-snapshot-id` / `end-snapshot-id` read
  * options plan a scan over ONLY the files appended in the range (the
  * reprocess-only-new-data primitive of a training-data pipeline), and
  * [[TableChanges.between]] derives row-level insert/delete changes
  * from the file-inventory diff of any range, including copy-on-write
  * rewrites.
  */
class IncrementalReadSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-inc").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions",
      classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.inc", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.inc.warehouse", warehouse)
    .getOrCreate()

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("inc").asInstanceOf[GraftCatalog]

  test("start/end snapshot options scan only the appended files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS inc.ns")
    spark.sql("""CREATE TABLE inc.ns.t (k BIGINT, batch INT)
      TBLPROPERTIES ('graft.snapshot-log.inline-max'='2')""")
    (0 until 5).foreach(b =>
      spark.sql(s"INSERT INTO inc.ns.t VALUES (${b * 10}, $b), (${b * 10 + 1}, $b)"))
    // snapshots are 0-based: batch b commits snapshot id b
    val incDf = spark.read
      .option("start-snapshot-id", "1")
      .table("inc.ns.t")
    assert(incDf.select("batch").distinct().collect().map(_.getInt(0)).sorted
      .toSeq == Seq(2, 3, 4), "start is exclusive; end defaults to current")
    val bounded = spark.read
      .option("start-snapshot-id", "1")
      .option("end-snapshot-id", "3")
      .table("inc.ns.t")
    assert(bounded.select("batch").distinct().collect().map(_.getInt(0)).sorted
      .toSeq == Seq(2, 3), "end is inclusive")
    // pushdown still applies on the incremental file set
    assert(bounded.where("k = 30").count() == 1)
    // empty range serves an empty scan, not an error
    assert(spark.read.option("start-snapshot-id", "4").table("inc.ns.t")
      .count() == 0)
    // the range survives snapshot-log spilling (inline window is 2)
    assert(spark.read.option("start-snapshot-id", "0").table("inc.ns.t")
      .count() == 8)
  }

  test("a non-additive snapshot in the range is refused, not misread") {
    spark.sql("DELETE FROM inc.ns.t WHERE k = 0") // snapshot 5, op=delete
    val e = intercept[Exception] {
      spark.read.option("start-snapshot-id", "1").table("inc.ns.t").count()
    }
    assert(e.getMessage.contains("non-additive"))
    // ranges that stop before the delete still work
    assert(spark.read.option("start-snapshot-id", "1")
      .option("end-snapshot-id", "4").table("inc.ns.t").count() == 6)
  }

  test("a concurrent BRANCH delete inside the id range neither " +
      "refuses nor pollutes an additive incremental read") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS inc.ns")
    spark.sql("CREATE TABLE inc.ns.br (k BIGINT, batch INT)")
    spark.sql("INSERT INTO inc.ns.br VALUES (1, 0), (2, 0)")
    val startId = spark.sql(
      "SELECT max(snapshot_id) FROM inc.ns.`br$snapshots`")
      .collect()(0).getLong(0)
    // branch snapshots interleave in the GLOBAL id space: the range
    // (startId, current] contains a branch DELETE by id, but the main
    // parent chain is append-only — the read must serve it
    spark.sql("""CALL inc.system.create_branch(
                   namespace => 'ns', table => 'br', branch => 'wip')""")
    spark.sql("DELETE FROM inc.ns.`br$branch_wip` WHERE k = 1")
    spark.sql("INSERT INTO inc.ns.br VALUES (3, 1), (4, 1)")
    val got = spark.read
      .option("start-snapshot-id", startId.toString)
      .table("inc.ns.br")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(3L, 4L),
      s"only the main append's rows are the delta, got $got")
  }

  test("TableChanges derives row-level insert/delete from a COW rewrite") {
    spark.sql("CREATE TABLE inc.ns.c (k BIGINT, v STRING)")
    spark.sql("INSERT INTO inc.ns.c VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO inc.ns.c VALUES (3, 'c'), (4, 'd')")
    spark.sql("UPDATE inc.ns.c SET v = 'B' WHERE k = 2") // snapshot 2
    val ch = TableChanges.between(spark, cat,
      Identifier.of(Array("ns"), "c"), startSnapshotId = 1L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._3, t._1)).toSeq
    assert(ch == Seq((2L, "b", "delete"), (2L, "B", "insert")),
      "unchanged rows of the rewritten file must cancel out")
    // append-only range: inserts only, and NO exceptAll in the plan
    val app = TableChanges.between(spark, cat,
      Identifier.of(Array("ns"), "c"), startSnapshotId = 0L, endSnapshotId = 1L)
    assert(app.queryExecution.optimizedPlan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Except => e
    }.isEmpty, "append-only ranges must not pay a set-difference shuffle")
    assert(app.collect().map(r => (r.getLong(0), r.getString(2))).sorted.toSeq ==
      Seq((3L, "insert"), (4L, "insert")))
    // whole-history CDC equals the current table content
    val full = TableChanges.between(spark, cat, Identifier.of(Array("ns"), "c"))
    assert(full.where("_change_type = 'insert'").count() == 4)
    assert(full.where("_change_type = 'delete'").count() == 0)
  }

  // the optimizer rewrites ExceptAll into union+aggregate
  // (RewriteExceptAll), so probe the ANALYZED plan
  private def hasExcept(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Except => e
    }.nonEmpty

  test("a predicate DELETE's change feed is one filtered scan, no diff") {
    spark.sql("CREATE TABLE inc.ns.d (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO inc.ns.d SELECT id, concat('s', id) FROM range(0, 100)")
    spark.sql("INSERT INTO inc.ns.d SELECT id + 100, concat('s', id + 100) " +
      "FROM range(0, 100)")
    spark.sql("DELETE FROM inc.ns.d WHERE k % 13 = 6") // snapshot 2
    val ch = TableChanges.between(spark, cat,
      Identifier.of(Array("ns"), "d"), startSnapshotId = 1L)
    assert(!hasExcept(ch),
      "a complete-predicate delete must not pay the two-sided row diff")
    val rows = ch.collect().map(r => (r.getLong(0), r.getString(2)))
    assert(rows.forall(_._2 == "delete"))
    assert(rows.map(_._1).sorted.toSeq ==
      (0L until 200L).filter(_ % 13 == 6))
  }

  test("the predicate-delete fast path yields to pending row deltas") {
    // raw removed-file rows would resurrect position-deleted rows the
    // rewrite applied — the feed must fall back to the row-set diff
    spark.sql("""CREATE TABLE inc.ns.e (k BIGINT, v STRING)
      TBLPROPERTIES ('graft.update.mode' = 'merge-on-read')""")
    spark.sql(
      "INSERT INTO inc.ns.e SELECT id, concat('s', id) FROM range(0, 10)")
    spark.sql("UPDATE inc.ns.e SET v = 'u' WHERE k = 1") // pos delta, snap 1
    spark.sql("DELETE FROM inc.ns.e WHERE k >= 5") // CoW, snapshot 2
    val ch = TableChanges.between(spark, cat,
      Identifier.of(Array("ns"), "e"), startSnapshotId = 1L)
    assert(hasExcept(ch),
      "pending position deltas on the parent must force the diff path")
    val deleted = ch.where("_change_type = 'delete'")
      .collect().map(_.getLong(0))
    assert((5L until 10L).forall(deleted.contains))
  }
}
