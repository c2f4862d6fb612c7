package graft.maintain

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.GraftCatalog

/** Opt-in refresh-on-write: `graft.mv.refresh-on-commit=true` on a
  * SOURCE table triggers a best-effort async refresh of its derived
  * views after a write commit, so serving freshness doesn't depend on
  * external scheduling — and a hook failure never fails the user's
  * commit.
  */
class MvRefreshOnCommitSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-mroc").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.mrc", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.mrc.warehouse", warehouse)
    .getOrCreate()

  private def watermark(): Long =
    spark.sessionState.catalogManager.catalog("mrc")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns1"), "mv"))
      .properties().get(MaterializedViews.RefreshedSnapshotProp).toLong

  test("an append to a hooked source refreshes the derived view " +
      "without an explicit REFRESH") {
    spark.sql("CREATE NAMESPACE mrc.ns1")
    spark.sql("CREATE TABLE mrc.ns1.src (k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO mrc.ns1.src
                 SELECT id % 5, CAST(id AS DOUBLE) FROM range(0, 500, 1, 2)""")
    spark.sql("""CALL mrc.system.create_materialized_view(
                   namespace => 'ns1', name => 'mv',
                   source_namespace => 'ns1', source_table => 'src',
                   group_by => 'k',
                   aggs => 'n:count:1;total:sum:CAST(v AS DECIMAL(18,2))')""")
    spark.sql("""ALTER TABLE mrc.ns1.src SET TBLPROPERTIES
                   ('graft.mv.refresh-on-commit' = 'true')""")
    val before = watermark()

    spark.sql("INSERT INTO mrc.ns1.src VALUES (1, 10.0), (7, 3.5)")
    // the hook runs on its own daemon thread; drain the queue, then
    // poll briefly (the refresh itself may still be committing)
    MaterializedViews.awaitRefreshHooks()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (watermark() == before && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(watermark() != before,
      "the commit hook must have advanced the view's watermark")
    val state = spark.sql(
      "SELECT k, n, CAST(total AS DOUBLE) FROM mrc.ns1.mv ORDER BY k")
      .collect().map(_.toString).toSeq
    val truth = spark.sql(
      """SELECT k, count(*), CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE)
         FROM mrc.ns1.src GROUP BY k ORDER BY k""")
      .collect().map(_.toString).toSeq
    assert(state == truth)
  }

  test("the hook refresh never enlists in a user transaction open on " +
      "the committing session's catalog") {
    spark.sql("CREATE NAMESPACE mrc.ns3")
    spark.sql("CREATE TABLE mrc.ns3.src (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO mrc.ns3.src VALUES (1, 1.0), (2, 2.0)")
    spark.sql("""CALL mrc.system.create_materialized_view(
                   namespace => 'ns3', name => 'mv',
                   source_namespace => 'ns3', source_table => 'src',
                   group_by => 'k', aggs => 'n:count:1')""")
    spark.sql("""ALTER TABLE mrc.ns3.src SET TBLPROPERTIES
                   ('graft.mv.refresh-on-commit' = 'true')""")
    // observe through a FRESH instance each time: the user's open
    // transaction must not gate what the hook published
    def wmOf(): Long = spark.newSession().sessionState.catalogManager
      .catalog("mrc").asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns3"), "mv"))
      .properties().get(MaterializedViews.RefreshedSnapshotProp).toLong
    val before = wmOf()
    spark.sql("INSERT INTO mrc.ns3.src VALUES (3, 3.0)")
    val cat = spark.sessionState.catalogManager.catalog("mrc")
      .asInstanceOf[GraftCatalog]
    cat.beginTransaction()
    try {
      MaterializedViews.awaitRefreshHooks()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (wmOf() == before && System.nanoTime() < deadline)
        Thread.sleep(50)
      // the refresh COMMITTED while the user's txn is still open — it
      // ran in its own session/catalog, never inside the user's txn
      assert(wmOf() != before,
        "the hook must publish independently of the open user txn")
    } finally cat.rollbackTransaction()
    // and the user's rollback cannot undo it
    assert(wmOf() != before)
    val n = spark.sql("SELECT sum(n) FROM mrc.ns3.mv").head.getLong(0)
    assert(n == 3L, s"state must cover the appended row, got $n")
  }

  test("a failing hook never fails the user's commit") {
    spark.sql("CREATE NAMESPACE mrc.ns2")
    spark.sql("CREATE TABLE mrc.ns2.src (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO mrc.ns2.src VALUES (1, 1.0)")
    spark.sql("""CALL mrc.system.create_materialized_view(
                   namespace => 'ns2', name => 'mv',
                   source_namespace => 'ns2', source_table => 'src',
                   group_by => 'k', aggs => 'n:count:1')""")
    spark.sql("""ALTER TABLE mrc.ns2.src SET TBLPROPERTIES
                   ('graft.mv.refresh-on-commit' = 'true')""")
    // drop the view table DIRECTLY (not via drop_materialized_view):
    // the source keeps a stale derived entry, so the hook's refresh
    // will fail — the write must still commit
    spark.sql("DROP TABLE mrc.ns2.mv")
    spark.sql("INSERT INTO mrc.ns2.src VALUES (2, 2.0)")
    MaterializedViews.awaitRefreshHooks()
    val n = spark.sql("SELECT count(*) FROM mrc.ns2.src").head.getLong(0)
    assert(n == 2L, "the user's commit must land despite the hook failing")
  }

  test("a commit burst across many views/sources drains the worker " +
      "pool with every view fresh exactly once per coalesced window") {
    spark.sql("CREATE NAMESPACE mrc.ns4")
    val nViews = 6
    (0 until nViews).foreach { i =>
      spark.sql(s"CREATE TABLE mrc.ns4.src$i (k BIGINT, v DOUBLE)")
      spark.sql(s"""INSERT INTO mrc.ns4.src$i
                    SELECT id % 4, CAST(id AS DOUBLE)
                    FROM range(0, 200, 1, 2)""")
      spark.sql(s"""CALL mrc.system.create_materialized_view(
                     namespace => 'ns4', name => 'mv$i',
                     source_namespace => 'ns4', source_table => 'src$i',
                     group_by => 'k',
                     aggs => 'n:count:1;total:sum:CAST(v AS DECIMAL(18,2))')""")
      spark.sql(s"""ALTER TABLE mrc.ns4.src$i SET TBLPROPERTIES
                     ('graft.mv.refresh-on-commit' = 'true')""")
    }
    // burst: two commits per source back-to-back — per-view coalescing
    // may fold them, per-view serialization must never interleave two
    // refreshes of one view, and distinct views ride the pool threads
    (0 until nViews).foreach { i =>
      spark.sql(s"INSERT INTO mrc.ns4.src$i VALUES (1, 100.0)")
      spark.sql(s"INSERT INTO mrc.ns4.src$i VALUES (2, 200.0)")
    }
    MaterializedViews.awaitRefreshHooks()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    def allFresh(): Boolean = (0 until nViews).forall { i =>
      spark.sql(s"""SELECT fresh FROM mrc.ns4.`src$i$$views`
                    WHERE view_name = 'mv$i'""").head.getBoolean(0)
    }
    while (!allFresh() && System.nanoTime() < deadline) {
      // a commit landing mid-refresh re-enqueues; drain again
      MaterializedViews.awaitRefreshHooks()
      Thread.sleep(50)
    }
    assert(allFresh(), "every view must be fresh after the burst drains")
    (0 until nViews).foreach { i =>
      val state = spark.sql(
        s"SELECT k, n, CAST(total AS DOUBLE) FROM mrc.ns4.mv$i ORDER BY k")
        .collect().map(_.toString).toSeq
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      val truth = try spark.sql(
        s"""SELECT k, count(*), CAST(sum(CAST(v AS DECIMAL(18,2)))
                   AS DOUBLE)
            FROM mrc.ns4.src$i GROUP BY k ORDER BY k""")
        .collect().map(_.toString).toSeq
      finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
      assert(state == truth, s"mv$i state diverged under the burst")
    }
    // the $views staleness column: freshly refreshed views report a
    // small age, and it is never NULL for stamped views
    val ages = spark.sql(
      """SELECT refresh_age_seconds FROM mrc.ns4.`src0$views`
         WHERE view_name = 'mv0'""").collect()
    assert(ages.length == 1 && !ages(0).isNullAt(0), ages.mkString)
    assert(ages(0).getLong(0) <= 300, s"age ${ages(0).getLong(0)}s")
  }
}
