package graft.maintain

import java.nio.file.Files

import graft.spark.GraftCatalog
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Counting-algorithm MV maintenance: a snapshot range containing
  * deletes/updates refreshes from the CHANGE FEED when every aggregate
  * retracts (count/sum with `count:1` and a matching `count:<expr>`
  * per sum) — the state after any CDC refresh must EQUAL a
  * from-scratch aggregate, groups whose row count reaches zero must
  * drop out, a sum whose non-null count reaches zero must return to
  * NULL, and every non-retractable shape must decline to the full
  * path instead of corrupting state.
  */
class MvCdcSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-mvcdc").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.mcd", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.mcd.warehouse", warehouse)
    .getOrCreate()

  private def call(sqlText: String) =
    spark.sql(sqlText).collect().map(r => r.getString(0) -> r.getLong(1)).head

  private def refresh(mv: String) =
    call(s"""CALL mcd.system.refresh_materialized_view(
               namespace => 'ns1', name => '$mv')""")._1

  private def rows(mv: String, cols: String) = spark.sql(
    s"SELECT $cols FROM mcd.ns1.$mv ORDER BY k")
    .collect().map(_.toString).toSeq

  // truth MUST compute with the rewrite off — a fresh view would
  // otherwise SERVE this source aggregate, comparing the state to
  // itself instead of to a from-scratch recompute
  private def truth(src: String) = {
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try spark.sql(
      s"""SELECT k, count(*) AS n,
               count(CAST(v AS DECIMAL(18,2))) AS np,
               sum(CAST(v AS DECIMAL(18,2))) AS total
          FROM mcd.ns1.$src GROUP BY k ORDER BY k""")
      .collect().map(_.toString).toSeq
    finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
  }

  private val cdcAggs =
    "n:count:1;np:count:CAST(v AS DECIMAL(18,2));total:sum:CAST(v AS DECIMAL(18,2))"

  private def createMv(src: String, mv: String, aggs: String = cdcAggs): Unit =
    call(s"""CALL mcd.system.create_materialized_view(
               namespace => 'ns1', name => '$mv',
               source_namespace => 'ns1', source_table => '$src',
               group_by => 'k', aggs => '$aggs')""")

  test("delete, update, and group-vanishing ranges refresh via the " +
      "change feed and equal the from-scratch aggregate") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcd.ns1")
    spark.sql("CREATE TABLE mcd.ns1.src (id BIGINT, k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO mcd.ns1.src
                 SELECT id, id % 5, CAST(id AS DOUBLE) / 4
                 FROM range(0, 8000, 1, 4)""")
    createMv("src", "mv")

    // copy-on-write DELETE: retraction of the deleted rows only
    spark.sql("DELETE FROM mcd.ns1.src WHERE id % 3 = 0")
    assert(refresh("mv") == "cdc")
    assert(rows("mv", "k, n, np, total") == truth("src"))

    // copy-on-write UPDATE: delete(old)+insert(new) through the feed
    spark.sql("UPDATE mcd.ns1.src SET v = v * 2 WHERE id % 7 = 1")
    assert(refresh("mv") == "cdc")
    assert(rows("mv", "k, n, np, total") == truth("src"))

    // mixed range (delete THEN append, one refresh) with a group
    // deleted outright: k=4 must drop out of the view entirely
    spark.sql("DELETE FROM mcd.ns1.src WHERE k = 4")
    spark.sql("INSERT INTO mcd.ns1.src VALUES (90001, 7, 2.5), (90002, 7, NULL)")
    assert(refresh("mv") == "cdc")
    assert(rows("mv", "k, n, np, total") == truth("src"))
    assert(spark.sql("SELECT * FROM mcd.ns1.mv WHERE k = 4").count() == 0)
    assert(refresh("mv") == "noop")
  }

  test("a sum whose last non-null value is deleted returns to NULL, " +
      "not 0") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcd.ns1")
    spark.sql("CREATE TABLE mcd.ns1.nsrc (id BIGINT, k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO mcd.ns1.nsrc VALUES
                 (1, 1, 10.0), (2, 1, NULL), (3, 1, NULL), (4, 2, 5.0)""")
    createMv("nsrc", "nmv")
    spark.sql("DELETE FROM mcd.ns1.nsrc WHERE id = 1")
    assert(refresh("nmv") == "cdc")
    val r = spark.sql(
      "SELECT n, np, total FROM mcd.ns1.nmv WHERE k = 1").collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 0 && r.isNullAt(2),
      s"k=1 must keep its 2 null rows with total NULL, got $r")
    assert(rows("nmv", "k, n, np, total") == truth("nsrc"))
  }

  test("non-retractable shapes decline to the full path") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcd.ns1")
    spark.sql("CREATE TABLE mcd.ns1.fsrc (id BIGINT, k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO mcd.ns1.fsrc
                 SELECT id, id % 3, CAST(id AS DOUBLE)
                 FROM range(0, 300, 1, 2)""")
    // min/max cannot retract a deleted extremum — the group-scoped
    // recompute re-aggregates only the touched groups
    createMv("fsrc", "fmv1", "n:count:1;mx:max:v")
    // a sum without its matching non-null count cannot restore NULL
    createMv("fsrc", "fmv2", "n:count:1;total:sum:v")
    // no count:1 → group liveness is unknowable
    createMv("fsrc", "fmv3", "np:count:v;total:sum:v")
    spark.sql("DELETE FROM mcd.ns1.fsrc WHERE id % 2 = 0")
    assert(refresh("fmv1") == "groups")
    assert(refresh("fmv2") == "groups")
    assert(refresh("fmv3") == "groups")
    // all three still equal the truth after the group-scoped recompute
    assert(rows("fmv1", "k, n, mx") == spark.sql(
      """SELECT k, count(*) AS n, max(v) AS mx
         FROM mcd.ns1.fsrc GROUP BY k ORDER BY k""")
      .collect().map(_.toString).toSeq)

    // a rollback in range diffs whole snapshots — full is the honest
    // path even for a retractable view
    spark.sql("INSERT INTO mcd.ns1.fsrc VALUES (9001, 1, 3.5)")
    createMv("fsrc", "fmv4")
    val snap = spark.sql(
      "SELECT max(snapshot_id) FROM mcd.ns1.`fsrc$snapshots`")
      .collect()(0).getLong(0)
    spark.sql("INSERT INTO mcd.ns1.fsrc VALUES (9002, 1, 4.5)")
    spark.sql(s"""CALL mcd.system.rollback_to_snapshot(
                    namespace => 'ns1', table => 'fsrc',
                    snapshot_id => $snap)""")
    spark.sql("DELETE FROM mcd.ns1.fsrc WHERE id = 9001")
    assert(refresh("fmv4") == "full")
    assert(rows("fmv4", "k, n, np, total") == truth("fsrc"))
  }

  test("merge-on-read equality upserts maintain through the feed and " +
      "the rewrite serves the source right after a CDC refresh") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcd.ns1")
    spark.sql("""CREATE TABLE mcd.ns1.usrc (
                   id BIGINT NOT NULL, k BIGINT, v DOUBLE)
                 TBLPROPERTIES (
                   'graft.write.upsert-keys' = 'id',
                   'graft.merge.mode' = 'merge-on-read-eq')""")
    spark.sql("""INSERT INTO mcd.ns1.usrc
                 SELECT id, id % 3, CAST(id AS DOUBLE)
                 FROM range(0, 600, 1, 2)""")
    createMv("usrc", "umv")
    // an eq-delete MERGE commits an `upsert` snapshot: matched keys
    // land in a key object, no data file is rewritten — the feed
    // surfaces them as delete(old)+insert(new)
    spark.sql("""MERGE INTO mcd.ns1.usrc t
                 USING (
                   SELECT id, id % 3 AS k, CAST(id AS DOUBLE) * 10 AS v
                   FROM range(0, 50)
                   UNION ALL
                   SELECT id, id % 3, CAST(id AS DOUBLE)
                   FROM range(1000, 1050)) s
                 ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(refresh("umv") == "cdc")
    assert(rows("umv", "k, n, np, total") == truth("usrc"))
    // freshness restored by the CDC refresh: an aggregate over the
    // SOURCE must be served from the view
    val q = spark.sql(
      "SELECT k, count(*) AS n FROM mcd.ns1.usrc GROUP BY k ORDER BY k")
    val servedByMv = q.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name().endsWith(".umv") => r
    }.nonEmpty
    assert(servedByMv, q.queryExecution.optimizedPlan.treeString)
  }

  test("net-zero maintenance rewrites are skipped by segmentation: " +
      "compaction in range keeps min/max views incremental") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcd.ns1")
    spark.sql("CREATE TABLE mcd.ns1.zsrc (id BIGINT, k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO mcd.ns1.zsrc
                 SELECT id, id % 4, CAST(id AS DOUBLE) / 4
                 FROM range(0, 2000, 1, 4)""")
    // a MIN/MAX view — retraction-incapable, so before segmentation
    // ANY non-additive op in range forced a full recompute
    call("""CALL mcd.system.create_materialized_view(
              namespace => 'ns1', name => 'zmv',
              source_namespace => 'ns1', source_table => 'zsrc',
              group_by => 'k',
              aggs => 'n:count:1;mn:min:v;mx:max:v')""")
    def ztruth() = spark.sql(
      """SELECT k, count(*) AS n, min(v) AS mn, max(v) AS mx
         FROM mcd.ns1.zsrc GROUP BY k ORDER BY k""")
      .collect().map(_.toString).toSeq
    def zrows() = spark.sql(
      "SELECT k, n, mn, mx FROM mcd.ns1.zmv ORDER BY k")
      .collect().map(_.toString).toSeq

    // [append, compact, append]: the compaction is net-zero and must
    // be SKIPPED — both append runs read as file deltas, the mode
    // stays incremental even though min/max cannot retract
    spark.sql("INSERT INTO mcd.ns1.zsrc VALUES (5001, 1, 600.25)")
    spark.sql("""CALL mcd.system.compact_table(
                   namespace => 'ns1', table => 'zsrc')""")
    spark.sql("INSERT INTO mcd.ns1.zsrc VALUES (5002, 9, -1.75)")
    assert(refresh("zmv") == "incremental")
    assert(zrows() == ztruth())

    // compaction-only range: nothing to do but advance the watermark
    spark.sql("""CALL mcd.system.compact_table(
                   namespace => 'ns1', table => 'zsrc')""")
    assert(refresh("zmv") == "incremental")
    assert(zrows() == ztruth())
    assert(refresh("zmv") == "noop")

    // [delete, compact] on the min/max view: the delete segment needs
    // retraction — the group-scoped recompute covers it (the trailing
    // compaction is still skipped as net-zero)
    spark.sql("DELETE FROM mcd.ns1.zsrc WHERE id % 5 = 0")
    spark.sql("""CALL mcd.system.compact_table(
                   namespace => 'ns1', table => 'zsrc')""")
    assert(refresh("zmv") == "groups")
    assert(zrows() == ztruth())

    // and on a RETRACTABLE view over the same source, a mixed
    // [append, delete, compact, append] range segments into
    // file-delta + feed + file-delta — cdc, state exact
    call("""CALL mcd.system.create_materialized_view(
              namespace => 'ns1', name => 'zmv2',
              source_namespace => 'ns1', source_table => 'zsrc',
              group_by => 'k', aggs => '""" + cdcAggs + "')")
    spark.sql("INSERT INTO mcd.ns1.zsrc VALUES (6001, 2, 7.5)")
    spark.sql("DELETE FROM mcd.ns1.zsrc WHERE id % 7 = 3")
    spark.sql("""CALL mcd.system.compact_table(
                   namespace => 'ns1', table => 'zsrc')""")
    spark.sql("INSERT INTO mcd.ns1.zsrc VALUES (6002, 2, 8.5)")
    assert(refresh("zmv2") == "cdc")
    assert(rows("zmv2", "k, n, np, total") == truth("zsrc"))
  }

  test("a concurrent BRANCH commit inside the global id range neither " +
      "leaks branch deletes into the feed nor corrupts the state") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcd.ns1")
    spark.sql("""CREATE TABLE mcd.ns1.bsrc (id BIGINT, k BIGINT, v DOUBLE)
                 TBLPROPERTIES ('graft.delete.mode' = 'merge-on-read')""")
    spark.sql("""INSERT INTO mcd.ns1.bsrc
                 SELECT id, id % 3, CAST(id AS DOUBLE) / 4
                 FROM range(0, 900, 1, 2)""")
    createMv("bsrc", "bmv")
    // main append, then a BRANCH delete (its snapshot id lands inside
    // the main refresh range — ids are global), then another main
    // append: the branch delete must be invisible to the view
    spark.sql("INSERT INTO mcd.ns1.bsrc VALUES (2001, 1, 5.25)")
    spark.sql("""CALL mcd.system.create_branch(
                   namespace => 'ns1', table => 'bsrc',
                   branch => 'audit')""")
    spark.sql("DELETE FROM mcd.ns1.`bsrc$branch_audit` WHERE k = 1")
    spark.sql("INSERT INTO mcd.ns1.bsrc VALUES (2002, 2, 6.25)")
    val m = refresh("bmv")
    // the main chain is two appends — the branch delete is invisible
    // to the lineage walk, so the cheap path holds; what must NOT
    // happen is k=1's rows being retracted
    assert(m == "incremental", m)
    assert(rows("bmv", "k, n, np, total") == truth("bsrc"),
      "branch delete leaked into the main view state")
  }

  test("append-only ranges still take the cheaper incremental path " +
      "and the chain recovers after a CDC refresh") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcd.ns1")
    spark.sql("CREATE TABLE mcd.ns1.asrc (id BIGINT, k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO mcd.ns1.asrc
                 SELECT id, id % 4, CAST(id AS DOUBLE)
                 FROM range(0, 400, 1, 2)""")
    createMv("asrc", "amv")
    spark.sql("INSERT INTO mcd.ns1.asrc VALUES (900, 9, 1.5)")
    assert(refresh("amv") == "incremental")
    spark.sql("DELETE FROM mcd.ns1.asrc WHERE k = 9")
    assert(refresh("amv") == "cdc")
    spark.sql("INSERT INTO mcd.ns1.asrc VALUES (901, 2, 2.5)")
    assert(refresh("amv") == "incremental")
    assert(rows("amv", "k, n, np, total") == truth("asrc"))
  }
}
