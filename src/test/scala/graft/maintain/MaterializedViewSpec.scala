package graft.maintain

import java.nio.file.Files

import graft.spark.GraftCatalog
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Incrementally-maintained materialized views: the stored state after
  * any refresh sequence must EQUAL a from-scratch aggregate of the
  * source, the refresh mode must be `incremental` exactly when the
  * snapshot range is purely additive, and the watermark must make
  * back-to-back refreshes no-ops.
  */
class MaterializedViewSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-mv").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.mvc", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.mvc.warehouse", warehouse)
    .getOrCreate()

  private def call(sqlText: String) =
    spark.sql(sqlText).collect().map(r => r.getString(0) -> r.getLong(1)).head

  private def mvRows() = spark.sql(
    "SELECT k, n, total, mn, mx FROM mvc.ns1.mv ORDER BY k")
    .collect().map(_.toString).toSeq

  // truth MUST compute with the rewrite off — a fresh view would
  // otherwise SERVE this source aggregate, comparing the state to
  // itself instead of to a from-scratch recompute
  private def truth() = {
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try spark.sql(
      """SELECT k, count(*) AS n,
              sum(CAST(v AS DECIMAL(18,2))) AS total,
              min(v) AS mn, max(v) AS mx
         FROM mvc.ns1.src GROUP BY k ORDER BY k""")
      .collect().map(_.toString).toSeq
    finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
  }

  test("create computes the full aggregate; incremental refresh merges " +
      "the delta only; non-additive falls back to full") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvc.ns1")
    spark.sql("CREATE TABLE mvc.ns1.src (k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO mvc.ns1.src
                 SELECT id % 7, CAST(id AS DOUBLE) / 4
                 FROM range(0, 10000, 1, 4)""")
    val created = call(
      """CALL mvc.system.create_materialized_view(
           namespace => 'ns1', name => 'mv',
           source_namespace => 'ns1', source_table => 'src',
           group_by => 'k',
           aggs => 'n:count:1;total:sum:CAST(v AS DECIMAL(18,2));mn:min:v;mx:max:v')""")
    assert(created == ("full", 7L))
    assert(mvRows() == truth())

    // append-only delta: refresh must take the INCREMENTAL path and
    // still equal the from-scratch aggregate (exact decimal sums)
    spark.sql("""INSERT INTO mvc.ns1.src
                 SELECT id % 11, CAST(id AS DOUBLE) / 8
                 FROM range(10000, 14000, 1, 2)""")
    val r1 = call("""CALL mvc.system.refresh_materialized_view(
                       namespace => 'ns1', name => 'mv')""")
    assert(r1 == ("incremental", 11L), r1.toString)
    assert(mvRows() == truth())

    // watermark: nothing new → noop, state untouched
    val r2 = call("""CALL mvc.system.refresh_materialized_view(
                       namespace => 'ns1', name => 'mv')""")
    assert(r2._1 == "noop")
    assert(mvRows() == truth())

    // a DELETE breaks additivity: min/max cannot retract from the
    // feed, so refresh re-aggregates ONLY the touched groups from the
    // source (group-scoped recompute) and the state still equals the
    // from-scratch aggregate
    spark.sql("DELETE FROM mvc.ns1.src WHERE v > 2000")
    val r3 = call("""CALL mvc.system.refresh_materialized_view(
                       namespace => 'ns1', name => 'mv')""")
    assert(r3._1 == "groups", r3.toString)
    assert(mvRows() == truth())

    // and the chain recovers: the next append is incremental again
    spark.sql("INSERT INTO mvc.ns1.src VALUES (3, 9.75), (99, 1.25)")
    val r4 = call("""CALL mvc.system.refresh_materialized_view(
                       namespace => 'ns1', name => 'mv')""")
    assert(r4 == ("incremental", 12L), r4.toString)
    assert(mvRows() == truth())
  }

  test("avg is refused with the sum/count decomposition hint") {
    val e = intercept[Exception] {
      MaterializedViews.parseAggs("a:avg:v")
    }
    assert(e.getMessage.contains("sum/count"))
  }
}
