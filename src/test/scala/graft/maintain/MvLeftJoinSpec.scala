package graft.maintain

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.GraftCatalog

/** LEFT-join materialized views: the view aggregates A ⟕ B with
  * null-extension for unmatched facts. Fact-side appends refresh
  * unsigned (ΔA ⟕ B_cur); a RIGHT-side append additionally RETRACTS
  * the null-extended contribution of facts that just gained their
  * first match — Δ(A⟕B) = ΔA⟕B_cur + A_prev⋈ΔB −
  * nullext((A_prev⋉ΔB)▷B_prev) — which needs the counting-algorithm
  * aggregate class; aggregate sets that cannot retract fall back to a
  * full recompute rather than silently drifting.
  */
class MvLeftJoinSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-mvlj").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.mlj", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.mlj.warehouse", warehouse)
    .getOrCreate()

  private def rows(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.toString).sorted.toSeq

  private def noRewrite[T](f: => T): T = {
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try f finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
  }

  private def truth(ns: String): Seq[String] = noRewrite(rows(
    s"""SELECT grp, count(*) AS n,
              count(CAST(v AS DECIMAL(18,2))) AS nv,
              sum(CAST(v AS DECIMAL(18,2))) AS total
        FROM mlj.$ns.fact LEFT JOIN mlj.$ns.dim ON ref = dref
        GROUP BY grp"""))

  private def state(ns: String): Seq[String] =
    rows(s"SELECT grp, n, nv, total FROM mlj.$ns.mv")

  private def setup(ns: String): Unit = {
    spark.sql(s"CREATE NAMESPACE mlj.$ns")
    spark.sql(s"CREATE TABLE mlj.$ns.fact (k BIGINT, ref BIGINT, v DOUBLE)")
    spark.sql(s"CREATE TABLE mlj.$ns.dim (dref BIGINT, grp STRING)")
    // refs 0..9; the dim knows only 0..5 → refs 6..9 null-extend
    spark.sql(s"""INSERT INTO mlj.$ns.fact
                  SELECT id, id % 10, CAST(id AS DOUBLE)
                  FROM range(0, 2000, 1, 2)""")
    spark.sql(s"""INSERT INTO mlj.$ns.dim
                  SELECT id, concat('g', id % 3) FROM range(0, 6, 1, 1)""")
  }

  test("fact appends refresh unsigned; a dim append retracts the " +
      "null-extension via signed partials; state tracks truth") {
    setup("ns1")
    spark.sql("""CREATE MATERIALIZED VIEW mlj.ns1.mv AS
                 SELECT grp, count(*) AS n,
                        count(CAST(v AS DECIMAL(18,2))) AS nv,
                        sum(CAST(v AS DECIMAL(18,2))) AS total
                 FROM mlj.ns1.fact LEFT JOIN mlj.ns1.dim
                   ON fact.ref = dim.dref
                 GROUP BY grp""")
    assert(state("ns1") == truth("ns1"))
    // the unmatched facts really are in the view (NULL group row)
    assert(noRewrite(spark.sql(
      "SELECT n FROM mlj.ns1.mv WHERE grp IS NULL").head.getLong(0)) > 0)

    // fact-side append: unsigned delta, left-joined against dim
    spark.sql("""INSERT INTO mlj.ns1.fact
                 SELECT id, id % 10, CAST(id AS DOUBLE) + 0.25
                 FROM range(2000, 3000, 1, 2)""")
    val m1 = spark.sql("REFRESH MATERIALIZED VIEW mlj.ns1.mv")
      .head.getString(0)
    assert(m1 == "incremental", m1)
    assert(state("ns1") == truth("ns1"))

    // dim-side append: refs 6..7 gain their FIRST match — the signed
    // delta must retract their null-extended rows and insert them
    // under the new groups
    val nullBefore = noRewrite(spark.sql(
      "SELECT n FROM mlj.ns1.mv WHERE grp IS NULL").head.getLong(0))
    spark.sql("""INSERT INTO mlj.ns1.dim VALUES (6, 'g0'), (7, 'g1')""")
    val m2 = spark.sql("REFRESH MATERIALIZED VIEW mlj.ns1.mv")
      .head.getString(0)
    assert(m2 == "incremental", m2)
    assert(state("ns1") == truth("ns1"))
    val nullAfter = noRewrite(spark.sql(
      "SELECT n FROM mlj.ns1.mv WHERE grp IS NULL").head.getLong(0))
    assert(nullAfter < nullBefore,
      s"null-extension must shrink: $nullBefore -> $nullAfter")

    // both sides at once stays incremental and exact
    spark.sql("INSERT INTO mlj.ns1.fact VALUES (90001, 8, 7.5)")
    spark.sql("INSERT INTO mlj.ns1.dim VALUES (8, 'g2')")
    val m3 = spark.sql("REFRESH MATERIALIZED VIEW mlj.ns1.mv")
      .head.getString(0)
    assert(m3 == "incremental", m3)
    assert(state("ns1") == truth("ns1"))

    // a FACT-side delete with the dim unchanged rides the signed
    // bilinear path (ΔA_signed ⟕ B_cur): feed cost, not a recompute
    spark.sql("DELETE FROM mlj.ns1.fact WHERE k % 17 = 3")
    val m4 = spark.sql("REFRESH MATERIALIZED VIEW mlj.ns1.mv")
      .head.getString(0)
    assert(m4 == "cdc", m4)
    assert(state("ns1") == truth("ns1"))

    // a DIM-side delete rides the signed path too: the matched
    // contributions retract via A_prev ⋈ ΔB_signed, and facts whose
    // LAST match vanished regain their null-extended contribution via
    // the flip term +nullext(touched ⋉ B_prev ▷ B_cur) — feed-scoped,
    // never a recompute
    val nullBefore2 = noRewrite(spark.sql(
      "SELECT n FROM mlj.ns1.mv WHERE grp IS NULL").head.getLong(0))
    spark.sql("DELETE FROM mlj.ns1.dim WHERE dref = 0")
    val m5 = spark.sql("REFRESH MATERIALIZED VIEW mlj.ns1.mv")
      .head.getString(0)
    assert(m5 == "cdc", m5)
    assert(state("ns1") == truth("ns1"))
    val nullAfter2 = noRewrite(spark.sql(
      "SELECT n FROM mlj.ns1.mv WHERE grp IS NULL").head.getLong(0))
    assert(nullAfter2 > nullBefore2,
      s"orphaned facts must re-null-extend: $nullBefore2 -> $nullAfter2")

    // dim delete + re-insert of the same key in ONE range: match
    // state flips nowhere (B_prev ⋉ and B_cur ⋉ both hold), only the
    // matched contribution moves groups — still cdc, still exact
    spark.sql("DELETE FROM mlj.ns1.dim WHERE dref = 1")
    spark.sql("INSERT INTO mlj.ns1.dim VALUES (1, 'g2')")
    val m6 = spark.sql("REFRESH MATERIALIZED VIEW mlj.ns1.mv")
      .head.getString(0)
    assert(m6 == "cdc", m6)
    assert(state("ns1") == truth("ns1"))

    // the rewrite serves the left-join aggregate and declines the
    // inner-join one (different content: no null-extension)
    def servedBy(sql: String): Boolean =
      spark.sql(sql).queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
            if r.relation.table.name().endsWith(".mv") => r
      }.nonEmpty
    assert(servedBy(
      """SELECT grp, count(*) AS n
         FROM mlj.ns1.fact LEFT JOIN mlj.ns1.dim ON ref = dref
         GROUP BY grp"""))
    assert(!servedBy(
      """SELECT grp, count(*) AS n
         FROM mlj.ns1.fact JOIN mlj.ns1.dim ON ref = dref
         GROUP BY grp"""))
    // a filter UNDER the right side of a LEFT join changes the
    // null-extension semantics (rows it drops null-extend instead of
    // disappearing) — never served
    assert(!servedBy(
      """SELECT grp, count(*) AS n
         FROM mlj.ns1.fact LEFT JOIN
           (SELECT * FROM mlj.ns1.dim WHERE grp <> 'g0') d
           ON ref = dref
         GROUP BY grp"""))
    // `joinkey IS NOT NULL` is inner-join-implied but NOT left-join
    // implied (null-keyed facts live null-extended in the view) — it
    // stays a real residual filter and declines
    assert(!servedBy(
      """SELECT grp, count(*) AS n
         FROM mlj.ns1.fact LEFT JOIN mlj.ns1.dim ON ref = dref
         WHERE ref IS NOT NULL GROUP BY grp"""))
  }

  test("a dim append on a min/max left view cannot retract — it " +
      "recomputes fully instead of drifting") {
    setup("ns2")
    spark.sql("""CALL mlj.system.create_materialized_view(
                   namespace => 'ns2', name => 'mv2',
                   source_namespace => 'ns2', source_table => 'fact',
                   group_by => 'grp',
                   aggs => 'n:count:1;mx:max:v',
                   join_namespace => 'ns2', join_table => 'dim',
                   join_on => 'ref=dref', join_type => 'left')""")
    // fact appends stay incremental even for min/max (unsigned path)
    spark.sql("INSERT INTO mlj.ns2.fact VALUES (5000, 3, 99999.0)")
    val m1 = spark.sql("""CALL mlj.system.refresh_materialized_view(
                            namespace => 'ns2', name => 'mv2')""")
      .head.getString(0)
    assert(m1 == "incremental", m1)
    // a dim append needs retraction → full recompute for min/max
    spark.sql("INSERT INTO mlj.ns2.dim VALUES (9, 'g1')")
    val m2 = spark.sql("""CALL mlj.system.refresh_materialized_view(
                            namespace => 'ns2', name => 'mv2')""")
      .head.getString(0)
    assert(m2 == "full", m2)
    val st = rows("SELECT grp, n, mx FROM mlj.ns2.mv2")
    val tr = noRewrite(rows(
      """SELECT grp, count(*) AS n, max(v) AS mx
         FROM mlj.ns2.fact LEFT JOIN mlj.ns2.dim ON ref = dref
         GROUP BY grp"""))
    assert(st == tr)
  }
}
