package graft.maintain

import java.nio.file.Files

import graft.spark.GraftCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** JOIN materialized views: a view over an inner equi-join of two
  * sources maintains by the two-sided delta rule
  * Δ(A⋈B) = ΔA⋈B_cur + A_prev⋈ΔB — an append to EITHER side refreshes
  * at delta-join cost — the state always equals a from-scratch join
  * aggregate. Retraction on either side takes the SIGNED bilinear rule
  * when every aggregate retracts (count/sum + companion counts) and
  * falls back to full otherwise; the transparent rewrite serves
  * join-aggregate queries exactly when the shape and both watermarks
  * match.
  */
class JoinMvSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-jmv").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.jmv", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.jmv.warehouse", warehouse)
    .getOrCreate()

  private def call(sqlText: String) =
    spark.sql(sqlText).collect().map(r => r.getString(0) -> r.getLong(1)).head

  private def refresh(): String = call(
    """CALL jmv.system.refresh_materialized_view(
         namespace => 'ns1', name => 'mv')""")._1

  private def state(): Seq[String] = spark.sql(
    "SELECT seg, n, total FROM jmv.ns1.mv ORDER BY seg")
    .collect().map(_.toString).toSeq

  // truth MUST compute with the rewrite off — a fresh view would
  // otherwise SERVE this join aggregate, comparing the state to
  // itself instead of to a from-scratch recompute
  private def truth(): Seq[String] = {
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try spark.sql(
      """SELECT seg, count(*) AS n,
              sum(CAST(amt AS DECIMAL(18,2))) AS total
         FROM jmv.ns1.fact JOIN jmv.ns1.dim ON cid = did
         GROUP BY seg ORDER BY seg""")
      .collect().map(_.toString).toSeq
    finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
  }

  private def usesMv(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name().endsWith(".mv") => r
    }.nonEmpty

  private def check(sql: String, expectMv: Boolean): Unit = {
    val on = spark.sql(sql)
    assert(usesMv(on) == expectMv,
      s"expected usesMv=$expectMv for: $sql\n" +
        on.queryExecution.optimizedPlan.treeString)
    val rowsOn = on.collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val rowsOff = try
      spark.sql(sql).collect().map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    assert(rowsOn == rowsOff, s"rewrite changed results for: $sql")
  }

  test("two-sided incremental maintenance, full fallback on " +
      "retraction, and compaction skipping") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS jmv.ns1")
    spark.sql("CREATE TABLE jmv.ns1.fact (fid BIGINT, cid BIGINT, amt DOUBLE)")
    spark.sql("CREATE TABLE jmv.ns1.dim (did BIGINT, seg STRING)")
    spark.sql("""INSERT INTO jmv.ns1.fact
                 SELECT id, id % 40, CAST(id AS DOUBLE) / 4
                 FROM range(0, 4000, 1, 4)""")
    spark.sql("""INSERT INTO jmv.ns1.dim
                 SELECT id, CASE WHEN id % 3 = 0 THEN 'a'
                                 WHEN id % 3 = 1 THEN 'b' ELSE 'c' END
                 FROM range(0, 30, 1, 2)""")
    val created = call(
      """CALL jmv.system.create_materialized_view(
           namespace => 'ns1', name => 'mv',
           source_namespace => 'ns1', source_table => 'fact',
           group_by => 'seg',
           aggs => 'n:count:1;total:sum:CAST(amt AS DECIMAL(18,2))',
           join_namespace => 'ns1', join_table => 'dim',
           join_on => 'cid=did')""")
    assert(created._1 == "full")
    assert(state() == truth())

    // fact-side append: ΔA ⋈ B_cur only
    spark.sql("""INSERT INTO jmv.ns1.fact
                 SELECT id, id % 40, CAST(id AS DOUBLE) / 8
                 FROM range(4000, 5000, 1, 2)""")
    assert(refresh() == "incremental")
    assert(state() == truth())

    // dim-side append: A_prev ⋈ ΔB — dim keys 30..39 existed in fact
    // all along; their groups appear only now
    spark.sql("""INSERT INTO jmv.ns1.dim
                 SELECT id, 'd' FROM range(30, 40, 1, 2)""")
    assert(refresh() == "incremental")
    assert(state() == truth())

    // both sides in one range: both delta terms in one refresh
    spark.sql("INSERT INTO jmv.ns1.fact VALUES (9001, 40, 2.5)")
    spark.sql("INSERT INTO jmv.ns1.dim VALUES (40, 'a')")
    assert(refresh() == "incremental")
    assert(state() == truth())
    assert(refresh() == "noop")

    // compaction on either side is net-zero: still incremental
    spark.sql("""CALL jmv.system.compact_table(
                   namespace => 'ns1', table => 'fact')""")
    spark.sql("INSERT INTO jmv.ns1.fact VALUES (9002, 40, 3.5)")
    assert(refresh() == "incremental")
    assert(state() == truth())

    // retraction on the DIM side: full fallback, state still exact
    spark.sql("DELETE FROM jmv.ns1.dim WHERE did = 40")
    assert(refresh() == "full")
    assert(state() == truth())

    // and the chain recovers
    spark.sql("INSERT INTO jmv.ns1.fact VALUES (9003, 7, 4.5)")
    assert(refresh() == "incremental")
    assert(state() == truth())
  }

  test("retractions on either side take the SIGNED bilinear cdc path " +
      "when every aggregate retracts") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS jmv.ns3")
    spark.sql("CREATE TABLE jmv.ns3.fact (fid BIGINT, cid BIGINT, amt DOUBLE)")
    spark.sql("CREATE TABLE jmv.ns3.dim (did BIGINT, seg STRING)")
    spark.sql("""INSERT INTO jmv.ns3.fact
                 SELECT id, id % 12, CAST(id AS DOUBLE) / 2
                 FROM range(0, 3000, 1, 4)""")
    spark.sql("""INSERT INTO jmv.ns3.dim
                 SELECT id, concat('s', id % 4) FROM range(0, 12, 1, 2)""")
    // companion counts make the aggregate set retractable
    call("""CALL jmv.system.create_materialized_view(
              namespace => 'ns3', name => 'mv3',
              source_namespace => 'ns3', source_table => 'fact',
              group_by => 'seg',
              aggs => 'n:count:1;np:count:CAST(amt AS DECIMAL(18,2));total:sum:CAST(amt AS DECIMAL(18,2))',
              join_namespace => 'ns3', join_table => 'dim',
              join_on => 'cid=did')""")
    def refresh3(): String = call(
      """CALL jmv.system.refresh_materialized_view(
           namespace => 'ns3', name => 'mv3')""")._1
    def state3(): Seq[String] = spark.sql(
      "SELECT seg, n, np, total FROM jmv.ns3.mv3 ORDER BY seg")
      .collect().map(_.toString).toSeq
    def truth3(): Seq[String] = {
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try spark.sql(
        """SELECT seg, count(*) AS n,
                  count(CAST(amt AS DECIMAL(18,2))) AS np,
                  sum(CAST(amt AS DECIMAL(18,2))) AS total
           FROM jmv.ns3.fact JOIN jmv.ns3.dim ON cid = did
           GROUP BY seg ORDER BY seg""")
        .collect().map(_.toString).toSeq
      finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
    }

    // FACT-side delete: signed ΔA ⋈ B_cur
    spark.sql("DELETE FROM jmv.ns3.fact WHERE fid % 11 = 4")
    assert(refresh3() == "cdc")
    assert(state3() == truth3())

    // FACT-side update (retract old + insert new through the feed)
    spark.sql("""UPDATE jmv.ns3.fact SET amt = amt + 1
                 WHERE fid % 13 = 2""")
    assert(refresh3() == "cdc")
    assert(state3() == truth3())

    // DIM-side delete: A_prev ⋈ ΔB_signed — every fact of the deleted
    // dim keys retracts; a group whose dim rows all vanish is DELETED
    spark.sql("DELETE FROM jmv.ns3.dim WHERE did IN (3, 7, 11)")
    assert(refresh3() == "cdc")
    assert(state3() == truth3())
    assert(!state3().exists(_.contains("s3")),
      "the group whose dim rows vanished must drop out: " + state3())

    // MIXED range: appends AND a delete across both sides in one
    // refresh — all four bilinear terms in one signed merge
    spark.sql("INSERT INTO jmv.ns3.fact VALUES (9001, 2, 4.5)")
    spark.sql("DELETE FROM jmv.ns3.fact WHERE fid % 29 = 1")
    spark.sql("INSERT INTO jmv.ns3.dim VALUES (12, 's0')")
    assert(refresh3() == "cdc")
    assert(state3() == truth3())
  }

  test("the rewrite serves join-aggregate queries exactly when shape " +
      "and freshness match") {
    // state from the previous test is fresh after its last refresh
    check("""SELECT seg, count(*) AS n,
                    sum(CAST(amt AS DECIMAL(18,2))) AS total
             FROM jmv.ns1.fact JOIN jmv.ns1.dim ON cid = did
             GROUP BY seg""", expectMv = true)
    // either join orientation
    check("""SELECT seg, count(*) AS n
             FROM jmv.ns1.dim JOIN jmv.ns1.fact ON did = cid
             GROUP BY seg""", expectMv = true)
    // global aggregate over the join
    check("""SELECT count(*) AS n
             FROM jmv.ns1.fact JOIN jmv.ns1.dim ON cid = did""",
      expectMv = true)
    // key-filtered (seg is the view key)
    check("""SELECT seg, count(*) AS n
             FROM jmv.ns1.fact JOIN jmv.ns1.dim ON cid = did
             WHERE seg = 'a' GROUP BY seg""", expectMv = true)
    // WRONG join pairs: not this view's shape
    check("""SELECT seg, count(*) AS n
             FROM jmv.ns1.fact JOIN jmv.ns1.dim ON fid = did
             GROUP BY seg""", expectMv = false)
    // extra non-key filter: not covered
    check("""SELECT seg, count(*) AS n
             FROM jmv.ns1.fact JOIN jmv.ns1.dim ON cid = did
             WHERE amt > 100 GROUP BY seg""", expectMv = false)
    // bare single-table aggregate: the join view must NOT serve it
    check("SELECT count(*) AS n FROM jmv.ns1.fact", expectMv = false)
    // stale on one side: append to dim without refresh → decline
    spark.sql("INSERT INTO jmv.ns1.dim VALUES (41, 'e')")
    check("""SELECT seg, count(*) AS n
             FROM jmv.ns1.fact JOIN jmv.ns1.dim ON cid = did
             GROUP BY seg""", expectMv = false)
    assert(refresh() == "incremental")
    check("""SELECT seg, count(*) AS n
             FROM jmv.ns1.fact JOIN jmv.ns1.dim ON cid = did
             GROUP BY seg""", expectMv = true)
  }

  test("a FILTERED join view composes both features: the predicate " +
      "applies to every delta term and the rewrite requires it") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS jmv.ns2")
    spark.sql("CREATE TABLE jmv.ns2.f (fid BIGINT, cid BIGINT, amt DOUBLE)")
    spark.sql("CREATE TABLE jmv.ns2.d (did BIGINT, seg STRING)")
    spark.sql("""INSERT INTO jmv.ns2.f
                 SELECT id, id % 10, CAST(id AS DOUBLE) / 4
                 FROM range(0, 2000, 1, 2)""")
    spark.sql("""INSERT INTO jmv.ns2.d
                 SELECT id, CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END
                 FROM range(0, 10, 1, 2)""")
    spark.sql("""CALL jmv.system.create_materialized_view(
                   namespace => 'ns2', name => 'mv',
                   source_namespace => 'ns2', source_table => 'f',
                   group_by => 'seg',
                   aggs => 'n:count:1;total:sum:CAST(amt AS DECIMAL(18,2))',
                   where => 'amt > 100',
                   join_namespace => 'ns2', join_table => 'd',
                   join_on => 'cid=did')""")
    def refresh2(): String = call(
      """CALL jmv.system.refresh_materialized_view(
           namespace => 'ns2', name => 'mv')""")._1
    def truth2(): Seq[String] = spark.sql(
      """SELECT seg, count(*) AS n,
                sum(CAST(amt AS DECIMAL(18,2))) AS total
         FROM jmv.ns2.f JOIN jmv.ns2.d ON cid = did
         WHERE amt > 100 GROUP BY seg ORDER BY seg""")
      .collect().map(_.toString).toSeq
    def state2(): Seq[String] = spark.sql(
      "SELECT seg, n, total FROM jmv.ns2.mv ORDER BY seg")
      .collect().map(_.toString).toSeq
    assert(state2() == truth2())
    // deltas on both sides, each restricted by the predicate
    spark.sql("""INSERT INTO jmv.ns2.f VALUES
                 (9001, 3, 500.25), (9002, 3, 1.25)""")
    spark.sql("INSERT INTO jmv.ns2.d VALUES (10, 'z')")
    assert(refresh2() == "incremental")
    assert(state2() == truth2())
    // the rewrite needs the join shape AND the predicate conjunct
    val q1 = spark.sql(
      """SELECT seg, count(*) AS n
         FROM jmv.ns2.f JOIN jmv.ns2.d ON cid = did
         WHERE amt > 100 GROUP BY seg""")
    assert(usesMv(q1), q1.queryExecution.optimizedPlan.treeString)
    val q2 = spark.sql(
      """SELECT seg, count(*) AS n
         FROM jmv.ns2.f JOIN jmv.ns2.d ON cid = did GROUP BY seg""")
    assert(!usesMv(q2), "missing predicate must decline")
  }

  test("$views lists derived views with rewrite-grade freshness") {
    val rows = spark.sql(
      """SELECT view_name, source, join_source, fresh
         FROM jmv.ns2.`f$views`""").collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getString(0) == "mv" && r.getString(1) == "ns2.f" &&
      r.getString(2) == "ns2.d" && r.getBoolean(3), r.toString)
    // an unrefreshed append on EITHER source flips freshness off; a
    // refresh restores it
    spark.sql("INSERT INTO jmv.ns2.d VALUES (11, 'y')")
    assert(!spark.sql("SELECT fresh FROM jmv.ns2.`f$views`")
      .head.getBoolean(0))
    assert(call("""CALL jmv.system.refresh_materialized_view(
                     namespace => 'ns2', name => 'mv')""")._1 == "incremental")
    assert(spark.sql("SELECT fresh FROM jmv.ns2.`f$views`")
      .head.getBoolean(0))
    // the registry is visible from BOTH sources
    assert(spark.sql("SELECT view_name FROM jmv.ns2.`d$views`")
      .head.getString(0) == "mv")
  }

  test("drop deregisters the view from BOTH sources") {
    spark.sql("""CALL jmv.system.drop_materialized_view(
                   namespace => 'ns1', name => 'mv')""")
    def derived(t: String): String = {
      val props = spark.sql(s"SHOW TBLPROPERTIES jmv.ns1.$t")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      props.getOrElse("graft.mv.derived", "")
    }
    assert(!derived("fact").contains("ns1.mv"))
    assert(!derived("dim").contains("ns1.mv"))
    // and queries still run from source
    check("""SELECT seg, count(*) AS n
             FROM jmv.ns1.fact JOIN jmv.ns1.dim ON cid = did
             GROUP BY seg""", expectMv = false)
  }
}
