package graft.maintain

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.GraftCatalog

/** Distinct-count materialized views with MERGEABLE sketch state: an
  * `hll` aggregate stores a Datasketches HLL sketch per group, partial
  * sketches union on every incremental refresh, and the rewrite serves
  * `approx_count_distinct` (always) and `count(DISTINCT ...)` (session
  * opt-in, never silently) from the stored sketch.
  */
class MvSketchSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-mvsk").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.msk", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.msk.warehouse", warehouse)
    .getOrCreate()

  private def usesMv(sql: String): Boolean =
    spark.sql(sql).queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name().endsWith(".mv") => r
    }.nonEmpty

  test("hll state refreshes by sketch union, survives the group-scoped " +
      "path, and the rewrite serves approx/opted-in distinct counts") {
    spark.sql("CREATE NAMESPACE msk.ns1")
    spark.sql("CREATE TABLE msk.ns1.src (k BIGINT NOT NULL, u BIGINT)")
    // ~150 distinct u per group: small enough that the HLL sketch is
    // in exact (coupon) range, so estimates equal exact counts and the
    // assertions below are deterministic
    spark.sql("""INSERT INTO msk.ns1.src
                 SELECT id % 3, id % 150 FROM range(0, 2000, 1, 2)""")
    spark.sql("""CREATE MATERIALIZED VIEW msk.ns1.mv AS
                 SELECT k, count(*) AS n,
                        approx_count_distinct(u) AS nd
                 FROM msk.ns1.src GROUP BY k""")
    val cols = spark.table("msk.ns1.mv").columns.toSeq
    assert(cols == Seq("k", "n", "nd_hll"), cols.toString)

    def estimates(): Map[Long, Long] = spark.sql(
      """SELECT k, hll_sketch_estimate(nd_hll) FROM msk.ns1.mv""")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def exact(): Map[Long, Long] = {
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try spark.sql(
        """SELECT k, count(DISTINCT u) FROM msk.ns1.src GROUP BY k""")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
    }
    assert(estimates() == exact())

    // append with NEW distinct values: the refresh unions the delta's
    // partial sketches into the stored ones (incremental, mode-pinned)
    spark.sql("""INSERT INTO msk.ns1.src
                 SELECT id % 3, 1000 + id % 80 FROM range(0, 900, 1, 2)""")
    val m1 = spark.sql("REFRESH MATERIALIZED VIEW msk.ns1.mv")
      .head.getString(0)
    assert(m1 == "incremental", m1)
    assert(estimates() == exact())

    // sketches cannot retract: a delete takes the group-scoped
    // recompute and rebuilds the touched groups' sketches
    spark.sql("DELETE FROM msk.ns1.src WHERE u >= 1000 AND k = 1")
    val m2 = spark.sql("REFRESH MATERIALIZED VIEW msk.ns1.mv")
      .head.getString(0)
    assert(m2 == "groups", m2)
    assert(estimates() == exact())

    // approx_count_distinct over the source is served from the sketch
    assert(usesMv(
      "SELECT k, approx_count_distinct(u) AS nd FROM msk.ns1.src GROUP BY k"))
    // ... but a query asking for a TIGHTER rsd than the stored
    // sketch's expected error (default lgConfigK=12 → ~1.63%) must
    // decline rather than silently serve a looser estimate
    assert(!usesMv("""SELECT k, approx_count_distinct(u, 0.005) AS nd
                      FROM msk.ns1.src GROUP BY k"""),
      "a tighter-rsd ask must not be served from the default sketch")
    assert(usesMv("""SELECT k, approx_count_distinct(u, 0.05) AS nd
                     FROM msk.ns1.src GROUP BY k"""))
    // exact count(DISTINCT) only under the explicit session opt-in
    val distinctQ =
      "SELECT k, count(DISTINCT u) AS nd FROM msk.ns1.src GROUP BY k"
    assert(!usesMv(distinctQ),
      "count(DISTINCT) must NOT be served approximately by default")
    spark.conf.set("spark.graft.mv.rewrite.approx-distinct", "true")
    try {
      assert(usesMv(distinctQ))
      val served = spark.sql(distinctQ + " ORDER BY k")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(served == exact())
    } finally
      spark.conf.unset("spark.graft.mv.rewrite.approx-distinct")
  }

  test("the procedure path takes hll specs and cdc-maintainable " +
      "companions stay signed while sketches rebuild group-scoped") {
    spark.sql("CREATE NAMESPACE msk.ns2")
    spark.sql("CREATE TABLE msk.ns2.src (k BIGINT NOT NULL, u BIGINT)")
    spark.sql("""INSERT INTO msk.ns2.src
                 SELECT id % 4, id % 60 FROM range(0, 800, 1, 2)""")
    spark.sql("""CALL msk.system.create_materialized_view(
                   namespace => 'ns2', name => 'mv',
                   source_namespace => 'ns2', source_table => 'src',
                   group_by => 'k',
                   aggs => 'n:count:1;nd:hll:u')""")
    spark.sql("""INSERT INTO msk.ns2.src
                 SELECT id % 4, 500 + id % 25 FROM range(0, 300, 1, 2)""")
    spark.sql("""CALL msk.system.refresh_materialized_view(
                   namespace => 'ns2', name => 'mv')""").collect()
    val est = spark.sql(
      """SELECT k, hll_sketch_estimate(nd) FROM msk.ns2.mv ORDER BY k""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val ex = try spark.sql(
      """SELECT k, count(DISTINCT u) FROM msk.ns2.src GROUP BY k ORDER BY k""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
    assert(est == ex)
  }

  test("a DECLARED rsd sizes the stored sketch and widens what the " +
      "rewrite may serve — never tighter than declared") {
    spark.sql("CREATE NAMESPACE msk.ns4")
    spark.sql("CREATE TABLE msk.ns4.src (k BIGINT NOT NULL, u BIGINT)")
    spark.sql("""INSERT INTO msk.ns4.src
                 SELECT id % 3, id % 200 FROM range(0, 1500, 1, 2)""")
    // rsd 0.01 → lgConfigK 14 (1.04/sqrt(2^14) ≈ 0.81%)
    spark.sql("""CREATE MATERIALIZED VIEW msk.ns4.mv AS
                 SELECT k, count(*) AS n,
                        approx_count_distinct(u, 0.01) AS nd
                 FROM msk.ns4.src GROUP BY k""")
    def usesMv4(sql: String): Boolean =
      spark.sql(sql).queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
            if r.relation.table.name().endsWith("ns4.mv") => r
      }.nonEmpty
    // the spec round-trips with the declared size
    val cat = spark.sessionState.catalogManager.catalog("msk")
      .asInstanceOf[GraftCatalog]
    val aggsProp = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns4"), "mv"))
      .properties().get(MaterializedViews.AggsProp)
    assert(aggsProp.contains("hll@14"), aggsProp)
    // a 1% ask is now servable (the default-sized sketch declined it)
    assert(usesMv4("""SELECT k, approx_count_distinct(u, 0.01) AS nd
                      FROM msk.ns4.src GROUP BY k"""))
    assert(usesMv4("""SELECT k, approx_count_distinct(u) AS nd
                      FROM msk.ns4.src GROUP BY k"""))
    // ... but an ask TIGHTER than the declared precision still
    // declines
    assert(!usesMv4("""SELECT k, approx_count_distinct(u, 0.005) AS nd
                       FROM msk.ns4.src GROUP BY k"""))
    // estimates stay exact in the coupon range through a refresh
    spark.sql("""INSERT INTO msk.ns4.src
                 SELECT id % 3, 300 + id % 50 FROM range(0, 300, 1, 2)""")
    val m = spark.sql("REFRESH MATERIALIZED VIEW msk.ns4.mv")
      .head.getString(0)
    assert(m == "incremental", m)
    val est = spark.sql(
      "SELECT k, hll_sketch_estimate(nd_hll) FROM msk.ns4.mv ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val ex = try spark.sql(
      """SELECT k, count(DISTINCT u) FROM msk.ns4.src
         GROUP BY k ORDER BY k""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
    assert(est == ex)
    // a COARSE declared sketch (rsd 0.2 → lgK 5, ~18% error) must not
    // be served for an EXACT count(DISTINCT) even under the session
    // opt-in — the opt-in consents to default precision, not to
    // whatever the loosest view stores
    spark.sql("CREATE NAMESPACE msk.ns5")
    spark.sql("CREATE TABLE msk.ns5.src (k BIGINT NOT NULL, u BIGINT)")
    spark.sql("""INSERT INTO msk.ns5.src
                 SELECT id % 3, id % 90 FROM range(0, 600, 1, 2)""")
    spark.sql("""CREATE MATERIALIZED VIEW msk.ns5.mv AS
                 SELECT k, count(*) AS n,
                        approx_count_distinct(u, 0.2) AS nd
                 FROM msk.ns5.src GROUP BY k""")
    def usesMv5(sql: String): Boolean =
      spark.sql(sql).queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
            if r.relation.table.name().endsWith("ns5.mv") => r
      }.nonEmpty
    // the coarse approximate ask IS served (0.2 >= declared)...
    assert(usesMv5("""SELECT k, approx_count_distinct(u, 0.2) AS nd
                      FROM msk.ns5.src GROUP BY k"""))
    spark.conf.set("spark.graft.mv.rewrite.approx-distinct", "true")
    try assert(!usesMv5("""SELECT k, count(DISTINCT u) AS nd
                           FROM msk.ns5.src GROUP BY k"""),
      "opted-in count(DISTINCT) must not ride a coarse sketch")
    finally spark.conf.unset("spark.graft.mv.rewrite.approx-distinct")
    // and an rsd the largest sketch cannot honor fails CREATE loudly
    val e = intercept[Exception](spark.sql(
      """CREATE MATERIALIZED VIEW msk.ns5.m2 AS
         SELECT k, approx_count_distinct(u, 0.0005) AS nd
         FROM msk.ns5.src GROUP BY k""").collect())
    assert(e.getMessage.contains("lgConfigK=21"), e.getMessage)
  }

  test("a BUCKETED sketch view survives deletes through the groups " +
      "path and the bucket-scoped fold with estimate == exact") {
    spark.sql("CREATE NAMESPACE msk.ns3")
    spark.sql("CREATE TABLE msk.ns3.src (k BIGINT NOT NULL, u BIGINT)")
    // 16 groups × ~120 distinct values: coupon-exact sketches
    spark.sql("""INSERT INTO msk.ns3.src
                 SELECT id % 16, id % 120 FROM range(0, 4000, 1, 2)""")
    spark.conf.set("spark.graft.mv.state.buckets", "8")
    try spark.sql("""CALL msk.system.create_materialized_view(
                       namespace => 'ns3', name => 'mv',
                       source_namespace => 'ns3', source_table => 'src',
                       group_by => 'k',
                       aggs => 'n:count:1;nd:hll:u')""")
    finally spark.conf.unset("spark.graft.mv.state.buckets")
    def estimates(): Map[Long, Long] = spark.sql(
      "SELECT k, hll_sketch_estimate(nd) FROM msk.ns3.mv")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def exact(): Map[Long, Long] = {
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try spark.sql(
        "SELECT k, count(DISTINCT u) FROM msk.ns3.src GROUP BY k")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
    }
    // deletes: sketches cannot retract → GROUP-SCOPED recompute whose
    // merge REPLACES the touched groups' sketches (equality deletes
    // accumulate on the bucketed state)
    spark.sql("DELETE FROM msk.ns3.src WHERE k = 5 AND u >= 60")
    val m1 = spark.sql("""CALL msk.system.refresh_materialized_view(
                            namespace => 'ns3', name => 'mv')""")
      .head.getString(0)
    assert(m1 == "groups", m1)
    assert(estimates() == exact())
    // the BUCKET-SCOPED fold applies those equality deletes by
    // rewriting only the touched buckets' files, carrying the rest
    // path-identical — the BINARY sketch column must survive the
    // rewrite byte-exact
    def files(): Set[String] = spark.sql(
      "SELECT path FROM msk.ns3.`mv$files`")
      .collect().map(_.getString(0)).toSet
    val before = files()
    val cat = spark.sessionState.catalogManager.catalog("msk")
      .asInstanceOf[GraftCatalog]
    val res = Maintenance.compactTouchedPartitions(spark, cat,
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns3"), "mv"))
    assert(res.nonEmpty, "the scoped fold must apply to bucketed state")
    val after = files()
    val carried = before.intersect(after).size
    val rewritten = after.diff(before).size
    assert(carried > 0 && rewritten <= 2,
      s"fold must carry untouched buckets: carried=$carried " +
        s"rewritten=$rewritten")
    val pending = spark.sql(
      "SELECT count(*) FROM msk.ns3.`mv$deletes`").head.getLong(0)
    assert(pending == 0L, s"fold must clear the deletes, got $pending")
    assert(estimates() == exact(),
      "sketch estimates diverged across the bucket-scoped fold")
    // and the NEXT refresh stays incremental over the folded state
    spark.sql("""INSERT INTO msk.ns3.src
                 SELECT id % 16, 900 + id % 30 FROM range(0, 400, 1, 2)""")
    val m2 = spark.sql("""CALL msk.system.refresh_materialized_view(
                            namespace => 'ns3', name => 'mv')""")
      .head.getString(0)
    assert(m2 == "incremental", m2)
    assert(estimates() == exact())
  }
}
