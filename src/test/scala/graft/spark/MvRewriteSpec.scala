package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Transparent MV query rewrite: the optimized plan must scan the
  * VIEW exactly when it is fresh and covers the query, results must be
  * identical to the rewrite-disabled run, and every staleness /
  * coverage gap must decline (correctness never depends on the view).
  */
class MvRewriteSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-mvr").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.mvr", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.mvr.warehouse", warehouse)
    .getOrCreate()

  private def usesMv(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name().endsWith(".mv") => r
    }.nonEmpty

  /** Run with rewrite on and off; assert identical rows and the
    * expected plan source.
    */
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

  test("fresh MV serves exact-key, roll-up, filtered, and global " +
      "aggregates; every gap declines") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvr.ns1")
    spark.sql("CREATE TABLE mvr.ns1.src (k1 STRING, k2 BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO mvr.ns1.src
                 SELECT CAST(id % 5 AS STRING), id % 3, CAST(id AS DOUBLE) / 7
                 FROM range(0, 20000, 1, 4)""")
    // null keys and a null value exercise every rewrite's null
    // semantics (count(*) counts null-key groups; count(DISTINCT key)
    // and count(v) must skip nulls)
    spark.sql("""INSERT INTO mvr.ns1.src VALUES
                 (NULL, 0, 3.5), (NULL, NULL, 4.5), ('1', NULL, 5.5),
                 ('2', 1, NULL)""")
    spark.sql("""CALL mvr.system.create_materialized_view(
                   namespace => 'ns1', name => 'mv',
                   source_namespace => 'ns1', source_table => 'src',
                   group_by => 'k1,k2',
                   aggs => 'n:count:1;nv:count:v;total:sum:CAST(v AS DECIMAL(18,2));mn:min:v;mx:max:v')""")

    // exact keys
    check("""SELECT k1, k2, count(*) AS n,
                    sum(CAST(v AS DECIMAL(18,2))) AS total, max(v) AS mx
             FROM mvr.ns1.src GROUP BY k1, k2""", expectMv = true)
    // roll-up to a key subset
    check("""SELECT k1, count(*) AS n, min(v) AS mn
             FROM mvr.ns1.src GROUP BY k1""", expectMv = true)
    // composed result expressions over covered aggregates rewrite in
    // place — including avg via its sum/count decomposition
    check("""SELECT k1, CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE)
                        / count(*) AS avg_v
             FROM mvr.ns1.src GROUP BY k1""", expectMv = true)
    // filter on a key column, grouped by the other
    check("""SELECT k2, sum(CAST(v AS DECIMAL(18,2))) AS total
             FROM mvr.ns1.src WHERE k1 IN ('1', '3') GROUP BY k2""",
      expectMv = true)
    // global roll-up (no GROUP BY)
    check("SELECT count(*) AS n, max(v) AS mx FROM mvr.ns1.src",
      expectMv = true)
    // SELECT DISTINCT over keys is an aggregate with no agg functions
    check("SELECT DISTINCT k1 FROM mvr.ns1.src", expectMv = true)
    check("SELECT DISTINCT k1, k2 FROM mvr.ns1.src", expectMv = true)
    check("SELECT DISTINCT k1, v FROM mvr.ns1.src", expectMv = false)
    // HAVING filters above the aggregate and composes with the rewrite
    check("""SELECT k1, count(*) AS n FROM mvr.ns1.src
             GROUP BY k1 HAVING count(*) > 3000""", expectMv = true)

    // gaps that must DECLINE, each still row-identical:
    // an aggregate the view does not carry
    check("SELECT k1, avg(v) AS a FROM mvr.ns1.src GROUP BY k1",
      expectMv = false)
    // sum of a DIFFERENT expression than the view's
    check("SELECT k1, sum(v) AS s FROM mvr.ns1.src GROUP BY k1",
      expectMv = false)
    // count of a column (null-sensitive) serves from its count spec —
    // the 'nv:count:v' column, never the row count
    check("SELECT k1, count(v) AS n FROM mvr.ns1.src GROUP BY k1",
      expectMv = true)
    // count of a column with NO count spec declines
    check("SELECT k1, count(k2) AS n FROM mvr.ns1.src GROUP BY k1",
      expectMv = false)
    // count(NULL) is always 0, never the row count: upstream constant
    // folding may turn it into a literal before the rule sees it (a
    // literal-only rewrite over the view is then valid), so assert
    // row equality only — the rule itself declines the unfolded form
    locally {
      val cn = "SELECT k1, count(NULL) AS n FROM mvr.ns1.src GROUP BY k1"
      val on = spark.sql(cn).collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      val off = try spark.sql(cn).collect().map(_.toString).sorted.toSeq
      finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
      assert(on == off, "count(NULL) rows must not depend on the rewrite")
      assert(on.forall(_.endsWith(",0]")), s"count(NULL) must be 0: $on")
    }
    // count(DISTINCT key) rewrites when grouped + counted keys cover
    // the view's whole key set (nulls skipped on both paths)
    check("SELECT k1, count(DISTINCT k2) AS n FROM mvr.ns1.src GROUP BY k1",
      expectMv = true)
    check("SELECT count(DISTINCT k1, k2) AS n FROM mvr.ns1.src",
      expectMv = true)
    // ... and declines when they don't (k1 unconstrained: view rows
    // per k2 are not distinct k2 values)
    check("SELECT count(DISTINCT k2) AS n FROM mvr.ns1.src",
      expectMv = false)
    // DISTINCT over a non-key still declines
    check("SELECT k1, count(DISTINCT v) AS n FROM mvr.ns1.src GROUP BY k1",
      expectMv = false)
    // filter on a NON-key column declines
    check("""SELECT k1, count(*) AS n FROM mvr.ns1.src
             WHERE v > 100 GROUP BY k1""", expectMv = false)
    // grouping by a non-key expression declines
    check("SELECT upper(k1) AS u, count(*) AS n FROM mvr.ns1.src GROUP BY 1",
      expectMv = false)

    // staleness: an unrefreshed append must route to the SOURCE (new
    // rows visible), then refresh restores the rewrite
    spark.sql("INSERT INTO mvr.ns1.src VALUES ('9', 9, 1.5)")
    val stale = spark.sql(
      "SELECT count(*) AS n FROM mvr.ns1.src")
    assert(!usesMv(stale))
    assert(stale.head.getLong(0) == 20005L)
    spark.sql("""CALL mvr.system.refresh_materialized_view(
                   namespace => 'ns1', name => 'mv')""")
    check("SELECT count(*) AS n FROM mvr.ns1.src", expectMv = true)

    // time travel pins another snapshot: never rewritten
    val versions = spark.sql(
      "SELECT snapshot_id FROM mvr.ns1.`src$snapshots` ORDER BY snapshot_id")
      .collect().map(_.getLong(0))
    val tt = spark.sql(
      s"SELECT count(*) AS n FROM mvr.ns1.src VERSION AS OF 'snap:${versions.head}'")
    assert(!usesMv(tt))

    // kill switch
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try assert(!usesMv(spark.sql(
      "SELECT k1, count(*) AS n FROM mvr.ns1.src GROUP BY k1")))
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")

    // a DRIFTED view (definition property stripped) must decline, not
    // crash the source's queries...
    spark.sql(
      "ALTER TABLE mvr.ns1.mv UNSET TBLPROPERTIES ('graft.mv.group-by')")
    check("SELECT k1, count(*) AS n FROM mvr.ns1.src GROUP BY k1",
      expectMv = false)
    // ...and recovers when the definition is restored
    spark.sql(
      "ALTER TABLE mvr.ns1.mv SET TBLPROPERTIES ('graft.mv.group-by'='k1,k2')")
    check("SELECT k1, count(*) AS n FROM mvr.ns1.src GROUP BY k1",
      expectMv = true)

    // a dropped view leaves a stale registry entry: declines, no error
    spark.sql("DROP TABLE mvr.ns1.mv")
    check("SELECT k1, count(*) AS n FROM mvr.ns1.src GROUP BY k1",
      expectMv = false)
  }

  test("avg(expr) is served from the view's sum/count pair — double " +
      "AND decimal, bit-exact via buffer substitution") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvr.ns3")
    spark.sql("CREATE TABLE mvr.ns3.src (k BIGINT, v DOUBLE)")
    // id/4 is exact in binary, so every partial sum is exact and the
    // on/off comparison is bit-identical (double sums are otherwise
    // addition-order-sensitive)
    spark.sql("""INSERT INTO mvr.ns3.src
                 SELECT id % 7, CAST(id AS DOUBLE) / 4
                 FROM range(0, 9000, 1, 4)""")
    // all-null group (avg stays NULL through the division — the
    // NULL-iff-zero-count invariant shields ANSI's divide-by-zero)
    // and a partially-null group (avg ignores nulls)
    spark.sql("""INSERT INTO mvr.ns3.src VALUES
                 (90, NULL), (90, NULL), (91, NULL), (91, 2.0)""")
    spark.sql("""CALL mvr.system.create_materialized_view(
                   namespace => 'ns3', name => 'mv',
                   source_namespace => 'ns3', source_table => 'src',
                   group_by => 'k',
                   aggs => 'n:count:1;nv:count:v;total:sum:v;nd:count:CAST(v AS DECIMAL(18,2));td:sum:CAST(v AS DECIMAL(18,2))')""")
    check("SELECT k, avg(v) AS a FROM mvr.ns3.src GROUP BY k",
      expectMv = true)
    check("SELECT avg(v) AS a FROM mvr.ns3.src", expectMv = true)
    check("SELECT k, round(avg(v), 3) AS a FROM mvr.ns3.src GROUP BY k",
      expectMv = true)
    // decimal-typed average: served by substituting the Average's own
    // buffer attributes into its evaluateExpression over the stored
    // sum/count pair — Spark's exact decimal widening, result scale,
    // and HALF_UP rounding by construction. check() compares against
    // the rewrite-off run row-for-row, so any divergence (scale,
    // rounding, null shape) fails here.
    check("""SELECT k, avg(CAST(v AS DECIMAL(18,2))) AS a
             FROM mvr.ns3.src GROUP BY k""", expectMv = true)
    check("""SELECT avg(CAST(v AS DECIMAL(18,2))) AS a
             FROM mvr.ns3.src""", expectMv = true)
    // adversarial rounding: group sizes of 3 force repeating decimals
    // (x.xx333.../x.xx666...) where a double-composed quotient would
    // round differently at the result scale
    spark.sql("CREATE TABLE mvr.ns3.r3 (k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO mvr.ns3.r3
                 SELECT id % 300, 0.01 * CAST(id % 7 AS DOUBLE)
                 FROM range(0, 900, 1, 2)""")
    spark.sql("""CALL mvr.system.create_materialized_view(
                   namespace => 'ns3', name => 'mv3',
                   source_namespace => 'ns3', source_table => 'r3',
                   group_by => 'k',
                   aggs => 'nd:count:CAST(v AS DECIMAL(18,2));td:sum:CAST(v AS DECIMAL(18,2))')""")
    val q3 = """SELECT k, avg(CAST(v AS DECIMAL(18,2))) AS a
                FROM mvr.ns3.r3 GROUP BY k"""
    val on = spark.sql(q3)
    assert(on.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name().endsWith(".mv3") => r
    }.nonEmpty, on.queryExecution.optimizedPlan.treeString)
    val rowsOn = on.collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val rowsOff = try spark.sql(q3).collect().map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    assert(rowsOn == rowsOff, "decimal avg rounding diverged")
  }

  test("a FILTERED view serves only queries carrying its predicate, " +
      "and every maintenance path applies the predicate") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvr.ns4")
    spark.sql("CREATE TABLE mvr.ns4.src (k BIGINT, cat STRING, v DOUBLE)")
    spark.sql("""INSERT INTO mvr.ns4.src
                 SELECT id % 6,
                        CASE WHEN id % 3 = 0 THEN 'en' ELSE 'de' END,
                        CAST(id AS DOUBLE) / 4
                 FROM range(0, 12000, 1, 4)""")
    spark.sql("""CALL mvr.system.create_materialized_view(
                   namespace => 'ns4', name => 'mv',
                   source_namespace => 'ns4', source_table => 'src',
                   group_by => 'k',
                   aggs => 'n:count:1;nv:count:v;total:sum:v',
                   where => 'cat = ''en''')""")
    def refresh(): String = spark.sql(
      """CALL mvr.system.refresh_materialized_view(
           namespace => 'ns4', name => 'mv')""").head.getString(0)

    // the query must CARRY the defining predicate as a conjunct
    check("""SELECT k, count(*) AS n, sum(v) AS total
             FROM mvr.ns4.src WHERE cat = 'en' GROUP BY k""",
      expectMv = true)
    // extra key conjuncts re-apply on the view
    check("""SELECT k, count(*) AS n FROM mvr.ns4.src
             WHERE cat = 'en' AND k < 3 GROUP BY k""", expectMv = true)
    check("""SELECT count(*) AS n FROM mvr.ns4.src WHERE cat = 'en'""",
      expectMv = true)
    // no predicate / a different predicate: the view covers a SUBSET
    // of the source — must decline
    check("SELECT k, count(*) AS n FROM mvr.ns4.src GROUP BY k",
      expectMv = false)
    check("""SELECT k, count(*) AS n FROM mvr.ns4.src
             WHERE cat = 'de' GROUP BY k""", expectMv = false)

    // incremental path: the delta filter keeps only in-domain rows
    spark.sql("""INSERT INTO mvr.ns4.src VALUES
                 (1, 'en', 2.5), (1, 'de', 99.0), (5, 'en', NULL)""")
    assert(refresh() == "incremental")
    check("""SELECT k, count(*) AS n, count(v) AS nv, sum(v) AS total
             FROM mvr.ns4.src WHERE cat = 'en' GROUP BY k""",
      expectMv = true)

    // cdc path: retraction applies the predicate to the feed, and an
    // UPDATE moving a row OUT of the domain is a one-sided retraction
    spark.sql("DELETE FROM mvr.ns4.src WHERE v < 10")
    spark.sql("UPDATE mvr.ns4.src SET cat = 'de' WHERE k = 5 AND cat = 'en'")
    assert(refresh() == "cdc")
    check("""SELECT k, count(*) AS n, sum(v) AS total
             FROM mvr.ns4.src WHERE cat = 'en' GROUP BY k""",
      expectMv = true)

    // full fallback still honors the predicate (overwrite in range)
    spark.sql("""INSERT OVERWRITE mvr.ns4.src
                 SELECT id % 4, CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END,
                        CAST(id AS DOUBLE) / 8
                 FROM range(0, 4000, 1, 2)""")
    assert(refresh() == "full")
    check("""SELECT k, count(*) AS n, sum(v) AS total
             FROM mvr.ns4.src WHERE cat = 'en' GROUP BY k""",
      expectMv = true)
  }

  test("filtered-view rewrite: a null-tolerant predicate keeps the " +
      "query's IS NOT NULL (decline), a strict one implies it (serve), " +
      "and non-deterministic conjuncts always decline") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvr.ns5")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvr.ns6")
    spark.sql("CREATE TABLE mvr.ns5.src (k BIGINT, x DOUBLE, y BIGINT)")
    spark.sql("""INSERT INTO mvr.ns5.src
                 SELECT id % 4, CASE WHEN id % 5 = 0 THEN NULL
                                     ELSE CAST(id AS DOUBLE) END,
                        id % 2
                 FROM range(0, 8000, 1, 4)""")
    // null-TOLERANT defining predicate: NULL-x rows with y = 1 are IN
    // the view's domain
    spark.sql("""CALL mvr.system.create_materialized_view(
                   namespace => 'ns5', name => 'mv',
                   source_namespace => 'ns5', source_table => 'src',
                   group_by => 'k', aggs => 'n:count:1',
                   where => 'x > 100 OR y = 1')""")
    check("""SELECT k, count(*) AS n FROM mvr.ns5.src
             WHERE x > 100 OR y = 1 GROUP BY k""", expectMv = true)
    // an extra `x IS NOT NULL` EXCLUDES the NULL-x rows the predicate
    // admitted via y = 1 — a real filter on a non-key column, so the
    // rewrite must DECLINE (dropping it would silently return the
    // view's NULL-x rows; the on/off row compare would catch that)
    check("""SELECT k, count(*) AS n FROM mvr.ns5.src
             WHERE (x > 100 OR y = 1) AND x IS NOT NULL GROUP BY k""",
      expectMv = false)
    // a non-deterministic residual conjunct must never re-apply on
    // group-level view rows (length(uuid()) > -1 is always true — so
    // the on/off rows stay comparable — but non-deterministic and not
    // constant-foldable, unlike rand() range comparisons which the
    // optimizer folds away)
    check("""SELECT k, count(*) AS n FROM mvr.ns5.src
             WHERE (x > 100 OR y = 1) AND length(uuid()) > -1 GROUP BY k""",
      expectMv = false)

    // STRICT defining predicate: `x > 100` nulls out on NULL x, so an
    // explicit `x IS NOT NULL` is implied by the view's content and
    // drops — the rewrite serves
    spark.sql("""CALL mvr.system.create_materialized_view(
                   namespace => 'ns6', name => 'mv',
                   source_namespace => 'ns5', source_table => 'src',
                   group_by => 'k', aggs => 'n:count:1',
                   where => 'x > 100')""")
    check("""SELECT k, count(*) AS n FROM mvr.ns5.src
             WHERE x > 100 AND x IS NOT NULL GROUP BY k""", expectMv = true)
  }

  test("bounded staleness: max-staleness-ms serves a stale view within " +
      "the bound and declines past it; the default stays exact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvr.ns7")
    spark.sql("CREATE TABLE mvr.ns7.src (k BIGINT, v DOUBLE)")
    spark.sql("""INSERT INTO mvr.ns7.src
                 SELECT id % 3, CAST(id AS DOUBLE) FROM range(0, 600, 1, 2)""")
    spark.sql("""CALL mvr.system.create_materialized_view(
                   namespace => 'ns7', name => 'mv',
                   source_namespace => 'ns7', source_table => 'src',
                   group_by => 'k', aggs => 'n:count:1')""")
    val q = "SELECT k, count(*) AS n FROM mvr.ns7.src GROUP BY k"
    assert(usesMv(spark.sql(q)))
    spark.sql("INSERT INTO mvr.ns7.src VALUES (1, 1.0)")
    // default = exact: a stale view never serves
    assert(!usesMv(spark.sql(q)))
    spark.conf.set("spark.graft.mv.rewrite.max-staleness-ms", "600000")
    try {
      // the unabsorbed commit is seconds old — within the bound the
      // view serves, and the answer is the VIEW's content (correct as
      // of the bound, by the caller's explicit choice)
      assert(usesMv(spark.sql(q)))
      val served = spark.sql(q).collect().map(_.toString).sorted.toSeq
      val viewRows = spark.sql("SELECT k, n FROM mvr.ns7.mv")
        .collect().map(_.toString).sorted.toSeq
      assert(served == viewRows, "stale serving must answer from the view")
      // a 1 ms bound is already exceeded — declines again
      spark.conf.set("spark.graft.mv.rewrite.max-staleness-ms", "1")
      Thread.sleep(50)
      assert(!usesMv(spark.sql(q)))
    } finally
      spark.conf.unset("spark.graft.mv.rewrite.max-staleness-ms")
    // refresh restores exact serving
    spark.sql("""CALL mvr.system.refresh_materialized_view(
                   namespace => 'ns7', name => 'mv')""")
    check(q, expectMv = true)

    // PER-VIEW staleness: the property on the MV table serves stale
    // within its own bound while the session stays exact — one session
    // mixes exact dashboards and stale-tolerant monitors
    spark.sql("INSERT INTO mvr.ns7.src VALUES (2, 2.0)")
    assert(!usesMv(spark.sql(q)), "session default must stay exact")
    spark.sql("""ALTER TABLE mvr.ns7.mv SET TBLPROPERTIES
                   ('graft.mv.max-staleness-ms' = '600000')""")
    GraftMvRewrite.invalidate("mvr", "ns7.mv")
    assert(usesMv(spark.sql(q)),
      "the property-set view must serve within its own bound")
    // and the property WINS over the conf for this view: an explicit
    // 0 pins the view exact even when the session tolerates staleness
    spark.sql("""ALTER TABLE mvr.ns7.mv SET TBLPROPERTIES
                   ('graft.mv.max-staleness-ms' = '0')""")
    GraftMvRewrite.invalidate("mvr", "ns7.mv")
    spark.conf.set("spark.graft.mv.rewrite.max-staleness-ms", "600000")
    try assert(!usesMv(spark.sql(q)),
      "a view declaring max-staleness-ms = 0 stays exact even when " +
        "the session tolerates staleness")
    finally spark.conf.unset("spark.graft.mv.rewrite.max-staleness-ms")
  }

  test("drop_materialized_view deregisters from the source") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvr.ns2")
    spark.sql("CREATE TABLE mvr.ns2.s (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO mvr.ns2.s VALUES (1, 1.5), (2, 2.5)")
    spark.sql("""CALL mvr.system.create_materialized_view(
                   namespace => 'ns2', name => 'm',
                   source_namespace => 'ns2', source_table => 's',
                   group_by => 'k', aggs => 'n:count:1')""")
    def derived(): Option[String] = {
      val cat = spark.sessionState.catalogManager.catalog("mvr")
        .asInstanceOf[GraftCatalog]
      Option(cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("ns2"), "s")).properties()
        .get(graft.maintain.MaterializedViews.DerivedProp))
    }
    assert(derived().contains("ns2.m"))
    val dropped = spark.sql("""CALL mvr.system.drop_materialized_view(
                                 namespace => 'ns2', name => 'm')""")
      .head.getBoolean(0)
    assert(dropped)
    assert(derived().isEmpty, "registry entry must be removed")
    assert(!spark.catalog.tableExists("mvr.ns2.m"))
    // dropping a plain table through the procedure is refused
    val e = intercept[Exception] {
      spark.sql("""CALL mvr.system.drop_materialized_view(
                     namespace => 'ns2', name => 's')""").collect()
    }
    assert(e.getMessage.contains("not a materialized view"))
  }
}
