package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Expression keys for materialized views — the canonical production
  * shape `GROUP BY date_trunc('DAY', ts)`: the expression materializes
  * as a named state column, every maintenance path evaluates it on its
  * delta, and the rewrite serves queries grouping by the SAME
  * expression plus aligned roll-ups above it (day → month).
  */
class MvExprKeySpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-mvek").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.mek", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.mek.warehouse", warehouse)
    .getOrCreate()

  private def usesMv(sql: String, view: String = "mv"): Boolean =
    spark.sql(sql).queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name().endsWith("." + view) => r
    }.nonEmpty

  private def rows(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.toString).toSeq

  /** Truth queries aggregate over the SOURCE — run them with the
    * rewrite off, or they would be served from the view under test.
    */
  private def noRewrite[T](f: => T): T = {
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try f finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
  }

  test("DDL view keyed on date_trunc: incremental + cdc maintenance " +
      "match truth, rewrite serves the expression and its roll-up") {
    spark.sql("CREATE NAMESPACE mek.ns1")
    spark.sql("""CREATE TABLE mek.ns1.ev (
                   id BIGINT NOT NULL, ts TIMESTAMP NOT NULL, v DOUBLE)""")
    spark.sql("""INSERT INTO mek.ns1.ev
                 SELECT id, timestamp'2024-01-01 00:00:00' +
                        make_interval(0, 0, 0, 0, 0, CAST(id * 37 AS INT), 0),
                        CAST(id AS DOUBLE)
                 FROM range(0, 4000, 1, 4)""")

    val created = spark.sql(
      """CREATE MATERIALIZED VIEW mek.ns1.mv AS
         SELECT date_trunc('DAY', ts) AS day, count(*) AS n,
                count(CAST(v AS DECIMAL(18,2))) AS nv,
                sum(CAST(v AS DECIMAL(18,2))) AS total
         FROM mek.ns1.ev GROUP BY date_trunc('DAY', ts)""").head
    assert(created.getString(0) == "full")

    def truth: Seq[String] = noRewrite(rows(
      """SELECT date_trunc('DAY', ts) AS day, count(*) AS n,
                count(CAST(v AS DECIMAL(18,2))) AS nv,
                sum(CAST(v AS DECIMAL(18,2))) AS total
         FROM mek.ns1.ev GROUP BY 1 ORDER BY day"""))
    def state: Seq[String] =
      rows("SELECT day, n, nv, total FROM mek.ns1.mv ORDER BY day")
    assert(state == truth)

    // append: the delta evaluates the key expression before grouping
    spark.sql("""INSERT INTO mek.ns1.ev
                 SELECT id, timestamp'2024-01-03 12:00:00' +
                        make_interval(0, 0, 0, 0, 0, CAST(id * 11 AS INT), 0),
                        CAST(id AS DOUBLE) + 0.5
                 FROM range(4000, 6000, 1, 4)""")
    val m1 = spark.sql("REFRESH MATERIALIZED VIEW mek.ns1.mv")
      .head.getString(0)
    assert(m1 == "incremental", s"append must refresh incrementally: $m1")
    assert(state == truth)

    // delete: count/sum with companion counts retract via the change
    // feed — the signed partials also evaluate the key expression
    spark.sql("DELETE FROM mek.ns1.ev WHERE id % 13 = 5")
    val m2 = spark.sql("REFRESH MATERIALIZED VIEW mek.ns1.mv")
      .head.getString(0)
    assert(m2 == "cdc", s"sparse delete must refresh via the feed: $m2")
    assert(state == truth)

    // rewrite: the exact key expression is served by the view ...
    assert(usesMv(
      """SELECT date_trunc('DAY', ts) AS day, count(*) AS n
         FROM mek.ns1.ev GROUP BY date_trunc('DAY', ts)"""))
    // ... and the aligned roll-up re-truncates the key column
    assert(usesMv(
      """SELECT date_trunc('MONTH', ts) AS mon, count(*) AS n
         FROM mek.ns1.ev GROUP BY date_trunc('MONTH', ts)"""))
    val rolled = rows(
      """SELECT date_trunc('MONTH', ts) AS mon, count(*) AS n,
                sum(CAST(v AS DECIMAL(18,2))) AS total
         FROM mek.ns1.ev GROUP BY 1 ORDER BY mon""")
    val rolledTruth = noRewrite(rows(
      """SELECT date_trunc('MONTH', ts) AS mon, count(*) AS n,
                sum(CAST(v AS DECIMAL(18,2))) AS total
         FROM mek.ns1.ev GROUP BY 1 ORDER BY mon"""))
    assert(rolled == rolledTruth)
    // a finer bucket than the key cannot be served
    assert(!usesMv(
      """SELECT date_trunc('HOUR', ts) AS h, count(*) AS n
         FROM mek.ns1.ev GROUP BY date_trunc('HOUR', ts)"""))
    // a filter on the key expression re-applies on the view
    assert(usesMv(
      """SELECT date_trunc('DAY', ts) AS day, count(*) AS n
         FROM mek.ns1.ev
         WHERE date_trunc('DAY', ts) = timestamp'2024-01-02 00:00:00'
         GROUP BY date_trunc('DAY', ts)"""))
    // a filter on a NON-key source column declines
    assert(!usesMv(
      """SELECT date_trunc('DAY', ts) AS day, count(*) AS n
         FROM mek.ns1.ev WHERE v > 100 GROUP BY date_trunc('DAY', ts)"""))
  }

  test("GROUP BY <alias> form, procedure path, min/max groups " +
      "maintenance, and rejection of non-deterministic keys") {
    spark.sql("CREATE NAMESPACE mek.ns2")
    spark.sql("""CREATE TABLE mek.ns2.ev (
                   id BIGINT NOT NULL, ts TIMESTAMP NOT NULL, v DOUBLE)""")
    spark.sql("""INSERT INTO mek.ns2.ev
                 SELECT id, timestamp'2024-02-01 00:00:00' +
                        make_interval(0, 0, 0, 0, CAST(id % 90 AS INT), 0, 0),
                        CAST(id AS DOUBLE)
                 FROM range(0, 3000, 1, 4)""")

    // GROUP BY the select alias — same derivation
    spark.sql("""CREATE MATERIALIZED VIEW mek.ns2.mv AS
                 SELECT date_trunc('DAY', ts) AS day, count(*) AS n,
                        min(v) AS mn, max(v) AS mx
                 FROM mek.ns2.ev GROUP BY day""")
    // min/max cannot retract: a delete takes the group-scoped path and
    // re-aggregates only the touched day buckets
    spark.sql("DELETE FROM mek.ns2.ev WHERE id % 97 = 3")
    val mode = spark.sql("REFRESH MATERIALIZED VIEW mek.ns2.mv")
      .head.getString(0)
    assert(mode == "groups", s"expected group-scoped recompute: $mode")
    val state = rows("SELECT day, n, mn, mx FROM mek.ns2.mv ORDER BY day")
    val truth = noRewrite(rows(
      """SELECT date_trunc('DAY', ts) AS day, count(*) AS n,
              min(v) AS mn, max(v) AS mx
         FROM mek.ns2.ev GROUP BY 1 ORDER BY day"""))
    assert(state == truth)

    // the procedure path takes the same key_exprs spec
    spark.sql("""CALL mek.system.create_materialized_view(
                   namespace => 'ns2', name => 'mv2',
                   source_namespace => 'ns2', source_table => 'ev',
                   group_by => 'hr',
                   aggs => 'n:count:1',
                   key_exprs => 'hr:date_trunc(''HOUR'', ts)')""")
    spark.sql("""INSERT INTO mek.ns2.ev VALUES
                 (90001, timestamp'2024-02-05 07:30:00', 1.0)""")
    val m2 = spark.sql("""CALL mek.system.refresh_materialized_view(
                            namespace => 'ns2', name => 'mv2')""")
      .head.getString(0)
    assert(m2 == "incremental")
    val s2 = rows("SELECT hr, n FROM mek.ns2.mv2 ORDER BY hr")
    val t2 = noRewrite(rows(
      """SELECT date_trunc('HOUR', ts) AS hr, count(*) AS n
         FROM mek.ns2.ev GROUP BY 1 ORDER BY hr"""))
    assert(s2 == t2)
    // hour-keyed view serves a day roll-up but NOT the other direction
    // (mv is stale after the insert, so only mv2 can serve)
    assert(usesMv(
      """SELECT date_trunc('DAY', ts) AS day, count(*) AS n
         FROM mek.ns2.ev GROUP BY date_trunc('DAY', ts)""", "mv2"))

    // non-deterministic key expressions are rejected at create
    val e = intercept[Exception] {
      spark.sql("""CALL mek.system.create_materialized_view(
                     namespace => 'ns2', name => 'bad',
                     source_namespace => 'ns2', source_table => 'ev',
                     group_by => 'r', aggs => 'n:count:1',
                     key_exprs => 'r:CAST(rand() * 10 AS INT)')""")
    }
    assert(e.getMessage.contains("deterministic"), e.getMessage)
    // a key expression shadowing a source column is rejected
    val e2 = intercept[Exception] {
      spark.sql("""CALL mek.system.create_materialized_view(
                     namespace => 'ns2', name => 'bad2',
                     source_namespace => 'ns2', source_table => 'ev',
                     group_by => 'v', aggs => 'n:count:1',
                     key_exprs => 'v:date_trunc(''DAY'', ts)')""")
    }
    assert(e2.getMessage.contains("shadows"), e2.getMessage)
  }
}
