package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.connector.catalog.Identifier

/** Timezone pinning for expression-keyed materialized views.
  * `date_trunc('DAY', ts)` is session-timezone-AWARE: without a pin, a
  * refresher under another `spark.sql.session.timeZone` would bucket
  * the same instants differently (state corruption), and a query
  * session under another zone would be served buckets that are some
  * OTHER zone's midnights (silently wrong rows). The fix: the creating
  * session's zone is stamped as `graft.mv.tz`, every maintenance path
  * evaluates key expressions with their timezone-aware nodes pinned to
  * it, and the rewrite declines when the query session's zone differs.
  */
class MvTzSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-mtz").toString

  // the tests mutate spark.sql.session.timeZone — an ISOLATED session
  // (own SQLConf, shared SparkContext) keeps that from bleeding into
  // concurrently-running suites
  lazy val spark: SparkSession = {
    val s = graft.Verify.sessionBuilder("4").getOrCreate().newSession()
    s.conf.set("spark.sql.catalog.mtz", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.mtz.warehouse", warehouse)
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s
  }

  private def withTz[T](zone: String)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", zone)
    try f finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  private def noRewrite[T](f: => T): T = {
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try f finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
  }

  private def rows(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.toString).toSeq

  private def usesMv(sql: String, view: String = "mv"): Boolean =
    spark.sql(sql).queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name().endsWith("." + view) => r
    }.nonEmpty

  // java.sql.Timestamp renders in the JVM zone, not the session zone,
  // so collected-row strings compare stably across session-zone swaps
  test("refreshers under different session zones maintain the PINNED " +
      "creation zone's buckets (incremental, cdc, and groups paths)") {
    spark.sql("CREATE NAMESPACE mtz.ns1")
    spark.sql("""CREATE TABLE mtz.ns1.ev (
                   id BIGINT NOT NULL, ts TIMESTAMP NOT NULL, v DOUBLE)""")
    // 30-minute steps from 2024-01-01T00:00Z across ~4 days: plenty of
    // instants whose UTC day differs from their IST (+05:30) or
    // PST (-08:00) day
    spark.sql("""INSERT INTO mtz.ns1.ev
                 SELECT id, timestamp_seconds(1704067200 + id * 1800),
                        CAST(id AS DOUBLE)
                 FROM range(0, 200, 1, 4)""")
    spark.sql("""CREATE MATERIALIZED VIEW mtz.ns1.mv AS
                 SELECT date_trunc('DAY', ts) AS day, count(*) AS n,
                        count(v) AS nv, sum(v) AS total
                 FROM mtz.ns1.ev GROUP BY date_trunc('DAY', ts)""")
    val cat = spark.sessionState.catalogManager.catalog("mtz")
      .asInstanceOf[GraftCatalog]
    val tzProp = cat.loadTable(Identifier.of(Array("ns1"), "mv"))
      .properties().get(graft.maintain.MaterializedViews.TzProp)
    assert(tzProp == "UTC", s"creation zone must be stamped: $tzProp")

    // truth is ALWAYS the creation zone's bucketing
    def truth: Seq[String] = withTz("UTC")(noRewrite(rows(
      """SELECT date_trunc('DAY', ts) AS day, count(*) AS n,
                count(v) AS nv, sum(v) AS total
         FROM mtz.ns1.ev GROUP BY 1 ORDER BY day""")))
    def state: Seq[String] =
      rows("SELECT day, n, nv, total FROM mtz.ns1.mv ORDER BY day")
    assert(state == truth)

    // an IST refresher takes the incremental path and buckets the new
    // instants at UTC midnights, not +05:30's
    spark.sql("""INSERT INTO mtz.ns1.ev
                 SELECT id, timestamp_seconds(1704067200 + id * 1800),
                        CAST(id AS DOUBLE) + 0.25
                 FROM range(200, 320, 1, 4)""")
    val m1 = withTz("Asia/Kolkata")(
      spark.sql("REFRESH MATERIALIZED VIEW mtz.ns1.mv").head.getString(0))
    assert(m1 == "incremental", m1)
    assert(state == truth,
      "an IST refresher corrupted the UTC-pinned buckets")

    // a PST refresher drives the signed feed path — same pin
    spark.sql("DELETE FROM mtz.ns1.ev WHERE id % 7 = 3")
    val m2 = withTz("America/Los_Angeles")(
      spark.sql("REFRESH MATERIALIZED VIEW mtz.ns1.mv").head.getString(0))
    assert(m2 == "cdc", m2)
    assert(state == truth,
      "a PST refresher corrupted the UTC-pinned buckets")

    // min/max → the GROUP-SCOPED recompute (touched keys, range prune,
    // current-source re-aggregation) under yet another zone
    spark.sql("""CREATE MATERIALIZED VIEW mtz.ns1.mv2 AS
                 SELECT date_trunc('DAY', ts) AS day, count(*) AS n,
                        max(v) AS hi
                 FROM mtz.ns1.ev GROUP BY date_trunc('DAY', ts)""")
    spark.sql("DELETE FROM mtz.ns1.ev WHERE id % 11 = 2")
    val m3 = withTz("Australia/Sydney")(
      spark.sql("REFRESH MATERIALIZED VIEW mtz.ns1.mv2").head.getString(0))
    assert(m3 == "groups", m3)
    val truth2 = withTz("UTC")(noRewrite(rows(
      """SELECT date_trunc('DAY', ts) AS day, count(*) AS n, max(v) AS hi
         FROM mtz.ns1.ev GROUP BY 1 ORDER BY day""")))
    assert(rows("SELECT day, n, hi FROM mtz.ns1.mv2 ORDER BY day")
      == truth2, "a cross-zone groups recompute corrupted the buckets")
  }

  test("the rewrite serves only query sessions in the pinned zone — " +
      "zone aliases normalize, different zones decline correctly") {
    val q = """SELECT date_trunc('DAY', ts) AS day, count(*) AS n
               FROM mtz.ns1.ev GROUP BY date_trunc('DAY', ts)"""
    // absorb the previous test's trailing delete — freshness first
    spark.sql("REFRESH MATERIALIZED VIEW mtz.ns1.mv")
    assert(withTz("UTC")(usesMv(q)), "pinned zone must serve")
    // textual aliases of the same zone still serve
    assert(withTz("Etc/UTC")(usesMv(q)), "Etc/UTC is UTC")
    assert(withTz("+00:00")(usesMv(q)), "+00:00 is UTC")
    // a different zone DECLINES — and the query, running against the
    // source, returns that zone's own (different) bucketing
    val (nyServed, nyRows) = withTz("America/New_York") {
      (usesMv(q), rows(q + " ORDER BY day"))
    }
    assert(!nyServed,
      "a cross-zone query session must never be served pinned buckets")
    val utcRows = withTz("UTC")(noRewrite(rows(q + " ORDER BY day")))
    assert(nyRows != utcRows,
      "sanity: NY bucketing genuinely differs from the pinned UTC one")
    // zone-INSENSITIVE expression keys carry no pin constraint
    spark.sql("""CREATE MATERIALIZED VIEW mtz.ns1.mv3 AS
                 SELECT id % 10 AS bucket, count(*) AS n
                 FROM mtz.ns1.ev GROUP BY id % 10""")
    val q3 = """SELECT id % 10 AS bucket, count(*) AS n
                FROM mtz.ns1.ev GROUP BY id % 10"""
    assert(withTz("America/New_York")(usesMv(q3, view = "mv3")),
      "a zone-insensitive expression key must serve cross-zone")
  }

  test("tz-sensitive WHERE predicates and aggregate inputs pin the " +
      "creation zone too — maintenance stays exact, serving declines " +
      "per expression") {
    // WHERE hour(ts) ... filters a DIFFERENT row set under another
    // zone; sum(hour(ts)) aggregates different values. Both must
    // evaluate under the pinned zone on every maintenance path.
    spark.sql("""CREATE MATERIALIZED VIEW mtz.ns1.mvw AS
                 SELECT id % 4 AS b, count(*) AS n,
                        count(hour(ts)) AS nh, sum(hour(ts)) AS sh
                 FROM mtz.ns1.ev WHERE hour(ts) >= 6
                 GROUP BY id % 4""")
    def truthW: Seq[String] = withTz("UTC")(noRewrite(rows(
      """SELECT id % 4 AS b, count(*) AS n,
                count(hour(ts)) AS nh, sum(hour(ts)) AS sh
         FROM mtz.ns1.ev WHERE hour(ts) >= 6
         GROUP BY 1 ORDER BY b""")))
    def stateW: Seq[String] =
      rows("SELECT b, n, nh, sh FROM mtz.ns1.mvw ORDER BY b")
    assert(stateW == truthW)
    // an IST refresher: both the predicate and the aggregate input
    // must evaluate at UTC hours, not +05:30's
    spark.sql("""INSERT INTO mtz.ns1.ev
                 SELECT id, timestamp_seconds(1704067200 + id * 1800),
                        CAST(id AS DOUBLE)
                 FROM range(320, 380, 1, 2)""")
    val mw = withTz("Asia/Kolkata")(
      spark.sql("REFRESH MATERIALIZED VIEW mtz.ns1.mvw").head.getString(0))
    assert(mw == "incremental", mw)
    assert(stateW == truthW,
      "an IST refresher corrupted the hour-filtered state")
    // a delete through the signed feed path under yet another zone
    spark.sql("DELETE FROM mtz.ns1.ev WHERE id % 19 = 8")
    val mw2 = withTz("America/Los_Angeles")(
      spark.sql("REFRESH MATERIALIZED VIEW mtz.ns1.mvw").head.getString(0))
    assert(mw2 == "cdc", mw2)
    assert(stateW == truthW,
      "a PST refresher corrupted the hour-filtered state")
    // serving: the pinned zone serves; a cross-zone session declines
    // (its own hour() semantics differ from the state's)
    val qw = """SELECT id % 4 AS b, count(*) AS n
                FROM mtz.ns1.ev WHERE hour(ts) >= 6 GROUP BY id % 4"""
    assert(withTz("UTC")(usesMv(qw, view = "mvw")))
    assert(!withTz("America/New_York")(usesMv(qw, view = "mvw")),
      "a tz-sensitive WHERE must not serve cross-zone")
    // per-EXPRESSION granularity: on a zone-insensitive-keyed view, a
    // cross-zone query may still use insensitive aggregates while the
    // tz-sensitive aggregate declines
    spark.sql("""CREATE MATERIALIZED VIEW mtz.ns1.mva AS
                 SELECT id % 4 AS b, count(*) AS n, sum(v) AS sv,
                        sum(hour(ts)) AS sh
                 FROM mtz.ns1.ev GROUP BY id % 4""")
    val qInsens = """SELECT id % 4 AS b, count(*) AS n, sum(v) AS sv
                     FROM mtz.ns1.ev GROUP BY id % 4"""
    val qSens = """SELECT id % 4 AS b, sum(hour(ts)) AS sh
                   FROM mtz.ns1.ev GROUP BY id % 4"""
    assert(withTz("America/New_York")(usesMv(qInsens, view = "mva")),
      "insensitive aggregates must stay servable cross-zone")
    assert(!withTz("America/New_York")(usesMv(qSens, view = "mva")),
      "the tz-sensitive aggregate must decline cross-zone")
    assert(withTz("UTC")(usesMv(qSens, view = "mva")))
  }

  test("typed TIMESTAMP literals pin too: they fold to instants at " +
      "PARSE time, so the re-parse itself must run under the view zone") {
    // WHERE ts < TIMESTAMP'...' — parsed under another zone the
    // boundary shifts by the zone offset and a refresher would
    // include/exclude the wrong rows; no TimeZoneAwareExpression
    // survives parsing for a post-hoc rewrite to fix
    spark.sql("""CREATE MATERIALIZED VIEW mtz.ns1.mvl AS
                 SELECT id % 4 AS b, count(*) AS n,
                        count(v) AS nv, sum(v) AS total
                 FROM mtz.ns1.ev
                 WHERE ts < TIMESTAMP'2024-01-03 00:00:00'
                 GROUP BY id % 4""")
    def truthL: Seq[String] = withTz("UTC")(noRewrite(rows(
      """SELECT id % 4 AS b, count(*) AS n,
                count(v) AS nv, sum(v) AS total
         FROM mtz.ns1.ev WHERE ts < TIMESTAMP'2024-01-03 00:00:00'
         GROUP BY 1 ORDER BY b""")))
    def stateL: Seq[String] =
      rows("SELECT b, n, nv, total FROM mtz.ns1.mvl ORDER BY b")
    assert(stateL == truthL)
    // rows INSIDE the discriminating window [Jan3 00:00Z, Jan3
    // 05:00Z): out of domain at the UTC boundary, wrongly IN domain
    // if a NY refresher re-parses the literal at NY midnight (05:00Z)
    spark.sql("""INSERT INTO mtz.ns1.ev
                 SELECT id, timestamp_seconds(1704240000 + (id - 1000) * 60),
                        CAST(id AS DOUBLE)
                 FROM range(1000, 1040, 1, 2)""")
    val ml = withTz("America/New_York")(
      spark.sql("REFRESH MATERIALIZED VIEW mtz.ns1.mvl").head.getString(0))
    assert(ml == "incremental", ml)
    assert(stateL == truthL,
      "a NY refresher re-parsed the timestamp literal at NY midnight")
    // and the rewrite treats the folded literal as tz-sensitive:
    // cross-zone sessions decline, the pinned zone serves
    val ql = """SELECT id % 4 AS b, count(*) AS n FROM mtz.ns1.ev
                WHERE ts < TIMESTAMP'2024-01-03 00:00:00' GROUP BY id % 4"""
    assert(withTz("UTC")(usesMv(ql, view = "mvl")))
    assert(!withTz("America/New_York")(usesMv(ql, view = "mvl")),
      "a parse-folded timestamp literal must decline cross-zone")
  }
}
