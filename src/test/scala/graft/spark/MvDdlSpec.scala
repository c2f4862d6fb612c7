package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL DDL for materialized views: CREATE/REFRESH/DROP MATERIALIZED
  * VIEW derive the view spec from the statement's own SELECT and ride
  * the exact machinery the procedures use — same maintenance modes,
  * same rewrite serving, same registry bookkeeping.
  */
class MvDdlSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-mvddl").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.mvd", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.mvd.warehouse", warehouse)
    .getOrCreate()

  private def usesMv(sql: String): Boolean =
    spark.sql(sql).queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name().endsWith("mv") => r
    }.nonEmpty

  test("CREATE/REFRESH/DROP MATERIALIZED VIEW round-trip with WHERE, " +
      "rewrite serving, and incremental maintenance") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvd.ns1")
    spark.sql("CREATE TABLE mvd.ns1.src (k BIGINT, cat STRING, v DOUBLE)")
    spark.sql("""INSERT INTO mvd.ns1.src
                 SELECT id % 7,
                        CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END,
                        CAST(id AS DOUBLE) / 3
                 FROM range(0, 9000, 1, 4)""")

    val created = spark.sql(
      """CREATE MATERIALIZED VIEW mvd.ns1.mv AS
         SELECT k, count(*) AS n, count(v) AS nv,
                sum(CAST(v AS DECIMAL(18,2))) AS total
         FROM mvd.ns1.src WHERE cat = 'en' GROUP BY k""").head
    assert(created.getString(0) == "full")
    assert(created.getLong(1) == 7L)

    // the derived definition matches the procedure path's: the rewrite
    // serves a query carrying the predicate
    assert(usesMv("""SELECT k, count(*) AS n FROM mvd.ns1.src
                     WHERE cat = 'en' GROUP BY k"""))
    assert(!usesMv("SELECT k, count(*) AS n FROM mvd.ns1.src GROUP BY k"))

    // IF NOT EXISTS is a noop on an existing view
    val again = spark.sql(
      """CREATE MATERIALIZED VIEW IF NOT EXISTS mvd.ns1.mv AS
         SELECT k, count(*) AS n FROM mvd.ns1.src GROUP BY k""").head
    assert(again.getString(0) == "noop")

    // maintenance through the DDL refresh: append → incremental, and
    // state equals the from-scratch truth
    spark.sql("INSERT INTO mvd.ns1.src VALUES (1, 'en', 4.5), (1, 'de', 9.0)")
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvd.ns1.mv").head
    assert(r.getString(0) == "incremental", r.toString)
    val state = spark.sql(
      "SELECT k, n, nv, CAST(total AS DOUBLE) FROM mvd.ns1.mv ORDER BY k")
      .collect().map(_.toString).toSeq
    val truth = spark.sql(
      """SELECT k, count(*), count(v),
                CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE)
         FROM mvd.ns1.src WHERE cat = 'en' GROUP BY k ORDER BY k""")
      .collect().map(_.toString).toSeq
    assert(state == truth)

    // DROP deregisters from the source (rewrite stops immediately)
    assert(spark.sql("DROP MATERIALIZED VIEW mvd.ns1.mv").head.getBoolean(0))
    assert(!usesMv("""SELECT k, count(*) AS n FROM mvd.ns1.src
                      WHERE cat = 'en' GROUP BY k"""))
    // IF EXISTS tolerates the missing view; bare DROP throws
    assert(!spark.sql("DROP MATERIALIZED VIEW IF EXISTS mvd.ns1.mv")
      .head.getBoolean(0))
    intercept[NoSuchElementException] {
      spark.sql("DROP MATERIALIZED VIEW mvd.ns1.mv").collect()
    }
  }

  test("JOIN views derive from aliased INNER equi-joins") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvd.ns2")
    spark.sql("CREATE TABLE mvd.ns2.fact (fk BIGINT, amount DOUBLE)")
    spark.sql("CREATE TABLE mvd.ns2.dim (id BIGINT, seg STRING)")
    spark.sql("""INSERT INTO mvd.ns2.fact
                 SELECT id % 50, CAST(id AS DOUBLE) FROM range(0, 5000, 1, 2)""")
    spark.sql("""INSERT INTO mvd.ns2.dim
                 SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END
                 FROM range(0, 50, 1, 2)""")
    // alias-qualified WHERE and aggregate arguments are stripped into
    // the stored definition (maintenance frames have no aliases)
    val created = spark.sql(
      """CREATE MATERIALIZED VIEW mvd.ns2.mv AS
         SELECT seg, count(*) AS n,
                sum(CAST(f.amount AS DECIMAL(18,2))) AS total
         FROM mvd.ns2.fact f JOIN mvd.ns2.dim d ON f.fk = d.id
         WHERE f.amount >= 0 GROUP BY seg""").head
    assert(created.getString(0) == "full")
    // fact append refreshes through the two-sided delta rule
    spark.sql("INSERT INTO mvd.ns2.fact VALUES (1, 2.5), (2, 3.5)")
    val r = spark.sql("REFRESH MATERIALIZED VIEW mvd.ns2.mv").head
    assert(r.getString(0) == "incremental", r.toString)
    val state = spark.sql(
      "SELECT seg, n, CAST(total AS DOUBLE) FROM mvd.ns2.mv ORDER BY seg")
      .collect().map(_.toString).toSeq
    val truth = spark.sql(
      """SELECT seg, count(*), CAST(sum(CAST(amount AS DECIMAL(18,2)))
                                    AS DOUBLE)
         FROM mvd.ns2.fact f JOIN mvd.ns2.dim d ON f.fk = d.id
         WHERE amount >= 0
         GROUP BY seg ORDER BY seg""").collect().map(_.toString).toSeq
    assert(state == truth)
    spark.sql("DROP MATERIALIZED VIEW mvd.ns2.mv")
  }

  test("unsupported shapes fail with pointed messages, not silent " +
      "approximations") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvd.ns3")
    spark.sql("CREATE TABLE IF NOT EXISTS mvd.ns3.t (k BIGINT, v DOUBLE)")
    def msgOf(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    // avg AUTO-EXPANDS to the sum/count pair — and the rewrite serves
    // avg(v) over the source from exactly that pair
    spark.sql("INSERT INTO mvd.ns3.t VALUES (1, 2.0), (1, 4.0), (2, 9.0)")
    spark.sql("""CREATE MATERIALIZED VIEW mvd.ns3.avgmv AS
                 SELECT k, avg(v) AS a FROM mvd.ns3.t GROUP BY k""")
    val cols = spark.table("mvd.ns3.avgmv").columns.toSeq
    assert(cols == Seq("k", "a_sum", "a_cnt"), cols.toString)
    val avgQ = spark.sql(
      "SELECT k, avg(v) AS a FROM mvd.ns3.t GROUP BY k ORDER BY k")
    val served = avgQ.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name().endsWith("avgmv") => r
    }.nonEmpty
    assert(served, avgQ.queryExecution.optimizedPlan.treeString)
    assert(avgQ.collect().map(_.toString).toSeq ==
      Seq("[1,3.0]", "[2,9.0]"))
    assert(msgOf("""CREATE MATERIALIZED VIEW mvd.ns3.m AS
                    SELECT k, avg(v) AS a, sum(v) AS a_sum
                    FROM mvd.ns3.t GROUP BY k""")
      .contains("duplicate output columns"))
    assert(msgOf("""CREATE MATERIALIZED VIEW mvd.ns3.m AS
                    SELECT k, count(DISTINCT v) AS n
                    FROM mvd.ns3.t GROUP BY k""").contains("DISTINCT"))
    assert(msgOf("""CREATE MATERIALIZED VIEW mvd.ns3.m AS
                    SELECT k, sum(v) FROM mvd.ns3.t GROUP BY k""")
      .toLowerCase.contains("alias"))
    // a GROUP BY expression is an expression KEY — but only when the
    // select list carries it under an alias to name the state column
    assert(msgOf("""CREATE MATERIALIZED VIEW mvd.ns3.m AS
                    SELECT count(*) AS n
                    FROM mvd.ns3.t GROUP BY k + 1""")
      .contains("select list"))
    assert(msgOf("""CREATE MATERIALIZED VIEW mvd.ns3.m AS
                    SELECT k FROM mvd.ns3.t GROUP BY k""")
      .contains("at least one aggregate"))
    assert(msgOf("""CREATE MATERIALIZED VIEW mvd.ns3.m AS
                    SELECT t.k, count(*) AS n
                    FROM mvd.ns3.t FULL JOIN mvd.ns3.t u ON t.k = u.k
                    GROUP BY t.k""").contains("INNER and LEFT"))
    assert(msgOf("""CREATE MATERIALIZED VIEW mvd.ns3.m AS
                    SELECT v, count(*) AS n FROM mvd.ns3.t""")
      .contains("GROUP BY"))
    // an unknown qualifier never leaks into the stored definition
    assert(msgOf("""CREATE MATERIALIZED VIEW mvd.ns3.m AS
                    SELECT k, sum(x.v) AS s FROM mvd.ns3.t GROUP BY k""")
      .contains("unsupported column reference"))
    // a ';' smuggled through a count() literal cannot corrupt the
    // serialized aggregate spec
    assert(msgOf("""CREATE MATERIALIZED VIEW mvd.ns3.m AS
                    SELECT k, count(nullif(CAST(v AS STRING), 'a;b')) AS n
                    FROM mvd.ns3.t GROUP BY k""").contains("';'"))
    // KNOWN aggregates outside the maintainable set route to the
    // not-maintainable diagnostic, not the misleading scalar/alias one
    assert(msgOf("""CREATE MATERIALIZED VIEW mvd.ns3.m AS
                    SELECT k, max_by(v, v) AS top
                    FROM mvd.ns3.t GROUP BY k""")
      .contains("not incrementally maintainable"))
    assert(msgOf("""CREATE MATERIALIZED VIEW mvd.ns3.m AS
                    SELECT k, stddev(v) AS sd
                    FROM mvd.ns3.t GROUP BY k""")
      .contains("not incrementally maintainable"))
    // the catch-all names the FULL supported set (avg and
    // approx_count_distinct included)
    assert(msgOf("""CREATE MATERIALIZED VIEW mvd.ns3.m AS
                    SELECT k, first(v) AS f
                    FROM mvd.ns3.t GROUP BY k""")
      .contains("approx_count_distinct"))
  }
}
