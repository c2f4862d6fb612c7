package graft.maintain

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.GraftCatalog

/** Multi-source (≥3-way) join materialized views — the star-schema
  * rollup `fact ⋈ dim1 ⋈ dim2`. Maintenance is the n-ary telescoping
  * bilinear rule: one side's delta at a time, earlier sides pinned at
  * prev, later sides at cur — appends refresh unsigned-incrementally,
  * deletes ride the same terms signed (cdc) when every aggregate
  * retracts, and non-retractable aggregates under deletes recompute
  * honestly. The rewrite serves the full chain and must never serve a
  * SUB-chain (a 2-way query over the view's first join).
  */
class NaryJoinMvSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-nary").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.nry", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.nry.warehouse", warehouse)
    .getOrCreate()

  private def rows(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.toString).toSeq

  private def noRewrite[T](f: => T): T = {
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try f finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
  }

  private def usesMv(sql: String, view: String = "mv"): Boolean =
    spark.sql(sql).queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
          if r.relation.table.name().endsWith("." + view) => r
    }.nonEmpty

  private def refresh(view: String): String =
    spark.sql(s"REFRESH MATERIALIZED VIEW nry.ns1.$view").head.getString(0)

  test("3-way DDL view: per-side appends incremental, fact and dim " +
      "deletes cdc, state matches truth, rewrite serves chain only") {
    spark.sql("CREATE NAMESPACE nry.ns1")
    spark.sql("""CREATE TABLE nry.ns1.fact (
                   id BIGINT, ck BIGINT, amt DOUBLE)""")
    spark.sql("CREATE TABLE nry.ns1.dim1 (ck BIGINT, nk BIGINT)")
    spark.sql("CREATE TABLE nry.ns1.dim2 (nk BIGINT, region STRING)")
    spark.sql("""INSERT INTO nry.ns1.fact
                 SELECT id, id % 40, CAST(id AS DOUBLE) / 2
                 FROM range(0, 3000, 1, 4) WHERE id % 3 != 0""")
    spark.sql("""INSERT INTO nry.ns1.dim1
                 SELECT id, id % 7 FROM range(0, 40, 1, 2)
                 WHERE id % 2 = 0""")
    spark.sql("""INSERT INTO nry.ns1.dim2
                 SELECT id, concat('r', id % 3) FROM range(0, 7, 1, 2)
                 WHERE id < 5""")
    spark.sql("""CREATE MATERIALIZED VIEW nry.ns1.mv AS
                 SELECT region, count(*) AS n,
                        count(CAST(amt AS DECIMAL(18,2))) AS np,
                        sum(CAST(amt AS DECIMAL(18,2))) AS total
                 FROM nry.ns1.fact
                 JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
                 JOIN nry.ns1.dim2 ON dim1.nk = dim2.nk
                 GROUP BY region""")

    def truth: Seq[String] = noRewrite(rows(
      """SELECT region, count(*) AS n,
                count(CAST(amt AS DECIMAL(18,2))) AS np,
                sum(CAST(amt AS DECIMAL(18,2))) AS total
         FROM nry.ns1.fact
         JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
         JOIN nry.ns1.dim2 ON dim1.nk = dim2.nk
         GROUP BY region ORDER BY region"""))
    def state: Seq[String] =
      rows("SELECT region, n, np, total FROM nry.ns1.mv ORDER BY region")
    assert(state == truth)

    // FACT append: delta ⋈ dim1_cur ⋈ dim2_cur
    spark.sql("""INSERT INTO nry.ns1.fact
                 SELECT id, id % 40, CAST(id AS DOUBLE) / 2
                 FROM range(0, 3000, 1, 4) WHERE id % 3 = 0""")
    assert(refresh("mv") == "incremental")
    assert(state == truth, "fact append broke the state")

    // DIM1 append: fact_prev ⋈ Δdim1 ⋈ dim2_cur (new matches surface)
    spark.sql("""INSERT INTO nry.ns1.dim1
                 SELECT id, id % 7 FROM range(0, 40, 1, 2)
                 WHERE id % 2 = 1""")
    assert(refresh("mv") == "incremental")
    assert(state == truth, "dim1 append broke the state")

    // DIM2 append: fact_prev ⋈ dim1_prev ⋈ Δdim2
    spark.sql("""INSERT INTO nry.ns1.dim2
                 SELECT id, concat('r', id % 3) FROM range(0, 7, 1, 2)
                 WHERE id >= 5""")
    assert(refresh("mv") == "incremental")
    assert(state == truth, "dim2 append broke the state")

    // FACT delete → signed feed term (cdc)
    spark.sql("DELETE FROM nry.ns1.fact WHERE id % 11 = 4")
    assert(refresh("mv") == "cdc")
    assert(state == truth, "fact delete broke the state")

    // DIM delete → signed feed term on the dim side (cdc): every
    // group contributed through the deleted dim rows retracts
    spark.sql("DELETE FROM nry.ns1.dim1 WHERE ck % 13 = 2")
    assert(refresh("mv") == "cdc")
    assert(state == truth, "dim1 delete broke the state")

    // the rewrite serves the FULL chain (any join order the optimizer
    // leaves intact; the pair-set match is order-insensitive) ...
    assert(usesMv("""SELECT region, count(*) AS n
                     FROM nry.ns1.fact
                     JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
                     JOIN nry.ns1.dim2 ON dim1.nk = dim2.nk
                     GROUP BY region"""))
    // ... but NEVER a sub-chain: the view aggregates over all three
    // sides, a 2-way query over the first join has different content
    assert(!usesMv("""SELECT dim1.nk, count(*) AS n
                      FROM nry.ns1.fact
                      JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
                      GROUP BY dim1.nk"""),
      "a 2-way sub-chain query must not be served from a 3-way view")
    // different pair set over the same three tables must decline too
    assert(!usesMv("""SELECT region, count(*) AS n
                      FROM nry.ns1.fact
                      JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
                      JOIN nry.ns1.dim2 ON fact.id = dim2.nk
                      GROUP BY region"""),
      "a different join graph must not be served")
  }

  test("n-ary composes with WHERE and expression keys; $views lists " +
      "all sides and tracks n-ary freshness") {
    // defining predicate + a zone-insensitive expression key on a
    // 3-way chain: every maintenance term restricts and keys its
    // joined delta exactly like the single-source paths
    spark.sql("""CREATE MATERIALIZED VIEW nry.ns1.mvw AS
                 SELECT id % 5 AS bucket, count(*) AS n,
                        count(CAST(amt AS DECIMAL(18,2))) AS np,
                        sum(CAST(amt AS DECIMAL(18,2))) AS total
                 FROM nry.ns1.fact
                 JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
                 JOIN nry.ns1.dim2 ON dim1.nk = dim2.nk
                 WHERE region <> 'r1'
                 GROUP BY id % 5""")
    def truthW: Seq[String] = noRewrite(rows(
      """SELECT id % 5 AS bucket, count(*) AS n,
                count(CAST(amt AS DECIMAL(18,2))) AS np,
                sum(CAST(amt AS DECIMAL(18,2))) AS total
         FROM nry.ns1.fact
         JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
         JOIN nry.ns1.dim2 ON dim1.nk = dim2.nk
         WHERE region <> 'r1'
         GROUP BY 1 ORDER BY bucket"""))
    def stateW: Seq[String] =
      rows("SELECT bucket, n, np, total FROM nry.ns1.mvw ORDER BY bucket")
    assert(stateW == truthW)
    spark.sql("""INSERT INTO nry.ns1.fact
                 SELECT id, id % 40, CAST(id AS DOUBLE)
                 FROM range(50000, 50600, 1, 2)""")
    assert(refresh("mvw") == "incremental")
    assert(stateW == truthW, "fact append broke the filtered state")
    spark.sql("DELETE FROM nry.ns1.fact WHERE id >= 50000 AND id % 3 = 1")
    assert(refresh("mvw") == "cdc")
    assert(stateW == truthW, "fact delete broke the filtered state")
    // a WHERE row-move across the predicate via a dim delete: rows
    // joined through deleted dim1 rows leave the domain entirely
    spark.sql("DELETE FROM nry.ns1.dim1 WHERE nk = 3")
    assert(refresh("mvw") == "cdc")
    assert(stateW == truthW, "dim delete broke the filtered state")
    // the rewrite serves the filtered n-ary aggregate only when the
    // query carries the predicate
    assert(usesMv("""SELECT id % 5 AS bucket, count(*) AS n
                     FROM nry.ns1.fact
                     JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
                     JOIN nry.ns1.dim2 ON dim1.nk = dim2.nk
                     WHERE region <> 'r1'
                     GROUP BY id % 5""", view = "mvw"))
    assert(!usesMv("""SELECT id % 5 AS bucket, count(*) AS n
                      FROM nry.ns1.fact
                      JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
                      JOIN nry.ns1.dim2 ON dim1.nk = dim2.nk
                      GROUP BY id % 5""", view = "mvw"),
      "dropping the defining predicate must decline")

    // $views: all extra sides listed; a dim2 append flips fresh=false
    // until the next refresh absorbs it
    val vrow = spark.sql(
      """SELECT join_source, fresh FROM nry.ns1.`fact$views`
         WHERE view_name = 'mv'""").head
    assert(vrow.getString(0) == "ns1.dim1,ns1.dim2", vrow.toString)
    spark.sql("INSERT INTO nry.ns1.dim2 VALUES (90, 'r0')")
    val stale = spark.sql(
      """SELECT fresh FROM nry.ns1.`fact$views`
         WHERE view_name = 'mv'""").head.getBoolean(0)
    assert(!stale, "an unabsorbed extra-side commit must read stale")
    // mv's pending range also holds this test's fact deletes → cdc
    assert(refresh("mv") == "cdc")
    assert(spark.sql(
      """SELECT fresh FROM nry.ns1.`fact$views`
         WHERE view_name = 'mv'""").head.getBoolean(0))
  }

  test("a 4-way chain maintains by the same telescoping rule and " +
      "serves global roll-ups") {
    spark.sql("CREATE TABLE nry.ns1.dim3 (r2 STRING, zone STRING)")
    spark.sql("""INSERT INTO nry.ns1.dim3 VALUES
                 ('r0', 'west'), ('r1', 'east')""")
    spark.sql("""CREATE MATERIALIZED VIEW nry.ns1.mv4 AS
                 SELECT zone, count(*) AS n,
                        count(CAST(amt AS DECIMAL(18,2))) AS np,
                        sum(CAST(amt AS DECIMAL(18,2))) AS total
                 FROM nry.ns1.fact
                 JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
                 JOIN nry.ns1.dim2 ON dim1.nk = dim2.nk
                 JOIN nry.ns1.dim3 ON dim2.region = dim3.r2
                 GROUP BY zone""")
    def truth4: Seq[String] = noRewrite(rows(
      """SELECT zone, count(*) AS n,
                count(CAST(amt AS DECIMAL(18,2))) AS np,
                sum(CAST(amt AS DECIMAL(18,2))) AS total
         FROM nry.ns1.fact
         JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
         JOIN nry.ns1.dim2 ON dim1.nk = dim2.nk
         JOIN nry.ns1.dim3 ON dim2.region = dim3.r2
         GROUP BY zone ORDER BY zone"""))
    def state4: Seq[String] =
      rows("SELECT zone, n, np, total FROM nry.ns1.mv4 ORDER BY zone")
    assert(state4 == truth4)
    // appends on the outermost (4th) side and the fact side
    spark.sql("INSERT INTO nry.ns1.dim3 VALUES ('r2', 'north')")
    assert(refresh("mv4") == "incremental")
    assert(state4 == truth4, "dim3 append broke the 4-way state")
    spark.sql("""INSERT INTO nry.ns1.fact
                 SELECT id, id % 40, CAST(id AS DOUBLE)
                 FROM range(60000, 60400, 1, 2)""")
    assert(refresh("mv4") == "incremental")
    assert(state4 == truth4, "fact append broke the 4-way state")
    spark.sql("DELETE FROM nry.ns1.fact WHERE id >= 60000 AND id % 2 = 0")
    assert(refresh("mv4") == "cdc")
    assert(state4 == truth4, "fact delete broke the 4-way state")
    // the rewrite serves the 4-way chain, including the GLOBAL
    // roll-up (no GROUP BY — partial counts/sums re-aggregate)
    assert(usesMv("""SELECT zone, count(*) AS n
                     FROM nry.ns1.fact
                     JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
                     JOIN nry.ns1.dim2 ON dim1.nk = dim2.nk
                     JOIN nry.ns1.dim3 ON dim2.region = dim3.r2
                     GROUP BY zone""", view = "mv4"))
    val globalQ = """SELECT count(*) AS n,
                            sum(CAST(amt AS DECIMAL(18,2))) AS total
                     FROM nry.ns1.fact
                     JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
                     JOIN nry.ns1.dim2 ON dim1.nk = dim2.nk
                     JOIN nry.ns1.dim3 ON dim2.region = dim3.r2"""
    assert(usesMv(globalQ, view = "mv4"),
      "the global roll-up must be served from the 4-way view")
    val served = spark.sql(globalQ).head.toString
    val scratch = noRewrite(rows(globalQ)).head
    assert(served == scratch, s"global roll-up diverged: $served")
  }

  test("procedure path with extra_joins; min/max under deletes " +
      "recomputes honestly; DROP deregisters every source") {
    spark.sql("""CALL nry.system.create_materialized_view(
                   namespace => 'ns1', name => 'mv2',
                   source_namespace => 'ns1', source_table => 'fact',
                   group_by => 'region',
                   aggs => 'n:count:1;hi:max:amt',
                   join_namespace => 'ns1', join_table => 'dim1',
                   join_on => 'ck=ck',
                   extra_joins => 'ns1|dim2|nk=nk')""")
    def truth2: Seq[String] = noRewrite(rows(
      """SELECT region, count(*) AS n, max(amt) AS hi
         FROM nry.ns1.fact
         JOIN nry.ns1.dim1 ON fact.ck = dim1.ck
         JOIN nry.ns1.dim2 ON dim1.nk = dim2.nk
         GROUP BY region ORDER BY region"""))
    def state2: Seq[String] =
      rows("SELECT region, n, hi FROM nry.ns1.mv2 ORDER BY region")
    assert(state2 == truth2)

    // append stays incremental for ANY aggregate set
    spark.sql("INSERT INTO nry.ns1.fact VALUES (90001, 2, 999.5)")
    assert(refresh("mv2") == "incremental")
    assert(state2 == truth2)

    // a delete with max() in the spec cannot retract — honest full
    spark.sql("DELETE FROM nry.ns1.fact WHERE id = 90001")
    assert(refresh("mv2") == "full")
    assert(state2 == truth2)

    // DROP removes the registry entry on ALL THREE sources
    spark.sql("DROP MATERIALIZED VIEW nry.ns1.mv2")
    val cat = spark.sessionState.catalogManager.catalog("nry")
      .asInstanceOf[GraftCatalog]
    import org.apache.spark.sql.connector.catalog.Identifier
    for (t <- Seq("fact", "dim1", "dim2")) {
      val derived = Option(cat.loadTable(Identifier.of(Array("ns1"), t))
        .properties().get(MaterializedViews.DerivedProp)).getOrElse("")
      assert(!derived.contains("mv2"), s"$t still lists mv2: $derived")
    }
  }
}
