package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end Spark SQL through the graft catalog — the minimum slice
  * of SURVEY §7.4 and beyond: DDL, DSv2 writes, scans with pushdown,
  * time travel, transactions, views.
  */
class GraftCatalogSqlSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-wh").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.cat", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.cat.warehouse", warehouse)
    .getOrCreate()

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("cat").asInstanceOf[GraftCatalog]

  private val sf = "/root/testdata/sf0.001"

  test("namespace DDL via SQL") {
    spark.sql("CREATE NAMESPACE cat.ns1")
    val namespaces = spark.sql("SHOW NAMESPACES IN cat").collect().map(_.getString(0))
    assert(namespaces.contains("ns1"))
    spark.sql("ALTER NAMESPACE cat.ns1 SET PROPERTIES ('team'='graft')")
    val props = spark.sql("DESCRIBE NAMESPACE EXTENDED cat.ns1").collect()
    assert(props.exists(_.toString.contains("team")))
  }

  test("create table, append via DSv2, scan with pushdown") {
    spark.sql("""CREATE TABLE cat.ns1.lineitem (
      l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,
      l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,
      l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,
      l_linestatus STRING, l_shipdate TIMESTAMP_NTZ)""")
    val src = spark.read.parquet(s"$sf/lineitem.parquet")
    src.writeTo("cat.ns1.lineitem").append()
    assert(spark.table("cat.ns1.lineitem").count() == src.count())

    val q = spark.sql(
      "SELECT l_orderkey, l_quantity FROM cat.ns1.lineitem WHERE l_discount > 0.05")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_discount"),
      s"filter not pushed:\n$plan")
    assert(q.count() ==
      src.filter("l_discount > 0.05").count())
  }

  test("second append accumulates; INSERT INTO works") {
    val before = spark.table("cat.ns1.lineitem").count()
    spark.sql(
      s"INSERT INTO cat.ns1.lineitem SELECT * FROM parquet.`$sf/lineitem.parquet` LIMIT 100")
    assert(spark.table("cat.ns1.lineitem").count() == before + 100)
  }

  test("INSERT OVERWRITE replaces content") {
    spark.sql("CREATE TABLE cat.ns1.small (k BIGINT, v STRING)")
    spark.sql("INSERT INTO cat.ns1.small VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT OVERWRITE cat.ns1.small VALUES (9, 'z')")
    val rows = spark.table("cat.ns1.small").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 9)
  }

  test("copy-on-write DELETE WHERE") {
    spark.sql("CREATE TABLE cat.ns1.deltest (k BIGINT, v STRING)")
    spark.sql("INSERT INTO cat.ns1.deltest VALUES (1,'a'), (2,'b'), (3,'c')")
    cat.deleteWhere(spark,
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("ns1"), "deltest"),
      org.apache.spark.sql.functions.col("k") === 2)
    assert(spark.table("cat.ns1.deltest").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 3L)))
  }

  test("DELETE keeps rows where the predicate is NULL (SQL three-valued logic)") {
    // DELETE FROM t WHERE x > 5 on a row with x IS NULL: the predicate is
    // NULL, not TRUE — the row must survive. Exercises both the SQL
    // row-level path and the direct copy-on-write deleteWhere path.
    spark.sql("CREATE TABLE cat.ns1.delnull (k BIGINT, x BIGINT)")
    spark.sql("INSERT INTO cat.ns1.delnull VALUES (1, 10), (2, NULL), (3, 1)")
    spark.sql("DELETE FROM cat.ns1.delnull WHERE x > 5")
    assert(spark.table("cat.ns1.delnull").collect().map(_.getLong(0)).sorted
      .sameElements(Array(2L, 3L)),
      "NULL-predicate row was deleted by SQL DELETE")
    cat.deleteWhere(spark,
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("ns1"), "delnull"),
      org.apache.spark.sql.functions.col("x") < 5)
    assert(spark.table("cat.ns1.delnull").collect().map(_.getLong(0)).sorted
      .sameElements(Array(2L)),
      "NULL-predicate row was deleted by copy-on-write deleteWhere")
  }

  test("SQL DELETE FROM with compound predicate") {
    spark.sql("CREATE TABLE cat.ns1.sqldel (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO cat.ns1.sqldel VALUES (1,'keep'), (2,'drop'), (3,'drop'), (4,'keep')")
    spark.sql("DELETE FROM cat.ns1.sqldel WHERE v = 'drop' AND k >= 3")
    assert(spark.table("cat.ns1.sqldel").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L, 4L)))
    spark.sql("DELETE FROM cat.ns1.sqldel WHERE k IN (1, 4)")
    assert(spark.table("cat.ns1.sqldel").collect().map(_.getLong(0))
      .sameElements(Array(2L)))
  }

  test("SQL DELETE FROM on a nullable column keeps NULL-predicate rows") {
    spark.sql("CREATE TABLE cat.ns1.nulldel (k BIGINT, x BIGINT)")
    spark.sql(
      "INSERT INTO cat.ns1.nulldel VALUES (1, 10), (2, NULL), (3, 3), (4, NULL)")
    // x > 5 is NULL for rows 2 and 4 — SQL deletes only where TRUE,
    // so the NULL rows must survive the copy-on-write rewrite
    spark.sql("DELETE FROM cat.ns1.nulldel WHERE x > 5")
    assert(spark.table("cat.ns1.nulldel").collect().map(_.getLong(0)).sorted
      .sameElements(Array(2L, 3L, 4L)))
  }

  test("view DDL: aliases, COMMENT, TBLPROPERTIES, ALTER SET, SHOW VIEWS") {
    spark.sql("CREATE TABLE cat.ns1.vsrc (k BIGINT, s STRING)")
    spark.sql("INSERT INTO cat.ns1.vsrc VALUES (1, 'a'), (2, 'b')")
    spark.sql("""CREATE VIEW cat.ns1.valias (id, label)
                 COMMENT 'it''s aliased'
                 TBLPROPERTIES('owner'='qa', 'tier'='gold')
                 AS SELECT k, s FROM cat.ns1.vsrc""")
    // aliased columns resolve in queries against the view
    val rows = spark.sql(
      "SELECT id, label FROM cat.ns1.valias WHERE id > 1").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "b")))
    // comment + properties persisted on the catalog object
    val cat0 = spark.sessionState.catalogManager.catalog("cat")
      .asInstanceOf[GraftCatalog]
    val v = cat0.loadView(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("ns1"), "valias"))
    assert(v.properties().get("comment") == "it's aliased")
    assert(v.properties().get("owner") == "qa")
    // ALTER VIEW SET TBLPROPERTIES merges
    spark.sql("ALTER VIEW cat.ns1.valias SET TBLPROPERTIES('tier'='platinum')")
    val v2 = cat0.loadView(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("ns1"), "valias"))
    assert(v2.properties().get("tier") == "platinum")
    assert(v2.properties().get("owner") == "qa")
    // SHOW VIEWS lists it
    val shown = spark.sql("SHOW VIEWS IN cat.ns1").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(shown.contains(("ns1", "valias")))
  }

  test("SQL UPDATE: multi-assignment, old-row RHS, NULL condition rows kept") {
    spark.sql("CREATE TABLE cat.ns1.upd (k BIGINT, a BIGINT, b BIGINT)")
    spark.sql(
      "INSERT INTO cat.ns1.upd VALUES (1, 10, 100), (2, 20, 200), (3, NULL, 300)")
    // swap semantics: both RHS evaluate against the ORIGINAL row
    spark.sql("UPDATE cat.ns1.upd SET a = b, b = a WHERE k = 1")
    val r1 = spark.table("cat.ns1.upd").collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2))).sortBy(_._1)
    assert(r1.toSeq == Seq((1L, 100L, 10L), (2L, 20L, 200L), (3L, null, 300L)))
    // a > 15 is NULL for k=3 — that row must stay untouched
    // (k=1 has a=100 after the swap, so it updates too)
    spark.sql("UPDATE cat.ns1.upd SET b = b + 1 WHERE a > 15")
    val r2 = spark.table("cat.ns1.upd").collect()
      .map(r => (r.getLong(0), r.get(2))).sortBy(_._1)
    assert(r2.toSeq == Seq((1L, 11L), (2L, 201L), (3L, 300L)))
    // no WHERE updates every row; function-call RHS with commas parses
    spark.sql("UPDATE cat.ns1.upd SET b = greatest(b, 150, a)")
    val r3 = spark.table("cat.ns1.upd").collect()
      .map(r => (r.getLong(0), r.get(2))).sortBy(_._1)
    assert(r3.toSeq == Seq((1L, 150L), (2L, 201L), (3L, 300L)))
  }

  test("SQL MERGE INTO: upsert with update + insert clauses") {
    spark.sql("CREATE TABLE cat.ns1.mtgt (k BIGINT, v STRING, n BIGINT)")
    spark.sql(
      "INSERT INTO cat.ns1.mtgt VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    spark.sql("CREATE TABLE cat.ns1.msrc (k BIGINT, v STRING, n BIGINT)")
    spark.sql(
      "INSERT INTO cat.ns1.msrc VALUES (2, 'B', 200), (4, 'D', 400)")
    spark.sql("""MERGE INTO cat.ns1.mtgt AS t USING cat.ns1.msrc AS s
                 ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET v = s.v, n = t.n + s.n
                 WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, s.v, s.n)""")
    val rows = spark.table("cat.ns1.mtgt").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "a", 10L), (2L, "B", 220L),
      (3L, "c", 30L), (4L, "D", 400L)))
  }

  test("SQL MERGE INTO: delete-when-matched and subquery source") {
    spark.sql("CREATE TABLE cat.ns1.mdel (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO cat.ns1.mdel VALUES (1, 'keep'), (2, 'drop'), (3, 'keep')")
    spark.sql("""MERGE INTO cat.ns1.mdel t
                 USING (SELECT 2 AS kk UNION ALL SELECT 9) s
                 ON t.k = s.kk
                 WHEN MATCHED THEN DELETE""")
    assert(spark.table("cat.ns1.mdel").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 3L)))
  }

  test("SQL MERGE INTO: INSERT * maps source columns by name") {
    spark.sql("CREATE TABLE cat.ns1.mstar (k BIGINT, v STRING)")
    spark.sql("INSERT INTO cat.ns1.mstar VALUES (1, 'a')")
    spark.sql("CREATE TABLE cat.ns1.mssrc (k BIGINT, v STRING)")
    spark.sql("INSERT INTO cat.ns1.mssrc VALUES (1, 'A'), (2, 'B')")
    spark.sql("""MERGE INTO cat.ns1.mstar t USING cat.ns1.mssrc s ON t.k = s.k
                 WHEN NOT MATCHED THEN INSERT *""")
    val rows = spark.table("cat.ns1.mstar").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // k=1 matched with no matched clause -> kept unchanged; k=2 inserted
    assert(rows.toSeq == Seq((1L, "a"), (2L, "B")))
  }

  test("SQL MERGE INTO: cardinality violation is an error") {
    spark.sql("CREATE TABLE cat.ns1.mcard (k BIGINT, v STRING)")
    spark.sql("INSERT INTO cat.ns1.mcard VALUES (1, 'x')")
    spark.sql("CREATE TABLE cat.ns1.mcsrc (k BIGINT, v STRING)")
    spark.sql("INSERT INTO cat.ns1.mcsrc VALUES (1, 'a'), (1, 'b')")
    // Spark's native MERGE rewrite raises MERGE_CARDINALITY_VIOLATION
    // inside the single rewrite pass — no extra count() jobs
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO cat.ns1.mcard t USING cat.ns1.mcsrc s ON t.k = s.k
                   WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    assert(e.asInstanceOf[org.apache.spark.SparkThrowable].getCondition ==
      "MERGE_CARDINALITY_VIOLATION")
  }

  test("UPDATE and MERGE ride the session transaction atomically") {
    spark.sql("CREATE TABLE cat.ns1.txu (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO cat.ns1.txu VALUES (1, 10), (2, 20)")
    val cat0 = spark.sessionState.catalogManager.catalog("cat")
      .asInstanceOf[GraftCatalog]
    // rollback: the update's effects never publish
    cat0.beginTransaction()
    spark.sql("UPDATE cat.ns1.txu SET v = 999 WHERE k = 1")
    cat0.rollbackTransaction()
    assert(spark.table("cat.ns1.txu").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ==
      Seq((1L, 10L), (2L, 20L)))
    // commit: update + merge in ONE transaction, both-or-neither
    spark.sql("CREATE TABLE cat.ns1.txs (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO cat.ns1.txs VALUES (2, 200), (3, 300)")
    cat0.beginTransaction()
    spark.sql("UPDATE cat.ns1.txu SET v = v + 1 WHERE k = 2")
    spark.sql("""MERGE INTO cat.ns1.txu t USING cat.ns1.txs s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    cat0.commitTransaction()
    assert(spark.table("cat.ns1.txu").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ==
      Seq((1L, 10L), (2L, 200L), (3L, 300L)))
  }

  test("catalog time travel: VERSION AS OF") {
    spark.sql("CREATE TABLE cat.ns1.tt (k BIGINT)")
    val v1 = graft.tree.TreeOps.findLatestRoot(cat.storage).get.version
    spark.sql("INSERT INTO cat.ns1.tt VALUES (1)")
    spark.sql("INSERT INTO cat.ns1.tt VALUES (2)")
    assert(spark.table("cat.ns1.tt").count() == 2)
    assert(spark.sql(s"SELECT * FROM cat.ns1.tt VERSION AS OF ${v1 + 1}").count() == 1)
    assert(spark.sql(s"SELECT * FROM cat.ns1.tt VERSION AS OF $v1").count() == 0)
  }

  test("table time travel: VERSION AS OF 'snap:<id>' pins a table snapshot") {
    spark.sql("CREATE TABLE cat.ns1.sp (k BIGINT)")
    spark.sql("INSERT INTO cat.ns1.sp VALUES (1)")
    spark.sql("INSERT INTO cat.ns1.sp VALUES (2), (3)")
    val ids = spark.sql(
      "SELECT snapshot_id FROM cat.ns1.`sp$snapshots` ORDER BY snapshot_id")
      .collect().map(_.getLong(0))
    assert(ids.length == 2)
    // the ids $snapshots exposes pin the TABLE's own history — distinct
    // from bare-numeric catalog-version travel (previous test)
    assert(spark.sql(
      s"SELECT count(*) FROM cat.ns1.sp VERSION AS OF 'snap:${ids(0)}'")
      .collect()(0).getLong(0) == 1)
    assert(spark.sql(
      s"SELECT count(*) FROM cat.ns1.sp VERSION AS OF 'snap:${ids(1)}'")
      .collect()(0).getLong(0) == 3)
    val bad = intercept[Exception] {
      spark.sql("SELECT * FROM cat.ns1.sp VERSION AS OF 'snap:zzz'").collect()
    }
    assert(bad.getMessage.contains("malformed snapshot pin"), bad.getMessage)
    val gone = intercept[Exception] {
      spark.sql("SELECT * FROM cat.ns1.sp VERSION AS OF 'snap:99999'").collect()
    }
    assert(gone.getMessage.contains("no live snapshot"), gone.getMessage)
  }

  test("catalog time travel: TIMESTAMP AS OF") {
    spark.sql("CREATE TABLE cat.ns1.tts (k BIGINT)")
    spark.sql("INSERT INTO cat.ns1.tts VALUES (1)")
    Thread.sleep(50)
    val mid = java.time.Instant.now()
    Thread.sleep(50)
    spark.sql("INSERT INTO cat.ns1.tts VALUES (2)")
    assert(spark.table("cat.ns1.tts").count() == 2)
    val asOf = spark.sql(
      s"SELECT * FROM cat.ns1.tts TIMESTAMP AS OF '${java.sql.Timestamp.from(mid)}'")
    assert(asOf.count() == 1)
  }

  test("multi-table transaction: all-or-nothing visibility") {
    spark.sql("CREATE TABLE cat.ns1.txa (k BIGINT)")
    spark.sql("CREATE TABLE cat.ns1.txb (k BIGINT)")
    cat.beginTransaction()
    spark.sql("INSERT INTO cat.ns1.txa VALUES (1)")
    spark.sql("INSERT INTO cat.ns1.txb VALUES (1)")
    // inside the txn: own writes visible
    assert(spark.table("cat.ns1.txa").count() == 1)
    cat.commitTransaction()
    assert(spark.table("cat.ns1.txa").count() == 1)
    assert(spark.table("cat.ns1.txb").count() == 1)

    // rollback variant
    cat.beginTransaction()
    spark.sql("INSERT INTO cat.ns1.txa VALUES (2)")
    cat.rollbackTransaction()
    assert(spark.table("cat.ns1.txa").count() == 1)
  }

  test("views: CREATE VIEW / SELECT / DROP VIEW via extension SQL") {
    import org.apache.spark.sql.connector.catalog.Identifier
    spark.sql("CREATE TABLE cat.ns1.vtbl (k BIGINT, v STRING)")
    spark.sql("INSERT INTO cat.ns1.vtbl VALUES (1,'a'), (2,'b')")
    spark.sql("CREATE VIEW cat.ns1.v1 AS SELECT k FROM cat.ns1.vtbl WHERE k > 1")
    assert(spark.sql("SELECT * FROM cat.ns1.v1").collect().map(_.getLong(0))
      .sameElements(Array(2L)))
    val ident = Identifier.of(Array("ns1"), "v1")
    assert(cat.viewExists(ident))
    assert(cat.listViews("ns1").map(_.name()).contains("v1"))
    spark.sql("CREATE OR REPLACE VIEW cat.ns1.v1 AS SELECT k FROM cat.ns1.vtbl")
    assert(spark.sql("SELECT * FROM cat.ns1.v1").count() == 2)
    spark.sql("DROP VIEW cat.ns1.v1")
    assert(!cat.viewExists(ident))
  }

  test("views: per-column comments, SHOW CREATE VIEW, UNSET TBLPROPERTIES") {
    import org.apache.spark.sql.connector.catalog.Identifier
    spark.sql("""CREATE OR REPLACE VIEW cat.ns1.v2
      (key COMMENT 'the key, obviously', val)
      COMMENT 'demo view'
      TBLPROPERTIES ('team'='graft', 'tier'='gold')
      AS SELECT k, v FROM cat.ns1.vtbl""")
    // aliases + comments land in the stored schema
    val view = cat.loadView(Identifier.of(Array("ns1"), "v2"))
    assert(view.schema().fieldNames.toSeq == Seq("key", "val"))
    assert(view.columnComments().toSeq == Seq("the key, obviously", null))
    assert(spark.sql("SELECT key FROM cat.ns1.v2").count() == 2)

    // SHOW CREATE VIEW reconstructs runnable DDL
    val ddl = spark.sql("SHOW CREATE VIEW cat.ns1.v2").collect()(0).getString(0)
    assert(ddl.contains("CREATE VIEW cat.ns1.v2"), ddl)
    assert(ddl.contains("COMMENT 'the key, obviously'"), ddl)
    assert(ddl.contains("COMMENT 'demo view'"), ddl)
    assert(ddl.contains("'team' = 'graft'"), ddl)
    assert(ddl.contains("AS SELECT"), ddl)
    spark.sql("DROP VIEW IF EXISTS cat.ns1.v2r")
    spark.sql(ddl.replace("cat.ns1.v2", "cat.ns1.v2r"))
    assert(spark.sql("SELECT key FROM cat.ns1.v2r").count() == 2)

    // UNSET removes properties; IF EXISTS tolerates absent keys
    spark.sql("ALTER VIEW cat.ns1.v2 UNSET TBLPROPERTIES ('tier')")
    val props = cat.loadView(Identifier.of(Array("ns1"), "v2")).properties()
    assert(props.get("team") == "graft" && !props.containsKey("tier"))
    val e = intercept[Exception] {
      spark.sql("ALTER VIEW cat.ns1.v2 UNSET TBLPROPERTIES ('ghost')")
    }
    assert(e.getMessage.contains("no such properties"))
    spark.sql("ALTER VIEW cat.ns1.v2 UNSET TBLPROPERTIES IF EXISTS ('ghost')")
    spark.sql("DROP VIEW cat.ns1.v2")
    spark.sql("DROP VIEW cat.ns1.v2r")
  }

  test("BEGIN/COMMIT/ROLLBACK TRANSACTION SQL") {
    spark.sql("CREATE TABLE cat.ns1.sqltx (k BIGINT)")
    spark.sql("USE cat")
    try {
      spark.sql("BEGIN TRANSACTION")
      spark.sql("INSERT INTO cat.ns1.sqltx VALUES (1)")
      spark.sql("COMMIT TRANSACTION")
      assert(spark.table("cat.ns1.sqltx").count() == 1)
      spark.sql("BEGIN")
      spark.sql("INSERT INTO cat.ns1.sqltx VALUES (2)")
      spark.sql("ROLLBACK")
      assert(spark.table("cat.ns1.sqltx").count() == 1)
    } finally spark.sql("USE spark_catalog")
  }

  test("SHOW TABLES / DESCRIBE TABLE / DROP TABLE") {
    val tables = spark.sql("SHOW TABLES IN cat.ns1").collect().map(_.getString(1))
    assert(tables.contains("lineitem"))
    val desc = spark.sql("DESCRIBE TABLE cat.ns1.lineitem").collect()
    assert(desc.exists(r => r.getString(0) == "l_orderkey"))
    spark.sql("CREATE TABLE cat.ns1.tmp (x INT)")
    spark.sql("DROP TABLE cat.ns1.tmp")
    assert(!spark.sql("SHOW TABLES IN cat.ns1").collect().map(_.getString(1))
      .contains("tmp"))
  }

  test("ALTER TABLE add column + set property") {
    spark.sql("CREATE TABLE cat.ns1.alt (a INT)")
    spark.sql("INSERT INTO cat.ns1.alt VALUES (1)")
    spark.sql("ALTER TABLE cat.ns1.alt ADD COLUMN b STRING")
    assert(spark.table("cat.ns1.alt").schema.fieldNames.sameElements(Array("a", "b")))
    // existing files lack the new column → read as nulls
    val row = spark.table("cat.ns1.alt").collect()(0)
    assert(row.getInt(0) == 1 && row.isNullAt(1))
  }
}
