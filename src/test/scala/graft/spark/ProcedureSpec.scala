package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `CALL <catalog>.system.<proc>(...)` — the maintenance jobs driven
  * through Spark's DSv2 stored-procedure surface, as an operator
  * would run them.
  */
class ProcedureSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-proc").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.pr", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.pr.warehouse", warehouse)
    .getOrCreate()

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("pr").asInstanceOf[GraftCatalog]

  test("compact_table via CALL bin-packs and preserves content") {
    spark.sql("CREATE NAMESPACE pr.ns")
    spark.sql("CREATE TABLE pr.ns.t (k BIGINT, v STRING)")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO pr.ns.t VALUES ($i, 'v$i')"))
    val row = spark.sql(
      "CALL pr.system.compact_table('ns', 't')").collect()(0)
    assert(row.getInt(0) == 4 && row.getInt(1) == 1)
    assert(spark.table("pr.ns.t").count() == 4)
    assert(spark.sql("SELECT sum(k) FROM pr.ns.t").collect()(0).getLong(0) == 10)
  }

  test("named arguments and defaults") {
    (5 to 6).foreach(i => spark.sql(s"INSERT INTO pr.ns.t VALUES ($i, 'v$i')"))
    val row = spark.sql(
      "CALL pr.system.compact_table(namespace => 'ns', `table` => 't', " +
        "target_files => 1)").collect()(0)
    assert(row.getInt(1) == 1)
  }

  test("expire_snapshots then remove_orphan_files cleans history") {
    val expired = spark.sql(
      "CALL pr.system.expire_snapshots('ns', 't', 1)").collect()(0).getInt(0)
    assert(expired > 0)
    val dry = spark.sql(
      "CALL pr.system.remove_orphan_files('ns', 't', true)").collect()
    assert(dry.nonEmpty, "expired snapshots must leave orphans")
    val removed = spark.sql(
      "CALL pr.system.remove_orphan_files('ns', 't')").collect()
    assert(removed.length == dry.length)
    assert(spark.sql(
      "CALL pr.system.remove_orphan_files('ns', 't', true)").collect().isEmpty)
    assert(spark.table("pr.ns.t").count() == 6)
  }

  test("import_files registers existing parquet metadata-only") {
    spark.sql("CREATE TABLE pr.ns.imp (k BIGINT, v STRING)")
    // write a parquet file under the catalog root, outside any table
    import spark.implicits._
    val rel = "staging/ext.parquet"
    val tmp = Files.createTempDirectory("graft-ext")
    Seq((100L, "x"), (101L, "y")).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator()
    var src: java.nio.file.Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.toString.endsWith(".parquet")) src = p
    }
    val dst = java.nio.file.Paths.get(warehouse, rel)
    Files.createDirectories(dst.getParent)
    Files.copy(src, dst)
    val n = spark.sql(
      s"CALL pr.system.import_files('ns', 'imp', array('$rel'))")
      .collect()(0).getInt(0)
    assert(n == 1)
    assert(spark.table("pr.ns.imp").count() == 2)
  }

  test("expire_catalog_versions bounds time-travel history") {
    val n = spark.sql("CALL pr.system.expire_catalog_versions(2)")
      .collect()(0).getInt(0)
    assert(n > 0)
    assert(spark.table("pr.ns.t").count() == 6)
  }

  test("rollback_catalog restores an earlier catalog version") {
    spark.sql("CREATE TABLE pr.ns.rb (k BIGINT)")
    spark.sql("INSERT INTO pr.ns.rb VALUES (1)")
    val v = graft.tree.TreeOps.findLatestRoot(cat.storage).get.version
    spark.sql("INSERT INTO pr.ns.rb VALUES (2)")
    assert(spark.table("pr.ns.rb").count() == 2)
    val row = spark.sql(s"CALL pr.system.rollback_catalog($v)").collect()(0)
    assert(row.getLong(1) == v && row.getLong(0) > v)
    assert(spark.table("pr.ns.rb").count() == 1)
  }

  test("create_tag pins a snapshot readable as VERSION AS OF '<tag>'") {
    spark.sql("CREATE TABLE pr.ns.tg (k BIGINT)")
    spark.sql("INSERT INTO pr.ns.tg VALUES (1), (2)")
    val row = spark.sql("CALL pr.system.create_tag('ns', 'tg', 'first')")
      .collect()(0)
    assert(row.getString(0) == "first")
    val refs = spark.sql("SELECT name, snapshot_id, type FROM pr.ns.`tg$refs`")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(refs == Seq(("first", 0L, "tag")))
    spark.sql("INSERT INTO pr.ns.tg VALUES (3)")
    assert(spark.table("pr.ns.tg").count() == 3)
    assert(spark.sql("SELECT count(*) FROM pr.ns.tg VERSION AS OF 'first'")
      .collect()(0).getLong(0) == 2)
    // the tag survives history the snapshot-log spills: many more
    // commits on a tight inline window, then read the tag again
    spark.sql("""ALTER TABLE pr.ns.tg
      SET TBLPROPERTIES ('graft.snapshot-log.inline-max'='2')""")
    (4 to 12).foreach(i => spark.sql(s"INSERT INTO pr.ns.tg VALUES ($i)"))
    assert(spark.sql("SELECT count(*) FROM pr.ns.tg VERSION AS OF 'first'")
      .collect()(0).getLong(0) == 2,
      "tagged snapshot must resolve through spilled snapshot-log segments")
    // unknown tags are refused, not misread
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM pr.ns.tg VERSION AS OF 'ghost'").collect()
    }
    assert(e.getMessage.contains("no such tag"))
    val dropped = spark.sql("CALL pr.system.drop_tag('ns', 'tg', 'first')")
      .collect()(0)
    assert(dropped.getString(0) == "first")
    intercept[Exception] {
      spark.sql("SELECT * FROM pr.ns.tg VERSION AS OF 'first'").collect()
    }
  }

  test("procedures are listable") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val ids = cat.listProcedures(Array("system")).map(_.name()).toSet
    assert(GraftProcedures.names.toSet.subsetOf(ids))
    intercept[Exception] {
      cat.loadProcedure(Identifier.of(Array("system"), "ghost"))
    }
  }
}
