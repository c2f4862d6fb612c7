package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ALTER TABLE schema evolution (SURVEY §2.1; reference
  * Olympia.java:440-491). RENAME COLUMN is metadata-only: data files
  * keep their physical names forever and the scan re-labels — so old
  * and new files stay byte-compatible across any number of renames.
  * Type changes are widening-only; nullability may only relax.
  */
class RenameColumnSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-rn").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.rn", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.rn.warehouse", warehouse)
    .getOrCreate()

  private def setupTable(): Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rn.ns")
    spark.sql("DROP TABLE IF EXISTS rn.ns.t")
    spark.sql("CREATE TABLE rn.ns.t (id BIGINT, amount INT, tag STRING)")
    spark.sql("INSERT INTO rn.ns.t VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 30, 'c')")
  }

  test("rename is metadata-only: old files readable, stats still prune") {
    setupTable()
    spark.sql("ALTER TABLE rn.ns.t RENAME COLUMN amount TO amt")
    val rows = spark.sql("SELECT id, amt FROM rn.ns.t WHERE amt >= 20")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((2L, 20), (3L, 30)))
    // data files on disk still carry the PHYSICAL name
    val dataFiles = scala.jdk.javaapi.CollectionConverters.asScala(
      Files.walk(java.nio.file.Paths.get(warehouse)).iterator())
      .filter(_.toString.endsWith(".parquet")).map(_.toString).toSeq
    assert(dataFiles.nonEmpty)
    val physical = spark.read.parquet(dataFiles: _*).schema.fieldNames.toSet
    assert(physical.contains("amount") && !physical.contains("amt"),
      s"files should keep physical names, saw $physical")
  }

  test("writes after a rename keep physical names; mixed files read fine") {
    spark.sql("INSERT INTO rn.ns.t VALUES (4, 40, 'd')")
    assert(spark.sql("SELECT sum(amt) FROM rn.ns.t").collect()(0).getLong(0) == 100L)
    val dataFiles = scala.jdk.javaapi.CollectionConverters.asScala(
      Files.walk(java.nio.file.Paths.get(warehouse)).iterator())
      .filter(_.toString.endsWith(".parquet")).map(_.toString).toSeq
    val physical = dataFiles.map(f => spark.read.parquet(f).schema.fieldNames.toSet)
    assert(physical.forall(s => s.contains("amount") && !s.contains("amt")),
      s"every file must use the physical name, saw $physical")
  }

  test("row-level ops (UPDATE / DELETE / MERGE) work on a renamed column") {
    spark.sql("UPDATE rn.ns.t SET amt = amt + 1 WHERE amt = 40")
    assert(spark.sql("SELECT amt FROM rn.ns.t WHERE id = 4")
      .collect()(0).getInt(0) == 41)
    spark.sql("DELETE FROM rn.ns.t WHERE amt = 41")
    assert(spark.table("rn.ns.t").count() == 3)
    spark.sql("""MERGE INTO rn.ns.t USING (SELECT 1 AS id, 99 AS amt) s
      ON rn.ns.t.id = s.id
      WHEN MATCHED THEN UPDATE SET amt = s.amt
      WHEN NOT MATCHED THEN INSERT (id, amt, tag) VALUES (s.id, s.amt, 'x')""")
    assert(spark.sql("SELECT amt FROM rn.ns.t WHERE id = 1")
      .collect()(0).getInt(0) == 99)
  }

  test("re-rename keeps the ORIGINAL physical name") {
    spark.sql("ALTER TABLE rn.ns.t RENAME COLUMN amt TO amount2")
    assert(spark.sql("SELECT sum(amount2) FROM rn.ns.t")
      .collect()(0).getLong(0) == 149L)
    val cat = spark.sessionState.catalogManager.catalog("rn")
      .asInstanceOf[GraftCatalog]
    val tbl = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("ns"), "t"))
    val f = tbl.schema().find(_.name == "amount2").get
    assert(ColumnMapping.physicalName(f) == "amount")
  }

  test("widening retype is metadata-only and old files promote on read") {
    spark.sql("ALTER TABLE rn.ns.t ALTER COLUMN amount2 TYPE BIGINT")
    val r = spark.sql("SELECT id, amount2 FROM rn.ns.t WHERE amount2 > 20")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(r.toSeq == Seq((1L, 99L), (3L, 30L)))
  }

  test("narrowing retype and NOT NULL tightening are refused") {
    // Spark's own analyzer already rejects non-upcasts; graft's
    // widening-only rule backstops anything the analyzer lets through
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE rn.ns.t ALTER COLUMN amount2 TYPE INT")
    }
    assert(e1.getMessage.contains("widening") ||
      e1.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE rn.ns.t ALTER COLUMN tag SET NOT NULL")
    }
    assert(e2.getMessage.contains("relaxing") ||
      e2.getMessage.contains("non-nullable"))
  }

  test("partition columns cannot be renamed (directory layout is storage)") {
    spark.sql("DROP TABLE IF EXISTS rn.ns.p")
    spark.sql(
      "CREATE TABLE rn.ns.p (v BIGINT, region STRING) PARTITIONED BY (region)")
    spark.sql("INSERT INTO rn.ns.p VALUES (1, 'eu'), (2, 'us')")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE rn.ns.p RENAME COLUMN region TO r")
    }
    assert(e.getMessage.contains("partition"))
  }

  test("serializable conflict intervals line up across a rename") {
    // a reader filtering on the renamed column must record PHYSICAL
    // interval keys, so a disjoint append still commits
    spark.sql("DROP TABLE IF EXISTS rn.ns.c")
    spark.sql("CREATE TABLE rn.ns.c (k BIGINT, v STRING)")
    spark.sql("INSERT INTO rn.ns.c VALUES (1, 'a'), (100, 'z')")
    spark.sql("ALTER TABLE rn.ns.c RENAME COLUMN k TO key")
    assert(spark.sql("SELECT v FROM rn.ns.c WHERE key <= 1").count() == 1)
  }
}
