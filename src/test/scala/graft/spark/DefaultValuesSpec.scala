package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Column DEFAULT values (SUPPORT_COLUMN_DEFAULT_VALUE): INSERTs that
  * omit the column get CURRENT_DEFAULT from the analyzer; rows written
  * BEFORE the column existed read EXISTS_DEFAULT (the parquet readers
  * fill missing fields with it) — so ADD COLUMN … DEFAULT stays
  * metadata-only, and changing a default later never rewrites or
  * reinterprets old rows.
  */
class DefaultValuesSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-dfl").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.dv", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.dv.warehouse", warehouse)
    .getOrCreate()

  test("CREATE TABLE with DEFAULT fills omitted INSERT columns") {
    spark.sql("CREATE NAMESPACE dv.ns")
    spark.sql("""CREATE TABLE dv.ns.t (
      k BIGINT, status STRING DEFAULT 'new', score DOUBLE DEFAULT 1.5)""")
    spark.sql("INSERT INTO dv.ns.t (k) VALUES (1), (2)")
    spark.sql("INSERT INTO dv.ns.t VALUES (3, 'done', 9.9)")
    spark.sql("INSERT INTO dv.ns.t (k, status) VALUES (4, DEFAULT)")
    val rows = spark.sql("SELECT k, status, score FROM dv.ns.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, "new", 1.5), (2L, "new", 1.5),
      (3L, "done", 9.9), (4L, "new", 1.5)))
  }

  test("ADD COLUMN DEFAULT: old files read the default, not null") {
    spark.sql("ALTER TABLE dv.ns.t ADD COLUMN tier INT DEFAULT 3")
    // rows 1-4 predate the column — EXISTS_DEFAULT serves 3
    assert(spark.sql("SELECT sum(tier) FROM dv.ns.t").head.getLong(0) == 12)
    spark.sql("INSERT INTO dv.ns.t (k) VALUES (5)")
    assert(spark.sql("SELECT tier FROM dv.ns.t WHERE k = 5")
      .head.getInt(0) == 3)
    assert(spark.sql("SELECT count(*) FROM dv.ns.t WHERE tier = 3")
      .head.getLong(0) == 5)
  }

  test("ALTER COLUMN SET DEFAULT changes future inserts only") {
    spark.sql("ALTER TABLE dv.ns.t ALTER COLUMN tier SET DEFAULT 7")
    spark.sql("INSERT INTO dv.ns.t (k) VALUES (6)")
    val byK = spark.sql("SELECT k, tier FROM dv.ns.t")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byK(6) == 7, "new default for new rows")
    assert(byK(1) == 3 && byK(5) == 3,
      "pre-existing rows keep reading their original default")
  }

  test("defaults survive filters, pruning, and row-level ops") {
    assert(spark.sql("SELECT k FROM dv.ns.t WHERE tier = 7")
      .collect().map(_.getLong(0)).toSeq == Seq(6L))
    spark.sql("UPDATE dv.ns.t SET score = 0.0 WHERE tier = 3 AND k <= 2")
    assert(spark.sql(
      "SELECT count(*) FROM dv.ns.t WHERE score = 0.0").head.getLong(0) == 2)
    assert(spark.sql("SELECT tier FROM dv.ns.t WHERE k = 1").head.getInt(0) == 3,
      "the copy-on-write rewrite materialized the default it read")
  }
}
