package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `MERGE INTO … WITH SCHEMA EVOLUTION`: Spark's analyzer computes the
  * source-minus-target column delta and applies it through the
  * catalog's `alterTable(AddColumn)` before planning the merge — the
  * connector work is the schema-evolution support the catalog already
  * has (metadata-only adds; old files read the new column as null).
  */
class MergeSchemaEvolutionSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-mse").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.ms", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.ms.warehouse", warehouse)
    .getOrCreate()

  test("MERGE WITH SCHEMA EVOLUTION adds source-only columns") {
    spark.sql("CREATE NAMESPACE ms.ns")
    spark.sql("CREATE TABLE ms.ns.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO ms.ns.t SELECT id, concat('v', id) FROM range(0, 10)")
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW mse_src AS
      SELECT id AS k, concat('s', id) AS v,
             CAST(id * 1.5 AS DOUBLE) AS score
      FROM range(5, 15)""")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO ms.ns.t t
      USING mse_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val rows = spark.sql("SELECT k, v, score FROM ms.ns.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.toString.toDouble)))
    assert(rows.length == 15)
    // untouched rows read the NEW column as null
    assert(rows.take(5).forall { case (k, v, sc) => v == s"v$k" && sc.isEmpty })
    // matched rows updated with the evolved column
    assert(rows.drop(5).forall { case (k, v, sc) =>
      v == s"s$k" && sc.contains(k * 1.5) })
  }

  test("evolved column persists and is queryable standalone") {
    assert(spark.sql("SELECT count(*) FROM ms.ns.t WHERE score IS NULL")
      .head.getLong(0) == 5)
    assert(spark.sql("SELECT sum(score) FROM ms.ns.t").head.getDouble(0) ==
      (5 until 15).map(_ * 1.5).sum)
  }

  test("merge-on-read MERGE evolves too (delta path)") {
    spark.sql("""CREATE TABLE ms.ns.m (k BIGINT, v STRING)
      TBLPROPERTIES ('graft.merge.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO ms.ns.m SELECT id, concat('v', id) FROM range(0, 10)")
    val before = spark.sql("SELECT path FROM ms.ns.`m$files`")
      .collect().map(_.getString(0)).toSet
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW mse_src2 AS
      SELECT id AS k, concat('s', id) AS v, CAST(id AS DOUBLE) AS w
      FROM range(8, 12)""")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO ms.ns.m t
      USING mse_src2 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val after = spark.sql("SELECT path FROM ms.ns.`m$files`")
      .collect().map(_.getString(0)).toSet
    assert(before.subsetOf(after), "position delta keeps existing files")
    assert(spark.sql("SELECT count(*) FROM ms.ns.m").head.getLong(0) == 12)
    assert(spark.sql("SELECT sum(w) FROM ms.ns.m").head.getDouble(0) ==
      (8 until 12).map(_.toDouble).sum)
  }
}
