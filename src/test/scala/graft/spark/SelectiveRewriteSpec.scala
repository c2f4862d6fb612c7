package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DELETE/UPDATE are file-selective copy-on-write: files whose stats
  * provably exclude the predicate carry into the new snapshot
  * byte-identical (same paths) — at scale a selective mutation
  * rewrites a handful of files, not the table.
  */
class SelectiveRewriteSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-sel").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.sw", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.sw.warehouse", warehouse)
    .getOrCreate()

  private def files(table: String): Seq[String] = {
    val cat = spark.sessionState.catalogManager.catalog("sw")
      .asInstanceOf[GraftCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("ns1"), table)).asInstanceOf[GraftTable]
    t.meta.currentFiles(cat.storage).map(_.path)
  }

  test("DELETE rewrites only files whose stats overlap the predicate") {
    spark.sql("CREATE NAMESPACE sw.ns1")
    spark.sql("CREATE TABLE sw.ns1.t (k BIGINT, v STRING)")
    // three commits → three files with disjoint k ranges
    spark.sql("INSERT INTO sw.ns1.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO sw.ns1.t VALUES (100, 'c'), (101, 'd')")
    spark.sql("INSERT INTO sw.ns1.t VALUES (200, 'e'), (201, 'f')")
    val before = files("t")
    assert(before.size == 6) // each 2-row INSERT writes 2 part files
    spark.sql("DELETE FROM sw.ns1.t WHERE k = 100")
    val after = files("t")
    // only the single file whose stats cover k=100 was rewritten; the
    // other five survive under their ORIGINAL paths
    assert(after.toSet.intersect(before.toSet).size == 5)
    assert(spark.table("sw.ns1.t").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L, 101L, 200L, 201L)))
  }

  test("DELETE with no possibly-matching file is a metadata no-op") {
    spark.sql("CREATE TABLE sw.ns1.n (k BIGINT)")
    spark.sql("INSERT INTO sw.ns1.n VALUES (1), (2)")
    val before = files("n")
    spark.sql("DELETE FROM sw.ns1.n WHERE k > 1000")
    assert(files("n") == before) // same snapshot files, nothing rewritten
    assert(spark.table("sw.ns1.n").count() == 2)
  }

  test("MERGE rewrites only files with matching rows (runtime group filter)") {
    spark.sql("CREATE TABLE sw.ns1.m (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO sw.ns1.m VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO sw.ns1.m VALUES (500, 50), (501, 51)")
    spark.sql("INSERT INTO sw.ns1.m VALUES (900, 90), (901, 91)")
    val before = files("m")
    assert(before.size == 6)
    // source touches only k=500 (one file) and inserts k=7777
    spark.sql("""MERGE INTO sw.ns1.m t
                 USING (SELECT 500 AS k, 5000 AS v
                        UNION ALL SELECT 7777, 70) s
                 ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT *""")
    val after = files("m")
    // Spark's runtime group filter narrows the rewrite to the single
    // file containing k=500; the other five keep their ORIGINAL paths
    assert(after.toSet.intersect(before.toSet).size == 5,
      s"expected 5 untouched files, got ${after.toSet.intersect(before.toSet).size}")
    val rows = spark.table("sw.ns1.m").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 10L), (2L, 20L), (500L, 5000L),
      (501L, 51L), (900L, 90L), (901L, 91L), (7777L, 70L)))
  }

  test("MERGE with no matched rows keeps every target file in place") {
    spark.sql("CREATE TABLE sw.ns1.mi (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO sw.ns1.mi VALUES (1, 10), (2, 20)")
    val before = files("mi")
    spark.sql("""MERGE INTO sw.ns1.mi t
                 USING (SELECT 999 AS k, 9 AS v) s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT *""")
    val after = files("mi")
    // insert-only outcome: original files untouched, one new file
    assert(before.toSet.subsetOf(after.toSet))
    assert(spark.table("sw.ns1.mi").count() == 3)
  }

  test("UPDATE rewrites only files whose stats overlap the predicate") {
    spark.sql("CREATE TABLE sw.ns1.u (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO sw.ns1.u VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO sw.ns1.u VALUES (500, 50), (501, 51)")
    val before = files("u")
    assert(before.size == 4) // 2 commits x 2 part files
    spark.sql("UPDATE sw.ns1.u SET v = v + 1 WHERE k >= 500")
    val after = files("u")
    // the low-range commit's files are untouched; high-range replaced
    assert(after.toSet.intersect(before.toSet).size == 2)
    val rows = spark.table("sw.ns1.u").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 10L), (2L, 20L), (500L, 51L), (501L, 52L)))
  }
}
