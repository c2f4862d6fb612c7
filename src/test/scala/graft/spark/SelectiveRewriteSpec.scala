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
    t.meta.currentFiles.map(_.path)
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
