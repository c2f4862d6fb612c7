package graft.spark

import java.nio.file.Files

import graft.objects.IsolationLevel
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Predicate-level SERIALIZABLE: a read with pushed predicate
  * intervals conflicts with a concurrent committed append only when
  * the appended rows can actually fall inside the read set (the
  * writer's file stats intersect the reader's intervals). Key-level
  * checking alone would abort both cases below.
  */
class SerializableConflictSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-swh").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.sa", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.sa.warehouse", warehouse)
    .config("spark.sql.catalog.sb", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.sb.warehouse", warehouse)
    .getOrCreate()

  private def cat(name: String): GraftCatalog =
    spark.sessionState.catalogManager.catalog(name).asInstanceOf[GraftCatalog]

  test("disjoint append does not abort a serializable reader") {
    spark.sql("CREATE NAMESPACE sa.ns1")
    spark.sql("CREATE TABLE sa.ns1.p (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO sa.ns1.p VALUES (1, 1.0), (2, 2.0)")
    cat("sa").beginTransaction(Some(IsolationLevel.Serializable))
    // read set: k in (-inf, 10]
    spark.sql("SELECT k, v FROM sa.ns1.p WHERE k < 10").collect()
    // concurrent append entirely outside the read predicate (k = 100)
    spark.sql("INSERT INTO sb.ns1.p VALUES (100, 3.0)")
    cat("sa").commitTransaction() // must NOT abort
    assert(spark.table("sb.ns1.p").count() == 3)
  }

  test("overlapping append aborts a serializable reader") {
    spark.sql("CREATE TABLE sa.ns1.q (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO sa.ns1.q VALUES (1, 1.0)")
    cat("sa").beginTransaction(Some(IsolationLevel.Serializable))
    spark.sql("SELECT k, v FROM sa.ns1.q WHERE k < 10").collect()
    // k = 5 falls inside the read interval — the read is stale
    spark.sql("INSERT INTO sb.ns1.q VALUES (5, 3.0)")
    val e = intercept[Exception] { cat("sa").commitTransaction() }
    assert(e.getMessage.toLowerCase.contains("conflict") ||
      e.isInstanceOf[graft.txn.CommitFailedException])
  }

  test("append with no stats overlap proof still aborts (conservative)") {
    spark.sql("CREATE TABLE sa.ns1.r (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO sa.ns1.r VALUES (1, 1.0)")
    cat("sa").beginTransaction(Some(IsolationLevel.Serializable))
    // full-table read: no predicate, no intervals — nothing to prove
    spark.sql("SELECT k, v FROM sa.ns1.r").collect()
    spark.sql("INSERT INTO sb.ns1.r VALUES (100, 3.0)")
    val e = intercept[Exception] { cat("sa").commitTransaction() }
    assert(e.getMessage.toLowerCase.contains("conflict") ||
      e.isInstanceOf[graft.txn.CommitFailedException])
  }

  test("snapshot isolation ignores read-write conflicts entirely") {
    spark.sql("CREATE TABLE sa.ns1.s (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO sa.ns1.s VALUES (1, 1.0)")
    cat("sa").beginTransaction() // default SNAPSHOT
    spark.sql("SELECT k, v FROM sa.ns1.s WHERE k < 10").collect()
    spark.sql("INSERT INTO sb.ns1.s VALUES (5, 3.0)")
    cat("sa").commitTransaction() // reads never conflict under SNAPSHOT
  }
}
