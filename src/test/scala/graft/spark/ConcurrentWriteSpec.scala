package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Two catalog instances over ONE warehouse (two "sessions"): a commit
  * race on the same table must resolve by the append/append rebase —
  * the loser re-applies its file additions onto the winner's state, so
  * both appends survive (the conflict the reference's matrix declares
  * resolvable, AnalyzeActionConflicts.java:171-187, with the rebase
  * the reference left TODO).
  */
class ConcurrentWriteSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-cwh").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.wa", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.wa.warehouse", warehouse)
    .config("spark.sql.catalog.wb", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.wb.warehouse", warehouse)
    .getOrCreate()

  private def cat(name: String): GraftCatalog =
    spark.sessionState.catalogManager.catalog(name).asInstanceOf[GraftCatalog]

  test("append/append race across sessions rebases; both appends survive") {
    spark.sql("CREATE NAMESPACE wa.ns1")
    spark.sql("CREATE TABLE wa.ns1.t (k BIGINT)")

    // session A opens a txn on the current snapshot and stages an insert
    cat("wa").beginTransaction()
    spark.sql("INSERT INTO wa.ns1.t VALUES (1), (2)")
    // session B commits first (auto-commit) — B wins the race
    spark.sql("INSERT INTO wb.ns1.t VALUES (10), (20), (30)")
    assert(spark.table("wb.ns1.t").count() == 3)
    // A commits: loses the root race, conflict matrix says resolvable,
    // replay re-appends A's files onto B's table state
    cat("wa").commitTransaction()

    val all = spark.table("wb.ns1.t").collect().map(_.getLong(0)).sorted
    assert(all.sameElements(Array(1L, 2L, 10L, 20L, 30L)),
      s"lost an append in the rebase: ${all.mkString(",")}")
  }

  test("update/update race across sessions aborts the loser") {
    spark.sql("CREATE TABLE wa.ns1.u (k BIGINT)")
    spark.sql("INSERT INTO wa.ns1.u VALUES (1)")
    cat("wa").beginTransaction()
    spark.sql("INSERT OVERWRITE wa.ns1.u VALUES (100)")
    spark.sql("INSERT OVERWRITE wb.ns1.u VALUES (200)") // wins
    val e = intercept[Exception] { cat("wa").commitTransaction() }
    assert(e.getMessage.contains("txn") || e.isInstanceOf[graft.txn.CommitFailedException])
    // winner's overwrite is the surviving state
    assert(spark.table("wb.ns1.u").collect().map(_.getLong(0)).sameElements(Array(200L)))
  }
}
