package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CHECK-constraint enforcement (`graft.check.<name>` properties,
  * GraftCheckConstraints): SQL-standard semantics (NULL passes),
  * atomic rejection with no partial state, ALTER-added constraints
  * bind to subsequent writes, and the error names the constraint.
  */
class CheckConstraintSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-ckwh").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.catalog.ccat", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.ccat.warehouse", warehouse)
    .getOrCreate()

  private def messageChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .flatMap(c => Option(c.getMessage)).toSeq

  test("violating insert fails atomically and names the constraint") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ccat.ns1")
    spark.sql("""CREATE TABLE ccat.ns1.t1 (k BIGINT, v DOUBLE)
                 TBLPROPERTIES ('graft.check.v_pos' = 'v > 0')""")
    spark.sql("INSERT INTO ccat.ns1.t1 VALUES (1, 1.5), (2, 2.5)")
    val e = intercept[Throwable] {
      spark.sql("INSERT INTO ccat.ns1.t1 VALUES (3, 3.5), (4, -1.0)")
    }
    assert(messageChain(e).exists(_.contains("constraint v_pos violated")),
      s"error did not name the constraint: ${messageChain(e)}")
    // nothing from the failed batch landed — not even the valid row
    assert(spark.table("ccat.ns1.t1").count() == 2)
  }

  test("NULL check result passes (SQL-standard CHECK)") {
    spark.sql("""CREATE TABLE ccat.ns1.t2 (k BIGINT, v DOUBLE)
                 TBLPROPERTIES ('graft.check.v_pos' = 'v > 0')""")
    spark.sql("INSERT INTO ccat.ns1.t2 VALUES (1, CAST(NULL AS DOUBLE))")
    assert(spark.table("ccat.ns1.t2").count() == 1)
  }

  test("ALTER-added constraint binds to subsequent writes") {
    spark.sql("CREATE TABLE ccat.ns1.t3 (k BIGINT)")
    spark.sql("INSERT INTO ccat.ns1.t3 VALUES (-5)") // no constraint yet
    spark.sql("""ALTER TABLE ccat.ns1.t3 SET TBLPROPERTIES (
                   'graft.check.k_pos' = 'k >= 0')""")
    val e = intercept[Throwable] {
      spark.sql("INSERT INTO ccat.ns1.t3 VALUES (-6)")
    }
    assert(messageChain(e).exists(_.contains("constraint k_pos violated")))
    spark.sql("INSERT INTO ccat.ns1.t3 VALUES (7)")
    assert(spark.table("ccat.ns1.t3").collect().map(_.getLong(0)).sorted
      .sameElements(Array(-5L, 7L)))
  }

  test("multiple constraints all enforced; INSERT OVERWRITE covered") {
    spark.sql("""CREATE TABLE ccat.ns1.t4 (k BIGINT, s STRING)
                 TBLPROPERTIES (
                   'graft.check.k_pos' = 'k >= 0',
                   'graft.check.s_len' = 'length(s) <= 3')""")
    spark.sql("INSERT INTO ccat.ns1.t4 VALUES (1, 'ab')")
    val e = intercept[Throwable] {
      spark.sql("INSERT OVERWRITE ccat.ns1.t4 VALUES (2, 'toolong')")
    }
    assert(messageChain(e).exists(_.contains("constraint s_len violated")))
    // the overwrite aborted: original row intact
    assert(spark.sql("SELECT s FROM ccat.ns1.t4").collect()
      .map(_.getString(0)).sameElements(Array("ab")))
  }
}
