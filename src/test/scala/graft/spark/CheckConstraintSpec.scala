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

  test("copy-on-write UPDATE and MERGE enforce; DELETE passes") {
    spark.sql("""CREATE TABLE ccat.ns1.t5 (k BIGINT, v DOUBLE)
                 TBLPROPERTIES ('graft.check.v_pos' = 'v > 0')""")
    spark.sql("INSERT INTO ccat.ns1.t5 VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    val e = intercept[Throwable] {
      spark.sql("UPDATE ccat.ns1.t5 SET v = -9.0 WHERE k = 2")
    }
    assert(messageChain(e).exists(_.contains("constraint v_pos violated")))
    assert(spark.sql("SELECT sum(v) FROM ccat.ns1.t5").collect()(0)
      .getDouble(0) == 6.0) // update aborted wholesale
    spark.sql("UPDATE ccat.ns1.t5 SET v = 20.0 WHERE k = 2")
    val m = intercept[Throwable] {
      spark.sql("""MERGE INTO ccat.ns1.t5 t USING (SELECT 9 AS k) s ON t.k = s.k
                   WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, -1.0)""")
    }
    assert(messageChain(m).exists(_.contains("constraint v_pos violated")))
    spark.sql("DELETE FROM ccat.ns1.t5 WHERE k = 1")
    assert(spark.table("ccat.ns1.t5").count() == 2)
  }

  test("position-delta (merge-on-read) UPDATE enforces; DELETE rows exempt") {
    spark.sql("""CREATE TABLE ccat.ns1.t6 (k BIGINT, v DOUBLE)
                 TBLPROPERTIES (
                   'graft.check.v_pos' = 'v > 0',
                   'graft.update.mode' = 'merge-on-read',
                   'graft.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO ccat.ns1.t6 VALUES (1, 1.0), (2, 2.0)")
    val e = intercept[Throwable] {
      spark.sql("UPDATE ccat.ns1.t6 SET v = -3.0 WHERE k = 1")
    }
    assert(messageChain(e).exists(_.contains("constraint v_pos violated")))
    assert(spark.sql("SELECT round(sum(v), 1) FROM ccat.ns1.t6").collect()(0)
      .getDouble(0) == 3.0)
    // a pure MoR DELETE writes no data rows — never blocked by checks,
    // even though its delta carries the (valid or not) old values
    spark.sql("DELETE FROM ccat.ns1.t6 WHERE k = 2")
    assert(spark.table("ccat.ns1.t6").count() == 1)
    spark.sql("UPDATE ccat.ns1.t6 SET v = 5.5 WHERE k = 1")
    assert(spark.sql("SELECT v FROM ccat.ns1.t6").collect()(0)
      .getDouble(0) == 5.5)
  }

  test("equality-delta MERGE enforces on inserted and updated rows") {
    spark.sql("""CREATE TABLE ccat.ns1.t7 (k BIGINT NOT NULL, v DOUBLE)
                 TBLPROPERTIES (
                   'graft.check.v_pos' = 'v > 0',
                   'graft.merge.mode' = 'merge-on-read-eq',
                   'graft.write.upsert-keys' = 'k')""")
    spark.sql("INSERT INTO ccat.ns1.t7 VALUES (1, 1.0)")
    val e = intercept[Throwable] {
      spark.sql("""MERGE INTO ccat.ns1.t7 t USING (SELECT 1 AS k) s ON t.k = s.k
                   WHEN MATCHED THEN UPDATE SET v = -2.0
                   WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, 1.0)""")
    }
    assert(messageChain(e).exists(_.contains("constraint v_pos violated")))
    assert(spark.sql("SELECT v FROM ccat.ns1.t7").collect()(0)
      .getDouble(0) == 1.0)
    spark.sql("""MERGE INTO ccat.ns1.t7 t USING (SELECT 2 AS k) s ON t.k = s.k
                 WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, 4.0)""")
    assert(spark.table("ccat.ns1.t7").count() == 2)
  }
}
