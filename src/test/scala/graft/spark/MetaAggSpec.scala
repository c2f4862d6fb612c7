package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** COUNT(*)/MIN/MAX with no filters answered from snapshot metadata:
  * the plan contains a one-row MetadataAggregate scan and opens ZERO
  * data files. At 100 TB a COUNT(*) otherwise reads 10⁵ parquet
  * footers even with parquet's own aggregate pushdown.
  */
class MetaAggSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-magg").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.magg", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.magg.warehouse", warehouse)
    .getOrCreate()

  private def planOf(sql: String): String = {
    val df = spark.sql(sql)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("count/min/max answer from metadata without scanning") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS magg.ns")
    spark.sql("CREATE TABLE magg.ns.t (k BIGINT, v STRING, d DOUBLE)")
    (0 until 3).foreach { i =>
      spark.sql(s"""INSERT INTO magg.ns.t
        SELECT id + ${i * 1000}, concat('s', id + ${i * 1000}),
               cast(id as double) / 7 FROM range(0, 100, 1, 2)""")
    }
    val r = spark.sql(
      "SELECT count(*), min(k), max(k), min(v), max(v), max(d) FROM magg.ns.t")
    val row = r.collect()(0)
    assert(row.getLong(0) == 300)
    assert(row.getLong(1) == 0 && row.getLong(2) == 2099)
    // lexicographic max over s0..s99, s1000.., s2000.. is "s99"
    assert(row.getString(3) == "s0" && row.getString(4) == "s99")
    assert(row.getDouble(5) == 99.0 / 7)
    assert(r.queryExecution.executedPlan.toString.contains("MetadataAggregate"),
      "the aggregate must be served from snapshot stats")
  }

  test("filters and grouping fall back to a real scan") {
    assert(!planOf("SELECT count(*) FROM magg.ns.t WHERE k > 10")
      .contains("MetadataAggregate"))
    assert(spark.sql("SELECT count(*) FROM magg.ns.t WHERE k > 10")
      .head.getLong(0) == 289)
    assert(!planOf("SELECT v, count(*) FROM magg.ns.t GROUP BY v LIMIT 1")
      .contains("MetadataAggregate"))
  }

  test("pending mor deletes disable the metadata answer") {
    spark.sql("""CREATE TABLE magg.ns.m (k BIGINT)
      TBLPROPERTIES ('graft.delete.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO magg.ns.m SELECT id FROM range(0, 100, 1, 1)")
    assert(planOf("SELECT count(*) FROM magg.ns.m").contains("MetadataAggregate"))
    spark.sql("DELETE FROM magg.ns.m WHERE k < 10")
    val after = spark.sql("SELECT count(*) FROM magg.ns.m")
    assert(after.head.getLong(0) == 90,
      "the count must reflect the logical delete")
    assert(!after.queryExecution.executedPlan.toString.contains("MetadataAggregate"))
  }

  test("position deletes subtract exactly from count(*)") {
    spark.sql("""CREATE TABLE magg.ns.p (k BIGINT, v STRING)
      TBLPROPERTIES ('graft.update.mode' = 'merge-on-read',
                     'graft.merge.mode' = 'merge-on-read')""")
    spark.sql("INSERT INTO magg.ns.p SELECT id, concat('s', id) " +
      "FROM range(0, 100, 1, 2)")
    // UPDATE via position delta: N pos-delete rows + N replacement rows
    spark.sql("UPDATE magg.ns.p SET v = 'u' WHERE k % 10 = 0")
    val upd = spark.sql("SELECT count(*) FROM magg.ns.p")
    assert(upd.head.getLong(0) == 100)
    assert(upd.queryExecution.executedPlan.toString
      .contains("MetadataAggregate"),
      "count(*) under pos-deletes must still answer from metadata")
    // MERGE deleting rows: count drops by the delete-object row count
    spark.sql("""MERGE INTO magg.ns.p t
      USING (SELECT id * 2 AS k FROM range(0, 10)) s ON t.k = s.k
      WHEN MATCHED THEN DELETE""")
    val del = spark.sql("SELECT count(*) FROM magg.ns.p")
    assert(del.head.getLong(0) == 90)
    assert(del.queryExecution.executedPlan.toString
      .contains("MetadataAggregate"))
    // min/max/count(col) can't tell WHICH rows died — they must scan
    val mn = spark.sql("SELECT min(k), count(v) FROM magg.ns.p")
    assert(mn.head.getLong(0) == 1)
    assert(!mn.queryExecution.executedPlan.toString
      .contains("MetadataAggregate"))
  }

  test("a ref-pruned delete object disables the metadata count") {
    // the CoW DELETE rewrites only the files with matches; pending
    // delete objects REFERENCING those files keep their other refs but
    // their rowCount now overcounts live deletes — count(*) must fall
    // back to a scan, not subtract the stale total
    spark.sql("DELETE FROM magg.ns.p WHERE k >= 50")
    val r = spark.sql("SELECT count(*) FROM magg.ns.p")
    assert(r.head.getLong(0) == 40,
      "exact count after partial rewrite under pending pos-deletes")
    assert(!r.queryExecution.executedPlan.toString
      .contains("MetadataAggregate"),
      "pruned delete refs must disable the metadata-only count")
  }

  test("count respects time travel") {
    spark.sql("CALL magg.system.create_tag('ns', 'm', 'pre')")
    spark.sql("INSERT INTO magg.ns.m SELECT id + 500 FROM range(0, 50, 1, 1)")
    assert(spark.sql("SELECT count(*) FROM magg.ns.m").head.getLong(0) == 140)
    assert(spark.sql("SELECT count(*) FROM magg.ns.m VERSION AS OF 'pre'")
      .head.getLong(0) == 90)
  }

  test("count(col) uses harvested null counts") {
    spark.sql("CREATE TABLE magg.ns.n (k BIGINT, v STRING)")
    spark.sql("""INSERT INTO magg.ns.n VALUES
      (1, 'a'), (2, NULL), (3, 'c'), (4, NULL)""")
    spark.sql("INSERT INTO magg.ns.n VALUES (5, NULL), (6, 'f')")
    val r = spark.sql("SELECT count(*), count(v), count(k) FROM magg.ns.n")
    val row = r.collect()(0)
    assert(row.getLong(0) == 6 && row.getLong(1) == 3 && row.getLong(2) == 6)
    assert(r.queryExecution.executedPlan.toString.contains("MetadataAggregate"),
      "count(col) must be served from null-count stats")
    // DISTINCT cannot come from stats
    assert(!{
      val d = spark.sql("SELECT count(DISTINCT v) FROM magg.ns.n")
      d.collect(); d.queryExecution.executedPlan.toString
    }.contains("MetadataAggregate"))
  }

  test("empty table aggregates") {
    spark.sql("CREATE TABLE magg.ns.e (k BIGINT)")
    val r = spark.sql("SELECT count(*), min(k) FROM magg.ns.e").collect()(0)
    assert(r.getLong(0) == 0 && r.isNullAt(1))
  }
}
