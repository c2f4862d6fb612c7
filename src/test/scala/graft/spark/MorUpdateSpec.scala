package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read UPDATE/MERGE via position deltas: with
  * `graft.update.mode` / `graft.merge.mode` = `merge-on-read`, a
  * row-level operation commits small position-delete objects plus the
  * replacement rows — existing data files are NOT rewritten. At 100 TB
  * a 10-row upsert writes a few KB instead of re-copying gigabyte
  * files; reads apply each file's delete set where the file is read.
  */
class MorUpdateSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-morup").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.mu", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.mu.warehouse", warehouse)
    .getOrCreate()

  private def files(t: String): Seq[String] =
    spark.sql(s"SELECT path FROM mu.ns.`$t$$files`")
      .collect().map(_.getString(0)).toSeq

  test("_pos metadata column yields true file row positions") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mu.ns")
    spark.sql("CREATE TABLE mu.ns.p (k BIGINT, v STRING)")
    spark.sql(
      "INSERT INTO mu.ns.p SELECT id, concat('v', id) FROM range(0, 1000, 1, 2)")
    val rows = spark.sql("SELECT k, _pos, _file FROM mu.ns.p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 1000)
    // per file, positions are exactly 0..n-1
    rows.groupBy(_._3).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (0L until rs.length).toSeq)
    }
    // positions are stable under pushdown: a filtered read sees the
    // same (k, pos) pairs the full read saw
    val byK = rows.map(r => r._1 -> r._2).toMap
    val filtered = spark.sql("SELECT k, _pos FROM mu.ns.p WHERE k >= 990")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(filtered.length == 10)
    filtered.foreach { case (k, p) => assert(byK(k) == p, s"k=$k") }
  }
}
