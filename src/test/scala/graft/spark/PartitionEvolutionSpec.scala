package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Partition-spec evolution: `ALTER TABLE … ADD/DROP PARTITION FIELD`
  * is one metadata commit; each epoch's files keep their own directory
  * layout (self-describing — arg-qualified dir names), scans read every
  * epoch under its own spec, and compaction migrates the table to the
  * current spec.
  */
class PartitionEvolutionSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-pev").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.pe", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.pe.warehouse", warehouse)
    .getOrCreate()

  private def files(t: String): Seq[String] =
    spark.sql(s"SELECT path FROM pe.ns.`$t$$files`")
      .collect().map(_.getString(0)).toSeq

  private def contents(t: String): Set[(Long, String, Double)] =
    spark.sql(s"SELECT k, region, amt FROM pe.ns.$t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("identity evolution: each epoch keeps its layout, reads span both") {
    spark.sql("CREATE NAMESPACE pe.ns")
    spark.sql("CREATE TABLE pe.ns.t (k BIGINT, region STRING, amt DOUBLE)")
    spark.sql("""INSERT INTO pe.ns.t
      SELECT id, CASE WHEN id % 2 = 0 THEN 'east' ELSE 'west' END,
             CAST(id AS DOUBLE)
      FROM range(0, 100, 1, 2)""")
    val flatFiles = files("t")
    assert(flatFiles.forall(!_.contains("region=")), "epoch 1 is flat")

    spark.sql("ALTER TABLE pe.ns.t ADD PARTITION FIELD region")
    spark.sql("""INSERT INTO pe.ns.t (k, region, amt)
      SELECT id, CASE WHEN id % 2 = 0 THEN 'east' ELSE 'west' END,
             CAST(id AS DOUBLE)
      FROM range(100, 200, 1, 2)""")
    val all = files("t")
    assert(all.toSet.intersect(flatFiles.toSet) == flatFiles.toSet,
      "evolution moves no existing file")
    val newFiles = all.filterNot(flatFiles.contains)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("region=")),
      s"epoch 2 lays out by region: $newFiles")

    // reads span both epochs; filters correct on both sides
    assert(spark.sql("SELECT count(*) FROM pe.ns.t").head.getLong(0) == 200)
    assert(spark.sql(
      "SELECT count(*) FROM pe.ns.t WHERE region = 'east'").head.getLong(0) == 100)
    assert(spark.sql(
      "SELECT sum(amt) FROM pe.ns.t WHERE region = 'west' AND k < 150")
      .head.getDouble(0) == (1 until 150 by 2).sum.toDouble)
  }

  test("derived transform evolution: bucket layout is arg-qualified") {
    spark.sql("ALTER TABLE pe.ns.t ADD PARTITION FIELD bucket(4, k)")
    spark.sql("""INSERT INTO pe.ns.t (k, region, amt)
      SELECT id, 'north', CAST(id AS DOUBLE) FROM range(200, 250, 1, 2)""")
    val bucketFiles = files("t").filter(_.contains("gp_bucket4_k="))
    assert(bucketFiles.nonEmpty, s"epoch 3 buckets: ${files("t")}")
    assert(bucketFiles.forall(_.contains("region=")),
      "epoch 3 keeps the identity field too")
    assert(spark.sql("SELECT count(*) FROM pe.ns.t").head.getLong(0) == 250)
    // equality on the bucketed source prunes files within epoch 3 and
    // still answers correctly across ALL epochs
    assert(spark.sql("SELECT region FROM pe.ns.t WHERE k = 230")
      .head.getString(0) == "north")
    assert(spark.sql("SELECT amt FROM pe.ns.t WHERE k = 77")
      .head.getDouble(0) == 77.0)
  }

  test("DROP PARTITION FIELD goes back without touching data") {
    spark.sql("ALTER TABLE pe.ns.t DROP PARTITION FIELD bucket(4, k)")
    spark.sql("ALTER TABLE pe.ns.t DROP PARTITION FIELD region")
    val before = files("t").toSet
    spark.sql("""INSERT INTO pe.ns.t (k, region, amt)
      SELECT id, 'south', CAST(id AS DOUBLE) FROM range(250, 280, 1, 2)""")
    val newFiles = files("t").toSet.diff(before)
    assert(newFiles.nonEmpty && newFiles.forall(f =>
      !f.contains("region=") && !f.contains("gp_bucket")),
      s"epoch 4 is flat again: $newFiles")
    assert(spark.sql("SELECT count(*) FROM pe.ns.t").head.getLong(0) == 280)
    assert(spark.sql(
      "SELECT count(*) FROM pe.ns.t WHERE region = 'south'").head.getLong(0) == 30)
  }

  test("row-level DELETE spans epochs and rewrites to the current spec") {
    val want = contents("t").filterNot(_._1 % 10 == 9)
    spark.sql("DELETE FROM pe.ns.t WHERE k % 10 = 9")
    assert(contents("t") == want)
  }

  test("compaction migrates every epoch to the current spec") {
    spark.sql("ALTER TABLE pe.ns.t ADD PARTITION FIELD region")
    val want = contents("t")
    spark.sql("CALL pe.system.compact_table('ns', 't')")
    val after = files("t")
    assert(after.forall(_.contains("region=")),
      s"all files on the current layout after compaction: $after")
    assert(contents("t") == want)
    // single-layout fast path again: storage-partitioned read works
    assert(spark.sql(
      "SELECT count(*) FROM pe.ns.t WHERE region = 'east'")
      .head.getLong(0) == want.count(_._2 == "east"))
  }

  test("time-transform evolution with hidden pruning on the new epoch") {
    spark.sql("""CREATE TABLE pe.ns.ev (ts TIMESTAMP, v BIGINT)""")
    spark.sql("""INSERT INTO pe.ns.ev
      SELECT timestamp'2024-01-15 00:00:00' + make_interval(0,0,0,id,0,0,0), id
      FROM range(0, 10)""")
    spark.sql("ALTER TABLE pe.ns.ev ADD PARTITION FIELD days(ts)")
    spark.sql("""INSERT INTO pe.ns.ev
      SELECT timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,id,0,0,0), id + 100
      FROM range(0, 10)""")
    assert(files("ev").count(_.contains("gp_days_ts=")) > 0)
    assert(spark.sql("SELECT count(*) FROM pe.ns.ev").head.getLong(0) == 20)
    assert(spark.sql(
      """SELECT count(*) FROM pe.ns.ev
         WHERE ts >= timestamp'2024-03-05 00:00:00'""").head.getLong(0) == 6)
    assert(spark.sql(
      """SELECT sum(v) FROM pe.ns.ev
         WHERE ts < timestamp'2024-02-01 00:00:00'""").head.getLong(0) == 45)
  }
}
