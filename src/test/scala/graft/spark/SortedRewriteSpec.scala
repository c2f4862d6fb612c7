package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Sort-ordered writes and rewrites: clustering data by a sort key
  * gives files DISJOINT min/max ranges, which turns the snapshot-stats
  * file pruning into real I/O elimination — the difference between
  * "every file might match" and "one file matches" at 100 TB.
  */
class SortedRewriteSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-srt").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.srt", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.srt.warehouse", warehouse)
    .getOrCreate()

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    val plans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    df.count()
    plans.map {
      case s: FileSourceScanExec => s.metrics.get("numFiles").map(_.value).getOrElse(0L)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputRDD.getNumPartitions.toLong
    }.sum
  }

  test("sorted rewrite turns overlapping files into a pruned scan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS srt.ns")
    spark.sql("CREATE TABLE srt.ns.t (k BIGINT, v STRING)")
    // 4 appends, each spanning the WHOLE key range → every file
    // overlaps every filter; stats can prune nothing
    (0 until 4).foreach { i =>
      spark.sql(s"""INSERT INTO srt.ns.t
        SELECT id * 4 + $i, concat('v', id) FROM range(0, 1000, 1, 1)""")
    }
    val narrow = "k >= 100 AND k < 140"
    assert(scannedFiles(spark.sql(s"SELECT * FROM srt.ns.t WHERE $narrow")) == 4,
      "interleaved appends must defeat stats pruning (the baseline)")
    val row = spark.sql(
      "CALL srt.system.compact_table('ns', 't', 4, 'k')").collect()(0)
    assert(row.getInt(1) == 4)
    assert(spark.table("srt.ns.t").count() == 4000, "rewrite preserves rows")
    val pruned = spark.sql(s"SELECT * FROM srt.ns.t WHERE $narrow")
    assert(pruned.count() == 40) // k is dense over [0, 4000)
    assert(scannedFiles(pruned) == 1,
      "after range-clustering, one file covers the narrow filter")
  }

  test("graft.write.sort-by clusters appends as they land") {
    spark.sql("""CREATE TABLE srt.ns.s (k BIGINT, v STRING)
      TBLPROPERTIES ('graft.write.sort-by'='k')""")
    // an 8-partition unsorted insert: without the declared write
    // distribution every task writes the full key range. AQE would
    // coalesce this tiny shuffle into one partition (= one file),
    // hiding the layout under test — hold it open for the insert.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try spark.sql("""INSERT INTO srt.ns.s
      SELECT (id * 2654435761) % 4096, concat('v', id)
      FROM range(0, 4096, 1, 8)""")
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val total = spark.sql("SELECT count(*) FROM srt.ns.`s$files`")
      .collect()(0).getLong(0)
    assert(total > 1, s"multi-partition insert should write >1 file, got $total")
    val one = spark.sql("SELECT * FROM srt.ns.s WHERE k >= 10 AND k < 50")
    assert(scannedFiles(one) < total,
      "range-distributed append must land with prunable disjoint ranges")
  }

  test("partitioned tables sort within partitions on rewrite") {
    spark.sql("""CREATE TABLE srt.ns.p (k BIGINT, part STRING)
      PARTITIONED BY (part)""")
    (0 until 3).foreach { i =>
      spark.sql(s"""INSERT INTO srt.ns.p
        SELECT id * 3 + $i, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END
        FROM range(0, 200, 1, 1)""")
    }
    val before = spark.table("srt.ns.p").count()
    spark.sql("CALL srt.system.compact_table('ns', 'p', 1, 'k')")
    assert(spark.table("srt.ns.p").count() == before)
    // partition pruning still exact after the sorted rewrite
    val one = spark.sql("SELECT * FROM srt.ns.p WHERE part = 'a'")
    assert(one.count() == 300)
    assert(scannedFiles(one) == 1)
  }
}
