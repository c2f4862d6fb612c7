package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** LIMIT and ORDER BY … LIMIT bound the PLANNED FILE SET from snapshot
  * stats (partial pushdown — Spark's own limit/sort still runs above,
  * so the subset choice can only affect I/O, never results). On a
  * sort-clustered table the top-n query reads the one file whose range
  * can hold the answer.
  */
class LimitPushdownSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-lim").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.lim", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.lim.warehouse", warehouse)
    .getOrCreate()

  /** Distinct data FILES planned by the v2 scans of df's executed plan
    * (partition counts under-report: Spark bin-packs small files).
    */
  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def files(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        files(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        files(q.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.partitions.flatten.flatMap {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.map(_.filePath.toString)
          case _ => Seq.empty
        }
      case other => other.children.flatMap(files)
    }
    files(df.queryExecution.executedPlan).distinct.length.toLong
  }

  test("plain LIMIT plans a file prefix, not the table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lim.ns")
    spark.sql("CREATE TABLE lim.ns.t (k BIGINT, v STRING)")
    // 4 appends, disjoint ascending ranges → 4 files with tight stats
    (0 until 4).foreach { i =>
      spark.sql(s"""INSERT INTO lim.ns.t
        SELECT id + ${i * 1000}, concat('v', id) FROM range(0, 100, 1, 1)""")
    }
    val df = spark.sql("SELECT * FROM lim.ns.t LIMIT 50")
    assert(df.count() == 50)
    assert(plannedFiles(spark.sql("SELECT * FROM lim.ns.t LIMIT 50")) == 1,
      "50 rows fit in the first 100-row file (prefix of 1)")
  }

  test("ORDER BY ASC LIMIT reads only range-covering files") {
    val df = spark.sql("SELECT k FROM lim.ns.t ORDER BY k LIMIT 5")
    assert(df.collect().map(_.getLong(0)).toSeq == (0L until 5L))
    assert(plannedFiles(
      spark.sql("SELECT k FROM lim.ns.t ORDER BY k LIMIT 5")) == 1,
      "the lowest file's range covers the whole top-5")
  }

  test("ORDER BY DESC LIMIT reads from the other end") {
    val df = spark.sql("SELECT k FROM lim.ns.t ORDER BY k DESC LIMIT 5")
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(3099L, 3098L, 3097L, 3096L, 3095L))
    assert(plannedFiles(
      spark.sql("SELECT k FROM lim.ns.t ORDER BY k DESC LIMIT 5")) == 1)
  }

  test("a filter disables the file-subset (correct results win)") {
    val df = spark.sql("SELECT * FROM lim.ns.t WHERE k >= 3000 LIMIT 5")
    assert(df.count() == 5)
    // stats-pruning on the filter still applies; the LIMIT prefix must
    // NOT (it would read the wrong end) — the k>=3000 file is planned
    val again = spark.sql("SELECT k FROM lim.ns.t WHERE k >= 3000 ORDER BY k LIMIT 3")
    assert(again.collect().map(_.getLong(0)).toSeq == Seq(3000L, 3001L, 3002L))
  }

  test("nullable order column refuses the top-n bound") {
    spark.sql("CREATE TABLE lim.ns.nulls (k BIGINT)")
    spark.sql("INSERT INTO lim.ns.nulls VALUES (1), (2), (NULL)")
    spark.sql("INSERT INTO lim.ns.nulls VALUES (10), (20)")
    // NULLS FIRST would be lost if the null-carrying file were skipped
    val rows = spark.sql("SELECT k FROM lim.ns.nulls ORDER BY k LIMIT 2")
      .collect()
    assert(rows(0).isNullAt(0) && rows(1).getLong(0) == 1)
    val allFiles = spark.sql("SELECT count(*) FROM lim.ns.`nulls$files`")
      .head.getLong(0)
    assert(plannedFiles(
      spark.sql("SELECT k FROM lim.ns.nulls ORDER BY k LIMIT 2")) == allFiles,
      "every file must be planned when nulls can hide anywhere")
  }
}
