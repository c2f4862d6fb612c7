package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hidden partitioning: `PARTITIONED BY (days(ts), bucket(n, k),
  * truncate(w, s))` lays files out by TRANSFORMED values the schema
  * never shows; reads prune files by mapping source-column predicates
  * through the transforms; co-bucketed tables join without a shuffle.
  */
class TransformPartitionSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-tp").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.tp", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.tp.warehouse", warehouse)
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    .getOrCreate()

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
          case k: org.apache.spark.sql.graft.KeyedFilePartition =>
            k.inner.files.map(_.filePath.toString)
          case _ => Seq.empty
        }
      case other => other.children.flatMap(files)
    }
    files(df.queryExecution.executedPlan).distinct.length.toLong
  }

  test("days + bucket layout: write, read back, schema stays clean") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tp.ns")
    spark.sql("""CREATE TABLE tp.ns.ev (k BIGINT, ts TIMESTAMP, v STRING)
      PARTITIONED BY (days(ts), bucket(4, k))""")
    spark.sql("""INSERT INTO tp.ns.ev
      SELECT id, timestamp'2024-03-01 00:00:00'
          + make_interval(0, 0, 0, 0, CAST(id % 96 AS INT), 0, 0),
        concat('v', id)
      FROM range(0, 400, 1, 4)""")
    val out = spark.table("tp.ns.ev")
    assert(out.columns.toSeq == Seq("k", "ts", "v"),
      "hidden partition columns must not leak into the schema")
    assert(out.count() == 400)
    assert(out.agg(org.apache.spark.sql.functions.sum("k")).head.getLong(0)
      == (0L until 400L).sum)
  }

  test("predicate on the timestamp prunes day directories") {
    val all = plannedFiles(spark.table("tp.ns.ev"))
    // 96 distinct hours over 4 days: one calendar day is 1/4 of the data
    val oneDay = plannedFiles(spark.sql(
      """SELECT * FROM tp.ns.ev
         WHERE ts >= timestamp'2024-03-02 00:00:00'
           AND ts < timestamp'2024-03-03 00:00:00'"""))
    assert(oneDay < all, s"day range must prune ($oneDay vs $all)")
    val rows = spark.sql(
      """SELECT count(*) FROM tp.ns.ev
         WHERE ts >= timestamp'2024-03-02 00:00:00'
           AND ts < timestamp'2024-03-03 00:00:00'""").head.getLong(0)
    // ids where (id % 96) ∈ [24, 48): 24 per 96-block × 4 full blocks
    assert(rows == 96)
  }

  test("equality on the bucketed key prunes to its bucket") {
    val all = plannedFiles(spark.table("tp.ns.ev"))
    val one = plannedFiles(spark.sql("SELECT * FROM tp.ns.ev WHERE k = 7"))
    assert(one < all, s"bucket pruning must bite ($one vs $all)")
    assert(spark.sql("SELECT v FROM tp.ns.ev WHERE k = 7").head.getString(0)
      == "v7")
  }

  test("truncate transform groups strings by prefix and prunes equality") {
    spark.sql("""CREATE TABLE tp.ns.docs (id BIGINT, lang STRING)
      PARTITIONED BY (truncate(2, lang))""")
    spark.sql("""INSERT INTO tp.ns.docs VALUES
      (1, 'en-US'), (2, 'en-GB'), (3, 'de-DE'), (4, 'fr-FR'), (5, 'de-AT')""")
    assert(spark.table("tp.ns.docs").count() == 5)
    val all = plannedFiles(spark.table("tp.ns.docs"))
    val de = plannedFiles(
      spark.sql("SELECT * FROM tp.ns.docs WHERE lang = 'de-DE'"))
    assert(de < all, s"prefix bucket must prune ($de vs $all)")
    assert(spark.sql("SELECT count(*) FROM tp.ns.docs WHERE lang >= 'de' AND lang < 'df'")
      .head.getLong(0) == 2)
  }

  test("row-level ops rewrite transform-partitioned tables correctly") {
    spark.sql("UPDATE tp.ns.docs SET lang = 'de-CH' WHERE id = 5")
    assert(spark.sql("SELECT lang FROM tp.ns.docs WHERE id = 5")
      .head.getString(0) == "de-CH")
    spark.sql("DELETE FROM tp.ns.docs WHERE lang = 'fr-FR'")
    assert(spark.table("tp.ns.docs").count() == 4)
    // rewritten files landed back under the truncate layout: pruning
    // still works after the rewrite
    val all = plannedFiles(spark.table("tp.ns.docs"))
    val de = plannedFiles(
      spark.sql("SELECT * FROM tp.ns.docs WHERE lang = 'de-CH'"))
    assert(de < all)
  }

  test("co-bucketed tables join without a shuffle") {
    // the suite may inherit a session another spec created — pin the
    // SPJ-relevant confs for this test and restore them after
    val pinned = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = pinned.map { case (k, _) => k -> spark.conf.getOption(k) }
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      spark.sql("""CREATE TABLE tp.ns.a (k BIGINT, x STRING)
        PARTITIONED BY (bucket(4, k))""")
      spark.sql("""CREATE TABLE tp.ns.b (k BIGINT, y STRING)
        PARTITIONED BY (bucket(4, k))""")
      spark.sql("""INSERT INTO tp.ns.a
        SELECT id, concat('x', id) FROM range(0, 100, 1, 4)""")
      spark.sql("""INSERT INTO tp.ns.b
        SELECT id, concat('y', id) FROM range(0, 100, 1, 4)""")
      val joined = spark.sql(
        """SELECT a.k, a.x, b.y FROM tp.ns.a a JOIN tp.ns.b b ON a.k = b.k""")
      assert(joined.count() == 100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"storage-partitioned join must not shuffle:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("compaction preserves the transform layout and its pruning") {
    spark.sql(
      "CALL tp.system.compact_table(namespace => 'ns', `table` => 'ev')")
    val out = spark.table("tp.ns.ev")
    assert(out.count() == 400)
    val all = plannedFiles(out)
    val one = plannedFiles(spark.sql("SELECT * FROM tp.ns.ev WHERE k = 7"))
    assert(one < all, "bucket pruning survives compaction")
  }
}
