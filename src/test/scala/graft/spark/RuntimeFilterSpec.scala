package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.scalatest.funsuite.AnyFunSuite

/** Runtime (dynamic) file pruning: a selective dimension filter
  * reaches the graft fact scan AT EXECUTION as a DPP-style runtime
  * predicate — partition groups and stats-disjoint files that can't
  * match the joined keys are skipped without re-planning. At 100 TB
  * this is the difference between a star join scanning the whole fact
  * table and scanning one partition's worth.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-rf").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.rf", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.rf.warehouse", warehouse)
    // test tables are KB-sized; disable the cost heuristics that make
    // DPP decline tiny scans so the test exercises big-table economics
    .config("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    .config("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio",
      "100000")
    .getOrCreate()

  /** Rows actually produced by the scans of df's OWN executed plan —
    * df is executed first, so runtime (DPP) filters have fired. Rows,
    * not RDD partitions: after runtime group filtering the key-grouped
    * RDD keeps its declared partition count (pruned groups go empty),
    * so partition counts over-report what was read.
    */
  private def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def scans(p: SparkPlan): Seq[Long] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq.empty // same stage, same metrics — counted at its origin
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        Seq(b.metrics.get("numOutputRows").map(_.value).getOrElse(0L))
      case s: FileSourceScanExec =>
        Seq(s.metrics.get("numOutputRows").map(_.value).getOrElse(0L))
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).sum
  }

  private def dppFired(df: org.apache.spark.sql.DataFrame): Boolean = {
    val s = df.queryExecution.executedPlan.toString
    s.contains("dynamicpruningexpression") &&
      !s.contains("dynamicpruningexpression(true)")
  }

  test("partition groups prune at runtime from a dimension filter") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rf.ns")
    spark.sql("""CREATE TABLE rf.ns.fact (k BIGINT, region STRING)
      PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO rf.ns.fact
      SELECT id, CASE WHEN id % 3 = 0 THEN 'asia'
                      WHEN id % 3 = 1 THEN 'emea' ELSE 'amer' END
      FROM range(0, 300, 1, 4)""")
    // the dimension must be a real scan: a LocalRelation dim gets its
    // filter constant-folded away and DPP sees nothing selective
    spark.sql("CREATE TABLE rf.ns.dim (region STRING, flag STRING)")
    spark.sql("""INSERT INTO rf.ns.dim VALUES
      ('asia', 'keep'), ('emea', 'drop'), ('amer', 'drop')""")
    val joined = spark.sql("""
      SELECT f.k, f.region FROM rf.ns.fact f
      JOIN rf.ns.dim d ON f.region = d.region
      WHERE d.flag = 'keep'""")
    assert(joined.count() == 100)
    val rows = scannedRows(joined)
    assert(dppFired(joined), "a runtime pruning filter must reach the fact scan")
    // pruned: 100 fact rows (asia group only) + dim; unpruned: 300 + dim
    assert(rows <= 110,
      s"only the 'asia' fact group may be read (unpruned would be 303+): $rows")
  }

  test("stats-disjoint files prune at runtime on a non-partitioned table") {
    spark.sql("CREATE TABLE rf.ns.sorted (k BIGINT, v STRING)")
    // 4 appends with DISJOINT key ranges → 4 files with tight stats
    (0 until 4).foreach { i =>
      spark.sql(s"""INSERT INTO rf.ns.sorted
        SELECT id + ${i * 1000}, 'x' FROM range(0, 100, 1, 1)""")
    }
    spark.sql("CREATE TABLE rf.ns.dimk (k BIGINT, pick STRING)")
    spark.sql("""INSERT INTO rf.ns.dimk VALUES
      (2010, 'y'), (2020, 'y'), (123456, 'n')""")
    val joined = spark.sql("""
      SELECT s.k, s.v FROM rf.ns.sorted s
      JOIN rf.ns.dimk d ON s.k = d.k WHERE d.pick = 'y'""")
    assert(joined.count() == 2)
    val rows = scannedRows(joined)
    assert(dppFired(joined), "a runtime pruning filter must reach the fact scan")
    // pruned: 100 fact rows (one file's range covers both keys) + dim
    // rows (possibly scanned twice); unpruned: 400 + dim
    assert(rows <= 110,
      s"only the one file covering k∈{2010,2020} may be read: $rows")
  }

  test("runtime filter() prunes the file list mechanically") {
    // direct contract test, independent of whether the optimizer
    // chooses to inject a runtime filter for a given plan shape
    import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    val t = spark.sessionState.catalogManager.catalog("rf")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "sorted"))
      .asInstanceOf[GraftTable]
    val sb = t.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
      .asInstanceOf[GraftScanBuilder]
    val scan = sb.build()
    assert(scan.isInstanceOf[SupportsRuntimeV2Filtering])
    val rf = scan.asInstanceOf[SupportsRuntimeV2Filtering]
    assert(rf.filterAttributes().map(_.describe()).contains("k"))
    val before = scan.toBatch.planInputPartitions().length
    assert(before == 4)
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    rf.filter(Array(new Predicate("IN",
      Array(Expressions.column("k"), Expressions.literal(2010L)))))
    assert(scan.toBatch.planInputPartitions().length == 1,
      "an IN runtime predicate must drop stats-disjoint files")
  }

  test("scans report delegated statistics (auto-broadcast economics)") {
    // without SupportsReportStatistics forwarding, every graft scan
    // reports unknown size and nothing ever auto-broadcasts
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    val t = spark.sessionState.catalogManager.catalog("rf")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "dimk"))
      .asInstanceOf[GraftTable]
    val scan = t.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap())).build()
    val stats = scan.asInstanceOf[SupportsReportStatistics].estimateStatistics()
    assert(stats.sizeInBytes().isPresent && stats.sizeInBytes().getAsLong > 0,
      "a non-empty table must report a concrete size estimate")
  }
}
