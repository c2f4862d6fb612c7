package graft.maintain

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.GraftCatalog

/** Hash-bucketed MV state (`spark.graft.mv.state.buckets = N`): the
  * equality-delta state table partitions by bucket(N, firstKey), and
  * the auto-compaction fold rewrites ONLY the buckets the pending
  * delete keys can touch — untouched buckets' files carry into the new
  * snapshot byte-identical — so at billions of groups a fold costs the
  * touched buckets, never the view.
  */
class MvStateBucketSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-msb").toString

  // isolated session: the tests mutate MV runtime conf
  lazy val spark: SparkSession = {
    val s = graft.Verify.sessionBuilder("4").getOrCreate().newSession()
    s.conf.set("spark.sql.catalog.msb", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.msb.warehouse", warehouse)
    s
  }

  private def files(): Set[String] = spark.sql(
    "SELECT path FROM msb.ns1.`mv$files`")
    .collect().map(_.getString(0)).toSet

  test("refresh merges write touched buckets; the fold rewrites " +
      "touched buckets only and untouched files carry over unchanged") {
    spark.sql("CREATE NAMESPACE msb.ns1")
    spark.sql("CREATE TABLE msb.ns1.src (k BIGINT NOT NULL, v DOUBLE)")
    spark.sql("""INSERT INTO msb.ns1.src
                 SELECT id % 64, CAST(id AS DOUBLE) FROM range(0, 6400, 1, 2)""")
    spark.conf.set("spark.graft.mv.state.buckets", "8")
    try spark.sql("""CALL msb.system.create_materialized_view(
                       namespace => 'ns1', name => 'mv',
                       source_namespace => 'ns1', source_table => 'src',
                       group_by => 'k',
                       aggs => 'n:count:1;total:sum:CAST(v AS DECIMAL(18,2))')""")
    finally spark.conf.unset("spark.graft.mv.state.buckets")
    assert(files().exists(_.contains("gp_bucket8_k=")),
      "state files must live under bucket partition dirs")

    def refreshTouchingKeyOne(i: Int): Unit = {
      // every append touches ONLY group k=1 → refresh deltas land in
      // exactly one bucket
      spark.sql(s"INSERT INTO msb.ns1.src VALUES (1, ${i * 100}.0)")
      spark.sql("""CALL msb.system.refresh_materialized_view(
                     namespace => 'ns1', name => 'mv')""").collect()
    }
    def pendingDeletes(): Long = spark.sql(
      "SELECT count(*) FROM msb.ns1.`mv$deletes`").head.getLong(0)

    spark.conf.set("spark.graft.mv.compact-after-deletes", "3")
    try {
      refreshTouchingKeyOne(1)
      refreshTouchingKeyOne(2)
      val beforeFold = files()
      // third refresh crosses the threshold → the fold runs
      refreshTouchingKeyOne(3)
      assert(pendingDeletes() == 0,
        s"the fold must clear pending deletes, still ${pendingDeletes()}")
      val afterFold = files()
      // the fold rewrote ONLY the touched bucket: files of every other
      // bucket survive with identical paths
      val carried = beforeFold.intersect(afterFold)
      val bucketOf: String => String =
        p => p.split('/').find(_.startsWith("gp_bucket8_k=")).getOrElse("?")
      val touchedBuckets = afterFold.diff(beforeFold).map(bucketOf)
      val carriedBuckets = carried.map(bucketOf)
      assert(carried.nonEmpty, "untouched buckets must carry over")
      assert(touchedBuckets.size < 8,
        s"the fold must not rewrite every bucket: $touchedBuckets")
      assert(carriedBuckets.intersect(touchedBuckets).forall(b =>
        afterFold.count(f => bucketOf(f) == b) >= 1), "sanity")
    } finally spark.conf.unset("spark.graft.mv.compact-after-deletes")

    // state stays exact through the scoped fold
    val state = spark.sql(
      "SELECT k, n, CAST(total AS DOUBLE) FROM msb.ns1.mv ORDER BY k")
      .collect().map(_.toString).toSeq
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val truth = try spark.sql(
      """SELECT k, count(*), CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE)
         FROM msb.ns1.src GROUP BY k ORDER BY k""")
      .collect().map(_.toString).toSeq
    finally spark.conf.unset("spark.graft.mv.rewrite.enabled")
    assert(state == truth)

    // and a later refresh stays incremental (the fold is net-zero on
    // the source watermark)
    spark.sql("INSERT INTO msb.ns1.src VALUES (33, 5.5)")
    val mode = spark.sql("""CALL msb.system.refresh_materialized_view(
                              namespace => 'ns1', name => 'mv')""")
      .head.getString(0)
    assert(mode == "incremental", mode)
  }
}
