package graft.spark

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** readStream FROM a graft table: stream offsets are snapshot ids,
  * each trigger discovers new commits from one metadata read, and
  * non-additive history fails the stream instead of re-emitting
  * rewritten rows.
  */
class StreamingTableSourceSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("graft-sts").toString

  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4")
    .config("spark.sql.extensions", classOf[GraftSparkExtensions].getName)
    .config("spark.sql.catalog.stc", classOf[GraftCatalog].getName)
    .config("spark.sql.catalog.stc.warehouse", warehouse)
    .getOrCreate()

  test("a graft table streams commits as micro-batches") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS stc.ns")
    spark.sql("CREATE TABLE stc.ns.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO stc.ns.t VALUES (1, 'a'), (2, 'b')")
    val checkpoint = Files.createTempDirectory("graft-sts-cp").toString
    val q = spark.readStream.table("stc.ns.t")
      .writeStream
      .format("memory").queryName("sts_sink")
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("sts_sink").count() == 2,
        "the initial batch carries the table's current content")
      spark.sql("INSERT INTO stc.ns.t VALUES (3, 'c')")
      spark.sql("INSERT INTO stc.ns.t VALUES (4, 'd')")
      q.processAllAvailable()
      assert(spark.table("sts_sink").count() == 4,
        "later commits arrive incrementally")
      assert(spark.table("sts_sink").select("k").collect().map(_.getLong(0))
        .sorted.toSeq == Seq(1L, 2L, 3L, 4L), "each row exactly once")
    } finally q.stop()
  }

  test("a rewrite in the stream range fails the stream, not the data") {
    spark.sql("CREATE TABLE stc.ns.r (k BIGINT)")
    spark.sql("INSERT INTO stc.ns.r VALUES (1), (2)")
    val checkpoint = Files.createTempDirectory("graft-sts-cp2").toString
    val q = spark.readStream.table("stc.ns.r")
      .writeStream
      .format("memory").queryName("sts_sink2")
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("sts_sink2").count() == 2)
      spark.sql("DELETE FROM stc.ns.r WHERE k = 1")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("non-additive") ||
        Option(e.getCause).exists(_.getMessage.contains("non-additive")))
    } finally q.stop()
  }

  test("partitioned tables stream too (key-grouped batch path intact)") {
    spark.sql("""CREATE TABLE stc.ns.p (k BIGINT, region STRING)
      PARTITIONED BY (region)""")
    spark.sql("INSERT INTO stc.ns.p VALUES (1, 'asia'), (2, 'emea')")
    val checkpoint = Files.createTempDirectory("graft-sts-cp5").toString
    val q = spark.readStream.table("stc.ns.p")
      .writeStream.format("memory").queryName("sts_sink5")
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("sts_sink5").count() == 2)
      spark.sql("INSERT INTO stc.ns.p VALUES (3, 'asia')")
      q.processAllAvailable()
      assert(spark.table("sts_sink5").count() == 3)
    } finally q.stop()
  }

  test("max-snapshots-per-trigger caps catch-up batch size") {
    spark.sql("CREATE TABLE stc.ns.m (k BIGINT)")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO stc.ns.m VALUES ($i)"))
    val checkpoint = Files.createTempDirectory("graft-sts-cp4").toString
    val q = spark.readStream
      .option("max-snapshots-per-trigger", "1")
      .table("stc.ns.m")
      .writeStream.format("memory").queryName("sts_sink4")
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("sts_sink4").count() == 3, "catch-up is complete")
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 3, s"1-snapshot batches expected, saw $batches")
    } finally q.stop()
  }

  test("a concurrent BRANCH commit interleaved in the id range is " +
      "invisible to the stream, even under per-trigger caps") {
    spark.sql("CREATE TABLE stc.ns.b (k BIGINT)")
    spark.sql("INSERT INTO stc.ns.b VALUES (1)")
    // interleave BRANCH snapshots between main commits: ids are global,
    // so a capped stream's intermediate offset `start + n` would land
    // on a branch snapshot without main-lineage offset resolution
    spark.sql("""CALL stc.system.create_branch(
                   namespace => 'ns', table => 'b', branch => 'wip')""")
    spark.sql("INSERT INTO stc.ns.`b$branch_wip` VALUES (100), (101)")
    spark.sql("INSERT INTO stc.ns.b VALUES (2)")
    spark.sql("INSERT INTO stc.ns.`b$branch_wip` VALUES (102)")
    spark.sql("INSERT INTO stc.ns.b VALUES (3)")
    val checkpoint = Files.createTempDirectory("graft-sts-cp6").toString
    val q = spark.readStream
      .option("max-snapshots-per-trigger", "1")
      .table("stc.ns.b")
      .writeStream.format("memory").queryName("sts_sink6")
      .option("checkpointLocation", checkpoint)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("sts_sink6").select("k").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L),
        "main rows exactly once; branch rows never")
    } finally q.stop()
  }

  test("restart resumes from the checkpointed snapshot offset") {
    spark.sql("CREATE TABLE stc.ns.c (k BIGINT)")
    spark.sql("INSERT INTO stc.ns.c VALUES (1)")
    val checkpoint = Files.createTempDirectory("graft-sts-cp3").toString
    val outDir = Files.createTempDirectory("graft-sts-out").toString
    def run(): Unit = {
      val q = spark.readStream.table("stc.ns.c")
        .writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(outDir).count() == 1)
    spark.sql("INSERT INTO stc.ns.c VALUES (2)")
    run()
    // exactly-once across the restart: k=1 must NOT be re-delivered —
    // proof the start offset came from the checkpoint, not initialOffset
    val got = spark.read.parquet(outDir).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L),
      s"restart must resume past snapshot 0, got rows $got")
  }
}
