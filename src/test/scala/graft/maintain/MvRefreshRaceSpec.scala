package graft.maintain

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.GraftCatalog

/** Concurrent materialized-view refresh: N catalog instances over ONE
  * warehouse (N "sessions"), each appending its own slice of the
  * source and refreshing the SAME view at the same time. The state
  * MERGE is not idempotent, so the protection under test is the
  * refresh commit protocol: the watermark compare inside the
  * transaction plus the conflict matrix's unresolvable update/update
  * verdict — a losing refresh must retry from the new base, never
  * replay its merge onto a state that already absorbed it. The final
  * state must equal the from-scratch aggregate (a double-merge or a
  * lost delta would break the row-count and sum equalities).
  */
class MvRefreshRaceSpec extends AnyFunSuite {

  private val N = 6
  private lazy val warehouse = Files.createTempDirectory("graft-mvrace").toString

  private def catName(i: Int) = s"rmv$i"

  lazy val spark: SparkSession = {
    var b = graft.Verify.sessionBuilder("8")
    (1 to N).foreach { i =>
      b = b.config(s"spark.sql.catalog.${catName(i)}",
          classOf[GraftCatalog].getName)
        .config(s"spark.sql.catalog.${catName(i)}.warehouse", warehouse)
    }
    b.getOrCreate()
  }

  test(s"$N concurrent refreshes serialize; state equals sequential truth") {
    spark.sql("CREATE NAMESPACE rmv1.ns1")
    spark.sql("""CREATE TABLE rmv1.ns1.src (
                   k BIGINT NOT NULL, v DOUBLE)""")
    spark.sql("""INSERT INTO rmv1.ns1.src
                 SELECT id % 13, CAST(id AS DOUBLE) / 4
                 FROM range(0, 4000, 1, 2)""")
    spark.sql("""CALL rmv1.system.create_materialized_view(
                   namespace => 'ns1', name => 'mv',
                   source_namespace => 'ns1', source_table => 'src',
                   group_by => 'k',
                   aggs => 'n:count:1;np:count:CAST(v AS DECIMAL(18,4));total:sum:CAST(v AS DECIMAL(18,4))')""")

    val rounds = 2
    val pool = Executors.newFixedThreadPool(N)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      (1 to rounds).foreach { round =>
        val start = new CountDownLatch(1)
        val done = new CountDownLatch(N)
        (1 to N).foreach { i =>
          pool.execute { () =>
            try {
              start.await()
              // each "session" appends ITS slice, then refreshes the
              // shared view — appends race (append/append rebase),
              // refreshes race (watermark CAS + unresolvable
              // update/update, retried inside refresh)
              spark.sql(
                s"""INSERT INTO ${catName(i)}.ns1.src
                    SELECT id % 13, CAST(id AS DOUBLE) / 8
                    FROM range(${round * 100000 + i * 1000},
                               ${round * 100000 + i * 1000 + 500}, 1, 1)""")
              spark.sql(
                s"""CALL ${catName(i)}.system.refresh_materialized_view(
                      namespace => 'ns1', name => 'mv')""").collect()
            } catch {
              case t: Throwable => failures.add(t)
            } finally done.countDown()
          }
        }
        start.countDown()
        assert(done.await(300, TimeUnit.SECONDS), "race round timed out")
        assert(failures.isEmpty,
          s"round $round refresh failed: ${failures.peek()}")
      }
    } finally pool.shutdownNow()

    // one final refresh from any session to absorb whatever the last
    // round's losers left pending, then the state must equal scratch
    spark.sql("""CALL rmv1.system.refresh_materialized_view(
                   namespace => 'ns1', name => 'mv')""").collect()
    val state = spark.sql(
      """SELECT k, n, np, CAST(total AS DOUBLE) FROM rmv1.ns1.mv
         ORDER BY k""").collect().map(_.toString).toSeq
    val truth = spark.sql(
      """SELECT k, count(*), count(CAST(v AS DECIMAL(18,4))),
                CAST(sum(CAST(v AS DECIMAL(18,4))) AS DOUBLE)
         FROM rmv1.ns1.src GROUP BY k ORDER BY k""")
      .collect().map(_.toString).toSeq
    assert(state == truth,
      s"concurrent refreshes corrupted the state:\n$state\nvs\n$truth")
  }
}
