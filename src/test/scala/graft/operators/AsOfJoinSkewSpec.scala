package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The time-bucketed hot-key path must be row-identical to the plain
  * per-key merge — bucketing is a physical re-layout, not a semantic
  * change.
  */
class AsOfJoinSkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4").getOrCreate()

  private def fixtures = {
    import spark.implicits._
    // one pathologically hot key (20k rows each side) + cold keys,
    // deterministic pseudo-random timestamps interleaved so carry-
    // forward boundaries matter (left rows early in a bucket must
    // match right rows from EARLIER buckets)
    val left = (0 until 20000).map { i =>
      (i.toLong, 7L, (i * 2654435761L) % 1000000L)
    } ++ (0 until 200).map { i => (100000L + i, (i % 13).toLong, i * 997L) }
    val right = (0 until 20000).map { i =>
      val ts = (i * 40503L) % 1000000L
      (7L, ts, ts, i * 1.5)
    } ++ (0 until 300).map { i =>
      val ts = i * 641L
      ((i % 13).toLong, ts, ts, i * 2.0)
    }
    (left.toDF("event_id", "user_id", "ts"),
      right.toDF("user_id", "ts", "click_ts", "click_value"))
  }

  test("hot key routed through time buckets matches the plain path exactly") {
    val (left, right) = fixtures
    val plain = AsOfJoin.join(left, right, "user_id", "ts",
        Seq("click_ts", "click_value"), hotThreshold = Long.MaxValue)
      .collect().toSet
    val bucketed = AsOfJoin.join(left, right, "user_id", "ts",
        Seq("click_ts", "click_value"), hotThreshold = 1000, nBuckets = 8)
      .collect().toSet
    assert(bucketed == plain,
      s"bucketed path diverged: ${(bucketed -- plain).take(3)} vs ${(plain -- bucketed).take(3)}")
    assert(plain.nonEmpty)
  }

  test("no hot keys leaves the plain path untouched") {
    val (left, right) = fixtures
    val a = AsOfJoin.join(left, right, "user_id", "ts",
        Seq("click_ts", "click_value"), hotThreshold = 50000, nBuckets = 8)
      .collect().toSet
    val b = AsOfJoin.join(left, right, "user_id", "ts",
      Seq("click_ts", "click_value"), hotThreshold = Long.MaxValue)
      .collect().toSet
    assert(a == b)
  }

  test("two-tier salted join: heavy keys detected, salted path " +
      "row-identical to the plain join") {
    import spark.implicits._
    // key 7 carries half the probe rows (a genuine straggler key);
    // the rest spread uniformly
    val probe = ((0 until 30000).map(i => (7L, i.toDouble)) ++
      (0 until 30000).map(i => ((i % 3000).toLong + 100, i * 2.0)))
      .toDF("k", "v")
    val build = (0L to 3100L).map(k => (k, s"b$k")).toDF("k", "tag")
    // sample the whole probe: detection must find exactly the hot key
    val heavy = AsOfJoin.detectHeavyKeys(probe, "k", fraction = 1.0)
    assert(heavy == Seq(7L), s"expected the one hot key, got $heavy")
    val salted = AsOfJoin.saltedJoin(probe, build, "k", salt = 8,
      sampleFraction = 1.0).collect().toSet
    val plain = probe.join(build, Seq("k")).collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
    // skew-free data: detection stays empty and the join degenerates
    // to the plain single-path join (no 8x build replication)
    val uniform = (0 until 30000).map(i => ((i % 3000).toLong, i * 1.0))
      .toDF("k", "v")
    assert(AsOfJoin.detectHeavyKeys(uniform, "k", fraction = 1.0).isEmpty)
    val viaSalt = AsOfJoin.saltedJoin(uniform, build, "k", salt = 8,
      sampleFraction = 1.0)
    assert(viaSalt.queryExecution.analyzed.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }.isEmpty, "skew-free input must not take the two-path union")
    assert(viaSalt.count() == uniform.count())
  }
}
