package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs at sf0.001 and returns rows. */
class QueryBatterySpec extends AnyFunSuite {
  lazy val spark: SparkSession = Verify.sessionBuilder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  // candidate-pair queries can legitimately be sparse at the smallest SF
  private val mayBeEmpty = Set("dd02_minhash_lsh", "dd03_ngram_jaccard",
    "dd04_simhash", "dd05_embedding_dup", "dd06_embedding_lsh")

  for (q <- SparkEntry.allDefs) {
    test(s"${q.name} runs at sf0.001") {
      val n = q.fn(spark, sf).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
