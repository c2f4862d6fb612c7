package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The approximate near-dup paths must not miss what the exact
  * baselines find (at the same threshold) on the planted duplicates.
  */
class DedupRecallSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.01"

  private def pairs(name: String): Set[(Long, Long)] =
    graft.SparkEntry.queries(name)(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinHash-LSH recall: finds every exact-jaccard pair (jac >= 0.5)") {
    val exact = pairs("dd03_ngram_jaccard")
    val lsh = pairs("dd02_minhash_lsh")
    assert(exact.nonEmpty, "planted near-dups expected at sf0.01")
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed planted pairs: $missed")
  }

  test("embedding LSH candidates verified subset of exact pairs") {
    val exact = graft.SparkEntry.queries("dd05_embedding_dup")(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.SparkEntry.queries("dd06_embedding_lsh")(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step guarantees precision (no false positives)
    assert((lsh -- exact).isEmpty)
    // and the 16-bit sketch should recover a usable fraction
    assert(lsh.size.toDouble / exact.size > 0.05,
      s"LSH recall collapsed: ${lsh.size}/${exact.size}")
  }
}
