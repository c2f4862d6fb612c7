package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  test("Fnv64 is deterministic and seed-sensitive") {
    assert(Fnv64.hashString("hello") == Fnv64.hashString("hello"))
    assert(Fnv64.hashString("hello") != Fnv64.hashString("hellp"))
    assert(Fnv64.hashString("hello", 1) != Fnv64.hashString("hello", 2))
  }

  test("SimHash64 near-duplicates land at small Hamming distance") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy cat again and again today"
    val c = "completely different words entirely here nothing shared at all whatsoever"
    def sim(s: String): Long =
      SimHash64(org.apache.spark.sql.catalyst.expressions.Literal(s))
        .nullSafeEval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .asInstanceOf[Long]
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(sim(a), sim(b)) < ham(sim(a), sim(c)))
    assert(sim(a) == sim(a))
  }

  test("Fingerprint64 is stable under identity, differs across docs") {
    def fp(s: String): Long =
      Fingerprint64(org.apache.spark.sql.catalyst.expressions.Literal(s))
        .nullSafeEval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .asInstanceOf[Long]
    val a = "some document text that is long enough to produce several grams"
    assert(fp(a) == fp(a))
    assert(fp(a) != fp(a.replace("document", "documett")))
  }

  test("MinHashSignature: identical docs share all mins, disjoint docs few") {
    def sig(s: String): Seq[Long] = {
      val arr = MinHashSignature(
        org.apache.spark.sql.catalyst.expressions.Literal(s), 32)
        .nullSafeEval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      arr.toLongArray().toSeq
    }
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val b = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    assert(sig(a) == sig(a))
    val overlap = sig(a).zip(sig(b)).count { case (x, y) => x == y }
    assert(overlap < 4, s"disjoint docs shared $overlap/32 minhashes")
  }
}
