package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit FNV-1a — deterministic, dependency-free, stable across JVMs.
  * Used as the token hash for simhash / minhash / winnowing so results
  * are reproducible (Spark's murmur `hash()` is 32-bit; `xxhash64` is
  * also fine but we need per-seed variants for minhash).
  */
object Fnv64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  def hashBytes(bytes: Array[Byte], seed: Long): Long = {
    var h = Offset ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  def hashString(s: String, seed: Long = 0L): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)
}

/** simhash64(text) — 64-bit SimHash over whitespace tokens.
  *
  * Each token contributes ±1 per bit position based on its FNV-1a hash;
  * the sign of each accumulated position forms the output bit. Near-
  * duplicate texts land within a small Hamming distance, so candidate
  * generation is a cheap equi-join on 16-bit bands (4 bands → Hamming
  * ≤3 pairs always share a band). Runs per-row inside the scan —
  * no shuffle, no driver state; scales linearly with corpus size.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  /** Shared core (also served as a catalog SQL function). */
  def compute(text: String): Long = {
    val acc = new Array[Int](64)
    var start = 0
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || text.charAt(i) == ' ') {
        if (i > start) {
          val h = Fnv64.hashString(text.substring(start, i))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** fingerprint64(text) — winnowing document fingerprint (Schleimer et
  * al., SIGMOD'03): rolling hash over character 8-grams, minimum hash
  * per window of 16, XOR-fold of the selected minima. Robust to small
  * edits; equal fingerprints ⇒ high content overlap. Per-row, scan-
  * local, O(len) — safe at any scale.
  */
case class Fingerprint64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Fingerprint64.compute(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Fingerprint64 {
  private final val K = 8 // gram size
  private final val W = 16 // winnow window

  /** Shared core (also served as a catalog SQL function). */
  def compute(s: String): Long = {
    if (s.length < K) return Fnv64.hashString(s)
    val n = s.length - K + 1
    val grams = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = Fnv64.Offset
      var j = 0
      while (j < K) { h ^= s.charAt(i + j); h *= Fnv64.Prime; j += 1 }
      grams(i) = h
      i += 1
    }
    var out = 0L
    var w = 0
    while (w < n) {
      val end = math.min(w + W, n)
      var min = Long.MaxValue
      var j = w
      while (j < end) { if (grams(j) < min) min = grams(j); j += 1 }
      out ^= java.lang.Long.rotateLeft(min, (w / W) & 63)
      w += W
    }
    out
  }
}

/** minhash_sigs(text, k) — k-element MinHash signature over word
  * 3-shingles. Returns array<long> of length k where element i is the
  * minimum FNV-1a(shingle, seed=i) over the document's distinct
  * shingles. One pass per row; k seeds reuse the same shingle bytes.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val words = text.split(' ')
    val sig = Array.fill(k)(Long.MaxValue)
    if (words.length >= 3) {
      var i = 0
      while (i <= words.length - 3) {
        val shingle = words(i) + " " + words(i + 1) + " " + words(i + 2)
        val bytes = shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var s = 0
        while (s < k) {
          val h = Fnv64.hashBytes(bytes, s.toLong * 0x9e3779b97f4a7c15L)
          if (h < sig(s)) sig(s) = h
          s += 1
        }
        i += 1
      }
    } else {
      // degenerate short doc: hash the whole text so the signature is defined
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var s = 0
      while (s < k) {
        sig(s) = Fnv64.hashBytes(bytes, s.toLong * 0x9e3779b97f4a7c15L)
        s += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
