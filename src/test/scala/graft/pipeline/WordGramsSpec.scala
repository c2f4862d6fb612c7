package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shared word-n-gram generator (ta11 decontamination, dd10 span
  * dedup) against the inputs the corpus never exercises: empty text,
  * whitespace-only text, and documents shorter than the gram width —
  * Spark's `sequence(1, 0)` is DESCENDING, so an unguarded generator
  * evaluates `slice(ws, 0, n)` and throws at runtime.
  */
class WordGramsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.Verify.sessionBuilder("4").getOrCreate()

  private def grams(text: String, n: Int): Seq[String] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(split(trim(col("text")), "\\s+").as("ws"))
      .select(TextAnalysis.wordGrams("ws", n, hashed = false).as("g"))
      .collect()(0).getSeq[String](0)
  }

  test("short, empty, and whitespace-only inputs yield zero grams") {
    assert(grams("", 4).isEmpty)
    assert(grams("   ", 4).isEmpty)
    assert(grams("one two three", 4).isEmpty) // 3 tokens < n=4
    assert(grams("a b c d e f g", 8).isEmpty) // 7 tokens < n=8
  }

  test("exact-width and longer inputs yield sliding grams") {
    assert(grams("a b c d", 4) == Seq("a b c d"))
    assert(grams("a b c d e", 4) == Seq("a b c d", "b c d e"))
  }

  test("hashed grams are md5 of the plain grams") {
    import spark.implicits._
    val row = Seq("a b c d e").toDF("text")
      .select(split(col("text"), "\\s+").as("ws"))
      .select(TextAnalysis.wordGrams("ws", 4, hashed = true).as("h"),
        TextAnalysis.wordGrams("ws", 4, hashed = false).as("g"))
      .collect()(0)
    val hashed = row.getSeq[String](0)
    val plain = row.getSeq[String](1)
    assert(hashed == plain.map(g =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(g)))
  }
}
