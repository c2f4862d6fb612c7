package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** langid_trigram(text) — character-trigram language identification.
  *
  * Classic n-gram profile method (Cavnar & Trenkle '94, simplified):
  * each language has a profile of its most frequent character
  * trigrams (drawn from function words and affixes); the text's
  * trigram multiset is scored against each profile and the best
  * overlap-per-trigram wins. Profiles are compiled into a hash set at
  * class-load, scoring is one O(len) pass per row — scan-local, no
  * shuffle, safe at any corpus size.
  */
case class LangIdTrigram(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val text = " " + input.asInstanceOf[UTF8String].toString.toLowerCase + " "
    val scores = new Array[Int](LangIdTrigram.Langs.length)
    var i = 0
    val n = text.length
    while (i + 3 <= n) {
      val tri = text.substring(i, i + 3)
      val hit = LangIdTrigram.ProfileIndex.get(tri)
      if (hit != null) {
        var l = 0
        while (l < hit.length) { scores(hit(l)) += 1; l += 1 }
      }
      i += 1
    }
    var best = 0
    var l = 1
    while (l < scores.length) { if (scores(l) > scores(best)) best = l; l += 1 }
    if (scores(best) == 0) UTF8String.fromString("und")
    else UTF8String.fromString(LangIdTrigram.Langs(best))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LangIdTrigram {
  val Langs: Array[String] = Array("en", "de", "fr", "es")

  // characteristic trigrams incl. word boundaries (leading/trailing
  // space marks word edges) — drawn from each language's most frequent
  // function words and affixes
  private val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", "ing", "ng ", " of",
      "of ", " to", "to ", "ion", " in", "in ", "ed ", " is", "is ", "tha",
      "at ", "er ", " be", "ent"),
    "de" -> Seq(" de", "der", "er ", "ie ", " di", "die", "und", " un", "nd ",
      "ich", "ch ", "ein", " ei", "sch", " sc", "en ", "ung", "cht", " da",
      "das", "das", "ist", " is"),
    "fr" -> Seq(" le", "le ", " de", "de ", "es ", " la", "la ", "ent", "nt ",
      " et", "et ", "ion", " qu", "que", "ue ", " pa", "par", "ais", " un",
      "une", "eur", " da", "dan"),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", " el", "el ", " qu", "que",
      "ue ", "ión", " co", "con", "ent", " en", "en ", "ado", "ar ", " po",
      "por", "est", " es", "es "))

  /** trigram → indexes of languages whose profile contains it */
  val ProfileIndex: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    for ((lang, tris) <- profiles; tri <- tris.distinct) {
      val li = Langs.indexOf(lang)
      val cur = Option(m.get(tri)).getOrElse(Array.empty[Int])
      if (!cur.contains(li)) m.put(tri, cur :+ li)
    }
    m
  }
}
