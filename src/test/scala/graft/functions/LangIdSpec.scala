package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class LangIdSpec extends AnyFunSuite {
  private def lid(s: String): String =
    LangIdTrigram(Literal(s))
      .nullSafeEval(UTF8String.fromString(s)).asInstanceOf[UTF8String].toString

  test("trigram profiles identify obvious sentences") {
    assert(lid("the quick brown fox jumps over the lazy dog and the cat") == "en")
    assert(lid("der schnelle braune fuchs springt über den faulen hund und die katze") == "de")
    assert(lid("le renard brun rapide saute par dessus le chien paresseux dans la forêt") == "fr")
    assert(lid("el rápido zorro marrón salta sobre el perro perezoso en la casa") == "es")
  }

  test("no profile hits → und") {
    assert(lid("xxxx zzzz qqqq") == "und")
  }
}
