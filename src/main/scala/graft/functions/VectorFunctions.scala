package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math.
  *
  * Implemented as `Expression`s (not Scala UDFs) so the whole row stays
  * inside Tungsten: inputs arrive as `ArrayData` (no boxing of the
  * vector into Scala collections), and the dot/norm loop runs over the
  * primitive array. At 100 TB this is the hot path of similarity
  * search — a UDF would serialize every row through an encoder.
  *
  * Accumulation is sequential in `Double`, matching what a columnar
  * engine (e.g. DuckDB's list_cosine_similarity on DOUBLE[]) computes,
  * so results are comparable to an external oracle up to ~1 ulp.
  */
abstract class VectorBinaryExpression extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemGetter(e: Expression): (ArrayData, Int) => Double =
    e.dataType match {
      case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other =>
        throw new IllegalArgumentException(s"expected array<float|double>, got $other")
    }
}

/** cosine_sim(a, b) — cosine similarity of two numeric arrays. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  @transient private lazy val getL = elemGetter(left)
  @transient private lazy val getR = elemGetter(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = getL(a, i); val y = getR(b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** dot_product(a, b) — inner product of two numeric arrays. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  @transient private lazy val getL = elemGetter(left)
  @transient private lazy val getR = elemGetter(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += getL(a, i) * getR(b, i); i += 1 }
    dot
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
