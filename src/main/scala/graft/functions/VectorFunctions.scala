package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math.
  *
  * Implemented as `Expression`s (not Scala UDFs) so the whole row stays
  * inside Tungsten: inputs arrive as `ArrayData` (no boxing of the
  * vector into Scala collections), and the dot/norm loop runs over the
  * primitive array — with `doGenCode` so the loop is compiled into the
  * enclosing whole-stage-codegen function. At 100 TB this is the hot
  * path of similarity search; a UDF would serialize every row through
  * an encoder, and a fallback expression would break the codegen span.
  *
  * Accumulation is sequential in `Double`, matching what a columnar
  * engine (e.g. DuckDB's list_cosine_similarity on DOUBLE[]) computes,
  * so results are comparable to an external oracle up to ~1 ulp.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemGetter(e: Expression): (ArrayData, Int) => Double =
    e.dataType match {
      case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case other =>
        throw new IllegalArgumentException(s"expected array<float|double>, got $other")
    }

  /** Java source for element i of an ArrayData variable, as double. */
  protected def elemJava(e: Expression, arr: String, i: String): String =
    e.dataType match {
      case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
      case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${elemJava(left, a, i)};
         |  double $y = ${elemJava(right, b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })

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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (${elemJava(left, a, i)}) * (${elemJava(right, b, i)});
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
