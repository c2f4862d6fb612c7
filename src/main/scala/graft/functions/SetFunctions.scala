package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** sorted_intersect_count(a, b) — size of the intersection of two
  * SORTED, DISTINCT long arrays via a single merge pass.
  *
  * Replaces `size(array_intersect(a, b))` in jaccard verification:
  * no per-row hash-set build, no allocation — just two cursors over
  * primitive arrays. With |A∪B| = |A|+|B|−|A∩B| this also removes the
  * `array_union` materialization. On the pairwise dedup path this is
  * the per-pair inner loop, so constant factors matter at any scale.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0, $j = 0, $n = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $n++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** jaccard_ge(a, b, t) — exact jaccard |A∩B| / |A∪B| of two SORTED,
  * DISTINCT long arrays when it is ≥ t, else NULL — with an early
  * exit: while merging, once even matching ALL remaining elements
  * cannot lift the jaccard to t, the pair is abandoned. On candidate
  * sets where most pairs are far below the threshold (every LSH/
  * blocking verification), this skips the bulk of the merge work
  * without changing any emitted value.
  */
case class JaccardGe(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
      // upper bound: every remaining element of the shorter side matches
      val maxI = n + math.min(na - i, nb - j)
      if (maxI.toDouble / (na + nb - maxI) < threshold) return null
    }
    val jac = n.toDouble / (na + nb - n)
    if (jac >= threshold) jac else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val maxI = ctx.freshName("maxI")
      val jac = ctx.freshName("jac"); val dead = ctx.freshName("dead")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0, $j = 0, $n = 0;
         |boolean $dead = false;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $n++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |  int $maxI = $n + Math.min($na - $i, $nb - $j);
         |  if ((double) $maxI / ($na + $nb - $maxI) < $threshold) {
         |    $dead = true; break;
         |  }
         |}
         |if ($dead) { ${ev.isNull} = true; }
         |else {
         |  double $jac = (double) $n / ($na + $nb - $n);
         |  if ($jac >= $threshold) { ${ev.value} = $jac; }
         |  else { ${ev.isNull} = true; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
