package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.connector.expressions.{Expression => VExpr, Literal => VLiteral, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.{And => VAnd, Not => VNot, Or => VOr, Predicate}
import org.apache.spark.sql.functions.{col, lit, not}

/** V2 connector Predicate → Column translation for the SQL DELETE
  * path. Returns None for shapes we can't translate — the caller then
  * refuses the delete (`canDeleteWhere = false`) instead of silently
  * deleting the wrong rows.
  */
object PredicateToColumn {

  private def column(e: VExpr): Option[Column] = e match {
    case n: NamedReference => Some(col(n.fieldNames().mkString(".")))
    case _ => None
  }

  private def literal(e: VExpr): Option[Column] = e match {
    case l: VLiteral[_] =>
      Some(lit(CatalystTypeConverters.convertToScala(l.value(), l.dataType())))
    case _ => None
  }

  private def binary(p: Predicate)(f: (Column, Column) => Column): Option[Column] = {
    val ch = p.children()
    if (ch.length != 2) return None
    for (a <- column(ch(0)); b <- literal(ch(1))) yield f(a, b)
  }

  def translate(p: Predicate): Option[Column] = p match {
    case a: VAnd =>
      for (l <- translate(a.left()); r <- translate(a.right())) yield l && r
    case o: VOr =>
      for (l <- translate(o.left()); r <- translate(o.right())) yield l || r
    case n: VNot => translate(n.child()).map(not)
    case _ => p.name() match {
      case "=" => binary(p)(_ === _)
      case "<=>" => binary(p)(_ <=> _)
      case ">" => binary(p)(_ > _)
      case ">=" => binary(p)(_ >= _)
      case "<" => binary(p)(_ < _)
      case "<=" => binary(p)(_ <= _)
      case "STARTS_WITH" => binary(p)((a, b) => a.startsWith(b))
      case "ENDS_WITH" => binary(p)((a, b) => a.endsWith(b))
      case "CONTAINS" => binary(p)((a, b) => a.contains(b))
      case "IN" =>
        val ch = p.children()
        if (ch.isEmpty) return None
        for {
          a <- column(ch(0))
          vs <- Option(ch.drop(1).map(literal))
            .filter(_.forall(_.isDefined)).map(_.map(_.get))
        } yield a.isin(vs.toIndexedSeq: _*)
      case "IS_NULL" => p.children().headOption.flatMap(column).map(_.isNull)
      case "IS_NOT_NULL" => p.children().headOption.flatMap(column).map(_.isNotNull)
      case "ALWAYS_TRUE" => Some(lit(true))
      case "ALWAYS_FALSE" => Some(lit(false))
      case _ => None
    }
  }

  def translateAll(ps: Seq[Predicate]): Option[Column] =
    ps.foldLeft(Option(lit(true))) { (acc, p) =>
      for (a <- acc; c <- translate(p)) yield a && c
    }
}

/** V2 connector Predicate → Catalyst comparison Expression, for the
  * FILE-PRUNING side of selective copy-on-write: only shapes
  * [[FilePruning]] understands are translated (comparisons, IN,
  * AND/OR); anything else returns None and the caller stays
  * conservative (treats every file as touched).
  */
object PredicateToExpression {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal => CLiteral, Or => COr}

  private def attr(e: VExpr): Option[Expression] = e match {
    case n: NamedReference => Some(UnresolvedAttribute(n.fieldNames().toSeq))
    case _ => None
  }

  private def lit(e: VExpr): Option[Expression] = e match {
    case l: VLiteral[_] => Some(CLiteral(l.value(), l.dataType()))
    case _ => None
  }

  private def binary(p: Predicate)(
      f: (Expression, Expression) => Expression): Option[Expression] = {
    val ch = p.children()
    if (ch.length != 2) return None
    // attr-op-literal in either order; FilePruning handles both
    (attr(ch(0)), lit(ch(1)), lit(ch(0)), attr(ch(1))) match {
      case (Some(a), Some(l), _, _) => Some(f(a, l))
      case (_, _, Some(l), Some(a)) => Some(f(l, a))
      case _ => None
    }
  }

  def translate(p: Predicate): Option[Expression] = p match {
    case a: VAnd =>
      for (l <- translate(a.left()); r <- translate(a.right())) yield CAnd(l, r)
    case o: VOr =>
      for (l <- translate(o.left()); r <- translate(o.right())) yield COr(l, r)
    case _ => p.name() match {
      case "=" => binary(p)(EqualTo)
      case ">" => binary(p)(GreaterThan)
      case ">=" => binary(p)(GreaterThanOrEqual)
      case "<" => binary(p)(LessThan)
      case "<=" => binary(p)(LessThanOrEqual)
      case "IN" =>
        val ch = p.children()
        if (ch.isEmpty) return None
        for {
          a <- attr(ch(0))
          vs <- Option(ch.drop(1).map(lit))
            .filter(_.forall(_.isDefined)).map(_.map(_.get))
        } yield In(a, vs.toIndexedSeq)
      case _ => None
    }
  }
}
