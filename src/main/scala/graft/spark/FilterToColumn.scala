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

  // column, literal, or an arithmetic combination of them — DELETEs
  // like `k % 13 = 6` arrive as GeneralScalarExpression("%") over a
  // field and a literal (division is left untranslated: its result
  // type depends on ANSI/decimal rules the rebuild must not guess)
  private def value(e: VExpr): Option[Column] = e match {
    case g: org.apache.spark.sql.connector.expressions.GeneralScalarExpression
        if g.children().length == 2 =>
      val f: Option[(Column, Column) => Column] = g.name() match {
        case "+" => Some(_ + _)
        case "-" => Some(_ - _)
        case "*" => Some(_ * _)
        case "%" => Some(_ % _)
        case _ => None
      }
      for (op <- f; a <- value(g.children()(0)); b <- value(g.children()(1)))
        yield op(a, b)
    case _ => column(e).orElse(literal(e))
  }

  private def binary(p: Predicate)(f: (Column, Column) => Column): Option[Column] = {
    val ch = p.children()
    if (ch.length != 2) return None
    for (a <- value(ch(0)); b <- value(ch(1))) yield f(a, b)
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

  // attr, literal, or arithmetic over them (FilePruning stays
  // conservative on arithmetic shapes — they translate so the DELETE
  // path can treat the conjunct set as COMPLETE and record the
  // predicate; division is excluded, its result type is ANSI-dependent)
  private def value(e: VExpr): Option[Expression] = e match {
    case g: org.apache.spark.sql.connector.expressions.GeneralScalarExpression
        if g.children().length == 2 =>
      import org.apache.spark.sql.catalyst.expressions.{Add, Multiply, Remainder, Subtract}
      val f: Option[(Expression, Expression) => Expression] = g.name() match {
        case "+" => Some(Add(_, _))
        case "-" => Some(Subtract(_, _))
        case "*" => Some(Multiply(_, _))
        case "%" => Some(Remainder(_, _))
        case _ => None
      }
      for (op <- f; a <- value(g.children()(0)); b <- value(g.children()(1)))
        yield op(a, b)
    case _ => attr(e).orElse(lit(e))
  }

  private def binary(p: Predicate)(
      f: (Expression, Expression) => Expression): Option[Expression] = {
    val ch = p.children()
    if (ch.length != 2) return None
    for (a <- value(ch(0)); b <- value(ch(1))) yield f(a, b)
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
