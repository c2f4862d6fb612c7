package graft.spark

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, LongType, StringType}

import graft.maintain.MaterializedViews
import graft.maintain.MaterializedViews.{AggSpec, JoinSpec}

/** SQL DDL for materialized views — a user's first contact is
  * `CREATE MATERIALIZED VIEW mv AS SELECT k, sum(v) AS s FROM t GROUP
  * BY k`, not a procedure call with a spec mini-language. The
  * statement's SELECT is parsed with Spark's own parser and the
  * view's keys / aggregates / defining predicate / join spec are
  * DERIVED from the unresolved plan, then handed to the exact same
  * [[graft.maintain.MaterializedViews]] machinery the procedures use
  * (`CALL <cat>.system.create_materialized_view` stays available and
  * behaviorally identical).
  *
  * Accepted SELECT shape (anything else fails with a pointed message,
  * never a silent approximation):
  *  - `FROM <graft table>` or `FROM a [AS x] JOIN b [AS y] ON
  *    x.c1 = y.c2 [AND ...]` (INNER equi-join, qualified ON columns);
  *  - optional `WHERE <predicate>` — becomes the view's defining
  *    predicate;
  *  - `GROUP BY` of plain columns, OR of deterministic scalar
  *    expressions that appear aliased in the select list (the alias
  *    names the state column — `date_trunc('DAY', ts) AS day`), OR of
  *    such an alias by name;
  *  - select items are group keys or ALIASED
  *    `count(*) | count(e) | sum(e) | min(e) | max(e) | avg(e)`
  *    (no DISTINCT / FILTER; `avg(e) AS a` auto-expands to
  *    `a_sum`/`a_cnt` state columns — the standard mergeable
  *    decomposition — from which the rewrite serves `avg(e)`).
  */
object GraftMvDdl {

  final case class Derived(srcNs: String, srcTable: String,
      groupBy: Seq[String], aggs: Seq[AggSpec], where: Option[String],
      join: Option[JoinSpec], keyExprs: Seq[(String, String)],
      extraJoins: Seq[JoinSpec] = Seq.empty)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"CREATE MATERIALIZED VIEW: $msg")

  private def exprSql(e: Expression): String =
    try e.sql catch {
      case _: Exception => fail(s"cannot render expression: $e")
    }

  private final case class Rel(ns: String, table: String,
      names: Set[String])

  def derive(session: SparkSession, catalogName: String,
      query: String): Derived = {
    val plan =
      try session.sessionState.sqlParser.parsePlan(query)
      catch { case e: Exception => fail(s"cannot parse SELECT: ${e.getMessage}") }
    val agg = plan match {
      case a: Aggregate => a
      case _ => fail("the definition must be a GROUP BY aggregate " +
        "(SELECT <keys>, <aggs> FROM t [JOIN ...] [WHERE ...] GROUP BY <keys>)")
    }

    def relOf(p: LogicalPlan, alias: Option[String]): Rel = p match {
      case SubqueryAlias(id, child) => relOf(child, Some(id.name))
      case u: UnresolvedRelation =>
        val (ns, t) = u.multipartIdentifier match {
          case Seq(c, n, t2) if c.equalsIgnoreCase(catalogName) => (n, t2)
          case Seq(n, t2) => (n, t2)
          case other => fail(s"source must be <ns>.<table> in catalog " +
            s"$catalogName, got ${other.mkString(".")}")
        }
        Rel(ns, t, (Set(t) ++ alias).map(_.toLowerCase))
      case other => fail(s"FROM must reference tables directly, got: $other")
    }
    def conj(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conj(l) ++ conj(r)
      case x => Seq(x)
    }
    // a JOIN CHAIN parses left-deep: `a JOIN b ON .. JOIN c ON ..` is
    // Join(Join(a, b), c) — recurse into the left side, attributing
    // each ON column to the NEW right side or to ANY earlier relation
    // (a star-schema dim may join on a column of any accumulated side)
    def fromClause(p: LogicalPlan)
        : (Rel, Seq[(Rel, Seq[(String, String)], String)]) =
      p match {
        case j: Join if j.joinType == Inner ||
            j.joinType == org.apache.spark.sql.catalyst.plans.LeftOuter =>
          val jt = if (j.joinType == Inner) "inner" else "left"
          val (base, chain) = j.left match {
            case jj: Join => fromClause(jj)
            case other => (relOf(other, None), Nil)
          }
          val leftNames: Set[String] =
            base.names ++ chain.flatMap(_._1.names)
          val r = relOf(j.right, None)
          val cond = j.condition.getOrElse(fail("JOIN needs an ON clause"))
          val pairs = conj(cond).map {
            case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
              def side(u: UnresolvedAttribute): Option[Boolean] =
                u.nameParts match {
                  case Seq(q, _) if r.names(q.toLowerCase) => Some(false)
                  case Seq(q, _) if leftNames(q.toLowerCase) => Some(true)
                  case _ => None
                }
              (side(a), side(b)) match {
                case (Some(true), Some(false)) =>
                  (a.nameParts.last, b.nameParts.last)
                case (Some(false), Some(true)) =>
                  (b.nameParts.last, a.nameParts.last)
                case _ => fail("qualify every ON column as " +
                  "<table-or-alias>.<col> = <table-or-alias>.<col>")
              }
            case other =>
              fail(s"JOIN ON must be column equalities, got: ${exprSql(other)}")
          }
          (base, chain :+ ((r, pairs, jt)))
        case j: Join => fail(s"only INNER and LEFT joins are " +
          s"maintainable, got ${j.joinType}")
        case other => (relOf(other, None), Nil)
      }

    val (left, joinChain, whereExpr) = agg.child match {
      case Filter(c, ch) =>
        val (l, jp) = fromClause(ch)
        (l, jp, Some(c))
      case ch =>
        val (l, jp) = fromClause(ch)
        (l, jp, None)
    }
    // a LEFT join is supported only as the SINGLE join of a two-source
    // view (n-ary maintenance is the inner-join telescoping rule)
    if (joinChain.size > 1 && joinChain.exists(_._3 == "left"))
      fail("a multi-source (3+ way) view must be an INNER join chain " +
        "(LEFT is supported for two-source views only)")

    // alias/table qualifiers are VALID in the statement but must not
    // leak into the stored definition (maintenance and the rewrite
    // resolve single-part names against the source frames, where the
    // statement's aliases don't exist) — strip known qualifiers,
    // refuse unknown ones
    val relNames: Set[String] =
      left.names ++ joinChain.flatMap(_._1.names)
    def strip(e: Expression): Expression = e.transformUp {
      case ua: UnresolvedAttribute => ua.nameParts match {
        case Seq(_) => ua
        case Seq(q, c) if relNames(q.toLowerCase) =>
          UnresolvedAttribute(Seq(c))
        case parts => fail(s"unsupported column reference " +
          s"${parts.mkString(".")} — qualify with a FROM table name " +
          "or alias")
      }
    }
    // ';' is the AggsProp entry separator, so only AGGREGATE exprs
    // need the guard — WHERE is stored in its own property and passes
    // verbatim (a string literal like 'a;b' is a legitimate predicate)
    def renderAgg(e: Expression): String = {
      val sql = exprSql(strip(e))
      if (sql.contains(";"))
        fail(s"';' in aggregate expression: $sql")
      sql
    }
    def renderWhere(e: Expression): String = exprSql(strip(e))

    // select items that alias a SCALAR expression are expression-key
    // candidates: `SELECT date_trunc('DAY', ts) AS day ... GROUP BY
    // date_trunc('DAY', ts)` (or `GROUP BY day`) keys the view on the
    // materialized expression — the canonical time-bucketed rollup
    val aggFnNames = Set("count", "sum", "min", "max", "avg", "mean",
      "approx_count_distinct")
    // aggregate functions we RECOGNIZE but cannot incrementally
    // maintain: route them to the pointed not-maintainable error, not
    // the misleading "must appear under an alias" scalar diagnostics
    val knownUnmaintainable = Set("max_by", "min_by", "first", "last",
      "first_value", "last_value", "any_value", "collect_list",
      "collect_set", "array_agg", "listagg", "string_agg", "stddev",
      "stddev_pop", "stddev_samp", "variance", "var_pop", "var_samp",
      "skewness", "kurtosis", "corr", "covar_pop", "covar_samp",
      "percentile", "percentile_approx", "approx_percentile", "median",
      "mode", "count_if", "bool_and", "bool_or", "every", "any", "some",
      "bit_and", "bit_or", "bit_xor", "product", "hll_sketch_agg",
      "hll_union_agg", "try_sum", "try_avg", "regr_avgx", "regr_avgy",
      "regr_count", "regr_slope", "regr_intercept", "regr_r2",
      "histogram_numeric", "grouping", "grouping_id")
    def fnNameOf(e: Expression): Option[String] = e match {
      case f: UnresolvedFunction =>
        Some(f.nameParts.last.toLowerCase(java.util.Locale.ROOT))
      // FIRST(x)/LAST(x)/percentile forms have dedicated grammar rules
      // and arrive as concrete AggregateExpressions, not
      // UnresolvedFunction
      case ae: org.apache.spark.sql.catalyst.expressions.aggregate
          .AggregateExpression =>
        Some(ae.aggregateFunction.prettyName
          .toLowerCase(java.util.Locale.ROOT))
      case _ => None
    }
    def isAggCall(e: Expression): Boolean = fnNameOf(e).exists(aggFnNames)
    def isUnmaintainableAgg(e: Expression): Boolean =
      fnNameOf(e).exists(knownUnmaintainable)
    val aliasedScalars: Seq[(String, Expression)] =
      agg.aggregateExpressions.collect {
        case Alias(e, name) if !isAggCall(e) && !isUnmaintainableAgg(e) =>
          name -> e
      }
    val groupKeys: Seq[(String, Option[String])] =
      agg.groupingExpressions.map {
        case ua: UnresolvedAttribute =>
          val n = ua.nameParts.last
          // `GROUP BY <alias>` of an aliased scalar select item is the
          // expression key; any other plain reference is a source
          // column key. An aliased PLAIN column (`SELECT c AS k ...
          // GROUP BY k`) is also an expression key — the state column
          // is the renamed projection.
          aliasedScalars.find(_._1.equalsIgnoreCase(n)) match {
            case Some((nm, e)) if ua.nameParts.length == 1 =>
              (nm, Some(renderAgg(e)))
            case _ => (n, None)
          }
        case other =>
          // expression form: must match an aliased select item
          // structurally (same parse tree after qualifier stripping)
          val stripped = strip(other)
          aliasedScalars.find { case (_, e) => strip(e) == stripped } match {
            case Some((nm, e)) => (nm, Some(renderAgg(e)))
            case None => fail("GROUP BY expression " +
              s"${exprSql(other)} must appear in the select list " +
              "under an alias (the alias names the view's key column)")
          }
      }
    if (groupKeys.isEmpty) fail("a materialized view needs GROUP BY keys")
    val keyNames = groupKeys.map(_._1)

    val aggSpecs = agg.aggregateExpressions.flatMap {
      case ua: UnresolvedAttribute =>
        val n = ua.nameParts.last
        if (!keyNames.exists(_.equalsIgnoreCase(n)))
          fail(s"select item $n is neither a GROUP BY key nor an " +
            "aliased aggregate")
        None
      case al @ Alias(e, name) if !isAggCall(e) && !isUnmaintainableAgg(e) =>
        // scalar select item: must be one of the GROUP BY keys
        if (!groupKeys.exists(k => k._1.equalsIgnoreCase(name) &&
            k._2.isDefined))
          fail(s"select item ${exprSql(al)} is neither a GROUP BY key " +
            "nor an aliased aggregate")
        None
      case al @ Alias(e, _) if isUnmaintainableAgg(e) =>
        fail(s"aggregate '${fnNameOf(e).get}' is not incrementally " +
          "maintainable (supported: count, sum, min, max, avg/mean, " +
          s"approx_count_distinct): ${exprSql(al)}")
      case al @ Alias(f: UnresolvedFunction, name) =>
        if (f.isDistinct) fail(s"DISTINCT aggregates are not " +
          s"incrementally maintainable: ${exprSql(al)}")
        if (f.filter.isDefined) fail(s"FILTER clauses are not " +
          s"supported: ${exprSql(al)} — fold the condition into WHERE")
        val fn = f.nameParts.last.toLowerCase(java.util.Locale.ROOT)
        fn match {
          case "count" => f.arguments match {
            case Seq(_: UnresolvedStar) => Some(AggSpec(name, "count", "1"))
            case Seq(Literal(v, _)) if v != null =>
              Some(AggSpec(name, "count", "1"))
            case Seq(one) => Some(AggSpec(name, "count", renderAgg(one)))
            case _ => fail(s"count takes one argument: ${exprSql(al)}")
          }
          case "sum" | "min" | "max" => f.arguments match {
            case Seq(one) => Some(AggSpec(name, fn, renderAgg(one)))
            case _ => fail(s"$fn takes one argument: ${exprSql(al)}")
          }
          case "approx_count_distinct" =>
            // distinct counts keep MERGEABLE state: a Datasketches HLL
            // sketch column (`<name>_hll`, BINARY) that partial-unions
            // on every refresh — reads estimate via
            // hll_sketch_estimate, and the rewrite serves
            // approx_count_distinct(e) (and, opted in, count(DISTINCT
            // e)) from the sketch. An explicit rsd SIZES the stored
            // sketch (lgConfigK from the Datasketches error bound
            // 1.04/sqrt(2^lgK)), and the rewrite then serves any ask
            // no tighter than the declared precision.
            def lgKOf(rsd: Double): Int = {
              if (!(rsd > 0 && rsd < 1))
                fail(s"rsd must be in (0, 1): ${exprSql(al)}")
              val raw = math.ceil(
                math.log(math.pow(1.04 / rsd, 2)) / math.log(2)).toInt
              // silently clamping would store a LOOSER sketch than
              // requested — and the rewrite's precision gate would
              // then (correctly) never serve the view's own defining
              // query. Fail pointedly instead.
              if (raw > 21)
                fail(f"rsd $rsd%g is tighter than the largest sketch " +
                  "(lgConfigK=21 ≈ 0.072%% relative error) supports: " +
                  exprSql(al))
              math.max(4, raw)
            }
            f.arguments match {
              case Seq(one) =>
                Some(AggSpec(s"${name}_hll", "hll", renderAgg(one)))
              case Seq(one, Literal(v, _)) if v != null =>
                val rsd = try v.toString.toDouble
                  catch { case _: NumberFormatException =>
                    fail(s"rsd must be a numeric literal: ${exprSql(al)}") }
                val lgK = lgKOf(rsd)
                Some(AggSpec(s"${name}_hll",
                  if (lgK == 12) "hll" else s"hll@$lgK", renderAgg(one)))
              case _ =>
                fail(s"$fn takes (expr [, rsd]): ${exprSql(al)}")
            }
          case "avg" | "mean" =>
            // a stored QUOTIENT does not merge — auto-expand to the
            // standard sum/count decomposition as two state columns
            // (`<name>_sum`, `<name>_cnt`); the rewrite serves avg(x)
            // over the source from exactly this pair, and a direct
            // reader of the view divides
            f.arguments match {
              case Seq(one) =>
                val e = renderAgg(one)
                Seq(AggSpec(s"${name}_sum", "sum", e),
                  AggSpec(s"${name}_cnt", "count", e))
              case _ => fail(s"$fn takes one argument: ${exprSql(al)}")
            }
          case other => fail(s"aggregate '$other' is not incrementally " +
            "maintainable (supported: count, sum, min, max, avg/mean, " +
            "approx_count_distinct)")
        }
      case other => fail("every select item must be a GROUP BY key or " +
        s"an ALIASED count/sum/min/max, got: ${exprSql(other)}")
    }
    if (aggSpecs.isEmpty) fail("a materialized view needs at least one " +
      "aggregate (count/sum/min/max/avg)")
    val outNames = keyNames ++ aggSpecs.map(_.out)
    val dups = outNames.groupBy(_.toLowerCase(java.util.Locale.ROOT))
      .collect { case (_, vs) if vs.size > 1 => vs.head }
    if (dups.nonEmpty) fail(s"duplicate output columns: " +
      s"${dups.mkString(", ")} (note avg(x) AS a expands to a_sum/a_cnt)")

    val joinSpecs = joinChain.map { case (r, pairs, jt) =>
      JoinSpec(r.ns, r.table, pairs, jt)
    }
    Derived(left.ns, left.table, keyNames, aggSpecs,
      whereExpr.map(renderWhere), joinSpecs.headOption,
      groupKeys.collect { case (n, Some(e)) => (n, e) },
      joinSpecs.drop(1))
  }

  private[spark] def graftCatalog(session: SparkSession,
      name: String): GraftCatalog =
    session.sessionState.catalogManager.catalog(name) match {
      case g: GraftCatalog => g
      case other => throw new IllegalStateException(
        s"${other.name()} is not a graft catalog")
    }
}

/** `CREATE MATERIALIZED VIEW [IF NOT EXISTS] ns.mv AS SELECT ...` —
  * returns the initial build's (mode, mv_rows) like the procedure.
  */
case class CreateGraftMvCommand(catalogName: String, ns: String,
    name: String, query: String, ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("mode", StringType, nullable = false)(),
    AttributeReference("mv_rows", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val cat = GraftMvDdl.graftCatalog(session, catalogName)
    val ident = Identifier.of(Array(ns), name)
    if (ifNotExists && cat.tableExists(ident)) return Seq(Row("noop", -1L))
    val d = GraftMvDdl.derive(session, catalogName, query)
    val r = MaterializedViews.create(session, cat, ns, name,
      d.srcNs, d.srcTable, d.groupBy, d.aggs, d.where, d.join, d.keyExprs,
      d.extraJoins)
    Seq(Row(r.mode, r.mvRows))
  }
}

/** `REFRESH MATERIALIZED VIEW ns.mv`. */
case class RefreshGraftMvCommand(catalogName: String, ns: String,
    name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("mode", StringType, nullable = false)(),
    AttributeReference("mv_rows", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val cat = GraftMvDdl.graftCatalog(session, catalogName)
    val r = MaterializedViews.refresh(session, cat,
      Identifier.of(Array(ns), name))
    Seq(Row(r.mode, r.mvRows))
  }
}

/** `DROP MATERIALIZED VIEW [IF EXISTS] ns.mv` — also deregisters the
  * view from its source's derived list (same as the procedure).
  */
case class DropGraftMvCommand(catalogName: String, ns: String,
    name: String, ifExists: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("dropped", BooleanType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val cat = GraftMvDdl.graftCatalog(session, catalogName)
    val ident = Identifier.of(Array(ns), name)
    if (!cat.tableExists(ident)) {
      if (ifExists) return Seq(Row(false))
      throw new NoSuchElementException(
        s"materialized view not found: $catalogName.$ns.$name")
    }
    Seq(Row(MaterializedViews.drop(session, cat, ident)))
  }
}
