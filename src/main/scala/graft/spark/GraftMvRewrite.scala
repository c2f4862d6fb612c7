package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.TruncTimestamp
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.maintain.MaterializedViews

/** Transparent materialized-view QUERY REWRITE: an aggregate over a
  * graft table is answered from a FRESH materialized view of that
  * table ([[graft.maintain.MaterializedViews]]) when the view covers
  * it — the classic MV rewrite, done the Spark way as an optimizer
  * rule over the logical plan (the reference has no planner of its
  * own to hang this on; engines with one — Hive/Calcite
  * `MaterializedViewRule`, Snowflake, BigQuery — all rewrite here).
  *
  * At 100 TB this is the payoff of incremental maintenance: the
  * dashboard aggregate scans the few-thousand-row view, not the fact
  * table, and correctness is never at risk because a STALE view
  * (watermark != the scan's pinned snapshot) simply declines the
  * rewrite and the query runs against the source.
  *
  * Covered class (sound, conservative — anything else declines):
  *  - `Aggregate` whose child is the source relation through
  *    attribute-only `Project`s and `Filter`s that reference ONLY the
  *    view's group-by keys (the filter re-applies on the view, where
  *    those keys are columns); a FILTERED view additionally requires
  *    its defining predicate verbatim (canonically) among the query's
  *    conjuncts — that conjunct drops, the rest re-apply; a JOIN view
  *    matches an Aggregate over an INNER equi-join of its two sources
  *    whose equality pairs are exactly the declared ones (either
  *    orientation), fresh at BOTH relations' pinned snapshots;
  *  - group-by expressions that are plain source columns forming a
  *    SUBSET of the view's keys (a roll-up re-aggregates the view:
  *    count → sum of partial counts, sum → sum, min/max → min/max);
  *  - aggregates `count(<literal>)` (no DISTINCT, no FILTER), and
  *    `sum/min/max(expr)` where `expr` matches a view aggregate's
  *    defining expression canonically; `avg(expr)` (double-typed)
  *    when the view stores both `sum:expr` and `count:expr`.
  *
  * Scans with time-travel or incremental-read options decline (the
  * view reflects exactly one snapshot — the watermark). Output
  * attribute ids, names, and types are preserved (aggregate results
  * cast back to the original types; `count` re-emerges as
  * `coalesce(sum(n), 0)` so nullability holds), so parent operators
  * are untouched.
  *
  * Enable/disable with `spark.graft.mv.rewrite.enabled` (default on);
  * the rule is pay-as-you-go — it reads catalog metadata only when
  * the aggregated table itself declares derived views in its
  * `graft.mv.derived` property.
  *
  * `spark.graft.mv.rewrite.max-staleness-ms = N` (default 0 = exact)
  * opts a SESSION into bounded staleness: a view whose unabsorbed
  * source commits are all younger than N ms still serves — the
  * dashboard trade every warehouse offers (BigQuery max_staleness,
  * Oracle stale_tolerated), chosen by the reader, never silently.
  */
class GraftMvRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    session.conf.get("spark.graft.mv.rewrite.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }

  /** One join side: a source relation through projects and filters
    * (the optimizer pushes inner-join-implied `isnotnull(joinkey)`
    * filters below the join; they are validated against the join pairs
    * by the caller). Projects may carry ALIASED expressions — the
    * optimizer's PullOutGroupingExpressions materializes complex
    * grouping (`date_trunc('DAY', ts)`) as `_groupingexpression#N`
    * columns below the Aggregate — collected here so the caller can
    * substitute them back before matching the view definition.
    */
  private def sideStrip(p: LogicalPlan)
      : Option[(DataSourceV2Relation, Seq[Expression], Seq[Alias])] =
    p match {
      case r: DataSourceV2Relation => Some((r, Nil, Nil))
      case Filter(c, ch) =>
        sideStrip(ch).map { case (r, cs, as) => (r, c +: cs, as) }
      case Project(pl, ch) if pl.forall(e =>
          e.isInstanceOf[AttributeReference] || e.isInstanceOf[Alias]) =>
        sideStrip(ch).map { case (r, cs, as) =>
          (r, cs, pl.collect { case al: Alias => al } ++ as)
        }
      case _ => None
    }

  /** The aggregate's input under projects + filters: either ONE source
    * relation, or an INNER equi-join of two (filters only above the
    * join; the join condition decomposed into attribute equality
    * pairs). Collected aliases substitute back at match time.
    */
  private def strip(p: LogicalPlan): Option[(Seq[DataSourceV2Relation],
      Seq[Expression], Seq[(Attribute, Attribute)], Seq[Alias],
      String)] = p match {
    case r: DataSourceV2Relation => Some((Seq(r), Nil, Nil, Nil, "inner"))
    case Filter(c, ch) =>
      strip(ch).map { case (rs, cs, jp, as, jt) => (rs, c +: cs, jp, as, jt) }
    case Project(pl, ch) if pl.forall(e =>
        e.isInstanceOf[AttributeReference] || e.isInstanceOf[Alias]) =>
      strip(ch).map { case (rs, cs, jp, as, jt) =>
        (rs, cs, jp, pl.collect { case al: Alias => al } ++ as, jt)
      }
    case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.joinType == org.apache.spark.sql.catalyst.plans.Inner ||
          j.joinType == org.apache.spark.sql.catalyst.plans.LeftOuter =>
      val inner = j.joinType == org.apache.spark.sql.catalyst.plans.Inner
      // an INNER join's left side may itself be an inner-join CHAIN
      // (`fact ⋈ dim1 ⋈ dim2` optimizes left-deep, possibly under
      // column-pruning Projects) — recurse through strip itself; a
      // LEFT join keeps its single-relation left side (n-ary views
      // are inner-only)
      val leftPart: Option[(Seq[DataSourceV2Relation], Seq[Expression],
          Seq[(Attribute, Attribute)], Seq[Alias])] =
        if (inner)
          strip(j.left).collect {
            case (rs, cs, jp, as, "inner") => (rs, cs, jp, as)
          }
        else
          sideStrip(j.left).map { case (r, cs, as) =>
            (Seq(r), cs, Nil, as) }
      for {
        lf <- leftPart
        rf <- sideStrip(j.right)
        // a filter UNDER the RIGHT side of a LEFT join is part of the
        // null-extension semantics (rows it drops null-extend instead
        // of disappearing) — hoisting it to a top-level conjunct would
        // change results, so decline. Left-side-under filters hoist
        // soundly (a dropped left row is gone either way).
        if inner || rf._2.isEmpty
        cond <- j.condition
        pairs <- {
          def conj(e: Expression): Seq[Expression] = e match {
            case And(a, b) => conj(a) ++ conj(b)
            case x => Seq(x)
          }
          val ps = conj(cond).map {
            case EqualTo(a: AttributeReference, b: AttributeReference) =>
              (a: Attribute, b: Attribute)
            case _ => return None
          }
          Some(ps)
        }
      } yield (lf._1 :+ rf._1, lf._2 ++ rf._2, lf._3 ++ pairs,
        lf._4 ++ rf._3, if (inner) "inner" else "left")
    case _ => None
  }

  /** Does an n-ary (≥3-source) query join chain match an n-ary view?
    * Inner equi-join semantics depend only on the relation set and the
    * CONJUNCTION of equality pairs — not the chain order — so the
    * match is: every query relation maps bijectively to a view side
    * (self-joins decline), each side is fresh at its own watermark,
    * and the query's pair set equals the view's declared pair set,
    * both normalized to unordered {(side, column), (side, column)}
    * pairs (a declared left column resolves to the unique earlier side
    * whose schema carries it — mirroring how CREATE resolved it on the
    * accumulated frame).
    */
  private def naryMatch(props: java.util.Map[String, String],
      extraJoins: Seq[MaterializedViews.JoinSpec],
      rels: Seq[DataSourceV2Relation], srcTables: Seq[GraftTable],
      joinPairs: Seq[(Attribute, Attribute)], joinType: String,
      freshEnough: (GraftTable, Long) => Boolean,
      watermark: Long): Boolean = {
    if (joinType != "inner" || joinPairs.isEmpty) return false
    val vSides: Seq[(String, String)] =
      (props.get(MaterializedViews.SourceNsProp),
        props.get(MaterializedViews.SourceTableProp)) +:
      (props.get(MaterializedViews.Join2NsProp),
        props.get(MaterializedViews.Join2TableProp)) +:
      extraJoins.map(j => (j.ns, j.table))
    if (vSides.distinct.size != vSides.size) return false
    val sideOf: Seq[Int] = srcTables.map { g =>
      vSides.indexWhere { case (n, t) =>
        g.namespaceName == n && g.tableName == t }
    }
    if (sideOf.contains(-1) || sideOf.distinct.size != sideOf.size)
      return false
    val wm2 = Option(props.get(MaterializedViews.RefreshedSnapshot2Prop))
      .map(_.toLong).getOrElse(return false)
    val extraWms = Option(props.get(MaterializedViews.RefreshedExtraProp))
      .map(_.split(',').toSeq.map(_.trim.toLong)).getOrElse(return false)
    if (extraWms.size != extraJoins.size) return false
    val wmOf: Seq[Long] = Seq(watermark, wm2) ++ extraWms
    srcTables.indices.foreach { qi =>
      if (!freshEnough(srcTables(qi), wmOf(sideOf(qi)))) return false
    }
    val relOfSide: Map[Int, DataSourceV2Relation] =
      sideOf.zipWithIndex.map { case (s, qi) => s -> rels(qi) }.toMap
    def colSide(name: String, below: Int): Option[Int] = {
      val hits = (0 until below).filter(s =>
        relOfSide(s).output.exists(a => conf.resolver(a.name, name)))
      if (hits.size == 1) Some(hits.head) else None
    }
    val joinsAll = MaterializedViews.JoinSpec(vSides(1)._1, vSides(1)._2,
      MaterializedViews.parseJoinOn(
        props.get(MaterializedViews.JoinOnProp))) +: extraJoins
    val declared: Set[Set[(Int, String)]] =
      joinsAll.zipWithIndex.flatMap { case (j, k) =>
        j.on.map { case (lc, rc) =>
          val ls = colSide(lc, k + 1).getOrElse(return false)
          Set((ls, lc.toLowerCase), (k + 1, rc.toLowerCase))
        }
      }.toSet
    val got: Set[Set[(Int, String)]] = joinPairs.map { case (a, b) =>
      def locate(x: Attribute): Option[(Int, String)] =
        rels.indexWhere(_.outputSet.contains(x)) match {
          case -1 => None
          case qi => Some((sideOf(qi), x.name.toLowerCase))
        }
      (locate(a), locate(b)) match {
        case (Some(pa), Some(pb)) => Set(pa, pb)
        case _ => return false
      }
    }.toSet
    got == declared
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (rels, rawFilters, joinPairs, aliases, joinType) =
      strip(agg.child).getOrElse(return None)
    // substitute stripped-project aliases back into every expression we
    // match (grouping, filters, aggregate children): the view defines
    // itself over SOURCE columns, so `_groupingexpression#9` must read
    // as `date_trunc('DAY', ts)` again — recursively, since an alias
    // may reference a lower project's alias
    val substMap: Map[ExprId, Expression] =
      aliases.map(a => a.exprId -> a.child).toMap
    def unalias(e: Expression): Expression = e.transformUp {
      case a: AttributeReference if substMap.contains(a.exprId) =>
        unalias(substMap(a.exprId))
    }
    val filters = rawFilters.map(unalias)
    val srcs = rels.map(_.table match {
      case g: GraftTable => g
      case _ => return None
    })
    // time-travel/incremental options pin a snapshot other than the
    // one the view maintains — never rewrite those
    if (rels.exists(r =>
        r.options.containsKey(GraftTable.StartSnapshotOption) ||
        r.options.containsKey(GraftTable.EndSnapshotOption))) return None
    val cat = rels.head.catalog match {
      case Some(g: GraftCatalog) => g
      case _ => return None
    }
    if (rels.exists(_.catalog != rels.head.catalog)) return None
    // join views register on ALL their sources, so the first table's
    // derived list is a complete candidate set for this query shape
    val derived = Option(
        srcs.head.properties().get(MaterializedViews.DerivedProp))
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(return None)
    derived.view
      .flatMap(tryView(agg, rels, cat, filters, joinPairs, joinType,
        unalias, _))
      .headOption
  }

  /** Attempt the rewrite against one candidate `ns.mv`. ANY failure
    * declines — a drifted view (renamed/dropped column, stripped
    * properties, schema change) must never take the source table's
    * queries down with it. NonLocalReturnControl is a ControlThrowable
    * and passes through NonFatal, so the decline `return`s inside the
    * closures below still work.
    */
  private def tryView(agg: Aggregate, rels: Seq[DataSourceV2Relation],
      cat: GraftCatalog, filters: Seq[Expression],
      joinPairs: Seq[(Attribute, Attribute)], joinType: String,
      unalias: Expression => Expression,
      nsMv: String): Option[LogicalPlan] =
    try tryView0(agg, rels, cat, filters, joinPairs, joinType, unalias, nsMv)
    catch { case scala.util.control.NonFatal(_) => None }

  private def tryView0(agg: Aggregate, rels: Seq[DataSourceV2Relation],
      cat: GraftCatalog, filters: Seq[Expression],
      joinPairs: Seq[(Attribute, Attribute)], joinType: String,
      unalias: Expression => Expression,
      nsMv: String): Option[LogicalPlan] = {
    val (ns, mvName) = nsMv.split('.') match {
      case Array(a, b) => (a, b)
      case _ => return None
    }
    val srcTables = rels.map(_.table.asInstanceOf[GraftTable])
    val mvIdent = Identifier.of(Array(ns), mvName)
    val mv = GraftMvRewrite.loadCached(cat, nsMv,
      srcTables.head.meta.currentSnapshotId, {
        try cat.loadTable(mvIdent) match {
          case g: GraftTable => Some(g)
          case _ => None
        } catch { case _: Exception => None } // dropped view: stale entry
      }).getOrElse(return None)
    val props = mv.properties()
    // the view must be over EXACTLY this query's relation shape —
    // same table(s), same join pairs (either orientation) — and FRESH
    // at every scanned relation's pinned snapshot
    val vSrcNs = props.get(MaterializedViews.SourceNsProp)
    val vSrcT = props.get(MaterializedViews.SourceTableProp)
    val watermark = Option(props.get(MaterializedViews.RefreshedSnapshotProp))
      .map(_.toLong).getOrElse(return None)
    def matches(g: GraftTable, n: String, t: String) =
      g.namespaceName == n && g.tableName == t
    // bounded staleness (opt-in): with
    // `spark.graft.mv.rewrite.max-staleness-ms = N`, a view may serve
    // a query when every source commit it has NOT yet absorbed is
    // younger than N ms — "the answer is correct as of at most N ms
    // ago", BigQuery's max_staleness semantics. Default 0 = exact
    // (watermark must BE the scan's pinned snapshot). The walk is
    // main-lineage; a broken chain or an older unabsorbed commit
    // declines.
    // the per-view property wins over the session conf: the operator
    // of a monitor view declares its tolerance ONCE, exact views in
    // the same session keep declining staleness
    val staleOkMs = Option(props.get(MaterializedViews.MaxStalenessProp))
      .map(_.trim.toLong)
      .getOrElse(session.conf
        .get("spark.graft.mv.rewrite.max-staleness-ms", "0").toLong)
    def freshEnough(g: GraftTable, wm: Long): Boolean = {
      val cur = g.meta.currentSnapshotId
      if (wm == cur) return true
      if (staleOkMs <= 0) return false
      val cutoff = System.currentTimeMillis() - staleOkMs
      var id = cur
      while (id != wm && id >= 0) {
        g.meta.findSnapshot(cat.storage, id) match {
          case Some(s) =>
            if (s.timestampMillis <= cutoff) return false
            id = s.parentId
          case None => return false
        }
      }
      id == wm
    }
    // a MULTI-SOURCE (≥3-way) view aggregates over the whole chain —
    // a query matching only its first join must NEVER be served from
    // it (n-ary query matching is handled by naryMatch below)
    val extraJoins = MaterializedViews.parseJoinsExtra(
      props.get(MaterializedViews.JoinsExtraProp))
    if (extraJoins.nonEmpty) {
      if (rels.size != 2 + extraJoins.size) return None
      if (!naryMatch(props, extraJoins, rels, srcTables, joinPairs,
          joinType, freshEnough, watermark)) return None
    } else
    Option(props.get(MaterializedViews.Join2NsProp)) match {
      case None =>
        if (rels.size != 1 || !matches(srcTables.head, vSrcNs, vSrcT))
          return None
        if (!freshEnough(srcTables.head, watermark)) return None
      case Some(jns) =>
        if (rels.size != 2) return None
        val vJoinType =
          Option(props.get(MaterializedViews.JoinTypeProp))
            .getOrElse("inner")
        // the query's join type must BE the view's; a LEFT join is
        // side-asymmetric, so its sources never swap
        if (joinType != vJoinType) return None
        val jt = props.get(MaterializedViews.Join2TableProp)
        val (li, ri) =
          if (matches(srcTables(0), vSrcNs, vSrcT) &&
              matches(srcTables(1), jns, jt)) (0, 1)
          else if (vJoinType == "inner" &&
              matches(srcTables(1), vSrcNs, vSrcT) &&
              matches(srcTables(0), jns, jt)) (1, 0)
          else return None
        if (!freshEnough(srcTables(li), watermark)) return None
        val wm2 = Option(
            props.get(MaterializedViews.RefreshedSnapshot2Prop))
          .map(_.toLong).getOrElse(return None)
        if (!freshEnough(srcTables(ri), wm2)) return None
        // the query's equi-pairs must be exactly the declared ones
        // (normalized to the view's left→right orientation)
        val declared = MaterializedViews.parseJoinOn(
          props.get(MaterializedViews.JoinOnProp))
          .map { case (l, r) => (l.toLowerCase, r.toLowerCase) }.toSet
        if (joinPairs.isEmpty) return None
        val got = joinPairs.map { case (a, b) =>
          if (rels(li).outputSet.contains(a) &&
              rels(ri).outputSet.contains(b))
            (a.name.toLowerCase, b.name.toLowerCase)
          else if (rels(ri).outputSet.contains(a) &&
              rels(li).outputSet.contains(b))
            (b.name.toLowerCase, a.name.toLowerCase)
          else return None
        }.toSet
        if (got != declared) return None
    }
    if (Option(props.get(MaterializedViews.Join2NsProp)).isEmpty &&
        joinPairs.nonEmpty) return None

    val keys = props.get(MaterializedViews.GroupByProp)
      .split(',').toSeq.map(_.trim)
    val specs = MaterializedViews.parseAggs(
      props.get(MaterializedViews.AggsProp))
    val keyExprDefs = MaterializedViews.parseKeyExprs(
      props.get(MaterializedViews.KeyExprsProp))

    val mvRel = DataSourceV2Relation.create(mv, Some(cat), Some(mvIdent))
    def mvAttr(name: String): Attribute =
      mvRel.output.find(a => conf.resolver(a.name, name)).get

    val output: Seq[Attribute] = rels.flatMap(_.output)
    // source group-key column name -> replacement view attribute
    val keyFor: Map[ExprId, Attribute] = output.flatMap { a =>
      keys.find(conf.resolver(_, a.name)).map(_ => a.exprId -> mvAttr(a.name))
    }.toMap

    // view aggregate columns by (fn, canonical defining expression)
    val parser = session.sessionState.sqlParser
    def resolved(sql: String): Option[Expression] = {
      val e = try parser.parseExpression(sql)
      catch { case _: Exception => return None }
      // bind single-part names to the QUERY's own source attributes
      // (same ExprIds, so canonical comparison aligns) ...
      val bound = e.transformUp {
        case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
          output.filter(a => conf.resolver(a.name, ua.nameParts.head)) match {
            case Seq(one) => one
            case _ => return None // missing or ambiguous across sources
          }
      }
      // ... then run the real ANALYZER over a LocalRelation shim so
      // functions resolve (date_trunc, etc.) and implicit casts land
      // exactly as they did on the query side, and constant-fold so
      // literal subtrees compare equal to the query's folded ones
      // (`amt > 100` arrives from the query as `amt > 100.0`)
      val shim = Project(Seq(Alias(bound, "__mv_def")()),
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          output.map(_.asInstanceOf[AttributeReference])))
      val analyzed =
        try session.sessionState.analyzer.execute(shim)
        catch { case scala.util.control.NonFatal(_) => return None }
      org.apache.spark.sql.catalyst.optimizer.ConstantFolding(
          analyzed) match {
        case Project(Seq(Alias(child, _)), _) if child.resolved =>
          Some(child)
        case _ => None
      }
    }

    // EXPRESSION KEYS: the view's key column materializes a scalar
    // expression over source columns (canonically `date_trunc('DAY',
    // ts)`); a query grouping/filtering by the SAME expression maps it
    // to the key column, and a query truncating the SAME child to a
    // COARSER aligned bucket rolls up by re-truncating the key column
    // (day → month: month boundaries are day boundaries)
    val exprKeys: Seq[(Expression, Attribute)] = keyExprDefs.map {
      case (n, sql) => (resolved(sql).getOrElse(return None), mvAttr(n))
    }
    // timezone-aware DEFINITION expressions (date_trunc keys, hour()
    // predicates, tz-sensitive aggregate inputs) were materialized
    // under the CREATING session's zone (graft.mv.tz) and every
    // refresh re-pins to it — a query session under a DIFFERENT zone
    // means both sides of the canonical comparison resolve under the
    // query zone and would "match" state computed under another
    // zone's semantics. `zoneGuard` declines a tz-SENSITIVE
    // definition expression unless the query zone equals the pin (a
    // legacy view without the pin declines the same way: its state
    // zone is unknowable); zone-insensitive expressions — including
    // casts that don't cross datetime types — carry no constraint.
    val queryZoneOk: Boolean = {
      val qZone = session.sessionState.conf.sessionLocalTimeZone
      Option(props.get(MaterializedViews.TzProp))
        .exists(z => GraftMvRewrite.sameZone(z, qZone))
    }
    def zoneGuard(e: Expression): Boolean =
      queryZoneOk || !GraftMvRewrite.tzSensitive(e)
    if (exprKeys.exists(p => !zoneGuard(p._1))) return None
    val exprKeyCanon: Map[Expression, Attribute] =
      exprKeys.map { case (e, a) => e.canonicalized -> a }.toMap
    def truncLevel(e: Expression): Option[(String, Expression)] = e match {
      case TruncTimestamp(Literal(f: org.apache.spark.unsafe.types.UTF8String,
          org.apache.spark.sql.types.StringType), ts, _) =>
        Some((GraftMvRewrite.normTruncLevel(f.toString), ts))
      case _ => None
    }
    def groupRepl(e: Expression): Option[Expression] = e match {
      case a: AttributeReference =>
        keyFor.get(a.exprId).orElse(exprKeyCanon.get(a.canonicalized))
      case _ => exprKeyCanon.get(e.canonicalized).orElse {
        for {
          (qLvl, qChild) <- truncLevel(e)
          attr <- exprKeys.collectFirst {
            case (ve, a) if truncLevel(ve).exists { case (vLvl, vChild) =>
              vChild.canonicalized == qChild.canonicalized &&
                GraftMvRewrite.truncRollupOk(vLvl, qLvl) } => a
          }
        } yield e match {
          case t: TruncTimestamp => t.copy(timestamp = attr)
        }
      }
    }

    // group-by: plain source columns or expression-key matches/rollups
    // (unalias first — complex grouping arrives as pulled-out
    // `_groupingexpression` attributes over a stripped Project)
    val newGroup = agg.groupingExpressions.map(g =>
      groupRepl(unalias(g)).getOrElse(return None))

    // a FILTERED view (defining predicate over any source columns)
    // serves a query only when the query's own filters carry the
    // predicate as a conjunct — that conjunct is already applied in
    // the view's content and drops; every REMAINING conjunct must
    // reference only view keys (re-applied on the view below)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    // INNER-join-implied `isnotnull(joinkey)` conjuncts (the optimizer
    // infers and pushes them) are already guaranteed by the view's
    // join content — drop them rather than declining on them. A LEFT
    // join implies no such thing: there `key IS NOT NULL` is a REAL
    // filter (the view's null-extended rows keep null-keyed facts),
    // so it stays residual — and declines, since a join key is not a
    // group key
    val joinAttrIds: Set[ExprId] =
      if (joinType != "inner") Set.empty
      else joinPairs.flatMap(p => Seq(p._1.exprId, p._2.exprId)).toSet
    val allConjuncts = filters.flatMap(conjuncts).filterNot {
      case IsNotNull(a: AttributeReference) => joinAttrIds.contains(a.exprId)
      // a runtime-pruning filter is a conservative replica of the join
      // itself — redundant once the view serves the exact join result
      case _: DynamicPruning => true
      case _ => false
    }
    val residualConjuncts =
      Option(props.get(MaterializedViews.WhereProp)) match {
        case None => allConjuncts
        case Some(whereSql) =>
          val pred = resolved(whereSql).getOrElse(return None)
          if (!zoneGuard(pred)) return None
          val predC = pred.canonicalized
          val (matched, rest) =
            allConjuncts.partition(_.canonicalized == predC)
          if (matched.isEmpty) return None
          // drop an inferred isnotnull(a) ONLY when the defining
          // predicate PROVABLY implies it: some top-level conjunct
          // reaches `a` through a null-intolerant path (a null input
          // nulls the conjunct, and the WHERE drops the row). A
          // null-tolerant predicate (`x > 100 OR y = 1`) admits NULL
          // x, so a query's own `x IS NOT NULL` is a REAL extra
          // filter — it stays residual and re-applies on the view
          // when x is a key, declines otherwise.
          def strictOn(e: Expression, a: Attribute): Boolean = e match {
            case r: AttributeReference => r.exprId == a.exprId
            case _ => e.nullIntolerant && e.children.exists(strictOn(_, a))
          }
          val predConjs = conjuncts(pred)
          rest.filterNot {
            case IsNotNull(a: AttributeReference) =>
              predConjs.exists(strictOn(_, a))
            case _ => false
          }
      }
    // filters: deterministic only (a rand() < 0.5 conjunct re-applied
    // on group-level rows would silently change row-level sampling
    // into group-level sampling), and every referenced column must be
    // a view key (or an expression-key match — top-down so the parent
    // expression matches before its non-key children are visited)
    val newFilters = residualConjuncts.map { c =>
      if (!c.deterministic) return None
      // function literal, not a nested def: the decline `return None`
      // must be NONLOCAL (exit tryView0), which only closures do
      lazy val repl: Expression => Expression =
        e => groupRepl(e).getOrElse(e match {
          case _: AttributeReference => return None
          case other => other.mapChildren(repl)
        })
      repl(c)
    }
    // tz-sensitive aggregate inputs drop from the servable set under
    // a mismatched query zone (zoneGuard) — canonicalization strips
    // timeZoneIds, so the guard must run on the RESOLVED form
    val byDef: Map[(String, Expression), Attribute] = specs.flatMap { s =>
      if (s.isCountStar) None
      else resolved(s.expr).filter(zoneGuard).map(e =>
        (s.fnBase, e.canonicalized) -> mvAttr(s.out))
    }.toMap
    // declared precision of each stored sketch (hll@lgK specs size
    // their sketches to a requested rsd; default lgK=12 → ~1.63%)
    val hllRsdByDef: Map[Expression, Double] = specs.flatMap { s =>
      if (s.fnBase != "hll") None
      else resolved(s.expr).filter(zoneGuard)
        .map(e => e.canonicalized -> s.hllRsd)
    }.toMap
    val countAttr: Option[Attribute] =
      specs.find(_.isCountStar).map(s => mvAttr(s.out))

    val tz = Some(session.sessionState.conf.sessionLocalTimeZone)
    def retyped(e: Expression, dt: org.apache.spark.sql.types.DataType) =
      if (e.dataType == dt) e else Cast(e, dt, tz)

    // keys the query groups by, in the view's spelling
    val groupedKeys: Set[String] = agg.groupingExpressions.collect {
      case a: AttributeReference => keys.find(conf.resolver(_, a.name))
    }.flatten.toSet

    // distinct-count estimate from the view's stored HLL sketch:
    // partial sketches union, the union estimates
    def sketchEstimate(child: Expression): Option[Expression] =
      byDef.get(("hll", child.canonicalized)).map { a =>
        org.apache.spark.sql.catalyst.expressions.HllSketchEstimate(
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .HllUnionAgg(a).toAggregateExpression())
      }
    def rewriteAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.filter.isDefined) return None
      if (ae.isDistinct) return ae.aggregateFunction match {
        // count(DISTINCT key...): when the grouped keys plus the
        // counted keys cover the view's WHOLE key set, each view row
        // is exactly one distinct counted combination within its
        // group — and SQL's distinct-count skips any-null rows just
        // like multi-child Count does, so a plain Count over the
        // view's key columns is exact (nulls included)
        case Count(children) if children.nonEmpty =>
          val exact: Option[Expression] = {
            val counted = children.flatMap {
              case a: AttributeReference =>
                keys.find(conf.resolver(_, a.name))
              case _ => None
            }.toSet
            if (counted.size == children.size &&
                (groupedKeys ++ counted) == keys.toSet)
              Some(Count(children.map {
                case a: AttributeReference => keyFor(a.exprId)
              }).toAggregateExpression())
            else None
          }
          // an EXACT count(DISTINCT) may be served approximately from
          // a stored sketch only under an explicit session opt-in —
          // never silently — and even then only from a sketch at
          // DEFAULT precision or better: the opt-in consents to the
          // documented ~1.63% trade, not to whatever looser sketch a
          // coarse hll@lgK view happens to store
          exact.orElse {
            if (children.size == 1 && session.conf.get(
                "spark.graft.mv.rewrite.approx-distinct", "false").toBoolean
                && hllRsdByDef.get(children.head.canonicalized)
                  .exists(_ <= GraftMvRewrite.StoredSketchRsd + 1e-9))
              sketchEstimate(children.head)
            else None
          }
        case _ => None
      }
      ae.aggregateFunction match {
        case Count(Seq(l: Literal)) if l.value != null =>
          // every group the view stores has >= 1 row, so sum(n) is
          // only null for the global aggregate of an empty view —
          // where count must be 0. count(NULL) is NOT row count
          // (always 0) — the null-literal guard declines it.
          countAttr.map(n => Coalesce(Seq(
            Sum(n).toAggregateExpression(), Literal(0L))))
        case Count(Seq(child)) =>
          // null-sensitive count(expr) against a matching count spec:
          // partial counts sum; a group of all-null rows sums its
          // zeros to 0, and only a rowless global aggregate needs the
          // coalesce
          byDef.get(("count", child.canonicalized))
            .map(a => Coalesce(Seq(
              Sum(a).toAggregateExpression(), Literal(0L))))
        case Sum(child, mode) =>
          // keep the eval mode: try_sum must stay try_sum over the
          // view's partial sums
          byDef.get(("sum", child.canonicalized))
            .map(a => Sum(a, mode).toAggregateExpression())
        case Min(child) =>
          byDef.get(("min", child.canonicalized))
            .map(a => Min(a).toAggregateExpression())
        case Max(child) =>
          byDef.get(("max", child.canonicalized))
            .map(a => Max(a).toAggregateExpression())
        case h: org.apache.spark.sql.catalyst.expressions.aggregate
            .HyperLogLogPlusPlus =>
          // an approximate ask served from the stored sketch — a
          // (documented) different estimator of the same quantity,
          // still within an approx function's contract — but ONLY
          // when the stored sketch's DECLARED precision is at least
          // as tight as the query's requested rsd (a view created
          // from approx_count_distinct(x, rsd) sized its sketches to
          // that rsd; the default lgConfigK=12 is ~1.63%), so
          // approx_count_distinct(x, 0.005) is never silently served
          // looser than asked
          hllRsdByDef.get(h.child.canonicalized) match {
            case Some(stored) if h.relativeSD >= stored - 1e-9 =>
              sketchEstimate(h.child)
            case _ => None
          }
        case av: Average =>
          // avg(e) over the view's sum/count pair, for EVERY child
          // type (double, decimal, ...): substitute the Average's own
          // buffer attributes (sum, count) in its evaluateExpression
          // with totals over the stored partials. Spark's final-step
          // arithmetic — decimal widening and result scale, ANSI
          // divide-by-zero guards, try-eval — is then reproduced BY
          // CONSTRUCTION, not imitated: the substituted expression IS
          // Average's final projection over the merged buffer. The
          // stored partial-sum column has Sum(expr)'s type (== the
          // buffer's); re-summing widens, so the total casts back —
          // where that overflows, Spark's own buffer arithmetic would
          // have overflowed to the same null/error. A view group's
          // NULL sum (all-null group) only arises with count 0, where
          // evaluateExpression yields NULL regardless.
          (byDef.get(("sum", av.child.canonicalized)),
            byDef.get(("count", av.child.canonicalized))) match {
            case (Some(sa), Some(ca))
                if av.aggBufferAttributes.size == 2 =>
              val Seq(sumBuf, cntBuf) = av.aggBufferAttributes
              def total(src: Attribute, want: Attribute): Expression = {
                val t = Sum(src).toAggregateExpression()
                if (t.dataType == want.dataType) t
                else Cast(t, want.dataType, tz)
              }
              val sumTotal = total(sa, sumBuf)
              val cntTotal = total(ca, cntBuf)
              Some(av.evaluateExpression.transformUp {
                case a: AttributeReference if a.exprId == sumBuf.exprId =>
                  sumTotal
                case a: AttributeReference if a.exprId == cntBuf.exprId =>
                  cntTotal
              })
            case _ => None
          }
        case _ => None
      }
    }

    // result expressions may compose over the aggregates (casts,
    // arithmetic — the analyzer keeps them inside the Aggregate):
    // rewrite every AggregateExpression and key reference in place,
    // preserving names, ids, and types for parent operators
    // aggregates rewrite wholesale (their CHILDREN reference source
    // columns by design — never descend into them); any other source
    // attribute in a result expression must be a group key
    var covered = true
    def rewriteResult(e: Expression): Expression = e match {
      case ae: AggregateExpression => rewriteAgg(ae) match {
        case Some(x) => retyped(x, ae.dataType)
        case None => covered = false; ae
      }
      // Alias before groupRepl: canonicalization strips aliases, so a
      // wholesale replacement would lose the output name and exprId
      case al: Alias => al.mapChildren(rewriteResult)
      case other => groupRepl(other).getOrElse(other match {
        case a: AttributeReference => covered = false; a
        case _ => other.mapChildren(rewriteResult)
      })
    }
    val newResult = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        Alias(groupRepl(unalias(a)).getOrElse(return None), a.name)(a.exprId)
      case ne => rewriteResult(unalias(ne)).asInstanceOf[NamedExpression]
    }
    if (!covered) return None

    val child = newFilters.foldLeft(mvRel: LogicalPlan)(
      (p, c) => Filter(c, p))
    Some(Aggregate(newGroup, newResult, child))
  }
}

object GraftMvRewrite {

  /** Expected relative error of the stored Datasketches HLL state
    * (`hll_sketch_agg` default lgConfigK = 12): 1.04 / sqrt(2^12).
    * The rewrite serves an `approx_count_distinct(x, rsd)` from the
    * sketch only when `rsd` is no tighter than this.
    */
  private[spark] val StoredSketchRsd: Double = 1.04 / math.sqrt(1 << 12)

  /** Does evaluating `e` depend on the session timezone? Casts count
    * only when they actually cross a datetime/string boundary
    * (Cast.needsTimeZone); every other TimeZoneAwareExpression
    * (date_trunc, hour, to_date over timestamps, ...) counts. A
    * TIMESTAMP-typed LITERAL counts too: `TIMESTAMP'2024-06-01'`
    * converts wall-clock text to an instant at PARSE time under the
    * parsing session's zone, so by the time any rule could look for a
    * timezone-aware node there is only a folded instant — the
    * zone-dependence is real but already baked in.
    */
  private[graft] def tzSensitive(e: Expression): Boolean = e.exists {
    case c: Cast => c.needsTimeZone
    case _: TimeZoneAwareExpression => true
    case l: Literal =>
      l.dataType == org.apache.spark.sql.types.TimestampType
    case _ => false
  }

  /** Two session-zone strings denote the same zone (textual equality
    * plus ZoneId normalization, so "UTC" == "Etc/UTC" == "+00:00").
    * Unparseable zones compare by text only.
    */
  private[graft] def sameZone(a: String, b: String): Boolean =
    a == b || (try {
      java.time.ZoneId.of(a).normalized() ==
        java.time.ZoneId.of(b).normalized()
    } catch { case scala.util.control.NonFatal(_) => false })

  private val TruncSynonyms = Map(
    "yyyy" -> "year", "yy" -> "year", "mon" -> "month", "mm" -> "month",
    "dd" -> "day")

  private[graft] def normTruncLevel(s: String): String = {
    val l = s.toLowerCase(java.util.Locale.ROOT)
    TruncSynonyms.getOrElse(l, l)
  }

  /** Is `date_trunc(to, date_trunc(from, x))` exactly
    * `date_trunc(to, x)`? True iff every `to`-bucket boundary falls on
    * a `from`-bucket boundary. Sub-day levels chain linearly; WEEK,
    * MONTH, QUARTER, YEAR boundaries are all day-aligned, so each rolls
    * up from DAY and finer — but a month/quarter/year boundary is NOT
    * a week boundary (and vice versa), so WEEK neither serves nor is
    * served by the month chain.
    */
  private[spark] def truncRollupOk(from: String, to: String): Boolean = {
    if (from == to) return true
    val subDay = Seq("microsecond", "millisecond", "second", "minute",
      "hour", "day")
    val fi = subDay.indexOf(from)
    if (fi >= 0)
      subDay.drop(fi + 1).contains(to) ||
        Seq("week", "month", "quarter", "year").contains(to)
    else from match {
      case "month" => to == "quarter" || to == "year"
      case "quarter" => to == "year"
      case _ => false
    }
  }

  /** Brief memo of view-table loads keyed by (catalog, ns.mv, SOURCE
    * snapshot id), so the optimizer's fixed-point iterations (and
    * repeated aggregates in one plan) don't re-read catalog metadata
    * for the same decision. Snapshot-consistent by construction: the
    * rewrite embeds the loaded table INSTANCE (pinned at its own
    * snapshot), and freshness compares that instance's watermark to
    * the scan's pinned source snapshot — a cached entry can only
    * reproduce a decision that was correct for this exact source
    * snapshot, never serve newer data against an older scan. A
    * refresh landing inside the TTL is at worst a missed rewrite.
    */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Long), (Long, Option[GraftTable])]()
  private val TtlMillis = 30000L
  private val MaxEntries = 256

  /** Drop memoized decisions for one view — create/refresh call this
    * so a just-refreshed view rewrites immediately in this driver
    * (another driver's refresh is picked up within the TTL).
    */
  private[graft] def invalidate(catName: String, nsMv: String): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k._1 == catName && k._2 == nsMv) it.remove()
    }
  }

  private[spark] def loadCached(cat: GraftCatalog, nsMv: String,
      srcSnapshotId: Long, load: => Option[GraftTable])
      : Option[GraftTable] = {
    val key = (cat.name(), nsMv, srcSnapshotId)
    val now = System.currentTimeMillis()
    Option(cache.get(key)).collect {
      case (at, v) if now - at < TtlMillis => v
    }.getOrElse {
      val v = load
      if (cache.size() >= MaxEntries) cache.clear()
      cache.put(key, (now, v))
      v
    }
  }
}
