package graft.maintain

import graft.format.TableMetadata
import graft.spark.{GraftCatalog, GraftTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
import org.apache.spark.sql.functions._

/** Incrementally-maintained MATERIALIZED VIEWS over graft tables — the
  * data-plane sibling of incremental ANALYZE: a stats refresh sketches
  * only the appended delta, an MV refresh AGGREGATES only the appended
  * delta and merges it into the stored state, so at 100 TB a view over
  * an append-mostly fact table refreshes at the cost of the new data,
  * never a full recompute.
  *
  * Maintainable aggregate class (the classic self-maintainable set for
  * insert-only deltas): GROUP BY keys + COUNT / SUM / MIN / MAX. The
  * merge is the aggregate's own combine (count+=count, sum+=sum,
  * min/max of minima/maxima), applied by re-aggregating the union of
  * the stored state and the delta aggregate. AVG is intentionally
  * absent — express it as SUM/COUNT columns and divide at query time
  * (the standard decomposition; storing the quotient would not merge).
  *
  * Delta validity rides the SAME gate as the engine's incremental
  * read: a purely additive (append / import / cherrypick)
  * (last, current] range takes the append-delta path directly. Any
  * other range SEGMENTS along the main parent chain
  * ([[segmentRange]]): additive runs read as file deltas, net-zero
  * maintenance rewrites (compaction, delete-object/manifest rewrites)
  * are skipped outright — routine compaction never costs a view
  * refresh anything, for ANY aggregate set — and delete/update/merge/
  * upsert runs take the COUNTING-ALGORITHM path when every aggregate
  * retracts (count/sum with the required companion counts — see
  * [[cdcMaintainable]]): signed partials aggregated from the engine's
  * change feed ([[graft.spark.TableChanges]], +insert / -delete)
  * merge into the stored state and groups whose row count reaches
  * zero drop out, so a sparse DELETE refreshes at the cost of the
  * rows it touched, never the corpus. Only when no path applies
  * (min/max views over retracting ranges, missing companion counts,
  * rollback or overwrite in range, expired watermark) does refresh
  * fall back to a full recompute.
  *
  * View definition state lives as table properties on the MV table
  * itself (source, keys, aggregate spec, refreshed-snapshot
  * watermark), so the MV is self-describing and survives catalog
  * export/import like any other table.
  */
object MaterializedViews {

  val SourceNsProp = "graft.mv.source-namespace"
  val SourceTableProp = "graft.mv.source-table"
  val GroupByProp = "graft.mv.group-by"
  val AggsProp = "graft.mv.aggs"
  /** Optional defining predicate (SQL over source columns — any
    * columns, not just keys): the view aggregates only matching rows.
    * Every maintenance path applies it to its input — the full
    * recompute to the source, the incremental path to the appended
    * delta, the CDC path to the change feed (where an UPDATE moving a
    * row across the domain boundary surfaces as the one-sided
    * retraction/insertion it is). The rewrite serves a query only
    * when the query's own filter carries this predicate as a conjunct.
    */
  val WhereProp = "graft.mv.where"
  val RefreshedSnapshotProp = "graft.mv.refreshed-snapshot"
  /** JOIN views: a second source (`ns`/`table`) inner-equi-joined to
    * the first on [[JoinOnProp]] (`leftcol=rightcol,...`). The view
    * aggregates over the JOIN result; [[RefreshedSnapshot2Prop]] is
    * the right side's watermark. Incremental refresh uses the
    * two-sided delta rule Δ(A⋈B) = ΔA⋈B_cur + A_prev⋈ΔB (all three
    * frames snapshot-pinned, so a concurrent append can neither be
    * lost nor double-counted): an append to the FACT side joins only
    * the delta against the other side — at 100 TB that is a
    * delta-sized broadcast join, never a corpus re-join. Ranges that
    * aren't purely additive (after net-zero skipping) fall back to a
    * full recompute; the counting-algorithm path is single-source
    * only.
    */
  val Join2NsProp = "graft.mv.join-namespace"
  val Join2TableProp = "graft.mv.join-table"
  val JoinOnProp = "graft.mv.join-on"
  val RefreshedSnapshot2Prop = "graft.mv.refreshed-snapshot2"
  /** On the SOURCE table: comma-separated `ns.mv` list of views
    * derived from it — the zero-I/O trigger for
    * [[graft.spark.GraftMvRewrite]] (no rewrite candidates means no
    * catalog reads on the query path).
    */
  val DerivedProp = "graft.mv.derived"

  /** One aggregate column: `out:fn:expr` with fn ∈ count|sum|min|max;
    * entries separate with ';' so `expr` may contain commas
    * (e.g. `total:sum:CAST(price AS DECIMAL(18,2))`). `count:1` is
    * the row count; any other count expr is the SQL null-sensitive
    * `count(expr)` — both merge by summing partials.
    */
  final case class AggSpec(out: String, fn: String, expr: String) {
    require(Set("count", "sum", "min", "max")(fn),
      s"mv aggregate '$fn' is not incrementally maintainable " +
        "(count|sum|min|max; express avg as sum/count)")
    /** Row count (`count:1`) vs null-sensitive `count(col)`. */
    def isCountStar: Boolean = fn == "count" && expr.trim == "1"
    def firstPass: org.apache.spark.sql.Column = (fn match {
      case "count" if isCountStar => count(lit(1))
      case "count" => count(org.apache.spark.sql.functions.expr(expr))
      case "sum" => sum(org.apache.spark.sql.functions.expr(expr))
      case "min" => min(org.apache.spark.sql.functions.expr(expr))
      case "max" => max(org.apache.spark.sql.functions.expr(expr))
    }).as(out)
    /** Combine of two partial states of this aggregate. */
    def merge: org.apache.spark.sql.Column = (fn match {
      case "count" | "sum" => sum(col(out))
      case "min" => min(col(out))
      case "max" => max(col(out))
    }).as(out)
  }

  def parseAggs(spec: String): Seq[AggSpec] =
    spec.split(';').toSeq.map(_.trim).filter(_.nonEmpty).map { e =>
      val i1 = e.indexOf(':')
      val i2 = e.indexOf(':', i1 + 1)
      require(i1 > 0 && i2 > i1, s"mv aggregate entry '$e' is not out:fn:expr")
      AggSpec(e.substring(0, i1).trim, e.substring(i1 + 1, i2).trim.toLowerCase,
        e.substring(i2 + 1).trim)
    }

  final case class RefreshResult(mode: String, mvRows: Long)

  /** A join view's second source: inner-equi-joined to the first on
    * `on` (left-source column, right-source column) pairs.
    */
  final case class JoinSpec(ns: String, table: String,
      on: Seq[(String, String)]) {
    require(on.nonEmpty, "join view needs at least one leftcol=rightcol pair")
    def onFormatted: String = on.map { case (l, r) => s"$l=$r" }.mkString(",")
  }

  def parseJoinOn(spec: String): Seq[(String, String)] =
    spec.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map { p =>
      p.split('=') match {
        case Array(l, r) => (l.trim, r.trim)
        case _ => throw new IllegalArgumentException(
          s"join pair '$p' is not leftcol=rightcol")
      }
    }

  /** The counting-algorithm maintainable class (the classic
    * self-maintainable-under-deletions set): every aggregate must
    * retract from the change feed. count and sum retract by signed
    * merge; min/max do not (a deleted extremum needs the base data to
    * re-derive). Group liveness needs the row count (`count:1`), and
    * NULL-correct sums need the matching non-null count
    * (`count:<same expr>`, textual match) so a group whose last
    * non-null value was deleted goes back to sum = NULL rather
    * than 0.
    */
  private[graft] def cdcMaintainable(aggs: Seq[AggSpec]): Boolean =
    aggs.forall(a => a.fn == "count" || a.fn == "sum") &&
      aggs.exists(_.isCountStar) &&
      aggs.filter(_.fn == "sum").forall(sm =>
        aggs.exists(c => c.fn == "count" && !c.isCountStar &&
          c.expr == sm.expr))

  /** Snapshot ops that change the table's LOGICAL content but whose
    * change feed costs what the commit touched, not the corpus.
    */
  private val RetractOps = Set("delete", "update", "merge", "upsert")
  /** Ops that preserve logical content exactly (data-file compaction
    * applies deletes that were already logically applied; delete-object
    * and manifest rewrites are pure re-encodings) — a refresh skips
    * them entirely.
    */
  private val NetZeroOps = Set("compact", "rewrite-deletes",
    "rewrite-manifests")

  /** One contiguous maintenance segment of a refresh range:
    * `'A'` = additive (served by the engine's incremental file-delta
    * read), `'C'` = retractable content change (served by the change
    * feed). `(start, end]` are snapshot-id bounds on the main parent
    * chain.
    */
  private[graft] final case class Segment(kind: Char, start: Long, end: Long)

  /** Split `(last, curId]` of the MAIN parent chain into maintenance
    * segments, dropping net-zero ops (compaction never costs a view
    * refresh anything). Returns None — the full-recompute signal —
    * when the chain is broken (expired watermark) or any op is outside
    * the known classes (rollback diffs whole snapshots in the feed;
    * overwrite replaces arbitrarily much; for both, a recompute is the
    * cheaper honest answer). Branch snapshots never intrude: the chain
    * walk, the incremental read's gate, and the change feed are all
    * lineage-based.
    */
  private[graft] def segmentRange(storage: graft.storage.StorageOps,
      meta: TableMetadata, last: Long, curId: Long): Option[Seq[Segment]] = {
    if (last < 0 || curId < 0) return None
    var chain = List.empty[graft.format.Snapshot]
    var cur = curId
    while (cur != last) {
      if (cur < 0) return None
      val s = meta.findSnapshot(storage, cur).getOrElse(return None)
      chain = s :: chain
      cur = s.parentId
    }
    val segs = scala.collection.mutable.ArrayBuffer.empty[Segment]
    var prev = last
    for (s <- chain) {
      val kind =
        if (GraftTable.AdditiveOps(s.operation)) 'A'
        else if (NetZeroOps(s.operation)) 'Z'
        else if (RetractOps(s.operation)) 'C'
        else return None
      if (kind != 'Z') {
        if (segs.nonEmpty && segs.last.kind == kind && segs.last.end == prev)
          segs(segs.size - 1) = segs.last.copy(end = s.id)
        else segs += Segment(kind, prev, s.id)
      }
      prev = s.id
    }
    Some(segs.toSeq)
  }

  private def fullName(cat: GraftCatalog, ns: String, t: String): String =
    s"${cat.name()}.`$ns`.`$t`"

  /** Parse/format of the source's derived-views registry — the ONE
    * definition [[graft.spark.GraftMvRewrite]] also reads through.
    */
  def parseDerived(prop: String): Seq[String] =
    Option(prop).map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)

  /** Read-modify-write of the registry with a verify-retry loop:
    * property writes are last-writer-wins, so a concurrent
    * create/drop over the same source could silently erase this
    * writer's edit — re-read and retry until our edit stuck.
    */
  private def editDerived(cat: GraftCatalog, srcIdent: Identifier)(
      edit: Seq[String] => Seq[String]): Unit = {
    var attempts = 0
    while (attempts < 5) {
      attempts += 1
      val prior = parseDerived(
        cat.loadTable(srcIdent).properties().get(DerivedProp))
      val next = edit(prior).distinct
      if (next == prior) return
      cat.alterTable(srcIdent,
        if (next.isEmpty) TableChange.removeProperty(DerivedProp)
        else TableChange.setProperty(DerivedProp, next.mkString(",")))
      val now = parseDerived(
        cat.loadTable(srcIdent).properties().get(DerivedProp))
      if (now == next || edit(now).distinct == now) return
    }
    throw new IllegalStateException(
      s"derived-views registry on ${srcIdent} kept losing the edit " +
        "to concurrent writers")
  }

  /** The snapshot id a just-analyzed DataFrame of a graft table will
    * actually read — taken from the plan's captured table state, so
    * the recorded watermark can never race a concurrent append.
    */
  private def plannedSnapshotId(df: DataFrame): Long =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
          if r.table.isInstanceOf[GraftTable] =>
        r.table.asInstanceOf[GraftTable].meta.currentSnapshotId
    }.getOrElse(throw new IllegalStateException(
      "materialized view source is not a graft table scan"))

  private def aggregate(src: DataFrame, groupBy: Seq[String],
      aggs: Seq[AggSpec]): DataFrame =
    src.groupBy(groupBy.map(col): _*)
      .agg(aggs.head.firstPass, aggs.tail.map(_.firstPass): _*)

  /** Apply the view's defining predicate (NULL drops the row, like a
    * WHERE) to a maintenance input frame.
    */
  private def restrict(df: DataFrame, where: Option[String]): DataFrame =
    where.fold(df)(w => df.filter(coalesce(expr(w), lit(false))))

  /** CREATE: computes the full aggregate, creates the MV table with
    * the definition properties, and records the exact source snapshot
    * the initial state reflects.
    */
  /** Inner equi-join of two frames on the declared column pairs. */
  private def joinFrames(l: DataFrame, r: DataFrame,
      on: Seq[(String, String)]): DataFrame =
    l.join(r, on.map { case (lc, rc) => l(lc) === r(rc) }.reduce(_ && _),
      "inner")

  /** A table read pinned at one snapshot (the engine's `snap:` time
    * travel) — every side of an incremental join-delta term must be
    * snapshot-exact or a concurrent append could be double-counted.
    */
  private def pinned(spark: SparkSession, full: String,
      snapId: Long): DataFrame =
    spark.sql(s"SELECT * FROM $full VERSION AS OF 'snap:$snapId'")

  def create(spark: SparkSession, cat: GraftCatalog, ns: String, mv: String,
      srcNs: String, srcTable: String, groupBy: Seq[String],
      aggs: Seq[AggSpec], where: Option[String] = None,
      join: Option[JoinSpec] = None): RefreshResult = {
    require(groupBy.nonEmpty && aggs.nonEmpty,
      "materialized view needs group-by columns and aggregates")
    val src = spark.table(fullName(cat, srcNs, srcTable))
    val snapId = plannedSnapshotId(src)
    val (base, snap2) = join match {
      case None => (src, None)
      case Some(j) =>
        val right = spark.table(fullName(cat, j.ns, j.table))
        (joinFrames(src, right, j.on), Some(plannedSnapshotId(right)))
    }
    val state = aggregate(restrict(base, where), groupBy, aggs)
    val w0 = state.writeTo(fullName(cat, ns, mv))
      .tableProperty(SourceNsProp, srcNs)
      .tableProperty(SourceTableProp, srcTable)
      .tableProperty(GroupByProp, groupBy.mkString(","))
      .tableProperty(AggsProp, aggs.map(a =>
        s"${a.out}:${a.fn}:${a.expr}").mkString(";"))
      .tableProperty(RefreshedSnapshotProp, snapId.toString)
    val w1 = where.fold(w0)(w => w0.tableProperty(WhereProp, w))
    join.fold(w1)(j => w1
      .tableProperty(Join2NsProp, j.ns)
      .tableProperty(Join2TableProp, j.table)
      .tableProperty(JoinOnProp, j.onFormatted)
      .tableProperty(RefreshedSnapshot2Prop, snap2.get.toString))
      .create()
    // register on the source(s) so the query-rewrite rule finds the
    // view from the scanned table's own properties (dropped views
    // leave a stale entry; the rule skips entries that fail to load)
    val entry = s"$ns.$mv"
    editDerived(cat, Identifier.of(Array(srcNs), srcTable))(_ :+ entry)
    join.foreach(j =>
      editDerived(cat, Identifier.of(Array(j.ns), j.table))(_ :+ entry))
    graft.spark.GraftMvRewrite.invalidate(cat.name(), entry)
    RefreshResult("full",
      spark.table(fullName(cat, ns, mv)).count())
  }

  /** DROP: removes the view table AND its entry in the source's
    * derived-views registry (a bare DROP TABLE leaves a stale entry —
    * tolerated by the rewrite rule, but this is the clean path).
    * Dropping through here also stops any in-flight rewrite memoization
    * via the dropTable hook.
    */
  def drop(spark: SparkSession, cat: GraftCatalog,
      ident: Identifier): Boolean = {
    val ns = ident.namespace()(0)
    val mv = ident.name()
    val storage = cat.storage
    val txn = graft.catalog.Graft.beginTransaction(storage)
    val (srcNs, srcT, join2) = try {
      val td = graft.catalog.Graft.describeTable(storage, txn, ns, mv)
      (td.properties.getOrElse(SourceNsProp,
        throw new IllegalArgumentException(
          s"$ns.$mv is not a materialized view (no $SourceNsProp)")),
        td.properties(SourceTableProp),
        td.properties.get(Join2NsProp).map(
          (_, td.properties(Join2TableProp))))
    } finally txn.close()
    val dropped = cat.dropTable(ident)
    val sources = Seq((srcNs, srcT)) ++ join2
    sources.foreach { case (sns, st) =>
      try editDerived(cat, Identifier.of(Array(sns), st))(
        _.filterNot(_ == s"$ns.$mv"))
      catch { case _: Exception => () } // source itself gone: nothing
    }
    dropped
  }

  /** REFRESH: merges the additive delta's aggregate into the stored
    * state, or falls back to a full recompute when the snapshot range
    * isn't purely additive. Returns the mode actually taken
    * (`incremental` | `full` | `noop`).
    */
  def refresh(spark: SparkSession, cat: GraftCatalog,
      ident: Identifier): RefreshResult = {
    val ns = ident.namespace()(0)
    val mv = ident.name()
    val storage = cat.storage
    val mvFull0 = fullName(cat, ns, mv)
    // read the watermark from the SAME pinned table instance whose
    // state the merge will read (the planned scan's table), so two
    // concurrent refreshes can never pair a new state with an old
    // watermark and re-merge an already-merged delta
    val stored = spark.table(mvFull0)
    val mvTable = stored.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
          if r.table.isInstanceOf[graft.spark.GraftTable] =>
        r.table.asInstanceOf[graft.spark.GraftTable]
    }.getOrElse(throw new IllegalArgumentException(
      s"$ns.$mv is not a graft table"))
    val props = {
      import scala.jdk.CollectionConverters._
      mvTable.properties().asScala.toMap
    }
    val srcNs = props.getOrElse(SourceNsProp,
      throw new IllegalArgumentException(
        s"$ns.$mv is not a materialized view (no $SourceNsProp)"))
    val srcT = props(SourceTableProp)
    val groupBy = props(GroupByProp).split(',').toSeq.map(_.trim)
    val aggs = parseAggs(props(AggsProp))
    val where = props.get(WhereProp)
    val last = props.get(RefreshedSnapshotProp).map(_.toLong).getOrElse(-1L)

    props.get(Join2NsProp).foreach { jns =>
      return refreshJoin(spark, cat, ns, mv, mvFull0, stored, srcNs, srcT,
        groupBy, aggs, where, last,
        props.get(RefreshedSnapshot2Prop).map(_.toLong).getOrElse(-1L),
        JoinSpec(jns, props(Join2TableProp), parseJoinOn(props(JoinOnProp))))
    }

    val txn2 = graft.catalog.Graft.beginTransaction(storage)
    val srcMeta = try {
      val srcTd = graft.catalog.Graft.describeTable(storage, txn2, srcNs, srcT)
      TableMetadata.read(storage, srcTd.metadataLocation)
    } finally txn2.close()
    val curId = srcMeta.currentSnapshotId
    val mvFull = mvFull0
    if (curId == last)
      return RefreshResult("noop", stored.count())

    val between = srcMeta.snapshotsInRange(storage, last, curId)
    val additive = last >= 0 && curId >= 0 &&
      srcMeta.findSnapshot(storage, last).isDefined &&
      between.nonEmpty && between.forall(s => GraftTable.AdditiveOps(s.operation))

    def feedDelta(s0: Long, e0: Long): DataFrame = {
      // counting algorithm over the engine's change feed: signed
      // (+insert / -delete) partials aggregated from ONLY the changed
      // rows of (s0, e0]
      val changes = restrict(
        graft.spark.TableChanges.between(spark, cat,
          Identifier.of(Array(srcNs), srcT), s0, e0), where)
      val sign = when(
        col(graft.spark.TableChanges.ChangeTypeColumn) === "insert",
        lit(1)).otherwise(lit(-1))
      val signed = aggs.map { a =>
        (a.fn match {
          case "count" if a.isCountStar => sum(sign)
          case "count" =>
            sum(when(expr(a.expr).isNotNull, sign).otherwise(lit(0)))
          case "sum" => sum(expr(a.expr) * sign)
        }).as(a.out)
      }
      changes.groupBy(groupBy.map(col): _*)
        .agg(signed.head, signed.tail: _*)
    }
    def appendDelta(s0: Long, e0: Long): DataFrame =
      // the engine's own incremental read plans exactly the files
      // appended in (s0, e0] — over an additive segment their RAW
      // rows ARE the row delta
      aggregate(restrict(spark.read
        .option(GraftTable.StartSnapshotOption, s0.toString)
        .option(GraftTable.EndSnapshotOption, e0.toString)
        .table(fullName(cat, srcNs, srcT)), where), groupBy, aggs)

    // segmented maintenance (when the whole range isn't additive):
    // the main parent chain splits into append segments (file-delta
    // read), net-zero maintenance rewrites (skipped — a compaction
    // never costs a view refresh anything), and retractable segments
    // (change feed). Retraction needs the counting-algorithm agg set;
    // a purely append+net-zero split stays "incremental" for ANY
    // aggregates — min/max views survive routine compaction without a
    // corpus recompute.
    val segs = if (additive) None
      else segmentRange(storage, srcMeta, last, curId)
    val retracts = segs.exists(_.exists(_.kind == 'C'))

    val mvSchema = stored.schema
    val (mode, next, watermark) =
      if (additive) {
        // `stored` is the SAME pinned state the watermark came from.
        val merged = stored
          .unionByName(appendDelta(last, curId))
          .groupBy(groupBy.map(col): _*)
          .agg(aggs.head.merge, aggs.tail.map(_.merge): _*)
        ("incremental", merged, curId)
      } else if (segs.isDefined && (!retracts || cdcMaintainable(aggs))) {
        val deltas = segs.get.map {
          case Segment('A', s0, e0) => appendDelta(s0, e0)
          case Segment(_, s0, e0) => feedDelta(s0, e0)
        }
        val mergedAll = deltas.foldLeft(stored)(_ unionByName _)
          .groupBy(groupBy.map(col): _*)
          .agg(aggs.head.merge, aggs.tail.map(_.merge): _*)
        if (!retracts) ("incremental", mergedAll, curId)
        else {
          // a sum whose matching non-null count reached zero is NULL
          // again (signed arithmetic alone would leave 0 behind), and
          // groups whose row count reaches zero drop out of the view
          val nullFixed = aggs.filter(_.fn == "sum").foldLeft(mergedAll) {
            (df, sm) =>
              val paired = aggs.find(c =>
                c.fn == "count" && !c.isCountStar && c.expr == sm.expr).get
              df.withColumn(sm.out,
                when(col(paired.out) === 0, lit(null))
                  .otherwise(col(sm.out)))
          }
          val rowCount = aggs.find(_.isCountStar).get.out
          ("cdc", nullFixed.filter(col(rowCount) > 0), curId)
        }
      } else {
        // the watermark comes from the PLANNED scan, not the earlier
        // metadata read — an append landing between the two would
        // otherwise be included in the recompute yet re-merged by the
        // next refresh (double-count)
        val src = spark.table(fullName(cat, srcNs, srcT))
        ("full", aggregate(restrict(src, where), groupBy, aggs),
          plannedSnapshotId(src))
      }
    commitState(spark, cat, ns, mv, mvFull, mvSchema, next,
      Seq(RefreshedSnapshotProp -> watermark.toString), mode)
  }

  /** REFRESH of a JOIN view: the two-sided delta rule
    * Δ(A⋈B) = ΔA⋈B_cur + A_prev⋈ΔB — every frame snapshot-pinned so a
    * concurrent append is neither lost nor double-counted. Both sides'
    * ranges segment like the single-source path (net-zero maintenance
    * rewrites skipped); any retraction on either side falls back to a
    * full recompute (the counting algorithm is single-source only).
    */
  private def refreshJoin(spark: SparkSession, cat: GraftCatalog,
      ns: String, mv: String, mvFull: String, stored: DataFrame,
      srcNs: String, srcT: String, groupBy: Seq[String],
      aggs: Seq[AggSpec], where: Option[String], lastA: Long,
      lastB: Long, j: JoinSpec): RefreshResult = {
    val storage = cat.storage
    val txn = graft.catalog.Graft.beginTransaction(storage)
    val (metaA, metaB) = try {
      val a = graft.catalog.Graft.describeTable(storage, txn, srcNs, srcT)
      val b = graft.catalog.Graft.describeTable(storage, txn, j.ns, j.table)
      (TableMetadata.read(storage, a.metadataLocation),
        TableMetadata.read(storage, b.metadataLocation))
    } finally txn.close()
    val curA = metaA.currentSnapshotId
    val curB = metaB.currentSnapshotId
    if (curA == lastA && curB == lastB)
      return RefreshResult("noop", stored.count())
    val aFull = fullName(cat, srcNs, srcT)
    val bFull = fullName(cat, j.ns, j.table)
    val mvSchema = stored.schema
    val segsA = if (curA == lastA) Some(Seq.empty[Segment])
      else segmentRange(storage, metaA, lastA, curA)
    val segsB = if (curB == lastB) Some(Seq.empty[Segment])
      else segmentRange(storage, metaB, lastB, curB)
    val incOk = segsA.exists(_.forall(_.kind == 'A')) &&
      segsB.exists(_.forall(_.kind == 'A'))
    val (mode, next, wA, wB) =
      if (incOk) {
        def deltaOf(full: String, segs: Seq[Segment]): Option[DataFrame] =
          segs.map(g => spark.read
            .option(GraftTable.StartSnapshotOption, g.start.toString)
            .option(GraftTable.EndSnapshotOption, g.end.toString)
            .table(full)).reduceOption(_ unionAll _)
        val dA = deltaOf(aFull, segsA.get)
        val dB = deltaOf(bFull, segsB.get)
        val bCur = pinned(spark, bFull, curB)
        val aPrev = pinned(spark, aFull, lastA)
        // an append to one side joins only ITS delta against the
        // other side — at 100 TB a delta-sized join, never a corpus
        // re-join
        val parts =
          dA.map(d => aggregate(restrict(joinFrames(d, bCur, j.on), where),
            groupBy, aggs)).toSeq ++
          dB.map(d => aggregate(restrict(joinFrames(aPrev, d, j.on), where),
            groupBy, aggs)).toSeq
        val merged = parts.foldLeft(stored)(_ unionByName _)
          .groupBy(groupBy.map(col): _*)
          .agg(aggs.head.merge, aggs.tail.map(_.merge): _*)
        ("incremental", merged, curA, curB)
      } else {
        val a = spark.table(aFull)
        val b = spark.table(bFull)
        ("full", aggregate(restrict(joinFrames(a, b, j.on), where),
          groupBy, aggs), plannedSnapshotId(a), plannedSnapshotId(b))
      }
    commitState(spark, cat, ns, mv, mvFull, mvSchema, next,
      Seq(RefreshedSnapshotProp -> wA.toString,
        RefreshedSnapshot2Prop -> wB.toString), mode)
  }

  /** Shared refresh commit: cast the merged state back to the MV's
    * declared schema (merged aggregate types widen — sum of
    * DECIMAL(p,s) → p+10) and commit the state overwrite + watermark
    * properties as ONE atomic catalog commit: a crash (or interleaved
    * refresh) between them would pair a state with the wrong watermark,
    * and the next refresh would re-merge (double-count) or skip a
    * delta. Both writes ride the session transaction; concurrent
    * refreshes resolve through the engine's optimistic conflict
    * analysis. An already-open user transaction is joined, not
    * nested — the pairing then commits with the user's own atomicity.
    */
  private def commitState(spark: SparkSession, cat: GraftCatalog,
      ns: String, mv: String, mvFull: String,
      mvSchema: org.apache.spark.sql.types.StructType, next: DataFrame,
      watermarks: Seq[(String, String)], mode: String): RefreshResult = {
    val aligned = next.select(mvSchema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    val ownTxn = !cat.transactionActive
    if (ownTxn) cat.beginTransaction()
    try {
      aligned.writeTo(mvFull).overwrite(lit(true))
      cat.alterTable(Identifier.of(Array(ns), mv),
        watermarks.map { case (k, v) =>
          TableChange.setProperty(k, v): TableChange }: _*)
      if (ownTxn) cat.commitTransaction()
    } catch {
      case e: Throwable =>
        if (ownTxn && cat.transactionActive) cat.rollbackTransaction()
        throw e
    }
    graft.spark.GraftMvRewrite.invalidate(cat.name(), s"$ns.$mv")
    RefreshResult(mode, spark.table(mvFull).count())
  }
}
