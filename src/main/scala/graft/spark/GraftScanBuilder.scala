package graft.spark

import graft.format.DataFileEntry
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Scan builder with snapshot-stats file pruning.
  *
  * Receives Catalyst data filters (same interface Spark's own file
  * sources use), prunes the snapshot's file list against the per-file
  * min/max recorded at commit time, and only then constructs the
  * delegated parquet scan over the surviving files — so at 100 TB a
  * selective filter never even lists, opens, or splits the excluded
  * files. Parquet row-group pruning still applies inside each surviving
  * file via the delegated builder (filters are forwarded).
  *
  * Pruning is conservative: any un-analyzable predicate keeps the file.
  */
class GraftScanBuilder(
    spark: ClassicSession,
    tableName: String,
    options: CaseInsensitiveStringMap,
    schema: StructType,
    files: Seq[(String, DataFileEntry)], // (absolute path, entry)
    baseDir: String, // table data root — basePath for partition discovery
    onBuild: (Seq[String], Seq[Expression]) => Unit,
    spec: Seq[PartitionField] = Seq.empty,
    streamCtx: Option[GraftStreamCtx] = None,
    deletes: Seq[graft.format.DeletePredicate] = Seq.empty,
    posDeletes: Seq[(String, graft.format.PosDeleteFile)] = Seq.empty,
    eqDeletes: Seq[(String, graft.format.EqDeleteFile)] = Seq.empty,
    // storage-relative key → sidecar bytes ([[graft.format.FileBloom]]);
    // consulted lazily, only for files that survive min/max pruning and
    // only under `=` / `IN` predicates on bloom-indexed columns
    bloomRead: String => Option[Array[Byte]] = _ => None,
    // ANALYZE column statistics (logical names) covering THIS scan's
    // snapshot — merged with file-level bounds/null counts over the
    // pruned file list and reported as DSv2 column statistics
    colStats: Map[String, AnalyzedColStats] = Map.empty)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
  with org.apache.spark.sql.connector.read.SupportsPushDownLimit
  with org.apache.spark.sql.connector.read.SupportsPushDownTopN {

  private var requiredSchema: StructType = schema
  private var dataFilters: Seq[Expression] = Seq.empty
  private var innerPushed: Array[Predicate] = Array.empty
  private var metaAgg: Option[(StructType, Seq[Any])] = None
  private var fileSubset: Option[Seq[(String, DataFileEntry)]] = None

  /** Hive directory columns the layout uses (identity sources plus
    * hidden `gp_*` transform columns).
    */
  private val partCols: Seq[String] = PartitionTransforms.dirNames(spec)

  /** Prune `files` by the pushed filters: directly against per-file
    * source-column stats, AND through the partition transforms — a
    * predicate on a bucketed/time-partitioned SOURCE column maps to a
    * predicate on the hidden directory value ([[PartitionTransforms]]).
    */
  private def statsKept(scanFiles: Seq[(String, DataFileEntry)],
      physFilters: Seq[Expression], physSchema: StructType)
      : Seq[(String, DataFileEntry)] = {
    val prunable = physFilters ++
      PartitionTransforms.derivedPredicates(physFilters, spec)
    if (prunable.isEmpty) return scanFiles
    val extSchema = PartitionTransforms.extendSchema(physSchema, spec)
    bloomKept(scanFiles.filter { case (_, f) =>
      prunable.forall(expr => FilePruning.mayMatch(expr, f, extSchema))
    }, physFilters)
  }

  // ---- bloom-sidecar point-lookup pruning -------------------------
  //
  // Second pass after min/max: on a key the layout is not sorted by,
  // every file's [min, max] straddles a point probe — the sidecar
  // bloom is what actually discriminates. One small object read per
  // surviving candidate file (cached per scan), never a data read.

  private val bloomCache = scala.collection.mutable.Map
    .empty[String, Option[Map[String, org.apache.spark.util.sketch.BloomFilter]]]

  private def bloomsOf(key: String)
      : Option[Map[String, org.apache.spark.util.sketch.BloomFilter]] =
    bloomCache.getOrElseUpdate(key,
      try bloomRead(key).map(graft.format.FileBloom.deserialize)
      catch { case scala.util.control.NonFatal(_) => None }) // keep file

  /** Top-level conjunctive `col = lit` / `col IN (lits)` probes. */
  private def pointProbes(filters: Seq[Expression]): Seq[(String, Seq[Any])] =
    filters.flatMap {
      case EqualTo(AttrName(a), Literal(v, _)) if v != null => Some(a -> Seq(v))
      case EqualTo(Literal(v, _), AttrName(a)) if v != null => Some(a -> Seq(v))
      case In(AttrName(a), vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        val vals = vs.map(_.asInstanceOf[Literal].value).filter(_ != null)
        if (vals.isEmpty) None else Some(a -> vals)
      case _ => None
    }

  /** Hashing mirrors the write side ([[graft.format.FileBloom.build]]):
    * integral/date/timestamp literals as the widened long, strings as
    * UTF-8. An unsupported literal type keeps the file.
    */
  private def bloomMayContain(bf: org.apache.spark.util.sketch.BloomFilter,
      v: Any): Boolean = v match {
    case n: java.lang.Long => bf.mightContainLong(n)
    case n: java.lang.Integer => bf.mightContainLong(n.longValue())
    case n: java.lang.Short => bf.mightContainLong(n.longValue())
    case n: java.lang.Byte => bf.mightContainLong(n.longValue())
    case s: UTF8String => bf.mightContainString(s.toString)
    case s: String => bf.mightContainString(s)
    case _ => true
  }

  private def bloomKept(scanFiles: Seq[(String, DataFileEntry)],
      physFilters: Seq[Expression]): Seq[(String, DataFileEntry)] = {
    if (scanFiles.forall(_._2.bloomPath.isEmpty)) return scanFiles
    val probes = pointProbes(physFilters)
    if (probes.isEmpty) return scanFiles
    scanFiles.filter { case (_, f) =>
      f.bloomPath.flatMap(bloomsOf).forall { bl =>
        probes.forall { case (c, vs) =>
          // a column with no filter in the sidecar keeps the file
          bl.get(c).forall(bf => vs.exists(v => bloomMayContain(bf, v)))
        }
      }
    }
  }

  // ---- LIMIT / ORDER BY … LIMIT file pruning from snapshot stats ----
  //
  // Partial pushdown only (isPartiallyPushed = true): the scan returns
  // a file-subset SUPERSET of the needed rows and Spark's own
  // limit/sort still runs above — so correctness never depends on the
  // subset choice, only I/O does. At 100 TB, `LIMIT 100` reads one
  // file instead of the table, and on a sort-clustered table
  // `ORDER BY k LIMIT n` reads only the files whose [min,max] can hold
  // the top rows.

  private def statsPushable: Boolean =
    dataFilters.isEmpty && !MorDeletes.pending(deletes, files.map(_._2)) &&
      posDeletes.isEmpty && eqDeletes.isEmpty &&
      files.forall(_._2.rowCount >= 0)

  override def isPartiallyPushed(): Boolean = true

  override def pushLimit(n: Int): Boolean = {
    if (!statsPushable) return false
    var acc = 0L
    val prefix = files.span { f =>
      val need = acc < n
      acc += f._2.rowCount
      need
    } match { case (take, _) => take }
    if (prefix.length >= files.length) return false // nothing to save
    fileSubset = Some(prefix)
    true
  }

  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      n: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    if (!statsPushable || orders.length != 1) return false
    val order = orders(0)
    val logical = order.expression() match {
      case r: NamedReference if r.fieldNames().length == 1 => r.fieldNames()(0)
      case _ => return false
    }
    val field = schema.fields.find(_.name == logical).getOrElse(return false)
    val phys = ColumnMapping.renames(schema).getOrElse(logical, logical)
    val asc = order.direction() == SortDirection.ASCENDING
    // nulls sort outside the stat ranges and can hide in any file — a
    // single (or unknown) null disqualifies the file-subset bound
    if (!files.forall(_._2.nullCounts.get(phys).contains(0L))) return false
    val parsed = files.map { case (abs, f) =>
      for {
        mn <- f.minValues.get(phys).flatMap(StatValues.internal(_, field.dataType))
        mx <- f.maxValues.get(phys).flatMap(StatValues.internal(_, field.dataType))
      } yield ((abs, f), mn, mx)
    }
    if (parsed.exists(_.isEmpty)) return false
    val triples = parsed.flatten
    def cmp(a: Any, b: Any) = StatValues.compare(a, b, field.dataType)
    // ascending: choose files by smallest MAX until ≥ n rows are
    // guaranteed ≤ bound, then keep every file whose MIN ≤ bound
    // (descending is the mirror image)
    val byEdge =
      if (asc) triples.sortWith((a, b) => cmp(a._3, b._3) < 0)
      else triples.sortWith((a, b) => cmp(a._2, b._2) > 0)
    var acc = 0L
    val chosen = byEdge.span { t =>
      val need = acc < n
      acc += t._1._2.rowCount
      need
    } match { case (take, _) => take }
    if (acc < n || chosen.isEmpty) return false // can't bound the top-n
    val bound = if (asc) chosen.last._3 else chosen.last._2
    val kept = triples.filter(t =>
      if (asc) cmp(t._2, bound) <= 0 else cmp(t._3, bound) >= 0)
    if (kept.length >= files.length) return false // nothing to save
    fileSubset = Some(kept.map(_._1))
    true
  }

  /** COUNT(*)/MIN/MAX with no filters, no grouping, and no pending
    * merge-on-read deletes are answered from the snapshot's own
    * commit-time stats — O(1) metadata reads instead of scanning (even
    * parquet's footer-level aggregate pushdown reads every footer;
    * at 100 TB that's 10⁵ object reads for a COUNT(*)).
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = answerFromStats(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    metaAgg = answerFromStats(agg)
    metaAgg.isDefined
  }

  private def answerFromStats(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Seq[Any])] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (dataFilters.nonEmpty || agg.groupByExpressions.nonEmpty) return None
    if (MorDeletes.pending(deletes, files.map(_._2))) return None
    // equality deletes make counts unknowable from metadata (a key may
    // match 0..n rows); POSITION deletes subtract exactly from
    // COUNT(*): every delete row kills exactly one live row — a scan
    // applies pending deletes, so a deleted position can never re-match
    // a later MERGE/DELETE and be deleted twice — PROVIDED each object's
    // referenced data files are all still live (path-scoped stale refs
    // never match, so a dangling ref turns rowCount into an overcount).
    // Per-column stats (min/max/null counts) stay non-pushable under
    // any delete: the deleted rows may be exactly the extremes.
    if (eqDeletes.nonEmpty) return None
    val posDeleteRows: Long =
      if (posDeletes.isEmpty) 0L
      else {
        val live = files.map(_._2.path).toSet
        // a ref-pruned entry's rowCount still counts rows that named
        // rewritten files — an overcount over its live deletes
        if (posDeletes.exists(_._2.refsPruned) ||
            !posDeletes.forall(_._2.dataFiles.forall(live.contains)))
          return None
        posDeletes.map(_._2.rowCount).sum
      }
    val renames = ColumnMapping.renames(schema)
    val entries = files.map(_._2)

    def col(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[(String, String, DataType)] = e match {
      case n: NamedReference if n.fieldNames().length == 1 =>
        val logical = n.fieldNames()(0)
        schema.fields.find(_.name == logical)
          .map(f => (logical, renames.getOrElse(logical, logical), f.dataType))
      case _ => None
    }
    // every file must carry the stat; parse to Catalyst internal form
    def reduceStat(statOf: DataFileEntry => Map[String, String],
        phys: String, dt: DataType, takeMin: Boolean): Option[Any] = {
      if (entries.isEmpty) return Some(null)
      val parsed = entries.map(f =>
        statOf(f).get(phys).flatMap(StatValues.internal(_, dt)))
      if (parsed.exists(_.isEmpty)) None
      else Some(parsed.flatten.reduce((a, b) =>
        if ((StatValues.compare(a, b, dt) <= 0) == takeMin) a else b))
    }

    val out = agg.aggregateExpressions().toSeq.map {
      case _: CountStar =>
        if (entries.exists(_.rowCount < 0)) None
        else Some((org.apache.spark.sql.types.StructField("count(*)",
          LongType, nullable = false),
          entries.map(_.rowCount).sum - posDeleteRows: Any))
      case c: org.apache.spark.sql.connector.expressions.aggregate.Count
          if !c.isDistinct =>
        // COUNT(col) = Σ (rows − nulls); needs a null count in EVERY
        // file, and no deletes (a deleted row's nullness is unknown)
        col(c.column()).flatMap { case (logical, phys, _) =>
          if (posDeleteRows > 0 || entries.exists(f =>
              f.rowCount < 0 || !f.nullCounts.contains(phys))) None
          else Some((org.apache.spark.sql.types.StructField(s"count($logical)",
            LongType, nullable = false),
            entries.map(f => f.rowCount - f.nullCounts(phys)).sum: Any))
        }
      case m: Min if posDeleteRows == 0 =>
        col(m.column()).flatMap { case (logical, phys, dt) =>
          reduceStat(_.minValues, phys, dt, takeMin = true).map(v =>
            (org.apache.spark.sql.types.StructField(s"min($logical)", dt), v))
        }
      case m: Max if posDeleteRows == 0 =>
        col(m.column()).flatMap { case (logical, phys, dt) =>
          reduceStat(_.maxValues, phys, dt, takeMin = false).map(v =>
            (org.apache.spark.sql.types.StructField(s"max($logical)", dt), v))
        }
      case _ => None
    }
    if (out.exists(_.isEmpty)) None
    else Some((StructType(out.flatten.map(_._1)), out.flatten.map(_._2)))
  }

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    dataFilters = filters
    filters // Spark re-evaluates after the scan; parquet gets them below
  }

  override def pushedFilters(): Array[Predicate] = innerPushed

  /** Delegated parquet scan over `scanFiles`, under the CURRENT
    * pushdown state (stats pruning, physical-name mapping, `_file`
    * tagging). Batch `build()` calls this once over the snapshot's
    * files; the streaming source calls it per micro-batch over each
    * batch's appended files.
    */
  private[spark] def scanOver(scanFiles: Seq[(String, DataFileEntry)]): Scan = {
    // renamed columns: data files, footer stats, and conflict keys all
    // speak PHYSICAL names; the delegate scans physical, the wrapper
    // re-labels the result schema logical (purely positional)
    val renames = ColumnMapping.renames(schema)
    val physSchema = ColumnMapping.toPhysical(schema)
    val physFilters =
      dataFilters.map(ColumnMapping.toPhysicalExpr(_, renames))
    val kept = statsKept(scanFiles, physFilters, physSchema)
    // `_file`/`_pos` metadata columns: delegate reads the data columns
    // (plus the parquet row index when `_pos` is needed), the wrappers
    // append the per-row file path (single-file partitions)
    val (dataRequired, hasFile, hasPos) =
      GraftMetadataColumns.split(requiredSchema)
    val physRequired = ColumnMapping.toPhysicalRequired(dataRequired, schema)
    if (kept.isEmpty) return new EmptyScanBuilder(requiredSchema).build()

    def delegateScanFor(gSpec: Seq[PartitionField], gPartCols: Seq[String])(
        scanKept: Seq[(String, DataFileEntry)],
        readPhys: StructType): Scan = {
      // Hive-style col=value directory levels parse back into (typed)
      // partition columns — files written with partitionBy don't carry
      // those columns themselves. Each file's layout root is derived
      // from its OWN path (the `/files` dir the partition levels hang
      // off), so shared files of a zero-copy fork or a registered
      // table resolve against THEIR root while fresh local commits
      // resolve against this table's — several roots in one scan.
      // Metadata-only IMPORTED files can live outside any layout root;
      // partition parsing is then omitted (they're flat by contract).
      val roots = scanKept.map(e => GraftScanBuilder.dataRootOf(e._1))
      val partRoots =
        if (gPartCols.nonEmpty && roots.forall(_.isDefined))
          Some(roots.flatten.distinct)
        else None
      val opts =
        if (scanKept.forall(_._1.startsWith(baseDir))) {
          val optMap = new java.util.HashMap[String, String](options)
          optMap.put("basePath", baseDir)
          new CaseInsensitiveStringMap(optMap)
        } else options
      // the snapshot already knows every file's exact size — the
      // delegated index is served from it, zero per-file FS calls.
      // The delegate's schema carries the hidden transform directory
      // columns (typed — path parsing must not mis-infer them); they
      // are never in requiredSchema, so they are pruned straight out.
      val inner = org.apache.spark.sql.graft.SparkInternals.parquetScanBuilder(
        spark, scanKept.map { case (abs, f) => (abs, f.sizeBytes) },
        PartitionTransforms.extendSchema(physSchema, gSpec), gPartCols, opts,
        partRoots)
      inner match {
        case p: SupportsPushDownRequiredColumns => p.pruneColumns(readPhys)
        case _ => ()
      }
      inner match {
        case p: SupportsPushDownCatalystFilters =>
          p.pushFilters(physFilters)
          innerPushed = p.pushedFilters
        case _ => ()
      }
      inner.build()
    }
    def delegateScan(scanKept: Seq[(String, DataFileEntry)],
        readPhys: StructType): Scan =
      delegateScanFor(spec, partCols)(scanKept, readPhys)

    val fileField = org.apache.spark.sql.types.StructField(
      GraftMetadataColumns.FileName, StringType, nullable = false)
    val posField = org.apache.spark.sql.types.StructField(
      GraftMetadataColumns.PosName, LongType, nullable = false)

    // PARTITION-SPEC EVOLUTION: each epoch's files carry their own
    // directory layout (the layout encodes the full spec — arg-
    // qualified dir names). A uniform table (the overwhelmingly common
    // case) keeps the single vectorized delegate below; a table read
    // across epochs groups files by layout and reads each group under
    // ITS epoch's spec — per-epoch derived-predicate pruning included.
    // Mixed-epoch reads are row-based (concat); compaction rewrites
    // everything to the current spec and restores the fast path.
    val layouts = kept.groupBy(t => PartitionTransforms.layoutOf(t._1, baseDir))
    if (layouts.keySet.exists(_ != partCols)) {
      val batches = layouts.toSeq.sortBy(_._1.mkString(","))
        .flatMap { case (layout, gFiles) =>
          val gSpec = PartitionTransforms.specForLayout(layout, physSchema)
          val gPartCols = PartitionTransforms.dirNames(gSpec)
          // this epoch's own transform pruning (exact args from the
          // layout) — the caller's statsKept only knew the current spec
          val gDerived = PartitionTransforms.derivedPredicates(physFilters, gSpec)
          val gExt = PartitionTransforms.extendSchema(physSchema, gSpec)
          val gKept = gFiles.filter { case (_, f) =>
            gDerived.forall(e => FilePruning.mayMatch(e, f, gExt)) }
          if (gKept.isEmpty) Seq.empty
          else MorDeletes.morBatches(spark, gKept, deletes,
            MorDeletes.posIndex(gKept, posDeletes), eqDeletes,
            physSchema, physRequired,
            gPartCols, hasFile, hasPos,
            delegateScanFor(gSpec, gPartCols))
        }
      val outSchema = StructType(dataRequired.fields ++
        (if (hasPos) Seq(posField) else Nil) ++
        (if (hasFile) Seq(fileField) else Nil))
      if (batches.isEmpty) return new EmptyScanBuilder(outSchema).build()
      return new MorScan(outSchema,
        org.apache.spark.sql.graft.SparkInternals.concatBatches(batches),
        ExactScanStats(kept.map(_._2.rowCount).sum,
          kept.map(_._2.sizeBytes).sum))
    }

    // merge-on-read residuals: files with pending delete predicates or
    // position deletes read through row-exact filters; untouched files
    // (and everything appended after the newest delete) keep the plain
    // vectorized path. `_pos` also routes here — it rides the same
    // row-index plumbing.
    val posByNorm = MorDeletes.posIndex(kept, posDeletes)
    val eqPending = kept.exists(e =>
      MorDeletes.applicableEq(eqDeletes.map(_._2), e._2.seq).nonEmpty)
    if (MorDeletes.pending(deletes, kept.map(_._2)) || posByNorm.nonEmpty ||
        eqPending || hasPos) {
      val batches = MorDeletes.morBatches(spark, kept, deletes, posByNorm,
        eqDeletes, physSchema, physRequired, partCols, hasFile, hasPos,
        delegateScan)
      val outSchema = StructType(dataRequired.fields ++
        (if (hasPos) Seq(posField) else Nil) ++
        (if (hasFile) Seq(fileField) else Nil))
      // pre-residual totals: an UPPER bound (see MorScan)
      return new MorScan(outSchema,
        org.apache.spark.sql.graft.SparkInternals.concatBatches(batches),
        ExactScanStats(kept.map(_._2.rowCount).sum,
          kept.map(_._2.sizeBytes).sum))
    }

    val built = delegateScan(kept, physRequired)
    if (hasFile)
      new FileTaggedScan(built, StructType(dataRequired.fields :+ fileField))
    else if (!ColumnMapping.hasRenames(schema)) built
    else new RelabeledScan(built, dataRequired)
  }

  override def build(): Scan = {
    metaAgg.foreach { case (outSchema, values) =>
      // the aggregate is answered from the snapshot document — record a
      // conservative whole-table read in the txn's read set
      onBuild(ColumnMapping.toPhysical(schema).fieldNames.toSeq, Seq.empty)
      return new MetaAggScan(outSchema, values)
    }
    // LIMIT/TopN pushdown may have bounded the file list (superset of
    // the needed rows; Spark's own limit/sort still runs above)
    val effFiles = fileSubset.getOrElse(files)
    val renames = ColumnMapping.renames(schema)
    val physFilters =
      dataFilters.map(ColumnMapping.toPhysicalExpr(_, renames))
    val (dataRequired, hasFile, hasPos) =
      GraftMetadataColumns.split(requiredSchema)
    val physRequired = ColumnMapping.toPhysicalRequired(dataRequired, schema)
    onBuild(physRequired.fieldNames.toSeq, physFilters)
    val scan = scanOver(effFiles)
    // structural identity of THIS scan: exchange/subquery reuse (which
    // dynamic pruning depends on) compares the outermost Scan of two
    // independent plannings of the same query fragment — the delegated
    // parquet scans are distinct objects, so identity must come from
    // what is read, not from which instance reads it
    val fp = ScanFingerprint(tableName, effFiles.map(_._1),
      physRequired.fieldNames.toSeq,
      physFilters.map(ScanFingerprint.canonical), hasFile, hasPos)
    // the snapshot knows this scan's EXACT row/byte totals (commit-time
    // footer stats over the statically-pruned file list) — report them
    // instead of the delegate's estimate so join planning (broadcast
    // thresholds, DPP benefit) runs on truth, not listing-derived guesses
    val physSchemaForStats = ColumnMapping.toPhysical(schema)
    val keptForStats =
      statsKept(effFiles, physFilters, physSchemaForStats).map(_._2)
    val exact = Some(ExactScanStats(
      keptForStats.map(_.rowCount).sum, keptForStats.map(_.sizeBytes).sum,
      ColStatsBuild(schema, renames, keptForStats, colStats)))
    val mkStream = streamCtx.map { ctx =>
      val maxSnaps =
        Option(options.get(GraftTable.MaxSnapshotsPerTriggerOption))
          .map(_.toLong)
      () => new GraftMicroBatchStream(ctx, scanOver, scan.readSchema(),
        maxSnaps): org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    }
    // storage-partitioned joins: report each Hive-partition value as a
    // key-grouped storage partition so joins/aggregates clustered on
    // the partition columns skip their shuffle entirely (batch); the
    // stream hook rides along so partitioned tables stream too
    val keyGrouped =
      // pending-delete residuals read through per-group batches whose
      // partitions aren't key-attributable — SPJ resumes at compaction.
      // Transform specs (bucket/days/…) report their transform as the
      // partitioning; Spark resolves it through the catalog's V2
      // functions ([[GraftFunctionCatalog]]) — co-bucketed joins then
      // plan shuffle-free, the join-layout story at 100 TB.
      if (spec.nonEmpty && !hasFile && !hasPos && posDeletes.isEmpty &&
          eqDeletes.isEmpty &&
          !MorDeletes.pending(deletes, files.map(_._2)) &&
          spark.sessionState.conf.v2BucketingEnabled &&
          spec.forall(f => dataRequired.fieldNames.contains(f.col)))
        KeyGroupedScan.tryWrap(scan, spec, schema, effFiles, fp, mkStream,
          exact)
      else None
    // runtime (DPP-style) file pruning: a join's dynamic predicate
    // re-prunes the snapshot file list against per-file stats at
    // execution — with sort-clustered layout a star join scans only
    // the fact files whose ranges cover the joined keys
    keyGrouped.getOrElse(new RuntimeFilteredScan(
      StreamCapableScan.wrap(scan, mkStream),
      // only columns the scan actually OUTPUTS can carry a runtime
      // predicate (Spark resolves filterAttributes against the
      // relation output)
      RuntimeFilteredScan.prunableColumns(dataRequired),
      fp,
      exact,
      extra => {
        // runtime join keys prune through the transforms too: an IN
        // list on a bucketed key keeps only the buckets it hashes to
        val physExtra = extra.map(ColumnMapping.toPhysicalExpr(_, renames))
        val physSchema = ColumnMapping.toPhysical(schema)
        scanOver(statsKept(effFiles, physExtra, physSchema))
      }))
  }
}

/** Forwards the delegated parquet scan's size/row estimates through a
  * graft wrapper. Without this every wrapped scan reports UNKNOWN size,
  * Spark assumes worst-case, and a KB-sized dimension never
  * auto-broadcasts — at 100 TB that turns star joins into full
  * shuffles and starves dynamic partition pruning (which only fires
  * against a reusable broadcast).
  */
private[spark] trait DelegatedStatistics
    extends org.apache.spark.sql.connector.read.SupportsReportStatistics {
  protected def statsDelegate: Scan
  /** When set, the snapshot's commit-time totals win over the
    * delegate's estimate.
    */
  protected def exactStats: Option[ExactScanStats] = None
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    exactStats.map(e => new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(e.bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(e.rows)
      // ANALYZE's NDVs + bounds + null counts + equi-depth histograms
      // ride into Spark's CBO (join reorder, filter selectivity under
      // spark.sql.cbo.enabled) as DSv2 column statistics
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        import org.apache.spark.sql.connector.read.colstats.{
          ColumnStatistics, Histogram, HistogramBin}
        val m = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference,
          ColumnStatistics]()
        e.cols.foreach { case (col, cs) =>
          m.put(org.apache.spark.sql.connector.expressions.Expressions.column(col),
            new ColumnStatistics {
              override def distinctCount(): java.util.OptionalLong =
                cs.ndv.map(java.util.OptionalLong.of)
                  .getOrElse(java.util.OptionalLong.empty())
              override def min(): java.util.Optional[Object] =
                cs.min.map(v => java.util.Optional.of(v.asInstanceOf[Object]))
                  .getOrElse(java.util.Optional.empty[Object]())
              override def max(): java.util.Optional[Object] =
                cs.max.map(v => java.util.Optional.of(v.asInstanceOf[Object]))
                  .getOrElse(java.util.Optional.empty[Object]())
              override def nullCount(): java.util.OptionalLong =
                cs.nullCount.map(java.util.OptionalLong.of)
                  .getOrElse(java.util.OptionalLong.empty())
              override def avgLen(): java.util.OptionalLong =
                cs.avgLen.map(java.util.OptionalLong.of)
                  .getOrElse(java.util.OptionalLong.empty())
              override def maxLen(): java.util.OptionalLong =
                cs.maxLen.map(java.util.OptionalLong.of)
                  .getOrElse(java.util.OptionalLong.empty())
              override def histogram(): java.util.Optional[Histogram] =
                cs.hist.map { h =>
                  java.util.Optional.of(new Histogram {
                    override def height(): Double = h.height
                    override def bins(): Array[HistogramBin] =
                      h.bounds.sliding(2).zip(h.binNdv.iterator).map {
                        case (Seq(bLo, bHi), nd) => new HistogramBin {
                          override def lo(): Double = bLo
                          override def hi(): Double = bHi
                          override def ndv(): Long = nd
                        }
                      }.toArray
                  }: Histogram)
                }.getOrElse(java.util.Optional.empty[Histogram]())
            })
        }
        m
      }
    }: org.apache.spark.sql.connector.read.Statistics).getOrElse(
      statsDelegate match {
        case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
          s.estimateStatistics()
        case _ => new org.apache.spark.sql.connector.read.Statistics {
          override def sizeInBytes(): java.util.OptionalLong =
            java.util.OptionalLong.empty()
          override def numRows(): java.util.OptionalLong =
            java.util.OptionalLong.empty()
        }
      })
}

/** Exact totals for a scan, summed from the snapshot's per-file
  * commit-time stats over the statically-pruned file list; `cols`
  * carries per-column CBO statistics (logical names) combined from
  * ANALYZE's statistics file and the kept files' footer stats.
  */
private[spark] case class ExactScanStats(rows: Long, bytes: Long,
    cols: Map[String, ColStatV2] = Map.empty)

/** ANALYZE-persisted statistics for one column as read back from the
  * table's statistics file (bounds stat-string encoded like
  * [[graft.format.DataFileEntry]]: numeric text, dates as epoch days,
  * timestamps as epoch micros).
  */
private[graft] case class AnalyzedColStats(ndv: Long,
    min: Option[String], max: Option[String], nullCount: Option[Long],
    histBounds: Seq[Double] = Seq.empty, histNdv: Seq[Long] = Seq.empty,
    histHeight: Double = 0.0, avgLen: Option[Long] = None,
    maxLen: Option[Long] = None)

/** One column's statistics as served to Spark — min/max already boxed
  * in the CBO's expected representation (numerics as themselves, dates
  * as epoch-day Int, timestamps as epoch-micros Long: what
  * EstimationUtils turns into selectivity ranges).
  */
private[spark] case class ColStatV2(ndv: Option[Long] = None,
    min: Option[Any] = None, max: Option[Any] = None,
    nullCount: Option[Long] = None, hist: Option[HistV2] = None,
    avgLen: Option[Long] = None, maxLen: Option[Long] = None)

private[spark] case class HistV2(height: Double, bounds: Seq[Double],
    binNdv: Seq[Long])

/** Merges ANALYZE statistics with file-level footer stats over the
  * PRUNED file list: bounds and null counts prefer the file level
  * (scoped to what this scan actually reads — tighter after partition
  * or min/max pruning), falling back to ANALYZE's whole-snapshot
  * values; NDV and histograms come from ANALYZE only. Strings carry
  * ndv/nullCount but no bounds (the CBO's range estimation is
  * numeric-only).
  */
private[spark] object ColStatsBuild {
  import org.apache.spark.sql.types._

  def apply(schema: StructType, renames: Map[String, String],
      kept: Seq[DataFileEntry],
      analyzed: Map[String, AnalyzedColStats]): Map[String, ColStatV2] =
    schema.fields.iterator.map { f =>
      val phys = renames.getOrElse(f.name, f.name)
      val a = analyzed.get(f.name)
      val nullsFile =
        if (kept.nonEmpty && kept.forall(_.nullCounts.contains(phys)))
          Some(kept.map(_.nullCounts(phys)).sum)
        else None
      val fileBounds = reduceBounds(kept, phys, f.dataType)
      val mn = fileBounds.map(_._1).orElse(a.flatMap(_.min))
        .flatMap(typed(_, f.dataType))
      val mx = fileBounds.map(_._2).orElse(a.flatMap(_.max))
        .flatMap(typed(_, f.dataType))
      val hist = a.filter(x => x.histBounds.size >= 2 &&
        x.histNdv.size == x.histBounds.size - 1 && x.histHeight > 0)
        .map(x => HistV2(x.histHeight, x.histBounds, x.histNdv))
      f.name -> ColStatV2(a.map(_.ndv), mn, mx,
        nullsFile.orElse(a.flatMap(_.nullCount)), hist,
        a.flatMap(_.avgLen), a.flatMap(_.maxLen))
    }.filter(_._2 != ColStatV2()).toMap

  /** (min, max) stat strings over the kept files — only when EVERY
    * kept file carries the column's bounds (a stats-less file could
    * hold any value) and the type compares numerically.
    */
  private def reduceBounds(kept: Seq[DataFileEntry], phys: String,
      dt: DataType): Option[(String, String)] = dt match {
    case LongType | IntegerType | ShortType | ByteType | DateType |
         TimestampType | TimestampNTZType | DoubleType | FloatType
        if kept.nonEmpty && kept.forall(f =>
          f.minValues.contains(phys) && f.maxValues.contains(phys)) =>
      try Some((kept.map(f => BigDecimal(f.minValues(phys))).min.toString,
        kept.map(f => BigDecimal(f.maxValues(phys))).max.toString))
      catch { case _: NumberFormatException => None }
    case _ => None
  }

  /** Stat string → the boxed value Spark's CBO expects for `dt`. */
  private def typed(s: String, dt: DataType): Option[Any] =
    try dt match {
      case LongType => Some(java.lang.Long.valueOf(BigDecimal(s).toLongExact))
      case IntegerType | DateType => // dates: epoch days
        Some(java.lang.Integer.valueOf(BigDecimal(s).toIntExact))
      case ShortType => Some(java.lang.Short.valueOf(BigDecimal(s).toShortExact))
      case ByteType => Some(java.lang.Byte.valueOf(BigDecimal(s).toByteExact))
      case TimestampType | TimestampNTZType => // epoch micros
        Some(java.lang.Long.valueOf(BigDecimal(s).toLongExact))
      case DoubleType => Some(java.lang.Double.valueOf(s.toDouble))
      case FloatType => Some(java.lang.Float.valueOf(s.toFloat))
      case _ => None
    } catch {
      case _: NumberFormatException | _: ArithmeticException => None
    }
}

/** Value identity of a graft scan: the table, the snapshot's file
  * list, the pushed column set, and the pushed filters (attributes
  * canonicalized — exprIds differ across plannings). Two scans with
  * equal fingerprints read the same bytes and return the same rows,
  * which is exactly the contract exchange reuse needs.
  */
private[spark] case class ScanFingerprint(
    table: String,
    files: Seq[String],
    readCols: Seq[String],
    filters: Seq[String],
    hasFile: Boolean,
    hasPos: Boolean = false)

private[spark] object GraftScanBuilder {
  /** A data file's partition-layout root: the deepest `/files` dir in
    * its path from which every level down to the file itself is a
    * Hive `col=value` directory. None for files outside any graft
    * data dir (flat metadata-only imports).
    */
  def dataRootOf(abs: String): Option[String] = {
    val segs = abs.split('/')
    val fileIdx = segs.length - 1
    (fileIdx - 1 to 0 by -1)
      .find(j => segs(j) == "files" &&
        (j + 1 until fileIdx).forall(k => segs(k).contains('=')))
      .map(j => segs.take(j + 1).mkString("/"))
  }
}

private[spark] object ScanFingerprint {
  def canonical(e: Expression): String =
    e.transform {
      case a: Attribute => UnresolvedAttribute(Seq(a.name))
    }.toString
}

/** Scan reporting [[KeyGroupedPartitioning]] over the table's
  * partition columns — one storage partition per partition value. At
  * 100 TB, a join of two tables partitioned on the same key runs
  * shuffle-free: each task reads both sides' files for one key
  * (Spark's storage-partitioned join; enabled by
  * `spark.sql.sources.v2.bucketing.enabled`).
  */
class KeyGroupedScan(
    val delegate: Scan,
    val spec: Seq[PartitionField],
    partitions: Array[org.apache.spark.sql.connector.read.InputPartition],
    partTypes: Seq[DataType] = Seq.empty,
    val fingerprint: Option[ScanFingerprint] = None,
    mkStream: Option[() =>
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream] = None,
    exact: Option[ExactScanStats] = None)
  extends Scan
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
  with DelegatedStatistics {

  private val partCols: Seq[String] = PartitionTransforms.dirNames(spec)

  override protected def statsDelegate: Scan = delegate
  override protected def exactStats: Option[ExactScanStats] = exact

  // runtime (DPP-style) group filtering may drop groups at execution
  @volatile private var parts = partitions

  override def readSchema(): StructType = delegate.readSchema()

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    mkStream.map(_.apply())
      .getOrElse(super.toMicroBatchStream(checkpointLocation))

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    spec.map(f =>
      org.apache.spark.sql.connector.expressions.Expressions.column(f.col))
      .toArray

  /** Dynamic partition pruning, storage-partitioned form: evaluate the
    * runtime predicate against each group's partition KEY and drop
    * whole groups — the fact side of a star join reads only the
    * partitions the filtered dimension actually joins to. Predicates
    * arrive on SOURCE columns; identity keys evaluate them directly,
    * derived keys through the transform mapping (equality/IN through
    * bucket — the join-key case).
    */
  override def filter(predicates: Array[Predicate]): Unit = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute => UA}
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BasePredicate, Predicate => CPred}
    if (partTypes.isEmpty) return
    val attrs = spec.zip(partTypes).map { case (f, t) =>
      AttributeReference(f.dirName, t)() }
    val byName = attrs.map(a => a.name -> a).toMap
    def resolve(e: Expression): Option[Expression] = {
      val r = e.transform {
        case u: UA if byName.contains(u.nameParts.last) =>
          byName(u.nameParts.last)
      }
      // a predicate naming anything but partition-key columns can't
      // be evaluated on the key — keep all groups (conservative)
      if (r.exists(_.isInstanceOf[UA])) None else Some(r)
    }
    val translated = predicates.toSeq.flatMap(PredicateToExpression.translate)
    val resolved = translated.flatMap(resolve) ++
      PartitionTransforms.derivedPredicates(translated, spec).flatMap(resolve)
    if (resolved.isEmpty) return
    val pred: BasePredicate = CPred.create(
      resolved.reduce(org.apache.spark.sql.catalyst.expressions.And(_, _)),
      attrs)
    parts = parts.filter {
      case k: org.apache.spark.sql.graft.KeyedFilePartition =>
        pred.eval(k.partitionKey())
      case _ => true
    }
  }

  // STRUCTURAL equality (runtime-filter state excluded): broadcast and
  // subquery reuse — which dynamic pruning depends on — compare the
  // outermost Scan of independently-planned fragments
  override def equals(other: Any): Boolean = other match {
    case k: KeyGroupedScan => fingerprint.isDefined &&
      fingerprint == k.fingerprint && spec == k.spec
    case _ => false
  }
  override def hashCode(): Int = (fingerprint, spec).hashCode()

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
      spec.map(_.toTransform
        : org.apache.spark.sql.connector.expressions.Expression).toArray,
      parts.length)

  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    new org.apache.spark.sql.connector.read.Batch {
      override def planInputPartitions()
          : Array[org.apache.spark.sql.connector.read.InputPartition] = parts
      override def createReaderFactory()
          : org.apache.spark.sql.connector.read.PartitionReaderFactory =
        org.apache.spark.sql.graft.SparkInternals.keyUnwrappingFactory(
          delegate.toBatch.createReaderFactory())
    }

  override def description(): String =
    s"KeyGrouped(${spec.map(_.render).mkString(",")}, " +
      s"groups=${parts.length}, ${delegate.description()})"
}

object KeyGroupedScan {
  /** None when any file lacks partition values (imported/flat files) —
    * callers keep the plain scan, losing only the optimization. Keys
    * are served from the SNAPSHOT's per-file partition values
    * (`fileEntry` folds Hive dir values into the stats), so hidden
    * transform columns key their groups without ever being read.
    */
  def tryWrap(delegate: Scan, spec: Seq[PartitionField],
      schema: StructType,
      files: Seq[(String, graft.format.DataFileEntry)],
      fingerprint: ScanFingerprint = null,
      mkStream: Option[() =>
        org.apache.spark.sql.connector.read.streaming.MicroBatchStream] = None,
      exact: Option[ExactScanStats] = None)
      : Option[Scan] = {
    val partTypes = spec.map(f => f.dirType(schema(f.col).dataType))
    val byPath = files.map { case (abs, e) =>
      new org.apache.hadoop.fs.Path(abs).toUri.getPath -> e
    }.toMap
    def keyOf(path: String): Option[Seq[Any]] =
      byPath.get(path).flatMap { e =>
        val vals = spec.zip(partTypes).map { case (f, t) =>
          e.minValues.get(f.dirName) match {
            case Some(s) => StatValues.internal(s, t)
            // the null-partition dir: all rows null ⇒ key value null
            case None if e.nullCounts.get(f.dirName).contains(e.rowCount) =>
              Some(null)
            case None => None
          }
        }
        if (vals.exists(_.isEmpty)) None else Some(vals.map(_.get))
      }
    org.apache.spark.sql.graft.SparkInternals
      .keyGroupedPartitions(delegate.toBatch, keyOf)
      .map(ps => new KeyGroupedScan(delegate, spec, ps, partTypes,
        Option(fingerprint), mkStream, exact))
  }
}

/** Runtime (DPP-style) FILE pruning for non-key-grouped scans: a
  * join's dynamic predicate (typically `col IN (joined keys)`) arrives
  * at execution via [[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]]
  * and the file list is re-pruned against per-file min/max before any
  * file is opened. With sort-clustered layout
  * (`graft.write.sort-by`) the joined keys cover few files' ranges, so
  * a star join against an unpartitioned fact scans a sliver of it —
  * dynamic file pruning, the unpartitioned sibling of DPP.
  */
private[spark] class RuntimeFilteredScan(
    val initial: Scan,
    val attrs: Seq[String],
    val fingerprint: ScanFingerprint,
    exact: Option[ExactScanStats],
    rebuild: Seq[Expression] => Scan) extends Scan
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
    with DelegatedStatistics {

  @volatile private var current: Scan = initial

  override protected def statsDelegate: Scan = current
  // planning reads stats before execution-time rebuilds can happen
  override protected def exactStats: Option[ExactScanStats] = exact

  override def readSchema(): StructType = initial.readSchema()

  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    current.toBatch

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    initial.toMicroBatchStream(checkpointLocation)

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    attrs.map(c =>
      org.apache.spark.sql.connector.expressions.Expressions.column(c)).toArray

  override def filter(predicates: Array[Predicate]): Unit = {
    val exprs = predicates.toSeq.flatMap(PredicateToExpression.translate)
    if (exprs.nonEmpty) current = rebuild(exprs)
  }

  override def description(): String =
    s"RuntimeFilterable(${initial.description()})"

  // STRUCTURAL equality (runtime-filter state excluded): broadcast
  // reuse — which DPP depends on — compares canonicalized plans, and
  // two plannings of the same query build two wrapper instances
  override def equals(other: Any): Boolean = other match {
    case r: RuntimeFilteredScan =>
      fingerprint == r.fingerprint && attrs == r.attrs
    case _ => false
  }
  override def hashCode(): Int = (fingerprint, attrs).hashCode()
}

private[spark] object RuntimeFilteredScan {
  /** Columns whose per-file stats [[FilePruning]] can reason about —
    * the only ones worth advertising for runtime filtering.
    */
  private val prunableTypes: Set[DataType] = Set(
    LongType, IntegerType, ShortType, ByteType, DoubleType, FloatType,
    StringType, DateType, TimestampType, TimestampNTZType)

  def prunableColumns(schema: StructType): Seq[String] =
    schema.fields.filter(f => prunableTypes(f.dataType)).map(_.name).toSeq
}

/** Typed decode/compare of commit-time stat strings (the encoding
  * [[graft.format.ParquetStats]] writes: numbers via `toString`,
  * strings verbatim).
  */
private[graft] object StatValues {
  def internal(s: String, dt: DataType): Option[Any] = try dt match {
    case LongType | TimestampType | TimestampNTZType => Some(s.toLong)
    case IntegerType | DateType => Some(s.toInt)
    case ShortType => Some(s.toShort)
    case ByteType => Some(s.toByte)
    case DoubleType => Some(s.toDouble)
    case FloatType => Some(s.toFloat)
    case StringType => Some(UTF8String.fromString(s))
    case BooleanType => Some(s.toBoolean)
    case _ => None
  } catch { case _: NumberFormatException => None }

  def compare(a: Any, b: Any, dt: DataType): Int = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType | DateType =>
      Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case ShortType => java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short])
    case ByteType => java.lang.Byte.compare(a.asInstanceOf[Byte], b.asInstanceOf[Byte])
    case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case FloatType => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case StringType =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case BooleanType =>
      java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case _ => throw new IllegalArgumentException(s"incomparable type $dt")
  }
}

/** A fully-pushed aggregate answered from snapshot metadata: one
  * partition, one row, zero data files opened.
  */
private[spark] class MetaAggScan(outSchema: StructType, values: Seq[Any])
    extends Scan {
  override def readSchema(): StructType = outSchema
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    new org.apache.spark.sql.connector.read.Batch {
      override def planInputPartitions()
          : Array[org.apache.spark.sql.connector.read.InputPartition] =
        Array(MetaAggPartition(values.toArray))
      override def createReaderFactory()
          : org.apache.spark.sql.connector.read.PartitionReaderFactory =
        new MetaAggReaderFactory
    }
  override def description(): String =
    s"MetadataAggregate(${outSchema.fieldNames.mkString(",")})"
}

private[spark] case class MetaAggPartition(values: Array[Any])
    extends org.apache.spark.sql.connector.read.InputPartition

private[spark] class MetaAggReaderFactory
    extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
  override def createReader(
      p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] = {
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      p.asInstanceOf[MetaAggPartition].values)
    new org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] {
      private var served = false
      override def next(): Boolean = { val r = !served; served = true; r }
      override def get(): org.apache.spark.sql.catalyst.InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** Scan of a table with PENDING merge-on-read deletes: per-group
  * delegated parquet batches (each with its row-exact residual filter)
  * concatenated into one batch. Output schema is logical — rows are
  * positional (rename-safe, [[ColumnMapping]]). Group count ≤ distinct
  * delete epochs + 1, so the concat stays tiny; a rewrite or
  * compaction returns the table to the single vectorized scan.
  */
private[spark] class MorScan(
    outSchema: StructType,
    batch: org.apache.spark.sql.connector.read.Batch,
    stats: ExactScanStats) extends Scan
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = outSchema
  override def toBatch: org.apache.spark.sql.connector.read.Batch = batch
  // pre-residual totals: an UPPER bound (join planning degrades
  // gracefully — a broadcastable side stays broadcastable)
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(stats.bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(stats.rows)
    }
  override def description(): String = s"MorResidual(${outSchema.fieldNames.mkString(",")})"
}

/** Scan wrapper reporting LOGICAL column names over a delegate that
  * read under physical ones — rows are positional, so re-labeling the
  * schema is the whole job (rename-safe reads, [[ColumnMapping]]).
  */
private[spark] class RelabeledScan(val delegate: Scan, outSchema: StructType)
    extends Scan with DelegatedStatistics {
  override protected def statsDelegate: Scan = delegate
  override def readSchema(): StructType = outSchema
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    delegate.toBatch
  override def description(): String = s"Relabeled(${delegate.description()})"
  override def equals(other: Any): Boolean = other match {
    case r: RelabeledScan =>
      delegate == r.delegate && readSchema() == r.readSchema()
    case _ => false
  }
  override def hashCode(): Int = (delegate, readSchema()).hashCode()
}

/** Min/max interval analysis of Catalyst predicates against one file's
  * stats. `mayMatch = false` ⇒ provably zero matching rows.
  */
/** Column name from a resolved attribute OR an unresolved one (the
  * selective-rewrite paths prune with parser-produced expressions
  * that never went through the analyzer).
  */
private[spark] object AttrName {
  def unapply(e: Expression): Option[String] = e match {
    case a: Attribute => Some(a.name)
    case u: UnresolvedAttribute => Some(u.nameParts.last)
    case _ => None
  }
}

object FilePruning {

  def mayMatch(expr: Expression, file: DataFileEntry, schema: StructType): Boolean =
    expr match {
      case And(l, r) => mayMatch(l, file, schema) && mayMatch(r, file, schema)
      case Or(l, r) => mayMatch(l, file, schema) || mayMatch(r, file, schema)
      case EqualTo(AttrName(a), Literal(v, _)) =>
        within(a, v, file, schema)
      case EqualTo(Literal(v, _), AttrName(a)) =>
        within(a, v, file, schema)
      case GreaterThan(AttrName(a), Literal(v, _)) =>
        compareMax(a, v, file, schema).forall(_ > 0)
      case GreaterThanOrEqual(AttrName(a), Literal(v, _)) =>
        compareMax(a, v, file, schema).forall(_ >= 0)
      case LessThan(AttrName(a), Literal(v, _)) =>
        compareMin(a, v, file, schema).forall(_ < 0)
      case LessThanOrEqual(AttrName(a), Literal(v, _)) =>
        compareMin(a, v, file, schema).forall(_ <= 0)
      case GreaterThan(Literal(v, _), AttrName(a)) =>
        compareMin(a, v, file, schema).forall(_ < 0)
      case GreaterThanOrEqual(Literal(v, _), AttrName(a)) =>
        compareMin(a, v, file, schema).forall(_ <= 0)
      case LessThan(Literal(v, _), AttrName(a)) =>
        compareMax(a, v, file, schema).forall(_ > 0)
      case LessThanOrEqual(Literal(v, _), AttrName(a)) =>
        compareMax(a, v, file, schema).forall(_ >= 0)
      case In(AttrName(a), values) if values.forall(_.isInstanceOf[Literal]) =>
        values.exists(l => within(a, l.asInstanceOf[Literal].value, file, schema))
      // null-count pruning (absent count = unknown → keep)
      case IsNull(AttrName(a)) =>
        file.nullCounts.get(a).forall(_ > 0)
      case IsNotNull(AttrName(a)) =>
        file.nullCounts.get(a).forall(_ < file.rowCount)
      case _ => true // unknown shape: keep the file
    }

  /** Does the file's EVERY row provably satisfy `expr`? Conservative —
    * false whenever stats can't prove it (absent stats, unknown null
    * counts, unhandled shapes). The DELETE fast path: a wholly-covered
    * file drops from metadata without being read, so a
    * partition-aligned DELETE at 100 TB is a pure metadata commit
    * (identity-partitioned files pin the partition column to one value
    * with min = max).
    */
  def mustMatchAll(expr: Expression, file: DataFileEntry,
      schema: StructType): Boolean = {
    def noNulls(a: String): Boolean =
      file.nullCounts.get(a).contains(0L)
    def pinnedTo(a: String, v: Any): Boolean =
      compareMin(a, v, file, schema).contains(0) &&
        compareMax(a, v, file, schema).contains(0)
    expr match {
      case And(l, r) =>
        mustMatchAll(l, file, schema) && mustMatchAll(r, file, schema)
      case Or(l, r) =>
        mustMatchAll(l, file, schema) || mustMatchAll(r, file, schema)
      case EqualTo(AttrName(a), Literal(v, _)) => noNulls(a) && pinnedTo(a, v)
      case EqualTo(Literal(v, _), AttrName(a)) => noNulls(a) && pinnedTo(a, v)
      case In(AttrName(a), values) if values.forall(_.isInstanceOf[Literal]) =>
        noNulls(a) &&
          values.exists(l => pinnedTo(a, l.asInstanceOf[Literal].value))
      case GreaterThan(AttrName(a), Literal(v, _)) =>
        noNulls(a) && compareMin(a, v, file, schema).exists(_ > 0)
      case GreaterThanOrEqual(AttrName(a), Literal(v, _)) =>
        noNulls(a) && compareMin(a, v, file, schema).exists(_ >= 0)
      case LessThan(AttrName(a), Literal(v, _)) =>
        noNulls(a) && compareMax(a, v, file, schema).exists(_ < 0)
      case LessThanOrEqual(AttrName(a), Literal(v, _)) =>
        noNulls(a) && compareMax(a, v, file, schema).exists(_ <= 0)
      case GreaterThan(Literal(v, _), AttrName(a)) =>
        noNulls(a) && compareMax(a, v, file, schema).exists(_ < 0)
      case GreaterThanOrEqual(Literal(v, _), AttrName(a)) =>
        noNulls(a) && compareMax(a, v, file, schema).exists(_ <= 0)
      case LessThan(Literal(v, _), AttrName(a)) =>
        noNulls(a) && compareMin(a, v, file, schema).exists(_ > 0)
      case LessThanOrEqual(Literal(v, _), AttrName(a)) =>
        noNulls(a) && compareMin(a, v, file, schema).exists(_ >= 0)
      case IsNull(AttrName(a)) =>
        file.nullCounts.get(a).contains(file.rowCount)
      case IsNotNull(AttrName(a)) => noNulls(a)
      case _ => false
    }
  }

  /** cmp(file.max(attr), v): None = no stats (keep). */
  private def compareMax(a: String, v: Any, f: DataFileEntry,
      schema: StructType): Option[Int] =
    f.maxValues.get(a).flatMap(s => typeOf(a, schema).flatMap(t => cmp(s, v, t)))

  private def compareMin(a: String, v: Any, f: DataFileEntry,
      schema: StructType): Option[Int] =
    f.minValues.get(a).flatMap(s => typeOf(a, schema).flatMap(t => cmp(s, v, t)))

  private def within(a: String, v: Any, f: DataFileEntry,
      schema: StructType): Boolean = {
    val aboveMin = compareMin(a, v, f, schema).forall(_ <= 0)
    val belowMax = compareMax(a, v, f, schema).forall(_ >= 0)
    aboveMin && belowMax
  }

  private def typeOf(a: String, schema: StructType): Option[DataType] =
    schema.find(_.name == a).map(_.dataType)

  /** Compare a rendered stat with a Catalyst literal value; None when
    * the combination isn't comparable (prune conservatively).
    */
  private def cmp(stat: String, v: Any, dt: DataType): Option[Int] =
    try dt match {
      case LongType | IntegerType | ShortType | ByteType |
           TimestampType | TimestampNTZType | DateType =>
        val lit = v match {
          case n: java.lang.Number => n.longValue()
          case _ => return None
        }
        Some(java.lang.Long.compare(stat.toLong, lit))
      case DoubleType | FloatType =>
        val lit = v match {
          case n: java.lang.Number => n.doubleValue()
          case _ => return None
        }
        Some(java.lang.Double.compare(stat.toDouble, lit))
      case StringType =>
        val lit = v match {
          case s: UTF8String => s.toString
          case s: String => s
          case _ => return None
        }
        // parquet binary min/max and Spark's UTF8String order by UTF-8
        // bytes; String.compareTo (UTF-16 code units) disagrees for
        // supplementary characters — compare raw bytes unsigned.
        Some(utf8Compare(stat, lit))
      case _ => None
    } catch { case _: NumberFormatException => None }

  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }
}

/** Per-column numeric read intervals extracted from pushed predicates,
  * serialized into the TABLE_SELECT action's args ("ivl.<col>" →
  * "lo|hi", bounds treated as CLOSED — conservative). Under
  * SERIALIZABLE these let the conflict analyzer prove a committed
  * append DISJOINT from the read set (writer file stats on the other
  * side), so txns touching different rows of one table both commit.
  */
object ReadIntervals {

  private def num(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue())
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case _ => None // strings/binary: no interval, stay conservative
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  def fromFilters(filters: Seq[Expression]): Map[String, String] = {
    val acc = scala.collection.mutable.Map.empty[String, (Double, Double)]
    def tighten(c: String, lo: Double, hi: Double): Unit = {
      val (l0, h0) = acc.getOrElse(c,
        (Double.NegativeInfinity, Double.PositiveInfinity))
      acc(c) = (math.max(l0, lo), math.min(h0, hi))
    }
    for (f <- filters; e <- conjuncts(f)) e match {
      case EqualTo(AttrName(a), Literal(v, _)) =>
        num(v).foreach(x => tighten(a, x, x))
      case EqualTo(Literal(v, _), AttrName(a)) =>
        num(v).foreach(x => tighten(a, x, x))
      case GreaterThan(AttrName(a), Literal(v, _)) =>
        num(v).foreach(x => tighten(a, x, Double.PositiveInfinity))
      case GreaterThanOrEqual(AttrName(a), Literal(v, _)) =>
        num(v).foreach(x => tighten(a, x, Double.PositiveInfinity))
      case LessThan(AttrName(a), Literal(v, _)) =>
        num(v).foreach(x => tighten(a, Double.NegativeInfinity, x))
      case LessThanOrEqual(AttrName(a), Literal(v, _)) =>
        num(v).foreach(x => tighten(a, Double.NegativeInfinity, x))
      case GreaterThan(Literal(v, _), AttrName(a)) =>
        num(v).foreach(x => tighten(a, Double.NegativeInfinity, x))
      case GreaterThanOrEqual(Literal(v, _), AttrName(a)) =>
        num(v).foreach(x => tighten(a, Double.NegativeInfinity, x))
      case LessThan(Literal(v, _), AttrName(a)) =>
        num(v).foreach(x => tighten(a, x, Double.PositiveInfinity))
      case LessThanOrEqual(Literal(v, _), AttrName(a)) =>
        num(v).foreach(x => tighten(a, x, Double.PositiveInfinity))
      case In(AttrName(a), vs) if vs.forall(_.isInstanceOf[Literal]) =>
        val xs = vs.collect { case Literal(v, _) => num(v) }.flatten
        if (xs.nonEmpty && xs.length == vs.length)
          tighten(a, xs.min, xs.max)
      case _ => () // un-analyzable conjunct constrains nothing extra
    }
    acc.map { case (c, (lo, hi)) => s"ivl.$c" -> s"$lo|$hi" }.toMap
  }
}
