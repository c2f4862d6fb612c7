package graft.spark

import java.util.{Collections, Iterator => JIterator}

import graft.maintain.Maintenance
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Maintenance jobs as DSv2 stored procedures —
  * `CALL <catalog>.system.<proc>(...)` (the operational surface
  * Iceberg users drive with CALL; Spark 4 ships the ProcedureCatalog
  * API but no built-in procedures — the connector supplies them).
  *
  * Each procedure wraps the corresponding [[Maintenance]] job and
  * returns its summary as a one-shot [[LocalScan]] result set.
  */
object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  val names: Seq[String] = Seq(
    "compact_table", "expire_snapshots", "remove_orphan_files",
    "expire_catalog_versions", "import_files", "rollback_catalog",
    "create_tag", "drop_tag",
    "create_branch", "drop_branch", "fast_forward", "analyze_table",
    "create_materialized_view", "refresh_materialized_view",
    "drop_materialized_view")

  def load(cat: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Namespace),
      s"no such procedure namespace: ${ident.namespace().mkString(".")}")
    ident.name() match {
      case "analyze_table" => AnalyzeTable(cat)
      case "create_materialized_view" => CreateMaterializedView(cat)
      case "refresh_materialized_view" => RefreshMaterializedView(cat)
      case "drop_materialized_view" => DropMaterializedView(cat)
      case "compact_table" => CompactTable(cat)
      case "rewrite_position_deletes" => RewritePositionDeletes(cat)
      case "expire_snapshots" => ExpireSnapshots(cat)
      case "remove_orphan_files" => RemoveOrphanFiles(cat)
      case "expire_catalog_versions" => ExpireCatalogVersions(cat)
      case "import_files" => ImportFiles(cat)
      case "rollback_catalog" => RollbackCatalog(cat)
      case "create_tag" => CreateTag(cat)
      case "drop_tag" => DropTag(cat)
      case "create_branch" => CreateBranch(cat)
      case "drop_branch" => DropBranch(cat)
      case "fast_forward" => FastForward(cat)
      case "rollback_to_snapshot" => RollbackToSnapshot(cat)
      case "cherrypick_snapshot" => CherryPickSnapshot(cat)
      case "snapshot_table" => SnapshotTable(cat)
      case "rewrite_manifests" => RewriteManifests(cat)
      case "register_table" => RegisterTable(cat)
      case "export_iceberg" => ExportIceberg(cat)
      case "export_catalog" => ExportCatalog(cat)
      case other =>
        throw new IllegalArgumentException(s"no such procedure: $other")
    }
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def inDefault(name: String, dt: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** One-row (or few-row) result set as a Scan iterator. */
  private def result(schema: StructType, out: Seq[InternalRow])
      : JIterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = out.toArray
    }
    Collections.singletonList(scan).iterator()
  }

  private abstract class GraftProcedure(val name: String)
      extends UnboundProcedure with BoundProcedure {
    override def description(): String = s"graft $name"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
  }

  private case class CompactTable(cat: GraftCatalog)
      extends GraftProcedure("compact_table") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      inDefault("target_files", IntegerType, "1"),
      inDefault("sort_by", StringType, "''")) // comma-separated columns
    override def call(input: InternalRow): JIterator[Scan] = {
      val raw = input.getString(3).trim
      // 'zorder(a,b)' is ONE sort spec — don't split its commas
      val sortBy =
        if (GraftCatalog.ZOrderSortBy.pattern.matcher(raw).matches()) Seq(raw)
        else raw.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      val r = Maintenance.compactDataFiles(
        org.apache.spark.sql.SparkSession.active, cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)),
        targetFiles = input.getInt(2), sortBy = sortBy)
      result(
        StructType(Seq(StructField("files_before", IntegerType, false),
          StructField("files_after", IntegerType, false))),
        Seq(InternalRow(r.filesBefore, r.filesAfter)))
    }
  }

  /** ANALYZE: theta-sketch NDVs per column, persisted as an Iceberg
    * Puffin statistics file and served over REST ([[Maintenance
    * .analyzeTable]]); returns the per-column estimates.
    */
  private case class AnalyzeTable(cat: GraftCatalog)
      extends GraftProcedure("analyze_table") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      inDefault("columns", StringType, "''"), // comma-separated; '' = all
      // 'incremental' sketches only files appended since the last
      // ANALYZE and unions (falls back to full when the chain isn't
      // purely additive)
      inDefault("mode", StringType, "'full'"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val cols = input.getString(2).split(',').toSeq
        .map(_.trim).filter(_.nonEmpty)
      val r = Maintenance.analyzeTable(
        org.apache.spark.sql.SparkSession.active, cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)), cols,
        mode = input.getString(3))
      result(
        StructType(Seq(StructField("column", StringType, false),
          StructField("ndv", LongType, false))),
        r.map(c => InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(c.column),
          c.ndv)))
    }
  }

  /** Incrementally-maintained materialized view over a graft table
    * ([[graft.maintain.MaterializedViews]]): GROUP BY keys +
    * count/sum/min/max aggregates; refresh merges only the appended
    * delta's aggregate. A range containing deletes/updates maintains
    * from the CHANGE FEED (counting algorithm, signed partials) when
    * every aggregate retracts — count/sum with a `count:1` and a
    * matching `count:<expr>` per sum; only otherwise does refresh
    * fall back to a full recompute.
    */
  private case class CreateMaterializedView(cat: GraftCatalog)
      extends GraftProcedure("create_materialized_view") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("name", StringType),
      in("source_namespace", StringType), in("source_table", StringType),
      in("group_by", StringType), // comma-separated key columns
      in("aggs", StringType), // 'out:fn:expr;...' fn ∈ count|sum|min|max
      inDefault("where", StringType, "''"), // optional defining predicate
      inDefault("join_namespace", StringType, "''"), // optional 2nd source
      inDefault("join_table", StringType, "''"),
      inDefault("join_on", StringType, "''"), // 'leftcol=rightcol,...'
      inDefault("key_exprs", StringType, "''"), // 'name:expr;...'
      inDefault("join_type", StringType, "'inner'"), // inner | left
      // 3rd+ sources of a star-schema view: 'ns|table|l=r,...;...'
      inDefault("extra_joins", StringType, "''"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val joinNs = Option(input.getString(7)).map(_.trim).filter(_.nonEmpty)
      val r = graft.maintain.MaterializedViews.create(
        org.apache.spark.sql.SparkSession.active, cat,
        input.getString(0), input.getString(1),
        input.getString(2), input.getString(3),
        input.getString(4).split(',').toSeq.map(_.trim).filter(_.nonEmpty),
        graft.maintain.MaterializedViews.parseAggs(input.getString(5)),
        Option(input.getString(6)).map(_.trim).filter(_.nonEmpty),
        joinNs.map(jns => graft.maintain.MaterializedViews.JoinSpec(
          jns, input.getString(8),
          graft.maintain.MaterializedViews.parseJoinOn(input.getString(9)),
          Option(input.getString(11)).map(_.trim).filter(_.nonEmpty)
            .getOrElse("inner"))),
        graft.maintain.MaterializedViews.parseKeyExprs(input.getString(10)),
        Option(input.getString(12)).map(_.trim).filter(_.nonEmpty)
          .map(graft.maintain.MaterializedViews.parseJoinsExtra)
          .getOrElse(Seq.empty))
      result(
        StructType(Seq(StructField("mode", StringType, false),
          StructField("mv_rows", LongType, false))),
        Seq(InternalRow(UTF8String.fromString(r.mode), r.mvRows)))
    }
  }

  private case class RefreshMaterializedView(cat: GraftCatalog)
      extends GraftProcedure("refresh_materialized_view") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("name", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val r = graft.maintain.MaterializedViews.refresh(
        org.apache.spark.sql.SparkSession.active, cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)))
      result(
        StructType(Seq(StructField("mode", StringType, false),
          StructField("mv_rows", LongType, false))),
        Seq(InternalRow(UTF8String.fromString(r.mode), r.mvRows)))
    }
  }

  private case class DropMaterializedView(cat: GraftCatalog)
      extends GraftProcedure("drop_materialized_view") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("name", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val dropped = graft.maintain.MaterializedViews.drop(
        org.apache.spark.sql.SparkSession.active, cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)))
      result(
        StructType(Seq(StructField("dropped", BooleanType, false))),
        Seq(InternalRow(dropped)))
    }
  }

  private case class RewritePositionDeletes(cat: GraftCatalog)
      extends GraftProcedure("rewrite_position_deletes") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      inDefault("target_objects", IntegerType, "1"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val r = Maintenance.rewritePositionDeletes(
        org.apache.spark.sql.SparkSession.active, cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)),
        targetObjects = input.getInt(2))
      result(
        StructType(Seq(
          StructField("objects_before", IntegerType, false),
          StructField("objects_after", IntegerType, false),
          StructField("rows_before", LongType, false),
          StructField("rows_after", LongType, false))),
        Seq(InternalRow(r.objectsBefore, r.objectsAfter,
          r.rowsBefore, r.rowsAfter)))
    }
  }

  private case class ExpireSnapshots(cat: GraftCatalog)
      extends GraftProcedure("expire_snapshots") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      in("keep_last", IntegerType),
      // epoch millis; -1 = no age policy (keep_last is then the rule,
      // otherwise the floor under the age policy)
      inDefault("older_than", LongType, "-1"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val n = Maintenance.expireSnapshots(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)),
        keepLast = input.getInt(2), olderThanMillis = input.getLong(3))
      result(
        StructType(Seq(StructField("expired_snapshots", IntegerType, false))),
        Seq(InternalRow(n)))
    }
  }

  private case class RemoveOrphanFiles(cat: GraftCatalog)
      extends GraftProcedure("remove_orphan_files") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      inDefault("dry_run", BooleanType, "false"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val removed = Maintenance.removeOrphanFiles(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)),
        dryRun = input.getBoolean(2))
      result(
        StructType(Seq(StructField("path", StringType, false))),
        removed.map(p => InternalRow(UTF8String.fromString(p))))
    }
  }

  private case class ExpireCatalogVersions(cat: GraftCatalog)
      extends GraftProcedure("expire_catalog_versions") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("keep_last", IntegerType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val n = Maintenance.expireCatalogVersions(cat, input.getInt(0))
      result(
        StructType(Seq(StructField("expired_versions", IntegerType, false))),
        Seq(InternalRow(n)))
    }
  }

  private case class RollbackCatalog(cat: GraftCatalog)
      extends GraftProcedure("rollback_catalog") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("version", LongType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val target = input.getLong(0)
      val root = graft.catalog.Graft.rollbackTo(cat.storage, target)
      try result(
        StructType(Seq(StructField("new_version", LongType, false),
          StructField("restored_version", LongType, false))),
        Seq(InternalRow(root.version, target)))
      finally root.close()
    }
  }

  private case class RollbackToSnapshot(cat: GraftCatalog)
      extends GraftProcedure("rollback_to_snapshot") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      in("snapshot_id", LongType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val restored = Maintenance.rollbackToSnapshot(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)),
        input.getLong(2))
      result(
        StructType(Seq(StructField("restored_snapshot_id", LongType, false))),
        Seq(InternalRow(restored)))
    }
  }

  private case class CherryPickSnapshot(cat: GraftCatalog)
      extends GraftProcedure("cherrypick_snapshot") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      in("snapshot_id", LongType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val picked = Maintenance.cherryPickSnapshot(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)),
        input.getLong(2))
      result(
        StructType(Seq(StructField("picked_snapshot_id", LongType, false))),
        Seq(InternalRow(picked)))
    }
  }

  private case class SnapshotTable(cat: GraftCatalog)
      extends GraftProcedure("snapshot_table") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("source_namespace", StringType), in("source_table", StringType),
      in("dest_namespace", StringType), in("dest_table", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val files = Maintenance.snapshotTable(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)),
        Identifier.of(Array(input.getString(2)), input.getString(3)))
      result(
        StructType(Seq(StructField("files_referenced", LongType, false))),
        Seq(InternalRow(files)))
    }
  }

  private case class RewriteManifests(cat: GraftCatalog)
      extends GraftProcedure("rewrite_manifests") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      inDefault("chunk", LongType,
        graft.format.Manifests.MergeChunk.toString))
    override def call(input: InternalRow): JIterator[Scan] = {
      val segments = Maintenance.rewriteManifests(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)),
        input.getLong(2).toInt)
      result(
        StructType(Seq(StructField("segments", LongType, false))),
        Seq(InternalRow(segments)))
    }
  }

  /** Whole-catalog snapshot export (docs/format.md:284-326): replicate
    * catalog version `version` into `dest` as a standalone catalog at
    * v0. `copy_data => false` is a minimal export (metadata tree only
    * — source retention must keep the shared files). A non-empty
    * `name` records the export in the source catalog definition, and
    * `VERSION AS OF '<name>'` then pins tables at the exported root.
    */
  private case class ExportCatalog(cat: GraftCatalog)
      extends GraftProcedure("export_catalog") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("version", LongType), in("dest", StringType),
      inDefault("copy_data", BooleanType, "true"),
      inDefault("name", StringType, "''"))
    override def call(input: InternalRow): JIterator[Scan] = {
      val dest = new graft.storage.LocalStorageOps(input.getString(1))
      val nm = input.getString(3).trim
      val copied = Maintenance.exportSnapshot(cat, input.getLong(0), dest,
        copyData = input.getBoolean(2),
        name = if (nm.isEmpty) None else Some(nm))
      result(
        StructType(Seq(StructField("files_copied", IntegerType, false))),
        Seq(InternalRow(copied)))
    }
  }

  private case class ExportIceberg(cat: GraftCatalog)
      extends GraftProcedure("export_iceberg") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val loc = Maintenance.exportIceberg(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)))
      result(
        StructType(Seq(
          StructField("metadata_location", StringType, false))),
        Seq(InternalRow(UTF8String.fromString(loc))))
    }
  }

  private case class RegisterTable(cat: GraftCatalog)
      extends GraftProcedure("register_table") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      in("metadata_location", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val snaps = Maintenance.registerTable(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)),
        input.getString(2))
      result(
        StructType(Seq(StructField("snapshots", LongType, false))),
        Seq(InternalRow(snaps)))
    }
  }

  private case class CreateTag(cat: GraftCatalog)
      extends GraftProcedure("create_tag") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      in("tag", StringType),
      inDefault("snapshot_id", LongType, "-1")) // -1 = current snapshot
    override def call(input: InternalRow): JIterator[Scan] = {
      val tag = input.getString(2)
      val sid = Maintenance.createTag(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)),
        tag, input.getLong(3))
      result(
        StructType(Seq(StructField("tag", StringType, false),
          StructField("snapshot_id", LongType, false))),
        Seq(InternalRow(UTF8String.fromString(tag), sid)))
    }
  }

  private case class CreateBranch(cat: GraftCatalog)
      extends GraftProcedure("create_branch") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      in("branch", StringType),
      inDefault("snapshot_id", LongType, "-1")) // -1 = current snapshot
    override def call(input: InternalRow): JIterator[Scan] = {
      val branch = input.getString(2)
      val head = Maintenance.createBranch(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)),
        branch, input.getLong(3))
      result(
        StructType(Seq(StructField("branch", StringType, false),
          StructField("head_snapshot_id", LongType, false))),
        Seq(InternalRow(UTF8String.fromString(branch), head)))
    }
  }

  private case class DropBranch(cat: GraftCatalog)
      extends GraftProcedure("drop_branch") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      in("branch", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val branch = input.getString(2)
      val head = Maintenance.dropBranch(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)), branch)
      result(
        StructType(Seq(StructField("branch", StringType, false),
          StructField("head_snapshot_id", LongType, false))),
        Seq(InternalRow(UTF8String.fromString(branch), head)))
    }
  }

  private case class FastForward(cat: GraftCatalog)
      extends GraftProcedure("fast_forward") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      in("branch", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val branch = input.getString(2)
      val (prev, head) = Maintenance.fastForward(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)), branch)
      result(
        StructType(Seq(StructField("previous_snapshot_id", LongType, false),
          StructField("current_snapshot_id", LongType, false))),
        Seq(InternalRow(prev, head)))
    }
  }

  private case class DropTag(cat: GraftCatalog)
      extends GraftProcedure("drop_tag") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      in("tag", StringType))
    override def call(input: InternalRow): JIterator[Scan] = {
      val tag = input.getString(2)
      val sid = Maintenance.dropTag(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)), tag)
      result(
        StructType(Seq(StructField("tag", StringType, false),
          StructField("snapshot_id", LongType, false))),
        Seq(InternalRow(UTF8String.fromString(tag), sid)))
    }
  }

  private case class ImportFiles(cat: GraftCatalog)
      extends GraftProcedure("import_files") {
    override def parameters(): Array[ProcedureParameter] = Array(
      in("namespace", StringType), in("table", StringType),
      in("paths", ArrayType(StringType)))
    override def call(input: InternalRow): JIterator[Scan] = {
      val arr = input.getArray(2)
      val paths = (0 until arr.numElements()).map(i =>
        arr.getUTF8String(i).toString)
      val n = Maintenance.importFiles(cat,
        Identifier.of(Array(input.getString(0)), input.getString(1)), paths)
      result(
        StructType(Seq(StructField("imported_files", IntegerType, false))),
        Seq(InternalRow(n)))
    }
  }
}
