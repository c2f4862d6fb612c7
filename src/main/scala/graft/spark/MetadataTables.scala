package graft.spark

import java.util.{Set => JSet}
import scala.jdk.CollectionConverters._

import graft.format.TableMetadata
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Inspection tables resolved as `<table>$snapshots` / `<table>$files`
  * (reference: Iceberg metadata tables surfaced through
  * OlympiaIcebergCatalog.java:360-367). Served as [[LocalScan]]s —
  * catalog metadata is driver-resident by construction, so shipping it
  * through executors would only add overhead.
  */
object MetadataTables {
  val Suffixes: Seq[String] =
    Seq("$snapshots", "$history", "$files", "$partitions", "$manifests", "$refs",
      "$deletes", "$stats")

  def forSuffix(baseName: String, suffix: String, meta: TableMetadata,
      partCols: Seq[String], storage: graft.storage.StorageOps): Table =
    suffix match {
      case "$snapshots" => new SnapshotsTable(baseName, meta, storage)
      case "$history" => new HistoryTable(baseName, meta, storage)
      case "$files" => new FilesTable(baseName, meta, storage)
      case "$partitions" => new PartitionsTable(baseName, meta, partCols, storage)
      case "$manifests" => new ManifestsTable(baseName, meta, storage)
      case "$refs" => new RefsTable(baseName, meta)
      case "$deletes" => new DeletesTable(baseName, meta)
      case "$stats" => new StatsTable(baseName, meta)
    }

  /** One row of `<table>$views` — a materialized view derived from
    * the base table, with its definition and freshness.
    */
  final case class ViewRow(ns: String, name: String, source: String,
      joinSource: Option[String], joinType: Option[String],
      groupBy: String, keyExprs: Option[String], aggs: String,
      where: Option[String], refreshedSnapshot: Long,
      refreshedSnapshot2: Option[Long], fresh: Boolean,
      stateMode: String, pendingDeletes: Long,
      refreshAgeSeconds: Option[Long])

  /** `<table>$views` — the materialized views derived from this table
    * (its `graft.mv.derived` registry, stale entries skipped), each
    * with its definition and whether its watermark(s) cover every
    * source's CURRENT snapshot — the freshness the transparent
    * rewrite checks.
    */
  def viewsTable(baseName: String, rows0: Seq[ViewRow]): Table =
    new LocalMetadataTable(s"$baseName$$views") {
      override def schema(): StructType = StructType(Seq(
        StructField("view_namespace", StringType, nullable = false),
        StructField("view_name", StringType, nullable = false),
        StructField("source", StringType, nullable = false),
        StructField("join_source", StringType, nullable = true),
        StructField("join_type", StringType, nullable = true),
        StructField("group_by", StringType, nullable = false),
        StructField("key_exprs", StringType, nullable = true),
        StructField("aggs", StringType, nullable = false),
        StructField("where", StringType, nullable = true),
        StructField("refreshed_snapshot", LongType, nullable = false),
        StructField("refreshed_snapshot2", LongType, nullable = true),
        StructField("fresh", BooleanType, nullable = false),
        // how refreshes WRITE the state: 'eq-delta' commits the
        // touched groups' keys + rows (O(delta)); 'copy-on-write'
        // rewrites touched state files (nullable/non-key-typed group
        // columns). pending_deletes = delete objects a reader merges
        // (folded by auto-compaction past the threshold).
        StructField("state_mode", StringType, nullable = false),
        StructField("pending_deletes", LongType, nullable = false),
        // seconds since the last refresh COMMIT (any mode) — the
        // operator's one-glance view of hook/scheduler lag; NULL for
        // views created before the stamp existed
        StructField("refresh_age_seconds", LongType, nullable = true)))

      override def rows: Seq[InternalRow] = rows0.map { v =>
        InternalRow(UTF8String.fromString(v.ns),
          UTF8String.fromString(v.name), UTF8String.fromString(v.source),
          v.joinSource.map(UTF8String.fromString).orNull,
          v.joinType.map(UTF8String.fromString).orNull,
          UTF8String.fromString(v.groupBy),
          v.keyExprs.map(UTF8String.fromString).orNull,
          UTF8String.fromString(v.aggs),
          v.where.map(UTF8String.fromString).orNull,
          v.refreshedSnapshot,
          v.refreshedSnapshot2.map(Long.box).orNull, v.fresh,
          UTF8String.fromString(v.stateMode), v.pendingDeletes,
          v.refreshAgeSeconds.map(Long.box).orNull)
      }
    }

  /** `<catalog>.sys.objects` — every object in the catalog at its
    * latest version, from one streaming tree traversal. (For a
    * billion-object catalog the scale path reads the Arrow node files
    * distributed; the schema stays the same.)
    */
  def objectsTable(catalogName: String, version: Long,
      objectRows: Seq[(String, String, String, String)]): Table =
    new LocalMetadataTable(s"$catalogName.sys.objects") {
      override def schema(): StructType = StructType(Seq(
        StructField("kind", StringType, nullable = false),
        StructField("namespace", StringType, nullable = false),
        StructField("name", StringType, nullable = false),
        StructField("def_path", StringType, nullable = false),
        StructField("catalog_version", LongType, nullable = false)))

      override def rows: Seq[InternalRow] =
        objectRows.map { case (kind, ns, name, path) =>
          InternalRow(UTF8String.fromString(kind), UTF8String.fromString(ns),
            UTF8String.fromString(name), UTF8String.fromString(path), version)
        }
    }
}

private abstract class LocalMetadataTable(tableName: String) extends Table
    with SupportsRead {
  def rows: Seq[InternalRow]
  override def name(): String = tableName
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new LocalScan {
      override def readSchema(): StructType = schema()
      override def rows(): Array[InternalRow] = LocalMetadataTable.this.rows.toArray
    }
}

private class SnapshotsTable(baseName: String, meta: TableMetadata,
    storage: graft.storage.StorageOps)
    extends LocalMetadataTable(s"$baseName$$snapshots") {
  override def schema(): StructType = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = false),
    StructField("parent_id", LongType, nullable = true),
    StructField("committed_at_millis", LongType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("is_current", BooleanType, nullable = false)))

  // history listing resolves spilled snapshot-log segments (bounded
  // by expiration), but summary totals, NOT manifests: listing a
  // million-file table's history never opens an inventory
  override def rows: Seq[InternalRow] = meta.allSnapshots(storage).map { s =>
    InternalRow(s.id, if (s.parentId >= 0) Long.box(s.parentId) else null,
      s.timestampMillis, UTF8String.fromString(s.operation), s.totalFiles.toInt,
      s.id == meta.currentSnapshotId)
  }
}

/** `<table>$history` — the main lineage: when each snapshot became
  * current and whether it is an ancestor of the CURRENT state. A
  * rollback makes the rolled-over snapshots non-ancestors (their rows
  * stay — the history is linear and append-only); branch-only commits
  * are non-ancestors until fast-forwarded.
  */
private class HistoryTable(baseName: String, meta: TableMetadata,
    storage: graft.storage.StorageOps)
    extends LocalMetadataTable(s"$baseName$$history") {
  override def schema(): StructType = StructType(Seq(
    StructField("made_current_at_millis", LongType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false),
    StructField("parent_id", LongType, nullable = true),
    StructField("is_current_ancestor", BooleanType, nullable = false)))

  override def rows: Seq[InternalRow] = {
    val all = meta.allSnapshots(storage)
    val byId = all.map(s => s.id -> s).toMap
    val ancestors = Iterator.iterate(meta.currentSnapshotId)(id =>
        byId.get(id).map(_.parentId).getOrElse(-1L))
      .takeWhile(_ >= 0).toSet
    all.map { s =>
      InternalRow(s.timestampMillis, s.id,
        if (s.parentId >= 0) Long.box(s.parentId) else null,
        ancestors.contains(s.id))
    }
  }
}

private class FilesTable(baseName: String, meta: TableMetadata,
    storage: graft.storage.StorageOps)
    extends LocalMetadataTable(s"$baseName$$files") {
  override def schema(): StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false)))

  override def rows: Seq[InternalRow] =
    meta.currentSnapshot.toSeq.flatMap(s =>
      graft.format.Manifests.filesOf(storage, s).map(f =>
        InternalRow(UTF8String.fromString(f.path), f.sizeBytes, s.id)))
}

/** `<table>$manifests` — the current snapshot's inventory segments:
  * the inline entry block (key `<inline>`) plus one row per manifest
  * object, with per-segment file/row/byte counts — the view an
  * operator uses to see segment reuse and decide compaction.
  */
private class ManifestsTable(baseName: String, meta: TableMetadata,
    storage: graft.storage.StorageOps)
    extends LocalMetadataTable(s"$baseName$$manifests") {
  override def schema(): StructType = StructType(Seq(
    StructField("manifest", StringType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false)))

  override def rows: Seq[InternalRow] =
    meta.currentSnapshot.toSeq.flatMap { s =>
      val inline =
        if (s.files.isEmpty) Seq.empty
        else Seq(InternalRow(UTF8String.fromString("<inline>"),
          s.files.size, s.files.map(_.rowCount).sum,
          s.files.map(_.sizeBytes).sum))
      inline ++ s.manifests.map { key =>
        val fs = graft.format.Manifests.read(storage, key)
        InternalRow(UTF8String.fromString(key), fs.size,
          fs.map(_.rowCount).sum, fs.map(_.sizeBytes).sum)
      }
    }
}

/** `<table>$refs` — named snapshot refs (tags): the operator view of
  * what `VERSION AS OF '<name>'` resolves to.
  */
private class RefsTable(baseName: String, meta: TableMetadata)
    extends LocalMetadataTable(s"$baseName$$refs") {
  override def schema(): StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false),
    StructField("type", StringType, nullable = false)))

  override def rows: Seq[InternalRow] =
    (meta.refs.toSeq.map { case (name, sid) => (name, sid, "tag") } ++
      meta.branches.toSeq.map { case (name, sid) => (name, sid, "branch") })
      .sortBy(r => (r._3, r._1)).map { case (name, sid, kind) =>
        InternalRow(UTF8String.fromString(name), sid,
          UTF8String.fromString(kind))
      }
}

/** `<table>$deletes` — merge-on-read deletes pending at the current
  * snapshot: predicate deletes (one row each, `detail` = the SQL) and
  * position-delete objects (`detail` = the object path, with row count
  * and how many data files it references) — the operator view that
  * says "this table is carrying N deltas; compact it".
  */
private class DeletesTable(baseName: String, meta: TableMetadata)
    extends LocalMetadataTable(s"$baseName$$deletes") {
  override def schema(): StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("detail", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("n_data_files", LongType, nullable = false)))

  override def rows: Seq[InternalRow] =
    meta.currentSnapshot.toSeq.flatMap { s =>
      s.deletes.map(p =>
        InternalRow(UTF8String.fromString("predicate"),
          UTF8String.fromString(p.sql), p.seq, -1L, -1L)) ++
        s.posDeletes.map(p =>
          InternalRow(UTF8String.fromString("position"),
            UTF8String.fromString(p.path), p.seq, p.rowCount,
            p.dataFiles.size.toLong)) ++
        // streaming-upsert equality deletes: detail = object path with
        // its key columns; applies to every file with seq < this seq
        s.eqDeletes.map(p =>
          InternalRow(UTF8String.fromString("equality"),
            UTF8String.fromString(s"${p.path} (${p.cols.mkString(",")})"),
            p.seq, p.rowCount, -1L))
    }
}

/** `<table>$stats` — ANALYZE's per-column statistics as recorded in
  * the table's statistics file: NDV, stat-string bounds (dates as
  * epoch days, timestamps as epoch micros — the file-stats encoding),
  * null count, string widths, and the equi-depth histogram's bin
  * count. `covers_current` says whether the CURRENT snapshot is the
  * one analyzed — false means "stale: re-run ANALYZE" (the scan
  * already refuses to serve stale stats to the CBO).
  */
private class StatsTable(baseName: String, meta: TableMetadata)
    extends LocalMetadataTable(s"$baseName$$stats") {
  override def schema(): StructType = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("ndv", LongType, nullable = false),
    StructField("min", StringType, nullable = true),
    StructField("max", StringType, nullable = true),
    StructField("null_count", LongType, nullable = true),
    StructField("avg_len", LongType, nullable = true),
    StructField("max_len", LongType, nullable = true),
    StructField("histogram_bins", IntegerType, nullable = false),
    StructField("snapshot_id", LongType, nullable = false),
    StructField("covers_current", BooleanType, nullable = false)))

  override def rows: Seq[InternalRow] =
    meta.stats.toSeq.flatMap { st =>
      st.blobs.filter(_.column.nonEmpty).sortBy(_.column).map { b =>
        InternalRow(UTF8String.fromString(b.column), b.ndv,
          b.min.map(UTF8String.fromString).orNull,
          b.max.map(UTF8String.fromString).orNull,
          if (b.nullCount >= 0) Long.box(b.nullCount) else null,
          if (b.avgLen >= 0) Long.box(b.avgLen) else null,
          if (b.maxLen >= 0) Long.box(b.maxLen) else null,
          b.histNdv.size, st.snapshotId,
          st.snapshotId == meta.currentSnapshotId)
      }
    }
}

/** `<table>$partitions` — per-partition file/row/byte counts from the
  * snapshot's file entries (a partition value is recorded as the
  * column's min==max on every file in that partition). Empty-string
  * partition key for non-partitioned tables.
  */
private class PartitionsTable(baseName: String, meta: TableMetadata,
    partCols: Seq[String], storage: graft.storage.StorageOps)
    extends LocalMetadataTable(s"$baseName$$partitions") {
  override def schema(): StructType = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false)))

  override def rows: Seq[InternalRow] = {
    meta.currentFiles(storage)
      .groupBy(f => partCols
        .map(c => s"$c=${f.minValues.getOrElse(c, "null")}").mkString("/"))
      .toSeq.sortBy(_._1)
      .map { case (part, fs) =>
        InternalRow(UTF8String.fromString(part), fs.size,
          fs.map(_.rowCount).sum, fs.map(_.sizeBytes).sum)
      }
  }
}
