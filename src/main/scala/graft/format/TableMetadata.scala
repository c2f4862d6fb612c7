package graft.format

import graft.objects.Json
import graft.storage.StorageOps

/** One parquet data file with enough stats for planning (row count for
  * metrics, per-file size for split planning; per-column min/max would
  * slot in here for file-level pruning — at 100 TB the snapshot's flat
  * file list becomes a manifest tree, but the schema stays the same).
  */
final case class DataFileEntry(
    path: String,
    rowCount: Long,
    sizeBytes: Long,
    minValues: Map[String, String] = Map.empty,
    maxValues: Map[String, String] = Map.empty)

/** An immutable table version: full file list + provenance. Replaces
  * the reference's `iceberg_metadata_location` indirection
  * (proto/objects.proto:58-69) with graft's own snapshot log.
  */
final case class Snapshot(
    id: Long,
    parentId: Long = -1L, // -1 = none (plain Long: Option[Long] erases
    //                       to Integer under Jackson's scala module)
    timestampMillis: Long,
    operation: String, // append | overwrite | delete | compact
    files: Seq[DataFileEntry])

/** Table metadata document, stored at TableDef.metadataLocation; every
  * commit writes a new document (copy-on-write, like Iceberg metadata
  * JSON) so concurrent readers never see a torn table state.
  */
final case class TableMetadata(
    schemaJson: String,
    currentSnapshotId: Long,
    snapshots: Seq[Snapshot],
    properties: Map[String, String] = Map.empty) {

  def currentSnapshot: Option[Snapshot] = snapshots.find(_.id == currentSnapshotId)

  def currentFiles: Seq[DataFileEntry] =
    currentSnapshot.map(_.files).getOrElse(Seq.empty)

  def withSnapshot(op: String, files: Seq[DataFileEntry]): TableMetadata = {
    val id = currentSnapshotId + 1
    copy(
      currentSnapshotId = id,
      snapshots = snapshots :+ Snapshot(
        id, currentSnapshotId, System.currentTimeMillis(), op, files))
  }
}

object TableMetadata {
  def empty(schemaJson: String): TableMetadata =
    TableMetadata(schemaJson, -1L, Seq.empty)

  def read(storage: StorageOps, rel: String): TableMetadata =
    Json.read(storage.read(rel), classOf[TableMetadata])

  def write(storage: StorageOps, rel: String, meta: TableMetadata): Unit =
    storage.writeAtomic(rel, Json.write(meta))
}

/** Per-column value ranges of a committed file set, serialized into
  * write actions' args ("rng.<col>" → "lo|hi"). Numeric columns only,
  * and only when EVERY file carries stats for the column — a file
  * without stats could hold any value, so its column must not claim a
  * range. The SERIALIZABLE conflict analyzer intersects these with a
  * reader's predicate intervals to prove append/read disjointness.
  */
object StatsRanges {
  def args(files: Seq[DataFileEntry]): Map[String, String] = {
    if (files.isEmpty) return Map.empty
    val cols = files.head.minValues.keySet
      .filter(c => files.forall(f =>
        f.minValues.contains(c) && f.maxValues.contains(c)))
    cols.flatMap { c =>
      val mins = files.map(f => parseNum(f.minValues(c)))
      val maxs = files.map(f => parseNum(f.maxValues(c)))
      if (mins.forall(_.isDefined) && maxs.forall(_.isDefined))
        Some(s"rng.$c" -> s"${mins.flatten.min}|${maxs.flatten.max}")
      else None
    }.toMap
  }

  private def parseNum(s: String): Option[Double] =
    try Some(s.toDouble) catch { case _: NumberFormatException => None }
}
