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
