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
    maxValues: Map[String, String] = Map.empty,
    // per-column null counts (absent = unknown): IS [NOT] NULL file
    // pruning and metadata-answered COUNT(col). Long erases under
    // Jackson's scala module (same as TableMetadata.refs) — pin it
    @com.fasterxml.jackson.databind.annotation.JsonDeserialize(
      contentAs = classOf[java.lang.Long])
    nullCounts: Map[String, Long] = Map.empty,
    // data sequence number: the commit sequence that ADDED this file.
    // A merge-on-read delete predicate applies only to files with
    // seq <= the predicate's seq — rows appended after the delete are
    // never retro-deleted. Pre-feature entries default to 0 (every
    // predicate applies — they existed first).
    seq: Long = 0L,
    // storage key of the file's bloom SIDECAR object ([[FileBloom]]),
    // present only when the table declares graft.file-bloom.columns;
    // point-lookup scans probe it to drop files min/max can't
    bloomPath: Option[String] = None)

/** An immutable table version: file inventory + provenance. Replaces
  * the reference's `iceberg_metadata_location` indirection
  * (proto/objects.proto:58-69) with graft's own snapshot log.
  *
  * The inventory lives in TWO places: `files` (inline entries — small
  * tables and legacy documents) and `manifests` (keys of immutable
  * manifest objects, each a [[ManifestDoc]] of entries). Past the
  * inline threshold, commits write only a DELTA manifest and REUSE the
  * parent's segments — at 100 TB an append touches one small object
  * instead of rewriting a 10⁵-entry list, and the metadata document
  * stays a few KB no matter how many files or snapshots exist.
  * Summary totals are carried so listings never resolve manifests.
  */
/** Pointer to a written [[Puffin]] statistics file + the summary an
  * Iceberg `statistics` metadata entry needs (blob inventory with NDV
  * properties), so serving never re-opens the puffin bytes.
  */
final case class StatsFileRef(
    path: String,
    snapshotId: Long,
    fileSizeInBytes: Long,
    footerSizeInBytes: Long,
    blobs: Seq[StatsBlobRef] = Seq.empty,
    // ANALYZE-time LOGICAL row count (delete-applied, unlike
    // Snapshot.totalRows which counts raw data-file rows): incremental
    // ANALYZE weights avgLen and sizes histogram heights from it so a
    // carried-over merge-on-read delete set cannot skew them. -1 =
    // legacy ref (predates the field) → incremental falls back to full.
    logicalRows: Long = -1L)

final case class StatsBlobRef(
    blobType: String,
    fields: Seq[Int],
    sequenceNumber: Long,
    ndv: Long,
    // PHYSICAL column name (rename-safe, like data-file stats) —
    // native scans map it back to the logical name when reporting
    // NDVs to Spark's optimizer
    column: String = "",
    // ANALYZE-time logical-table bounds + null count, stat-string
    // encoded like [[DataFileEntry]] (numeric text; dates as epoch
    // days, timestamps as epoch micros). Absent on legacy refs and on
    // non-orderable columns; nullCount -1 = unknown (Option[Long]
    // erases under Jackson, same as Snapshot.parentId).
    min: Option[String] = None,
    max: Option[String] = None,
    nullCount: Long = -1L,
    // equi-depth histogram over non-null values (numeric columns):
    // bins+1 boundaries (global min first, then each bin's inclusive
    // upper bound) and a per-bin distinct-count estimate. Height =
    // nonNullRows / bins is carried explicitly so readers never need
    // the ANALYZE-time row count.
    histBounds: Seq[String] = Seq.empty,
    @com.fasterxml.jackson.databind.annotation.JsonDeserialize(
      contentAs = classOf[java.lang.Long])
    histNdv: Seq[Long] = Seq.empty,
    histHeight: Double = 0.0,
    // value widths of variable-length columns (-1 = n/a): CBO row-size
    // estimates on string-heavy tables
    avgLen: Long = -1L,
    maxLen: Long = -1L)

final case class Snapshot(
    id: Long,
    parentId: Long = -1L, // -1 = none (plain Long: Option[Long] erases
    //                       to Integer under Jackson's scala module)
    timestampMillis: Long,
    operation: String, // append | overwrite | delete | compact
    files: Seq[DataFileEntry],
    manifests: Seq[String] = Seq.empty,
    fileCount: Long = -1L, // -1 = legacy doc: totals derive from files
    rowCount: Long = -1L,
    sizeBytes: Long = -1L,
    // commit sequence number (monotone; survives snapshot expiration,
    // unlike ids only insofar as both grow — kept separate so delete
    // predicates bind to a stable ordering)
    seq: Long = 0L,
    // merge-on-read: the FULL list of delete predicates still pending
    // at this snapshot. Reads apply each predicate (as NOT-TRUE) to
    // files with entry.seq <= predicate.seq; a rewrite re-sequences the
    // rows it carries, and an overwrite/compaction clears the list.
    deletes: Seq[DeletePredicate] = Seq.empty,
    // merge-on-read row-level deltas: position-delete objects still
    // pending at this snapshot (see [[PosDeleteFile]]). A rewrite of
    // the covered data files prunes entries whose references are gone;
    // an overwrite clears the list.
    posDeletes: Seq[PosDeleteFile] = Seq.empty,
    // streaming-upsert equality deletes still pending at this snapshot
    // (see [[EqDeleteFile]]): each applies to data files with
    // entry.seq < its seq. An overwrite or whole-table rewrite clears
    // the list (the rewrite read applied them).
    eqDeletes: Seq[EqDeleteFile] = Seq.empty,
    // operation == "delete" (copy-on-write) only: the COMPLETE delete
    // predicate (physical column names), when the whole conjunct set
    // translated. Lets the change feed reconstruct the deleted rows as
    // ONE filtered scan of the replaced files instead of diffing the
    // replaced and rewritten row sets ("" = unknown: legacy snapshot
    // or untranslatable predicate — diff instead).
    deleteSql: String = "") {

  def totalFiles: Long = if (fileCount >= 0) fileCount else files.size.toLong
  def totalRows: Long = if (fileCount >= 0) rowCount else files.map(_.rowCount).sum
  def totalBytes: Long =
    if (fileCount >= 0) sizeBytes else files.map(_.sizeBytes).sum
}

/** One pending merge-on-read delete: rows where `sql` (PHYSICAL column
  * names — stable across renames) evaluates TRUE are logically deleted
  * from every data file whose entry.seq <= this.seq. Committed by a
  * mor-mode DELETE as pure metadata; materialized (and removed) by the
  * next rewrite of the covered files.
  */
final case class DeletePredicate(seq: Long, sql: String)

/** One position-delete file (merge-on-read UPDATE/MERGE): a parquet
  * object of `(file STRING, pos BIGINT)` rows naming exact rows of
  * exact data files as logically deleted. Unlike [[DeletePredicate]],
  * scoping is by PATH, not sequence — a rewritten file gets a new path,
  * so stale references simply never match. `dataFiles` indexes which
  * data files the object references (storage-relative, matching
  * [[DataFileEntry.path]]) so scans attach only the relevant delete
  * objects to each file's read and [[FilesEdit]] replays can prune
  * fully-covered entries. At 100 TB a 10-row UPDATE commits a few-KB
  * delete object instead of rewriting gigabyte data files.
  */
final case class PosDeleteFile(
    path: String,
    rowCount: Long,
    sizeBytes: Long,
    dataFiles: Seq[String],
    seq: Long = 0L,
    // true once a rewrite pruned SOME of this entry's references: the
    // object's parquet still holds rows naming the rewritten (dead)
    // paths, so `rowCount` (the object's total rows) now overcounts
    // the entry's LIVE deleted rows. Scans are unaffected (stale paths
    // never match); metadata-only COUNT(*) must not subtract an
    // overcount, so it falls back to a scan for pruned entries.
    refsPruned: Boolean = false)

/** One equality-delete object (streaming upsert): a parquet object of
  * the upsert batch's DISTINCT key tuples under the physical key
  * column names in `cols`. Applies by SEQUENCE, strictly: rows of any
  * data file with `entry.seq < seq` whose key tuple matches are
  * logically deleted — the batch that carried the object never deletes
  * its own rows, and files appended later are out of scope by
  * construction. At 100 TB a streaming upsert epoch commits one
  * small key object instead of joining against the table.
  */
final case class EqDeleteFile(
    path: String,
    rowCount: Long,
    sizeBytes: Long,
    cols: Seq[String],
    seq: Long = 0L)

/** One manifest segment: a plain entry list (JSON object for format
  * headroom). Segments are immutable and content-addressed by UUID
  * key, so snapshots share them freely.
  */
final case class ManifestDoc(files: Seq[DataFileEntry])

/** Driver-cheap pointer to one spilled snapshot-log segment: id and
  * timestamp bounds let version/time lookups open exactly one segment
  * instead of the whole history.
  */
final case class SnapshotLogRef(
    key: String,
    firstId: Long,
    lastId: Long,
    firstTs: Long,
    lastTs: Long,
    count: Long)

/** One spilled snapshot-log segment: a contiguous, ordered run of
  * snapshots older than the metadata document's inline window.
  */
final case class SnapshotLogDoc(snapshots: Seq[Snapshot])

/** How a commit changes the file inventory — the edit, not the result
  * list, so the manifest layer can reuse untouched segments.
  */
sealed trait FilesEdit
final case class AppendFiles(add: Seq[DataFileEntry]) extends FilesEdit
final case class OverwriteFiles(all: Seq[DataFileEntry]) extends FilesEdit
final case class ReplaceFiles(remove: Set[String], add: Seq[DataFileEntry],
    // complete-predicate copy-on-write DELETE only: the predicate SQL
    // (physical names) whose TRUE rows this rewrite removed — recorded
    // on the snapshot for the change feed ("" = not a predicate delete)
    deleteSql: String = "")
  extends FilesEdit
/** Merge-on-read DELETE: inventory untouched, one predicate added.
  * `atSeq` is the commit sequence the delete OBSERVED — on a lost
  * commit race the edit replays on the winner's tree, and binding the
  * predicate to the observed sequence keeps the racing append's files
  * out of its scope (the same outcome a copy-on-write delete's replay
  * gives: files it never scanned survive). -1 = stamp with the commit's
  * own sequence.
  */
final case class AddDeletePredicate(sql: String, atSeq: Long = -1L)
  extends FilesEdit
/** Merge-on-read UPDATE/MERGE (a position delta): new data files join
  * the inventory, position-delete objects join the pending list, and
  * every existing data file stays exactly where it is. The commit
  * VALIDATES that each referenced data file is still present — a
  * concurrent compaction/overwrite that rewrote a referenced file
  * invalidates the positions, so the replay must fail loudly rather
  * than silently dropping the delete.
  */
final case class AddRowDeltas(add: Seq[DataFileEntry],
    posDeletes: Seq[PosDeleteFile]) extends FilesEdit
/** Streaming UPSERT epoch (merge-on-read): new data files join the
  * inventory AND an equality-delete object of the batch's key tuples
  * joins the pending list — rows with those keys in strictly-older
  * files are logically replaced, nothing is rewritten. Unlike
  * [[AddRowDeltas]] there is nothing to validate against the parent:
  * equality deletes bind by sequence, so a concurrently-rewritten file
  * simply leaves their scope (its rewrite already applied them).
  */
final case class AddUpsert(add: Seq[DataFileEntry],
    eqDeletes: Seq[EqDeleteFile]) extends FilesEdit
/** Delete-object maintenance (minor compaction): pending position-
  * delete objects in `remove` leave the list, coalesced replacements in
  * `add` join it — the data-file inventory is untouched. Logical table
  * content MUST be identical before and after (the rewrite only drops
  * dead-file references and merges objects); the commit validates
  * `add`'s references like [[AddRowDeltas]] so a racing data-file
  * rewrite fails this commit loudly.
  */
/** Re-segment the snapshot's manifest list: full inventory, sorted by
  * path, re-chunked into `chunk`-entry segments — a metadata-only
  * commit (no data files move). Heals the many-small-deltas shape a
  * long append history leaves and restores path-clustered segments so
  * partial rewrites touch few chunks.
  */
final case class RewriteManifests(chunk: Int) extends FilesEdit

/** Rollback: restore a historic snapshot's ENTIRE state — inventory
  * AND pending merge-on-read state (delete predicates, position
  * deltas, equality deletes) — verbatim, original sequences included.
  * Unlike [[OverwriteFiles]] nothing is re-stamped: the restored
  * deletes scope by sequence (predicate: entry.seq <= del.seq; eq:
  * entry.seq < del.seq), so re-stamping the restored entries with the
  * rollback commit's own sequence would push every file out of scope
  * and silently resurrect logically-deleted rows.
  *
  * Carries the TARGET snapshot, so the child reuses its inline entries
  * and manifest-segment keys verbatim: rollback is an O(1) metadata
  * commit at any table size (segments are immutable and shared —
  * expiration already ref-counts shared keys), never an O(table)
  * inventory rewrite.
  */
final case class RestoreSnapshot(target: Snapshot) extends FilesEdit

final case class RewritePosDeletes(remove: Set[String],
    add: Seq[PosDeleteFile]) extends FilesEdit

/** Table metadata document, stored at TableDef.metadataLocation; every
  * commit writes a new document (copy-on-write, like Iceberg metadata
  * JSON) so concurrent readers never see a torn table state.
  */
final case class TableMetadata(
    schemaJson: String,
    currentSnapshotId: Long,
    snapshots: Seq[Snapshot],
    properties: Map[String, String] = Map.empty,
    snapshotLog: Seq[SnapshotLogRef] = Seq.empty,
    // tag name → snapshot id. Long erases under Jackson's scala
    // module (same as Snapshot.parentId), so pin the value type
    @com.fasterxml.jackson.databind.annotation.JsonDeserialize(
      contentAs = classOf[java.lang.Long])
    refs: Map[String, Long] = Map.empty,
    // branch name → HEAD snapshot id. A branch is a movable ref with
    // its own commit lineage off some main snapshot: writes through
    // `<table>$branch_<name>` advance it while the main table stays
    // untouched (write-audit-publish staging); `fast_forward`
    // publishes it onto main when main is an ancestor of the head.
    @com.fasterxml.jackson.databind.annotation.JsonDeserialize(
      contentAs = classOf[java.lang.Long])
    branches: Map[String, Long] = Map.empty,
    // ANALYZE output: one Puffin statistics file covering `snapshotId`
    // ([[Puffin]]; theta-sketch NDV blobs per column). Additive —
    // readers ignoring it just plan without NDVs; replaced wholesale
    // by the next analyze, removed if its snapshot expires.
    stats: Option[StatsFileRef] = None) {

  def currentSnapshot: Option[Snapshot] = snapshots.find(_.id == currentSnapshotId)

  /** Inline + spilled snapshot count, without opening any segment. */
  def totalSnapshots: Long = snapshotLog.map(_.count).sum + snapshots.size

  /** Full snapshot history, oldest first (opens every log segment —
    * history listings and maintenance only; the data path never does).
    */
  def allSnapshots(storage: StorageOps): Seq[Snapshot] =
    snapshotLog.flatMap(r => SnapshotLog.read(storage, r.key)) ++ snapshots

  /** Snapshots with `start < id <= end`, oldest first, opening ONLY
    * the spilled segments whose id bounds intersect the range. The
    * incremental paths (start/end-snapshot scans, MV refresh) ask for
    * a RECENT window that normally lives entirely in the inline
    * snapshot list — they must not pay a full-history segment read on
    * a long-lived table the way [[allSnapshots]] does.
    */
  def snapshotsInRange(storage: StorageOps, start: Long, end: Long)
      : Seq[Snapshot] =
    (snapshotLog.filter(r => r.lastId > start && r.firstId <= end)
      .flatMap(r => SnapshotLog.read(storage, r.key)) ++ snapshots)
      .filter(s => s.id > start && s.id <= end)

  /** Snapshot by id: inline window first, then the ONE spilled segment
    * whose id bounds cover it.
    */
  def findSnapshot(storage: StorageOps, id: Long): Option[Snapshot] =
    snapshots.find(_.id == id).orElse(
      snapshotLog.find(r => r.firstId <= id && id <= r.lastId)
        .flatMap(r => SnapshotLog.read(storage, r.key).find(_.id == id)))

  /** The current snapshot's full inventory (inline + manifests). */
  def currentFiles(storage: StorageOps): Seq[DataFileEntry] =
    currentSnapshot.map(Manifests.filesOf(storage, _)).getOrElse(Seq.empty)

  /** Head snapshot of a write target: the branch head when writing to
    * a branch, the main snapshot otherwise — resolved through the
    * snapshot log, since a busy branch (or main) can push the other's
    * head out of the inline window. Row-level ops and compaction read
    * their base state through THIS so a `<t>$branch_<name>` target
    * sees the branch's files and pending merge-on-read state, never
    * main's.
    */
  def headSnapshot(storage: StorageOps, branch: Option[String])
      : Option[Snapshot] = branch match {
    case Some(b) =>
      val id = branches.getOrElse(b,
        throw new IllegalArgumentException(s"no such branch: $b"))
      Some(findSnapshot(storage, id).getOrElse(
        throw new IllegalStateException(
          s"branch $b names expired snapshot $id")))
    case None =>
      if (currentSnapshotId < 0) None
      else findSnapshot(storage, currentSnapshotId)
  }

  /** Append a snapshot produced by `edit`; manifest reuse / rewrite /
    * merge decided by [[Manifests.applyEdit]]. `manifestDir` roots the
    * new segment objects (per-table, sibling of the data dir).
    * Snapshots beyond the inline window spill to log segments
    * ([[SnapshotLog.spill]]) so the document stays O(window), not
    * O(history).
    */
  def withSnapshotEdit(storage: StorageOps, manifestDir: String, op: String,
      edit: FilesEdit,
      inlineMax: Int = Manifests.InlineMaxDefault,
      snapshotsInlineMax: Int = SnapshotLog.InlineMaxDefault,
      branch: Option[String] = None): TableMetadata = {
    // base of the commit: the branch head when writing to a branch,
    // the main snapshot otherwise (resolved through the snapshot log —
    // a busy branch can push the main head out of the inline window)
    val baseId = branch match {
      case Some(b) => branches.getOrElse(b,
        throw new IllegalArgumentException(s"no such branch: $b"))
      case None => currentSnapshotId
    }
    val parent = if (baseId < 0) None else Some(
      findSnapshot(storage, baseId).getOrElse(throw new IllegalStateException(
        s"base snapshot $baseId missing (expired?)")))
    // ids and sequences are GLOBAL across main + branches (a branch
    // commit and a main commit must never share either)
    val id = (Seq(currentSnapshotId) ++ snapshots.map(_.id) ++
      snapshotLog.map(_.lastId) ++ branches.values).max + 1
    val seq = (0L +: (parent.map(_.seq).toSeq ++ snapshots.map(_.seq))).max + 1
    // new files carry the commit's sequence so later delete predicates
    // (which bind to a sequence) never apply to them retroactively
    val stamped = edit match {
      case AppendFiles(add) => AppendFiles(add.map(_.copy(seq = seq)))
      case OverwriteFiles(all) => OverwriteFiles(all.map(_.copy(seq = seq)))
      case r @ ReplaceFiles(_, add, _) =>
        r.copy(add = add.map(_.copy(seq = seq)))
      case e: AddDeletePredicate => e
      case AddRowDeltas(add, dels) => AddRowDeltas(add.map(_.copy(seq = seq)),
        dels.map(_.copy(seq = seq)))
      // data files and the key object share the commit's sequence —
      // applicability is STRICT (entry.seq < delete.seq), so the
      // epoch's own rows survive while all older matches die
      case AddUpsert(add, eqs) => AddUpsert(add.map(_.copy(seq = seq)),
        eqs.map(_.copy(seq = seq)))
      // rewritten delete objects keep their ORIGINAL sequence floor:
      // the coalesced object carries positions first committed at
      // earlier sequences, and nothing reads PosDeleteFile.seq for
      // scoping (scoping is by path), so the max source seq documents
      // provenance without changing semantics
      case e: RewritePosDeletes => e
      // metadata relayout: entries keep their own seqs verbatim
      case e: RewriteManifests => e
      // rollback: the restored state is the truth, sequences included
      case e: RestoreSnapshot => e
    }
    val parentDeletes = parent.map(_.deletes).getOrElse(Seq.empty)
    val deletes = stamped match {
      case AddDeletePredicate(sql, atSeq) =>
        parentDeletes :+ DeletePredicate(if (atSeq >= 0) atSeq else seq, sql)
      // the whole inventory is replaced — nothing left to apply to
      case OverwriteFiles(_) => Seq.empty
      case RestoreSnapshot(t) => t.deletes
      case _ => parentDeletes
    }
    val parentPos = parent.map(_.posDeletes).getOrElse(Seq.empty)
    val posDeletes = stamped match {
      case AddRowDeltas(_, dels) =>
        // positions bind to exact files: a concurrently-rewritten
        // reference means the delete no longer names real rows — the
        // replay must fail, not drift
        val present = parent.map(Manifests.filesOf(storage, _))
          .getOrElse(Seq.empty).map(_.path).toSet
        val missing = dels.flatMap(_.dataFiles).distinct.filterNot(present)
        if (missing.nonEmpty) throw new IllegalStateException(
          "row-delta commit references data files no longer in the " +
            s"table (concurrently rewritten?): ${missing.mkString(", ")}")
        parentPos ++ dels
      case OverwriteFiles(_) => Seq.empty
      case ReplaceFiles(rm, _, _) =>
        // drop references to rewritten paths; entries with nothing
        // left to reference leave the pending list (their object is
        // garbage once no live snapshot carries them)
        parentPos.map { p =>
          val kept = p.dataFiles.filterNot(rm)
          p.copy(dataFiles = kept,
            refsPruned = p.refsPruned || kept.size < p.dataFiles.size)
        }.filter(_.dataFiles.nonEmpty)
      case RewritePosDeletes(rm, add) =>
        // same reference validation as AddRowDeltas: after a rebase the
        // coalesced object may name rows of files a racing commit
        // rewrote — fail loudly, the job just re-runs
        val present = parent.map(Manifests.filesOf(storage, _))
          .getOrElse(Seq.empty).map(_.path).toSet
        val missing = add.flatMap(_.dataFiles).distinct.filterNot(present)
        if (missing.nonEmpty) throw new IllegalStateException(
          "position-delete rewrite references data files no longer in " +
            s"the table (concurrently rewritten?): ${missing.mkString(", ")}")
        parentPos.filterNot(p => rm(p.path)) ++ add
      // no reference validation needed: the restored positions name
      // files of the SAME restored inventory, present by construction
      case RestoreSnapshot(t) => t.posDeletes
      case _ => parentPos
    }
    val parentEq = parent.map(_.eqDeletes).getOrElse(Seq.empty)
    val eqDeletes = stamped match {
      case AddUpsert(_, eqs) => parentEq ++ eqs
      case OverwriteFiles(_) => Seq.empty
      case ReplaceFiles(rm, _, _) =>
        // a WHOLE-table rewrite (compaction) read with the equality
        // deletes applied and re-sequenced every row it kept — nothing
        // is left in their scope. A partial rewrite keeps the list:
        // untouched files still carry their original sequence.
        if (parent.exists(p => rm.size.toLong >= p.totalFiles)) Seq.empty
        else parentEq
      case RestoreSnapshot(t) => t.eqDeletes
      case _ => parentEq
    }
    val next = Manifests.applyEdit(storage, manifestDir, parent,
      stamped, inlineMax)
    val child = next.copy(id = id, parentId = baseId,
      timestampMillis = System.currentTimeMillis(), operation = op,
      seq = seq, deletes = deletes, posDeletes = posDeletes,
      eqDeletes = eqDeletes,
      deleteSql = stamped match {
        case r: ReplaceFiles => r.deleteSql
        case _ => ""
      })
    val updated = branch match {
      case Some(b) => copy(snapshots = snapshots :+ child,
        branches = branches + (b -> id))
      case None => copy(currentSnapshotId = id, snapshots = snapshots :+ child)
    }
    SnapshotLog.spill(storage, manifestDir, updated, snapshotsInlineMax)
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

/** Manifest-segment engine. Policy:
  *  - a table whose inventory fits [[inlineMax]] stays fully inline
  *    (one metadata read serves the scan — today's fast path);
  *  - above it, appends write ONE delta manifest and reuse the
  *    parent's; replaces rewrite ONLY segments containing removed
  *    paths (verbatim key reuse otherwise);
  *  - at [[segmentsMax]] segments, the commit merges all into one
  *    (amortized O(files/segmentsMax) per commit).
  */
object Manifests {

  /** Inventories at/below this stay inline in the metadata document.
    * Override per table with the `graft.manifest.inline-max` property
    * (tests; unusual deployments).
    */
  val InlineMaxDefault = 64
  val SegmentsMax = 64
  val InlineMaxProp = "graft.manifest.inline-max"

  /** Entries per segment when merging/re-chunking (~4k entries is a
    * few hundred KB of JSON — bounded object size at any table size).
    */
  val MergeChunk = 4096

  def read(storage: StorageOps, key: String): Seq[DataFileEntry] =
    Json.read(storage.read(key), classOf[ManifestDoc]).files

  def write(storage: StorageOps, manifestDir: String,
      entries: Seq[DataFileEntry]): String = {
    val key = s"$manifestDir/${java.util.UUID.randomUUID()}.manifest.json"
    storage.writeAtomic(key, Json.write(ManifestDoc(entries)))
    key
  }

  /** Full inventory of one snapshot: inline entries ⊎ all segments. */
  def filesOf(storage: StorageOps, s: Snapshot): Seq[DataFileEntry] =
    if (s.manifests.isEmpty) s.files
    else s.files ++ s.manifests.flatMap(read(storage, _))

  private def totals(fs: Seq[DataFileEntry]): (Long, Long, Long) =
    (fs.size.toLong, fs.map(_.rowCount).sum, fs.map(_.sizeBytes).sum)

  /** Build the child snapshot (id/parent/time/op patched by caller). */
  def applyEdit(storage: StorageOps, manifestDir: String,
      parent: Option[Snapshot], edit: FilesEdit,
      inlineMax: Int = InlineMaxDefault): Snapshot = {
    val pInline = parent.map(_.files).getOrElse(Seq.empty)
    val pManifests = parent.map(_.manifests).getOrElse(Seq.empty)
    val (pCount, pRows, pBytes) = parent match {
      case Some(s) => (s.totalFiles, s.totalRows, s.totalBytes)
      case None => (0L, 0L, 0L)
    }
    val (inline, manifests, count, rows, bytes) = edit match {
      case AddDeletePredicate(_, _) | RewritePosDeletes(_, _) =>
        // metadata-only for the INVENTORY: parent inline entries and
        // segment keys carry over verbatim — the commit writes no data
        // files (delete objects live in the snapshot's pending list)
        (pInline, pManifests, pCount, pRows, pBytes)
      case AddRowDeltas(add, _) =>
        // inventory-wise a row delta IS an append (the delete objects
        // live in the snapshot's pending list, not the inventory)
        val (ac, ar, ab) = totals(add)
        if (pManifests.isEmpty && pCount + ac <= inlineMax)
          (pInline ++ add, Seq.empty[String], pCount + ac, pRows + ar, pBytes + ab)
        else if (add.isEmpty)
          (pInline, pManifests, pCount, pRows, pBytes)
        else
          (pInline, pManifests :+ write(storage, manifestDir, add),
            pCount + ac, pRows + ar, pBytes + ab)
      case AddUpsert(add, _) =>
        // same shape: the upsert's key object rides the pending list
        val (ac, ar, ab) = totals(add)
        if (pManifests.isEmpty && pCount + ac <= inlineMax)
          (pInline ++ add, Seq.empty[String], pCount + ac, pRows + ar, pBytes + ab)
        else if (add.isEmpty)
          (pInline, pManifests, pCount, pRows, pBytes)
        else
          (pInline, pManifests :+ write(storage, manifestDir, add),
            pCount + ac, pRows + ar, pBytes + ab)
      case OverwriteFiles(all) =>
        val (c, r, b) = totals(all)
        if (all.lengthCompare(inlineMax) <= 0) (all, Seq.empty[String], c, r, b)
        else (Seq.empty[DataFileEntry], Seq(write(storage, manifestDir, all)),
          c, r, b)
      case RestoreSnapshot(t) =>
        // the target's inline entries and segment keys carry over
        // VERBATIM — zero manifest writes, O(1) metadata at any table
        // size (the target's segments are immutable; expiration
        // ref-counts keys shared across snapshots)
        (t.files, t.manifests, t.totalFiles, t.totalRows, t.totalBytes)
      case AppendFiles(add) =>
        val (ac, ar, ab) = totals(add)
        if (pManifests.isEmpty && pCount + ac <= inlineMax)
          (pInline ++ add, Seq.empty[String], pCount + ac, pRows + ar, pBytes + ab)
        else if (add.isEmpty)
          (pInline, pManifests, pCount, pRows, pBytes)
        else
          (pInline, pManifests :+ write(storage, manifestDir, add),
            pCount + ac, pRows + ar, pBytes + ab)
      case RewriteManifests(chunk) =>
        // full inventory, path-sorted, re-chunked: many small delta
        // segments (one per append) become few bounded ones, and
        // path clustering means later partial rewrites touch few
        val all = (pInline ++ pManifests.flatMap(read(storage, _)))
          .sortBy(_.path)
        if (all.lengthCompare(inlineMax) <= 0)
          (all, Seq.empty[String], pCount, pRows, pBytes)
        else
          (Seq.empty[DataFileEntry],
            all.grouped(chunk).map(write(storage, manifestDir, _)).toSeq,
            pCount, pRows, pBytes)
      case ReplaceFiles(remove, add, _) =>
        val keptInline = pInline.filterNot(f => remove(f.path))
        var removedEntries = pInline.filter(f => remove(f.path))
        // rewrite ONLY segments that contain a removed path; every
        // other segment key carries over verbatim (shared with parent)
        val keptManifests = pManifests.flatMap { key =>
          val entries = read(storage, key)
          val kept = entries.filterNot(f => remove(f.path))
          if (kept.lengthCompare(entries.size) == 0) Some(key)
          else {
            removedEntries ++= entries.filter(f => remove(f.path))
            if (kept.isEmpty) None
            else Some(write(storage, manifestDir, kept))
          }
        }
        val (rc, rr, rb) = totals(removedEntries)
        val (ac, ar, ab) = totals(add)
        val c = pCount - rc + ac
        val r = pRows - rr + ar
        val b = pBytes - rb + ab
        if (keptManifests.isEmpty && c <= inlineMax)
          (keptInline ++ add, Seq.empty[String], c, r, b)
        else if (add.isEmpty) (keptInline, keptManifests, c, r, b)
        else (keptInline, keptManifests :+ write(storage, manifestDir, add),
          c, r, b)
    }
    // segment-count bound: merge into SIZE-BOUNDED chunks (one
    // monolithic manifest would grow with the table — at 100 TB a
    // million-entry JSON object — and every partial rewrite would
    // rewrite it wholesale; path-sorted chunks keep each object small
    // and later ReplaceFiles touching few of them)
    val (mInline, mManifests) =
      if (manifests.lengthCompare(SegmentsMax) <= 0) (inline, manifests)
      else {
        val all = (inline ++ manifests.flatMap(read(storage, _)))
          .sortBy(_.path)
        (Seq.empty[DataFileEntry],
          all.grouped(MergeChunk).map(write(storage, manifestDir, _)).toSeq)
      }
    Snapshot(id = -1L, parentId = -1L, timestampMillis = 0L, operation = "",
      files = mInline, manifests = mManifests,
      fileCount = count, rowCount = rows, sizeBytes = bytes)
  }
}

/** Snapshot-log spill engine. The metadata document keeps only the
  * newest [[InlineMaxDefault]] snapshots inline; older ones move into
  * immutable `.snaplog.json` segments referenced by driver-cheap
  * [[SnapshotLogRef]]s (~100 bytes per ~16 snapshots vs a full
  * snapshot's manifest key list) — without this, every commit rewrites
  * an O(history × segments) document, the round-5 deferred scale flaw.
  * Whole segments die with expiration; at [[SegmentsMax]] refs the
  * spill merges all segments into one (amortized O(history / window)
  * per commit, same policy as [[Manifests]]).
  *
  * Reference analog: the catalog tree bounds ITS version history with
  * the `vn/oldest` horizon (docs/format.md:209-216) but delegates
  * table history to Iceberg metadata, which carries the same
  * unbounded-snapshot-list flaw this fixes; tags (`refs`) mirror
  * Iceberg's named refs, which the reference inherits through its
  * Iceberg bridge (docs/iceberg.md).
  */
object SnapshotLog {

  val InlineMaxDefault = 32
  val SegmentsMax = 64

  /** Inline window override, table property (tests; unusual loads). */
  val InlineMaxProp = "graft.snapshot-log.inline-max"

  def read(storage: StorageOps, key: String): Seq[Snapshot] =
    Json.read(storage.read(key), classOf[SnapshotLogDoc]).snapshots

  def write(storage: StorageOps, dir: String, snaps: Seq[Snapshot]): SnapshotLogRef = {
    val key = s"$dir/${java.util.UUID.randomUUID()}.snaplog.json"
    storage.writeAtomic(key, Json.write(SnapshotLogDoc(snaps)))
    SnapshotLogRef(key, snaps.head.id, snaps.last.id,
      snaps.head.timestampMillis, snaps.last.timestampMillis, snaps.size.toLong)
  }

  /** Spill `meta`'s oldest inline snapshots into one new segment when
    * the inline window overflows; keep the newest half of the window
    * inline (the current snapshot is always newest, so it never
    * spills). No-op below the threshold.
    */
  def spill(storage: StorageOps, dir: String, meta: TableMetadata,
      inlineMax: Int = InlineMaxDefault): TableMetadata = {
    if (meta.snapshots.lengthCompare(inlineMax) <= 0) return meta
    val keep = math.max(1, inlineMax / 2)
    val (old, recent) = meta.snapshots.splitAt(meta.snapshots.size - keep)
    val log = meta.snapshotLog :+ write(storage, dir, old)
    val bounded =
      if (log.lengthCompare(SegmentsMax) <= 0) log
      else Seq(write(storage, dir, log.flatMap(r => read(storage, r.key))))
    meta.copy(snapshots = recent, snapshotLog = bounded)
  }
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
