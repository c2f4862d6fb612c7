package graft.spark

import graft.format.{DataFileEntry, Manifests, TableMetadata}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType

/** A graft table as a Structured Streaming SOURCE: the snapshot
  * lineage IS the changelog, so stream offsets are snapshot ids and a
  * micro-batch is exactly the files appended in `(start, end]` — no
  * journal, no file-listing polls (the file-stream source's per-batch
  * directory LIST is what this replaces at 100 TB; here discovery is
  * one metadata-document read per trigger).
  *
  * Non-additive snapshots (overwrite / delete / update / merge /
  * compact) in a batch range fail the stream rather than silently
  * re-emitting rewritten rows; downstreams that need rewrites use
  * [[TableChanges.between]] on the failed range and restart from its
  * end offset.
  *
  * Capability addition beyond the reference (its streaming story is
  * ingest-only, docs/spark.md): the snapshot-commit protocol this
  * rides is the same one batch writes use (docs/format.md:250-265
  * versioned-commit semantics).
  */
final case class SnapshotOffset(id: Long) extends Offset {
  override def json: String = id.toString
}

/** Re-resolves the table's CURRENT metadata each trigger (the GraftTable
  * instance pins the load-time snapshot; a stream must see commits that
  * happen while it runs).
  */
private[spark] final class GraftStreamCtx(
    val tableName: String,
    val freshMeta: () => TableMetadata,
    val storage: graft.storage.StorageOps)

private[spark] class GraftMicroBatchStream(
    ctx: GraftStreamCtx,
    scanOver: Seq[(String, DataFileEntry)] => Scan,
    readSchema: StructType,
    maxSnapshotsPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  // the scan planned for the current batch's files; planInputPartitions
  // and createReaderFactory are driver-side, per-batch, in order
  @volatile private var lastScan: Option[Scan] = None
  // Trigger.AvailableNow: pin the end at start-of-query — without this
  // Spark treats an admission-controlled source as Trigger.Once and a
  // bounded catch-up would stop after ONE batch
  @volatile private var pinnedEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    pinnedEnd = Some(ctx.freshMeta().currentSnapshotId)

  private def currentEnd: Long =
    pinnedEnd.getOrElse(ctx.freshMeta().currentSnapshotId)

  override def initialOffset(): Offset = SnapshotOffset(-1L)

  override def latestOffset(): Offset = SnapshotOffset(currentEnd)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control: cap a micro-batch at N snapshots
    * (`max-snapshots-per-trigger` read option), so a stream starting
    * against a long-lived table catches up in bounded batches instead
    * of one table-sized batch. The generic ReadLimit hints don't map
    * to snapshot granularity and are ignored.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = currentEnd
    val s = start.asInstanceOf[SnapshotOffset].id
    SnapshotOffset(maxSnapshotsPerTrigger.map { n =>
      if (cur <= s) cur
      else {
        // resolve the n-th MAIN-lineage successor of s: snapshot ids
        // are global across branches, so naive `s + n` could name a
        // concurrent BRANCH snapshot and the endpoint diff would read
        // that branch's inventory
        val lineage = TableChanges.mainLineage(
          ctx.storage, ctx.freshMeta(), s, cur)
        // mainLineage falls back to the unsorted global id-interval
        // view when the chain is broken (expired mid-chain snapshot) —
        // an intermediate offset from THAT list could itself be a
        // branch snapshot. Only step through the INTACT PREFIX of the
        // chain (each element parent-linked, rooted at s): a break
        // past the cap doesn't matter, and a break within it still
        // caps the batch at the linked prefix instead of jumping to
        // cur (which would bypass the per-trigger bound and process
        // the whole backlog in one batch). Only when NO parent-linked
        // prefix from s exists take cur — planInputPartitions re-gates
        // the range anyway.
        val prefix = {
          val buf = scala.collection.mutable.ArrayBuffer
            .empty[graft.format.Snapshot]
          var prev = s
          val it = lineage.iterator
          var linked = true
          while (linked && it.hasNext && buf.size < n) {
            val sn = it.next()
            if (sn.parentId == prev || (prev < 0 && sn.parentId < 0)) {
              buf += sn; prev = sn.id
            } else linked = false
          }
          buf
        }
        if (prefix.isEmpty) cur else prefix.last.id
      }
    }.getOrElse(cur))
  }

  override def deserializeOffset(json: String): Offset =
    SnapshotOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val startId = start.asInstanceOf[SnapshotOffset].id
    val endId = end.asInstanceOf[SnapshotOffset].id
    if (endId <= startId) { lastScan = None; return Array.empty }
    val meta = ctx.freshMeta()
    // main lineage only: a concurrent BRANCH commit with an id inside
    // the interval must neither refuse the batch nor count as a range
    // snapshot (the file diff below is endpoint-based and never saw
    // branch files; this makes the gate agree with it)
    val nonAdditive = TableChanges.mainLineage(ctx.storage, meta,
        startId, endId)
      .filterNot(s => GraftTable.AdditiveOps(s.operation))
    if (nonAdditive.nonEmpty) throw new UnsupportedOperationException(
      s"stream over ${ctx.tableName} hit non-additive snapshot " +
        s"${nonAdditive.head.id} (${nonAdditive.head.operation}) in " +
        s"($startId, $endId]; re-derive with TableChanges.between and restart " +
        "from the end offset")
    def paths(id: Long): Set[String] =
      if (id < 0) Set.empty
      else Manifests.filesOf(ctx.storage,
        meta.findSnapshot(ctx.storage, id).getOrElse(
          throw new IllegalStateException(
            s"stream offset $id of ${ctx.tableName} expired before processing; " +
              "retain snapshots at least as long as downstream lag"))).map(_.path).toSet
    val startPaths = paths(startId)
    val added = Manifests.filesOf(ctx.storage,
      meta.findSnapshot(ctx.storage, endId).getOrElse(
        throw new IllegalStateException(
          s"stream end offset $endId of ${ctx.tableName} not found")))
      .filterNot(f => startPaths(f.path))
      .map(f => (ctx.storage.absolute(f.path), f))
    val scan = scanOver(added)
    lastScan = Some(scan)
    scan.toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    lastScan.getOrElse(scanOver(Seq.empty)).toBatch.createReaderFactory()

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftMicroBatchStream(${ctx.tableName})"
}

/** Scan wrapper adding micro-batch streaming to the batch scan the
  * builder produced (same pushdown state, per-batch file sets).
  */
private[spark] class StreamCapableScan(
    val delegate: Scan,
    mkStream: () => MicroBatchStream) extends Scan
    with DelegatedStatistics {
  override protected def statsDelegate: Scan = delegate
  override def readSchema(): StructType = delegate.readSchema()
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    delegate.toBatch
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    mkStream()
  override def description(): String = s"Streamable(${delegate.description()})"

  // structural equality for broadcast/exchange reuse across plannings
  override def equals(other: Any): Boolean = other match {
    case s: StreamCapableScan => delegate == s.delegate
    case _ => false
  }
  override def hashCode(): Int = delegate.hashCode()
}

private[spark] object StreamCapableScan {
  /** Identity when no stream context (time-travel and dtxn loads). */
  def wrap(delegate: Scan, mkStream: Option[() => MicroBatchStream]): Scan =
    mkStream.map(new StreamCapableScan(delegate, _)).getOrElse(delegate)
}
