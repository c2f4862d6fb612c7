package graft.spark

import java.util.UUID

import graft.objects.FileLocations
import graft.storage.StorageOps
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => VSortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriterCommitMessage}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types.StructType

/** Native DSv2 append/overwrite (reference analog:
  * OlympiaIcebergMergeAppend.java:36-68 — but as a first-class
  * connector write, not a V1 fallback): executors stream rows through
  * Spark's parquet `BatchWrite` into a fresh commit location; the
  * driver-side `commit` turns the finished files into a snapshot.
  *
  * Partitioned tables declare a CLUSTERED distribution + sort on the
  * partition columns, so Spark plans the shuffle that gives the
  * dynamic-partition writer one file per (task × partition-value run)
  * — at 100 TB that's the difference between `numPartitions ×
  * numValues` small files and a controlled file count. The same
  * declaration makes fresh appends land pre-clustered for
  * storage-partitioned joins.
  */
class GraftAppendWrite(
    catalog: GraftCatalog,
    table: GraftTable,
    info: LogicalWriteInfo,
    overwrite: Boolean) extends Write with RequiresDistributionAndOrdering {

  private val spec = table.partitionSpec
  private val sortCols = table.sortColumnNames

  override def requiredDistribution(): Distribution =
    if (spec.nonEmpty)
      // clustered on the partition TRANSFORMS (identity columns and
      // bucket/time transforms alike — derived ones resolve through
      // the catalog's V2 functions, [[GraftFunctionCatalog]]), so the
      // dynamic-partition writer sees one value run per task
      Distributions.clustered(
        spec.map(_.toTransform
          : org.apache.spark.sql.connector.expressions.Expression).toArray)
    else if (sortCols.nonEmpty)
      // `graft.write.sort-by` without partitioning: a RANGE shuffle on
      // the sort key, so each writer task — hence each file — covers a
      // disjoint value range and snapshot-stats pruning bites
      Distributions.ordered(sortCols.map(c =>
        Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray)
    else Distributions.unspecified()

  override def requiredOrdering(): Array[VSortOrder] = {
    val specOrders = spec.map(f =>
      Expressions.sort(f.toTransform, SortDirection.ASCENDING))
    val sortOrders = sortCols
      .filterNot(c => spec.exists(f => f.isIdentity && f.col == c))
      .map(c => Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))
    (specOrders ++ sortOrders).toArray
  }

  override def toBatch: BatchWrite =
    new GraftAppendBatchWrite(catalog, table, info, overwrite)

  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new GraftStreamingWrite(catalog, table, info, overwrite)

  override def description(): String =
    s"GraftAppendWrite(${table.name()}, ${if (overwrite) "overwrite" else "append"})"
}

/** Shared write-path plumbing for hidden partition transforms. */
private[graft] object GraftWriteSupport {
  /** Extend a parquet writer factory so each row derives its hidden
    * transform directory columns (`gp_*`) on the executor; identity-
    * only specs pass the factory through untouched.
    */
  def deriving(delegate: DataWriterFactory, physSchema: StructType,
      spec: Seq[PartitionField]): DataWriterFactory = {
    val derived = spec.filterNot(_.isIdentity)
    if (derived.isEmpty) return delegate
    SparkInternals.derivingWriterFactory(delegate, physSchema, attrs =>
      derived.map { f =>
        val a = attrs.find(_.name == f.col).getOrElse(
          throw new IllegalArgumentException(
            s"partition source ${f.col} missing from write schema"))
        f.expr(a, a.dataType)
      })
  }

  /** Per-table parquet writer tuning: table properties prefixed
    * `graft.parquet.` become hadoop conf keys under `parquet.` for
    * this table's data-file writes (e.g.
    * `'graft.parquet.bloom.filter.enabled#ck' = 'true'` turns on a
    * parquet bloom filter for column `ck` — the row-group skipping
    * structure point lookups at 100 TB live on). A `#column` suffix
    * is translated to the column's PHYSICAL name, matching what data
    * files actually store (rename-safe, like the writes themselves).
    */
  def parquetOptions(table: GraftTable): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    parquetOptions(table.properties().asScala.toMap, table.schema)
  }

  /** Core of [[parquetOptions]] for callers holding raw table
    * properties + a schema (maintenance rewrites, COW partial
    * rewrites) rather than a loaded [[GraftTable]].
    */
  def parquetOptions(props: Map[String, String],
      schema: StructType): Map[String, String] = {
    val renames = ColumnMapping.renames(schema)
    props.collect {
      case (k, v) if k.startsWith("graft.parquet.") =>
        val raw = k.stripPrefix("graft.")
        val mapped = raw.split('#') match {
          case Array(base, c) => base + "#" + renames.getOrElse(c, c)
          case _ => raw
        }
        mapped -> v
    }
  }
}

/** Native micro-batch streaming sink. Two modes:
  *
  *  - **append** (default): each epoch's rows stage through the same
  *    parquet BatchWrite as batch appends and commit as one snapshot —
  *    the commit-per-trigger history `expire_snapshots` trims.
  *  - **upsert** (`graft.write.upsert-keys` table property, or the
  *    `upsert-keys` writeStream option): each epoch ALSO commits an
  *    equality-delete object of the batch's distinct key tuples
  *    ([[graft.format.EqDeleteFile]]) — rows with those keys in
  *    strictly-older files are logically replaced. A CDC/keyed stream
  *    materializes as "latest row per key" without rewriting a single
  *    data file: at 100 TB an upsert epoch is O(batch), never O(table).
  *
  * Epoch idempotence: each commit records the epoch id in the table
  * metadata properties under the write's query id; a replayed epoch
  * (task retry after a committed-but-unacknowledged batch) commits
  * nothing. `createStreamingWriterFactory` is called once per trigger
  * (Spark wraps this write in a fresh MicroBatchWrite per batch), so
  * per-epoch staging state lives between that call and `commit`.
  */
class GraftStreamingWrite(
    catalog: GraftCatalog,
    table: GraftTable,
    info: LogicalWriteInfo,
    overwrite: Boolean)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  private val spec = table.partitionSpec
  private val partCols = PartitionTransforms.dirNames(spec)
  private val dataDir =
    FileLocations.tableDataDir(table.namespaceName, table.tableName)
  private val storage: StorageOps = table.storageOps

  /** LOGICAL upsert key columns (option wins over table property). */
  private val upsertKeys: Seq[String] =
    Option(info.options.get(GraftStreamingWrite.UpsertKeysOption))
      .orElse(Option(table.properties()
        .get(GraftCatalog.UpsertKeysProp)))
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)

  // fail fast, driver-side, before any task runs
  upsertKeys.foreach { k =>
    val f = table.schema.fields.find(_.name == k).getOrElse(
      throw new IllegalArgumentException(
        s"upsert key column $k not in ${table.name()}'s schema"))
    graft.format.EqDeleteFiles.requireSupported(k, f.dataType)
  }

  /** PHYSICAL names of the key columns (rename-safe, like data files). */
  private val physKeys: Seq[String] = {
    val renames = ColumnMapping.renames(table.schema)
    upsertKeys.map(k => renames.getOrElse(k, k))
  }

  private case class EpochState(commitId: String, stagingRel: String,
      delegate: BatchWrite)
  @volatile private var current: EpochState = _

  /** The parquet delegate runs Spark's file commit protocol, which
    * coordinates task commits itself — double-asking the
    * OutputCommitCoordinator denies the task's own commit.
    */
  override def useCommitCoordinator(): Boolean = false

  override def createStreamingWriterFactory(pi: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    val commitId = UUID.randomUUID().toString
    val stagingRel =
      if (partCols.isEmpty) s"$dataDir/$commitId"
      else s"$dataDir/.staging-$commitId"
    val physSchema =
      ColumnMapping.toPhysicalRequired(info.schema(), table.schema)
    val delegate = SparkInternals.parquetBatchWrite(
      org.apache.spark.sql.SparkSession.active.asInstanceOf[ClassicSession],
      PartitionTransforms.extendSchema(physSchema, spec), partCols,
      storage.absolute(stagingRel), info.queryId(),
      GraftWriteSupport.parquetOptions(table))
    current = EpochState(commitId, stagingRel, delegate)
    val batchFactory = GraftWriteSupport.deriving(
      delegate.createBatchWriterFactory(pi), physSchema, spec)
    new StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
          : org.apache.spark.sql.connector.write.DataWriter[
            org.apache.spark.sql.catalyst.InternalRow] =
        batchFactory.createWriter(partitionId, taskId)
    }
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val st = current
    require(st != null, "streaming commit without a writer factory")
    current = null
    st.delegate.commit(messages)
    val newFiles = GraftCatalog.finalizeCommitDir(
      storage, table.namespaceName, table.tableName, st.commitId, partCols,
      table.fileBloomSpec)
    val eqDeletes =
      if (upsertKeys.isEmpty || newFiles.isEmpty) Seq.empty
      else Seq(writeEqDeleteObject(st.commitId, newFiles))
    catalog.commitStreamEpoch(table.ident, newFiles, eqDeletes, overwrite,
      epochKey = (info.queryId(), epochId))
    // opt-in, best-effort, AFTER the epoch commit: a streamed-into
    // source keeps its derived views fresh without external scheduling
    graft.maintain.MaterializedViews.maybeRefreshOnCommit(
      catalog, table.properties())
  }

  /** One equality-delete object: the DISTINCT key tuples of the files
    * this epoch just committed, written as plain parquet by a small
    * Spark job over ONLY those files (a partitioned table reads them
    * with `basePath` so partition-column keys resolve from the
    * directory layout).
    */
  private def writeEqDeleteObject(
      commitId: String,
      newFiles: Seq[graft.format.DataFileEntry])
      : graft.format.EqDeleteFile = {
    import org.apache.spark.sql.functions.col
    val spark = org.apache.spark.sql.SparkSession.active
    val abs = newFiles.map(f => storage.absolute(f.path))
    val r0 = spark.read
    val r = if (partCols.isEmpty) r0
      else r0.option("basePath", storage.absolute(dataDir))
    val keys = r.parquet(abs: _*).select(physKeys.map(col): _*).distinct()
    val stageRel = s"$dataDir/.eqstage-$commitId"
    keys.coalesce(1).write.mode("overwrite")
      .parquet(storage.absolute(stageRel))
    val parts = storage.listDeep(stageRel).filter(_.endsWith(".parquet"))
    require(parts.nonEmpty, "equality-delete write produced no file")
    val target = s"$dataDir/$commitId-eqdelete.parquet"
    storage.move(parts.head, target)
    storage.deleteTree(stageRel)
    val stats = graft.format.ParquetStats.read(storage.absolute(target))
    graft.format.EqDeleteFile(target, stats.rowCount,
      storage.sizeOf(target), physKeys)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val st = current
    current = null
    if (st != null) {
      try st.delegate.abort(messages)
      finally storage.deleteTree(st.stagingRel)
    }
  }
}

object GraftStreamingWrite {
  /** writeStream option naming the upsert key columns. */
  val UpsertKeysOption = "upsert-keys"
}

class GraftAppendBatchWrite(
    catalog: GraftCatalog,
    table: GraftTable,
    info: LogicalWriteInfo,
    overwrite: Boolean) extends BatchWrite {

  private val storage: StorageOps = table.storageOps
  private val spec = table.partitionSpec
  private val partCols = PartitionTransforms.dirNames(spec)
  private val commitId = UUID.randomUUID().toString
  private val dataDir =
    FileLocations.tableDataDir(table.namespaceName, table.tableName)
  private val stagingRel =
    if (partCols.isEmpty) s"$dataDir/$commitId"
    else s"$dataDir/.staging-$commitId"

  // data files always carry PHYSICAL column names (rename-safe
  // writes, ColumnMapping) — rows are positional, so re-labeling the
  // write schema is the whole job
  private val physSchema =
    ColumnMapping.toPhysicalRequired(info.schema(), table.schema)

  private lazy val delegate: BatchWrite =
    SparkInternals.parquetBatchWrite(
      org.apache.spark.sql.SparkSession.active.asInstanceOf[ClassicSession],
      PartitionTransforms.extendSchema(physSchema, spec), partCols,
      storage.absolute(stagingRel), info.queryId(),
      GraftWriteSupport.parquetOptions(table))

  override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
    GraftWriteSupport.deriving(delegate.createBatchWriterFactory(pi),
      physSchema, spec)

  override def useCommitCoordinator(): Boolean = delegate.useCommitCoordinator()

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    delegate.commit(messages) // finalizes parquet under the staging dir
    val newFiles = GraftCatalog.finalizeCommitDir(
      storage, table.namespaceName, table.tableName, commitId, partCols,
      table.fileBloomSpec)
    catalog.commitFiles(table.ident, newFiles, overwrite)
    // opt-in, best-effort, AFTER the commit: never fails the write
    graft.maintain.MaterializedViews.maybeRefreshOnCommit(
      catalog, table.properties())
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    try delegate.abort(messages)
    finally storage.deleteTree(stagingRel)
  }
}
