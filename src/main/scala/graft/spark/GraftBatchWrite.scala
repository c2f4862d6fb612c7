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

  override def description(): String =
    s"GraftAppendWrite(${table.name()}, ${if (overwrite) "overwrite" else "append"})"
}

/** Shared write-path plumbing for hidden partition transforms. */
private[spark] object GraftWriteSupport {
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
      storage.absolute(stagingRel), info.queryId())

  override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
    GraftWriteSupport.deriving(delegate.createBatchWriterFactory(pi),
      physSchema, spec)

  override def useCommitCoordinator(): Boolean = delegate.useCommitCoordinator()

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    delegate.commit(messages) // finalizes parquet under the staging dir
    val newFiles = GraftCatalog.finalizeCommitDir(
      storage, table.namespaceName, table.tableName, commitId, partCols)
    catalog.commitFiles(table.ident, newFiles, overwrite)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    try delegate.abort(messages)
    finally storage.deleteTree(stagingRel)
  }
}
