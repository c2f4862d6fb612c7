package graft.spark

import java.util.UUID

import graft.objects.FileLocations
import graft.storage.StorageOps
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => VSortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriterCommitMessage}
import org.apache.spark.sql.graft.SparkInternals

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

  private val partCols = table.partitionColumnNames
  private val sortCols = table.sortColumnNames

  override def requiredDistribution(): Distribution =
    if (partCols.nonEmpty)
      Distributions.clustered(
        partCols.map(c => Expressions.identity(c)
          : org.apache.spark.sql.connector.expressions.Expression).toArray)
    else if (sortCols.nonEmpty)
      // `graft.write.sort-by` without partitioning: a RANGE shuffle on
      // the sort key, so each writer task — hence each file — covers a
      // disjoint value range and snapshot-stats pruning bites
      Distributions.ordered(sortCols.map(c =>
        Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray)
    else Distributions.unspecified()

  override def requiredOrdering(): Array[VSortOrder] =
    (partCols ++ sortCols.filterNot(partCols.contains)).map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray

  override def toBatch: BatchWrite =
    new GraftAppendBatchWrite(catalog, table, info, overwrite)

  override def description(): String =
    s"GraftAppendWrite(${table.name()}, ${if (overwrite) "overwrite" else "append"})"
}

class GraftAppendBatchWrite(
    catalog: GraftCatalog,
    table: GraftTable,
    info: LogicalWriteInfo,
    overwrite: Boolean) extends BatchWrite {

  private val storage: StorageOps = table.storageOps
  private val partCols = table.partitionColumnNames
  private val commitId = UUID.randomUUID().toString
  private val dataDir =
    FileLocations.tableDataDir(table.namespaceName, table.tableName)
  private val stagingRel =
    if (partCols.isEmpty) s"$dataDir/$commitId"
    else s"$dataDir/.staging-$commitId"

  private lazy val delegate: BatchWrite = {
    // data files always carry PHYSICAL column names (rename-safe
    // writes, ColumnMapping) — rows are positional, so re-labeling the
    // write schema is the whole job
    val physSchema = ColumnMapping.toPhysicalRequired(info.schema(), table.schema)
    SparkInternals.parquetBatchWrite(
      org.apache.spark.sql.SparkSession.active.asInstanceOf[ClassicSession],
      physSchema, partCols, storage.absolute(stagingRel), info.queryId())
  }

  override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
    delegate.createBatchWriterFactory(pi)

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
