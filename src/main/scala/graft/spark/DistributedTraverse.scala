package graft.spark

import graft.objects.{CatalogDef, ObjectKeys}
import graft.storage.{StorageConf, StorageOps}
import graft.tree.TreeOps
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Level-parallel tree walk. The driver only ever holds node PATHS
  * (≈ N/order strings for N objects) — object definitions stay on the
  * executors. Narrow catalogs stay driver-local: a level fans out as a
  * Spark job only once it is wider than [[DriverLevelMax]], so SHOW on
  * a 10-table catalog never pays job-launch latency while a
  * billion-object listing never pulls a billion defs into one heap.
  */
object DistributedTraverse {

  /** A level at or under this width is expanded on the driver. */
  val DriverLevelMax = 16

  private def childPathsOf(storage: StorageOps, path: String): Seq[String] = {
    val node = TreeOps.loadNode(storage, path)
    try node.leftmostChildPath.filter(_.nonEmpty).toSeq ++
      node.mergedRows.flatMap(_.child.filter(_.nonEmpty))
    finally node.close()
  }

  /** Every node path in the tree, level order. One Spark job per level
    * below the fan-out threshold; tasks each read ONE node file and
    * return only its child paths.
    */
  def nodePaths(spark: org.apache.spark.sql.SparkSession, sconf: StorageConf,
      rootPath: String): Seq[String] = {
    val sc = spark.sparkContext
    val driverStorage = sconf.create()
    val all = scala.collection.mutable.ArrayBuffer(rootPath)
    var level: Seq[String] = Seq(rootPath)
    while (level.nonEmpty) {
      val next: Seq[String] =
        if (level.lengthCompare(DriverLevelMax) <= 0)
          level.flatMap(childPathsOf(driverStorage, _))
        else
          sc.parallelize(level, math.min(level.size, sc.defaultParallelism * 2))
            .flatMap { p =>
              childPathsOf(sconf.create(), p)
            }.collect().toSeq
      all ++= next
      level = next
    }
    all.toSeq
  }
}

/** `<catalog>.sys.objects` as a real DSv2 table: input partitions are
  * groups of tree-node files, each task parses its nodes' live rows
  * into (kind, namespace, name, def_path) — a full-catalog listing is
  * a distributed scan, not a driver materialization.
  */
class ObjectsTable(
    catalogName: String,
    version: Long,
    cd: CatalogDef,
    sconf: StorageConf,
    nodePaths: Seq[String]) extends Table with SupportsRead {

  override def name(): String = s"$catalogName.sys.objects"

  override def schema(): StructType = ObjectsTable.Schema

  override def capabilities(): java.util.Set[TableCapability] = {
    import scala.jdk.CollectionConverters._
    Set(TableCapability.BATCH_READ).asJava
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = ObjectsTable.Schema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] = {
          // ~one group per core-slot; a group is just a path array
          val groups = math.max(1, math.min(nodePaths.size,
            org.apache.spark.sql.SparkSession.active
              .sparkContext.defaultParallelism * 2))
          nodePaths.grouped(
            math.max(1, (nodePaths.size + groups - 1) / groups))
            .map(g => ObjectsPartition(g.toArray): InputPartition).toArray
        }
        override def createReaderFactory(): PartitionReaderFactory =
          new ObjectsReaderFactory(cd, sconf, version)
      }
      override def description(): String =
        s"ObjectsScan($catalogName, nodes=${nodePaths.size})"
    }
}

object ObjectsTable {
  val Schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("namespace", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("def_path", StringType, nullable = false),
    StructField("catalog_version", LongType, nullable = false)))
}

final case class ObjectsPartition(paths: Array[String]) extends InputPartition

private class ObjectsReaderFactory(cd: CatalogDef, sconf: StorageConf,
    version: Long) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val storage = sconf.create()
    val rows = p.asInstanceOf[ObjectsPartition].paths.iterator.flatMap { path =>
      val node = TreeOps.loadNode(storage, path)
      // materialize this ONE node's rows, then release its buffers
      try node.mergedRows.flatMap(r => r.value.map(v => (r.key, v))).toVector
      finally node.close()
    }.map { case (key, defPath) =>
      val (kind, ns, nm) =
        if (ObjectKeys.isNamespaceKey(key))
          ("namespace", ObjectKeys.namespaceNameFromKey(key), "")
        else if (ObjectKeys.isTableKey(key)) {
          val (ns, t) = ObjectKeys.tableNameFromKey(key, cd)
          ("table", ns, t)
        } else {
          val (ns, v) = ObjectKeys.viewNameFromKey(key, cd)
          ("view", ns, v)
        }
      InternalRow(UTF8String.fromString(kind), UTF8String.fromString(ns),
        UTF8String.fromString(nm), UTF8String.fromString(defPath), version)
    }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
