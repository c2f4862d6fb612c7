package graft.spark

import graft.objects.{CatalogDef, ObjectKeys}
import graft.storage.{StorageConf, StorageOps}
import graft.tree.{TreeOps, TreeRow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Level-parallel tree walk, SUBTREE-CUT edition. The driver expands
  * levels only until one is wider than the cut width; that level's
  * nodes become disjoint subtree roots that executors walk whole. The
  * driver therefore holds O(cut width × order) node paths — never the
  * full node inventory, let alone object defs — so `sys.objects` scan
  * CONSTRUCTION stays flat as the catalog grows from thousands to
  * billions of objects.
  *
  * Key ranges (from pushed kind/namespace predicates) bound the walk
  * on both sides of the cut: a child pointer is followed only when
  * the key interval it covers intersects a wanted range — `SHOW
  * TABLES`-shaped listings of one namespace touch one root-to-leaf
  * spine plus the matching leaves, not the whole tree.
  */
object DistributedTraverse {

  /** A level at or under this width is expanded on the driver. */
  val DriverLevelMax = 16

  /** Inclusive-lo / exclusive-hi key intervals; empty = everything. */
  type KeyRanges = Seq[(String, String)]

  private def intersects(lo: String, hi: String, ranges: KeyRanges): Boolean =
    ranges.isEmpty || ranges.exists { case (rlo, rhi) => lo < rhi && rlo < hi }

  private def keyWanted(key: String, ranges: KeyRanges): Boolean =
    ranges.isEmpty || ranges.exists { case (rlo, rhi) => rlo <= key && key < rhi }

  /** The Unicode-max sentinel bounding a node's last child interval. */
  private val MaxKey = "\uffff"

  /** (liveRows, childPaths) of one node, both bounded by `ranges`.
    * Child `i` covers keys strictly between its pivot row's key and
    * the next row's key; the leftmost child covers keys below the
    * first row's key (B-tree invariant, docs/format.md:121-167).
    */
  def boundedNode(storage: StorageOps, path: String, ranges: KeyRanges)
      : (Vector[TreeRow], Vector[String]) = {
    val node = TreeOps.loadNode(storage, path)
    try {
      val rows = node.mergedRows
      val keep = rows.filter(r => r.value.isDefined && keyWanted(r.key, ranges))
      val kids = Vector.newBuilder[String]
      node.leftmostChildPath.filter(_.nonEmpty).foreach { p =>
        val hi = rows.headOption.map(_.key).getOrElse(MaxKey)
        if (intersects("", hi, ranges)) kids += p
      }
      var i = 0
      while (i < rows.length) {
        rows(i).child.filter(_.nonEmpty).foreach { p =>
          val hi = if (i + 1 < rows.length) rows(i + 1).key else MaxKey
          if (intersects(rows(i).key, hi, ranges)) kids += p
        }
        i += 1
      }
      (keep, kids.result())
    } finally node.close()
  }

  /** Walk down from the root until a level is wider than `cutWidth`.
    * Returns (ancestor paths — every node ABOVE the cut, row-bearing
    * but already expanded; cut paths — disjoint subtree roots for
    * executor-side walks). Levels above the cut wider than
    * [[DriverLevelMax]] expand as a Spark job, so the driver reads at
    * most [[DriverLevelMax]] node files itself.
    */
  def subtreeCut(spark: org.apache.spark.sql.SparkSession, sconf: StorageConf,
      rootPath: String, cutWidth: Int, ranges: KeyRanges)
      : (Seq[String], Seq[String]) = {
    val sc = spark.sparkContext
    val driverStorage = sconf.create()
    val ancestors = scala.collection.mutable.ArrayBuffer.empty[String]
    var level: Seq[String] = Seq(rootPath)
    while (level.nonEmpty && level.lengthCompare(cutWidth) <= 0) {
      ancestors ++= level
      val next: Seq[String] =
        if (level.lengthCompare(DriverLevelMax) <= 0)
          level.flatMap(boundedNode(driverStorage, _, ranges)._2)
        else {
          val r = ranges.toVector
          sc.parallelize(level, math.min(level.size, sc.defaultParallelism * 2))
            .flatMap(p => boundedNode(sconf.create(), p, r)._2)
            .collect().toSeq
        }
      level = next
    }
    (ancestors.toSeq, level)
  }
}

/** `<catalog>.sys.objects` as a real DSv2 table: input partitions are
  * subtree roots (plus the few already-expanded ancestor nodes), each
  * task walks its subtree parsing live rows into (kind, namespace,
  * name, def_path) — a full-catalog listing is a distributed scan,
  * not a driver materialization, and the walk itself is planned
  * lazily at scan time under any pushed kind/namespace bounds.
  */
class ObjectsTable(
    catalogName: String,
    version: Long,
    cd: CatalogDef,
    sconf: StorageConf,
    rootPath: String) extends Table with SupportsRead {

  override def name(): String = s"$catalogName.sys.objects"

  override def schema(): StructType = ObjectsTable.Schema

  override def capabilities(): java.util.Set[TableCapability] = {
    import scala.jdk.CollectionConverters._
    Set(TableCapability.BATCH_READ).asJava
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ObjectsScanBuilder(catalogName, version, cd, sconf, rootPath)
}

object ObjectsTable {
  val Schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("namespace", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("def_path", StringType, nullable = false),
    StructField("catalog_version", LongType, nullable = false)))

  /** Translate pushed kind/namespace equalities into key intervals.
    * Fixed-width space-padded keys make every combination a prefix
    * scan; a bare `namespace = 'x'` is THREE intervals (its namespace
    * key, its tables prefix, its views prefix). `None` = no bounds
    * (full walk); `Some(empty)` = provably nothing matches (an
    * unknown kind literal) — the scan plans zero partitions.
    */
  def keyRanges(filters: Seq[Filter], cd: CatalogDef)
      : Option[DistributedTraverse.KeyRanges] = {
    val kinds = filters.collect { case EqualTo("kind", k: String) => k }
    val nss = filters.collect { case EqualTo("namespace", n: String) => n }
    val kind = kinds.headOption
    val ns = nss.headOption
    def prefixRange(p: String): (String, String) = (p, p + "\uffff")
    def kindRanges(k: String): Seq[(String, String)] = (k, ns) match {
      case ("namespace", Some(n)) =>
        val key = ObjectKeys.namespaceKey(n, cd); Seq((key, key + " "))
      case ("namespace", None) => Seq(prefixRange(ObjectKeys.NamespacePrefix))
      case ("table", Some(n)) =>
        Seq(prefixRange(ObjectKeys.tableKeyNamespacePrefix(n, cd)))
      case ("table", None) => Seq(prefixRange(ObjectKeys.TablePrefix))
      case ("view", Some(n)) =>
        Seq(prefixRange(ObjectKeys.viewKeyNamespacePrefix(n, cd)))
      case ("view", None) => Seq(prefixRange(ObjectKeys.ViewPrefix))
      case _ => Seq.empty // unknown kind literal: no rows can match
    }
    kind match {
      case Some(k) => Some(kindRanges(k))
      case None if ns.isDefined =>
        Some(Seq("namespace", "table", "view").flatMap(kindRanges))
      case None => None
    }
  }
}

private class ObjectsScanBuilder(
    catalogName: String,
    version: Long,
    cd: CatalogDef,
    sconf: StorageConf,
    rootPath: String) extends ScanBuilder with SupportsPushDownFilters {

  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("kind", _: String) => true
      case EqualTo("namespace", _: String) => true
      case _ => false
    }
    filters // residual: Spark re-evaluates everything above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan {
    override def readSchema(): StructType = ObjectsTable.Schema

    override def toBatch: Batch = new Batch {
      override def planInputPartitions(): Array[InputPartition] = {
        val spark = org.apache.spark.sql.SparkSession.active
        val par = spark.sparkContext.defaultParallelism
        val rangesOpt = ObjectsTable.keyRanges(pushed.toIndexedSeq, cd)
        if (rangesOpt.exists(_.isEmpty)) return Array.empty
        val ranges = rangesOpt.getOrElse(Seq.empty).toArray
        val (ancestors, cutRoots) = DistributedTraverse.subtreeCut(
          spark, sconf, rootPath,
          cutWidth = math.max(DistributedTraverse.DriverLevelMax, par * 2),
          ranges = ranges.toIndexedSeq)
        // ancestors were already expanded (rows only); cut roots get
        // walked whole on the executors — ~one subtree per core-slot
        val anc =
          if (ancestors.isEmpty) Iterator.empty
          else ancestors.grouped(math.max(1,
            (ancestors.size + par - 1) / par))
            .map(g => ObjectsPartition(g.toArray, descend = false, ranges))
        val subs = cutRoots.grouped(math.max(1,
          (cutRoots.size + 2 * par - 1) / (2 * par)))
          .map(g => ObjectsPartition(g.toArray, descend = true, ranges))
        (anc ++ subs).map(p => p: InputPartition).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new ObjectsReaderFactory(cd, sconf, version)
    }

    override def description(): String =
      s"ObjectsScan($catalogName, filters=${pushed.mkString(",")})"
  }
}

final case class ObjectsPartition(paths: Array[String], descend: Boolean,
    ranges: Array[(String, String)]) extends InputPartition

private class ObjectsReaderFactory(cd: CatalogDef, sconf: StorageConf,
    version: Long) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ObjectsPartition]
    val storage = sconf.create()
    val ranges = part.ranges.toIndexedSeq
    // DFS with an explicit stack: one node open at a time, memory is
    // O(order × depth) regardless of subtree size
    val stack = scala.collection.mutable.Stack.from(part.paths)
    val rows: Iterator[(String, String)] = new Iterator[Vector[(String, String)]] {
      override def hasNext: Boolean = stack.nonEmpty
      override def next(): Vector[(String, String)] = {
        val path = stack.pop()
        val (keep, kids) =
          DistributedTraverse.boundedNode(storage, path, ranges)
        if (part.descend) kids.foreach(stack.push)
        keep.flatMap(r => r.value.map(v => (r.key, v)))
      }
    }.flatten
    val out = rows.map { case (key, defPath) =>
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
        if (out.hasNext) { current = out.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
