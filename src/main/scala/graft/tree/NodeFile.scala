package graft.tree

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel

/** One row of a tree-node pivot table: key, optional value, optional
  * child-node pointer (docs/format.md:64-86; reference stores the same
  * three columns — TreeOperations.java:62-69).
  */
final case class TreeRow(key: String, value: Option[String], child: Option[String]) {
  def isLive: Boolean = value.isDefined || child.isDefined
}

/** Arrow allocator shared by all tree I/O (nodes are ≤ order rows —
  * tiny; one allocator avoids per-node limit bookkeeping).
  */
object TreeAllocator {
  lazy val root: RootAllocator = new RootAllocator()
}

/** A persisted node file loaded for reading: three VarCharVectors plus
  * file-level metadata. Unlike the reference (which parses system rows
  * stored before a NULL-key marker, TreeOperations.java:139-160), graft
  * stores node/root metadata in the Arrow schema's custom-metadata map —
  * same capability, simpler parsing; the data region is then the whole
  * vector. Binary search runs directly over the Arrow buffers
  * (TreeOperations.java:712-761, TreeUtil.java:43-66) — no row
  * materialization on the lookup path.
  */
final class NodeFile(bytes: Array[Byte]) extends AutoCloseable {
  private val reader = new ArrowFileReader(
    new ByteArrayReadableSeekableByteChannel(bytes), TreeAllocator.root)
  private val root: VectorSchemaRoot = {
    reader.loadNextBatch()
    reader.getVectorSchemaRoot
  }
  private val keyV = root.getVector("key").asInstanceOf[VarCharVector]
  private val valueV = root.getVector("value").asInstanceOf[VarCharVector]
  private val childV = root.getVector("pnode").asInstanceOf[VarCharVector]

  val rowCount: Int = root.getRowCount
  val metadata: Map[String, String] = root.getSchema.getCustomMetadata.asScala.toMap

  def keyBytes(i: Int): Array[Byte] = keyV.get(i)
  def valueBytes(i: Int): Array[Byte] = valueV.get(i)
  def childBytes(i: Int): Array[Byte] = childV.get(i)
  def valueIsNull(i: Int): Boolean = valueV.isNull(i)
  def childIsNull(i: Int): Boolean = childV.isNull(i)
  def key(i: Int): String = new String(keyV.get(i), StandardCharsets.UTF_8)
  def value(i: Int): Option[String] =
    if (valueV.isNull(i)) None else Some(new String(valueV.get(i), StandardCharsets.UTF_8))
  def child(i: Int): Option[String] =
    if (childV.isNull(i)) None else Some(new String(childV.get(i), StandardCharsets.UTF_8))
  def row(i: Int): TreeRow = TreeRow(key(i), value(i), child(i))

  /** Binary search over the key vector, unsigned-byte lexicographic
    * (matches Java String compare for the ASCII key alphabet). Returns
    * index if found, else `-(insertionPoint) - 1`.
    */
  def binarySearch(target: String): Int = {
    val tb = target.getBytes(StandardCharsets.UTF_8)
    var lo = 0
    var hi = rowCount - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = compareBytes(keyV.get(mid), tb)
      if (c == 0) return mid
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    -(lo + 1)
  }

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  override def close(): Unit = reader.close()
}

object NodeFile {
  /** Serialize rows + metadata into one Arrow IPC file (reference
    * writeNodeFile, TreeOperations.java:272-319 — which leaves action
    * persistence commented out; graft persists actions in the root's
    * metadata so cross-process conflict analysis works, SURVEY §4.3.1).
    */
  def write(rows: Seq[TreeRow], metadata: Map[String, String]): Array[Byte] = {
    val utf8 = StandardCharsets.UTF_8
    writeRaw(rows.iterator.map(r => RawRow(r.key.getBytes(utf8),
      r.value.map(_.getBytes(utf8)).orNull,
      r.child.map(_.getBytes(utf8)).orNull)), metadata)
  }

  /** Byte-level write path: rows sourced from persisted slices arrive
    * as the original buffers and transfer without decode/encode
    * (reference SliceRowIterator.transferToTargetVectors,
    * NodeRowMerger.java:91-94 — the core write-amplification
    * optimization, SURVEY §4.2).
    */
  def writeRaw(rows: Iterator[RawRow], metadata: Map[String, String]): Array[Byte] = {
    val fields = Seq("key", "value", "pnode").map(n =>
      new Field(n, FieldType.nullable(new ArrowType.Utf8()), null))
    val schema = new Schema(fields.asJava, metadata.asJava)
    val root = VectorSchemaRoot.create(schema, TreeAllocator.root)
    try {
      val keyV = root.getVector("key").asInstanceOf[VarCharVector]
      val valueV = root.getVector("value").asInstanceOf[VarCharVector]
      val childV = root.getVector("pnode").asInstanceOf[VarCharVector]
      root.allocateNew()
      var i = 0
      rows.foreach { r =>
        keyV.setSafe(i, r.key)
        if (r.value != null) valueV.setSafe(i, r.value) else valueV.setNull(i)
        if (r.child != null) childV.setSafe(i, r.child) else childV.setNull(i)
        i += 1
      }
      root.setRowCount(i)
      val out = new ByteArrayOutputStream()
      val writer = new ArrowFileWriter(root, null, Channels.newChannel(out))
      try {
        writer.start()
        writer.writeBatch()
        writer.end()
      } finally writer.close()
      out.toByteArray
    } finally root.close()
  }
}
