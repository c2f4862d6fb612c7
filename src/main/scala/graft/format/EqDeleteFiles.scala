package graft.format

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.types._

/** Equality-delete object IO. An equality delete is ordinary parquet
  * holding the DISTINCT key tuples of one upsert batch (physical column
  * names, native types — written by a plain Spark parquet job over the
  * batch's own data files). A delete with sequence S logically deletes
  * every row whose key tuple matches in every data file with
  * `entry.seq < S` — strictly older files only, so a batch never
  * deletes its own rows and "upsert" means delete-then-insert across
  * commits (the Flink/Iceberg streaming-upsert shape; reference scope:
  * the reference delegates row-level deletes to its Iceberg bridge,
  * docs/iceberg.md, which has no native upsert path — this is a
  * capability the rebuild adds).
  *
  * Scan tasks load the applicable objects' key sets EXECUTOR-SIDE
  * through plain parquet-mr (no SparkSession) — a 1000-executor scan
  * loads delete keys where the files are read, never through the
  * driver; per-JVM soft caching keeps one copy per executor.
  *
  * Key tuples normalize into `Seq[Any]` the same way on both sides
  * (write: parquet groups; read: InternalRow ordinals): integral and
  * date values widen to java.lang.Long, strings to String, booleans
  * stay. Float/double/timestamp keys are refused up front — binary
  * round-trips make them unreliable identifiers (Iceberg's identifier
  * fields carry the same restriction).
  */
object EqDeleteFiles {

  /** Types allowed as upsert key columns. */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         StringType | BooleanType => true
    case _ => false
  }

  def requireSupported(name: String, dt: DataType): Unit =
    require(supported(dt),
      s"upsert key column $name has unsupported type ${dt.sql} " +
        "(allowed: integral, string, boolean, date)")

  /** Null-safe canonical form of one key component (null keys match
    * null — IS NOT DISTINCT FROM semantics, like Iceberg's equality
    * deletes).
    */
  private object NullKey

  /** Key tuple of an InternalRow under (ordinal, type) extractors. */
  def rowKey(row: org.apache.spark.sql.catalyst.InternalRow,
      ordinals: Array[Int], types: Array[DataType]): Seq[Any] = {
    val out = new Array[Any](ordinals.length)
    var i = 0
    while (i < ordinals.length) {
      val o = ordinals(i)
      out(i) =
        if (row.isNullAt(o)) NullKey
        else types(i) match {
          case ByteType => row.getByte(o).toLong
          case ShortType => row.getShort(o).toLong
          case IntegerType | DateType => row.getInt(o).toLong
          case LongType => row.getLong(o)
          case StringType => row.getUTF8String(o).toString
          case BooleanType => row.getBoolean(o)
          case dt => throw new IllegalStateException(s"unsupported key type $dt")
        }
      i += 1
    }
    out.toSeq
  }

  /** Key tuple of one parquet-mr Group (the delete object's row). */
  private def groupKey(g: Group, cols: Seq[String],
      types: Seq[DataType]): Seq[Any] =
    cols.indices.map { i =>
      if (g.getFieldRepetitionCount(cols(i)) == 0) NullKey
      else types(i) match {
        case ByteType | ShortType | IntegerType | DateType =>
          g.getInteger(cols(i), 0).toLong
        case LongType => g.getLong(cols(i), 0)
        case StringType => g.getString(cols(i), 0)
        case BooleanType => g.getBoolean(cols(i), 0)
        case dt => throw new IllegalStateException(s"unsupported key type $dt")
      }
    }

  /** The key set of one delete object (executor-side parquet-mr read).
    * Soft-cached per JVM by absolute path — delete objects are
    * immutable, so every scan task on an executor shares one copy.
    */
  def keySet(abs: String, cols: Seq[String], types: Seq[DataType],
      conf: Configuration): java.util.HashSet[Seq[Any]] = {
    val cached = cache.get(abs)
    val got = if (cached == null) null else cached.get()
    if (got != null) return got
    val out = new java.util.HashSet[Seq[Any]]()
    val reader = ParquetReader
      .builder[Group](new GroupReadSupport(), new Path(abs))
      .withConf(conf)
      .build()
    try {
      var g = reader.read()
      while (g != null) {
        out.add(groupKey(g, cols, types))
        g = reader.read()
      }
    } finally reader.close()
    cache.put(abs, new java.lang.ref.SoftReference(out))
    out
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.ref.SoftReference[java.util.HashSet[Seq[Any]]]]()

  /** Streaming writer of one equality-delete object from key-tuple
    * [[org.apache.spark.sql.catalyst.InternalRow]]s (field i = key
    * column i, in `cols` order). Executor-side parquet-mr, same
    * pattern as [[PosDeleteFiles.Writer]]; the schema annotates
    * strings UTF8 and dates DATE so Spark's own reader (the rewrite
    * path reads these objects as a DataFrame) sees the native types.
    * Not thread-safe.
    */
  final class Writer(abs: String, cols: Seq[String], types: Seq[DataType],
      conf: Configuration) {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types => PTypes}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    cols.zip(types).foreach { case (c, t) => requireSupported(c, t) }
    private val schema: org.apache.parquet.schema.MessageType = {
      val b = PTypes.buildMessage()
      cols.zip(types).foreach { case (c, t) =>
        t match {
          case ByteType | ShortType | IntegerType =>
            b.addField(PTypes.optional(PrimitiveTypeName.INT32).named(c))
          case DateType =>
            b.addField(PTypes.optional(PrimitiveTypeName.INT32)
              .as(LogicalTypeAnnotation.dateType()).named(c))
          case LongType =>
            b.addField(PTypes.optional(PrimitiveTypeName.INT64).named(c))
          case BooleanType =>
            b.addField(PTypes.optional(PrimitiveTypeName.BOOLEAN).named(c))
          case _ =>
            b.addField(PTypes.optional(PrimitiveTypeName.BINARY)
              .as(LogicalTypeAnnotation.stringType()).named(c))
        }
      }
      b.named("eqdelete")
    }
    private val factory =
      new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
    private var rows = 0L
    private val writer = {
      val c = new Configuration(conf)
      org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(schema, c)
      org.apache.parquet.hadoop.example.ExampleParquetWriter
        .builder(new Path(abs))
        .withConf(c)
        .withType(schema)
        .withCompressionCodec(
          org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
        .build()
    }

    def add(id: org.apache.spark.sql.catalyst.InternalRow): Unit = {
      val g = factory.newGroup()
      var i = 0
      while (i < cols.length) {
        if (!id.isNullAt(i)) types(i) match {
          case ByteType => g.append(cols(i), id.getByte(i).toInt)
          case ShortType => g.append(cols(i), id.getShort(i).toInt)
          case IntegerType | DateType => g.append(cols(i), id.getInt(i))
          case LongType => g.append(cols(i), id.getLong(i))
          case BooleanType => g.append(cols(i), id.getBoolean(i))
          case _ => g.append(cols(i), id.getUTF8String(i).toString)
        }
        i += 1
      }
      writer.write(g)
      rows += 1
    }

    /** Row count written. */
    def close(): Long = { writer.close(); rows }

    def abort(): Unit = {
      try writer.close() catch { case _: Throwable => () }
      try new Path(abs).getFileSystem(conf).delete(new Path(abs), false)
      catch { case _: Throwable => () }
    }
  }

  /** Union key set of several delete objects sharing one column list. */
  def keysFor(deleteAbs: Seq[String], cols: Seq[String],
      types: Seq[DataType], conf: Configuration)
      : java.util.HashSet[Seq[Any]] =
    if (deleteAbs.lengthCompare(1) == 0)
      keySet(deleteAbs.head, cols, types, conf)
    else {
      val out = new java.util.HashSet[Seq[Any]]()
      deleteAbs.foreach(a => out.addAll(keySet(a, cols, types, conf)))
      out
    }
}
