package graft.format

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{MessageType, PrimitiveType}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.util.sketch.BloomFilter

/** Per-data-file bloom filters for point-lookup FILE pruning.
  *
  * Min/max zone maps prune range predicates well, but on a key the
  * file layout is NOT sorted by, every file's [min, max] straddles
  * every probe — a `WHERE k = ?` at 100 TB opens every file. Declaring
  * `graft.file-bloom.columns` on a table makes each data-file commit
  * also write a small SIDECAR object (`<data-file>.bloom`) holding one
  * bloom filter per indexed column; the scan planner probes the
  * sidecars of stats-surviving files for `=` / `IN` predicates and
  * drops files whose filter rules the value out — before any parquet
  * footer is opened. This is the same role Iceberg's Puffin blobs play
  * (reference serves Iceberg interop; docs/iceberg.md): the index
  * rides NEXT TO the data, referenced from metadata, never inflating
  * the snapshot documents themselves (a 1%-fpp filter over 10⁶ rows is
  * ~1.2 MB — per-file metadata must stay ~100 bytes at scale).
  *
  * Determinism: [[BloomFilter]]'s bit pattern is a pure function of
  * the inserted values, so retried commit tasks overwrite sidecars
  * with identical bytes.
  */
object FileBloom {

  /** Table properties (logical column names; commit paths map them to
    * the PHYSICAL names data files store, rename-safe).
    */
  val ColumnsProp = "graft.file-bloom.columns" // comma-separated
  val NdvProp = "graft.file-bloom.ndv" // expected distinct/file (default 100k)
  val FppProp = "graft.file-bloom.fpp" // false-positive rate (default 3%)

  final case class Spec(columns: Seq[String], ndv: Long, fpp: Double)

  /** Parse the table's bloom spec; `renames` maps logical → physical
    * column names (pass [[graft.spark.ColumnMapping.renames]]).
    */
  def specOf(props: Map[String, String],
      renames: Map[String, String]): Option[Spec] =
    props.get(ColumnsProp)
      .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .filter(_.nonEmpty)
      .map { cols =>
        Spec(cols.map(c => renames.getOrElse(c, c)),
          props.get(NdvProp).map(_.toLong).getOrElse(100000L),
          props.get(FppProp).map(_.toDouble).getOrElse(0.03))
      }

  def sidecarKey(dataKey: String): String = dataKey + ".bloom"

  /** Stream ONLY the indexed columns of one local parquet file and
    * build a bloom per column. Columns absent from the file (schema
    * evolution) or of unsupported physical type are skipped — probing
    * a missing filter keeps the file, so skipping is conservative.
    * Supported: INT32/INT64 (hashed as the widened long — covers
    * int/bigint/date/timestamp) and BINARY (hashed as UTF-8 string).
    * NULLs are skipped: `= NULL` never matches, so absence is safe.
    */
  def build(absolutePath: String, spec: Spec): Map[String, BloomFilter] = {
    val conf = new Configuration()
    val fileSchema: MessageType = {
      val r = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(absolutePath), conf))
      try r.getFooter.getFileMetaData.getSchema finally r.close()
    }
    val fields = fileSchema.getFields.asScala.toSeq
    val selected = spec.columns.flatMap { c =>
      fields.find(f => f.getName == c && f.isPrimitive).collect {
        case p: PrimitiveType
            if p.getPrimitiveTypeName == PrimitiveTypeName.INT32 ||
              p.getPrimitiveTypeName == PrimitiveTypeName.INT64 ||
              p.getPrimitiveTypeName == PrimitiveTypeName.BINARY =>
          p
      }
    }
    if (selected.isEmpty) return Map.empty
    val projection = new MessageType(fileSchema.getName,
      (selected: Seq[org.apache.parquet.schema.Type]).asJava)
    conf.set(ReadSupport.PARQUET_READ_SCHEMA, projection.toString)
    val blooms = selected.map(p =>
      p.getName -> BloomFilter.create(spec.ndv, spec.fpp)).toMap
    val reader = ParquetReader
      .builder(new GroupReadSupport(), new Path(absolutePath))
      .withConf(conf).build()
    try {
      var g = reader.read()
      while (g != null) {
        var i = 0
        while (i < selected.length) {
          val p = selected(i)
          if (g.getFieldRepetitionCount(i) > 0) {
            p.getPrimitiveTypeName match {
              case PrimitiveTypeName.INT64 =>
                blooms(p.getName).putLong(g.getLong(i, 0))
              case PrimitiveTypeName.INT32 =>
                blooms(p.getName).putLong(g.getInteger(i, 0).toLong)
              case _ =>
                blooms(p.getName).putString(g.getBinary(i, 0).toStringUsingUTF8)
            }
          }
          i += 1
        }
        g = reader.read()
      }
    } finally reader.close()
    blooms
  }

  private val Magic = 0x47424c4d // "GBLM"

  def serialize(blooms: Map[String, BloomFilter]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(1) // version
    out.writeInt(blooms.size)
    blooms.toSeq.sortBy(_._1).foreach { case (name, bf) =>
      out.writeUTF(name)
      val b = new ByteArrayOutputStream()
      bf.writeTo(b)
      out.writeInt(b.size())
      b.writeTo(out)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Map[String, BloomFilter] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a graft bloom sidecar")
    require(in.readInt() == 1, "unsupported bloom sidecar version")
    val n = in.readInt()
    (0 until n).map { _ =>
      val name = in.readUTF()
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      name -> BloomFilter.readFrom(new ByteArrayInputStream(buf))
    }.toMap
  }
}
