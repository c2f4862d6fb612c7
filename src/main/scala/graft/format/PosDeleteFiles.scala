package graft.format

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

/** Position-delete object IO: standard parquet of
  * `(file STRING, pos BIGINT)` rows, sorted by (file, pos). Written by
  * delta-write tasks and read back per data file by scan tasks — both
  * sides run on EXECUTORS through the plain parquet-mr API (no
  * SparkSession), so a 1000-executor scan loads each file's delete set
  * where the file is read, never through the driver. Being ordinary
  * parquet, the objects are also directly readable by any engine (the
  * CDC path reads them as a DataFrame).
  *
  * The `file` column carries the path exactly as the scan's `_file`
  * metadata column renders it ([[org.apache.spark.sql.graft.SparkInternals.partitionFilePath]]:
  * the URI path of the absolute file location) — writer and reader
  * derive it the same way, so matching is exact string equality.
  */
object PosDeleteFiles {

  val Schema: MessageType = MessageTypeParser.parseMessageType(
    """message posdelete {
      |  required binary file (UTF8);
      |  required int64 pos;
      |}""".stripMargin)

  /** Streaming writer for one delete object. Not thread-safe. */
  final class Writer(abs: String, conf: Configuration) {
    private val factory = new SimpleGroupFactory(Schema)
    private val files = mutable.LinkedHashSet.empty[String]
    private var rows = 0L
    private val writer = {
      val c = new Configuration(conf)
      org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(Schema, c)
      ExampleParquetWriter.builder(new Path(abs))
        .withConf(c)
        .withType(Schema)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
    }

    def add(file: String, pos: Long): Unit = {
      val g = factory.newGroup()
      g.append("file", file)
      g.append("pos", pos)
      writer.write(g)
      files += file
      rows += 1
    }

    /** (distinct data files referenced, row count). */
    def close(): (Seq[String], Long) = {
      writer.close()
      (files.toSeq, rows)
    }

    def abort(): Unit = {
      try writer.close() catch { case _: Throwable => () }
      try new Path(abs).getFileSystem(conf).delete(new Path(abs), false)
      catch { case _: Throwable => () }
    }
  }

  /** The deleted positions of ONE data file, unioned across the given
    * delete objects (executor-side; a position deleted twice — racing
    * deltas that both observed the row — collapses in the set).
    */
  def positionsFor(deleteAbs: Seq[String], dataFile: String,
      conf: Configuration): java.util.HashSet[java.lang.Long] = {
    val out = new java.util.HashSet[java.lang.Long]()
    deleteAbs.foreach { abs =>
      val reader = ParquetReader
        .builder[Group](new GroupReadSupport(), new Path(abs))
        .withConf(conf)
        .build()
      try {
        var g = reader.read()
        while (g != null) {
          if (g.getString("file", 0) == dataFile)
            out.add(g.getLong("pos", 0))
          g = reader.read()
        }
      } finally reader.close()
    }
    out
  }
}
