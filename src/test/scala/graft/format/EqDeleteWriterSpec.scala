package graft.format

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The executor-side equality-delete writer (parquet-mr) must
  * round-trip exactly through the executor-side reader `keySet` — the
  * pair is the wire format of the equality-delete MERGE mode, and a
  * normalization mismatch between them silently un-deletes rows.
  */
class EqDeleteWriterSpec extends AnyFunSuite {

  private val conf = new Configuration(false)

  private def tmp(): String =
    Files.createTempDirectory("graft-eqw").resolve("eq.parquet").toString

  test("long/string/int keys round-trip through write + keySet") {
    val cols = Seq("k", "name", "bucket")
    val types = Seq[DataType](LongType, StringType, IntegerType)
    val rnd = new scala.util.Random(42)
    val rows: Seq[(Long, Option[String], Int)] = (0 until 500).map { _ =>
      (rnd.nextLong(),
        if (rnd.nextInt(10) == 0) None
        else Some(rnd.alphanumeric.take(rnd.nextInt(12)).mkString),
        rnd.nextInt())
    }
    val abs = tmp()
    val w = new EqDeleteFiles.Writer(abs, cols, types, conf)
    rows.foreach { case (k, name, b) =>
      w.add(InternalRow(k, name.map(UTF8String.fromString).orNull, b))
    }
    assert(w.close() == rows.length)
    val got = EqDeleteFiles.keySet(abs, cols, types, conf)
    // the reader normalizes the same way rowKey does on scan rows: the
    // key of every written row must be IN the set, nothing else
    val expect = rows.map { case (k, name, b) =>
      EqDeleteFiles.rowKey(
        InternalRow(k, name.map(UTF8String.fromString).orNull, b),
        Array(0, 1, 2), types.toArray)
    }.toSet
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet == expect)
  }

  test("boolean and date keys round-trip; null components match null") {
    val cols = Seq("active", "day")
    val types = Seq[DataType](BooleanType, DateType)
    val abs = tmp()
    val w = new EqDeleteFiles.Writer(abs, cols, types, conf)
    w.add(InternalRow(true, 19723))
    w.add(InternalRow(false, null))
    w.add(InternalRow(null, 0))
    assert(w.close() == 3)
    val got = EqDeleteFiles.keySet(abs, cols, types, conf)
    assert(got.size() == 3)
    assert(got.contains(EqDeleteFiles.rowKey(
      InternalRow(true, 19723), Array(0, 1), types.toArray)))
    assert(got.contains(EqDeleteFiles.rowKey(
      InternalRow(false, null), Array(0, 1), types.toArray)))
    assert(got.contains(EqDeleteFiles.rowKey(
      InternalRow(null, 0), Array(0, 1), types.toArray)))
    assert(!got.contains(EqDeleteFiles.rowKey(
      InternalRow(true, 1), Array(0, 1), types.toArray)))
  }
}
