package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Z-order (Morton) sort key over N columns: each value normalizes to
  * an order-preserving unsigned 64-bit word, and the words' bits
  * interleave MSB-first into an 8·N-byte binary. Sorting by that
  * binary lexicographically clusters rows so that a file's [min,max]
  * range is tight in EVERY dimension at once — after a z-ordered
  * rewrite, a selective filter on ANY of the participating columns
  * prunes most files from snapshot stats, where a single-column sort
  * only serves its one column. This is the multi-dimensional layout
  * maintenance a 100 TB fact table needs when queries filter sometimes
  * by time, sometimes by key.
  *
  * Maintenance-path expression (compaction rewrites, not per-query
  * hot paths) — interpreted eval is deliberate; the rewrite cost is
  * dominated by parquet IO.
  *
  * Normalizations (order-preserving into unsigned 64):
  *  - integral/date/timestamp: sign-bit flip
  *  - float/double: IEEE-754 total-order transform
  *  - string: first 8 bytes of UTF-8, big-endian, zero-padded
  *  - null: all-zeros (sorts first, like NULLS FIRST)
  */
@ExpressionDescription(
  usage = "graft_zorder(col1, col2, ...) - interleaved z-order sort key")
case class ZOrderKey(children: Seq[Expression])
    extends Expression with CodegenFallback {

  require(children.nonEmpty, "zorder needs at least one column")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val bad = children.filterNot(c => ZOrderKey.supported(c.dataType))
    if (bad.isEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder does not support type(s): ${bad.map(_.dataType.simpleString).mkString(", ")}")
  }

  override def eval(input: InternalRow): Any = {
    val d = children.length
    val words = new Array[Long](d)
    var i = 0
    while (i < d) {
      val c = children(i)
      val v = c.eval(input)
      words(i) = if (v == null) 0L else ZOrderKey.normalize(v, c.dataType)
      i += 1
    }
    val out = new Array[Byte](8 * d)
    // output bit b (0 = MSB of out) takes bit (b / d) of word (b % d)
    var b = 0
    val total = 64 * d
    while (b < total) {
      val word = words(b % d)
      val bit = (word >>> (63 - (b / d))) & 1L
      if (bit != 0L) out(b >> 3) = (out(b >> 3) | (0x80 >> (b & 7))).toByte
      b += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderKey {
  def supported(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType |
         StringType | BooleanType => true
    case _ => false
  }

  /** Order-preserving map into unsigned-compared 64-bit. */
  def normalize(v: Any, t: DataType): Long = t match {
    case LongType | TimestampType | TimestampNTZType =>
      v.asInstanceOf[Long] ^ Long.MinValue
    case IntegerType | DateType =>
      (v.asInstanceOf[Int].toLong - Int.MinValue.toLong) << 32
    case ShortType => (v.asInstanceOf[Short].toLong - Short.MinValue.toLong) << 48
    case ByteType => (v.asInstanceOf[Byte].toLong - Byte.MinValue.toLong) << 56
    case BooleanType => if (v.asInstanceOf[Boolean]) 1L << 63 else 0L
    case FloatType => doubleWord(v.asInstanceOf[Float].toDouble)
    case DoubleType => doubleWord(v.asInstanceOf[Double])
    case StringType =>
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var w = 0L
      var i = 0
      while (i < 8) {
        w = (w << 8) | (if (i < bytes.length) bytes(i) & 0xffL else 0L)
        i += 1
      }
      w
    case other => throw new IllegalArgumentException(s"zorder: $other")
  }

  /** IEEE-754 total-order transform: negative floats reverse, positive
    * floats shift above them; NaN sorts last.
    */
  private def doubleWord(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d)
    (if (bits < 0) ~bits else bits ^ Long.MinValue)
  }
}
