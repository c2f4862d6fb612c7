package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** V2 catalog functions backing the partition transforms. Spark
  * resolves a transform in a write distribution or a reported
  * [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * by loading a function of the same name from the table's catalog
  * (empty namespace) — these are those functions. Their results MUST
  * equal [[PartitionField.expr]]'s evaluation (the write path): bucket
  * is `pmod(murmur3(v, seed 42), n)` exactly like Catalyst's `hash()`,
  * calendar transforms use UTC, truncate matches `substring`/`v -
  * pmod(v, w)`.
  *
  * Two scans reporting `bucket(16, k)` partitioning through this
  * catalog satisfy Spark's storage-partitioned-join compatibility
  * check (same canonical name, same bucket count), so co-bucketed
  * tables join with NO shuffle — the layout-for-joins story at 100 TB.
  */
object GraftFunctionCatalog {

  val TransformNames: Seq[String] =
    Seq("bucket", "truncate", "years", "months", "days", "hours")

  /** Text-analysis scalars exposed to SQL:
    * `SELECT cat.system.token_count(text)` — the pipeline's per-row
    * primitives callable from any query without importing the library.
    */
  val TextNames: Seq[String] = Seq("token_count", "simhash64", "fingerprint64")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket" => Some(new UnboundTransform("bucket", hasArg = true))
    case "truncate" => Some(new UnboundTransform("truncate", hasArg = true))
    case "years" | "months" | "days" | "hours" =>
      Some(new UnboundTransform(name.toLowerCase, hasArg = false))
    case "token_count" =>
      Some(textFn("token_count", IntegerType, s =>
        Int.box(s.trim.split("\\s+").length)))
    case "simhash64" =>
      Some(textFn("simhash64", LongType, s =>
        Long.box(graft.functions.SimHash64.compute(s))))
    case "fingerprint64" =>
      Some(textFn("fingerprint64", LongType, s =>
        Long.box(graft.functions.Fingerprint64.compute(s))))
    case _ => None
  }

  /** One-string-argument scalar over a shared core. */
  private def textFn(fname: String, out: DataType,
      f: String => Any): UnboundFunction = new UnboundFunction {
    override def name(): String = fname
    override def description(): String = s"graft text function $fname"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1 &&
        (inputType.fields(0).dataType == StringType ||
          inputType.fields(0).dataType == NullType), // NULL literal arg
        s"$fname expects one string argument, got $inputType")
      new ScalarFunction[Any] {
        override def inputTypes(): Array[DataType] = Array(StringType)
        override def resultType(): DataType = out
        override def name(): String = fname
        override def canonicalName(): String = s"graft.$fname(string)"
        override def isResultNullable: Boolean = true
        override def isDeterministic: Boolean = true
        override def produceResult(row: InternalRow): Any =
          if (row.isNullAt(0)) null else f(row.getUTF8String(0).toString)
      }
    }
  }

  private val TimeTypes: Set[DataType] =
    Set(DateType, TimestampType, TimestampNTZType)

  private class UnboundTransform(fname: String, hasArg: Boolean)
      extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"graft partition transform $fname"

    override def bind(inputType: StructType): BoundFunction = {
      val n = inputType.fields.length
      // (width/count, value) for bucket/truncate — either order, the
      // int literal may precede or follow the column; (value) otherwise
      if (hasArg) {
        require(n == 2, s"$fname expects (int, col), got $inputType")
        val argFirst = inputType.fields(0).dataType == IntegerType &&
          (fname == "bucket" || inputType.fields(1).dataType == StringType ||
            inputType.fields(1).dataType == LongType ||
            inputType.fields(1).dataType == IntegerType)
        val valueIdx = if (argFirst) 1 else 0
        val srcType = inputType.fields(valueIdx).dataType
        checkSrc(srcType)
        new BoundTransform(fname, inputType, srcType, valueIdx, 1 - valueIdx)
      } else {
        require(n == 1, s"$fname expects one column, got $inputType")
        val srcType = inputType.fields(0).dataType
        checkSrc(srcType)
        new BoundTransform(fname, inputType, srcType, 0, -1)
      }
    }

    private def checkSrc(t: DataType): Unit = fname match {
      case "bucket" => () // murmur3 hashes any atomic type
      case "truncate" => require(
        t == StringType || t == IntegerType || t == LongType,
        s"truncate needs string/int/long, got $t")
      case "hours" => require(t == TimestampType || t == TimestampNTZType,
        s"hours needs a timestamp, got $t")
      case _ => require(TimeTypes(t), s"$fname needs date/timestamp, got $t")
    }
  }

  /** All transforms produce int except truncate (source type). */
  private class BoundTransform(
      fname: String,
      input: StructType,
      srcType: DataType,
      valueIdx: Int,
      argIdx: Int) extends ScalarFunction[Any] {

    override def inputTypes(): Array[DataType] = input.fields.map(_.dataType)
    override def resultType(): DataType =
      if (fname == "truncate") srcType else IntegerType
    override def name(): String = fname
    override def canonicalName(): String =
      s"graft.$fname(${srcType.catalogString})"
    override def isResultNullable: Boolean = true
    override def isDeterministic: Boolean = true

    /** Micros since epoch → days since epoch (floor). */
    private def microsToDays(us: Long): Int =
      Math.floorDiv(us, 86400L * 1000000L).toInt

    private def toEpochDays(v: Any): Int = srcType match {
      case DateType => v.asInstanceOf[Int]
      case _ => microsToDays(v.asInstanceOf[Long])
    }

    override def produceResult(row: InternalRow): Any = {
      if (row.isNullAt(valueIdx)) return null
      lazy val arg = row.getInt(argIdx)
      fname match {
        case "bucket" =>
          val h = Murmur3HashFunction.hash(
            row.get(valueIdx, srcType), srcType, 42L).toInt
          ((h % arg) + arg) % arg
        case "truncate" => srcType match {
          case StringType =>
            row.getUTF8String(valueIdx).substringSQL(1, arg)
          case IntegerType =>
            val v = row.getInt(valueIdx)
            v - (((v % arg) + arg) % arg)
          case LongType =>
            val v = row.getLong(valueIdx)
            val w = arg.toLong
            v - (((v % w) + w) % w)
        }
        case "days" => toEpochDays(row.get(valueIdx, srcType))
        case "hours" =>
          Math.floorDiv(row.getLong(valueIdx), 3600L * 1000000L).toInt
        case "years" =>
          java.time.LocalDate.ofEpochDay(
            toEpochDays(row.get(valueIdx, srcType)).toLong).getYear - 1970
        case "months" =>
          val d = java.time.LocalDate.ofEpochDay(
            toEpochDays(row.get(valueIdx, srcType)).toLong)
          (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
      }
    }
  }
}
