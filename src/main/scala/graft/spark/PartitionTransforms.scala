package graft.spark

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Add, And, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IntegralDivide, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, Month, Multiply, Murmur3Hash, Pmod, Substring, Subtract, UnixDate, UnixMicros, Year}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types._

/** Hidden partitioning: a table's partition layout is a list of
  * TRANSFORMS of source columns (reference stores Iceberg partition
  * specs verbatim in its table metadata, proto/objects.proto:58-69;
  * here the transforms are first-class and Spark-native).
  *
  * `identity(c)` partitions on the column itself (the pre-existing
  * layout). The derived transforms — `bucket(n, c)`, `truncate(w, c)`,
  * `years/months/days/hours(c)` — partition on a COMPUTED value that
  * never appears in the table schema: writes add it as a hidden
  * Hive-style directory column (`gp_<kind>_<col>=<value>`), reads prune
  * files by rewriting source-column predicates into derived-value
  * predicates, and queries never mention it. This is what makes
  * time-partitioning usable at 100 TB: `WHERE ts BETWEEN a AND b`
  * prunes day directories without the user ever filtering on a
  * partition column, and `bucket(n, k)` gives equality/join pruning on
  * keys whose min/max stats are useless because every file spans the
  * whole key range.
  *
  * One definition site: the SAME Catalyst expression builds the write
  * path's derived column, the prune path's literal mapping, and the V2
  * function catalog's evaluation — the three can never disagree.
  */
final case class PartitionField(kind: String, col: String, arg: Int = 0) {

  import PartitionTransforms._

  def isIdentity: Boolean = kind == Identity

  /** Hive directory column this field writes/reads. Identity uses the
    * (physical) column itself; derived transforms use a reserved
    * `gp_` name that is never part of the table schema. The name is
    * ARG-QUALIFIED (`gp_bucket8_k`, `gp_truncate3_name`) so a file's
    * directory layout encodes its full transform — partition-spec
    * EVOLUTION can reconstruct any epoch's spec from paths alone, and
    * two epochs bucketing the same column differently never collide in
    * per-file stats.
    */
  def dirName: String =
    if (isIdentity) col
    else if (arg != 0) s"gp_$kind${arg}_$col"
    else s"gp_${kind}_$col"

  /** Value type of the derived directory column. */
  def dirType(srcType: DataType): DataType = kind match {
    case Identity => srcType
    case Bucket | Years | Months | Days | Hours => IntegerType
    case Truncate => srcType
    case other => throw new IllegalArgumentException(s"transform $other")
  }

  /** The transform as a Catalyst expression of `src` (typed
    * `srcType`). Timestamp-derived calendar values use UTC so the
    * layout is independent of the writing session's timezone.
    */
  def expr(src: Expression, srcType: DataType): Expression = {
    def toDate: Expression = srcType match {
      case DateType => src
      case TimestampType => Cast(src, DateType, Some("UTC"))
      case TimestampNTZType => Cast(src, DateType, Some("UTC"))
      case other => throw new IllegalArgumentException(
        s"$kind transform needs a date/timestamp column, got $other")
    }
    kind match {
      case Identity => src
      case Bucket => Pmod(new Murmur3Hash(Seq(src)), Literal(arg))
      case Truncate => srcType match {
        case StringType => Substring(src, Literal(1), Literal(arg))
        case IntegerType => Subtract(src, Pmod(src, Literal(arg)))
        case LongType => Subtract(src, Pmod(src, Literal(arg.toLong)))
        case other => throw new IllegalArgumentException(
          s"truncate needs a string/int/long column, got $other")
      }
      case Years => Subtract(Year(toDate), Literal(1970))
      case Months =>
        Add(Multiply(Subtract(Year(toDate), Literal(1970)), Literal(12)),
          Subtract(Month(toDate), Literal(1)))
      case Days => UnixDate(toDate)
      case Hours => srcType match {
        case TimestampType | TimestampNTZType =>
          // floorDiv(us, 1h): subtract pmod first so the (truncating)
          // integral divide is exact for pre-epoch timestamps too
          val us = UnixMicros(src)
          val h = Literal(3600L * 1000000L)
          Cast(IntegralDivide(Subtract(us, Pmod(us, h)), h), IntegerType)
        case other => throw new IllegalArgumentException(
          s"hours needs a timestamp column, got $other")
      }
      case other => throw new IllegalArgumentException(s"transform $other")
    }
  }

  /** Transform a LITERAL of the source column's type — the prune-time
    * mirror of the write-time derived column. None when the literal
    * can't be transformed (wrong type, overflow): callers skip the
    * predicate, staying conservative.
    */
  def applyToLiteral(l: Literal): Option[Literal] =
    try {
      val e = expr(l, l.dataType)
      val v = e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      if (v == null) None else Some(Literal(v, e.dataType))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Order-preserving transforms map range predicates soundly:
    * a <= b ⇒ T(a) <= T(b). Bucket is the only non-monotonic one.
    */
  def monotonic: Boolean = kind != Bucket && kind != Identity

  /** Spark connector form (what `Table.partitioning()` reports and
    * write distributions cluster on).
    */
  def toTransform: Transform = kind match {
    case Identity => Expressions.identity(col)
    case Bucket => Expressions.bucket(arg, col)
    case Truncate =>
      Expressions.apply(Truncate, Expressions.literal(arg), Expressions.column(col))
    case Years => Expressions.years(col)
    case Months => Expressions.months(col)
    case Days => Expressions.days(col)
    case Hours => Expressions.hours(col)
    case other => throw new IllegalArgumentException(s"transform $other")
  }

  def render: String =
    if (arg != 0) s"$kind($arg,$col)" else s"$kind($col)"
}

object PartitionTransforms {
  val Identity = "identity"
  val Bucket = "bucket"
  val Truncate = "truncate"
  val Years = "years"
  val Months = "months"
  val Days = "days"
  val Hours = "hours"

  private val WithArg = """(\w+)\((\d+)\s*,\s*([^)]+)\)""".r
  private val NoArg = """(\w+)\(([^),]+)\)""".r

  def render(spec: Seq[PartitionField]): String = spec.map(_.render).mkString(";")

  def parse(s: String): Seq[PartitionField] =
    s.split(';').toSeq.filter(_.nonEmpty).map {
      case WithArg(kind, arg, col) => PartitionField(kind, col.trim, arg.toInt)
      case NoArg(kind, col) => PartitionField(kind, col.trim)
      case other => throw new IllegalArgumentException(s"partition field $other")
    }

  /** Connector transforms (from `CREATE TABLE … PARTITIONED BY`) to
    * the stored spec. Argument order is accepted both ways
    * (`bucket(16, c)` and `bucket(c, 16)`), matching the laxity of the
    * DDL surface.
    */
  def fromTransforms(transforms: Seq[Transform]): Seq[PartitionField] =
    transforms.map { t =>
      val refs = t.references()
      require(refs.length == 1,
        s"multi-column partition transform unsupported: $t")
      require(refs(0).fieldNames().length == 1,
        s"nested partition source unsupported: $t")
      val col = refs(0).fieldNames()(0)
      val intArg: Option[Int] = t.arguments().collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.dataType() == IntegerType => l.value().asInstanceOf[Int]
      }
      t.name().toLowerCase match {
        case Identity => PartitionField(Identity, col)
        case Bucket => PartitionField(Bucket, col, intArg.getOrElse(
          throw new IllegalArgumentException(s"bucket needs a count: $t")))
        case Truncate => PartitionField(Truncate, col, intArg.getOrElse(
          throw new IllegalArgumentException(s"truncate needs a width: $t")))
        case "years" | "year" => PartitionField(Years, col)
        case "months" | "month" => PartitionField(Months, col)
        case "days" | "day" => PartitionField(Days, col)
        case "hours" | "hour" => PartitionField(Hours, col)
        case other =>
          throw new IllegalArgumentException(s"unsupported transform $other")
      }
    }

  def dirNames(spec: Seq[PartitionField]): Seq[String] = spec.map(_.dirName)

  private val DirNameRe =
    """gp_(bucket|truncate|years|months|days|hours)(\d*)_(.+)""".r

  /** Reconstruct the partition field a directory-column name encodes
    * (arg-qualified names carry the full transform); a plain schema
    * column name is identity partitioning. None for foreign dirs.
    */
  def fieldForDirName(name: String, schema: StructType): Option[PartitionField] =
    name match {
      case DirNameRe(kind, arg, col) =>
        Some(PartitionField(kind, col, if (arg.isEmpty) 0 else arg.toInt))
      case _ if schema.fieldNames.contains(name) =>
        Some(PartitionField(Identity, name))
      case _ => None
    }

  /** A data file's directory LAYOUT: the Hive `col=value` segment
    * names between the table data dir and the file, in order. Under
    * partition-spec evolution each epoch's files carry their own
    * layout — grouping a scan by layout is what lets one table serve
    * files written under different specs. Files outside the data dir
    * (metadata-only imports) are flat by contract.
    */
  def layoutOf(path: String, dataDir: String): Seq[String] = {
    val base = if (dataDir.endsWith("/")) dataDir else dataDir + "/"
    // a file outside this table's data dir still encodes its layout
    // under its OWN root (a zero-copy fork or registered table reading
    // another table's files); flat metadata-only imports have no root
    val effective =
      if (path.startsWith(base)) Some(base)
      else GraftScanBuilder.dataRootOf(path).map(_ + "/")
    effective match {
      case None => Seq.empty
      case Some(root) =>
        path.drop(root.length).split('/').dropRight(1).toSeq
          .filter(_.contains('='))
          .map(s => s.take(s.indexOf('=')))
    }
  }

  /** The spec one layout encodes, for reading that epoch's files
    * (schema extension typing + per-epoch derived-predicate pruning —
    * args reconstruct exactly, so bucket/truncate literals map
    * correctly for every epoch).
    */
  def specForLayout(layout: Seq[String], schema: StructType): Seq[PartitionField] =
    layout.flatMap(fieldForDirName(_, schema))

  def derivedFields(spec: Seq[PartitionField], schema: StructType): Seq[StructField] =
    spec.filterNot(_.isIdentity).map { f =>
      val src = schema.fields.find(_.name == f.col).getOrElse(
        throw new IllegalArgumentException(
          s"partition source column ${f.col} not in ${schema.simpleString}"))
      StructField(f.dirName, f.dirType(src.dataType), nullable = true)
    }

  /** Schema handed to the delegated parquet machinery: data columns
    * plus the hidden directory columns (typed, so Hive-path parsing
    * never mis-infers `truncate` string values as numbers).
    */
  def extendSchema(schema: StructType, spec: Seq[PartitionField]): StructType =
    if (spec.forall(_.isIdentity)) schema
    else StructType(schema.fields ++ derivedFields(spec, schema))

  /** Rewrite source-column conjuncts into derived-directory-column
    * predicates for stats-based file pruning. Sound per conjunct:
    *  - equality / IN map through every transform;
    *  - range predicates map through monotonic transforms only (with
    *    strictness relaxed — T(a) < T(b) may collapse to equality);
    *  - IS [NOT] NULL maps directly (null source ⇒ null-partition dir).
    * Anything else contributes nothing (conservative).
    */
  def derivedPredicates(filters: Seq[Expression],
      spec: Seq[PartitionField]): Seq[Expression] = {
    val derived = spec.filterNot(_.isIdentity)
    if (derived.isEmpty) return Seq.empty
    val bySource = derived.groupBy(_.col)

    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }

    def attr(f: PartitionField) = UnresolvedAttribute(Seq(f.dirName))

    def mapOne(e: Expression): Seq[Expression] = e match {
      case EqualTo(AttrName(c), l: Literal) => eq(c, l)
      case EqualTo(l: Literal, AttrName(c)) => eq(c, l)
      case In(AttrName(c), vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        bySource.getOrElse(c, Seq.empty).flatMap { f =>
          val mapped = vs.map(v => f.applyToLiteral(v.asInstanceOf[Literal]))
          if (mapped.exists(_.isEmpty)) None
          else Some(In(attr(f), mapped.flatten))
        }
      case GreaterThan(AttrName(c), l: Literal) => lower(c, l)
      case GreaterThanOrEqual(AttrName(c), l: Literal) => lower(c, l)
      case LessThan(AttrName(c), l: Literal) => upper(c, l)
      case LessThanOrEqual(AttrName(c), l: Literal) => upper(c, l)
      case GreaterThan(l: Literal, AttrName(c)) => upper(c, l)
      case GreaterThanOrEqual(l: Literal, AttrName(c)) => upper(c, l)
      case LessThan(l: Literal, AttrName(c)) => lower(c, l)
      case LessThanOrEqual(l: Literal, AttrName(c)) => lower(c, l)
      case IsNull(AttrName(c)) =>
        bySource.getOrElse(c, Seq.empty).map(f => IsNull(attr(f)))
      case IsNotNull(AttrName(c)) =>
        bySource.getOrElse(c, Seq.empty).map(f => IsNotNull(attr(f)))
      case _ => Seq.empty
    }

    def eq(c: String, l: Literal): Seq[Expression] =
      bySource.getOrElse(c, Seq.empty)
        .flatMap(f => f.applyToLiteral(l).map(v => EqualTo(attr(f), v)))

    def lower(c: String, l: Literal): Seq[Expression] =
      bySource.getOrElse(c, Seq.empty).filter(_.monotonic)
        .flatMap(f => f.applyToLiteral(l).map(v => GreaterThanOrEqual(attr(f), v)))

    def upper(c: String, l: Literal): Seq[Expression] =
      bySource.getOrElse(c, Seq.empty).filter(_.monotonic)
        .flatMap(f => f.applyToLiteral(l).map(v => LessThanOrEqual(attr(f), v)))

    filters.flatMap(conjuncts).flatMap(mapOne)
  }
}
