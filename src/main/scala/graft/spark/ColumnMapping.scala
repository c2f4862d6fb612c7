package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Rename-safe column identity (SURVEY §2.1 alterTable; reference
  * Olympia.java:440-491 rewrites the whole def — graft keeps data
  * files immutable instead).
  *
  * `ALTER TABLE … RENAME COLUMN` is METADATA-ONLY: the stored schema
  * field takes the new (logical) name and remembers the column's
  * original — PHYSICAL — name in field metadata. Data files, whenever
  * written, always use physical names, so a rename never rewrites a
  * byte of data and old + new files stay byte-compatible:
  *
  *  - the scan delegates to parquet under PHYSICAL names and re-labels
  *    the result schema (purely positional, zero row work);
  *  - writes rename logical → physical before hitting parquet;
  *  - file-stat pruning and conflict read-intervals translate
  *    predicate attributes to physical so they line up with the
  *    footer-harvested stats keys.
  *
  * The compatibility rule (documented for users): RENAME = metadata
  * only, any depth of re-renames keeps the original physical name;
  * TYPE change = widening only (byte→short→int→long, float→double,
  * int→double) — Spark's parquet readers promote those on read, so
  * retype is also metadata-only; nullability may only RELAX (NOT NULL
  * → nullable): tightening would need a data scan to prove.
  */
object ColumnMapping {

  /** Field-metadata key holding a column's physical (on-file) name. */
  val PhysKey = "graft.physical"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey) else f.name

  /** logical → physical, only for TOP-LEVEL columns whose names differ
    * (attribute-reference rewriting; nested field access is ordinal-
    * based in Catalyst, so only the attribute name needs mapping).
    */
  def renames(schema: StructType): Map[String, String] =
    schema.fields.iterator.flatMap { f =>
      val p = physicalName(f)
      if (p != f.name) Some(f.name -> p) else None
    }.toMap

  /** True when any field — at any nesting depth — carries a physical
    * name differing from its logical one.
    */
  def hasRenames(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case s: StructType =>
      s.fields.exists(f => f.metadata.contains(PhysKey) || hasRenames(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hasRenames(a.elementType)
    case m: org.apache.spark.sql.types.MapType =>
      hasRenames(m.keyType) || hasRenames(m.valueType)
    case _ => false
  }

  /** The schema as data files see it: physical names at EVERY depth
    * (struct fields inside structs/arrays/maps included), mapping
    * metadata dropped (types/order/nullability unchanged).
    */
  def toPhysical(schema: StructType): StructType =
    StructType(schema.fields.map(physField))

  private def physField(f: StructField): StructField =
    f.copy(name = physicalName(f), dataType = physType(f.dataType),
      metadata = stripPhys(f.metadata))

  private def physType(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(physField))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = physType(a.elementType))
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = physType(m.keyType), valueType = physType(m.valueType))
    case other => other
  }

  /** Map a PRUNED required schema to physical names by consulting the
    * full table schema (the required copy may have lost field metadata
    * on its way through Catalyst, so the table schema is the source of
    * truth for physical names). Fields Spark pruned away are absent;
    * structure is otherwise parallel.
    */
  def toPhysicalRequired(required: StructType, table: StructType): StructType =
    StructType(required.fields.map { rf =>
      table.fields.find(_.name == rf.name) match {
        case Some(tf) => rf.copy(name = physicalName(tf),
          dataType = physRequiredType(rf.dataType, tf.dataType),
          metadata = stripPhys(rf.metadata))
        case None => rf // metadata column etc. — not table data
      }
    })

  private def physRequiredType(req: org.apache.spark.sql.types.DataType,
      tab: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = (req, tab) match {
    case (r: StructType, t: StructType) => toPhysicalRequired(r, t)
    case (r: org.apache.spark.sql.types.ArrayType,
          t: org.apache.spark.sql.types.ArrayType) =>
      r.copy(elementType = physRequiredType(r.elementType, t.elementType))
    case (r: org.apache.spark.sql.types.MapType,
          t: org.apache.spark.sql.types.MapType) =>
      r.copy(keyType = physRequiredType(r.keyType, t.keyType),
        valueType = physRequiredType(r.valueType, t.valueType))
    case _ => req
  }

  private def stripPhys(m: Metadata): Metadata =
    if (!m.contains(PhysKey)) m
    else new MetadataBuilder().withMetadata(m).remove(PhysKey).build()

  /** Rewrite attribute references logical → physical (file pruning,
    * parquet pushdown, conflict intervals all key on physical names).
    */
  def toPhysicalExpr(e: Expression, m: Map[String, String]): Expression =
    if (m.isEmpty) e
    else e.transform {
      case a: Attribute if m.contains(a.name) => a.withName(m(a.name))
      case u: UnresolvedAttribute if m.contains(u.nameParts.last) =>
        UnresolvedAttribute(u.nameParts.init :+ m(u.nameParts.last))
    }

  /** Rename a DataFrame's columns logical → physical before a write.
    * Nested renames ride a struct→struct cast: same arity and types,
    * only field names differ, so the cast is positional and free.
    */
  def toPhysicalDf(df: DataFrame, schema: StructType): DataFrame = {
    if (!hasRenames(schema)) df
    else schema.fields.foldLeft(df) { (d, f) =>
      val pt = physType(f.dataType)
      val recased =
        if (pt == f.dataType) d else d.withColumn(f.name, d.col(f.name).cast(pt))
      val p = physicalName(f)
      if (p == f.name) recased else recased.withColumnRenamed(f.name, p)
    }
  }

  /** Widening-only retype rule (metadata-only: parquet readers promote
    * these on read; anything else would silently corrupt old files).
    */
  def canWiden(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType | DoubleType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
  }
}
