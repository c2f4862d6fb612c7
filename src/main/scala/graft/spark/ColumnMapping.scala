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

  /** logical → physical, only for columns whose names differ. */
  def renames(schema: StructType): Map[String, String] =
    schema.fields.iterator.flatMap { f =>
      val p = physicalName(f)
      if (p != f.name) Some(f.name -> p) else None
    }.toMap

  /** The schema as data files see it: physical names, mapping
    * metadata dropped (types/order/nullability unchanged).
    */
  def toPhysical(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      f.copy(name = physicalName(f), metadata = stripPhys(f.metadata))
    })

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

  /** Rename a DataFrame's columns logical → physical before a write. */
  def toPhysicalDf(df: DataFrame, schema: StructType): DataFrame = {
    val m = renames(schema)
    if (m.isEmpty) df
    else m.foldLeft(df) { case (d, (logical, physical)) =>
      d.withColumnRenamed(logical, physical)
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
