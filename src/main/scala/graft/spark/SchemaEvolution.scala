package graft.spark

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** Multi-part field-path navigation for `ALTER TABLE` schema evolution
  * (SURVEY §2.1; the reference leaves nested schema conversion TODO —
  * IcebergToOlympia.java:196-201 — graft supports nested evolution at
  * any depth). Paths follow Spark's `TableChange.fieldNames()`
  * convention: struct levels by field name, array/map levels via the
  * pseudo-names `element` / `key` / `value`.
  *
  * All nested evolutions are METADATA-ONLY, same as top-level:
  *  - ADD: old files lack the field → parquet schema clipping fills
  *    nulls on read (any depth);
  *  - DROP: the field simply stops being requested;
  *  - RENAME: the nested [[StructField]] keeps its physical name in
  *    field metadata ([[ColumnMapping.PhysKey]]) — scans read physical
  *    and re-label positionally, writes cast logical → physical.
  */
object SchemaEvolution {

  /** The struct containing the LAST path element (for sibling checks
    * before a mutation, e.g. rename-target-exists).
    */
  def parentStruct(schema: StructType, path: Seq[String]): StructType =
    if (path.length == 1) schema
    else descendType(schema(path.head).dataType, path.tail.init,
      path.head) match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"${path.init.mkString(".")} is ${other.simpleString}, not a struct")
    }

  private def descendType(dt: DataType, path: Seq[String], at: String): DataType =
    if (path.isEmpty) dt
    else dt match {
      case s: StructType => descendType(s(path.head).dataType, path.tail, path.head)
      case a: ArrayType if path.head == "element" =>
        descendType(a.elementType, path.tail, "element")
      case m: MapType if path.head == "key" =>
        descendType(m.keyType, path.tail, "key")
      case m: MapType if path.head == "value" =>
        descendType(m.valueType, path.tail, "value")
      case other => throw new IllegalArgumentException(
        s"cannot navigate into $at: ${other.simpleString}")
    }

  /** The PHYSICAL (on-file) dotted path for a logical field path —
    * each struct level mapped through [[ColumnMapping.physicalName]],
    * array/map pseudo-levels passed through. Used to remember dropped
    * fields so a later re-ADD under the same logical name cannot
    * resurrect old file data (the field-ID problem of name-based
    * mapping; graft solves it with a fresh physical name on re-add).
    */
  def physicalPath(schema: StructType, path: Seq[String]): Seq[String] = {
    def walk(dt: DataType, rest: Seq[String]): Seq[String] = rest match {
      case Seq() => Seq.empty
      case head +: tail => dt match {
        case s: StructType =>
          val f = s.fields.find(_.name == head).getOrElse(
            throw new IllegalArgumentException(s"no such column: $head"))
          ColumnMapping.physicalName(f) +: walk(f.dataType, tail)
        case a: ArrayType if head == "element" => head +: walk(a.elementType, tail)
        case m: MapType if head == "key" => head +: walk(m.keyType, tail)
        case m: MapType if head == "value" => head +: walk(m.valueType, tail)
        case other => throw new IllegalArgumentException(
          s"cannot navigate into $head: ${other.simpleString}")
      }
    }
    walk(schema, path)
  }

  /** Apply `op` to the field at `path`. `op(Some(f))` returning `Some`
    * replaces the field in place, `None` deletes it; `op(None)` (no
    * field with that name) returning `Some` appends — so one helper
    * covers ADD / DROP / RENAME / retype / comment at any depth.
    */
  def updateAt(schema: StructType, path: Seq[String],
      op: Option[StructField] => Option[StructField]): StructType =
    path match {
      case Seq(last) =>
        val idx = schema.fieldNames.indexOf(last)
        if (idx < 0) op(None) match {
          case Some(nf) => StructType(schema.fields :+ nf)
          case None =>
            throw new IllegalArgumentException(s"no such column: $last")
        } else op(Some(schema.fields(idx))) match {
          case Some(nf) => StructType(schema.fields.updated(idx, nf))
          case None => StructType(schema.fields.patch(idx, Nil, 1))
        }
      case head +: rest =>
        val idx = schema.fieldNames.indexOf(head)
        require(idx >= 0, s"no such column: $head")
        val f = schema.fields(idx)
        StructType(schema.fields.updated(idx,
          f.copy(dataType = updateIn(f.dataType, rest, op, head))))
      case _ => throw new IllegalArgumentException("empty field path")
    }

  private def updateIn(dt: DataType, path: Seq[String],
      op: Option[StructField] => Option[StructField], at: String): DataType =
    dt match {
      case s: StructType => updateAt(s, path, op)
      case a: ArrayType if path.head == "element" =>
        if (path.tail.isEmpty) throw new IllegalArgumentException(
          "cannot alter the array element itself; alter the array column")
        else a.copy(elementType = updateIn(a.elementType, path.tail, op, "element"))
      case m: MapType if path.head == "key" =>
        if (path.tail.isEmpty) throw new IllegalArgumentException(
          "cannot alter the map key itself; alter the map column")
        else m.copy(keyType = updateIn(m.keyType, path.tail, op, "key"))
      case m: MapType if path.head == "value" =>
        if (path.tail.isEmpty) throw new IllegalArgumentException(
          "cannot alter the map value itself; alter the map column")
        else m.copy(valueType = updateIn(m.valueType, path.tail, op, "value"))
      case other => throw new IllegalArgumentException(
        s"cannot navigate into $at: ${other.simpleString}")
    }
}
