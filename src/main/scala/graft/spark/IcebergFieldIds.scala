package graft.spark

import org.apache.spark.sql.types._

/** STABLE Iceberg field ids across schema evolution.
  *
  * The served Iceberg schema assigns field ids
  * ([[graft.serve.IcebergRest.toIcebergSchema]]); derived positionally
  * they are spec-legal but hostile to external engines that cache them
  * — dropping a column renumbers every later field on the next load
  * (the documented delta of the REST evolution plane). The fix:
  * persist `{physical path → id}` in the table properties at every
  * schema evolution. Physical paths are stable across renames
  * ([[ColumnMapping]] — a rename changes only the logical name), drops
  * RETIRE ids (never reused; `last` keeps the high-water mark, exactly
  * Iceberg's `last-column-id` contract), adds allocate fresh ids.
  * Legacy tables without the property serve positional ids — exactly
  * the previous behavior, and identical to what the seeded map would
  * contain — until their first evolution persists a map seeded from
  * the PRE-evolution schema, so even that first evolution is stable.
  *
  * Path encoding (pre-order, matching toIcebergSchema's walk): struct
  * fields by physical name (`a`, `a.b`), list elements as
  * `<path>.element`, map keys/values as `<path>.key` / `<path>.value`.
  */
object IcebergFieldIds {

  /** Table property: `last:<n>;<path>=<id>;...` (flat text — no JSON
    * nesting inside the property map).
    */
  val Prop = "graft.iceberg.field-ids"

  /** Pre-order physical paths in the exact order toIcebergSchema
    * assigns ids: all siblings of a struct before any child's nested
    * fields; array element id before the element's own fields; map
    * key id, key fields, value id, value fields.
    */
  def paths(schema: StructType): Seq[String] = walkStruct(schema, "")

  private def walkStruct(s: StructType, prefix: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val mine = s.fields.map(f => prefix + ColumnMapping.physicalName(f))
    out ++= mine
    s.fields.zip(mine).foreach { case (f, p) =>
      out ++= walkType(f.dataType, p + ".")
    }
    out.result()
  }

  private def walkType(dt: DataType, prefix: String): Seq[String] = dt match {
    case st: StructType => walkStruct(st, prefix)
    case a: ArrayType =>
      (prefix + "element") +: walkType(a.elementType, prefix + "element.")
    case m: MapType =>
      Seq(prefix + "key") ++ walkType(m.keyType, prefix + "key.") ++
        Seq(prefix + "value") ++ walkType(m.valueType, prefix + "value.")
    case _ => Seq.empty
  }

  /** The stored map, when present and parseable. */
  def fromProps(props: Map[String, String]): Option[(Map[String, Int], Int)] =
    props.get(Prop).flatMap { v =>
      try {
        val parts = v.split(';')
        val last = parts.head.stripPrefix("last:").toInt
        val ids = parts.tail.filter(_.nonEmpty).map { e =>
          val i = e.lastIndexOf('=')
          (e.substring(0, i), e.substring(i + 1).toInt)
        }.toMap
        Some((ids, last))
      } catch { case _: Exception => None }
    }

  private def render(ids: Seq[(String, Int)], last: Int): String =
    s"last:$last;" + ids.map { case (p, i) => s"$p=$i" }.mkString(";")

  /** Id per path for SERVING `schema`: stored ids where present, paths
    * unknown to the map (evolved outside [[persist]] — legacy docs)
    * get deterministic fresh ids after the high-water mark. Returns
    * (path → id, last-column-id).
    */
  def assign(schema: StructType, props: Map[String, String])
      : (Map[String, Int], Int) = {
    val ordered = paths(schema)
    fromProps(props) match {
      case None =>
        (ordered.zipWithIndex.map { case (p, i) => (p, i + 1) }.toMap,
          ordered.size)
      case Some((stored, last)) =>
        var next = last
        val b = Map.newBuilder[String, Int]
        ordered.foreach { p =>
          stored.get(p) match {
            case Some(id) => b += (p -> id)
            case None => next += 1; b += (p -> next)
          }
        }
        (b.result(), next)
    }
  }

  /** Ensure `props` carries a map (seeded positionally from `schema`
    * when absent) — called with the PRE-evolution schema so the ids
    * the table has been serving are the ones that survive.
    */
  def seed(schema: StructType, props: Map[String, String])
      : Map[String, String] =
    if (props.contains(Prop)) props
    else {
      val ordered = paths(schema)
      props + (Prop -> render(
        ordered.zipWithIndex.map { case (p, i) => (p, i + 1) },
        ordered.size))
    }

  /** Persist the map for the POST-evolution `schema`: surviving paths
    * keep their ids, new paths allocate past the high-water mark,
    * dropped paths are retired.
    */
  def persist(schema: StructType, props: Map[String, String])
      : Map[String, String] = {
    val (ids, last) = assign(schema, props)
    val ordered = paths(schema)
    props + (Prop -> render(ordered.map(p => (p, ids(p))), last))
  }
}
