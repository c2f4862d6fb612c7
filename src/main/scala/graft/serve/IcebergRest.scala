package graft.serve

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.format.TableMetadata
import graft.objects.{Json, TableDef, ViewDef}
import org.apache.spark.sql.types._

/** Iceberg-REST-catalog payload rendering (the reference's whole
  * interop story is an Iceberg REST catalog — docker/gravitino/,
  * docs/iceberg.md). Shapes follow the PUBLIC Apache Iceberg REST
  * OpenAPI spec + table-spec (format-version 2): namespaces are
  * string ARRAYS, tables load as `{"metadata-location", "metadata",
  * "config"}`, schemas carry assigned field IDs at every depth.
  *
  * graft's native snapshot log replaces Iceberg's manifest tree
  * internally; for interop the facade derives REAL avro manifest
  * lists/manifests per snapshot ([[IcebergManifests]]) so external
  * engines plan the actual file inventory, including v2 DELETE
  * manifests for pending merge-on-read position/equality deletes
  * (per-partition-split and globally-scoped respectively on
  * partitioned tables). Only pending PREDICATE deletes — which
  * Iceberg cannot represent — are REFUSED at load (HTTP 400) rather
  * than served with resurrecting rows.
  */
object IcebergRest {

  private def mapper = Json.mapper

  // ---- Spark schema → Iceberg schema JSON (field IDs assigned) ----

  /** Iceberg struct schema with sequential pre-order field IDs; also
    * returns the last assigned id (metadata `last-column-id`).
    */
  def toIcebergSchema(schema: StructType): (ObjectNode, Int) =
    toIcebergSchema(schema, Map.empty[String, String])

  /** Iceberg struct schema with STABLE field ids: `props` may carry a
    * persisted `{physical path → id}` map
    * ([[graft.spark.IcebergFieldIds]], written at every schema
    * evolution) — ids then survive drops and renames across loads,
    * the way external engines expect. Without the property the ids
    * are positional (identical to what the first persisted map would
    * contain).
    */
  def toIcebergSchema(schema: StructType,
      props: Map[String, String]): (ObjectNode, Int) = {
    val (ids, last) = graft.spark.IcebergFieldIds.assign(schema, props)
    val node = structNode(schema, "", ids)
    node.put("schema-id", 0)
    (node, last)
  }

  private def structNode(s: StructType, prefix: String,
      ids: Map[String, Int]): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("type", "struct")
    val fields = n.putArray("fields")
    s.fields.foreach { f =>
      val path = prefix + graft.spark.ColumnMapping.physicalName(f)
      val fn = fields.addObject()
      fn.put("id", ids(path))
      fn.put("name", f.name)
      fn.put("required", !f.nullable)
      fn.set("type", typeNode(f.dataType, path + ".", ids))
      f.getComment().foreach(fn.put("doc", _))
    }
    n
  }

  private def typeNode(dt: DataType, prefix: String,
      ids: Map[String, Int]): JsonNode =
    dt match {
      case s: StructType => structNode(s, prefix, ids)
      case a: ArrayType =>
        val n = mapper.createObjectNode()
        n.put("type", "list")
        n.put("element-id", ids(prefix + "element"))
        n.set("element", typeNode(a.elementType, prefix + "element.", ids))
        n.put("element-required", !a.containsNull)
        n
      case m: MapType =>
        val n = mapper.createObjectNode()
        n.put("type", "map")
        n.put("key-id", ids(prefix + "key"))
        n.set("key", typeNode(m.keyType, prefix + "key.", ids))
        n.put("value-id", ids(prefix + "value"))
        n.set("value", typeNode(m.valueType, prefix + "value.", ids))
        n.put("value-required", !m.valueContainsNull)
        n
      case other => mapper.getNodeFactory.textNode(primitiveName(other))
    }

  private def primitiveName(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType | ShortType | IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case BinaryType => "binary"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other =>
      throw new IllegalArgumentException(
        s"no Iceberg mapping for ${other.simpleString}")
  }

  // ---- Iceberg schema JSON → Spark schema (table create via REST) ----

  def fromIcebergSchema(node: JsonNode): StructType =
    fromStruct(node)

  private def fromStruct(node: JsonNode): StructType = {
    val fields = node.get("fields").elements()
    val out = scala.collection.mutable.ArrayBuffer.empty[StructField]
    while (fields.hasNext) {
      val f = fields.next()
      val nullable = !f.path("required").asBoolean(false)
      out += StructField(f.get("name").asText(), fromType(f.get("type")), nullable)
    }
    StructType(out.toSeq)
  }

  private[serve] def fromType(t: JsonNode): DataType =
    if (t.isTextual) fromPrimitive(t.asText())
    else t.get("type").asText() match {
      case "struct" => fromStruct(t)
      case "list" =>
        ArrayType(fromType(t.get("element")),
          containsNull = !t.path("element-required").asBoolean(false))
      case "map" =>
        MapType(fromType(t.get("key")), fromType(t.get("value")),
          valueContainsNull = !t.path("value-required").asBoolean(false))
      case other => throw new IllegalArgumentException(s"unknown type $other")
    }

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  private def fromPrimitive(name: String): DataType = name match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" => StringType
    case "binary" => BinaryType
    case "date" => DateType
    case "timestamptz" => TimestampType
    case "timestamp" => TimestampNTZType
    case "uuid" => StringType
    case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
    case other => throw new IllegalArgumentException(s"unknown type $other")
  }

  // ---- LoadTableResult ----

  /** Iceberg v2 table-metadata JSON from graft's snapshot log.
    *
    * `manifestLists` maps snapshot id → absolute path of a REAL avro
    * manifest list ([[IcebergManifests.ensure]]); snapshots without
    * one (pending merge-on-read state — unrepresentable) are omitted
    * from the served history rather than served with an empty
    * inventory an external engine would silently misread as an empty
    * table.
    */
  def tableMetadataJson(td: TableDef, meta: TableMetadata,
      metadataLocation: String, dataLocation: String,
      manifestLists: Map[Long, String] = Map.empty,
      statsLocation: Option[String] = None): ObjectNode = {
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    val (schemaNode, lastColId) = toIcebergSchema(schema, td.properties)
    val m = mapper.createObjectNode()
    m.put("format-version", 2)
    m.put("table-uuid",
      java.util.UUID.nameUUIDFromBytes(
        s"${td.namespaceName}.${td.name}".getBytes("UTF-8")).toString)
    m.put("location", dataLocation)
    m.put("last-sequence-number",
      meta.snapshots.map(_.seq).maxOption.getOrElse(0L))
    m.put("last-updated-ms",
      meta.snapshots.lastOption.map(_.timestampMillis)
        .getOrElse(System.currentTimeMillis()))
    m.put("last-column-id", lastColId)
    m.put("current-schema-id", 0)
    m.putArray("schemas").add(schemaNode)
    // graft partition layout is Hive-style identity on named columns
    val partCols = td.properties.get("graft.partition-columns")
      .map(_.split(',').toSeq).getOrElse(Seq.empty)
    val spec = mapper.createObjectNode()
    spec.put("spec-id", 0)
    val sf = spec.putArray("fields")
    partCols.zipWithIndex.foreach { case (colName, i) =>
      val idx = fieldId(schemaNode, colName)
      val f = sf.addObject()
      f.put("name", colName)
      f.put("transform", "identity")
      f.put("source-id", idx)
      f.put("field-id", 1000 + i)
    }
    val specs = m.putArray("partition-specs")
    specs.add(spec)
    if (partCols.nonEmpty) {
      // spec 1 = unpartitioned: equality-delete manifests ride it so
      // external engines apply them globally (they bind by key +
      // sequence, not partition)
      val unpart = mapper.createObjectNode()
      unpart.put("spec-id", 1)
      unpart.putArray("fields")
      specs.add(unpart)
    }
    m.put("default-spec-id", 0)
    m.put("last-partition-id", 1000 + math.max(partCols.size - 1, 0))
    m.put("default-sort-order-id", 0)
    val order = mapper.createObjectNode()
    order.put("order-id", 0)
    order.putArray("fields")
    m.putArray("sort-orders").add(order)
    val props = m.putObject("properties")
    td.properties.foreach { case (k, v) => props.put(k, v) }
    m.put("current-snapshot-id", meta.currentSnapshotId)
    // only snapshots with a real manifest list are representable;
    // serving the rest would hand external engines an inventory of
    // zero files with no error
    val servable = meta.snapshots.filter(s => manifestLists.contains(s.id))
    val snaps = m.putArray("snapshots")
    servable.foreach { s =>
      val sn = snaps.addObject()
      sn.put("snapshot-id", s.id)
      if (s.parentId >= 0 && servable.exists(_.id == s.parentId))
        sn.put("parent-snapshot-id", s.parentId)
      sn.put("sequence-number", s.seq)
      sn.put("timestamp-ms", s.timestampMillis)
      val sum = sn.putObject("summary")
      sum.put("operation", icebergOp(s.operation))
      sum.put("total-data-files", s.totalFiles.toString)
      sum.put("total-records", s.totalRows.toString)
      sum.put("total-files-size", s.totalBytes.toString)
      sn.put("schema-id", 0)
      sn.put("manifest-list", manifestLists(s.id))
    }
    // snapshot-log is MAIN lineage per the spec (timestamp time travel
    // follows it): only ancestors of the current snapshot, oldest
    // first — branch snapshots stay in `snapshots` + `refs`, out of
    // the log
    val byId = servable.map(s => s.id -> s).toMap
    val mainLine = Iterator.iterate(byId.get(meta.currentSnapshotId))(
      _.flatMap(s => byId.get(s.parentId)))
      .takeWhile(_.isDefined).flatten.toSeq.reverse
    val log = m.putArray("snapshot-log")
    mainLine.foreach { s =>
      val e = log.addObject()
      e.put("snapshot-id", s.id)
      e.put("timestamp-ms", s.timestampMillis)
    }
    m.putArray("metadata-log")
    val refs = m.putObject("refs")
    meta.refs.filter(r => manifestLists.contains(r._2)).foreach {
      case (name, sid) =>
        val r = refs.putObject(name)
        r.put("snapshot-id", sid)
        r.put("type", "tag")
    }
    // branches are movable refs per the Iceberg spec — external
    // engines read `<t>` at a branch head via `refs.<name>`
    meta.branches.filter(b => manifestLists.contains(b._2)).foreach {
      case (name, sid) =>
        val r = refs.putObject(name)
        r.put("snapshot-id", sid)
        r.put("type", "branch")
    }
    // ANALYZE output: the spec's `statistics` entry pointing at the
    // real Puffin file, blob inventory inline so planners read NDVs
    // without opening the file
    meta.stats.filter(st => servable.exists(_.id == st.snapshotId))
      .foreach { st =>
        val e = m.putArray("statistics").addObject()
        e.put("snapshot-id", st.snapshotId)
        e.put("statistics-path", statsLocation.getOrElse(st.path))
        e.put("file-size-in-bytes", st.fileSizeInBytes)
        e.put("file-footer-size-in-bytes", st.footerSizeInBytes)
        val blobs = e.putArray("blob-metadata")
        st.blobs.foreach { b =>
          val bn = blobs.addObject()
          bn.put("type", b.blobType)
          bn.put("snapshot-id", st.snapshotId)
          bn.put("sequence-number", b.sequenceNumber)
          val fa = bn.putArray("fields")
          b.fields.foreach(fa.add)
          val props = bn.putObject("properties")
          props.put("ndv", b.ndv.toString)
          // ANALYZE's bounds / null count / equi-depth histogram ride
          // as blob properties (additive — NDV-only readers ignore them)
          b.min.foreach(props.put("lower_bound", _))
          b.max.foreach(props.put("upper_bound", _))
          if (b.nullCount >= 0) props.put("null_count", b.nullCount.toString)
          if (b.avgLen >= 0) {
            props.put("avg_len", b.avgLen.toString)
            props.put("max_len", b.maxLen.toString)
          }
          if (b.histBounds.nonEmpty) {
            props.put("histogram-bounds", b.histBounds.mkString(","))
            props.put("histogram-ndv", b.histNdv.mkString(","))
            props.put("histogram-height", b.histHeight.toString)
          }
        }
      }
    m
  }

  private def fieldId(schemaNode: ObjectNode, name: String): Int = {
    val fields = schemaNode.get("fields").elements()
    while (fields.hasNext) {
      val f = fields.next()
      if (f.get("name").asText() == name) return f.get("id").asInt()
    }
    throw new IllegalArgumentException(s"no such partition source column: $name")
  }

  private def icebergOp(op: String): String = op match {
    case "append" => "append"
    case "overwrite" | "truncate" | "update" | "merge" => "overwrite"
    case "delete" => "delete"
    case "compact" => "replace"
    case _ => "overwrite"
  }

  def loadTableResult(td: TableDef, meta: TableMetadata,
      metadataLocation: String, dataLocation: String,
      manifestLists: Map[Long, String] = Map.empty,
      statsLocation: Option[String] = None): String = {
    val r = mapper.createObjectNode()
    r.put("metadata-location", metadataLocation)
    r.set("metadata",
      tableMetadataJson(td, meta, metadataLocation, dataLocation,
        manifestLists, statsLocation))
    r.putObject("config")
    r.toString
  }

  // ---- LoadViewResult (view-spec format-version 1) ----

  def loadViewResult(vd: ViewDef, metadataLocation: String,
      location: String): String = {
    val schema = DataType.fromJson(vd.schemaJson).asInstanceOf[StructType]
    val (schemaNode, _) = toIcebergSchema(schema)
    val m = mapper.createObjectNode()
    m.put("view-uuid",
      java.util.UUID.nameUUIDFromBytes(
        s"${vd.namespaceName}.${vd.name}".getBytes("UTF-8")).toString)
    m.put("format-version", 1)
    m.put("location", location)
    m.putArray("schemas").add(schemaNode)
    m.put("current-version-id", 1)
    val v = m.putArray("versions").addObject()
    v.put("version-id", 1)
    v.put("schema-id", 0)
    v.put("timestamp-ms", System.currentTimeMillis())
    v.putObject("summary")
    val rep = v.putArray("representations").addObject()
    rep.put("type", "sql")
    rep.put("sql", vd.sqlText)
    rep.put("dialect", "spark")
    v.putArray("default-namespace").add(vd.namespaceName)
    val log = m.putArray("version-log").addObject()
    log.put("version-id", 1)
    log.put("timestamp-ms", System.currentTimeMillis())
    val props = m.putObject("properties")
    vd.properties.foreach { case (k, v2) => props.put(k, v2) }
    val r = mapper.createObjectNode()
    r.put("metadata-location", metadataLocation)
    r.set("metadata", m)
    r.toString
  }

  // ---- small response builders ----

  def namespacesResponse(names: Seq[String],
      nextPageToken: Option[String] = None): String = {
    val r = mapper.createObjectNode()
    val arr = r.putArray("namespaces")
    names.foreach(n => arr.addArray().add(n))
    nextPageToken.foreach(r.put("next-page-token", _))
    r.toString
  }

  def namespaceResponse(name: String, properties: Map[String, String]): String = {
    val r = mapper.createObjectNode()
    r.putArray("namespace").add(name)
    val p = r.putObject("properties")
    properties.foreach { case (k, v) => p.put(k, v) }
    r.toString
  }

  def identifiersResponse(ns: String, names: Seq[String],
      nextPageToken: Option[String] = None): String = {
    val r = mapper.createObjectNode()
    val arr = r.putArray("identifiers")
    names.foreach { n =>
      val id = arr.addObject()
      id.putArray("namespace").add(ns)
      id.put("name", n)
    }
    nextPageToken.foreach(r.put("next-page-token", _))
    r.toString
  }

  // ---- pagination tokens (opaque per the REST OpenAPI spec) ----

  /** Token = url-safe base64 of the last returned NAME: resuming is a
    * strictly-after key-interval scan, so tokens stay valid across
    * concurrent commits (each page reads its own latest root; an
    * object created or dropped between pages appears or disappears
    * exactly as a fresh listing would show it, never duplicating or
    * skipping a surviving neighbor).
    */
  def pageToken(lastName: String): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
      lastName.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def decodePageToken(token: String): String =
    try new String(java.util.Base64.getUrlDecoder.decode(token),
      java.nio.charset.StandardCharsets.UTF_8)
    catch {
      case _: Exception =>
        throw new IllegalArgumentException(s"invalid pageToken: $token")
    }

  def errorResponse(code: Int, errType: String, message: String): String = {
    val r = mapper.createObjectNode()
    val e = r.putObject("error")
    e.put("message", message)
    e.put("type", errType)
    e.put("code", code)
    r.toString
  }
}
