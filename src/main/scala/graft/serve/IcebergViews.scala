package graft.serve

import com.fasterxml.jackson.databind.JsonNode
import graft.catalog.Graft
import graft.objects.ViewDef
import graft.storage.StorageOps

/** External VIEW writes through the REST facade: the PUBLIC Apache
  * Iceberg view spec's CreateViewRequest and commit (UpdateView)
  * shapes. An external engine creates / replaces / drops views whose
  * SQL then executes natively in Spark sessions — the same dual plane
  * the table endpoints provide.
  *
  * Representation handling: graft executes views as Spark SQL
  * ([[graft.objects.ViewDef]] stores SQL text + the bound schema), so
  * the facade binds the `spark`-dialect representation; a request
  * whose ONLY representation carries another dialect is accepted when
  * it is unambiguous (one representation) — Spark parses ANSI SQL —
  * and refused (400) when several non-spark dialects would force a
  * silent guess. `referencedObjectNames` (the native invalidation
  * list) is derived by parsing the SQL with Catalyst's
  * session-independent parser ([[graft.objects.ViewRefs]]), same as
  * native CREATE VIEW — a non-spark dialect Catalyst cannot parse
  * stores an empty list and relies on execution-time resolution.
  */
object IcebergViews {

  /** CreateViewRequest → ViewDef (throws IllegalArgumentException →
    * 400 for malformed bodies).
    */
  def fromCreateRequest(ns: String, body: JsonNode): ViewDef = {
    val name = body.path("name").asText()
    require(name.nonEmpty, "view create needs a name")
    val schemaNode = body.get("schema")
    require(schemaNode != null, "view create needs a schema")
    val schema = IcebergRest.fromIcebergSchema(schemaNode)
    val vv = body.get("view-version")
    require(vv != null, "view create needs a view-version")
    val sql = sqlOf(vv)
    ViewDef(name, ns, sqlText = sql, schemaJson = schema.json,
      referencedObjectNames = graft.objects.ViewRefs.referencedNames(sql),
      properties = propsOf(body.get("properties")))
  }

  /** The commit shape (`requirements` + `updates`): the accepted
    * subset is `add-view-version` (+ optional `add-schema`,
    * `set-properties`/`remove-properties`) with
    * `set-current-view-version` = -1 — i.e. CREATE OR REPLACE.
    * Requirements: `assert-view-uuid` (the derived name-uuid).
    * Returns the replacement ViewDef built over the CURRENT one
    * loaded from `cur`.
    */
  def applyCommit(storage: StorageOps, ns: String, v: String,
      cur: ViewDef, body: JsonNode): ViewDef = {
    val reqs = body.path("requirements")
    val rit = reqs.elements()
    while (rit.hasNext) {
      val r = rit.next()
      r.path("type").asText() match {
        case "assert-view-uuid" =>
          val want = java.util.UUID.nameUUIDFromBytes(
            s"$ns.$v".getBytes("UTF-8")).toString
          if (r.path("uuid").asText() != want)
            throw new IcebergCommits.RequirementFailedException(
              s"view uuid changed: ${r.path("uuid").asText()} != $want")
        case "" => throw new IllegalArgumentException(
          "requirement without a type")
        case other => throw new IllegalArgumentException(
          s"unsupported view commit requirement: $other")
      }
    }
    val updates = body.get("updates")
    require(updates != null && updates.isArray && updates.size() > 0,
      "view commit body needs a non-empty updates array")
    var version: JsonNode = null
    var schemaNode: JsonNode = null
    var propSets = Map.empty[String, String]
    var propRemovals = Seq.empty[String]
    val it = updates.elements()
    while (it.hasNext) {
      val u = it.next()
      u.path("action").asText() match {
        case "add-view-version" =>
          require(version == null, "multiple add-view-version updates")
          version = u.get("view-version")
          require(version != null, "add-view-version without a view-version")
        case "set-current-view-version" =>
          // -1 = "the one just added" per the spec; graft keeps one
          // current version, so a pin to an older id cannot be honored
          val vid = u.path("view-version-id").asInt(-1)
          require(vid == -1,
            s"set-current-view-version must be -1 (last added), got $vid")
        case "add-schema" =>
          require(schemaNode == null, "multiple add-schema updates")
          schemaNode = u.get("schema")
          require(schemaNode != null, "add-schema without a schema")
        case "set-current-schema-id" =>
          val sid = u.path("schema-id").asInt(-1)
          require(sid == -1,
            s"set-current-schema-id must be -1 (last added), got $sid")
        case "set-properties" =>
          val ups = u.get("updates")
          require(ups != null && ups.isObject,
            "set-properties without an updates object")
          val pit = ups.properties().iterator()
          while (pit.hasNext) {
            val e = pit.next()
            propSets += (e.getKey -> e.getValue.asText())
          }
        case "remove-properties" =>
          val rm = u.get("removals")
          require(rm != null && rm.isArray,
            "remove-properties without a removals array")
          propRemovals ++= (0 until rm.size()).map(rm.get(_).asText())
        case other => throw new IllegalArgumentException(
          s"unsupported view commit update action: $other")
      }
    }
    require(version != null || schemaNode != null ||
        propSets.nonEmpty || propRemovals.nonEmpty,
      "view commit changes nothing")
    val newSql = if (version == null) cur.sqlText else sqlOf(version)
    cur.copy(
      sqlText = newSql,
      schemaJson =
        if (schemaNode == null) cur.schemaJson
        else IcebergRest.fromIcebergSchema(schemaNode).json,
      referencedObjectNames =
        if (version == null) cur.referencedObjectNames
        else graft.objects.ViewRefs.referencedNames(newSql),
      properties = cur.properties ++ propSets -- propRemovals)
  }

  private def sqlOf(vv: JsonNode): String = {
    val reps = vv.get("representations")
    require(reps != null && reps.isArray && reps.size() > 0,
      "view-version needs a non-empty representations array")
    val nodes = (0 until reps.size()).map(reps.get)
    nodes.foreach(r => require(r.path("type").asText() == "sql",
      s"unsupported representation type: ${r.path("type").asText()}"))
    val chosen = nodes
      .find(_.path("dialect").asText().equalsIgnoreCase("spark"))
      .orElse(if (nodes.size == 1) nodes.headOption else None)
      .getOrElse(throw new IllegalArgumentException(
        "no spark-dialect representation among " +
          nodes.map(_.path("dialect").asText()).mkString("[", ", ", "]") +
          "; the facade will not guess between dialects"))
    val sql = chosen.path("sql").asText()
    require(sql.nonEmpty, "sql representation without sql text")
    sql
  }

  private def propsOf(p: JsonNode): Map[String, String] =
    if (p == null || !p.isObject) Map.empty
    else {
      var m = Map.empty[String, String]
      val it = p.properties().iterator()
      while (it.hasNext) { val e = it.next(); m += (e.getKey -> e.getValue.asText()) }
      m
    }
}
