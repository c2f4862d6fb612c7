package graft.serve

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.connector.catalog.TableChange

/** Diff of two Iceberg schema JSONs (the SERVED current schema vs a
  * client's evolved one) into the Spark [[TableChange]]s a native
  * ALTER TABLE would issue — the REST facade's schema-evolution
  * commits then apply through [[graft.spark.TableAlterations]], the
  * same rule set as native DDL.
  *
  * Fields correlate by the served field ID (assigned positionally by
  * [[IcebergRest.toIcebergSchema]]): same id + new name = RENAME;
  * an id the served schema lacks = ADD (placed at the end of its
  * struct); a served id the client dropped = DELETE; primitive type
  * differences become type updates (widening-only — enforced
  * downstream); `required` may only relax. Documented deltas from
  * Iceberg's stored-id model: ids are DERIVED, so an evolution commit
  * renumbers later fields on the next load (clients re-load after a
  * commit per the spec anyway), and changes inside list/map element
  * types are refused — graft evolves those through native DDL only.
  */
object IcebergSchemaDiff {

  /** TableChanges turning `served` into `client`; empty = no-op.
    * Throws IllegalArgumentException (→400) for unsupported shapes.
    */
  def diff(served: JsonNode, client: JsonNode): Seq[TableChange] = {
    val out = mutable.Buffer.empty[TableChange]
    diffStructs(served, client, Seq.empty, out)
    out.toSeq
  }

  private def fields(struct: JsonNode): Seq[JsonNode] = {
    val f = struct.get("fields")
    require(f != null && f.isArray, "schema struct without a fields array")
    f.elements().asScala.toSeq
  }

  private def diffStructs(served: JsonNode, client: JsonNode,
      path: Seq[String], out: mutable.Buffer[TableChange]): Unit = {
    val servedFields = fields(served)
    val clientFields = fields(client)
    val servedById = servedFields.map(f => f.get("id").asInt() -> f).toMap
    val clientIds = clientFields.map(_.get("id").asInt()).toSet
    // drops FIRST: a drop-and-recreate of the same name (and a rename
    // onto a dropped name) are legal single-commit evolutions — the
    // sequential apply must free the name before the add/rename lands
    servedFields.filterNot(f => clientIds(f.get("id").asInt())).foreach { sf =>
      out += TableChange.deleteColumn(
        (path :+ sf.get("name").asText()).toArray, false)
    }
    clientFields.foreach { cf =>
      val id = cf.get("id").asInt()
      val cName = cf.get("name").asText()
      val cRequired = cf.path("required").asBoolean(false)
      servedById.get(id) match {
        case None =>
          require(!cRequired,
            s"new column ${(path :+ cName).mkString(".")} must be " +
              "optional: existing rows cannot satisfy NOT NULL")
          out += TableChange.addColumn((path :+ cName).toArray,
            IcebergRest.fromType(cf.get("type")), true)
        case Some(sf) =>
          val sName = sf.get("name").asText()
          if (cName != sName)
            out += TableChange.renameColumn((path :+ sName).toArray, cName)
          // all further references use the post-rename name
          val fieldPath = path :+ cName
          val sType = sf.get("type")
          val cType = cf.get("type")
          (sType.isTextual, cType.isTextual) match {
            case (true, true) =>
              if (sType.asText() != cType.asText())
                out += TableChange.updateColumnType(fieldPath.toArray,
                  IcebergRest.fromType(cType))
            case (false, false)
                if sType.path("type").asText() == "struct" &&
                  cType.path("type").asText() == "struct" =>
              diffStructs(sType, cType, fieldPath, out)
            case _ =>
              // lists/maps (and struct<->primitive changes): accept
              // only byte-identical shapes; anything else needs
              // native DDL
              require(sType == cType,
                s"unsupported schema change at ${fieldPath.mkString(".")}" +
                  ": only struct fields and primitive widenings evolve " +
                  "over REST")
          }
          val sRequired = sf.path("required").asBoolean(false)
          if (sRequired && !cRequired)
            out += TableChange.updateColumnNullability(fieldPath.toArray, true)
          else require(sRequired || !cRequired,
            s"cannot tighten ${fieldPath.mkString(".")} to required " +
              "without a data scan")
      }
    }
  }
}
