package graft.objects

import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith

/** Derives a view's referenced object names from its SQL text.
  *
  * The reference REQUIRES at least one referenced object per view
  * (`core/.../iceberg/OlympiaToIceberg.java:55` — the Substrait read
  * relation names the objects it reads) and stores the list on the view
  * definition (`proto/objects.proto:71-85`) for invalidation. graft
  * stores Spark SQL text instead of Substrait ([[ViewDef]]), so the
  * list is recovered by PARSING the text with Catalyst's
  * session-independent SQL parser — which also works on the Iceberg
  * REST view plane, where no live Spark session exists.
  *
  * Names are returned exactly as written (multipart segments joined
  * with '.'), minus relations that resolve to a CTE defined in the
  * statement itself. Subqueries (scalar, IN, EXISTS, lateral) are
  * walked. SQL that Catalyst cannot parse — possible only on the REST
  * plane, where a single non-spark-dialect representation is accepted —
  * yields an empty list rather than failing the create.
  */
object ViewRefs {

  def referencedNames(sql: String): Seq[String] =
    try {
      val plan = CatalystSqlParser.parsePlan(sql)
      // CTE bodies are INNER children of UnresolvedWith — a plain
      // collect never visits them — so expand to a fixpoint: every
      // newly discovered CTE definition is itself walked (covering
      // WITH nested inside a CTE body)
      var roots = Seq[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan](plan)
      var frontier = roots
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(_.collectWithSubqueries {
          case w: UnresolvedWith => w.cteRelations.map(_._2)
        }.flatten)
        roots ++= frontier
      }
      // CTE names shadow catalog objects; they are definitions local to
      // the statement, not references (matched case-insensitively, as
      // Spark resolves relation identifiers)
      val cteNames = roots.flatMap(_.collectWithSubqueries {
        case w: UnresolvedWith => w.cteRelations.map(_._1.toLowerCase)
      }.flatten).toSet
      roots.flatMap(_.collectWithSubqueries {
        case r: UnresolvedRelation => r.multipartIdentifier
      }).filterNot(id =>
        id.length == 1 && cteNames.contains(id.head.toLowerCase))
        .map(_.mkString("."))
        .distinct
    } catch { case _: Exception => Seq.empty }

  /** The (namespace, table) keys a referenced-name list points at
    * WITHIN this catalog, interpreting names the way Spark resolves
    * them from a view body: 1-part = the view's own namespace, 2-part
    * = `ns.table`, 3-part = `catalog.ns.table` (kept only when the
    * catalog segment names THIS catalog — `currentCatalog` as recorded
    * at create time — so cross-catalog references never pin local
    * keys). Used to record read actions for SERIALIZABLE conflict
    * analysis: creating a view over a table conflicts with a
    * concurrent drop of that table.
    */
  def localTableCoordinates(names: Seq[String], viewNamespace: String,
      currentCatalog: Option[String]): Seq[(String, String)] =
    names.flatMap { n =>
      n.split('.') match {
        case Array(t) => Some((viewNamespace, t))
        case Array(ns, t) => Some((ns, t))
        case Array(cat, ns, t)
            if currentCatalog.exists(_.equalsIgnoreCase(cat)) =>
          Some((ns, t))
        case _ => None
      }
    }.distinct
}
