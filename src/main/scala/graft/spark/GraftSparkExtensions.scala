package graft.spark

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** Session extensions (reference analog:
  * spark/v3.5/spark-extensions/.../OlympiaSparkExtensions.scala:20-30):
  *
  *  - txn SQL: `BEGIN | COMMIT | ROLLBACK [TRANSACTION]` against the
  *    current graft catalog. The reference pre-filters with a
  *    normalized startsWith check before ANTLR
  *    (OlympiaSparkSqlExtensionsParser.scala:115-133); with no ANTLR
  *    codegen offline, a small matcher IS the parser here.
  *  - view DDL + resolution: Spark 4.1 defines the V2 ViewCatalog API
  *    but wires neither CREATE VIEW execution nor SELECT resolution
  *    for it — engines ship both via extensions, as done here.
  *
  * {{{ spark.sql.extensions = graft.spark.GraftSparkExtensions }}}
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((session, delegate) => new GraftSqlParser(session, delegate))
    ext.injectResolutionRule(session => new GraftViewResolution(session))
    ext.injectResolutionRule(session => new GraftCheckConstraints(session))
    ext.injectOptimizerRule(session => new GraftMvRewrite(session))
  }
}

/** Delegating parser that intercepts graft statements
  * (reference OlympiaSparkSqlExtensionsParser.scala:44-98).
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val txnRe =
    """(?is)^\s*(BEGIN|COMMIT|ROLLBACK)(\s+TRANSACTION)?\s*;?\s*$""".r
  // CREATE [OR REPLACE] VIEW v [(alias [COMMENT '..'], ...)]
  //   [COMMENT '..'] [TBLPROPERTIES('k'='v',..)] AS query  (reference
  //   grammar scope, spark-extensions/.../OlympiaSqlExtensions.g4:17-46).
  //   The column-list group matches quoted strings atomically, so a
  //   per-column comment may contain anything but an unpaired quote.
  private val createViewRe =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([\w.`]+)\s*""" +
      """(?:\(\s*((?:[^()']|'(?:[^']|'')*')*?)\s*\)\s*)?""" +
      """(?:COMMENT\s+'((?:[^']|'')*)'\s*)?""" +
      """(?:TBLPROPERTIES\s*\(\s*([^)]*?)\s*\)\s*)?""" +
      """AS\s+(.+?)\s*;?\s*$""").r
  private val dropViewRe =
    """(?is)^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.`]+)\s*;?\s*$""".r
  // materialized-view DDL: the SELECT is handed verbatim to
  // GraftMvDdl.derive, which parses it with Spark's parser and derives
  // the view spec (keys/aggs/where/join) for the procedures' machinery
  private val createMvRe =
    ("""(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?""" +
      """([\w.`]+)\s+AS\s+(.+?)\s*;?\s*$""").r
  private val refreshMvRe =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s*;?\s*$""".r
  private val dropMvRe =
    ("""(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?""" +
      """([\w.`]+)\s*;?\s*$""").r
  private val showViewsRe =
    """(?is)^\s*SHOW\s+VIEWS(?:\s+(?:IN|FROM)\s+([\w.`]+))?\s*;?\s*$""".r
  private val showCreateViewRe =
    """(?is)^\s*SHOW\s+CREATE\s+VIEW\s+([\w.`]+)\s*;?\s*$""".r
  private val alterViewRe =
    ("""(?is)^\s*ALTER\s+VIEW\s+([\w.`]+)\s+SET\s+""" +
      """TBLPROPERTIES\s*\(\s*([^)]*?)\s*\)\s*;?\s*$""").r
  private val alterViewUnsetRe =
    ("""(?is)^\s*ALTER\s+VIEW\s+([\w.`]+)\s+UNSET\s+""" +
      """TBLPROPERTIES\s*(IF\s+EXISTS\s+)?\(\s*([^)]*?)\s*\)\s*;?\s*$""").r

  // ALTER TABLE t ADD|DROP PARTITION FIELD <field> — partition-spec
  // evolution (Iceberg-style DDL; vanilla Spark has no syntax for it)
  private val alterPartitionFieldRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+(ADD|DROP)\s+""" +
      """PARTITION\s+FIELD\s+(.+?)\s*;?\s*$""").r

  private val propRe = """'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'""".r
  private val propKeyRe = """'((?:[^']|'')*)'""".r
  private val colItemRe =
    """(?is)^\s*`?(\w+)`?\s*(?:COMMENT\s+'((?:[^']|'')*)')?\s*$""".r

  /** Split a column list on commas OUTSIDE single-quoted strings. */
  private def splitColumns(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inQuote = false
    s.foreach {
      case '\'' => inQuote = !inQuote; sb += '\''
      case ',' if !inQuote => out += sb.toString; sb.clear()
      case c => sb += c
    }
    out += sb.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def parseColumnList(s: String): Seq[(String, Option[String])] =
    splitColumns(s).map {
      case colItemRe(name, comment) =>
        (name, Option(comment).map(_.replace("''", "'")))
      case other =>
        throw new IllegalArgumentException(s"bad view column: $other")
    }

  // UPDATE / MERGE INTO need no interception: Spark's own parser
  // produces UpdateTable/MergeIntoTable and GraftTable implements
  // SupportsRowLevelOperations, so the analyzer plans them natively
  // (multi-clause conditional MERGE, NOT MATCHED BY SOURCE, single-pass
  // cardinality check — see GraftRowLevelOps).

  private def parseProps(s: String): Map[String, String] =
    propRe.findAllMatchIn(s)
      .map(m => m.group(1).replace("''", "'") -> m.group(2).replace("''", "'"))
      .toMap

  private def isGraft(name: String): Boolean =
    session.conf.getOption(s"spark.sql.catalog.$name")
      .contains(classOf[GraftCatalog].getName)

  /** Is `parts` a reference into a graft catalog (explicit or current)? */
  private def graftCatalogFor(parts: Seq[String]): Option[(String, Seq[String])] = {
    parts match {
      case Seq(c, ns, n) if isGraft(c) => Some((c, Seq(ns, n)))
      case Seq(ns, n) =>
        val cur = session.sessionState.catalogManager.currentCatalog.name()
        if (isGraft(cur)) Some((cur, Seq(ns, n))) else None
      case _ => None
    }
  }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case txnRe(verb, _) =>
      TransactionCommand(verb.toUpperCase(java.util.Locale.ROOT))
    case createMvRe(ifNotExists, ident, query) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) =>
          CreateGraftMvCommand(cat, ns, name, query.trim, ifNotExists != null)
        case _ => delegate.parsePlan(sqlText)
      }
    case refreshMvRe(ident) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) => RefreshGraftMvCommand(cat, ns, name)
        case _ => delegate.parsePlan(sqlText)
      }
    case dropMvRe(ifExists, ident) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) =>
          DropGraftMvCommand(cat, ns, name, ifExists != null)
        case _ => delegate.parsePlan(sqlText)
      }
    case createViewRe(replace, ident, aliases, comment, props, query) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) =>
          val cols = Option(aliases).toSeq.flatMap(parseColumnList)
          CreateGraftViewCommand(cat, ns, name, query.trim, replace != null,
            cols, Option(comment).map(_.replace("''", "'")),
            Option(props).map(parseProps).getOrElse(Map.empty))
        case _ => delegate.parsePlan(sqlText)
      }
    case showViewsRe(target) =>
      val resolved = Option(target)
        .map(t => delegate.parseMultipartIdentifier(t.replace("`", ""))) match {
        case Some(Seq(c, n)) if isGraft(c) => Some((c, Some(n)))
        case Some(Seq(n)) =>
          val cur = session.sessionState.catalogManager.currentCatalog.name()
          if (isGraft(cur)) Some((cur, Some(n))) else None
        case Some(_) => None
        case None =>
          val cur = session.sessionState.catalogManager.currentCatalog.name()
          if (isGraft(cur)) Some((cur, None)) else None
      }
      resolved match {
        case Some((cat, ns)) => ShowGraftViewsCommand(cat, ns)
        case None => delegate.parsePlan(sqlText)
      }
    case alterViewRe(ident, props) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) =>
          AlterGraftViewCommand(cat, ns, name, parseProps(props))
        case _ => delegate.parsePlan(sqlText)
      }
    case alterViewUnsetRe(ident, ifExists, keys) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) =>
          val keyList = propKeyRe.findAllMatchIn(keys)
            .map(_.group(1).replace("''", "'")).toSeq
          UnsetGraftViewPropsCommand(cat, ns, name, keyList, ifExists != null)
        case _ => delegate.parsePlan(sqlText)
      }
    case showCreateViewRe(ident) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) =>
          ShowCreateGraftViewCommand(cat, ns, name)
        case _ => delegate.parsePlan(sqlText)
      }
    case dropViewRe(ifExists, ident) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) =>
          DropGraftViewCommand(cat, ns, name, ifExists != null)
        case _ => delegate.parsePlan(sqlText)
      }
    case alterPartitionFieldRe(ident, verb, field) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) =>
          EvolvePartitionSpecCommand(cat, ns, name,
            add = verb.equalsIgnoreCase("ADD"),
            EvolvePartitionSpecCommand.parseField(field))
        case _ => delegate.parsePlan(sqlText)
      }
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier =
    delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
  override def parseQuery(s: String): LogicalPlan = delegate.parseQuery(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)
}

/** BEGIN/COMMIT/ROLLBACK against the session's current graft catalog
  * (reference BeginTransactionExec.scala:21-44 and siblings — note the
  * reference's commit/rollback preconditions are inverted so COMMIT
  * always throws, OlympiaIcebergCatalog.java:626-637; graft's happy
  * path is covered by tests).
  */
case class TransactionCommand(verb: String) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.currentCatalog match {
      case g: GraftCatalog => g
      case other => throw new IllegalStateException(
        s"$verb TRANSACTION requires a graft catalog, found ${other.name()}; " +
          "run USE <graft-catalog> first")
    }
    verb match {
      case "BEGIN" => cat.beginTransaction()
      case "COMMIT" => cat.commitTransaction()
      case "ROLLBACK" => cat.rollbackTransaction()
    }
    Seq.empty
  }
}

/** `ALTER TABLE t ADD|DROP PARTITION FIELD <field>` — partition-spec
  * evolution: one metadata commit, no data movement; scans serve every
  * epoch's files under that epoch's layout.
  */
case class EvolvePartitionSpecCommand(catalogName: String, ns: String,
    name: String, add: Boolean, field: PartitionField)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    cat.evolvePartitionSpec(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), name),
      add, field)
    cat.invalidateTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), name))
    Seq.empty
  }
}

object EvolvePartitionSpecCommand {
  /** `days(ts)` / `bucket(8, k)` / `truncate(3, s)` / bare `col`
    * (identity) / `identity(col)`; singular time kinds accepted.
    */
  def parseField(raw: String): PartitionField = {
    val s = raw.trim.replace("`", "")
    val normalized = s.toLowerCase(java.util.Locale.ROOT) match {
      case t if t.matches("""\w+""") => s"identity($s)"
      case _ => s
        .replaceAll("(?i)^year\\(", "years(")
        .replaceAll("(?i)^month\\(", "months(")
        .replaceAll("(?i)^day\\(", "days(")
        .replaceAll("(?i)^hour\\(", "hours(")
    }
    PartitionTransforms.parse(normalized) match {
      case Seq(one) => one
      case other => throw new IllegalArgumentException(
        s"expected ONE partition field, got: $raw ($other)")
    }
  }
}

case class CreateGraftViewCommand(catalogName: String, ns: String, name: String,
    query: String, replace: Boolean,
    columns: Seq[(String, Option[String])] = Seq.empty,
    comment: Option[String] = None, properties: Map[String, String] = Map.empty)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val baseSchema = session.sql(query).schema
    // column aliases are folded into the stored SQL so the persisted
    // view is self-contained (no alias metadata needed at resolve
    // time); per-column comments ride the stored schema
    val finalQuery =
      if (columns.isEmpty) query
      else {
        require(columns.length == baseSchema.length,
          s"view $name: ${columns.length} aliases for " +
            s"${baseSchema.length} query columns")
        val sel = baseSchema.fieldNames.zip(columns)
          .map { case (o, (a, _)) => s"`$o` AS `$a`" }.mkString(", ")
        s"SELECT $sel FROM ($query)"
      }
    val schema0 =
      if (columns.isEmpty) baseSchema else session.sql(finalQuery).schema
    val schema = org.apache.spark.sql.types.StructType(
      schema0.fields.zipWithIndex.map { case (f, i) =>
        columns.lift(i).flatMap(_._2).fold(f)(f.withComment)
      })
    val allProps = properties ++ comment.map("comment" -> _)
    import scala.jdk.CollectionConverters._
    val info = new org.apache.spark.sql.connector.catalog.ViewInfo(
      Identifier.of(Array(ns), name), finalQuery, catalogName, Array(ns), schema,
      schema.fieldNames, Array.empty, Array.empty, allProps.asJava)
    if (replace) cat.replaceView(info, true) else cat.createView(info)
    Seq.empty
  }
}

/** `SHOW CREATE VIEW v` — reconstructs runnable DDL from the stored
  * definition (query text, per-column comments, view comment, user
  * properties).
  */
case class ShowCreateGraftViewCommand(catalogName: String, ns: String,
    name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("createview_stmt", StringType, nullable = false)())

  private def q(s: String): String = s"'${s.replace("'", "''")}'"

  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val view = cat.loadView(Identifier.of(Array(ns), name))
    val schema = view.schema()
    val colList =
      if (schema.fields.forall(_.getComment().isEmpty)) ""
      else schema.fields.map(f =>
        s"`${f.name}`" + f.getComment().fold("")(c => s" COMMENT ${q(c)}"))
        .mkString(" (", ", ", ")")
    val comment = view.properties().get("comment") match {
      case null => ""
      case c => s"\nCOMMENT ${q(c)}"
    }
    import scala.jdk.CollectionConverters._
    val userProps = view.properties().asScala.toSeq
      .filterNot { case (k, _) =>
        k == "comment" || k.startsWith("spark.") || k.startsWith("graft.")
      }.sortBy(_._1)
    val props =
      if (userProps.isEmpty) ""
      else userProps.map { case (k, v) => s"${q(k)} = ${q(v)}" }
        .mkString("\nTBLPROPERTIES (", ", ", ")")
    Seq(Row(s"CREATE VIEW $catalogName.$ns.$name$colList$comment$props\n" +
      s"AS ${view.query()}"))
  }
}

/** ALTER VIEW v UNSET TBLPROPERTIES [IF EXISTS] ('k', ...). */
case class UnsetGraftViewPropsCommand(catalogName: String, ns: String,
    name: String, keys: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val ident = Identifier.of(Array(ns), name)
    if (!ifExists) {
      val present = cat.loadView(ident).properties()
      val missing = keys.filterNot(present.containsKey)
      require(missing.isEmpty,
        s"view $ns.$name has no such properties: ${missing.mkString(", ")} " +
          "(use IF EXISTS to ignore)")
    }
    val changes = keys.map(k =>
      org.apache.spark.sql.connector.catalog.ViewChange.removeProperty(k))
    cat.alterView(ident, changes: _*)
    Seq.empty
  }
}

/** SHOW VIEWS [IN <catalog>.<ns> | IN <ns>] over a graft catalog; with
  * no namespace, lists every namespace's views.
  */
case class ShowGraftViewsCommand(catalogName: String, ns: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("viewName", StringType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val nss = ns.map(Seq(_)).getOrElse(
      cat.listNamespaces().map(_.head).toSeq)
    nss.flatMap(n => cat.listViews(n).map(id => Row(n, id.name())))
      .sortBy(r => (r.getString(0), r.getString(1)))
  }
}

/** ALTER VIEW v SET TBLPROPERTIES('k'='v', ...). */
case class AlterGraftViewCommand(catalogName: String, ns: String, name: String,
    props: Map[String, String]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val changes = props.toSeq.map { case (k, v) =>
      org.apache.spark.sql.connector.catalog.ViewChange.setProperty(k, v)
    }
    cat.alterView(Identifier.of(Array(ns), name), changes: _*)
    Seq.empty
  }
}

case class DropGraftViewCommand(catalogName: String, ns: String, name: String,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val dropped = cat.dropView(Identifier.of(Array(ns), name))
    if (!dropped && !ifExists)
      throw new NoSuchElementException(s"view not found: $catalogName.$ns.$name")
    Seq.empty
  }
}

/** Resolves `SELECT ... FROM <graft-catalog>.<ns>.<view>` by expanding
  * the stored SQL text inline (the V2 analog of Spark's session-catalog
  * view expansion; schema-on-read like the reference's
  * `schema_binding=false` views).
  */
class GraftViewResolution(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length >= 2 =>
        resolveView(u).getOrElse(u)
    }

  private def resolveView(u: UnresolvedRelation): Option[LogicalPlan] = {
    val parts = u.multipartIdentifier
    val (catName, ns, name) = parts match {
      case Seq(c, n, v) => (c, n, v)
      case Seq(n, v) =>
        (session.sessionState.catalogManager.currentCatalog.name(), n, v)
      case _ => return None
    }
    val cat =
      try session.sessionState.catalogManager.catalog(catName) match {
        case g: GraftCatalog => g
        case _ => return None
      } catch { case _: Exception => return None }
    val ident = Identifier.of(Array(ns), name)
    if (!cat.viewExists(ident)) return None
    val view = cat.loadView(ident)
    Some(SubqueryAlias(parts,
      session.sessionState.sqlParser.parsePlan(view.query())))
  }
}

/** CHECK-constraint enforcement on writes: table properties
  * `graft.check.<name> = '<boolean SQL over the table's columns>'`
  * make every batch write — INSERT / INSERT OVERWRITE, and the
  * row-level UPDATE / MERGE / DELETE rewrites in all three modes
  * (copy-on-write ReplaceData, position- and equality-delta
  * WriteDelta) — fail atomically, before any snapshot commits, when a
  * row violates the predicate (SQL-standard CHECK semantics: a NULL
  * result passes; rows a delta marks DELETE are never validated).
  *
  * Spark-first mechanics: the write's query is wrapped in a `Filter`
  * whose condition is `isnull(assert_true(coalesce(cond, true), msg))`
  * per constraint — always true row-wise, so no rows are dropped, but
  * `assert_true` throws on the first violating row inside whole-stage
  * codegen (the same plan shape Delta's CheckDeltaInvariant produces).
  * The task failure aborts the write; the staging dir is cleaned and
  * no snapshot commits. Enforcement is fully distributed: each
  * executor checks only its own rows, nothing funnels to the driver.
  */
class GraftCheckConstraints(session: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{AppendData, Filter, OverwriteByExpression, OverwritePartitionsDynamic, ReplaceData, V2WriteCommand, WriteDelta}
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
  import org.apache.spark.sql.catalyst.util.RowDeltaUtils

  private val Marker = "[graft-check]"

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case w: V2WriteCommand if w.query.resolved && enforceable(w) =>
        applicableChecks(w) match {
          case cs if cs.nonEmpty && !wrapped(w.query) =>
            w.withNewQuery(Filter(condition(w, cs), w.query))
          case _ => w
        }
    }

  /** Batch appends/overwrites AND row-level writes: a COW rewrite
    * (`ReplaceData`) re-validates every surviving + rewritten row; a
    * MoR delta (`WriteDelta`) validates only non-DELETE rows (gated on
    * `__row_operation` — deleting a row never introduces data, and old
    * values carried by position-delta delete rows must not re-trip a
    * constraint added after they were written).
    */
  private def enforceable(w: V2WriteCommand): Boolean = w match {
    case _: AppendData | _: OverwriteByExpression |
        _: OverwritePartitionsDynamic | _: ReplaceData | _: WriteDelta => true
    case _ => false
  }

  private def checksOf(w: V2WriteCommand): Seq[(String, String)] = {
    def props(g: GraftTable): Seq[(String, String)] = {
      import scala.jdk.CollectionConverters._
      g.properties().asScala.toSeq.collect {
        case (k, v) if k.startsWith("graft.check.") =>
          (k.stripPrefix("graft.check."), v)
      }.sortBy(_._1)
    }
    w.table match {
      case r: DataSourceV2Relation =>
        // row-level writes target the table through the private[sql]
        // operation wrapper Spark builds for ReplaceData / WriteDelta
        org.apache.spark.sql.graft.SparkInternals
          .unwrapRowLevelTable(r.table) match {
          case g: GraftTable => props(g)
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }
  }

  /** Checks whose referenced columns all exist in the write's query.
    * A MoR DELETE's delta carries only row-id/metadata columns — no
    * data columns to validate, so its checks drop out here instead of
    * failing resolution; any delta that writes data (UPDATE inserts,
    * MERGE inserts) still resolves and enforces.
    */
  private def applicableChecks(w: V2WriteCommand): Seq[(String, String)] = {
    val parser = session.sessionState.sqlParser
    val out = w.query.output.map(_.name.toLowerCase(java.util.Locale.ROOT)).toSet
    checksOf(w).filter { case (_, sql) =>
      scala.util.Try(parser.parseExpression(sql)).toOption.exists { e =>
        e.collect {
          case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
            ua.nameParts.head.toLowerCase(java.util.Locale.ROOT)
        }.forall(out.contains)
      }
    }
  }

  /** One boolean condition AND-ing every constraint's checker. */
  private def condition(w: V2WriteCommand,
      checks: Seq[(String, String)]): Expression = {
    val parser = session.sessionState.sqlParser
    checks.map { case (name, sql) =>
      val msg = (Marker +
        s" constraint $name violated on ${w.table.name}: CHECK ($sql)")
        .replace("'", "\"")
      val checked = s"coalesce(cast(($sql) as boolean), true)"
      // delta rows tagged DELETE pass unconditionally (see enforceable)
      val gated = w match {
        case _: WriteDelta =>
          s"CASE WHEN `${RowDeltaUtils.OPERATION_COLUMN}` = " +
            s"${RowDeltaUtils.DELETE_OPERATION} THEN true ELSE $checked END"
        case _ => checked
      }
      parser.parseExpression(s"isnull(assert_true($gated, '$msg'))")
    }.reduce((a, b) =>
      org.apache.spark.sql.catalyst.expressions.And(a, b))
  }

  /** Idempotency across analyzer passes: the marker literal survives
    * resolution (it is the `assert_true` error message), so a wrapped
    * query is recognized before and after the condition resolves.
    */
  private def wrapped(q: LogicalPlan): Boolean = q match {
    case f: Filter => f.condition.exists {
      case l: org.apache.spark.sql.catalyst.expressions.Literal =>
        l.value != null && l.value.toString.startsWith(Marker)
      case _ => false
    }
    case _ => false
  }
}
