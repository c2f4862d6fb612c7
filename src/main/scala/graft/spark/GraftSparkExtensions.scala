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
  }
}

/** Delegating parser that intercepts graft statements
  * (reference OlympiaSparkSqlExtensionsParser.scala:44-98).
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val txnRe =
    """(?is)^\s*(BEGIN|COMMIT|ROLLBACK)(\s+TRANSACTION)?\s*;?\s*$""".r
  // CREATE [OR REPLACE] VIEW v [(aliases)] [COMMENT '..']
  //   [TBLPROPERTIES('k'='v',..)] AS query  (reference grammar scope,
  //   spark-extensions/.../OlympiaSqlExtensions.g4:17-46)
  private val createViewRe =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([\w.`]+)\s*""" +
      """(?:\(\s*([\w`\s,]+?)\s*\)\s*)?""" +
      """(?:COMMENT\s+'((?:[^']|'')*)'\s*)?""" +
      """(?:TBLPROPERTIES\s*\(\s*([^)]*?)\s*\)\s*)?""" +
      """AS\s+(.+?)\s*;?\s*$""").r
  private val dropViewRe =
    """(?is)^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.`]+)\s*;?\s*$""".r
  private val showViewsRe =
    """(?is)^\s*SHOW\s+VIEWS(?:\s+(?:IN|FROM)\s+([\w.`]+))?\s*;?\s*$""".r
  private val alterViewRe =
    ("""(?is)^\s*ALTER\s+VIEW\s+([\w.`]+)\s+SET\s+""" +
      """TBLPROPERTIES\s*\(\s*([^)]*?)\s*\)\s*;?\s*$""").r

  private val propRe = """'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'""".r

  // MERGE INTO tgt [AS t] USING src|(query) [AS s] ON cond
  //   [WHEN MATCHED THEN UPDATE SET ... | WHEN MATCHED THEN DELETE]
  //   [WHEN NOT MATCHED THEN INSERT (cols) VALUES (exprs) | INSERT *]
  private val mergeRe =
    ("""(?is)^\s*MERGE\s+INTO\s+([\w.`]+)(?:\s+AS)?(?:\s+(?!USING\b)(\w+))?\s+USING\s+""" +
      """((?:\(.*?\))|[\w.`]+)(?:\s+AS)?(?:\s+(?!ON\b)(\w+))?\s+ON\s+(.+?)\s+(WHEN\s.+?)\s*;?\s*$""").r
  private val mergeUpdRe =
    """(?is)WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(.+?)(?=\s+WHEN\s|\s*$)""".r
  private val mergeDelRe = """(?is)WHEN\s+MATCHED\s+THEN\s+DELETE""".r
  private val mergeInsRe =
    ("""(?is)WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*""" +
      """(?:\(\s*([^)]*?)\s*\)\s*VALUES\s*\((.+?)\)(?=\s+WHEN\s|\s*$)|\*)""").r

  // UPDATE t SET a = expr [, b = expr ...] [WHERE cond]
  private val updateRe =
    """(?is)^\s*UPDATE\s+([\w.`]+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r

  /** Split on commas NOT nested in (), [] or quotes. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur.append(c)
        case '(' | '[' => depth += 1; cur.append(c)
        case ')' | ']' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

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
    case createViewRe(replace, ident, aliases, comment, props, query) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) =>
          val aliasList = Option(aliases).toSeq.flatMap(
            _.split(',').map(_.trim.replace("`", "")).filter(_.nonEmpty))
          CreateGraftViewCommand(cat, ns, name, query.trim, replace != null,
            aliasList, Option(comment).map(_.replace("''", "'")),
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
    case mergeRe(ident, tAliasOpt, srcPart, sAliasOpt, onCond, whenPart) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) =>
          val matchedUpdate = mergeUpdRe.findFirstMatchIn(whenPart)
            .map(m => splitTopLevel(m.group(1)).map { a =>
              val eq = a.indexOf('=')
              require(eq > 0, s"malformed MERGE SET assignment: $a")
              val lhs = a.take(eq).trim.replace("`", "")
              // target-qualified LHS (t.col) refers to the target column
              (lhs.substring(lhs.lastIndexOf('.') + 1), a.drop(eq + 1).trim)
            })
          val matchedDelete = mergeDelRe.findFirstIn(whenPart).isDefined
          require(!(matchedUpdate.isDefined && matchedDelete),
            "MERGE supports one WHEN MATCHED clause (UPDATE or DELETE)")
          val notMatched = mergeInsRe.findFirstMatchIn(whenPart).map { m =>
            if (m.group(1) == null) (Seq.empty[String], Seq.empty[String]) // INSERT *
            else (m.group(1).split(',').map(_.trim.replace("`", "")).toSeq,
              splitTopLevel(m.group(2)))
          }
          MergeGraftTableCommand(cat, ns, name,
            Option(tAliasOpt).getOrElse(name),
            srcPart.trim, Option(sAliasOpt).getOrElse("__src"),
            onCond.trim, matchedUpdate, matchedDelete, notMatched)
        case _ => delegate.parsePlan(sqlText)
      }
    case updateRe(ident, setClause, where) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) =>
          val assignments = splitTopLevel(setClause).map { a =>
            val eq = a.indexOf('=')
            require(eq > 0, s"malformed SET assignment: $a")
            (a.take(eq).trim.replace("`", ""), a.drop(eq + 1).trim)
          }
          UpdateGraftTableCommand(cat, ns, name, assignments, Option(where))
        case _ => delegate.parsePlan(sqlText)
      }
    case alterViewRe(ident, props) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) =>
          AlterGraftViewCommand(cat, ns, name, parseProps(props))
        case _ => delegate.parsePlan(sqlText)
      }
    case dropViewRe(ifExists, ident) =>
      val parts = delegate.parseMultipartIdentifier(ident.replace("`", ""))
      graftCatalogFor(parts) match {
        case Some((cat, Seq(ns, name))) =>
          DropGraftViewCommand(cat, ns, name, ifExists != null)
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

case class CreateGraftViewCommand(catalogName: String, ns: String, name: String,
    query: String, replace: Boolean, columnAliases: Seq[String] = Seq.empty,
    comment: Option[String] = None, properties: Map[String, String] = Map.empty)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val baseSchema = session.sql(query).schema
    // column aliases are folded into the stored SQL so the persisted
    // view is self-contained (no alias metadata needed at resolve time)
    val finalQuery =
      if (columnAliases.isEmpty) query
      else {
        require(columnAliases.length == baseSchema.length,
          s"view $name: ${columnAliases.length} aliases for " +
            s"${baseSchema.length} query columns")
        val sel = baseSchema.fieldNames.zip(columnAliases)
          .map { case (o, a) => s"`$o` AS `$a`" }.mkString(", ")
        s"SELECT $sel FROM ($query)"
      }
    val schema =
      if (columnAliases.isEmpty) baseSchema else session.sql(finalQuery).schema
    val allProps = properties ++ comment.map("comment" -> _)
    import scala.jdk.CollectionConverters._
    val info = new org.apache.spark.sql.connector.catalog.ViewInfo(
      Identifier.of(Array(ns), name), finalQuery, catalogName, Array(ns), schema,
      schema.fieldNames, Array.empty, Array.empty, allProps.asJava)
    if (replace) cat.replaceView(info, true) else cat.createView(info)
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

/** UPDATE t SET ... [WHERE ...] — copy-on-write rewrite committed as
  * an overwrite snapshot (the same storage shape as DELETE). Rows are
  * updated only where the condition is TRUE; NULL/false keep the
  * original values, matching SQL UPDATE semantics.
  */
case class UpdateGraftTableCommand(catalogName: String, ns: String, name: String,
    assignments: Seq[(String, String)], where: Option[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{coalesce, col, expr, lit, when}
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val full = s"$catalogName.$ns.$name"
    val assigned = assignments.toMap
    val unknown = assigned.keySet -- session.table(full).columns.toSet
    require(unknown.isEmpty, s"UPDATE $full: no such column(s): ${unknown.mkString(", ")}")
    val cond = where.map(w => coalesce(expr(w), lit(false))).getOrElse(lit(true))
    // the parsed WHERE doubles as the file-pruning predicate: only
    // files whose stats overlap it are rewritten (selectiveRewrite)
    val pruneExprs = where.toSeq.flatMap(w =>
      scala.util.Try(session.sessionState.sqlParser.parseExpression(w)).toOption)
    cat.selectiveRewrite(session,
      org.apache.spark.sql.connector.catalog.Identifier.of(Array(ns), name),
      pruneExprs,
      df =>
        // every RHS evaluates against the ORIGINAL row (SQL semantics
        // — `SET a = b, b = a` swaps); values cast back to the
        // declared column type so rewritten files keep the table schema
        df.select(df.schema.fields.map { f =>
          assigned.get(f.name) match {
            case Some(valueSql) =>
              when(cond, expr(valueSql).cast(f.dataType))
                .otherwise(col(f.name)).as(f.name)
            case None => col(f.name)
          }
        }.toSeq: _*),
      "update", graft.txn.ActionType.TableUpdate)
    Seq.empty
  }
}

/** MERGE INTO — upsert as a copy-on-write rewrite. Target rows with a
  * source match apply the WHEN MATCHED clause (UPDATE SET / DELETE /
  * keep when absent); unmatched target rows are kept; unmatched
  * SOURCE rows apply WHEN NOT MATCHED INSERT. A target row matching
  * more than one source row is a cardinality violation (standard
  * MERGE error), detected with one extra count.
  */
case class MergeGraftTableCommand(catalogName: String, ns: String, name: String,
    tAlias: String, srcPart: String, sAlias: String, onCond: String,
    matchedUpdate: Option[Seq[(String, String)]], matchedDelete: Boolean,
    notMatched: Option[(Seq[String], Seq[String])])
    extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, expr, lit, when}
    val cat = session.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftCatalog]
    val full = s"$catalogName.$ns.$name"
    val tgt = session.table(full)
    val schema = tgt.schema
    val src0 =
      if (srcPart.startsWith("("))
        session.sql(srcPart.substring(1, srcPart.length - 1))
      else session.table(srcPart)
    // non-null marker column survives the left join to flag matches
    val marker = "__graft_merge_m"
    val srcM = src0.withColumn(marker, lit(1)).alias(sAlias)
    val joined = tgt.alias(tAlias).join(srcM, expr(onCond), "left_outer")
    val nJoined = joined.count()
    val nTgt = tgt.count()
    require(nJoined == nTgt,
      s"MERGE cardinality violation: ${nJoined - nTgt} target row(s) " +
        "matched more than one source row")
    val matched = col(s"$sAlias.$marker").isNotNull

    val updatedOrKept = {
      val base = if (matchedDelete) joined.filter(!matched) else joined
      val assigned = matchedUpdate.getOrElse(Seq.empty).toMap
      base.select(schema.fields.map { f =>
        assigned.get(f.name) match {
          case Some(valueSql) =>
            when(matched, expr(valueSql).cast(f.dataType))
              .otherwise(col(s"$tAlias.${f.name}")).as(f.name)
          case None => col(s"$tAlias.${f.name}").as(f.name)
        }
      }.toSeq: _*)
    }

    val inserted = notMatched.map { case (cols, exprs) =>
      val unknown = cols.toSet -- schema.fieldNames.toSet
      require(unknown.isEmpty,
        s"MERGE INSERT: no such column(s): ${unknown.mkString(", ")}")
      require(cols.length == exprs.length,
        s"MERGE INSERT: ${cols.length} columns but ${exprs.length} values")
      val srcUnmatched = src0.alias(sAlias)
        .join(tgt.alias(tAlias), expr(onCond), "left_anti")
      val byName = cols.zip(exprs).toMap
      srcUnmatched.select(schema.fields.map { f =>
        val e =
          if (cols.isEmpty) col(f.name) // INSERT *: source columns by name
          else byName.get(f.name).map(expr).getOrElse(lit(null))
        e.cast(f.dataType).as(f.name)
      }.toSeq: _*)
    }

    val result = inserted.fold(updatedOrKept)(updatedOrKept.unionAll)
    cat.commitWrite(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array(ns), name), result, overwrite = true)
    Seq.empty
  }
}
