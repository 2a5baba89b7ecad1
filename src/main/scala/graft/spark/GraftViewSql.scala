package graft.spark

import org.apache.spark.sql.{GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StringType

import graft.table.{GraftCatalog, GraftViewDef}

/** SQL VIEWS over the Graft catalog (the Iceberg view-spec analog).
  *
  * Stock Spark 4.1 ships the `ViewCatalog` connector API but wires NO
  * analyzer support for it (nothing in catalyst calls `loadView`), so —
  * like Iceberg's own Spark extensions — views route through the two
  * extension points this engine already uses:
  *
  *  - DDL (`CREATE/DROP/ALTER VIEW`, `SHOW VIEWS`) is claimed by the
  *    delegating parser (GraftSqlParser) ONLY when the statement names a
  *    registered Graft catalog explicitly (3-part identifier); every
  *    other view statement falls through to stock Spark untouched, so
  *    temp views and session-catalog views keep their exact semantics.
  *  - Reads resolve via an injected resolution rule (GraftViewResolution)
  *    that expands a view reference into its parsed body — the same
  *    plan-substitution Spark performs for session-catalog views. Bare
  *    table names inside the body are qualified with the resolution
  *    context captured at CREATE time, so the view means the same thing
  *    from any session. Nested views expand recursively with loud cycle
  *    detection. Late-binding: a rename that breaks a referenced column
  *    fails the read with the analyzer's missing-column error. */
object GraftViewSql {

  // Quoted literals use SQL '' doubling for embedded quotes; the
  // TBLPROPERTIES group is quote-aware (a ')' INSIDE a quoted value
  // must not close the list — ADVICE r14: 'a)b' round-tripped to a
  // parse failure under the old ([^)]*) capture).
  private val Quoted = """'(?:[^']|'')*'"""
  private val CreateRe =
    s"""(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?VIEW\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.`]+)\\s+(?:COMMENT\\s+'((?:[^']|'')*)'\\s+)?(?:TBLPROPERTIES\\s*\\(((?:$Quoted|[^')])*)\\)\\s+)?AS\\s+(.+?)\\s*;?\\s*$$""".r
  private val DropRe =
    """(?is)^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.`]+)\s*;?\s*$""".r
  private val RenameRe =
    """(?is)^\s*ALTER\s+VIEW\s+([\w.`]+)\s+RENAME\s+TO\s+([\w.`]+)\s*;?\s*$""".r
  private val SetPropsRe =
    """(?is)^\s*ALTER\s+VIEW\s+([\w.`]+)\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*;?\s*$""".r
  private val UnsetPropsRe =
    """(?is)^\s*ALTER\s+VIEW\s+([\w.`]+)\s+UNSET\s+TBLPROPERTIES\s*(IF\s+EXISTS\s+)?\((.+)\)\s*;?\s*$""".r
  private val AlterAsRe =
    """(?is)^\s*ALTER\s+VIEW\s+([\w.`]+)\s+AS\s+(.+?)\s*;?\s*$""".r
  private val ShowRe =
    """(?is)^\s*SHOW\s+VIEWS\s+(?:IN|FROM)\s+([\w.`]+)\s*;?\s*$""".r
  private val ShowCreateRe =
    """(?is)^\s*SHOW\s+CREATE\s+VIEW\s+([\w.`]+)\s*;?\s*$""".r

  // TBLPROPERTIES lists: quoted 'k'='v' pairs / quoted 'k' keys (the
  // spelling every engine emits; unquoted identifier keys also accepted).
  // Embedded quotes arrive '' -doubled and are unescaped here.
  private val PropPairRe =
    """'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'|([\w.\-]+)\s*=\s*'((?:[^']|'')*)'""".r
  private val PropKeyRe = """'((?:[^']|'')*)'|([\w.\-]+)""".r

  private[spark] def unescapeSq(s: String): String = s.replace("''", "'")
  private[spark] def escapeSq(s: String): String = s.replace("'", "''")

  private def parseProps(s: String): Map[String, String] =
    PropPairRe.findAllMatchIn(s).map { m =>
      (if (m.group(1) != null) unescapeSq(m.group(1)) else m.group(3)) ->
        unescapeSq(if (m.group(2) != null) m.group(2) else m.group(4))
    }.toMap

  private def parseKeys(s: String): Seq[String] =
    PropKeyRe.findAllMatchIn(s)
      .map(m => if (m.group(1) != null) unescapeSq(m.group(1)) else m.group(2)).toSeq

  private def parts(ident: String): Seq[String] =
    ident.replace("`", "").split('.').toSeq

  /** The statement is ours iff its identifier RESOLVES to a registered
    * Graft catalog — explicitly (cat.db.view) or via the session's
    * current catalog/namespace (`USE cat.db` then bare names), the same
    * CatalogAndIdentifier resolution Spark applies to tables. Anything
    * else — temp views, session-catalog views, other catalogs — falls
    * through to stock Spark untouched. Returns the FULLY-QUALIFIED
    * 3-part identifier. */
  private def graftParts(ident: String, expect: Int): Option[Seq[String]] = {
    val p = parts(ident)
    SparkSession.getActiveSession.flatMap { s =>
      val (catName, rest) =
        if (p.length > 1 && GraftSqlBridge.catalogPlugin(s, p.head).isDefined)
          (p.head, p.tail)
        else (GraftSqlBridge.currentCatalogName(s), p)
      val full =
        if (expect == 3 && rest.length == 1)
          (catName +: GraftSqlBridge.currentNamespace(s)) :+ rest.head
        else catName +: rest
      if (full.length != expect) None
      else GraftSqlBridge.catalogPlugin(s, full.head) match {
        case Some(_: GraftCatalogPlugin) => Some(full)
        case _ => None
      }
    }
  }

  def parse(sqlText: String, idParser: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case CreateRe(replace, ifNot, ident, comment, props, query) =>
        graftParts(ident, 3).map(p => GraftCreateViewCommand(
          p, query, replace != null, ifNot != null,
          Option(comment).map(unescapeSq),
          Option(props).map(parseProps).getOrElse(Map.empty)))
      case DropRe(ifExists, ident) =>
        graftParts(ident, 3).map(p => GraftDropViewCommand(p, ifExists != null))
      case RenameRe(from, to) =>
        graftParts(from, 3).flatMap { f =>
          val t = parts(to)
          // RENAME target may repeat the catalog, name db.view, or be a
          // bare view name (rename within the same namespace — the
          // common spelling)
          val tp = t.length match {
            case 3 => t
            case 2 => f.head +: t
            case 1 => f.init :+ t.head
            case _ => Nil
          }
          if (tp.length == 3 && tp.head == f.head) Some(GraftRenameViewCommand(f, tp))
          else None
        }
      case SetPropsRe(ident, propsStr) =>
        graftParts(ident, 3).flatMap { p =>
          val kvs = parseProps(propsStr)
          if (kvs.isEmpty) None else Some(GraftSetViewPropsCommand(p, kvs))
        }
      case UnsetPropsRe(ident, ifExists, keysStr) =>
        graftParts(ident, 3).flatMap { p =>
          val keys = parseKeys(keysStr)
          if (keys.isEmpty) None
          else Some(GraftUnsetViewPropsCommand(p, keys, ifExists != null))
        }
      case AlterAsRe(ident, query) =>
        graftParts(ident, 3).map(p => GraftAlterViewAsCommand(p, query))
      case ShowRe(ident) =>
        graftParts(ident, 2).map(p => GraftShowViewsCommand(p))
      case ShowCreateRe(ident) =>
        graftParts(ident, 3).map(p => GraftShowCreateViewCommand(p))
      case _ => None
    }

  private[spark] def pluginOf(spark: SparkSession, name: String): GraftCatalogPlugin =
    GraftSqlBridge.catalogPlugin(spark, name) match {
      case Some(g: GraftCatalogPlugin) => g
      case _ => throw new IllegalArgumentException(s"$name is not a Graft catalog")
    }

  /** Analyze a view body WITHOUT executing it and return its schema JSON.
    * `spark.sql(body)` would EXECUTE eagerly when the body is a command —
    * `CREATE VIEW v AS DROP TABLE t` would run the DROP at view-creation
    * time and persist an unreadable view — so parse first and require a
    * query plan; for a query, analysis runs nothing. */
  private[spark] def analyzeBody(spark: SparkSession, queryText: String): String = {
    import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, ParsedStatement}
    val parsed = GraftSqlBridge.parsePlan(spark, queryText)
    parsed match {
      case _: Command | _: ParsedStatement | _: InsertIntoStatement =>
        throw new IllegalArgumentException(
          s"view body must be a query, got ${parsed.nodeName}: $queryText")
      case _ => ()
    }
    GraftSqlBridge.ofRows(spark, parsed).schema.json
  }
}

/** CREATE [OR REPLACE] VIEW cat.db.v [COMMENT '...'] AS <query>.
  * The body is ANALYZED now (loud failure on a broken query, schema
  * captured for documentation), then persisted as SQL text with the
  * session's current catalog + namespace as the resolution context. */
case class GraftCreateViewCommand(
    viewParts: Seq[String], queryText: String,
    replace: Boolean, ifNotExists: Boolean,
    comment: Option[String],
    properties: Map[String, String] = Map.empty) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat: GraftCatalog = GraftViewSql.pluginOf(spark, viewParts.head).graftCatalog
    val q = viewParts.tail.mkString(".")
    if (cat.viewExists(q) && ifNotExists) return Seq.empty
    val schemaJson = GraftViewSql.analyzeBody(spark, queryText)
    cat.createView(q, queryText,
      defaultCatalog = GraftSqlBridge.currentCatalogName(spark),
      defaultNamespace = GraftSqlBridge.currentNamespace(spark),
      schemaJson = schemaJson, comment = comment, properties = properties,
      replace = replace)
    Seq.empty
  }
}

/** ALTER VIEW … SET TBLPROPERTIES — metadata-only republish: body,
  * resolution context, and comment carry over unchanged. */
case class GraftSetViewPropsCommand(
    viewParts: Seq[String], props: Map[String, String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.pluginOf(spark, viewParts.head).graftCatalog
    val q = viewParts.tail.mkString(".")
    val prev = cat.loadView(q).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(viewParts))
    cat.createView(q, prev.sql,
      defaultCatalog = prev.defaultCatalog, defaultNamespace = prev.defaultNamespace,
      schemaJson = prev.schemaJson, comment = prev.comment,
      properties = prev.allProperties ++ props, replace = true)
    Seq.empty
  }
}

/** ALTER VIEW … UNSET TBLPROPERTIES [IF EXISTS] — without IF EXISTS a
  * missing key fails loudly (stock Spark's contract). */
case class GraftUnsetViewPropsCommand(
    viewParts: Seq[String], keys: Seq[String], ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.pluginOf(spark, viewParts.head).graftCatalog
    val q = viewParts.tail.mkString(".")
    val prev = cat.loadView(q).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(viewParts))
    val missing = keys.filterNot(prev.allProperties.contains)
    if (missing.nonEmpty && !ifExists) throw new IllegalArgumentException(
      s"cannot unset missing propert${if (missing.size == 1) "y" else "ies"} " +
        s"${missing.mkString(", ")} on view ${viewParts.mkString(".")} (use IF EXISTS)")
    cat.createView(q, prev.sql,
      defaultCatalog = prev.defaultCatalog, defaultNamespace = prev.defaultNamespace,
      schemaJson = prev.schemaJson, comment = prev.comment,
      properties = prev.allProperties -- keys, replace = true)
    Seq.empty
  }
}

/** SHOW CREATE VIEW — reconstructs a re-runnable CREATE statement from
  * the stored definition (body text verbatim; comment + properties in
  * the spellings CreateRe parses, so the output round-trips). */
case class GraftShowCreateViewCommand(viewParts: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("createview_stmt", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.pluginOf(spark, viewParts.head).graftCatalog
    val d = cat.loadView(viewParts.tail.mkString(".")).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(viewParts))
    // '' -double embedded quotes so the emitted statement re-parses
    // (CreateRe/PropPairRe unescape) — ADVICE r14: a comment or value
    // containing a single quote used to emit a non-re-parseable stmt
    import GraftViewSql.escapeSq
    val sb = new StringBuilder(s"CREATE VIEW ${viewParts.mkString(".")}")
    d.comment.foreach(c => sb.append(s"\nCOMMENT '${escapeSq(c)}'"))
    if (d.allProperties.nonEmpty)
      sb.append("\nTBLPROPERTIES (").append(d.allProperties.toSeq.sortBy(_._1)
        .map { case (k, v) => s"'${escapeSq(k)}' = '${escapeSq(v)}'" }
        .mkString(", ")).append(")")
    sb.append(s"\nAS ${d.sql}")
    Seq(Row(sb.toString))
  }
}

case class GraftDropViewCommand(
    viewParts: Seq[String], ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.pluginOf(spark, viewParts.head).graftCatalog
    val existed = cat.dropView(viewParts.tail.mkString("."))
    if (!existed && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(viewParts)
    Seq.empty
  }
}

case class GraftAlterViewAsCommand(
    viewParts: Seq[String], queryText: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.pluginOf(spark, viewParts.head).graftCatalog
    val q = viewParts.tail.mkString(".")
    require(cat.viewExists(q), s"no view ${viewParts.mkString(".")}")
    val schemaJson = GraftViewSql.analyzeBody(spark, queryText)
    val prev = cat.loadView(q).get
    cat.createView(q, queryText,
      defaultCatalog = GraftSqlBridge.currentCatalogName(spark),
      defaultNamespace = GraftSqlBridge.currentNamespace(spark),
      schemaJson = schemaJson, comment = prev.comment,
      properties = prev.allProperties, replace = true)
    Seq.empty
  }
}

case class GraftRenameViewCommand(
    fromParts: Seq[String], toParts: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.pluginOf(spark, fromParts.head).graftCatalog
    cat.renameView(fromParts.tail.mkString("."), toParts.tail.mkString("."))
    Seq.empty
  }
}

case class GraftShowViewsCommand(nsParts: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("viewName", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = GraftViewSql.pluginOf(spark, nsParts.head).graftCatalog
    cat.listViews(nsParts(1)).map(v => Row(nsParts(1), v))
  }
}

/** Connector-API view handle (ViewCatalog.loadView's return). */
class GraftV2View(fullName: String, d: GraftViewDef)
    extends org.apache.spark.sql.connector.catalog.View {
  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.connector.catalog.ViewCatalog
  import org.apache.spark.sql.types.{DataType, StructType}
  override def name: String = fullName
  override def query: String = d.sql
  override def currentCatalog: String = d.defaultCatalog
  override def currentNamespace: Array[String] = d.defaultNamespace.toArray
  override def schema: StructType =
    DataType.fromJson(d.schemaJson).asInstanceOf[StructType]
  override def queryColumnNames: Array[String] = schema.fieldNames
  override def columnAliases: Array[String] = Array.empty
  override def columnComments: Array[String] = Array.empty
  override def properties: java.util.Map[String, String] =
    (d.allProperties ++ d.comment.map(ViewCatalog.PROP_COMMENT -> _)).asJava
}

/** Expands `UnresolvedRelation(cat.db.v)` into the view's parsed body
  * when (cat, db.v) names a persisted Graft view — plan substitution,
  * exactly how Spark resolves session-catalog views. Runs in the main
  * resolution batch; table references keep resolving through the
  * TableCatalog path untouched. */
case class GraftViewResolution(spark: SparkSession) extends Rule[LogicalPlan] {

  private def lookup(parts: Seq[String]): Option[GraftViewDef] =
    if (parts.length != 3) None
    else GraftSqlBridge.catalogPlugin(spark, parts.head) match {
      case Some(g: GraftCatalogPlugin) =>
        g.graftCatalog.loadView(parts.tail.mkString("."))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // per-apply memo: the analyzer batch is fixed-point and lookup() is
    // warehouse IO (a listing + a read — an HTTP round trip over
    // graftsvc://); most 3-part names are TABLES, so cache negatives too
    val memo = scala.collection.mutable.HashMap.empty[Seq[String], Option[GraftViewDef]]
    def defOf(parts: Seq[String]): Option[GraftViewDef] =
      memo.getOrElseUpdate(parts, lookup(parts))
    def expand(viewParts: Seq[String], seen: Set[String]): LogicalPlan = {
      val key = viewParts.map(_.toLowerCase).mkString(".")
      if (seen(key)) throw new IllegalStateException(
        s"recursive view reference: ${(seen + key).toSeq.sorted.mkString(" -> ")}")
      val d = defOf(viewParts).getOrElse(
        throw new IllegalStateException(s"view $key vanished during resolution"))
      val parsed = GraftSqlBridge.parsePlan(spark, d.sql)
      // WITH clauses: the analyzer's CTESubstitution lives in the
      // Substitution batch, which already ran on the OUTER query — a
      // body spliced in mid-Resolution would keep its UnresolvedWith
      // forever (and qualifying a CTE name would rebind a cleanly-
      // created view to a same-named real table). Substitute here, with
      // Spark's own rule, before touching any names: CTE refs become
      // CTERelationRef/inlined definitions and every remaining
      // UnresolvedRelation is a genuine table/view reference.
      val body = org.apache.spark.sql.catalyst.analysis.CTESubstitution(parsed)
      // bare / 2-part names resolve in the context the view was CREATED
      // in, not the reader's current catalog; subquery expressions
      // (IN/EXISTS/scalar) carry table refs too, hence WithSubqueries
      val qualified = body.transformUpWithSubqueries {
        case u: UnresolvedRelation =>
          val p = u.multipartIdentifier
          val np =
            if (p.length == 1) (d.defaultCatalog +: d.defaultNamespace) :+ p.head
            else if (p.length == 2) d.defaultCatalog +: p
            else p
          u.copy(multipartIdentifier = np)
      }
      val expanded = qualified.transformUpWithSubqueries {
        case u: UnresolvedRelation if defOf(u.multipartIdentifier).isDefined =>
          expand(u.multipartIdentifier, seen + key)
      }
      SubqueryAlias(viewParts.last, expanded)
    }
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if defOf(u.multipartIdentifier).isDefined =>
        expand(u.multipartIdentifier, Set.empty)
    }
  }
}
