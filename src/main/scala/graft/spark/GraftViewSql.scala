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

  private val CreateRe =
    """(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(IF\s+NOT\s+EXISTS\s+)?([\w.`]+)\s+(?:COMMENT\s+'([^']*)'\s+)?AS\s+(.+?)\s*;?\s*$""".r
  private val DropRe =
    """(?is)^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.`]+)\s*;?\s*$""".r
  private val RenameRe =
    """(?is)^\s*ALTER\s+VIEW\s+([\w.`]+)\s+RENAME\s+TO\s+([\w.`]+)\s*;?\s*$""".r
  private val AlterAsRe =
    """(?is)^\s*ALTER\s+VIEW\s+([\w.`]+)\s+AS\s+(.+?)\s*;?\s*$""".r
  private val ShowRe =
    """(?is)^\s*SHOW\s+VIEWS\s+(?:IN|FROM)\s+([\w.`]+)\s*;?\s*$""".r

  private def parts(ident: String): Seq[String] =
    ident.replace("`", "").split('.').toSeq

  /** The statement is ours iff its identifier names a registered Graft
    * catalog EXPLICITLY (cat.db.view). Anything else — temp views,
    * session-catalog views, other catalogs — falls through. */
  private def graftParts(ident: String, expect: Int): Option[Seq[String]] = {
    val p = parts(ident)
    if (p.length != expect) None
    else SparkSession.getActiveSession.flatMap(s =>
      GraftSqlBridge.catalogPlugin(s, p.head)) match {
      case Some(_: GraftCatalogPlugin) => Some(p)
      case _ => None
    }
  }

  def parse(sqlText: String, idParser: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case CreateRe(replace, ifNot, ident, comment, query) =>
        graftParts(ident, 3).map(p => GraftCreateViewCommand(
          p, query, replace != null, ifNot != null, Option(comment)))
      case DropRe(ifExists, ident) =>
        graftParts(ident, 3).map(p => GraftDropViewCommand(p, ifExists != null))
      case RenameRe(from, to) =>
        graftParts(from, 3).flatMap { f =>
          val t = parts(to)
          // RENAME target may repeat the catalog or stay relative
          val tp = if (t.length == 3) t else f.head +: t
          if (tp.length == 3 && tp.head == f.head) Some(GraftRenameViewCommand(f, tp))
          else None
        }
      case AlterAsRe(ident, query) =>
        graftParts(ident, 3).map(p => GraftAlterViewAsCommand(p, query))
      case ShowRe(ident) =>
        graftParts(ident, 2).map(p => GraftShowViewsCommand(p))
      case _ => None
    }

  private[spark] def pluginOf(spark: SparkSession, name: String): GraftCatalogPlugin =
    GraftSqlBridge.catalogPlugin(spark, name) match {
      case Some(g: GraftCatalogPlugin) => g
      case _ => throw new IllegalArgumentException(s"$name is not a Graft catalog")
    }
}

/** CREATE [OR REPLACE] VIEW cat.db.v [COMMENT '...'] AS <query>.
  * The body is ANALYZED now (loud failure on a broken query, schema
  * captured for documentation), then persisted as SQL text with the
  * session's current catalog + namespace as the resolution context. */
case class GraftCreateViewCommand(
    viewParts: Seq[String], queryText: String,
    replace: Boolean, ifNotExists: Boolean,
    comment: Option[String]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val cat: GraftCatalog = GraftViewSql.pluginOf(spark, viewParts.head).graftCatalog
    val q = viewParts.tail.mkString(".")
    if (cat.viewExists(q) && ifNotExists) return Seq.empty
    val schemaJson = spark.sql(queryText).schema.json // analyzes, runs nothing
    cat.createView(q, queryText,
      defaultCatalog = GraftSqlBridge.currentCatalogName(spark),
      defaultNamespace = GraftSqlBridge.currentNamespace(spark),
      schemaJson = schemaJson, comment = comment, replace = replace)
    Seq.empty
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
    val schemaJson = spark.sql(queryText).schema.json
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

  private def defOf(parts: Seq[String]): Option[GraftViewDef] =
    if (parts.length != 3) None
    else GraftSqlBridge.catalogPlugin(spark, parts.head) match {
      case Some(g: GraftCatalogPlugin) =>
        g.graftCatalog.loadView(parts.tail.mkString("."))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation if defOf(u.multipartIdentifier).isDefined =>
      expand(u.multipartIdentifier, Set.empty)
  }

  private def expand(viewParts: Seq[String], seen: Set[String]): LogicalPlan = {
    val key = viewParts.map(_.toLowerCase).mkString(".")
    if (seen(key)) throw new IllegalStateException(
      s"recursive view reference: ${(seen + key).toSeq.sorted.mkString(" -> ")}")
    val d = defOf(viewParts).getOrElse(
      throw new IllegalStateException(s"view $key vanished during resolution"))
    val body = GraftSqlBridge.parsePlan(spark, d.sql)
    // bare / 2-part names inside the body resolve in the context the
    // view was CREATED in, not the reader's current catalog
    val qualified = body.transformUp {
      case u: UnresolvedRelation =>
        val p = u.multipartIdentifier
        val np =
          if (p.length == 1) (d.defaultCatalog +: d.defaultNamespace) :+ p.head
          else if (p.length == 2) d.defaultCatalog +: p
          else p
        u.copy(multipartIdentifier = np)
    }
    val expanded = qualified.transformUp {
      case u: UnresolvedRelation if defOf(u.multipartIdentifier).isDefined =>
        expand(u.multipartIdentifier, seen + key)
    }
    SubqueryAlias(viewParts.last, expanded)
  }
}
