package graft.spark

import org.apache.spark.sql.{GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** Iceberg's partition-evolution DDL extension syntax, literally
  * (reference README.md:304 — the reference itself needs the Iceberg
  * extensions jar for this):
  *
  *   ALTER TABLE t ADD PARTITION FIELD days(ts)         -- also months/
  *                                                      -- years/hours
  *   ALTER TABLE t ADD PARTITION FIELD bucket(16, id)   -- and truncate
  *   ALTER TABLE t DROP PARTITION FIELD days(ts)        -- or bare column
  *
  * Implemented as a delegating `ParserInterface` (the standard extension
  * parser pattern): the two statement shapes stock Spark cannot parse are
  * recognized here and routed to the tested `GraftTable.addPartitionField`
  * / `dropPartitionField`; every other string falls through to the
  * delegate untouched, so the extension can never change the meaning of
  * SQL Spark already accepts. `CALL system.add_partition_field` remains
  * the procedure-surface equivalent of the same operations. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftPartitionFieldSql.parse(sqlText, delegate)
      .orElse(GraftViewSql.parse(sqlText, delegate))
      .getOrElse(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    GraftPartitionFieldSql.parse(sqlText, delegate)
      .orElse(GraftViewSql.parse(sqlText, delegate))
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftPartitionFieldSql {

  // The TABLE group is restricted to identifier characters: a looser
  // `.+?` would also match statements that merely CONTAIN the phrase —
  // `ALTER TABLE t SET TBLPROPERTIES ('x'='ADD PARTITION FIELD ...')`
  // must fall through to the stock parser untouched.
  private val AddRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*$""".r
  private val DropRe =
    """(?is)^\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*$""".r

  // days(ts) | bucket(16, id) | bare column
  private val UnaryT = """(?i)^\s*(\w+)\s*\(\s*([\w.`]+)\s*\)\s*$""".r
  private val BinaryT = """(?i)^\s*(\w+)\s*\(\s*(\d+)\s*,\s*([\w.`]+)\s*\)\s*$""".r
  private val BareT = """^\s*([\w.`]+)\s*$""".r

  /** (source column, Transforms spec string) for a SQL transform text.
    * None when the text matches no recognized shape — the statement then
    * falls through to the delegate (whose own error surfaces), so this
    * extension can only ever CLAIM statements it fully understands. */
  private def transformOf(text: String): Option[(String, String)] = text match {
    case UnaryT(fn, col) => fn.toLowerCase match {
      case "days" | "day"     => Some((strip(col), "days"))
      case "months" | "month" => Some((strip(col), "months"))
      case "years" | "year"   => Some((strip(col), "years"))
      case "hours" | "hour"   => Some((strip(col), "hours"))
      case _ => None
    }
    case BinaryT(fn, n, col) => fn.toLowerCase match {
      case "bucket"   => Some((strip(col), s"bucket[$n]"))
      case "truncate" => Some((strip(col), s"truncate[$n]"))
      case _ => None
    }
    // bare column = identity partitioning (Iceberg's default transform);
    // Transforms.validate still rejects unsuitable source types with a
    // typed error from the command's run, not a parse-time throw
    case BareT(col) => Some((strip(col), "identity"))
    case _ => None
  }

  private def strip(ident: String): String = ident.replace("`", "")

  /** Trailing `-- comment` after the transform is tolerated (spark-sql
    * sessions paste statements with them); anything else unrecognized
    * falls through. */
  private def stripComment(t: String): String =
    t.replaceAll("(?s)--.*$", "").trim

  def parse(sqlText: String, idParser: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case AddRe(table, transform) =>
        transformOf(stripComment(transform)).map { case (col, spec) =>
          GraftPartitionFieldCommand(
            idParser.parseMultipartIdentifier(table), col, Some(spec))
        }
      case DropRe(table, transform) =>
        // DROP accepts either the transform shape or the bare source
        // column (both name the same field: one transform per source)
        val colOpt = stripComment(transform) match {
          case BareT(c) => Some(strip(c))
          case t        => transformOf(t).map(_._1)
        }
        colOpt.map(col => GraftPartitionFieldCommand(
          idParser.parseMultipartIdentifier(table), col, None))
      case _ => None
    }
}

/** ADD (spec = Some) / DROP (spec = None) PARTITION FIELD on a Graft
  * table resolved through the session's v2 catalogs. */
case class GraftPartitionFieldCommand(
    tableParts: Seq[String],
    column: String,
    spec: Option[String]) extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val table = GraftSqlBridge.resolveV2Table(spark, tableParts) match {
      case g: GraftDsv2Table => g.table
      case t => throw new IllegalArgumentException(
        s"${tableParts.mkString(".")} (${t.getClass.getSimpleName}) is not a Graft table")
    }
    spec match {
      case Some(s) => table.addPartitionField(column, s)
      case None    => table.dropPartitionField(column)
    }
    Seq.empty
  }
}
