package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression (SURVEY.md §2 J9): Σ aᵢ·bᵢ over two numeric
  * arrays, accumulated in double, sequential index order — numerically
  * identical to the `zip_with`+`aggregate` composition in queries.Vectors
  * but with a tight generated loop instead of two HigherOrderFunctions
  * allocating an intermediate array per row.
  *
  * Codegen matters here: the brute-force similarity scan is
  * O(rows × dim) multiplications; keeping it inside WholeStageCodegen
  * with no per-row allocation is the difference between compute-bound
  * and GC-bound at 100 TB. Falls back to a null result if either side is
  * null or lengths differ (defensive, mirrors zip_with's null handling).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    val lt = elemType(left)
    val rt = elemType(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lt == FloatType) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rt == FloatType) ys.getFloat(i).toDouble else ys.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductF =
    copy(left = l, right = r)
}

object DotProductF {
  /** Column-API entry point. */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProductF(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Optional SQL surface: registers `graft_dot` in a session's function
    * registry (usable from spark.sql). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProductF(exprs(0), exprs(1)), "scala_udf")
  }
}
