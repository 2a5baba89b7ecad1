package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression (SURVEY.md §2 J9): Σ aᵢ·bᵢ over two
  * float/double arrays, accumulated in double, sequential index order —
  * numerically identical to the `zip_with`+`aggregate` composition in
  * queries.Vectors but with a tight generated loop instead of two
  * HigherOrderFunctions allocating an intermediate array per row.
  *
  * Null semantics mirror that composition exactly (so the optimizer
  * rewrite in plans.DotProductRewrite is a pure performance change):
  * zip_with pads unequal lengths with null and `null * x` poisons the
  * aggregate to NULL — therefore unequal lengths or any null element
  * return NULL here too.
  *
  * Codegen matters here: the brute-force similarity scan is
  * O(rows × dim) multiplications; keeping it inside WholeStageCodegen
  * with no per-row allocation is the difference between compute-bound
  * and GC-bound at 100 TB.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two ARRAY<FLOAT|DOUBLE> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // hoisted: the interpreted path runs per ROW in the O(rows × dim) hot
  // loop this expression exists to speed up — no per-row type dispatch
  @transient private lazy val leftIsFloat = elemType(left) == FloatType
  @transient private lazy val rightIsFloat = elemType(right) == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    val lf = leftIsFloat
    val rf = rightIsFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
      val y = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
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
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
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
      "graft_dot", exprs => {
        // arity-check here: exprs(1) on a 1-arg call would surface as a
        // bare IndexOutOfBoundsException with no function context
        require(exprs.length == 2,
          s"graft_dot expects exactly 2 arguments, got ${exprs.length}")
        DotProductF(exprs(0), exprs(1))
      }, "scala_udf")
  }
}
