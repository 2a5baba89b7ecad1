package graft.plans

import graft.functions.DotProductF
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Optimizer rule (SURVEY.md §4, J9): rewrites the declarative
  * dot-product composition
  *
  *   aggregate(zip_with(a, b, (x, y) => CAST(x) * CAST(y)), 0.0, (acc, e) => acc + e)
  *
  * into the native codegen'd [[DotProductF]] — same numerics (double
  * accumulation, element order), but one fused loop instead of two
  * interpreted higher-order functions materializing an intermediate
  * array per row. Users writing idiomatic Spark get the fast path
  * automatically once the rule is registered:
  *
  *   spark.experimental.extraOptimizations ++= Seq(DotProductRewrite)
  *
  * The match is deliberately strict (exact multiply-of-casts and
  * add-accumulate lambdas, double zero literal) — anything else keeps
  * Spark's own semantics untouched.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case x: NamedLambdaVariable => x.exprId == v.exprId
    case Cast(x: NamedLambdaVariable, DoubleType, _, _) => x.exprId == v.exprId
    case _ => false
  }

  /** Only float/double arrays: DotProductF reads array slots via
    * getFloat/getDouble — matching an int/long array would read garbage.
    * (Null elements and length mismatches are safe: DotProductF returns
    * NULL for both, mirroring the zip_with composition.) */
  private def isFloating(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** A strict double 0.0 literal — NOT `eval() == 0.0`, which is true for
    * a boxed Integer 0 under Scala's numeric-coercing equals and would
    * rewrite an integer-typed aggregate whose semantics we don't model. */
  private def isDoubleZero(zero: Expression): Boolean = zero match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(left, right,
              LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(Add(aa, ae, _), Seq(acc: NamedLambdaVariable, e: NamedLambdaVariable), _),
            finish)
          if isFloating(left.dataType) && isFloating(right.dataType) &&
            isDoubleZero(zero) &&
            ((isVar(mx, x) && isVar(my, y)) || (isVar(mx, y) && isVar(my, x))) &&
            ((isVar(aa, acc) && isVar(ae, e)) || (isVar(aa, e) && isVar(ae, acc))) &&
            isIdentityFinish(finish) =>
        DotProductF(left, right)
    }

  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  /** Convenience: register on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraOptimizations.contains(DotProductRewrite))
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ DotProductRewrite
  }
}
