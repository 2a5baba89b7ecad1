package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** User-facing entry for the native as-of join (AsOfJoin/AsOfJoinExec).
  * Requires the AsOfJoinStrategy to be registered — GraftExtensions
  * does, so any session wired with
  * `spark.sql.extensions=graft.spark.GraftExtensions` plans it. */
object AsOf {
  /** Left as-of join: every left row + the right row with the same key
    * and the greatest rightTs ≤ leftTs (nulls when none). Output =
    * left columns ++ right columns (right nullable). */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String): DataFrame = {
    val lp = GraftPlanBridge.analyzed(left)
    val rp = GraftPlanBridge.analyzed(right)
    def attr(p: LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"no column $n in ${p.output.map(_.name).mkString(", ")}"))
    GraftPlanBridge.ofRows(left.sparkSession,
      AsOfJoin(lp, rp,
        attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTs), attr(rp, rightTs)))
  }
}
