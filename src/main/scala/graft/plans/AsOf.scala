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
      leftTs: String, rightTs: String,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"as-of direction must be backward|forward, got $direction")
    val lp = GraftPlanBridge.analyzed(left)
    val rp = GraftPlanBridge.analyzed(right)
    // resolve like Spark does: honor spark.sql.caseSensitive (default
    // case-insensitive) and REFUSE ambiguity instead of silently binding
    // the first of two same-named columns to an as-of key
    val caseSensitive = left.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    def attr(p: LogicalPlan, n: String) = {
      val matches = p.output.filter(a =>
        if (caseSensitive) a.name == n else a.name.equalsIgnoreCase(n))
      matches match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"no column $n in ${p.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"ambiguous column $n: ${many.map(_.name).mkString(", ")} — " +
            "disambiguate with select/alias before the as-of join")
      }
    }
    val (lk, rk) = (attr(lp, leftKey), attr(rp, rightKey))
    val (lts, rts) = (attr(lp, leftTs), attr(rp, rightTs))
    // Exec hashes each side on ITS OWN key and builds orderings from
    // the LEFT types: an int-vs-long key pair would hash equal values
    // to different partitions and silently lose every match — reject
    // mismatches at plan time instead.
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lts.dataType == rts.dataType,
      s"as-of timestamp types differ: ${lts.dataType} vs ${rts.dataType}")
    GraftPlanBridge.ofRows(left.sparkSession,
      AsOfJoin(lp, rp, lk, rk, lts, rts, forward = direction == "forward"))
  }
}
