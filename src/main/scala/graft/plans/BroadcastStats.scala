package graft.plans

import graft.spark.{GraftDsv2Table, GraftSnapshotTable}
import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join, LocalRelation, LogicalPlan, BROADCAST}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Auto-broadcast for Graft-table join sides, decided from manifest
  * statistics.
  *
  * Why a hint rule and not `SupportsReportStatistics` alone: Graft scans
  * DO report manifest-derived stats (GraftV1Scan.estimateStatistics),
  * and the pre-pushdown `DataSourceV2Relation.computeStats` consults
  * them — but Spark's `V2ScanRelationPushDown` then wraps every V1Scan
  * in `V1ScanWrapper`, which does NOT forward the interface, so the
  * post-pushdown relation (the one join planning reads `plan.stats`
  * from) falls back to `spark.sql.defaultSizeInBytes` = Long.MaxValue.
  * Net effect without this rule: a 25-row Graft dim table plans as an
  * un-broadcastable giant and every join against it sort-merge-shuffles
  * BOTH sides (AQE may rescue the join at runtime, but only after the
  * map side of the shuffle already ran). There is no extension point
  * after the pushdown batch and before join planning, so the decision
  * is taken HERE, in the operator-optimization batch, where the leaf
  * stats are still visible.
  *
  * At 100 TB this is the difference between shuffling a fact table and
  * broadcasting a dim: exactly the call the optimizer makes for parquet
  * tables from FileIndex sizes — re-created for Graft tables from the
  * manifest (O(metadata), no file IO).
  *
  * Conservative by construction:
  *  - fires only when EVERY leaf of the side is a Graft relation (or
  *    LocalRelation) — parquet/csv sides already have real stats;
  *  - respects `spark.sql.autoBroadcastJoinThreshold` (including -1 =
  *    disabled) against the side's estimated `stats.sizeInBytes`, whose
  *    Graft leaves are manifest numbers (row counts OVERCOUNT MoR
  *    deletes, so the estimate errs toward not broadcasting);
  *  - never overrides an existing user hint on that side;
  *  - idempotent (hint-isEmpty guard) for the fixed-point batch.
  */
object GraftBroadcastStats extends Rule[LogicalPlan] {

  private def graftLeaf(p: LogicalPlan): Boolean = p match {
    case r: DataSourceV2Relation =>
      r.table.isInstanceOf[GraftDsv2Table] || r.table.isInstanceOf[GraftSnapshotTable]
    case _: LocalRelation => true
    case _ => false
  }

  private def smallGraftSide(p: LogicalPlan, threshold: Long): Boolean = {
    val leaves = p.collectLeaves()
    leaves.exists(_.isInstanceOf[DataSourceV2Relation]) &&
      leaves.forall(graftLeaf) &&
      // stats flow bottom-up from DataSourceV2Relation.computeStats →
      // GraftV1Scan.estimateStatistics (manifest sums); guard anyway —
      // an estimate failure must never fail the query
      (try p.stats.sizeInBytes <= BigInt(threshold)
       catch { case scala.util.control.NonFatal(_) => false })
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold < 0) return plan
    plan.transform {
      case j: Join if j.resolved &&
          (j.hint.leftHint.isEmpty || j.hint.rightHint.isEmpty) =>
        val lh = j.hint.leftHint.orElse(
          if (smallGraftSide(j.left, threshold))
            Some(HintInfo(strategy = Some(BROADCAST))) else None)
        val rh = j.hint.rightHint.orElse(
          if (smallGraftSide(j.right, threshold))
            Some(HintInfo(strategy = Some(BROADCAST))) else None)
        if ((lh eq j.hint.leftHint) && (rh eq j.hint.rightHint)) j
        else j.copy(hint = j.hint.copy(leftHint = lh, rightHint = rh))
    }
  }
}
