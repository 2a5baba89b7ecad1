package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental maintenance of a DERIVED Graft table (an index: minhash
  * signatures, IVF assignments, token sets) over an APPEND-ONLY source
  * Graft table.
  *
  * The r11 verdict's ask: session-scoped artifacts rebuild per JVM
  * (seconds at sf0.1, hours at 100 TB); a maintained index must PERSIST
  * and refresh from the source's snapshot delta at O(Δ) cost. This
  * helper gives any derived table that contract:
  *
  *  - The WATERMARK (last covered source snapshot id) is never a
  *    separate property commit that could tear away from the rows — it
  *    is DERIVED from the index table's own streamBatch provenance keys
  *    ("graft-index#<sourceSnapshotId>"), the exactly-once machinery
  *    the streaming sink already proves (appendStreamBatch: a replayed
  *    or racing refresh of the same source snapshot commits nothing).
  *  - refresh() reads the WHOLE pending ordinal range above the
  *    watermark in one readSnapshotRange (metadata-only planning, loud
  *    failure on non-append snapshots: an index over append-scan CDC
  *    has the standard append-only contract) and appends
  *    `buildDelta(deltaRows)` ONCE, keyed by the range's last source
  *    snapshot id — a consumer 1000 snapshots behind pays one commit,
  *    not 1000 sequential ones. Cost is O(Δ) in source rows; an
  *    up-to-date index costs two metadata loads and zero IO. The
  *    append carries a compare-and-swap on the watermark
  *    (expectLastBatch), so a racing refresh whose planning point went
  *    stale aborts cleanly and retries from the advanced watermark —
  *    overlapping ranges can never double-commit.
  *  - A SECOND process/session pointed at the same warehouse loads the
  *    table, sees the watermark, and reuses every indexed row without
  *    rebuild (CrossSessionIndexSpec proves it).
  *
  * Source snapshots at-or-below the watermark may be expired freely;
  * expiring an UNCOVERED snapshot (or the watermark itself) breaks the
  * telescoping manifest diff and fails refresh loudly — the consumer
  * lag contract every CDC reader has. */
object MaintainedIndex {

  val QueryId = "graft-index"

  /** Last source snapshot id the index covers (0 = nothing yet) —
    * TableMeta.maxStreamBatch, the SAME definition appendStreamBatch's
    * expectLastBatch CAS compares against (the race-safety of the
    * batched refresh rests on the two agreeing). */
  def watermark(idx: GraftTable): Long = idx.meta.maxStreamBatch(QueryId)

  /** Advance `idx` to cover every published snapshot of `source` with
    * ONE index commit per refresh call, regardless of how far behind the
    * index fell. Returns the new watermark. Idempotent and race-safe:
    * the single append is keyed by the range's last source snapshot id
    * and guarded by expectLastBatch = the planning-time watermark, so a
    * racer that advanced the index first turns this attempt into a
    * clean abort + replan instead of a double-commit. */
  def refresh(spark: SparkSession, source: GraftTable, idx: GraftTable)
      (buildDelta: DataFrame => DataFrame): Long = {
    val sm = source.meta
    val snaps = sm.snapshots.take(sm.publishedPrefix)
    if (snaps.isEmpty) return watermark(idx)
    var attempts = 0
    while (true) {
      val wm = watermark(idx)
      // snapshot ids are assigned max+1, so "id > wm" is a contiguous
      // suffix of the lineage-ordered list — one ordinal range covers it
      val pending = snaps.filter(_.snapshotId > wm)
      if (pending.isEmpty) return wm
      require(wm == 0L || snaps.exists(_.snapshotId == wm),
        s"index watermark $wm names an expired source snapshot — the " +
          "manifest diff can no longer be computed; rebuild the index or " +
          "retain source snapshots until the index covers them")
      val firstOrd = snaps.indexWhere(_.snapshotId == pending.head.snapshotId)
      val lastOrd = snaps.indexWhere(_.snapshotId == pending.last.snapshotId)
      // ordinal range (firstOrd, lastOrd+1] telescopes every pending
      // snapshot's manifest diff vs its list predecessor; after an
      // expire the first retained snapshot's diff telescopes over the
      // dropped ones, so coverage is complete as long as the watermark
      // itself survived
      val delta = source.readSnapshotRange(spark, firstOrd, lastOrd + 1)
      if (idx.appendStreamBatch(buildDelta(delta), QueryId,
          pending.last.snapshotId, expectLastBatch = Some(wm)))
        return pending.last.snapshotId
      // a racer advanced the watermark between planning and commit —
      // replan from the new watermark (usually: nothing left to do)
      attempts += 1
      require(attempts < 64, "refresh livelock: watermark keeps moving")
    }
    0L // unreachable
  }
}
