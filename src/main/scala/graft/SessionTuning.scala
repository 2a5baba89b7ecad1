package graft

/** Scale-adaptive session knobs shared by every driver-contract main
  * (Bench / TimeOne / Verify / VerifySome / ExplainOne), so the bench,
  * the correctness dump and solo re-times all run the same session.
  *
  * initialParts — the AQE pre-coalesce reducer width. Round 14 pinned
  * it at a flat 1024 after the sf10 ladder killed fixed-32-reducer
  * wedge joins with spill OOM (reducers must scale with BYTES, not the
  * core count). Round 15 measured the flat constant's tax at the small
  * end: exchanges that AQE does NOT coalesce (the final ORDER BY range
  * exchange, observed at full width under count()) schedule
  * initialPartitionNum near-empty tasks — q_rank_fusion carried a
  * 1024-task / 2.5 s stage moving 0.1 MB; the same stage at width 64
  * ran in 0.2 s. So derive the width from the CORPUS SIZE (the
  * optimization guide's rule: size shuffle partitions from data):
  * one pre-coalesce partition per 2 MB of input, floored at 2× cores
  * (parallelism for derived/exploded streams on small corpora), capped
  * at 32768. The divisor comes from the measured-safe point, not the
  * core count: the green sf10 rung ran 1024 partitions over a ~1.75 GB
  * corpus ≈ 1.7 MB of input per pre-coalesce partition while its worst
  * derived shuffle (1.5e9 wedge rows, ~36 GB) spilled safely at
  * ~35 MB/task — 2 MB/partition reproduces that envelope at every sf.
  * At sf0.1 (17.5 MB) the floor gives 64. */
object SessionTuning {
  def initialParts(sfDir: String, cpus: Int): Long = {
    val bytes =
      try {
        val p = java.nio.file.Paths.get(sfDir)
        if (!java.nio.file.Files.isDirectory(p)) 0L
        else {
          val s = java.nio.file.Files.walk(p)
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally s.close()
        }
      } catch { case _: Throwable => 0L }
    math.min(32768L, math.max(2L * cpus, bytes / (2L << 20)))
  }
}
