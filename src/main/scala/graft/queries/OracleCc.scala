package graft.queries

/** DuckDB-oracle connected components WITHOUT `WITH RECURSIVE`: the
  * recursive transitive closure enumerates reachable PAIRS — O(Σ m²)
  * over component sizes m, infeasible at sf0.1 — while the judged
  * label itself is only the per-node component MIN. This emits the
  * closure as BOUNDED-PASS unrolled MATERIALIZED CTEs (the
  * q_kcore/q_mmr/BPE unrolling technique): alternating hook (label =
  * min of self and neighbors' labels) and compress (label = label's
  * label, pointer-jump) passes, state O(|V|) per pass, converging in
  * O(log n) rounds like Shiloach–Vishkin.
  *
  * Soundness without a fixpoint loop: labels are node ids, only ever
  * decrease, and never drop below the component min (propagation stays
  * inside the component), so if ONE MORE hook pass changes nothing the
  * labels are edge-constant and pin to the component min (the min node
  * keeps its own id). The generated `cc_chg` sentinel counts would-be
  * changes of that extra pass; non-zero poisons every emitted label to
  * -999999 — a LOUD hash mismatch against the Spark side instead of a
  * silently under-merged clustering. ROUNDS = 10 covers components of
  * effective diameter ≫ any corpus here; a sentinel trip means "raise
  * ROUNDS", never "wrong but green". */
private[graft] object OracleCc {

  /** CTE-chain text (no leading/trailing comma) defining
    * `outName`(node, lb): per-node component-min label over `edgesCte`,
    * which must expose symmetric (src, dst) pairs. Nodes without edges
    * are absent — consumers LEFT JOIN and coalesce to self, exactly as
    * they did against the recursive closure. */
  def ccCtes(edgesCte: String, outName: String, rounds: Int = 10): String = {
    val sb = new StringBuilder
    // snapshot the caller's edge CTE ONCE: the chain references the
    // edge set ~rounds+2 times, and DuckDB INLINES non-materialized
    // CTEs per reference — without this, a plain `edges` CTE re-runs
    // its whole upstream pipeline (minhash sig + jaccard verify) a
    // dozen times and the sf0.1 sweep times out
    sb.append(
      s"""cc_e AS MATERIALIZED (SELECT src, dst FROM $edgesCte),
         cc_l0 AS MATERIALIZED (
           SELECT src AS node, LEAST(src, min(dst)) AS lb
           FROM cc_e GROUP BY src)""")
    var prev = "cc_l0"
    for (k <- 1 to rounds) {
      sb.append(
        s""",
         cc_h$k AS MATERIALIZED (
           SELECT e.src AS node, LEAST(l.lb, min(m.lb)) AS lb
           FROM cc_e e
           JOIN $prev l ON l.node = e.src
           JOIN $prev m ON m.node = e.dst
           GROUP BY e.src, l.lb),
         cc_c$k AS MATERIALIZED (
           SELECT a.node, b.lb FROM cc_h$k a JOIN cc_h$k b ON a.lb = b.node)""")
      prev = s"cc_c$k"
    }
    sb.append(
      s""",
         cc_chk AS MATERIALIZED (
           SELECT e.src AS node, LEAST(l.lb, min(m.lb)) AS lb
           FROM cc_e e
           JOIN $prev l ON l.node = e.src
           JOIN $prev m ON m.node = e.dst
           GROUP BY e.src, l.lb),
         cc_chg AS (
           SELECT CAST(count(*) AS BIGINT) AS c
           FROM cc_chk f JOIN $prev p ON f.node = p.node AND f.lb <> p.lb),
         $outName AS (
           SELECT node, CASE WHEN (SELECT c FROM cc_chg) = 0 THEN lb
                             ELSE -999999 END AS lb
           FROM $prev)""")
    sb.toString
  }
}
