package graft.queries

import graft.SparkTestBase

/** Parallelism-independence: the float-bearing judged queries claim
  * their outputs are exact (decimal component sums, rational ratios,
  * closed-form arithmetic) and therefore identical at ANY partition
  * count. Run each at 1 vs 7 shuffle partitions and require
  * bit-identical rows — the property the 1000-executor scale-up leans
  * on, checked directly. */
class DeterminismSpec extends SparkTestBase {

  private val floatHeavy: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
    "q_regr_agg"       -> Relational.regrAgg _,
    "q_bm25"           -> TextOps.bm25 _,
    "q_char_diversity" -> TextOps.charDiversity _,
    "q_gap_fill"       -> Events.gapFill _,
    "q_mix_weights"    -> TextOps.mixWeights _,
    "q_bigram_lift"    -> TextOps.bigramLift _,
    "q_ewma"           -> Events.ewma _,
    "q_chisq_cells"    -> Events.chisqCells _,
    "q_anomaly_zscore" -> Events.anomalyZscore _,
    "q_transitions"    -> Events.transitions _,
    "q_knn_join"       -> Vectors.knnJoin _,
    "q_table_stats_join" -> TableQueries.tableStatsJoin _,
    // round-9 continuation: every new float-bearing op joins the battery
    "q_changepoint"    -> Events.changepoint _,
    "q_autocorr"       -> Events.autocorr _,
    "q_simpson_diversity" -> TextOps.simpsonDiversity _,
    "q_lm_backoff"     -> TextOps.lmBackoff _,
    "q_tok_fertility"  -> TextOps.tokFertility _,
    "q_gini_length"    -> TextOps.giniLength _,
    "q_random_projection" -> Vectors.randomProjection _)

  test("float-bearing queries are bit-identical at 1 vs 7 shuffle partitions") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    try {
      floatHeavy.foreach { case (name, fn) =>
        spark.conf.set(key, "1")
        val a = fn(spark, sfDir).collect()
        spark.conf.set(key, "7")
        val b = fn(spark, sfDir).collect()
        assert(a.nonEmpty, s"$name returned no rows")
        assert(a === b, s"$name differs across parallelism")
      }
    } finally spark.conf.set(key, prev)
  }
}
