package graft.queries

import graft.SparkTestBase
import graft.functions.DotProductF
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

class VectorsSpec extends SparkTestBase {

  test("native DotProductF == zip_with/aggregate composition, bit-exact") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val composed = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    val diff = e.select(
      (DotProductF.dot(col("embedding"), col("embedding")) - composed).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff === 0.0)
  }

  test("DotProductF participates in whole-stage codegen") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val plan = e.select(DotProductF.dot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // `*(n)` marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [dotproductf"), plan)
  }

  test("graft_dot is callable from SQL after registration") {
    DotProductF.register(spark)
    graft.Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb")
    val n = spark.sql(
      "SELECT vec_id FROM emb WHERE graft_dot(embedding, embedding) > 0.5").count()
    assert(n > 0)
  }

  test("ANN recall@10 (LSH multi-probe and IVF) against the exact baseline") {
    val exact = Vectors.cosineTopK(spark, sfDir).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val lsh = Vectors.annLsh(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = Vectors.annIvf(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val lshRecall = exact.intersect(lsh).size / 10.0
    val ivfRecall = exact.intersect(ivf).size / 10.0
    // near-orthogonal corpus (max cosine 0.51) is ANN's worst case;
    // modest-but-real thresholds
    assert(lshRecall >= 0.3, s"lsh recall=$lshRecall")
    assert(ivfRecall >= 0.2, s"ivf recall=$ivfRecall")
  }

  test("PQ+ADC recall@10 beats the coarse methods (100-candidate exact rerank)") {
    val exact = Vectors.cosineTopK(spark, sfDir).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pq = Vectors.annPq(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(pq).size / 10.0
    // ADC ranks ALL vectors (no bucketing loss) before the exact rerank,
    // so recall should be comfortably higher than LSH/IVF's floor
    assert(recall >= 0.5, s"pq recall=$recall")
  }

  test("banded dedup: precision 1 vs the exact all-pairs truth, recall measured") {
    // exact verification means the banded plan can NEVER kill a vector
    // the all-pairs truth keeps (false kills = 0); recall is the banding
    // trade and is bounded below here so a parameter regression (fewer
    // tables/bits, broken signature parity) fails loudly
    val exactKept = Vectors.dedupEmbeddingExact(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val bandedKept = Vectors.dedupEmbedding(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val all = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exactKilled = all -- exactKept
    val bandedKilled = all -- bandedKept
    assert(bandedKilled.subsetOf(exactKilled),
      s"banded killed a survivor: ${bandedKilled -- exactKilled}")
    val recall =
      if (exactKilled.isEmpty) 1.0
      else bandedKilled.size.toDouble / exactKilled.size
    // judged operating point T=12 (since the round-8 shared artifact
    // made the candidate build once-per-session): expected ≈
    // 1−(1−p⁴)^12 ≈ 0.9 on this corpus's θ≈60° qualifying pairs; the
    // floor sits just under the expected band (small-sample variance:
    // tens of qualifying pairs), NOT at 2× slack — a silent
    // banding/parity regression that halves recall must fail, not pass
    // inside a loose floor
    assert(recall >= 0.8, s"banded dedup recall=$recall (killed " +
      s"${bandedKilled.size} of ${exactKilled.size})")
  }

  test("banding recall/cost curve: T in {5,8,12}, monotone, judged point on the knee") {
    // the published curve (SURVEY §J7): recall of banded kill vs the
    // exact truth as the table count sweeps — the dial a 100 TB run
    // turns. Precision stays 1 at every T (exact verify), so the sweep
    // only trades candidate volume (∝ T) for recall.
    val exactKept = Vectors.dedupEmbeddingExact(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val all = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exactKilled = all -- exactKept
    assert(exactKilled.nonEmpty, "corpus has no qualifying pairs — curve is vacuous")
    val curve = Seq(5, 8, 12).map { t =>
      val killed = Vectors.bandedPairs(spark, sfDir, tables = t)
        .filter(col("cos") >= 0.42)
        .select("ib").distinct().collect().map(_.getLong(0)).toSet
      assert(killed.subsetOf(exactKilled), s"T=$t killed a survivor")
      t -> killed.size.toDouble / exactKilled.size
    }
    info(curve.map { case (t, r) => f"T=$t recall=$r%.2f" }.mkString(", "))
    // more tables can only add candidates → recall is monotone in T
    assert(curve.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a - 1e-9 },
      s"recall not monotone in T: $curve")
    // the judged operating point is T=12 (shared-artifact economics —
    // see BAND_TABLES); T=8 stays in the sweep as the curve's knee
    val r8 = curve.find(_._1 == 8).get._2
    val r12 = curve.find(_._1 == 12).get._2
    assert(r12 >= 0.8, s"judged operating point recall=$r12")
    assert(r8 >= 0.7, s"curve knee recall=$r8")
    assert(r12 - r8 <= 0.25, s"knee check: T=8→12 adds ${r12 - r8}")
  }

  test("banded top-30 pairs: every reported pair's cosine matches the exact truth") {
    // the banded top-k is a SUBSET property: each reported (ia, ib, cos)
    // must appear with the identical cosine in the exact all-pairs
    // scoring (banding can only drop pairs, never invent or misscore)
    val banded = Vectors.topKPairs(spark, sfDir)
    assert(banded.count() > 0)
    val invented = banded.join(
      Vectors.allPairsScored(spark, sfDir), Seq("ia", "ib", "cos"), "left_anti")
    assert(invented.count() == 0,
      s"banded pairs absent from exact scoring: ${invented.collect().mkString(",")}")
  }

  test("semantic dedup: kill soundness, per-cluster outlier survival, non-vacuous") {
    val survivors = Vectors.semanticDedup(spark, sfDir).collect()
    val all = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val kept = survivors.map(_.getLong(0)).toSet
    val killed = all -- kept
    // the corpus's qualifying pairs co-cluster (that's the SemDeDup
    // premise) — a vacuous run would hide a broken kill join
    assert(killed.nonEmpty, "semantic dedup killed nothing — kill join broken?")
    assert(kept.nonEmpty)
    // SemDeDup invariant: each cluster's FARTHEST-from-centroid member
    // (min cent_cos, ties to smaller id) has no better-priority
    // neighbor by construction, so it can never die
    val byCluster = survivors.groupBy(_.getInt(1))
    // soundness: re-derive every kill from the exact within-cluster
    // pairs — killed b must have a same-cluster neighbor a with
    // round(cos,7) >= SEM_TAU and (a.cent_cos, a.id) < (b.cent_cos, b.id)
    val e = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
      val na = math.sqrt(a.indices.foldLeft(0.0)((s, i) => s + a(i) * a(i)))
      val nb = math.sqrt(b.indices.foldLeft(0.0)((s, i) => s + b(i) * b(i)))
      BigDecimal(d / (na * nb)).setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // cluster + cent_cos of EVERY member (survivor rows only carry
    // survivors — recompute assignment via the query's own artifact)
    val mem = Vectors.semanticDedupMembers(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    killed.foreach { b =>
      val (cb, ccb) = mem(b)
      val hasKiller = mem.exists { case (ia, (ca, cca)) =>
        ia != b && ca == cb &&
          (cca < ccb || (cca == ccb && ia < b)) &&
          cos(e(ia), e(b)) >= Vectors.SEM_TAU
      }
      assert(hasKiller, s"vec $b killed with no qualifying better-priority cluster-mate")
    }
    // and the per-cluster best-priority member survived
    mem.groupBy(_._2._1).foreach { case (c, ms) =>
      val best = ms.minBy { case (id, (_, cc)) => (cc, id) }._1
      assert(kept.contains(best), s"cluster $c best-priority member $best was killed")
    }
    assert(byCluster.nonEmpty)
  }

  test("cluster balance: per-cluster farthest-first budget re-derived from the members") {
    val mem = Vectors.semanticDedupMembers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val n = mem.length.toLong
    val cap = (n + 31) / 32 // = ceil(N / 32), the integer budget
    val expected = mem.groupBy(_._2).toSeq.flatMap { case (c, ms) =>
      ms.sortBy { case (id, _, cc) => (cc, id) }.take(cap.toInt)
        .zipWithIndex.map { case ((id, _, cc), i) =>
          id -> ((c, cc, (i + 1).toLong, ms.length.toLong))
        }
    }.toMap
    val got = Vectors.clusterBalance(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
    // non-vacuous: the budget actually prunes (some dense cluster got
    // cut), and no cluster exceeds it
    assert(got.size < mem.length, "budget pruned nothing — cap vacuous")
    got.groupBy(_._2._1).foreach { case (c, ms) =>
      assert(ms.size <= cap, s"cluster $c kept ${ms.size} > cap $cap")
    }
  }

  test("cluster purity: majority label and exact counts re-derived from members + labels") {
    val labels = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val mem = Vectors.semanticDedupMembers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val expected = mem.groupBy(_._2).map { case (c, ms) =>
      val byLabel = ms.map(m => labels(m._1)).groupBy(identity)
        .map { case (l, g) => (l, g.size.toLong) }
      val (topL, topN) = byLabel.toSeq.minBy { case (l, n) => (-n, l) }
      c -> ((ms.length.toLong, topL, topN))
    }
    val got = Vectors.clusterPurity(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3)))).toMap
    assert(got === expected)
    // purity is a proper fraction and every cluster reports exactly once
    assert(got.values.forall { case (n, _, topN) => topN >= 1 && topN <= n })
    assert(got.keySet === mem.map(_._2).toSet)
  }

  test("label spread: knn majority vote re-derived from raw embeddings") {
    val e = graft.Tables.embeddings(spark, sfDir)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getInt(2)))
    def cosr(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
      val na = math.sqrt(a.indices.map(i => a(i).toDouble * a(i).toDouble).sum)
      val nb = math.sqrt(b.indices.map(i => b(i).toDouble * b(i).toDouble).sum)
      BigDecimal(dot / (na * nb))
        .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val seed = e.filter(_._1 % 5 == 0)
    val expected = e.filter(_._1 % 5 != 0).map { case (id, v, trueLab) =>
      val top5 = seed.map { case (sid, sv, sl) => (cosr(v, sv), sid, sl) }
        .sortBy { case (c, sid, _) => (-c, sid) }.take(5)
      val (lab, votes) = top5.groupBy(_._3).view.mapValues(_.size).toSeq
        .minBy { case (l, n) => (-n, l) }
      (id, lab, votes.toLong, lab == trueLab)
    }.sortBy(_._1)
    val got = Vectors.labelSpread(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === expected.toSeq)
    // No accuracy bar: MEASURED same-label vs cross-label cosine on this
    // synthetic corpus is 0.004 vs −0.003 (sf0.001) — the labels are
    // nearly decoupled from the geometry, so knn accuracy hovers at the
    // 1/10 chance floor by construction. The operator contract is the
    // exact vote re-derivation above plus full coverage below.
    assert(got.length === e.count(_._1 % 5 != 0), "every unlabeled vector labeled")
    assert(got.forall(g => g._3 >= 1 && g._3 <= 5))
  }

  test("MMR rerank: greedy argmax invariant re-derived from first principles") {
    val out = Vectors.mmrRerank(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == (1 to Vectors.MMR_K), "ranks not 1..K")
    assert(out.map(_._2).distinct.length == out.length, "duplicate picks")
    // independent recomputation: embeddings read raw, cosines via the
    // same sequential fold + HALF_UP round the query uses
    val e = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dp / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val q = e(0L)
    val pool = e.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, rel) => (-rel, id) }
      .take(Vectors.MMR_POOL)
    // step 1 is pure relevance — must equal the pool's top row
    assert(out.head._2 == pool.head._1, s"first pick ${out.head._2} != top-rel ${pool.head._1}")
    assert(out.head._3 == pool.head._2)
    // each later pick must dominate every candidate left at its step
    // under mmr = 0.7·rel − 0.3·maxsim (ties to the smaller id)
    out.indices.drop(1).foreach { k =>
      val picked = out.take(k).map(_._2).toSet
      def mmrOf(id: Long, rel: Double): Double = {
        val maxsim = picked.map(p => cos(e(id), e(p))).max
        0.7 * rel - 0.3 * maxsim
      }
      val stepScores = pool.filterNot(c => picked.contains(c._1))
        .map { case (id, rel) => (id, mmrOf(id, rel)) }
      val best = stepScores.minBy { case (id, m) => (-m, id) }
      assert(best._1 == out(k)._2,
        s"step ${k + 1}: expected pick ${best._1} (mmr=${best._2}), query picked ${out(k)._2}")
      assert(best._2 == out(k)._4, s"step ${k + 1}: mmr score mismatch")
    }
  }

  test("random projection: coordinates re-derived by the identical sequential fold; JL norm ratio sane") {
    import java.security.MessageDigest
    def md5hex(t: String): String =
      MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def sign(i: Int, j: Int): Double =
      if (md5hex(s"$i:$j").head <= '7') 1.0 else -1.0
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val got = Vectors.randomProjection(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    var ratios = List.empty[Double]
    vecs.foreach { case (id, x) =>
      var ny = 0.0
      (0 until 16).foreach { j =>
        var acc = 0.0 // the exact fold order of the Spark aggregate HOF
        (1 to 64).foreach(i => acc += x(i - 1).toDouble * sign(i, j))
        val want = BigDecimal(acc)
          .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got((id, j)) === want, s"vec $id coord $j")
        ny += acc * acc
      }
      val nx = x.map(v => v.toDouble * v.toDouble).sum
      if (nx > 0) ratios ::= ny / (16.0 * nx)
    }
    // E[||y||^2] = K*||x||^2 for +-1 signs: the corpus mean ratio must
    // sit near 1 or the sign matrix is biased/broken
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"JL mean norm ratio $mean")
  }

  test("kmeans: every Lloyd round re-derived in plain Scala integers") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 1000000.0 + 0.5).toLong).toArray)
      .sortBy(_._1)
    val K = Vectors.KMEANS_K
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def assign(cent: Map[Long, Array[Long]]) = vecs.map { case (id, v) =>
      val (cid, dd) = cent.toSeq
        .map { case (c, cv) => (c, d2(v, cv)) }
        .minBy { case (c, dd) => (dd, c) }
      (id, cid, dd)
    }
    var cent = vecs.take(K).map { case (id, v) => id -> v.clone() }.toMap
    for (_ <- 1 to Vectors.KMEANS_ITERS) {
      val a = assign(cent)
      val byId = vecs.toMap
      val upd = a.groupBy(_._2).map { case (cid, members) =>
        val vs = members.map(m => byId(m._1))
        val n = vs.length.toLong
        cid -> Array.tabulate(64) { i =>
          (vs.map(_(i)).sum + 2000000L * n) / n - 2000000L
        }
      }
      cent = cent.map { case (c, old) => c -> upd.getOrElse(c, old) }
    }
    val fin = assign(cent)
    val want = fin.groupBy(_._2).map { case (cid, ms) =>
      (cid, ms.length.toLong, ms.map(_._3).sum, cent(cid).sum)
    }.toSeq.sortBy(_._1)
    val got = Vectors.kmeans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
  }

  test("dbscan: roles and min-label clusters re-derived in plain Scala") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 1000000.0 + 0.5).toLong).toArray).toMap
    val ids = vecs.keys.toSeq.sorted
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val nbrs = ids.map { i =>
      i -> ids.filter(j => j != i && d2(vecs(i), vecs(j)) <= Vectors.DBSCAN_EPS2).toSet
    }.toMap
    val core = ids.filter(i => nbrs(i).size + 1 >= Vectors.DBSCAN_MINPTS).toSet
    // min-reachable label over the core-core subgraph
    val label = scala.collection.mutable.Map.empty[Long, Long]
    core.toSeq.sorted.foreach { s0 =>
      if (!label.contains(s0)) {
        var comp = Set(s0); var frontier = Set(s0)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(n => nbrs(n).filter(core)) -- comp
          comp ++= frontier
        }
        comp.foreach(n => label(n) = comp.min)
      }
    }
    val want = ids.map { i =>
      val cnt = nbrs(i).size + 1L
      if (core(i)) (i, cnt, "core", Some(label(i)))
      else {
        val coreNbrs = nbrs(i).filter(core)
        if (coreNbrs.nonEmpty) (i, cnt, "border", Some(coreNbrs.map(label).min))
        else (i, cnt, "noise", None)
      }
    }
    val got = Vectors.dbscan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got === want)
    assert(want.exists(_._3 == "core") && want.exists(_._3 == "noise"),
      "fixture should exercise more than one role")
  }

  test("dbscan ε-pairs: pivot-pruned candidates are exact (edge set = brute force, no dupes)") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x =>
          math.floor(x.toDouble * 1000000.0 + 0.5).toLong).toArray).toMap
    val ids = vecs.keys.toSeq.sorted
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val want = (for {
      i <- ids; j <- ids if i < j
      if d2(vecs(i), vecs(j)) <= Vectors.DBSCAN_EPS2
    } yield (i, j)).toSet
    val gotRows = Vectors.dbscanEpsPairs(spark, Vectors.dbscanQuantized(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotRows.length === gotRows.toSet.size, "each ε-pair must materialize exactly once")
    assert(gotRows.toSet === want)
    assert(want.nonEmpty, "fixture should contain ε-edges")
  }

  test("dbscan hierarchical pivots (P=64): exact on a planted clustered corpus, cells bounded") {
    import spark.implicits._
    // planted corpus: 32 well-separated clusters x 64 points in the
    // quantized space (values pre-scaled like dbscanQuantized output).
    // Deterministic LCG so the corpus is stable across runs.
    def lcg(seed: Long): Long = (seed * 6364136223846793005L + 1442695040888963407L)
    val dim = 64
    val pts = (0 until 32).flatMap { c =>
      val cseed = lcg(c + 1L)
      // cluster centers far apart (~2e6 per axis entry -> inter-center
      // distance^2 >> eps2); intra-cluster offsets tiny (<= 1e4)
      val center = Array.tabulate(dim)(i =>
        ((lcg(cseed + i) >>> 40) % 4000000L - 2000000L).toDouble)
      (0 until 64).map { k =>
        val pseed = lcg(cseed + 1000L * (k + 1))
        val off = Array.tabulate(dim)(i => ((lcg(pseed + i) >>> 50) % 9000L).toDouble)
        (c * 64L + k, center.zip(off).map { case (a, b) => a + b }.toSeq)
      }
    }
    val qe = pts.toDF("vec_id", "q")
      .withColumn("q", col("q").cast("array<double>"))
      .withColumn("n2", expr("aggregate(q, 0d, (a, x) -> a + x * x)"))
    // brute-force truth
    val byId = pts.toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val ids = byId.keys.toSeq.sorted
    val want = (for {
      i <- ids; j <- ids if i < j
      if d2(byId(i), byId(j)).toLong <= Vectors.DBSCAN_EPS2
    } yield (i, j)).toSet
    assert(want.nonEmpty, "planted clusters must produce ε-edges")
    val got = Vectors.dbscanEpsPairsHier(spark, qe, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.length === got.toSet.size, "each ε-pair exactly once")
    assert(got.toSet === want, "recall/precision must both be exactly 1")
    // the small-P flat path (what the P ≤ DBSCAN_FLAT_MAX gate selects)
    // must produce the identical exact edge set
    val gotFlat = Vectors.dbscanEpsPairsFlat(spark, qe, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotFlat.length === gotFlat.toSet.size)
    assert(gotFlat.toSet === want, "flat path must match the hierarchy exactly")
    // cell-population bound: no fine cell holds more than a small
    // multiple of n/P (the hierarchical scheme's whole point — flat
    // pivots on clustered data collapse most points into few cells)
    val (cells, _, _) = Vectors.dbscanCells(spark, qe, 64)
    val sizes = cells.groupBy(col("cell")).count()
      .collect().map(_.getLong(1))
    val n = pts.size
    assert(sizes.sum === n.toLong)
    assert(sizes.max <= 4L * n / 64,
      s"max cell ${sizes.max} exceeds 4x the n/P target (${4 * n / 64})")
  }

  test("maxsim: sub-vector late-interaction scores re-derived in plain Scala") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = vecs(0L)
    def score(d: Array[Float]): Double =
      (0 until 8).map { i =>
        (0 until 8).map { j =>
          var a = 0.0
          (0 until 8).foreach(k => a += q(i * 8 + k).toDouble * d(j * 8 + k).toDouble)
          a
        }.max
      }.sum
    val want = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, BigDecimal(score(v)).setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, sc) => (-sc, id) }.take(20)
    val got = Vectors.maxsim(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want)
  }

  test("powerIter: integer power-iteration dynamics re-derived exactly") {
    val vecsById = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(f =>
        math.floor(f.toDouble * 1000000.0 + 0.5).toLong).toArray).toMap
    val vecs = vecsById.values.toArray
    val n = vecs.length.toLong
    val d = 64
    // Gram mean with the same shifted floor div
    def fdiv(a: Long, b: Long, off: Long): Long = (a + off * b) / b - off
    val g = Array.ofDim[Long](d, d)
    for (p <- 0 until d; q <- 0 until d) {
      var s = 0L
      vecs.foreach(v => s += v(p) * v(q))
      g(p)(q) = fdiv(s, n, 1000000000001L)
    }
    var x = Array.fill(d)(10000L)
    var m = 1L
    for (_ <- 1 to Vectors.POWER_ITERS) {
      val yd = Array.tabulate(d) { p =>
        var y = 0L
        for (q <- 0 until d) y += g(p)(q) * x(q)
        fdiv(y, 1000000L, 640000000001L)
      }
      m = math.max(yd.map(math.abs).max, 1L)
      x = yd.map(v => fdiv(v * 10000L, m, 10001L))
    }
    val rows = Vectors.powerIter(spark, sfDir).collect()
    assert(rows.length === d)
    rows.foreach { r =>
      assert(r.getLong(1) === x(r.getInt(0)), s"component ${r.getInt(0)}")
      assert(r.getLong(2) === m)
    }
    assert(x.max === 10000L, "renormalization pins the peak component to the scale")
    assert(x.distinct.length > 1, "eigenvector must not be degenerate-constant")
    // composition: every vector's projection along the same axis
    val projRows = Vectors.pcaProject(spark, sfDir).collect()
    assert(projRows.length === vecs.length)
    projRows.foreach { r =>
      val v = vecsById(r.getLong(0))
      val want = (0 until d).map(p => v(p) * x(p)).sum
      assert(r.getLong(1) === want, s"vec ${r.getLong(0)} projection")
    }
    assert(projRows.map(_.getLong(1)).distinct.length > 1)
  }
}
