package graft.queries

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class AggSpec extends SparkTestBase {

  test("approx_count_distinct output: exact counts match, HLL error flags all true") {
    val rows = Relational.approxDistinct(spark, sfDir).collect()
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.map(_.getString(0)).toSet === exact.keySet)
    rows.foreach { r =>
      val (eo, ep) = exact(r.getString(0))
      assert(r.getLong(1) === eo && r.getLong(2) === ep) // exact columns ARE exact
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"${r.getString(0)}: HLL outside its 5% contract") // sketch error bound held
    }
  }

  test("approx_percentile GK rank-error flags all true") {
    val rows = Relational.approxPercentiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(2),
        s"${r.getString(0)}: approx_percentile outside the exact [q-0.01, q+0.01] rank window")
    }
  }

  test("decimal money sums are order-independent (repartition invariance)") {
    val base = Tables.lineitem(spark, sfDir)
    def total(parts: Int) = base.repartition(parts)
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))).head().getDecimal(0)
    assert(total(1) === total(13))
  }

  test("skyline: distributed prefix-max decomposition == brute-force dominance") {
    import spark.implicits._
    // planted staircase + dominated interior + duplicate frontier point
    val pts = Seq(
      (1L, 1.0, 1), (2L, 2.0, 3), (3L, 3.0, 5), // staircase (all frontier)
      (4L, 2.5, 2), (5L, 3.0, 4),               // dominated interior
      (6L, 2.0, 3),                             // duplicate of id 2 — both kept
      (7L, 4.0, 5)                              // same size as 3, pricier — dominated
    ).toDF("id", "price", "sz")
    val got = Relational.skylineOf(pts).select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 6L))

    // corpus parity vs brute force at sf0.001
    val all = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = all.filter { case (_, p, s) =>
      !all.exists { case (_, p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s) }
    }.map(_._1).toSet
    val q = Relational.skyline(spark, sfDir).collect().map(_.getLong(0)).toSet
    assert(q === brute)
  }

  test("winsorize: exact rank bounds and clipped sums re-derived") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byPrio = orders.groupBy(_._1)
    val got = Relational.winsorize(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === byPrio.keySet)
    got.foreach { r =>
      val rows = byPrio(r.getString(0)).sortBy(t => (t._3, t._2))
      val n = rows.length
      val (lo, hi) = (rows((n + 19) / 20 - 1)._3, rows((19 * n + 19) / 20 - 1)._3)
      assert(r.getLong(1) === n.toLong)
      assert(r.getDouble(2) === lo && r.getDouble(3) === hi)
      def dec(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      assert(r.getDouble(4) === rows.map(t => dec(t._3)).sum.toDouble)
      assert(r.getDouble(5) ===
        rows.map(t => dec(math.min(math.max(t._3, lo), hi))).sum.toDouble)
      assert(lo <= hi)
    }
  }

  test("bootstrap CI: replica weights and means re-derived through JVM md5") {
    import java.security.MessageDigest
    def md5hex(t: String): String =
      MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val cdf = Array(0.3678794411714423, 0.7357588823428846, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
      0.9999167589384503)
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
    val means = (0 until 64).map { rr =>
      var num = 0L; var den = 0L
      rows.foreach { case (k, cents) =>
        val h = md5hex(s"$k:${rr / 8}")
        val u = java.lang.Long.parseLong(
          h.substring(4 * (rr % 8), 4 * (rr % 8) + 4), 16) / 65536.0
        val w = cdf.indexWhere(u < _) match { case -1 => 7; case i => i }
        num += cents * w; den += w
      }
      num.toDouble / (den * 100).toDouble
    }
    val sorted = means.zipWithIndex.sortBy { case (m, r) => (m, r) }.map(_._1)
    val got = Relational.bootstrapCi(spark, sfDir).head()
    assert(got.getLong(0) === rows.length.toLong)
    assert(got.getDouble(1) ===
      rows.map(_._2).sum.toDouble / (rows.length * 100).toDouble)
    assert(got.getDouble(2) === sorted(1), "ci_lo = rank-2 replica mean")
    assert(got.getDouble(3) === sorted(62), "ci_hi = rank-63 replica mean")
    assert(got.getDouble(2) < got.getDouble(3))
  }

  test("vocab coverage: vocab truncation and per-doc OOV re-derived") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val counts = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val vocab = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(256)
      .map(_._1).toSet
    val got = TextOps.vocabCoverage(spark, sfDir).collect()
    assert(got.length === docs.length)
    got.foreach { r =>
      val toks = docs.toMap.apply(r.getLong(0))
      val oov = toks.count(!vocab(_))
      assert(r.getLong(1) === toks.length.toLong)
      assert(r.getLong(2) === oov.toLong)
      assert(r.getDouble(3) === oov.toDouble / toks.length)
    }
  }
}
