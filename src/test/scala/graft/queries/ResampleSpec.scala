package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkTestBase {

  test("resample grid is dense: exactly users x days rows, no gaps") {
    val out = Events.resampleDaily(spark, sfDir).cache()
    try {
      val users = graft.Tables.events(spark, sfDir).select("user_id").distinct().count()
      val days = out.select("day").distinct().count()
      assert(out.count() == users * days, s"grid ${out.count()} != $users users x $days days")
      // every user covers the identical day spine
      val perUser = out.groupBy("user_id").count().select("count").distinct().collect()
      assert(perUser.length == 1 && perUser.head.getLong(0) == days)
    } finally out.unpersist()
  }

  test("gap days have n_events=0 and carry the last observed value forward") {
    val out = Events.resampleDaily(spark, sfDir)
    val gaps = out.filter(col("n_events") === 0)
    assert(gaps.count() > 0, "fixture has no gap days — spec is vacuous")
    // a gap day's locf equals the previous day's locf (carried forward)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    val bad = out
      .withColumn("prev", lag(col("locf_value"), 1).over(w))
      .filter(col("n_events") === 0 && col("prev").isNotNull &&
        !(col("locf_value") <=> col("prev")))
      .count()
    assert(bad == 0, s"$bad gap rows broke LOCF")
  }

  test("seq mining: followed-by supports re-derived from raw event sequences") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val byUser = ev.groupBy(_._1)
    val expected = collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    byUser.values.foreach { rows =>
      val types = rows.map(_._2).distinct
      for (a <- types; b <- types if a != b) {
        val firstA = rows.filter(_._2 == a).map(_._3).min
        val lastB = rows.filter(_._2 == b).map(_._3).max
        if (firstA < lastB) expected((a, b)) += 1
      }
    }
    val nUsers = byUser.size.toLong
    val got = Events.seqMining(spark, sfDir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val n = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === n)
      assert(r.getDouble(3) === n.toDouble / nUsers.toDouble)
    }
  }

  test("anomaly MAD: exact rank medians re-derived per event type") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    val got = Events.anomalyMad(spark, sfDir).collect()
    assert(got.length === daily.length)
    got.foreach { r =>
      val rows = byType(r.getString(0))
      val n = rows.length
      val med = rows.map(t => (t._3, t._2.toString)).sorted.apply((n + 1) / 2 - 1)._1
      val mad = rows.map(t => (math.abs(t._3 - med), t._2.toString))
        .sorted.apply((n + 1) / 2 - 1)._1
      assert(r.getLong(3) === med && r.getLong(4) === mad)
      if (mad > 0) {
        val rz = (r.getLong(2) - med).toDouble / mad.toDouble
        assert(r.getDouble(5) === rz)
        assert(r.getBoolean(6) === (math.abs(rz) > 3.5))
      } else assert(r.isNullAt(5))
    }
  }

  test("session path: top paths re-derived from ordered raw events") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(t => (t._1, t._2.toLocalDateTime.toLocalDate))
      .values.map(_.sortBy(t => (t._2.getTime, t._3)).map(_._4).mkString(">"))
    val counts = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(20)
    val got = Events.sessionPath(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === counts)
  }

  test("ab test: counts, rates and z statistic re-derived per event type") {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = ev.map(_._1).distinct
    val nA = users.count(_ % 2 == 0).toLong
    val nB = users.count(_ % 2 == 1).toLong
    val got = Events.abTest(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getString(0)
      val convUsers = ev.filter(_._2 == t).map(_._1).distinct
      val (cA, cB) = (convUsers.count(_ % 2 == 0).toLong,
        convUsers.count(_ % 2 == 1).toLong)
      assert(r.getLong(1) === cA && r.getLong(2) === cB)
      assert(r.getLong(3) === nA && r.getLong(4) === nB)
      val (pA, pB) = (cA.toDouble / nA, cB.toDouble / nB)
      assert(r.getDouble(5) === pA && r.getDouble(6) === pB)
      val pPool = (cA + cB).toDouble / (nA + nB)
      if (pPool > 0.0 && pPool < 1.0) {
        val z = (pA - pB) /
          math.sqrt(pPool * (1.0 - pPool) * (1.0 / nA + 1.0 / nB))
        assert(r.getDouble(7) === z)
        assert(r.getBoolean(8) === (math.abs(z) > 1.959963984540054))
      } else assert(r.isNullAt(7))
    }
  }

  test("seasonality: per-dow means and peaks re-derived from raw daily counts") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val got = Events.seasonality(spark, sfDir).collect()
    assert(got.nonEmpty)
    // dow convention: days since Sunday 2024-01-07 mod 7 ⇒ Sunday = 0
    def dowOf(d: java.time.LocalDate): Int =
      java.lang.Math.floorMod(
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.of(2024, 1, 7), d), 7L).toInt
    val byKey = daily.groupBy(t => (t._1, dowOf(t._2)))
    assert(got.map(r => (r.getString(0), r.getInt(1))).toSet === byKey.keySet)
    got.foreach { r =>
      val g = byKey((r.getString(0), r.getInt(1)))
      assert(r.getLong(2) === g.length.toLong)
      assert(r.getLong(3) === g.map(_._3).sum)
      assert(r.getDouble(4) === g.map(_._3).sum.toDouble / g.length)
      val peak = g.maxBy(t => (t._3, t._2.toEpochDay))
      assert(r.getLong(5) === peak._3)
      assert(r.getTimestamp(6).toLocalDateTime.toLocalDate === peak._2)
    }
    // the dow convention itself: 2024-01-07 was a Sunday
    assert(dowOf(java.time.LocalDate.of(2024, 1, 7)) === 0)
    assert(java.time.LocalDate.of(2024, 1, 7).getDayOfWeek
      === java.time.DayOfWeek.SUNDAY)
  }

  test("dataset card: every per-source stat re-derived") {
    import java.security.MessageDigest
    def md5hex(t: String): String =
      MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("lang"), col("n_chars"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val got = TextOps.datasetCard(spark, sfDir).collect()
    val bySrc = docs.groupBy(_._1)
    assert(got.map(_.getString(0)).toSet === bySrc.keySet)
    got.foreach { r =>
      val rows = bySrc(r.getString(0))
      assert(r.getLong(1) === rows.length.toLong)
      assert(r.getLong(2) === rows.map(t => md5hex(t._4)).distinct.length.toLong)
      assert(r.getDouble(3) === 1.0 - r.getLong(2).toDouble / r.getLong(1).toDouble)
      assert(r.getLong(4) === rows.map(_._4.split(" ").count(_.nonEmpty).toLong).sum)
      assert(r.getLong(5) === rows.map(_._3).sum)
      assert(r.getLong(6) === rows.map(_._2).distinct.length.toLong)
      val topLang = rows.groupBy(_._2).view.mapValues(_.size).toSeq
        .minBy { case (l, n) => (-n, l) }._1
      assert(r.getString(7) === topLang)
    }
  }

  test("burstiness: exact moments re-derived; VMR sign agrees with plain variance/mean") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val got = Events.burstiness(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === daily.map(_._1).toSet)
    got.foreach { r =>
      val xs = daily.filter(_._1 == r.getString(0)).map(_._2)
      val n = xs.length.toLong
      val sx = xs.sum
      val sxx = xs.map(x => x * x).sum
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((n, sx, sxx)))
      assert(r.getLong(4) === n * sxx - sx * sx)
      assert(r.getLong(5) === (n - 1) * sx)
      if (n >= 2 && sx > 0) {
        val vmr = (n * sxx - sx * sx).toDouble / ((n - 1) * sx).toDouble
        assert(r.getDouble(6) === vmr)
        // cross-check against the textbook variance/mean form
        val mean = sx.toDouble / n
        val variance = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
        assert(math.abs(vmr - variance / mean) < 1e-6)
        assert(r.getBoolean(7) === (vmr > 1.0))
      } else assert(r.isNullAt(6) && r.isNullAt(7))
    }
  }

  test("attribution: first-touch credit and conversions re-derived per (user, day) session") {
    val evs = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val sessions = evs.groupBy(e => (e._1,
        e._2.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate))
      .toSeq // BEFORE mapping to pairs — a Map of 2-tuples deduplicates
      .map { case (_, rows) =>
        val first = rows.minBy(e => (e._2.getTime, e._3))._4
        (first, rows.exists(_._4 == "purchase"))
      }
    val want = sessions.groupBy(_._1).map { case (ft, g) =>
      ft -> (g.size.toLong, g.count(_._2).toLong)
    }
    val got = Events.attribution(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === want.keySet)
    got.foreach { r =>
      val (ns, nc) = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2)) === ((ns, nc)))
      assert(r.getDouble(3) === nc.toDouble / ns.toDouble)
    }
    // accounting closes: session totals match across credit buckets
    assert(got.map(_.getLong(1)).sum === sessions.size.toLong)
  }

  test("changepoint: CUSUM argmax re-derived per event type from raw daily counts") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val got = Events.changepoint(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet === daily.map(_._1).toSet)
    got.foreach { r =>
      val series = daily.filter(_._1 == r.getString(0)).sortBy(_._2.toEpochDay)
      val n = series.length.toLong
      val total = series.map(_._3).sum
      assert(r.getLong(1) === n && r.getLong(2) === total)
      // exact-integer cumulative deviations; argmax |C|, ties → earliest day
      val cs = series.scanLeft(0L) { case (c, (_, _, x)) => c + n * x - total }.tail
      val best = series.zip(cs).minBy { case ((_, d, _), c) =>
        (-math.abs(c), d.toEpochDay)
      }
      assert(r.getTimestamp(3).toLocalDateTime.toLocalDate === best._1._2)
      assert(r.getLong(4) === best._1._3)
      assert(r.getLong(5) === best._2)
      assert(r.getDouble(6) === best._2.toDouble / (n * total).toDouble)
      // the deviation series telescopes to zero — the CUSUM invariant
      assert(cs.last === 0L)
    }
  }

  test("autocorr: lag-k products re-derived from the ordered daily total series") {
    val daily = graft.Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val n = daily.length.toLong
    val t = daily.map(_._2).sum
    val y = daily.map { case (_, x) => n * x - t }
    val den = y.map(v => v * v).sum
    val got = Events.autocorr(spark, sfDir).collect()
    assert(got.map(_.getInt(0)).toSeq === (1 to 14))
    got.foreach { r =>
      val k = r.getInt(0)
      val pairs = y.dropRight(k).zip(y.drop(k))
      assert(r.getLong(1) === pairs.length.toLong)
      val num = pairs.map { case (a, b) => a * b }.sum
      assert(r.getLong(2) === num)
      assert(r.getLong(3) === den)
      assert(r.getDouble(4) === num.toDouble / den.toDouble)
    }
    // Cauchy–Schwarz: |Σ y_i·y_{i+k}| ≤ Σ y_i² ⇒ every acf in [-1, 1]
    got.foreach(r => assert(math.abs(r.getDouble(4)) <= 1.0))
  }
}
