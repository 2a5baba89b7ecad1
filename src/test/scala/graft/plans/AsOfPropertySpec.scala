package graft.plans

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: for random key/timestamp sets — duplicate timestamps,
  * sparse keys, nulls on both sides — the native AsOfJoinExec agrees
  * with a driver-side brute-force model of DuckDB's ASOF LEFT JOIN
  * (greatest rts ≤ lts per key; null key/ts never matches). */
class AsOfPropertySpec extends SparkTestBase {

  private def check(prop: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  private val genKey: Gen[java.lang.Long] = Gen.frequency(
    9 -> Gen.choose(0L, 6L).map(java.lang.Long.valueOf),
    1 -> Gen.const(null.asInstanceOf[java.lang.Long]))
  private val genTs: Gen[java.lang.Long] = Gen.frequency(
    9 -> Gen.choose(0L, 40L).map(java.lang.Long.valueOf),
    1 -> Gen.const(null.asInstanceOf[java.lang.Long]))

  private val genSides: Gen[(List[(java.lang.Long, java.lang.Long)],
      List[(java.lang.Long, java.lang.Long, Double)])] = for {
    nl <- Gen.choose(0, 25)
    nr <- Gen.choose(0, 25)
    ls <- Gen.listOfN(nl, Gen.zip(genKey, genTs))
    rs <- Gen.listOfN(nr, for {
      k <- genKey; t <- genTs; v <- Gen.choose(1, 999)
    } yield (k, t, v.toDouble))
  } yield (ls, rs)

  test("∀ sides: native as-of == brute-force greatest-rts-≤-lts model") {
    import spark.implicits._
    check(Prop.forAll(genSides) { case (ls, rs) =>
      val clicks = ls.zipWithIndex
        .map { case ((k, t), i) => (java.lang.Long.valueOf(i.toLong), k, t) }
        .toDF("event_id", "user_id", "ts")
      val purchases = rs.toDF("p_user", "p_ts", "p_value")
      val out = AsOf.join(clicks, purchases, "user_id", "p_user", "ts", "p_ts")
        .orderBy("event_id").collect()

      // brute-force model: for ties on the greatest rts the operator may
      // return ANY of the tied rows' values — compare (p_ts, value-set)
      val model = ls.zipWithIndex.map { case ((k, t), i) =>
        val best =
          if (k == null || t == null) Nil
          else rs.filter(r => r._1 == k && r._2 != null && r._2 <= t)
        val bestTs = if (best.isEmpty) null
          else java.lang.Long.valueOf(best.map(_._2.longValue()).max)
        val vals = if (bestTs == null) Set.empty[Double]
          else best.filter(_._2.longValue() == bestTs).map(_._3).toSet
        (i.toLong, bestTs, vals)
      }

      out.length == ls.length && out.zip(model).forall {
        case (row, (_, null, _)) => row.isNullAt(4) && row.isNullAt(5)
        case (row, (_, bestTs, vals)) =>
          !row.isNullAt(4) && row.getLong(4) == bestTs.longValue() &&
            vals.contains(row.getDouble(5))
      }
    }, minTests = 40)
  }

  test("∀ sides: FORWARD as-of == brute-force smallest-rts-≥-lts model") {
    import spark.implicits._
    check(Prop.forAll(genSides) { case (ls, rs) =>
      val clicks = ls.zipWithIndex
        .map { case ((k, t), i) => (java.lang.Long.valueOf(i.toLong), k, t) }
        .toDF("event_id", "user_id", "ts")
      val purchases = rs.toDF("p_user", "p_ts", "p_value")
      val out = AsOf.join(clicks, purchases, "user_id", "p_user", "ts", "p_ts",
          direction = "forward")
        .orderBy("event_id").collect()

      val model = ls.zipWithIndex.map { case ((k, t), i) =>
        val best =
          if (k == null || t == null) Nil
          else rs.filter(r => r._1 == k && r._2 != null && r._2 >= t)
        val bestTs = if (best.isEmpty) null
          else java.lang.Long.valueOf(best.map(_._2.longValue()).min)
        val vals = if (bestTs == null) Set.empty[Double]
          else best.filter(_._2.longValue() == bestTs).map(_._3).toSet
        (i.toLong, bestTs, vals)
      }

      out.length == ls.length && out.zip(model).forall {
        case (row, (_, null, _)) => row.isNullAt(4) && row.isNullAt(5)
        case (row, (_, bestTs, vals)) =>
          !row.isNullAt(4) && row.getLong(4) == bestTs.longValue() &&
            vals.contains(row.getDouble(5))
      }
    }, minTests = 40)
  }
}
