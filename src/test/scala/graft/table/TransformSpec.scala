package graft.table

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.types._

/** The hidden-partition transform family beyond the reference's days():
  * months/years/hours/bucket[N]/truncate[W] (Iceberg's standard set).
  * Each transform is proven on BOTH sides: the write clusters and records
  * the value, and pruning keeps exactly the files a matching row could
  * live in — with result equality against an unpruned filter (pruning is
  * an optimization, never a semantic change). */
class TransformSpec extends SparkTestBase {

  private def newCatalog(): GraftCatalog =
    new GraftCatalog(Files.createTempDirectory("graft_wh"))

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("k", LongType),
    StructField("s", StringType),
    StructField("ts", TimestampType)))

  private def df(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, (i % 37).toLong, f"w${i % 11}%02d-${i}%04d",
        Timestamp.valueOf(f"2024-${1 + i % 12}%02d-${1 + i % 28}%02d ${i % 24}%02d:00:00"))
    }.toDF("id", "k", "s", "ts")
  }

  private def files(t: GraftTable): Seq[DataFile] =
    t.meta.currentSnapshot.map(_.manifest).getOrElse(Nil)

  test("months transform: write clusters by yyyy-MM and range filters prune") {
    val cat = newCatalog(); cat.createSchema("db")
    val t = cat.createTable("db.m", schema, partitionSpec = Seq("ts" -> "months"))
    t.append(df(800))
    val fs = files(t)
    assert(fs.nonEmpty)
    assert(fs.forall(_.partitionValues.get("ts_months").exists(_.matches("\\d{4}-\\d{2}"))))
    val pruned = t.planFilters(t.meta, Seq(
      GreaterThanOrEqual("ts", Timestamp.valueOf("2024-06-01 00:00:00")),
      LessThanOrEqual("ts", Timestamp.valueOf("2024-07-31 23:59:59"))))
    assert(pruned.size < fs.size, s"expected pruning: ${pruned.size} vs ${fs.size}")
    // ±1-day timezone widening keeps at most the two adjacent months
    assert(pruned.forall(_.partitionValues("ts_months") >= "2024-05"))
    assert(pruned.forall(_.partitionValues("ts_months") <= "2024-08"))
    // semantics: pruned read == plain filter
    val expect = df(800).filter(col("ts") >= "2024-06-01" && col("ts") < "2024-08-01")
      .count()
    val got = t.readPruned(spark, Seq(
      GreaterThanOrEqual("ts", Timestamp.valueOf("2024-06-01 00:00:00")),
      LessThanOrEqual("ts", Timestamp.valueOf("2024-07-31 23:59:59"))))
      .filter(col("ts") >= "2024-06-01" && col("ts") < "2024-08-01").count()
    assert(got == expect)
  }

  test("years + hours transforms record the expected value shapes") {
    val cat = newCatalog(); cat.createSchema("db")
    val ty = cat.createTable("db.y", schema, partitionSpec = Seq("ts" -> "years"))
    ty.append(df(100))
    assert(files(ty).forall(_.partitionValues("ts_years").matches("\\d{4}")))
    val th = cat.createTable("db.h", schema, partitionSpec = Seq("ts" -> "hours"))
    th.append(df(100))
    assert(files(th).forall(_.partitionValues("ts_hours").matches("\\d{4}-\\d{2}-\\d{2}-\\d{2}")))
    // hours pruning: a one-hour equality window keeps a small file subset
    val all = files(th)
    val pruned = th.planFilters(th.meta, Seq(
      GreaterThanOrEqual("ts", Timestamp.valueOf("2024-03-03 02:00:00")),
      LessThanOrEqual("ts", Timestamp.valueOf("2024-03-03 02:59:59"))))
    assert(pruned.size < all.size)
  }

  test("bucket[N]: write buckets agree with driver-side literal hashing; equality prunes to one bucket") {
    val cat = newCatalog(); cat.createSchema("db")
    val t = cat.createTable("db.b", schema, partitionSpec = Seq("k" -> "bucket[8]"))
    t.append(df(500))
    val fs = files(t)
    val buckets = fs.map(_.partitionValues("k_bucket8")).distinct
    assert(buckets.size > 1 && buckets.forall(b => (0 until 8).map(_.toString).contains(b)))
    // the Spark-side hash() and the driver-side Murmur3 literal eval MUST
    // agree — otherwise pruning would silently drop matching rows
    val sampled = df(500).select(col("k"), pmod(hash(col("k")), lit(8)).as("b"))
      .distinct().collect()
    sampled.foreach { r =>
      assert(Transforms.bucketOfLiteral(r.getLong(0), 8).contains(r.getInt(1)),
        s"bucket mismatch for k=${r.getLong(0)}")
    }
    // equality pruning keeps only the matching bucket's files
    val pruned = t.planFilters(t.meta, Seq(EqualTo("k", 5L)))
    val expectBucket = Transforms.bucketOfLiteral(5L, 8).get.toString
    assert(pruned.nonEmpty)
    assert(pruned.forall(_.partitionValues("k_bucket8") == expectBucket))
    // and the pruned read still returns every matching row
    val got = t.readPruned(spark, Seq(EqualTo("k", 5L)))
      .filter(col("k") === 5L).count()
    assert(got == df(500).filter(col("k") === 5L).count())
    // a RANGE predicate must NOT prune hash buckets
    assert(t.planFilters(t.meta, Seq(GreaterThanOrEqual("k", 5L))).size == fs.size)
  }

  test("truncate[W] on strings: prefix dirs, range pruning keeps prefix-compatible files") {
    val cat = newCatalog(); cat.createSchema("db")
    val t = cat.createTable("db.tr", schema, partitionSpec = Seq("s" -> "truncate[3]"))
    t.append(df(400))
    val fs = files(t)
    assert(fs.forall(_.partitionValues("s_truncate3").length == 3))
    val pruned = t.planFilters(t.meta, Seq(
      GreaterThanOrEqual("s", "w03"), LessThanOrEqual("s", "w05-9999")))
    assert(pruned.size < fs.size)
    assert(pruned.map(_.partitionValues("s_truncate3")).distinct.sorted ==
      Seq("w03", "w04", "w05"))
    val got = t.readPruned(spark, Seq(
      GreaterThanOrEqual("s", "w03"), LessThanOrEqual("s", "w05-9999")))
      .filter(col("s") >= "w03" && col("s") <= "w05-9999").count()
    assert(got == df(400).filter(col("s") >= "w03" && col("s") <= "w05-9999").count())
  }

  test("truncate[W] on integers: floor-to-multiple dirs (negatives floor down), numeric pruning") {
    val cat = newCatalog(); cat.createSchema("db")
    val t = cat.createTable("db.ti", schema, partitionSpec = Seq("id" -> "truncate[100]"))
    import spark.implicits._
    val neg = Seq((-7L, 0L, "x", Timestamp.valueOf("2024-01-01 00:00:00")),
      (250L, 0L, "y", Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "k", "s", "ts")
    t.append(neg)
    val pv = files(t).map(_.partitionValues("id_truncate100")).sorted
    assert(pv == Seq("-100", "200"), s"got $pv") // -7 floors to -100
    val pruned = t.planFilters(t.meta, Seq(
      GreaterThanOrEqual("id", 200L), LessThanOrEqual("id", 299L)))
    assert(pruned.map(_.partitionValues("id_truncate100")) == Seq("200"))
  }

  test("partition evolution: drop field stops clustering, old files stay readable and pruned reads stay correct") {
    val cat = newCatalog(); cat.createSchema("db")
    val t = cat.createTable("db.ev", schema, partitionSpec = Seq("k" -> "bucket[4]"))
    t.append(df(200))
    val before = files(t).size
    t.dropPartitionField("k")
    assert(t.meta.partitionFields.isEmpty)
    t.append(df(200)) // unpartitioned write now
    assert(t.read(spark).count() == 400)
    // files from the bucketed epoch keep their values; new ones have none;
    // equality pruning may only drop files with a RECORDED non-matching bucket
    val fs = files(t)
    assert(fs.size > before)
    val pruned = t.planFilters(t.meta, Seq(EqualTo("k", 3L)))
    assert(fs.filter(_.partitionValues.isEmpty).forall(f => pruned.exists(_.path == f.path)),
      "files without recorded partition values must never be pruned")
    val got = t.readPruned(spark, Seq(EqualTo("k", 3L))).filter(col("k") === 3L).count()
    val expect = t.read(spark).filter(col("k") === 3L).count()
    assert(got == expect && got > 0)
  }

  test("property: driver-side bucket hash agrees with Spark's for random longs and strings") {
    import spark.implicits._
    // One distributed evaluation over a seeded batch, then compare
    // element-wise: a per-sample Spark job would be minutes of scheduler
    // overhead for no extra coverage, and the FIXED seed makes any
    // divergence reproducible (an unseeded sample could not be replayed).
    val rnd = new scala.util.Random(42)
    val longs = (Seq(0L, -1L, Long.MinValue, Long.MaxValue) ++
      Seq.fill(200)(rnd.nextLong())).distinct
    assert(longs.size > 100) // never vacuous
    val sparkLongBuckets = longs.toDF("k")
      .select(col("k"), pmod(hash(col("k")), lit(32)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    longs.foreach { v =>
      assert(Transforms.bucketOfLiteral(v, 32).contains(sparkLongBuckets(v)),
        s"long bucket mismatch for $v")
    }
    val strings = (Seq("a", "é世界", " ", "0") ++
      Seq.fill(200)(rnd.alphanumeric.take(1 + rnd.nextInt(24)).mkString)).distinct
    assert(strings.size > 100)
    val sparkStrBuckets = strings.toDF("s")
      .select(col("s"), pmod(hash(col("s")), lit(32)).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    strings.foreach { v =>
      assert(Transforms.bucketOfLiteral(v, 32).contains(sparkStrBuckets(v)),
        s"string bucket mismatch for ${v.map(_.toInt)}")
    }
    // and ints hash differently from longs — the reason widenColumn
    // refuses to change a bucket source's type
    assert((0 until 100).exists(v =>
      Transforms.bucketOfLiteral(v, 32) != Transforms.bucketOfLiteral(v.toLong, 32)),
      "int and long murmur3 buckets coincided on 0..99 — type guard premise broken")
  }

  test("ADD PARTITION FIELD accepts the full transform family and validates types") {
    val cat = newCatalog(); cat.createSchema("db")
    val t = cat.createTable("db.ap", schema)
    t.addPartitionField("ts", "months")
    assert(t.meta.partitionFields.map(_.transform) == Seq("months"))
    intercept[IllegalArgumentException] {
      t.addPartitionField("s", "months") // months on a string column
    }
    intercept[IllegalArgumentException] {
      t.addPartitionField("k", "bucket") // bucket without [N]
    }
  }

  test("identity transform: value-is-directory writes, range + equality pruning, timestamps rejected") {
    val cat = newCatalog(); cat.createSchema("db")
    val t = cat.createTable("db.ident", schema, partitionSpec = Seq("k" -> "identity"))
    t.append(df(800)) // k ∈ [0, 36]
    val fs = files(t)
    assert(fs.nonEmpty)
    assert(fs.forall(_.partitionValues.get("k_identity").exists(_.matches("\\d+"))))
    // equality prunes to exactly the one value's files
    val eq = t.planFilters(t.meta, Seq(EqualTo("k", 7L)))
    assert(eq.nonEmpty && eq.forall(_.partitionValues("k_identity") == "7"))
    // numeric range pruning (not lexicographic: 9 < 10 must hold)
    val rng = t.planFilters(t.meta, Seq(
      GreaterThanOrEqual("k", 9L), LessThanOrEqual("k", 10L)))
    assert(rng.nonEmpty && rng.forall(f =>
      Set("9", "10").contains(f.partitionValues("k_identity"))))
    // semantics: pruned read == plain filter
    assert(t.readPruned(spark, Seq(EqualTo("k", 7L)))
      .filter(col("k") === 7L).count() ===
      df(800).filter(col("k") === 7L).count())
    // identity on timestamp refused (one directory per microsecond)
    val e = intercept[IllegalArgumentException] {
      cat.createTable("db.identTs", schema, partitionSpec = Seq("ts" -> "identity"))
    }
    assert(e.getMessage.contains("identity"))
  }
}
