package graft.table

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants (SURVEY.md §5.3): for random operation
  * sequences, the table is always equivalent to the in-memory fold of
  * the same operations, and old snapshots never change. */
class TablePropertySpec extends SparkTestBase {

  private def check(prop: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  sealed trait Op
  case class Append(rows: Seq[(Long, String)]) extends Op
  case class Delete(mod: Long) extends Op // CoW delete where k % mod == 0
  case class EqDelete(keys: Set[Long]) extends Op // MoR equality delete by k
  // maintenance ops: metadata/file reorganizations that must NEVER
  // change logical content, interleaved with the mutations above
  case object RewriteManifests extends Op
  case object Compact extends Op
  case object Expire extends Op

  private val genAppend: Gen[Op] = for {
    n <- Gen.choose(1, 8)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 50L); v <- Gen.alphaStr.map(_.take(4))
    } yield (k, v))
  } yield Append(rows)

  private val genDelete: Gen[Op] = Gen.choose(2L, 5L).map(Delete(_))

  private val genEqDelete: Gen[Op] =
    Gen.nonEmptyListOf(Gen.choose(0L, 50L)).map(ks => EqDelete(ks.toSet))

  private val genOps: Gen[List[Op]] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n,
      Gen.frequency(3 -> genAppend, 1 -> genDelete, 1 -> genEqDelete,
        1 -> Gen.const(RewriteManifests), 1 -> Gen.const(Compact),
        1 -> Gen.const(Expire))))

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("∀ op sequences: table content == in-memory fold; snapshots are immutable") {
    check(Prop.forAll(genOps) { ops =>
      val cat = new GraftCatalog(Files.createTempDirectory("graft_prop"))
      cat.createSchema("p")
      val t = cat.createTable("p.t", schema)
      var model = Vector.empty[(Long, String)]
      val snapshotsAfterFirstAppend = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, String)]]
      var firstSnapshotContent: Option[Set[(Long, String)]] = None

      var expired = false
      ops.foreach {
        case Append(rows) =>
          t.append(df(rows))
          model = model ++ rows
          if (firstSnapshotContent.isEmpty)
            firstSnapshotContent = Some(model.toSet)
        case Delete(mod) =>
          t.delete(spark, col("k") % mod === 0)
          model = model.filterNot(_._1 % mod == 0)
        case EqDelete(keys) =>
          // the sequence guard makes an equality delete exactly "remove
          // every CURRENT row with these keys" — later appends re-add
          import spark.implicits._
          t.deleteMoREquality(spark, keys.toSeq.toDF("k"))
          model = model.filterNot(r => keys.contains(r._1))
        // maintenance never changes the model: the fold-equivalence
        // check below is exactly the "logical content is invariant
        // under reorganization" property
        case RewriteManifests => t.rewriteManifests()
        case Compact => t.rewriteDataFiles(spark, targetFiles = 2)
        case Expire =>
          t.expireSnapshots(
            olderThanMs = System.currentTimeMillis() + 60000, retainLast = 1)
          t.removeOrphanFiles(olderThanMs = System.currentTimeMillis() + 60000)
          expired = true
      }

      val table = t.read(spark).collect().map(r => (r.getLong(0), r.getString(1)))
      val contentOk = table.sorted.toSeq == model.sorted.toSeq
      // snapshot 1 (if any write happened) still returns its original
      // content. After an expire the read may legitimately fail (its
      // chunks/files can be GC'd) — but if it still READS, immutability
      // must still hold; only the expired case excuses an exception.
      // the shapes GC'd history legitimately produces: missing chunk or
      // data file (possibly wrapped by Spark), or the metadata loader's
      // "no snapshot <id>" once expiry dropped the snapshot entry
      def isMissingData(e: Throwable): Boolean = {
        val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toList
        chain.exists {
          case _: java.io.FileNotFoundException => true
          case _: java.nio.file.NoSuchFileException => true
          case ia: IllegalArgumentException =>
            Option(ia.getMessage).exists(_.startsWith("no snapshot"))
          case _ => false
        }
      }
      val travelOk = firstSnapshotContent.forall { expect =>
        try t.readVersion(spark, 1).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet == expect
        catch {
          // ONLY missing-data shapes are excused, and only after an
          // expire: a time-travel bug that throws anything else (analysis
          // error, codec failure, NPE) must fail the property even in
          // sequences that contain an Expire. GC'd chunks/files surface
          // as (possibly wrapped) FileNotFound/NoSuchFile, or as the
          // loader's own "no snapshot/version" IllegalArgumentException.
          case e: Throwable if expired && isMissingData(e) => true
        }
      }
      contentOk && travelOk
    }, minTests = 15)
  }
}
