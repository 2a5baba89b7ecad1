package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MediaSpec extends SparkTestBase {

  test("media table has the multimodal schema: binary payload + typed metadata struct") {
    val df = Media.mediaTable(spark, sfDir).toDF()
    val schema = df.schema
    assert(schema("payload").dataType === BinaryType)
    assert(schema("meta").dataType.isInstanceOf[StructType])
    assert(df.select(col("meta.kind")).distinct().count() === 3)
  }

  test("feature extraction is deterministic, batched, and partition-preserving") {
    val media = Media.mediaTable(spark, sfDir).repartition(7)
    val feats = Media.extractFeatures(media)
    assert(feats.rdd.getNumPartitions === 7) // narrow transform: no shuffle
    val a = feats.collect().sortBy(_.media_id)
    val b = Media.extractFeatures(Media.mediaTable(spark, sfDir)).collect().sortBy(_.media_id)
    assert(a.map(_.checksum).toSeq === b.map(_.checksum).toSeq) // deterministic across runs/partitioning
    assert(a.forall(_.embedding.length === 16))
    assert(a.map(_.media_id).distinct.length === a.length)
  }

  test("phash near-dup recovers corrupted re-encodes with high recall and near-zero noise") {
    import org.apache.spark.sql.functions._
    val nDocs = Media.mediaTable(spark, sfDir).count()
    val pairs = Media.phashPairs(spark, sfDir).collect()
    // planted pair = (id, id + 1e9): same payload plus one trailing byte
    val planted = pairs.count(r => r.getAs[Long]("id_b") - r.getAs[Long]("id_a") == 1000000000L)
    assert(planted >= (nDocs * 0.8).toLong, s"recall: $planted of $nDocs")
    // noise (pairs between unrelated payloads) must stay marginal
    assert(pairs.length - planted <= math.max(2, nDocs / 10),
      s"noise pairs: ${pairs.length - planted}")
    assert(pairs.forall(_.getAs[Int]("hamming") <= 4))
  }

  test("resize plan caps the long side; frame sampling steps by k") {
    val media = Media.mediaTable(spark, sfDir)
    val resized = Media.planResize(media, maxSide = 96).collect()
    assert(resized.forall { r =>
      val scaled = math.max(r.getAs[Int]("width"), r.getAs[Int]("height")) * r.getAs[Double]("scale")
      scaled <= 96.0 + 1e-9
    })
    val frames = Media.sampleFrames(media, everyK = 10).collect()
    assert(frames.nonEmpty)
    assert(frames.forall { r =>
      val ids = r.getAs[scala.collection.Seq[Int]]("frame_ids")
      ids.head == 0 && ids.forall(i => i % 10 == 0) && ids.forall(_ < r.getAs[Int]("n_frames"))
    })
  }
}
