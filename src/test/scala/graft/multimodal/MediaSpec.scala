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
