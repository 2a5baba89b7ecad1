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

  test("decodeImage round-trips a crafted PNG exactly (real javax.imageio decode)") {
    // 3×2 gray PNG, pixel(x,y) = (x + 2y + 7) mod 256
    val png = Media.encodeGrayPng(3, 2, 7L)
    assert(Media.looksLikeImage(png))
    val img = Media.decodeImage(png).getOrElse(fail("PNG did not decode"))
    assert(img.getWidth === 3 && img.getHeight === 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert(img.getRaster.getSample(x, y, 0) === (x + 2 * y + 7) % 256,
        s"pixel ($x,$y)")
    // non-image bytes must be rejected cheaply, not decoded
    assert(Media.decodeImage("not an image".getBytes).isEmpty)
    // text that PASSES the 2-byte BMP sniff ("BM...") must fall back
    // to None, not crash the task: the JDK BMP reader claims any such
    // stream and then throws on the garbage header
    assert(Media.decodeImage("BM25 is a ranking function".getBytes).isEmpty)
  }

  test("extractFeatures uses decoded pixels for real images, byte fallback otherwise") {
    import spark.implicits._
    val png = Media.encodeGrayPng(8, 8, 1L)
    val rows = Seq(
      Media.MediaRow(1L, Media.MediaMeta("image", 8, 8, 0, 1), png),
      Media.MediaRow(2L, Media.MediaMeta("audio", 0, 0, 16000, 1), "raw audio bytes".getBytes))
    val feats = Media.extractFeatures(spark.createDataset(rows)).collect().sortBy(_.media_id)
    // image row: checksum of DECODED samples, not of the PNG container
    // bytes — re-encoding the same pixels yields the same checksum
    val (decodedSum, _) = Media.decodedFeatures(Media.decodeImage(png).get)
    assert(feats(0).checksum === decodedSum)
    assert(feats(0).checksum !== Media.decodeStub(png)._1)
    // audio row: byte fallback (no JVM codec)
    assert(feats(1).checksum === Media.decodeStub("raw audio bytes".getBytes)._1)
  }

  test("decodeWav round-trips a crafted PCM clip exactly (real javax.sound decode)") {
    val wav = Media.encodeWavPcm8(nSamples = 5, rateHz = 8000, seed = 9L)
    assert(Media.looksLikeWav(wav))
    val (rate, samples) = Media.decodeWav(wav).getOrElse(fail("WAV did not decode"))
    assert(rate === 8000)
    assert(samples.toSeq === (0 until 5).map(i => (3 * i + 9) % 256))
    // RIFF-sniff-passing garbage must fall back, not crash
    assert(Media.decodeWav("RIFFxxxxWAVEgarbage!!".getBytes).isEmpty)
    assert(Media.decodeWav("plain text".getBytes).isEmpty)
    // a VALID 16-bit PCM WAV is outside this path's model: it must be
    // rejected (None), not byte-soup-decoded as twice as many "samples"
    import javax.sound.sampled._
    val fmt16 = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](20)), fmt16, 10),
      AudioFileFormat.Type.WAVE, bos)
    val wav16 = bos.toByteArray
    assert(Media.looksLikeWav(wav16) && Media.decodeWav(wav16).isEmpty)
  }

  test("audioDecode recovers closed-form frame counts, rates and samples from real WAVs") {
    val got = Media.audioDecode(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val n = 800 + (id % 5) * 200
      assert(r.getAs[Long]("n_samples") === n)
      assert(r.getAs[Int]("sample_rate") === (8000 + (id % 3) * 4000).toInt)
      assert(r.getAs[Int]("s_first") === (id % 256).toInt)
      assert(r.getAs[Int]("s_last") === ((3 * (n - 1) + id) % 256).toInt)
    }
  }

  test("decodeGifFrames round-trips a crafted animated GIF exactly (real multi-frame decode)") {
    val gif = Media.encodeGifAnim(width = 4, height = 3, nFrames = 3, seed = 5L)
    val frames = Media.decodeGifFrames(gif).getOrElse(fail("GIF did not decode"))
    assert(frames.length === 3)
    for (f <- 0 until 3; y <- 0 until 3; x <- 0 until 4)
      assert((frames(f).getRGB(x, y) & 0xff) === ((x + y + f + 5) % 2) * 255,
        s"frame $f pixel ($x,$y)")
    assert(Media.decodeGifFrames("GIF89a-garbage".getBytes).isEmpty)
    assert(Media.decodeGifFrames("not a gif".getBytes).isEmpty)
  }

  test("videoDecode recovers closed-form frame counts and probe pixels from real GIFs") {
    val got = Media.videoDecode(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("n_frames") === (2 + id % 4).toInt)
      assert(r.getAs[Int]("px_first") === ((id % 2) * 255).toInt)
    }
  }

  test("imageDecode recovers closed-form dims and corner pixels from real PNG payloads") {
    val got = Media.imageDecode(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val w = (8 + (id % 8) * 4).toInt
      val h = (8 + (id % 5) * 4).toInt
      assert(r.getAs[Int]("width") === w)
      assert(r.getAs[Int]("height") === h)
      assert(r.getAs[Int]("px00") === (id % 256).toInt)
      assert(r.getAs[Int]("px11") === ((w - 1 + 2L * (h - 1) + id) % 256).toInt)
    }
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

  test("encodeGrayJpeg: quality-1.0 constant-block JPEG round-trips every pixel exactly") {
    // stronger than the judged corners+sum: EVERY pixel of every fixture
    // shape must reconstruct bit-for-bit, or the all-ones-quant-table
    // assumption broke (e.g. a JDK writer change) and the oracle is void
    for (id <- 0L until 6L) {
      val w = (8 * (2 + id % 3)).toInt
      val h = (8 * (1 + id % 2)).toInt
      val img = Media.decodeImage(Media.encodeGrayJpeg(w, h, id)).get
      assert(img.getWidth === w && img.getHeight === h)
      val ras = img.getRaster
      for (y <- 0 until h; x <- 0 until w) {
        val want = ((37L * (x / 8) + 59L * (y / 8) + id) % 256).toInt
        assert(ras.getSample(x, y, 0) === want, s"id=$id px($x,$y)")
      }
    }
  }

  test("imageJpeg: judged columns re-derived from the closed form") {
    val rows = Media.imageJpeg(spark, sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      val nbx = (2 + id % 3).toInt
      val nby = (1 + id % 2).toInt
      def blk(bx: Int, by: Int): Long = (37L * bx + 59L * by + id) % 256
      assert(r.getInt(1) === nbx * 8 && r.getInt(2) === nby * 8, s"id $id dims")
      assert(r.getInt(3) === blk(0, 0).toInt, s"id $id px00")
      assert(r.getInt(4) === blk(nbx - 1, 0).toInt, s"id $id px10")
      assert(r.getInt(5) === blk(0, nby - 1).toInt, s"id $id px01")
      assert(r.getInt(6) === blk(nbx - 1, nby - 1).toInt, s"id $id px11")
      val want = 64L * (for (bx <- 0 until nbx; by <- 0 until nby) yield blk(bx, by)).sum
      assert(r.getLong(7) === want, s"id $id sum_px")
    }
  }

  test("audioResample: decimation + re-encode round-trip re-derived from the closed form") {
    val rows = Media.audioResample(spark, sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = (800 + (id % 5) * 200).toInt
      val rate = (8000 + (id % 3) * 4000).toInt
      val dec = (0 until n / 2).map(j => ((6L * j + id) % 256).toInt)
      assert(r.getInt(1) === n && r.getInt(2) === n / 2, s"id $id counts")
      assert(r.getInt(3) === rate && r.getInt(4) === rate / 2, s"id $id rates")
      assert(r.getInt(5) === dec.head && r.getInt(6) === dec.last, s"id $id ends")
      assert(r.getLong(7) === dec.map(_.toLong).sum, s"id $id sum")
    }
  }

  test("imageResize: nearest-neighbor downscale + PNG round-trip re-derived") {
    val rows = Media.imageResize(spark, sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w2 = (8 + (id % 8) * 4).toInt / 2
      val h2 = (8 + (id % 5) * 4).toInt / 2
      def px(x: Int, y: Int): Long = (2L * x + 4L * y + id) % 256
      assert(r.getInt(1) === w2 && r.getInt(2) === h2, s"id $id dims")
      assert(r.getInt(3) === px(0, 0).toInt, s"id $id px00")
      assert(r.getInt(4) === px(w2 - 1, h2 - 1).toInt, s"id $id px11")
      val want = (for (x <- 0 until w2; y <- 0 until h2) yield px(x, y)).sum
      assert(r.getLong(5) === want, s"id $id sum_px")
    }
  }

  test("audioVad: WAV round-trip + segmentation re-derived from the closed form") {
    val W = 160
    val rows = Media.audioVad(spark, sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = (1600 + (id % 5) * 320).toInt
      val nf = n / W
      def sample(i: Int): Int =
        if ((i / W + id) % 3 == 0) ((3L * i + id) % 256).toInt else 128 + (i % 3)
      val energies = (0 until nf).map { f =>
        (f * W until (f + 1) * W).map { i =>
          val d = sample(i) - 128L; d * d
        }.sum
      }
      val voiced = energies.map(_ >= 100000L)
      // islands: count and longest run of consecutive voiced frames
      val runs = voiced.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true) => 1 :: acc
        case (acc, false) if acc.nonEmpty && acc.head > 0 => 0 :: acc
        case (acc, false) => acc
      }.filter(_ > 0)
      assert(r.getLong(1) === nf.toLong, s"id $id n_frames")
      assert(r.getLong(2) === voiced.count(identity).toLong, s"id $id n_voiced")
      assert(r.getLong(3) === runs.length.toLong, s"id $id n_voiced_runs")
      assert(r.getLong(4) === (if (runs.isEmpty) 0L else runs.max.toLong),
        s"id $id longest run")
      assert(r.getLong(5) === energies.sum, s"id $id sum_energy")
      // the modulation plants voiced ≈ every third frame
      assert(r.getLong(2) >= nf / 3 && r.getLong(2) <= nf / 3 + 1, s"id $id cadence")
    }
  }
}
