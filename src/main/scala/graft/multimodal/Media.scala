package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import javax.imageio.ImageIO

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star requirement): image/audio/video
  * as opaque `binary` payloads with typed metadata, processed in
  * per-partition batches.
  *
  * The container has no codec libraries, so `decodeStub` is a clearly
  * marked DETERMINISTIC FAKE — but everything Spark-side is real and
  * tested: the schema (binary + struct metadata), the
  * `mapPartitions`-batched operator shape (the Scala dual of
  * `mapInPandas`: one iterator per partition, so per-batch setup such as
  * loading a codec happens once per partition, not per row), partition
  * preservation, and the feature-vector output contract.
  *
  * Scale notes: payloads never shuffle — decode/feature-extract are
  * narrow per-partition transforms; only the small extracted features
  * flow into downstream joins/ANN. That is the only viable topology at
  * 100 TB of media.
  */
object Media {

  // PNG decode needs no display, but AWT class-loading can probe for one;
  // pin headless + disable ImageIO's temp-file stream cache (per-image
  // disk churn on executors for in-memory byte arrays).
  System.setProperty("java.awt.headless", "true")
  ImageIO.setUseCache(false)

  case class MediaMeta(kind: String, width: Int, height: Int, sampleRateHz: Int, nFrames: Int)
  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeature(media_id: Long, kind: String, n_bytes: Int, checksum: Long,
      embedding: Array[Float])

  /** Deterministic media fixture derived from the documents table: the
    * text bytes stand in for an encoded payload; metadata is synthesized
    * from stable per-row facts. Pure column expressions (no typed map),
    * so the fixture build stays inside WholeStageCodegen; the typed
    * Dataset[MediaRow] view is just an encoder binding on top. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    val payload = col("text").cast("binary")
    val kind = when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio")
      .otherwise("video")
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        struct(
          kind.as("kind"),
          (lit(64) + (col("doc_id") % 8) * 16).cast("int").as("width"),
          (lit(64) + (col("doc_id") % 5) * 16).cast("int").as("height"),
          when(kind === "audio", 16000).otherwise(0).as("sampleRateHz"),
          when(kind === "video", lit(1) + pmod(length(payload), lit(120)))
            .otherwise(1).cast("int").as("nFrames")).as("meta"),
        payload.as("payload"))
      .as[MediaRow]
  }

  /** Header sniff for the formats the stock JVM can decode (javax.imageio
    * ships PNG/BMP/GIF/JPEG readers). Cheap enough to run per row; only
    * matching payloads pay for an ImageIO reader probe. */
  def looksLikeImage(p: Array[Byte]): Boolean =
    (p.length > 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
    (p.length > 2 && p(0) == 'B' && p(1) == 'M') ||
    (p.length > 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) ||
    (p.length > 3 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F')

  /** REAL image decode via javax.imageio — no external codec library
    * needed for PNG/BMP/GIF/JPEG. None when the payload is not a
    * decodable image: wrong magic bytes, no reader, OR a reader that
    * claims the stream and then chokes. The catch matters: the 2-byte
    * "BM" sniff (matching the JDK BMP reader's own canDecodeInput) is
    * satisfied by any text payload starting with "BM…", and an
    * uncaught IIOException there would fail the whole task instead of
    * falling back to the byte-feature path. */
  def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
    if (!looksLikeImage(payload)) None
    else try Option(ImageIO.read(new ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic 8-bit grayscale PNG with pixel(x,y) = (x + 2y + seed)
    * mod 256 — a REAL ImageIO encode whose decode must recover the exact
    * samples (PNG gray is lossless), giving the decode path a
    * closed-form oracle: every pixel value is doc-id arithmetic. */
  def encodeGrayPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, ((x + 2L * y + seed) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** RIFF/WAVE header sniff (the audio dual of looksLikeImage). */
  def looksLikeWav(p: Array[Byte]): Boolean =
    p.length > 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** REAL audio decode via javax.sound.sampled — the JVM's WAV codec.
    * Returns (sampleRateHz, unsigned 8-bit PCM samples) or None for
    * payloads that are not decodable 8-bit PCM WAV (wrong magic, codec
    * error, or a sample format this path doesn't model). The format
    * guard matters: without it a 16-bit PCM file would "decode" into
    * interleaved little-endian byte halves silently posing as samples —
    * byte soup labeled as PCM. Signed 8-bit maps to unsigned by the
    * usual +128 offset; wider formats return None and take the
    * byte-fallback feature path (a converter via
    * AudioSystem.getAudioInputStream(target, in) would slot here). */
  def decodeWav(payload: Array[Byte]): Option[(Int, Array[Int])] =
    if (!looksLikeWav(payload)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        if (fmt.getSampleSizeInBits != 8 || !(signed || unsigned)) None
        else {
          val raw = in.readAllBytes()
          val off = if (signed) 0x80 else 0
          Some((fmt.getSampleRate.toInt, raw.map(b => (b & 0xff) ^ off)))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic 8-bit mono PCM WAV with sample(i) = (3i + seed) mod
    * 256 — a REAL javax.sound encode whose decode recovers the exact
    * samples (PCM is lossless), so every decoded value is closed-form
    * doc-id arithmetic for the SQL oracle. */
  def encodeWavPcm8(nSamples: Int, rateHz: Int, seed: Long): Array[Byte] =
    encodeWavPcm8Samples(
      Array.tabulate(nSamples)(i => ((3L * i + seed) % 256).toByte), rateHz)

  /** REAL multi-frame "video" decode via the JVM's animated-GIF codec —
    * an actual moving-picture container (LZW-compressed frame sequence)
    * the stock JDK can both write and read. Returns all frames, or None
    * for non-GIF/undecodable payloads. A production video path would
    * swap the GIF reader for an ffmpeg-style codec in the same slot;
    * the frame-sequence contract is identical. */
  def decodeGifFrames(payload: Array[Byte]): Option[IndexedSeq[BufferedImage]] =
    if (!(payload.length > 3 && payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F')) None
    else try {
      val reader = ImageIO.getImageReadersBySuffix("gif").next()
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        // a sniff-passing header with no decodable frames is garbage,
        // not an empty video
        if (n <= 0) None else Some((0 until n).map(reader.read))
      } finally { reader.dispose(); iis.close() }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic animated GIF: nFrames black/white frames with
    * pixel(x,y,f) = ((x + y + f + seed) mod 2) — a REAL ImageIO
    * sequence encode (2-color GIF is lossless), so every decoded frame
    * pixel is closed-form doc-id arithmetic. */
  def encodeGifAnim(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val writer = ImageIO.getImageWritersBySuffix("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    // MODE_DISABLED = no GIF interlacing: the JDK writer otherwise
    // emits interlaced frames whose row reassembly scrambles small
    // heights (observed: h=3 decoded rows [r0, blank, r1])
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_BINARY)
        val raster = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            raster.setSample(x, y, 0, ((x + y + f + seed) % 2).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Features from decoded PCM: FNV over samples + 16-bin block means —
    * the audio counterpart of decodedFeatures. */
  def decodedAudioFeatures(samples: Array[Int]): (Long, Array[Float]) = {
    var hsh = 1469598103934665603L
    val feat = new Array[Float](16)
    val cnt = new Array[Int](16)
    val n = math.max(1, samples.length)
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      hsh = (hsh ^ v) * 1099511628211L
      // long arithmetic: i * 16 wraps negative past ~134M samples (a
      // 2-hour clip) and would index feat() out of bounds
      val b = math.min(15, (i.toLong * 16 / n).toInt)
      feat(b) += v / 255.0f
      cnt(b) += 1
      i += 1
    }
    var j = 0
    while (j < 16) { if (cnt(j) > 0) feat(j) /= cnt(j); j += 1 }
    (hsh, feat)
  }

  /** Features from DECODED pixels: FNV over the raw samples (order-
    * sensitive content checksum) + 4×4 block-mean grid flattened to the
    * 16-dim embedding contract — the same output shape as the byte
    * fallback, so downstream phash/ANN code is agnostic to which path
    * produced the vector. */
  def decodedFeatures(img: BufferedImage): (Long, Array[Float]) =
    decodedVideoFeatures(Seq(img))

  /** Frame-sequence features: the per-frame pixel walk chains one FNV
    * checksum and accumulates one shared 4×4 block grid across ALL
    * frames — two clips sharing only their first frame therefore get
    * DIFFERENT checksums/embeddings (a frame-0-only shortcut would make
    * video near-dup detection blind past the poster frame). */
  def decodedVideoFeatures(frames: Seq[BufferedImage]): (Long, Array[Float]) = {
    var hsh = 1469598103934665603L
    val feat = new Array[Float](16)
    val cnt = new Array[Int](16)
    frames.foreach { img =>
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = raster.getSample(x, y, 0)
          hsh = (hsh ^ v) * 1099511628211L
          val b = (y * 4 / h) * 4 + (x * 4 / w)
          feat(b) += v / 255.0f
          cnt(b) += 1
          x += 1
        }
        y += 1
      }
    }
    var j = 0
    while (j < 16) { if (cnt(j) > 0) feat(j) /= cnt(j); j += 1 }
    (hsh, feat)
  }

  /** Byte-level fallback features for payloads WITHOUT a JVM codec
    * (audio/video in this container): a rolling checksum plus a 16-dim
    * byte-histogram-ish vector. Deterministic stand-in where an
    * audio/video codec would slot; image payloads take the real
    * decodeImage path in extractFeatures. */
  def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    var h = 1469598103934665603L
    val feat = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      h = (h ^ payload(i)) * 1099511628211L
      feat(i % 16) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    var j = 0
    while (j < 16) { feat(j) = feat(j) / math.max(1, payload.length / 16); j += 1 }
    (h, feat)
  }

  /** Batched per-partition feature extraction — the `mapInPandas` shape:
    * the iterator is consumed lazily per partition, per-partition setup
    * happens once. All three media kinds take REAL decodes: GIF payloads
    * the multi-frame codec (decodeGifFrames — checked FIRST, because
    * ImageIO.read on a GIF would silently decode only frame 0), other
    * images javax.imageio, WAV javax.sound. Payloads no JVM codec
    * accepts fall back to byte-level features. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup happens HERE (further codec init if needed;
      // ImageIO's plugin registry is already warm per-JVM)
      rows.map { r =>
        val (checksum, feat) = decodeGifFrames(r.payload) match {
          case Some(frames) => decodedVideoFeatures(frames)
          case None => decodeImage(r.payload) match {
            case Some(img) => decodedFeatures(img)
            case None => decodeWav(r.payload) match {
              case Some((_, samples)) => decodedAudioFeatures(samples)
              case None               => decodeStub(r.payload)
            }
          }
        }
        MediaFeature(r.media_id, r.meta.kind, r.payload.length, checksum, feat)
      }
    }
  }

  /** Metadata-only resize plan: pure column arithmetic — no payload
    * touch, no shuffle (the real decode+rescale would slot into the same
    * mapPartitions shape as extractFeatures). */
  def planResize(media: Dataset[MediaRow], maxSide: Int): DataFrame =
    media.toDF().select(
      col("media_id"), col("meta.kind").as("kind"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      least(lit(1.0),
        lit(maxSide) / greatest(col("meta.width"), col("meta.height")).cast("double")).as("scale"))

  /** Driver-judged query: the multimodal ingest path (binary payload +
    * typed metadata) with oracle-checkable facts — byte length and md5 of
    * the payload, media kind from the metadata struct. Proves the binary
    * column plumbing end-to-end (payload bytes == source text bytes). */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).toDF()
      .select(
        col("media_id"), col("meta.kind").as("kind"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("payload_md5"))
      .orderBy(col("media_id"))

  /** Driver-judged frame sampling: every-30th frame index per video row,
    * flattened to a comma string (the driver's comparer forbids top-level
    * arrays). sequence() is row-side and codegen'd — sampling plans never
    * touch payloads, let alone shuffle them. */
  def mediaFrames(spark: SparkSession, sfDir: String): DataFrame =
    sampleFrames(mediaTable(spark, sfDir), everyK = 30)
      .select(
        col("media_id"), col("n_frames"),
        array_join(col("frame_ids"), ",").as("frames"))
      .orderBy(col("media_id"))

  /** Driver-judged resize planning: per-media scale factor to fit a
    * 96-px bounding box, aspect preserved — metadata-only column
    * arithmetic (the decode+rescale slots into extractFeatures'
    * mapPartitions shape; the plan itself never touches payloads). */
  def mediaResize(spark: SparkSession, sfDir: String): DataFrame =
    planResize(mediaTable(spark, sfDir), maxSide = 96)
      .orderBy(col("media_id"))

  /** Driver-judged binary-asset dedup: exact duplicate media payloads
    * found by content hash over the BINARY column — the first pass of
    * any media-corpus dedup (near-dup embedding passes run only inside
    * these groups' complements). The fixture simulates a re-ingested
    * batch (same payloads under fresh ids — the everyday duplication
    * mode in asset pipelines), so every payload has ≥2 copies and the
    * canonical-id choice is exercised on every group. Hash-groupBy
    * shuffles 16-byte digests, never payloads. */
  def mediaDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val base = mediaTable(spark, sfDir).toDF()
    val reingested = base.withColumn("media_id", col("media_id") + lit(1000000000L))
    base.unionByName(reingested)
      .groupBy(md5(col("payload")).as("payload_md5"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(col("media_id")).as("canonical_id"))
      .filter(col("n_copies") > 1)
      .orderBy(col("payload_md5"))
  }

  /** 64-bit perceptual hash over the stub feature vector: each of the 16
    * features quantizes to a 4-bit bucket of its vector-normalized value,
    * GRAY-CODED so adjacent buckets differ in exactly one bit — small
    * payload perturbations (a re-encode, a metadata tweak) move few bits,
    * unrelated payloads differ in many. Deterministic pure function of
    * the feature vector (a real pHash would DCT decoded pixels in the
    * same slot). */
  def phashOf(feat: Array[Float]): Long = {
    var mn = Double.MaxValue; var mx = Double.MinValue
    feat.foreach { f => if (f < mn) mn = f; if (f > mx) mx = f }
    val span = math.max(mx - mn, 1e-9)
    var bits = 0L
    var j = 0
    while (j < feat.length) {
      // floor(x + 0.5), NOT math.round: JDK 7+ Math.round is exact
      // half-up (no double-rounding at the +0.5 add), while the SQL
      // oracle necessarily computes the FP add — mirror the FP form
      // here so both engines agree even in the half-ulp window below
      // a .5 boundary (the q_embed_quantize precedent)
      val b = math.min(15, math.max(0, math.floor((feat(j) - mn) / span * 15 + 0.5).toInt))
      val g = b ^ (b >> 1)
      bits |= g.toLong << (j * 4)
      j += 1
    }
    bits
  }

  /** Driver-judged perceptual near-dup detection (hash-checked since
    * round 8 — phashSql replays the float32 feature fold, the Gray
    * bucketing and the signed nibble packing in DuckDB) — the media
    * dual of SimHash text near-dup: corrupted re-encodes (payload + one
    * trailing byte under a fresh id — bytes differ, so content-hash
    * dedup CANNOT see the pair) are recovered by banded phash matching.
    * Scale shape: payloads never shuffle (phash computed in the same
    * mapPartitions pass as feature extraction); the self-join is a hash
    * EQUI-join on (band, 8-bit band value) carrying only (id, phash) —
    * candidates ∝ band-bucket occupancy, never |media|²; the Hamming
    * re-rank (xor + bit_count, codegen'd) filters candidates. Accuracy
    * is proven in MediaSpec (planted-pair recall + output bounds) — the
    * same rows-only + spec treatment as LSH/minhash. */
  def phashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = mediaTable(spark, sfDir)
    val corrupted = base.toDF()
      .select((col("media_id") + lit(1000000000L)).as("media_id"), col("meta"),
        concat(col("payload"), lit(" ").cast("binary")).as("payload"))
      .as[MediaRow]
    val sig = extractFeatures(base.unionByName(corrupted))
      .map(f => (f.media_id, phashOf(f.embedding)))
      .toDF("media_id", "phash")
    val bands = sig.select(col("media_id"), col("phash"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("b"),
          shiftright(col("phash"), b * 8).bitwiseAND(lit(255L)).as("v"))): _*)).as("band"))
      .select(col("media_id"), col("phash"), col("band.b"), col("band.v"))
    val l = bands.select(col("media_id").as("id_a"), col("phash").as("pa"), col("b"), col("v"))
    val r = bands.select(col("media_id").as("id_b"), col("phash").as("pb"), col("b"), col("v"))
    l.join(r, Seq("b", "v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(pa ^ pb)").cast("int").as("hamming"))
      .distinct() // a pair can agree on several bands
      .filter(col("hamming") <= 4)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Fixture of REAL encoded images: one deterministic grayscale PNG per
    * document id (dims and pixels are closed-form doc-id arithmetic).
    * Encoded per-partition — payload generation is a narrow transform,
    * exactly where real ingest would read object-store blobs. */
  def imageTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (8 + (id % 8) * 4).toInt
          val h = (8 + (id % 5) * 4).toInt
          MediaRow(id, MediaMeta("image", w, h, 0, 1), encodeGrayPng(w, h, id))
        }
      }
  }

  /** Driver-judged REAL image decode: every payload is a genuine PNG
    * (imageTable); javax.imageio decodes it and we report the decoded
    * dimensions plus the four corner pixels — each a closed-form function
    * of doc_id, so DuckDB checks the decode bit-for-bit without any image
    * library. Proves an actual codec sits in the mapPartitions slot, not
    * a byte-shuffling fake. Payloads never shuffle: encode → decode →
    * project is one narrow pipeline per partition. */
  def imageDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    imageTable(spark, sfDir)
      .mapPartitions { rows =>
        rows.map { r =>
          val img = decodeImage(r.payload).getOrElse(throw new IllegalStateException(
            s"media ${r.media_id}: payload is not a decodable image"))
          val w = img.getWidth
          val h = img.getHeight
          val ras = img.getRaster
          (r.media_id, w, h,
            ras.getSample(0, 0, 0), ras.getSample(w - 1, 0, 0),
            ras.getSample(0, h - 1, 0), ras.getSample(w - 1, h - 1, 0))
        }
      }
      .toDF("media_id", "width", "height", "px00", "px10", "px01", "px11")
      .orderBy(col("media_id"))
  }

  /** Deterministic 8-bit grayscale JPEG that round-trips EXACTLY: at
    * compression quality 1.0 the writer's scaled Annex-K quantization
    * table degenerates to all ones, and with every 8×8 block held
    * CONSTANT the forward DCT carries only the DC coefficient (the AC
    * terms are exact zeros up to ~1e-13 float dust, which the ÷1
    * quantization rounds away) — so decode reconstructs each block's
    * value bit-for-bit and the oracle stays closed-form doc-id
    * arithmetic despite a lossy codec. Grayscale avoids the YCbCr
    * conversion + chroma subsampling that would break exactness;
    * dimensions stay multiples of 8 so no edge block is padded. */
  def encodeGrayJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0, "JPEG fixture dims must be 8-aligned")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, ((37L * (x / 8) + 59L * (y / 8) + seed) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Fixture of REAL encoded JPEG images (the dominant web image format
    * — the PNG battery's lossy sibling): one per document id, block
    * value(bx, by) = (37·bx + 59·by + id) mod 256 in an
    * (8·(2 + id%3)) × (8·(1 + id%2)) grid. */
  def jpegTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (8 * (2 + id % 3)).toInt
          val h = (8 * (1 + id % 2)).toInt
          MediaRow(id, MediaMeta("image", w, h, 0, 1), encodeGrayJpeg(w, h, id))
        }
      }
  }

  /** Driver-judged REAL JPEG decode: javax.imageio's JPEG reader (magic
    * ff d8) decodes each payload; we report decoded dims, the four
    * corner pixels, and the exact pixel sum — all closed-form block
    * arithmetic for DuckDB (see encodeGrayJpeg for why a lossy codec
    * admits an exact oracle here). Same narrow no-shuffle pipeline as
    * q_image_decode. */
  def imageJpeg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    jpegTable(spark, sfDir)
      .mapPartitions { rows =>
        rows.map { r =>
          require(r.payload.length > 3 &&
            (r.payload(0) & 0xff) == 0xff && (r.payload(1) & 0xff) == 0xd8,
            s"media ${r.media_id}: payload is not JPEG")
          val img = decodeImage(r.payload).getOrElse(throw new IllegalStateException(
            s"media ${r.media_id}: payload is not a decodable image"))
          val w = img.getWidth
          val h = img.getHeight
          val ras = img.getRaster
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += ras.getSample(x, y, 0); x += 1 }
            y += 1
          }
          (r.media_id, w, h,
            ras.getSample(0, 0, 0), ras.getSample(w - 1, 0, 0),
            ras.getSample(0, h - 1, 0), ras.getSample(w - 1, h - 1, 0), sum)
        }
      }
      .toDF("media_id", "width", "height", "px00", "px10", "px01", "px11", "sum_px")
      .orderBy(col("media_id"))
  }

  /** Fixture of REAL encoded WAV audio: one deterministic 8-bit PCM
    * clip per document id (length, rate and every sample are closed-form
    * doc-id arithmetic). */
  def audioTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = (800 + (id % 5) * 200).toInt
          val rate = (8000 + (id % 3) * 4000).toInt
          MediaRow(id, MediaMeta("audio", 0, 0, rate, 1), encodeWavPcm8(n, rate, id))
        }
      }
  }

  /** Driver-judged REAL audio decode — the WAV dual of imageDecode:
    * every payload is a genuine RIFF/WAVE file; javax.sound decodes it
    * and we report frame count, sample rate, and first/last PCM samples
    * — all closed-form doc-id arithmetic, DuckDB-checkable without an
    * audio library. */
  def audioDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    audioTable(spark, sfDir)
      .mapPartitions { rows =>
        rows.map { r =>
          val (rate, samples) = decodeWav(r.payload).getOrElse(
            throw new IllegalStateException(
              s"media ${r.media_id}: payload is not decodable WAV"))
          (r.media_id, samples.length.toLong, rate,
            samples.head, samples.last)
        }
      }
      .toDF("media_id", "n_samples", "sample_rate", "s_first", "s_last")
      .orderBy(col("media_id"))
  }

  /** Fixture of REAL multi-frame video (animated GIF): one deterministic
    * clip per document id — frame count, dims and every pixel are
    * closed-form doc-id arithmetic. */
  def videoTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (8 + (id % 3) * 4).toInt
          val h = (8 + (id % 2) * 4).toInt
          val n = (2 + (id % 4)).toInt
          MediaRow(id, MediaMeta("video", w, h, 0, n), encodeGifAnim(w, h, n, id))
        }
      }
  }

  /** Driver-judged REAL video decode — the frame-sequence dual of
    * imageDecode: every payload is a genuine animated GIF; the codec
    * decodes all frames and we report the frame count, dims, and probe
    * pixels of the FIRST and LAST frames — closed-form doc-id
    * arithmetic, DuckDB-checkable with no media library. Frame sampling
    * (q_media_frames) plans over the same counts; this proves the
    * frames themselves decode. */
  def videoDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    videoTable(spark, sfDir)
      .mapPartitions { rows =>
        rows.map { r =>
          val frames = decodeGifFrames(r.payload).getOrElse(
            throw new IllegalStateException(
              s"media ${r.media_id}: payload is not a decodable GIF"))
          val f0 = frames.head
          val fl = frames.last
          val w = f0.getWidth
          val h = f0.getHeight
          (r.media_id, frames.length, w, h,
            f0.getRGB(0, 0) & 0xff,
            fl.getRGB(w - 1, h - 1) & 0xff)
        }
      }
      .toDF("media_id", "n_frames", "width", "height", "px_first", "px_last")
      .orderBy(col("media_id"))
  }

  /** Shared WAV writer for caller-supplied 8-bit PCM (encodeWavPcm8's
    * container path with the sample formula factored out). */
  def encodeWavPcm8Samples(pcm: Array[Byte], rateHz: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      rateHz.toFloat, 8, 1, 1, rateHz.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, pcm.length.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Amplitude-modulated VAD fixture: every third frame ((f + id) % 3 =
    * 0) carries the loud sawtooth (3i+id) mod 256, the rest sit near
    * the 128 midline with ±2 of "room tone" — real RIFF/WAVE payloads
    * whose every decoded sample is closed-form doc-id arithmetic for
    * the SQL oracle (the audioTable contract, modulated). */
  private[multimodal] val VAD_W = 160
  private[multimodal] val VAD_THRESH = 100000L
  def audioVadTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = (1600 + (id % 5) * 320).toInt
          val pcm = new Array[Byte](n)
          var i = 0
          while (i < n) {
            val f = i / VAD_W
            val s = if ((f + id) % 3 == 0) ((3L * i + id) % 256).toInt
            else 128 + (i % 3)
            pcm(i) = s.toByte
            i += 1
          }
          MediaRow(id, MediaMeta("audio", 0, 0, 16000, 1),
            encodeWavPcm8Samples(pcm, 16000))
        }
      }
  }

  /** VOICE-ACTIVITY SEGMENTATION over real decoded PCM — the ASR
    * training-data primitive after q_audio_decode's codec check: frame
    * the samples at VAD_W (10 ms at 16 kHz), per-frame energy =
    * Σ (s−128)² (exact BIGINT), threshold into voiced/unvoiced, then
    * gaps-and-islands (f − row_number per (media, voiced) — the
    * q_sessionize idiom on a frame axis) for voiced-run structure.
    * Judged output per clip: frame/voiced counts, voiced-run count,
    * longest run, total energy — the segmentation manifest an audio
    * pipeline materializes before cutting training clips.
    *
    * Scale shape: decode + framing are narrow per-partition transforms
    * (payloads never shuffle — the Media topology); only fixed-width
    * (media, frame, energy) rows enter the window, partitioned BY
    * MEDIA ID so island detection is per-clip local, never global. */
  def audioVad(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val energies = audioVadTable(spark, sfDir).mapPartitions { rows =>
      rows.flatMap { r =>
        val (_, samples) = decodeWav(r.payload).getOrElse(
          throw new IllegalStateException(
            s"media ${r.media_id}: payload is not decodable WAV"))
        val nf = samples.length / VAD_W
        (0 until nf).iterator.map { f =>
          var e = 0L
          var k = 0
          while (k < VAD_W) {
            val d = samples(f * VAD_W + k) - 128L
            e += d * d
            k += 1
          }
          (r.media_id, f, e)
        }
      }
    }.toDF("media_id", "f", "energy")
    val isl = energies
      .withColumn("voiced", col("energy") >= VAD_THRESH)
      .withColumn("grp", col("f") - row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("media_id"), col("voiced")).orderBy(col("f"))))
    val runs = isl.filter(col("voiced"))
      .groupBy(col("media_id"), col("grp")).agg(count(lit(1)).as("run_len"))
    val perRun = runs.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_voiced_runs"),
        max(col("run_len")).as("longest_voiced_run"))
    isl.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("voiced"), 1L).otherwise(0L)).as("n_voiced"),
        sum(col("energy")).as("sum_energy"))
      .join(perRun, Seq("media_id"), "left_outer")
      .select(col("media_id"), col("n_frames"), col("n_voiced"),
        coalesce(col("n_voiced_runs"), lit(0L)).as("n_voiced_runs"),
        coalesce(col("longest_voiced_run"), lit(0L)).as("longest_voiced_run"),
        col("sum_energy"))
      .orderBy(col("media_id"))
  }

  /** REAL AUDIO RESAMPLE — integer-factor decimation (rate/2), the ASR
    * preprocessing primitive after decode: decode the WAV fixture,
    * keep every 2nd sample, RE-ENCODE the result as a real RIFF/WAVE
    * at the halved rate, re-DECODE it, and report from the re-decoded
    * samples — a codec chain in both directions, so a broken writer or
    * reader fails the gate. decimated(j) = sample(2j) = (6j + id) mod
    * 256: every judged value stays closed-form. (Proper anti-alias
    * decimation would convolve a low-pass first; on this synthetic
    * sawtooth the judged contract is the INDEX arithmetic — a filter
    * would slot into the same per-partition map.) Narrow per-partition
    * pipeline; payloads never shuffle. */
  def audioResample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    audioTable(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val (rateIn, samples) = decodeWav(r.payload).getOrElse(
          throw new IllegalStateException(
            s"media ${r.media_id}: payload is not decodable WAV"))
        val out = Array.tabulate(samples.length / 2)(j => samples(2 * j).toByte)
        val reEncoded = encodeWavPcm8Samples(out, rateIn / 2)
        val (rateOut, back) = decodeWav(reEncoded).getOrElse(
          throw new IllegalStateException(
            s"media ${r.media_id}: re-encoded WAV failed to decode"))
        var sum = 0L
        var j = 0
        while (j < back.length) { sum += back(j); j += 1 }
        (r.media_id, samples.length, back.length, rateIn, rateOut,
          back(0), back(back.length - 1), sum)
      }
    }.toDF("media_id", "n_in", "n_out", "rate_in", "rate_out",
        "s_first", "s_last", "sum_samples")
      .orderBy(col("media_id"))
  }

  /** REAL IMAGE RESIZE — nearest-neighbor 2× downscale over the decoded
    * PNG fixture, then a lossless PNG re-encode + re-decode (same
    * both-directions codec-chain contract as audioResample): out(x,y) =
    * src(2x, 2y) = (2x + 4y + id) mod 256, so dims, corners, and the
    * full pixel sum are closed-form. The production swap-in is an area
    * or Lanczos kernel in the same mapPartitions slot; judged here is
    * the index arithmetic + codec chain. */
  def imageResize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    imageTable(spark, sfDir).mapPartitions { rows =>
      rows.map { r =>
        val img = decodeImage(r.payload).getOrElse(throw new IllegalStateException(
          s"media ${r.media_id}: payload is not a decodable image"))
        val (w2, h2) = (img.getWidth / 2, img.getHeight / 2)
        val small = new BufferedImage(w2, h2, BufferedImage.TYPE_BYTE_GRAY)
        val src = img.getRaster
        val dst = small.getRaster
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) { dst.setSample(x, y, 0, src.getSample(2 * x, 2 * y, 0)); x += 1 }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(small, "png", bos)
        val back = decodeImage(bos.toByteArray).getOrElse(
          throw new IllegalStateException(
            s"media ${r.media_id}: re-encoded PNG failed to decode"))
        val ras = back.getRaster
        var sum = 0L
        y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) { sum += ras.getSample(x, y, 0); x += 1 }
          y += 1
        }
        (r.media_id, back.getWidth, back.getHeight,
          ras.getSample(0, 0, 0), ras.getSample(w2 - 1, h2 - 1, 0), sum)
      }
    }.toDF("media_id", "width", "height", "px00", "px11", "sum_px")
      .orderBy(col("media_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_audio_resample"  -> audioResample,
    "q_image_resize"    -> imageResize,
    "q_audio_vad"       -> audioVad,
    "q_image_decode"    -> imageDecode,
    "q_image_jpeg"      -> imageJpeg,
    "q_audio_decode"    -> audioDecode,
    "q_video_decode"    -> videoDecode,
    "q_media_phash"     -> phashPairs,
    "q_media_dedup"     -> mediaDedup,
    "q_media_meta"      -> mediaMeta,
    "q_media_frames"    -> mediaFrames,
    "q_media_resize"    -> mediaResize,
    "q_batch_inference" -> batchInference)

  /** Mirror of phashPairs over the text-payload fixture, arithmetic
    * replayed END-TO-END in SQL: decodeStub's byte features are FLOAT32
    * accumulations (REAL-cast at every add — IEEE float32 is the same
    * arithmetic in the JVM and DuckDB), the bucket rounding is the FP
    * floor(x+0.5) BOTH sides compute identically (phashOf mirrors it;
    * JDK Math.round's exact half-up and DuckDB round() can each differ
    * from the FP add in the half-ulp window), the Gray-coded nibble
    * packing reproduces the JVM's SIGNED 64-bit wrap (g₁₅ << 60 sets the
    * sign bit; naive g·2⁶⁰ addition overflows DuckDB's checked BIGINT),
    * and band extraction relies on arithmetic-shift-then-mask yielding
    * the original byte for negative hashes in both engines. This retires
    * the last rows-only judged row. */
  private lazy val phashSql: String = {
    val fcols = (0 until 16).map { k =>
      s"""CAST(list_reduce([CAST(0.0 AS REAL)] || list_transform(
         |      range(${k + 1}, strlen(text) + 1, 16),
         |      i -> CAST(unicode(text[CAST(i AS INT)]) AS REAL) / CAST(255.0 AS REAL)),
         |    (a, b) -> CAST(a + b AS REAL))
         |  / CAST(greatest(1, strlen(text) // 16) AS REAL) AS REAL) AS f$k""".stripMargin
    }.mkString(",\n         ")
    val fs = (0 until 16).map(k => s"CAST(f$k AS DOUBLE)").mkString(", ")
    def g(j: Int) = {
      val b = s"least(15, greatest(0, CAST(floor((CAST(f$j AS DOUBLE) - mn) / span * 15 + 0.5) AS BIGINT)))"
      s"xor($b, $b // 2)"
    }
    val low = (0 until 15).map(j => s"${g(j)} * ${1L << (4 * j)}").mkString(" + ")
    val top = s"(CASE WHEN ${g(15)} >= 8 THEN ${g(15)} - 16 ELSE ${g(15)} END) * ${1L << 60}"
    s"""WITH docs AS (
         SELECT doc_id AS media_id, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000000, text || ' ' FROM documents),
       f AS (SELECT media_id, $fcols FROM docs),
       s AS (SELECT *, least($fs) AS mn,
         greatest(greatest($fs) - least($fs), 1e-9) AS span FROM f),
       p AS (SELECT media_id, $low + $top AS phash FROM s),
       bands AS (
         SELECT media_id, phash, b, (phash >> (8 * b)) & 255 AS v
         FROM p CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6), (7)) t(b)),
       cand AS (
         SELECT DISTINCT l.media_id AS id_a, r.media_id AS id_b,
           CAST(bit_count(xor(l.phash, r.phash)) AS INT) AS hamming
         FROM bands l JOIN bands r
           ON l.b = r.b AND l.v = r.v AND l.media_id < r.media_id)
       SELECT id_a, id_b, hamming FROM cand
       WHERE hamming <= 4 ORDER BY id_a, id_b"""
  }

  val oracle: Map[String, String] = Map(
    // decimated(j) = (6j + id) mod 256 over n/2 samples at rate/2
    "q_audio_resample" ->
      """WITH g AS (
           SELECT doc_id,
             CAST(800 + (doc_id % 5) * 200 AS BIGINT) AS n_in,
             CAST(8000 + (doc_id % 3) * 4000 AS INT) AS rate_in
           FROM documents),
         s AS (
           SELECT g.doc_id,
             CAST(sum((6 * j.range + g.doc_id) % 256) AS BIGINT) AS sum_samples
           FROM g, range(0, 800) j
           WHERE j.range < g.n_in // 2
           GROUP BY 1)
         SELECT g.doc_id AS media_id,
           CAST(g.n_in AS INT) AS n_in,
           CAST(g.n_in // 2 AS INT) AS n_out,
           g.rate_in,
           CAST(g.rate_in // 2 AS INT) AS rate_out,
           CAST(g.doc_id % 256 AS INT) AS s_first,
           CAST((6 * (g.n_in // 2 - 1) + g.doc_id) % 256 AS INT) AS s_last,
           s.sum_samples
         FROM g JOIN s USING (doc_id) ORDER BY media_id""",
    // out(x,y) = (2x + 4y + id) mod 256 in a (w/2) × (h/2) grid
    "q_image_resize" ->
      """WITH g AS (
           SELECT doc_id,
             CAST((8 + (doc_id % 8) * 4) // 2 AS BIGINT) AS w2,
             CAST((8 + (doc_id % 5) * 4) // 2 AS BIGINT) AS h2
           FROM documents),
         s AS (
           SELECT g.doc_id,
             CAST(sum((2 * x.range + 4 * y.range + g.doc_id) % 256) AS BIGINT) AS sum_px
           FROM g, range(0, 18) x, range(0, 12) y
           WHERE x.range < g.w2 AND y.range < g.h2
           GROUP BY 1)
         SELECT g.doc_id AS media_id,
           CAST(g.w2 AS INT) AS width,
           CAST(g.h2 AS INT) AS height,
           CAST(g.doc_id % 256 AS INT) AS px00,
           CAST((2 * (g.w2 - 1) + 4 * (g.h2 - 1) + g.doc_id) % 256 AS INT) AS px11,
           s.sum_px
         FROM g JOIN s USING (doc_id) ORDER BY media_id""",
    // closed-form sample reconstruction ((3i+id) mod 256 loud frames,
    // 128 + i mod 3 room tone), same energy integers, same
    // gaps-and-islands row_number arithmetic.
    "q_audio_vad" ->
      s"""WITH ids AS (SELECT doc_id AS media_id FROM documents),
         frames AS MATERIALIZED (
           SELECT media_id, CAST(f.range AS INT) AS f
           FROM ids, range(0, 18) f
           WHERE f.range < (1600 + (media_id % 5) * 320) // $VAD_W),
         energy AS MATERIALIZED (
           SELECT fr.media_id, fr.f,
             CAST(sum(CASE WHEN (fr.f + fr.media_id) % 3 = 0
               THEN ((3 * (fr.f * $VAD_W + k.range) + fr.media_id) % 256 - 128)
                    * ((3 * (fr.f * $VAD_W + k.range) + fr.media_id) % 256 - 128)
               ELSE ((fr.f * $VAD_W + k.range) % 3)
                    * ((fr.f * $VAD_W + k.range) % 3)
               END) AS BIGINT) AS energy
           FROM frames fr, range(0, $VAD_W) k GROUP BY 1, 2),
         isl AS MATERIALIZED (
           SELECT media_id, f, energy, energy >= $VAD_THRESH AS voiced,
             f - row_number() OVER (
               PARTITION BY media_id, energy >= $VAD_THRESH ORDER BY f) AS grp
           FROM energy),
         runs AS (
           SELECT media_id, grp, CAST(count(*) AS BIGINT) AS run_len
           FROM isl WHERE voiced GROUP BY 1, 2),
         pr AS (
           SELECT media_id, CAST(count(*) AS BIGINT) AS n_voiced_runs,
             CAST(max(run_len) AS BIGINT) AS longest_voiced_run
           FROM runs GROUP BY 1),
         per AS (
           SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
             CAST(count(*) FILTER (voiced) AS BIGINT) AS n_voiced,
             CAST(sum(energy) AS BIGINT) AS sum_energy
           FROM isl GROUP BY 1)
         SELECT p.media_id, p.n_frames, p.n_voiced,
           coalesce(r.n_voiced_runs, 0) AS n_voiced_runs,
           coalesce(r.longest_voiced_run, 0) AS longest_voiced_run,
           p.sum_energy
         FROM per p LEFT JOIN pr r USING (media_id)
         ORDER BY p.media_id""",
    "q_media_phash" -> phashSql,
    // pixel(x,y,f) = ((x + y + f + id) mod 2) * 255 in a
    // (8 + id%3*4) × (8 + id%2*4), (2 + id%4)-frame animated GIF
    "q_video_decode" ->
      """SELECT doc_id AS media_id,
         CAST(2 + (doc_id % 4) AS INT) AS n_frames,
         CAST(8 + (doc_id % 3) * 4 AS INT) AS width,
         CAST(8 + (doc_id % 2) * 4 AS INT) AS height,
         CAST((doc_id % 2) * 255 AS INT) AS px_first,
         CAST(((8 + (doc_id % 3) * 4 - 1) + (8 + (doc_id % 2) * 4 - 1)
               + (2 + (doc_id % 4) - 1) + doc_id) % 2 * 255 AS INT) AS px_last
         FROM documents ORDER BY media_id""",
    // sample(i) = (3i + id) mod 256 in an (800 + id%5*200)-frame 8-bit
    // PCM WAV at (8000 + id%3*4000) Hz — all pure id arithmetic
    "q_audio_decode" ->
      """SELECT doc_id AS media_id,
         CAST(800 + (doc_id % 5) * 200 AS BIGINT) AS n_samples,
         CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
         CAST(doc_id % 256 AS INT) AS s_first,
         CAST((3 * (800 + (doc_id % 5) * 200 - 1) + doc_id) % 256 AS INT) AS s_last
         FROM documents ORDER BY media_id""",
    // pixel(x,y) = (x + 2y + id) mod 256 in a (8 + id%8*4) × (8 + id%5*4)
    // gray PNG — decoded dims and corner samples are pure id arithmetic
    "q_image_decode" ->
      """SELECT doc_id AS media_id,
         CAST(8 + (doc_id % 8) * 4 AS INT) AS width,
         CAST(8 + (doc_id % 5) * 4 AS INT) AS height,
         CAST(doc_id % 256 AS INT) AS px00,
         CAST((8 + (doc_id % 8) * 4 - 1 + doc_id) % 256 AS INT) AS px10,
         CAST((2 * (8 + (doc_id % 5) * 4 - 1) + doc_id) % 256 AS INT) AS px01,
         CAST((8 + (doc_id % 8) * 4 - 1 + 2 * (8 + (doc_id % 5) * 4 - 1) + doc_id) % 256 AS INT) AS px11
         FROM documents ORDER BY media_id""",
    // block(bx, by) = (37·bx + 59·by + id) mod 256 in a
    // (2 + id%3) × (1 + id%2) block grid of constant 8×8 blocks; the
    // quality-1.0 round-trip is exact (see encodeGrayJpeg), so corners
    // and the 64·Σblock pixel sum are pure doc-id arithmetic.
    "q_image_jpeg" ->
      """WITH g AS (
           SELECT doc_id,
             CAST(2 + doc_id % 3 AS BIGINT) AS nbx,
             CAST(1 + doc_id % 2 AS BIGINT) AS nby
           FROM documents),
         s AS (
           SELECT g.doc_id,
             CAST(64 * sum((37 * bx.range + 59 * by.range + g.doc_id) % 256) AS BIGINT) AS sum_px
           FROM g, range(0, 4) bx, range(0, 2) by
           WHERE bx.range < g.nbx AND by.range < g.nby
           GROUP BY 1)
         SELECT g.doc_id AS media_id,
           CAST(8 * g.nbx AS INT) AS width,
           CAST(8 * g.nby AS INT) AS height,
           CAST(g.doc_id % 256 AS INT) AS px00,
           CAST((37 * (g.nbx - 1) + g.doc_id) % 256 AS INT) AS px10,
           CAST((59 * (g.nby - 1) + g.doc_id) % 256 AS INT) AS px01,
           CAST((37 * (g.nbx - 1) + 59 * (g.nby - 1) + g.doc_id) % 256 AS INT) AS px11,
           s.sum_px
         FROM g JOIN s USING (doc_id) ORDER BY media_id""",
    "q_media_dedup" ->
      """SELECT md5(text) AS payload_md5,
         count(*) AS n_copies,
         min(doc_id) AS canonical_id
         FROM (SELECT doc_id, text FROM documents
               UNION ALL
               SELECT doc_id + 1000000000, text FROM documents)
         GROUP BY 1 HAVING count(*) > 1
         ORDER BY payload_md5""",
    "q_batch_inference" ->
      """WITH h AS (SELECT doc_id, md5(text) AS x FROM documents)
         SELECT doc_id,
           CAST(('0x' || substr(x,  1, 8)) AS BIGINT) / 4294967296.0 AS score0,
           CAST(('0x' || substr(x,  9, 8)) AS BIGINT) / 4294967296.0 AS score1,
           CAST(('0x' || substr(x, 17, 8)) AS BIGINT) / 4294967296.0 AS score2,
           CAST(('0x' || substr(x, 25, 8)) AS BIGINT) / 4294967296.0 AS score3,
           CASE WHEN CAST(('0x' || substr(x, 1, 8)) AS BIGINT) / 4294967296.0 > 0.5
                THEN 'pos' ELSE 'neg' END AS label
         FROM h ORDER BY doc_id""",
    "q_media_resize" ->
      """SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(64 + (doc_id % 8) * 16 AS INT) AS width,
         CAST(64 + (doc_id % 5) * 16 AS INT) AS height,
         least(1.0, 96 / CAST(greatest(64 + (doc_id % 8) * 16,
                                       64 + (doc_id % 5) * 16) AS DOUBLE)) AS scale
         FROM documents ORDER BY media_id""",
    "q_media_meta" ->
      """SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(strlen(text) AS INT) AS n_bytes,
         md5(text) AS payload_md5
         FROM documents ORDER BY media_id""",
    // video rows: nFrames = 1 + (len % 120); Spark sequence(0, n-1, 30)
    // == DuckDB range(0, n, 30) (both stop at the last index < n)
    "q_media_frames" ->
      """SELECT doc_id AS media_id,
         CAST(1 + (strlen(text) % 120) AS INT) AS n_frames,
         array_to_string(range(0, 1 + (strlen(text) % 120), 30), ',') AS frames
         FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""")

  case class DocScore(doc_id: Long, score0: Double, score1: Double,
      score2: Double, score3: Double, label: String)

  /** Driver-judged batch model inference — the shape every embedding /
    * classifier / reward-model pass over training data takes: a typed
    * mapPartitions where MODEL SETUP HAPPENS ONCE PER PARTITION and rows
    * stream through in batches (the Scala dual of mapInPandas; at 100 TB
    * this is the only shape that amortizes model load and keeps payloads
    * from shuffling). The "model" is a deterministic md5-based stub (no
    * ML runtime in this sandbox) so the output is DuckDB-oracle-checkable
    * bit-for-bit: four [0,1) scores from md5 nibble slices + an argmax-ish
    * label. A real encoder slots in at the marked line with zero plan
    * changes. */
  def batchInference(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        // once-per-partition setup — a real impl loads the model HERE
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, text) =>
          val hex = md.digest(text.getBytes(StandardCharsets.UTF_8))
            .map("%02x".format(_)).mkString
          def s(i: Int): Double =
            java.lang.Long.parseLong(hex.substring(i * 8, i * 8 + 8), 16) / 4294967296.0
          DocScore(id, s(0), s(1), s(2), s(3), if (s(0) > 0.5) "pos" else "neg")
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame sampling plan for video rows: every k-th frame index, computed
    * with sequence() — row-side, codegen'd, no UDF. */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): DataFrame =
    media.toDF()
      .filter(col("meta.kind") === "video")
      .select(
        col("media_id"), col("meta.nFrames").as("n_frames"),
        sequence(lit(0), col("meta.nFrames") - 1, lit(everyK)).as("frame_ids"))
}
