package graft.table

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.{Path => HPath}

/** Deletion-vector bitmap codec (Iceberg v3 direction: one compact
  * bitmap of deleted row positions PER DATA FILE, superseding the
  * one-parquet-per-delete-commit positional files of v2 — see
  * /root/reference/README.md:177, which pins format-version 2; DVs are
  * the format's published next step).
  *
  * Layout is roaring-style (the published RoaringBitmap container
  * design): positions are split on bit 16 — the high bits key a
  * container, the low 16 bits live in it as either a sorted u16 ARRAY
  * (sparse: ≤ 4096 values, 2 bytes each) or a 65536-bit BITMAP (dense:
  * fixed 8 KiB). A single deleted row in a 10M-row file costs ~20
  * bytes; a fully-deleted 10M-row file costs ~1.2 MiB — both far under
  * one (file_path, pos) parquet row per position, and O(1) files per
  * data file regardless of how many delete commits occurred.
  *
  * Serialized form: magic "GDV1", container count, then per container
  * `highBits: Long, kind: Byte (0=array | 1=bitmap), count: Int,
  * payload`. Containers and their values are sorted, so decode yields
  * ascending positions and the format is canonical (equal sets ⇒ equal
  * bytes — lets tests compare artifacts byte-wise).
  */
object Dv {

  private val Magic = 0x47445631 // "GDV1"
  private val ArrayMax = 4096

  /** Canonical bytes for a set of row positions (deduped, any order). */
  def serialize(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    require(sorted.headOption.forall(_ >= 0), "row positions must be >= 0")
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    // group ascending positions into runs sharing (pos >>> 16)
    val containers = scala.collection.mutable.ArrayBuffer[(Long, Array[Int])]()
    var i = 0
    while (i < sorted.length) {
      val hi = sorted(i) >>> 16
      var j = i
      while (j < sorted.length && (sorted(j) >>> 16) == hi) j += 1
      containers += hi -> java.util.Arrays.copyOfRange(sorted, i, j)
        .map(p => (p & 0xffffL).toInt)
      i = j
    }
    out.writeInt(containers.size)
    containers.foreach { case (hi, lows) =>
      out.writeLong(hi)
      if (lows.length <= ArrayMax) {
        out.writeByte(0); out.writeInt(lows.length)
        lows.foreach(v => out.writeShort(v))
      } else {
        out.writeByte(1); out.writeInt(lows.length)
        val words = new Array[Long](1024) // 65536 bits
        lows.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        words.foreach(out.writeLong)
      }
    }
    out.flush()
    bos.toByteArray
  }

  /** Ascending positions of `bytes` (inverse of serialize). */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a GDV1 deletion vector")
    val nc = in.readInt()
    val acc = scala.collection.mutable.ArrayBuffer[Long]()
    (0 until nc).foreach { _ =>
      val hi = in.readLong()
      val kind = in.readByte()
      val count = in.readInt()
      kind match {
        case 0 =>
          (0 until count).foreach(_ => acc += (hi << 16) | (in.readShort() & 0xffffL))
        case 1 =>
          val words = Array.fill(1024)(in.readLong())
          var v = 0
          while (v < 65536) {
            if ((words(v >>> 6) & (1L << (v & 63))) != 0) acc += (hi << 16) | v
            v += 1
          }
        case k => throw new IllegalStateException(s"unknown DV container kind $k")
      }
    }
    acc.toArray
  }

  def write(p: HPath, positions: Array[Long]): Unit =
    GraftIO.write(p, serialize(positions))

  def read(p: HPath): Array[Long] = deserialize(GraftIO.readAllBytes(p))

  /** Union — the v3 writer obligation: a new DV for a file must include
    * every position of the DV it supersedes. */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    (a ++ b).distinct.sorted
}
