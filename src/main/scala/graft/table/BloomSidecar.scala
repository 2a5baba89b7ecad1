package graft.table

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Per-data-file Bloom filter SIDECARS for equality-predicate data
  * skipping (Iceberg stores the same structure inside the parquet
  * footer; a sidecar keeps our writer stock-Spark). Min/max stats
  * cannot prune point lookups once file key ranges overlap — after a
  * few unsorted appends every file spans the whole key space and a
  * `WHERE k = ?` reads all of them. A ~0.1-bit-per-distinct-key Bloom
  * answers "definitely not in this file" per file, so a point lookup
  * opens O(1) files instead of O(all).
  *
  * Scale design: blooms live NEXT TO the data files, not in the
  * metadata document — the manifest carries only the sidecar path, so
  * table metadata stays O(files), every reader does NOT pay the bloom
  * bytes, and a sidecar is read lazily only when a planed file faces an
  * equality predicate on an indexed column (then cached process-wide:
  * sidecars, like data files, are immutable once written).
  *
  * Format: `[int n] n × [UTF col, int len, len × bloom bytes]` using
  * spark.util.sketch.BloomFilter's own serialization. */
object BloomSidecar {

  /** Only types with a canonical long/UTF8 hash embedding are indexed —
    * the put and the probe must hash identically. */
  def eligible(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType => true
    case _ => false
  }

  /** Row value → bloom (write side). */
  def put(bf: BloomFilter, v: Any): Unit = v match {
    case i: java.lang.Integer => bf.putLong(i.longValue())
    case l: java.lang.Long    => bf.putLong(l.longValue())
    case s: java.lang.Short   => bf.putLong(s.longValue())
    case b: java.lang.Byte    => bf.putLong(b.longValue())
    case s: String            => bf.putString(s)
    case _                    => ()
  }

  /** Pushed equality literal → membership probe (read side). True for
    * unprobeable types: pruning must stay conservative. */
  def mightContain(bf: BloomFilter, v: Any): Boolean = v match {
    case i: java.lang.Integer => bf.mightContainLong(i.longValue())
    case l: java.lang.Long    => bf.mightContainLong(l.longValue())
    case s: java.lang.Short   => bf.mightContainLong(s.longValue())
    case b: java.lang.Byte    => bf.mightContainLong(b.longValue())
    case s: String            => bf.mightContainString(s)
    case _                    => true
  }

  def write(path: HPath, blooms: Map[String, BloomFilter]): Unit = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(blooms.size)
    blooms.toSeq.sortBy(_._1).foreach { case (name, bf) =>
      out.writeUTF(name)
      val b = new ByteArrayOutputStream()
      bf.writeTo(b)
      out.writeInt(b.size())
      b.writeTo(out)
    }
    out.flush()
    GraftIO.write(path, bos.toByteArray)
  }

  // Immutable-once-written → a process-wide cache is always coherent;
  // crudely bounded like TableMeta.chunkCache.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, BloomFilter]]()

  /** Load a sidecar (cached). Missing/corrupt → empty map: skipping is
    * an optimization, a lost sidecar must never fail a scan. */
  def read(path: HPath): Map[String, BloomFilter] = {
    val key = path.toString
    val hit = cache.get(key)
    if (hit != null) return hit
    val v =
      try {
        val in = new DataInputStream(GraftIO.open(path))
        try {
          val n = in.readInt()
          (0 until n).map { _ =>
            val name = in.readUTF()
            val len = in.readInt()
            val bytes = new Array[Byte](len)
            in.readFully(bytes)
            name -> BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
          }.toMap
        } finally in.close()
      } catch { case _: Exception => Map.empty[String, BloomFilter] }
    if (cache.size > 4096) cache.clear()
    cache.put(key, v)
    v
  }
}
