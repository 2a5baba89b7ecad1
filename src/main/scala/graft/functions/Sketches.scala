package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s (SURVEY.md §2 J9) for the near-dup sketches.
  *
  * Both are distributive sketches: the buffer merges element-wise
  * (min / vector-add), so Spark plans them as partial + final aggregate —
  * the shuffle carries one fixed-size array per (doc) group, never the
  * token stream. That is what makes MinHash/SimHash work at 100 TB: the
  * signature is O(1) per document regardless of document size.
  */
object Sketches {

  val NUM_PERM = 64

  /** Deterministic 64-bit token hash (splitmix64 finalizer over the
    * String's UTF-8 bytes — stable across JVMs, unlike String.hashCode
    * extended naively). */
  def tokenHash(tok: String): Long = {
    var h = 0x9e3779b97f4a7c15L
    val bytes = tok.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001b3L; i += 1 }
    mix(h)
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Per-permutation universal hashes h_i(x) = a_i*x + b_i (odd a_i),
    * seeded deterministically. */
  private val permA: Array[Long] = {
    val r = new scala.util.Random(1042); Array.fill(NUM_PERM)(r.nextLong() | 1L)
  }
  private val permB: Array[Long] = {
    val r = new scala.util.Random(2042); Array.fill(NUM_PERM)(r.nextLong())
  }

  /** MinHash: signature(doc) = per-permutation min of h_i(tokenHash). The
    * fraction of matching coordinates between two signatures is an
    * unbiased estimate of the Jaccard similarity of the token sets. */
  object MinHashAgg extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.fill(NUM_PERM)(Long.MaxValue)
    def reduce(buf: Array[Long], tok: String): Array[Long] = {
      val h = tokenHash(tok)
      var i = 0
      while (i < NUM_PERM) {
        val v = permA(i) * h + permB(i)
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < NUM_PERM) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** SimHash: each token votes ±1 on each of 64 bits of its hash
    * (tf-weighted when fed the raw token stream); the signature is the
    * sign vector packed into a Long. Near-dups have small Hamming
    * distance. */
  object SimHashAgg extends Aggregator[String, Array[Int], Long] {
    def zero: Array[Int] = new Array[Int](64)
    def reduce(buf: Array[Int], tok: String): Array[Int] = {
      val h = tokenHash(tok)
      var i = 0
      while (i < 64) {
        buf(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
      buf
    }
    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }
    def finish(buf: Array[Int]): Long = {
      var out = 0L
      var i = 0
      while (i < 64) { if (buf(i) > 0) out |= (1L << i); i += 1 }
      out
    }
    def bufferEncoder: Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
