package graft.table

import scala.collection.mutable

import org.apache.spark.sql.sources._

/** Maps DataSource-pushed `Filter`s to per-column [lo, hi] bounds in the
  * manifest's stats string space (the same rendering FooterStats uses:
  * numerics via plain decimal strings, timestamps as fixed-width UTC
  * `yyyy-MM-dd HH:mm:ss.SSSSSS`, dates as ISO, strings verbatim).
  *
  * Only conjunctive equality/range predicates produce bounds; Or/Not/
  * string-pattern filters are ignored (no pruning — Spark re-applies all
  * filters after the scan, so skipping is always safe, never wrong).
  */
private[graft] object FilterBounds {

  final case class Bound(lo: Option[String], hi: Option[String])

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  /** Literal → stats-space string; None for types we don't model. */
  def render(v: Any): Option[String] = v match {
    case null => None
    case s: String => Some(s)
    case i: java.lang.Integer => Some(i.toString)
    case l: java.lang.Long => Some(l.toString)
    case s: java.lang.Short => Some(s.toString)
    case b: java.lang.Byte => Some(b.toString)
    case f: java.lang.Float if f.isNaN || f.isInfinite => None
    case f: java.lang.Float => Some(BigDecimal(f.toDouble).toString)
    case d: java.lang.Double if d.isNaN || d.isInfinite => None
    case d: java.lang.Double => Some(BigDecimal(d.doubleValue()).toString)
    case d: java.math.BigDecimal => Some(BigDecimal(d).toString)
    case d: BigDecimal => Some(d.toString)
    case t: java.sql.Timestamp => Some(tsFmt.format(t.toInstant))
    case t: java.time.Instant => Some(tsFmt.format(t))
    case d: java.sql.Date => Some(d.toLocalDate.toString)
    case d: java.time.LocalDate => Some(d.toString)
    case _ => None
  }

  /** Conjunctive bounds per column. Bounds from strict comparisons are
    * widened to inclusive — pruning only needs CAN-this-file-match. */
  def collect(filters: Seq[Filter]): Map[String, Bound] = {
    val acc = mutable.Map.empty[String, Bound]
    def add(c: String, lo: Option[String], hi: Option[String]): Unit = {
      val b = acc.getOrElse(c, Bound(None, None))
      // intersect: max of los, min of his (string space is ordered
      // consistently per column because all values render the same way)
      val nlo = (b.lo ++ lo).reduceOption((a, x) => if (a >= x) a else x)
      val nhi = (b.hi ++ hi).reduceOption((a, x) => if (a <= x) a else x)
      acc(c) = Bound(nlo, nhi)
    }
    def walk(f: Filter): Unit = f match {
      case And(l, r)                => walk(l); walk(r)
      case EqualTo(c, v)            => render(v).foreach(s => add(c, Some(s), Some(s)))
      case EqualNullSafe(c, v)      => render(v).foreach(s => add(c, Some(s), Some(s)))
      case GreaterThan(c, v)        => render(v).foreach(s => add(c, Some(s), None))
      case GreaterThanOrEqual(c, v) => render(v).foreach(s => add(c, Some(s), None))
      case LessThan(c, v)           => render(v).foreach(s => add(c, None, Some(s)))
      case LessThanOrEqual(c, v)    => render(v).foreach(s => add(c, None, Some(s)))
      // In is deliberately NOT pruned: min/max over the value set needs
      // type-aware ordering (string min of {"9","10"} is wrong for
      // numerics) — not worth the risk for a filter Spark re-applies.
      case _ => () // Or / Not / In / IsNull / string patterns: no pruning
    }
    filters.foreach(walk)
    acc.toMap
  }

  /** Conjunctive IS NULL / IS NOT NULL predicates per column
    * (true = must-be-null). A column claimed both ways is dropped —
    * the conjunction is unsatisfiable but proving that is the engine's
    * job, not the pruner's. */
  def collectNullness(filters: Seq[Filter]): Map[String, Boolean] = {
    val acc = mutable.Map.empty[String, Boolean]
    val conflicted = mutable.Set.empty[String]
    def walk(f: Filter): Unit = f match {
      case And(l, r)     => walk(l); walk(r)
      case IsNull(c)     =>
        if (acc.getOrElse(c, true) != true) conflicted += c else acc(c) = true
      case IsNotNull(c)  =>
        if (acc.getOrElse(c, false) != false) conflicted += c else acc(c) = false
      case _             => ()
    }
    filters.foreach(walk)
    (acc -- conflicted).toMap
  }

  /** Raw typed literals of conjunctive equality filters. Bucket pruning
    * hashes the VALUE with the write side's expression — the stringified
    * bound would hash differently, so it needs the literal itself. */
  def collectEquals(filters: Seq[Filter]): Map[String, Any] = {
    val acc = mutable.Map.empty[String, Any]
    def walk(f: Filter): Unit = f match {
      case And(l, r)                          => walk(l); walk(r)
      case EqualTo(c, v) if v != null         => acc(c) = v
      case EqualNullSafe(c, v) if v != null   => acc(c) = v
      case _                                  => ()
    }
    filters.foreach(walk)
    acc.toMap
  }
}
