package graft.table

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg's hidden-partition transform family (days/months/years/hours,
  * bucket[N], truncate[W]) re-expressed as Spark column expressions on the
  * write side plus bound mapping on the pruning side. The reference's own
  * surface is `days()` only (README.md:304-307); the rest of the family is
  * what real Iceberg tables at 100 TB partition by (bucket for high-NDV
  * join keys, truncate for prefix locality, coarser time grains for long
  * retention), so the layer carries all of them.
  *
  * Contract shared by both sides: the write side materializes
  * `column(spec, src)` and `partitionBy` stringifies it into a directory
  * name; the pruning side maps pushed filter bounds into that exact string
  * domain. Every transform here is order-preserving in its string form
  * (ISO time grains compare lexicographically; numeric forms are compared
  * as numbers) EXCEPT bucket, which only supports equality pruning.
  */
private[graft] object Transforms {

  private val Spec = "^([a-z]+)(?:\\[(\\d+)\\])?$".r

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** "bucket[8]" -> ("bucket", Some(8)); "days" -> ("days", None). */
  def parse(spec: String): (String, Option[Int]) = spec match {
    case Spec(name, null) => (name, None)
    case Spec(name, n)    => (name, Some(n.toInt))
    case _ => throw new IllegalArgumentException(s"bad partition transform: $spec")
  }

  def validate(spec: String, srcType: DataType): Unit = parse(spec) match {
    case ("days" | "months" | "years" | "hours", None) =>
      require(srcType.isInstanceOf[TimestampType] || srcType.isInstanceOf[DateType],
        s"$spec needs a timestamp/date column, got $srcType")
    case ("identity", None) =>
      // low-cardinality layout keys only: the directory name IS the
      // value, so the type must stringify order-preservingly (ISO dates,
      // integers via the numeric compare branch, strings as UTF-8).
      // Timestamp identity would mint a directory per microsecond —
      // that's what the time transforms are for, so it stays rejected.
      require(isIntegral(srcType) || srcType == StringType ||
        srcType.isInstanceOf[DateType],
        s"identity needs an integral/string/date column, got $srcType " +
          "(use days/months/years/hours for timestamps)")
    case ("bucket", Some(n)) =>
      require(n > 0, "bucket count must be positive")
      require(isIntegral(srcType) || srcType == StringType,
        s"bucket needs an integral or string column, got $srcType")
    case ("truncate", Some(w)) =>
      require(w > 0, "truncate width must be positive")
      require(isIntegral(srcType) || srcType == StringType,
        s"truncate needs an integral or string column, got $srcType")
    case other => throw new IllegalArgumentException(s"unknown transform $other")
  }

  /** Hidden-partition field name for a transform on a column; `days` keeps
    * the historical `<col>_day` layout existing metadata was written with.
    * Parametric transforms embed the parameter (`k_bucket8`): after a
    * DROP + re-ADD with a different parameter (bucket[4] → bucket[8]),
    * stale recorded values must NOT be interpreted under the new spec —
    * a distinct field name makes old files read as "no recorded value"
    * (kept, never wrongly pruned), the same reason Iceberg gives each
    * spec's fields fresh ids. */
  def fieldName(spec: String, sourceCol: String): String = parse(spec) match {
    case ("days", _)      => s"${sourceCol}_day"
    case (name, Some(p))  => s"${sourceCol}_$name$p"
    case (name, None)     => s"${sourceCol}_$name"
  }

  /** Write-side partition value (becomes the directory name). */
  def column(spec: String, src: Column, srcType: DataType): Column = parse(spec) match {
    case ("identity", _) => src
    case ("days", _)   => to_date(src)
    case ("months", _) => date_format(src, "yyyy-MM")
    case ("years", _)  => date_format(src, "yyyy")
    case ("hours", _)  => date_format(src, "yyyy-MM-dd-HH")
    // hash() IS Murmur3Hash(seed=42) — bucketOfLiteral below must agree
    case ("bucket", Some(n)) => pmod(hash(src), lit(n))
    case ("truncate", Some(w)) => srcType match {
      case StringType => substring(src, 1, w)
      // floor-to-multiple (pmod is non-negative, so negatives floor too)
      case _ => src - pmod(src, lit(w))
    }
    case other => throw new IllegalArgumentException(s"unknown transform $other")
  }

  /** Driver-side murmur3 bucket of a pushed equality literal — evaluates
    * the SAME Catalyst expression the write side used (`hash(col)` =
    * Murmur3Hash seed 42), so write and prune can never disagree. None
    * when the literal type isn't representable (then we don't prune). */
  def bucketOfLiteral(v: Any, n: Int): Option[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    try {
      val h = Murmur3Hash(Seq(Literal(v)), 42).eval(null).asInstanceOf[Int]
      Some(((h % n) + n) % n)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Can a file with recorded partition value `pv` contain rows matching
    * the conjunctive bound `b` on the SOURCE column? Conservative: true
    * unless the transform domain proves emptiness. Spark re-applies every
    * pushed filter post-scan, so a kept file is never wrong — only a
    * pruned one could be, and each arm below is an order/equality proof.
    *
    * `eqLiteral` is the raw typed literal when the bound came from a
    * conjunctive EqualTo (bucket pruning needs the value, not its string).
    * `numeric` tells truncate how to compare (BigDecimal vs UTF-8 bytes).
    */
  def keepFile(
      spec: String,
      pv: String,
      b: FilterBounds.Bound,
      eqLiteral: Option[Any],
      numeric: Boolean,
      utf8Lte: (String, String) => Boolean): Boolean = {
    // A range/equality bound never matches NULL, and the null partition
    // directory holds only rows whose transform source is NULL.
    if (pv == "__HIVE_DEFAULT_PARTITION__") return false
    parse(spec) match {
      case ("days", _) =>
        // Timeline guard (see GraftTable.planFilters): values were written
        // in the session timezone, bounds render in UTC — any offset is
        // under 24 h, so ±1 day covers every mismatch.
        b.lo.forall(lo => pv >= isoShift(lo, -1).getOrElse(pv)) &&
          b.hi.forall(hi => pv <= isoShift(hi, +1).getOrElse(pv))
      case ("months", _) =>
        b.lo.forall(lo => isoShift(lo, -1).forall(d => pv >= d.take(7))) &&
          b.hi.forall(hi => isoShift(hi, +1).forall(d => pv <= d.take(7)))
      case ("years", _) =>
        b.lo.forall(lo => isoShift(lo, -1).forall(d => pv >= d.take(4))) &&
          b.hi.forall(hi => isoShift(hi, +1).forall(d => pv <= d.take(4)))
      case ("hours", _) =>
        // bounds render "yyyy-MM-dd HH:mm:..."; ±15 h covers the widest
        // session-timezone offset (UTC±14) the way ±1 day does for days
        b.lo.forall(lo => hourShift(lo, -15).forall(pv >= _)) &&
          b.hi.forall(hi => hourShift(hi, +15).forall(pv <= _))
      case ("bucket", Some(n)) =>
        eqLiteral.flatMap(bucketOfLiteral(_, n)) match {
          case Some(bk) => pv == bk.toString
          case None     => true // range predicates can't prune a hash bucket
        }
      case ("identity", _) =>
        // the file holds exactly the value pv — plain order/equality
        // pruning in the bound's own space (numeric or UTF-8)
        if (numeric) {
          val pvNum = try BigDecimal(pv) catch { case _: NumberFormatException => return true }
          b.hi.forall(hi => pvNum <= BigDecimal(hi)) &&
            b.lo.forall(lo => pvNum >= BigDecimal(lo))
        } else {
          b.hi.forall(hi => utf8Lte(pv, hi)) && b.lo.forall(lo => utf8Lte(lo, pv))
        }
      case ("truncate", Some(w)) =>
        if (numeric) {
          val pvNum = try BigDecimal(pv) catch { case _: NumberFormatException => return true }
          // file holds values in [pv, pv + w - 1]
          b.hi.forall(hi => pvNum <= BigDecimal(hi)) &&
            b.lo.forall(lo => pvNum + (w - 1) >= BigDecimal(lo))
        } else {
          // pv is a w-char prefix: smallest value with this prefix is pv
          // itself; values reach `lo` iff lo <= pv or lo extends pv
          b.hi.forall(hi => utf8Lte(pv, hi)) &&
            b.lo.forall(lo => utf8Lte(lo, pv) || lo.startsWith(pv))
        }
      case _ => true
    }
  }

  /** ISO day from a stats-space bound string, shifted ±days; None when the
    * bound isn't a date/timestamp rendering (then don't prune on it). */
  private def isoShift(bound: String, days: Int): Option[String] =
    try Some(java.time.LocalDate.parse(bound.take(10)).plusDays(days.toLong).toString)
    catch { case _: java.time.format.DateTimeParseException => None }

  private val hourFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH")
  private val hourDirFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd-HH")

  private def hourShift(bound: String, hours: Int): Option[String] =
    try Some(java.time.LocalDateTime.parse(bound.take(13), hourFmt)
      .plusHours(hours.toLong).format(hourDirFmt))
    catch { case _: java.time.format.DateTimeParseException => None }

  /** Invert Spark's partition-directory escaping (%XX hex sequences) so
    * manifest partition values compare in the same space as filter bounds
    * (a truncate prefix with a space would otherwise be stored "a%20b"). */
  def unescapePathValue(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        val hex = s.substring(i + 1, i + 3)
        try { sb.append(Integer.parseInt(hex, 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
