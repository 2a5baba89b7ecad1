package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression (J9 family, like DotProductF): the size of
  * the intersection of two SORTED string arrays by two-pointer merge —
  * `size(array_intersect(a, b))` without the per-row hash-set build and
  * intermediate array allocation. `array_intersect` is the dominant cost
  * of set-similarity verification (candidate pairs × |set| hash inserts,
  * all garbage); the merge does |a|+|b| binary UTF8 comparisons in a
  * tight generated loop with zero allocation.
  *
  * Contract: both inputs ascending-sorted (as produced by `array_sort`)
  * and duplicate-free (as produced by `array_distinct`) — the producer
  * owns that invariant (jaccardPrefix writes its shingle table sorted).
  * Null ELEMENTS are skipped on either side (cannot match anything);
  * a null ARRAY yields NULL, mirroring array_intersect.
  */
case class SortedIntersectSizeF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  /** Element type the merge compares — STRING (binary UTF8 compare) or
    * BIGINT (primitive compare). Widened from string-only in r15 so the
    * graph adjacency intersects (triangle/jaccard under-gate paths)
    * could drop `size(array_intersect(...))`'s per-row hash-set build
    * for the same zero-allocation merge the dedup family already ran. */
  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && left.dataType == right.dataType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_intersect_size requires two ARRAY<STRING> or two " +
        s"ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    if (SortedIntersectSizeF.contractCheck) {
      SortedIntersectSizeF.assertSortedDistinct(xs, "left", elemType)
      SortedIntersectSizeF.assertSortedDistinct(ys, "right", elemType)
    }
    val longs = elemType == LongType
    val n = xs.numElements()
    val m = ys.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      if (xs.isNullAt(i)) i += 1
      else if (ys.isNullAt(j)) j += 1
      else {
        val cmp =
          if (longs) java.lang.Long.compare(xs.getLong(i), ys.getLong(j))
          else xs.getUTF8String(i).compareTo(ys.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      val cmpExpr =
        if (elemType == LongType)
          s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    int $cmp = $cmpExpr;
         |    if ($cmp == 0) { $c++; $i++; $j++; }
         |    else if ($cmp < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectSizeF =
    copy(left = l, right = r)
}

object SortedIntersectSizeF {
  /** Column-API entry point.
    *
    * CONTRACT (unchecked on the hot path): both arrays must be
    * ascending-sorted and duplicate-free — wrap the producers in
    * `array_sort(array_distinct(...))` if in doubt. Violations don't
    * error; they silently UNDERCOUNT (the merge skips past unsorted
    * elements), which poisons any similarity built on top. For tests
    * and debugging, `-Dgraft.sortedIntersect.checkContract=true` makes
    * the interpreted path verify both inputs and throw on violation
    * (codegen'd plans don't check — run the check with codegen off). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      SortedIntersectSizeF(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Test-only contract verification switch (see sortedIntersectSize).
    * Read per call, not cached: specs flip the property at runtime and
    * the interpreted path this guards is not perf-sensitive. */
  private[functions] def contractCheck: Boolean =
    java.lang.Boolean.getBoolean("graft.sortedIntersect.checkContract")

  private[functions] def assertSortedDistinct(xs: ArrayData, side: String,
      et: DataType = StringType): Unit = {
    def cmp(i: Int): Int =
      if (et == LongType) java.lang.Long.compare(xs.getLong(i - 1), xs.getLong(i))
      else xs.getUTF8String(i - 1).compareTo(xs.getUTF8String(i))
    var i = 1
    while (i < xs.numElements()) {
      if (!xs.isNullAt(i - 1) && !xs.isNullAt(i) && cmp(i) >= 0)
        throw new IllegalArgumentException(
          s"graft_sorted_intersect_size: $side array violates the " +
            s"sorted-distinct contract at index $i — results would undercount")
      i += 1
    }
  }
}
