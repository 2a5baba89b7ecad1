package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Native Catalyst expression (SURVEY.md §2 J9 family): Morton / Z-order
  * interleave of up to 4 INT columns, each pre-scaled to 16 bits
  * (0..65535). Bit i of column c lands at output bit `i*N + c`, so a sort
  * on the result curves through the N-dimensional key space — per-file
  * min/max stats stay tight on EVERY interleaved column, not just a
  * leading sort key. This is the layout `rewrite_data_files`' zorder
  * strategy sorts by (GraftTable.rewriteDataFiles).
  *
  * NULL scales to 0 (nulls-first corner of the curve): clustering choices
  * must not change query results — pruning keeps any file whose stats
  * range intersects, and Spark re-applies exact predicates post-scan — so
  * a total, null-tolerant key beats a nullable one here.
  *
  * Codegen'd: the interleave runs inside the compaction shuffle's key
  * projection — shifts and ors only, no boxing, never a fallback to
  * interpreted eval on the write path.
  */
case class InterleaveBitsF(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty || children.size > 4)
      TypeCheckResult.TypeCheckFailure(
        s"graft_interleave_bits takes 1-4 arguments, got ${children.size}")
    else if (!children.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(
        "graft_interleave_bits requires INT arguments (16-bit-scaled), got " +
          children.map(_.dataType.simpleString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var out = 0L
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      val x = (if (v == null) 0 else v.asInstanceOf[Int]) & 0xffff
      var i = 0
      while (i < 16) {
        out |= ((x >> i) & 1L) << (i * n + c)
        i += 1
      }
      c += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val parts = children.zipWithIndex.map { case (child, c) =>
      val e = child.genCode(ctx)
      val x = ctx.freshName("zx")
      val i = ctx.freshName("zi")
      val raw = if (child.nullable) s"(${e.isNull} ? 0 : ${e.value})" else e.value.toString
      s"""
         |${e.code}
         |int $x = $raw & 0xffff;
         |for (int $i = 0; $i < 16; $i++) {
         |  ${ev.value} |= (long) (($x >> $i) & 1) << ($i * $n + $c);
         |}
       """.stripMargin
    }.mkString("\n")
    val body = s"long ${ev.value} = 0L;\n$parts"
    ev.copy(code = code"$body", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBitsF =
    copy(children = newChildren)
}

object InterleaveBitsF {
  /** Column-API entry point over 16-bit-scaled INT columns. */
  def interleave(cols: Seq[Column]): Column =
    GraftSqlBridge.column(InterleaveBitsF(cols.map(GraftSqlBridge.expression)))
}

/** 2-D Hilbert curve index of two 16-bit-scaled INT columns (the
  * alternative clustering curve to Morton): better locality at quadrant
  * boundaries — consecutive curve positions are always adjacent cells,
  * so per-file coordinate ranges are tighter on average for the same
  * file count. Standard iterative xy→d transform (the public-domain
  * formulation): walk square sizes from 2^15 down, accumulate the
  * sub-square offset, rotate the frame. NULL scales to 0, like Morton —
  * clustering never changes results, pruning re-checks exact stats. */
case class HilbertIndexF(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_hilbert requires two INT arguments (16-bit-scaled), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def eval(input: InternalRow): Any = {
    val lv = left.eval(input)
    val rv = right.eval(input)
    HilbertIndexF.xy2d(
      if (lv == null) 0 else lv.asInstanceOf[Int] & 0xffff,
      if (rv == null) 0 else rv.asInstanceOf[Int] & 0xffff)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val cls = HilbertIndexF.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val lx = if (left.nullable) s"(${l.isNull} ? 0 : ${l.value})" else l.value.toString
    val ry = if (right.nullable) s"(${r.isNull} ? 0 : ${r.value})" else r.value.toString
    val body =
      s"""
         |${l.code}
         |${r.code}
         |long ${ev.value} = $cls.xy2d($lx & 0xffff, $ry & 0xffff);
       """.stripMargin
    ev.copy(code = code"$body", isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexF =
    copy(left = newLeft, right = newRight)
}

object HilbertIndexF {
  /** Iterative Hilbert xy→d on a 2^16 × 2^16 grid. */
  def xy2d(xIn: Int, yIn: Int): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1 << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s.toLong * ((3 * rx) ^ ry)
      // rotate the quadrant frame
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbert(x: Column, y: Column): Column =
    GraftSqlBridge.column(HilbertIndexF(
      GraftSqlBridge.expression(x), GraftSqlBridge.expression(y)))
}
