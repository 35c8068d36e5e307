package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Z-order (Morton) interleave of two keys — the multi-dimensional
  * data-layout primitive: writing a fact table range-partitioned and
  * sorted by `zorder2(a, b)` gives every file/row-group a min/max
  * envelope that is TIGHT IN BOTH a AND b (an aligned block of 2^(2m)
  * z codes is an exact 2^m × 2^m rectangle), so predicates on either
  * key — or both — skip data. One sort column buys two pruning
  * dimensions; this is the layout move behind Delta/Iceberg's
  * OPTIMIZE ZORDER, here as a plain Catalyst expression usable in
  * `repartitionByRange(z).sortWithinPartitions(z)` writes.
  *
  * Bit spread via the standard mask-shift ladder ("Bit Twiddling
  * Hacks", public domain): low 31 bits of each side spread to even
  * positions, second key shifted up one — a handful of ALU ops per
  * row, fully inside whole-stage codegen via doGenCode. Inputs are
  * masked to 31 bits so the result is a non-negative 62-bit long
  * (callers bucket-quantize real key domains into that range).
  */
case class ZOrderLong(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderLong.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("zx")
      val y = ctx.freshName("zy")
      def spread(v: String): String =
        s"""$v &= 0x7fffffffL;
           |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
           |$v = ($v | ($v << 8))  & 0x00FF00FF00FF00FFL;
           |$v = ($v | ($v << 4))  & 0x0F0F0F0F0F0F0F0FL;
           |$v = ($v | ($v << 2))  & 0x3333333333333333L;
           |$v = ($v | ($v << 1))  & 0x5555555555555555L;""".stripMargin
      s"""
         |long $x = $a;
         |long $y = $b;
         |${spread(x)}
         |${spread(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 3-key variant: 21 bits per key spread to every 3rd position — the
  * same ladder with the standard 3-D Morton masks. One sort column,
  * three pruning dimensions (e.g. partkey × suppkey × date-bucket).
  */
case class ZOrderLong3(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zorder3"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZOrderLong.interleave3(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val vs = Seq(ctx.freshName("za"), ctx.freshName("zb"), ctx.freshName("zc"))
      def spread(v: String): String =
        s"""$v &= 0x1fffffL;
           |$v = ($v | ($v << 32)) & 0x1f00000000ffffL;
           |$v = ($v | ($v << 16)) & 0x1f0000ff0000ffL;
           |$v = ($v | ($v << 8))  & 0x100f00f00f00f00fL;
           |$v = ($v | ($v << 4))  & 0x10c30c30c30c30c3L;
           |$v = ($v | ($v << 2))  & 0x1249249249249249L;""".stripMargin
      s"""
         |long ${vs(0)} = $a;
         |long ${vs(1)} = $b;
         |long ${vs(2)} = $c;
         |${vs.map(spread).mkString("\n")}
         |${ev.value} = ${vs(0)} | (${vs(1)} << 1) | (${vs(2)} << 2);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object ZOrderLong {

  /** Interpreted twin of the generated code — same mask ladder. */
  def spread(v0: Long): Long = {
    var v = v0 & 0x7fffffffL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** 21-bit spread to every 3rd position (3-D Morton masks). */
  def spread3(v0: Long): Long = {
    var v = v0 & 0x1fffffL
    v = (v | (v << 32)) & 0x1f00000000ffffL
    v = (v | (v << 16)) & 0x1f0000ff0000ffL
    v = (v | (v << 8)) & 0x100f00f00f00f00fL
    v = (v | (v << 4)) & 0x10c30c30c30c30c3L
    v = (v | (v << 2)) & 0x1249249249249249L
    v
  }

  def interleave3(x: Long, y: Long, z: Long): Long =
    spread3(x) | (spread3(y) << 1) | (spread3(z) << 2)

  /** Column wrapper: zorder2(a, b) through the codegen expression. */
  def zorder2(a: Column, b: Column): Column =
    ColumnBridge.column(
      ZOrderLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column wrapper: zorder3(a, b, c). */
  def zorder3(a: Column, b: Column, c: Column): Column =
    ColumnBridge.column(
      ZOrderLong3(ColumnBridge.expression(a), ColumnBridge.expression(b),
        ColumnBridge.expression(c)))
}
