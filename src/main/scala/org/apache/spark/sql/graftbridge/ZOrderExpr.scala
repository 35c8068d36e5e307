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

  /** Column wrapper: zorder2(a, b) through the codegen expression. */
  def zorder2(a: Column, b: Column): Column =
    ColumnBridge.column(
      ZOrderLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
