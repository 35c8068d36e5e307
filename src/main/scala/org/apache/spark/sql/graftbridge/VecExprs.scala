package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Fully codegen'd vector dot product — the top rung of the extension
  * ladder (SURVEY.md §4.3): above `functions._` composition and above
  * `StaticInvoke` kernels sits a custom Expression whose `doGenCode`
  * INLINES the loop into the generated Java of the enclosing
  * WholeStageCodegen stage. Versus the StaticInvoke kernel
  * (graft.functions.VecFns.dotK) this removes the static call per row
  * and lets janino/JIT see one flat loop over the two unsafe arrays —
  * the hot inner product behind every cosine similarity, ANN probe
  * and embedding-dedup query.
  *
  * Each side independently accepts ARRAY<FLOAT> or ARRAY<DOUBLE>
  * (mixed is the k-means assignment case: float corpus embedding ×
  * double trained centroid); the generated accessor is picked at
  * plan time, so the row loop stays branch-free.
  *
  * Lives in the graftbridge package because `ExpectsInputTypes` takes
  * `AbstractDataType`, which Spark 4 keeps private[sql].
  *
  * Numeric contract (pinned by KernelSpec/PropertySpec): identical to
  * VecFns.dot and VecFns.dotK — each element widened to DOUBLE,
  * strict ascending-index left fold, so DuckDB oracles stay
  * bit-exact. Length mismatch folds over the shorter prefix (corpus
  * vectors are fixed-dim; the guard keeps malformed rows from
  * throwing).
  */
case class DotProductFloat(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = isFloat(left)
    val yf = isFloat(right)
    var n = x.numElements()
    if (y.numElements() < n) n = y.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def get(arr: String, fl: Boolean) =
        if (fl) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() < $n) $n = $b.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, isFloat(left))} * ${get(b, isFloat(right))};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecExprs {

  /** Column wrapper: dot(a, b) through the codegen expression. */
  def dotGen(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductFloat(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
