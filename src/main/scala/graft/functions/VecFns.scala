package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column builders for the similarity/near-dup
  * families. All pure codegen'd array expressions (no UDFs).
  *
  * Float-parity discipline: every element is cast FLOAT→DOUBLE before
  * any arithmetic, and every reduction is a strict left fold in
  * ascending index order — mirrored in the DuckDB oracles with
  * `list_reduce(list_prepend(0.0, ...))`, which guarantees the same
  * IEEE operation sequence and therefore bit-identical doubles.
  */
object VecFns {

  /** dot(a, b) with double accumulation in index order — declarative
    * form (parity reference for [[dotCol]] and the specs).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Native kernel: same float→double cast and ascending-index strict
    * left fold as [[dot]] (bit-identical), in one JIT'd loop instead
    * of interpreted HOF evaluation — the hot path of every cosine
    * pair/probe query.
    */
  def dotK(a: org.apache.spark.sql.catalyst.util.ArrayData,
    b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** Hot-path dot product: the fully codegen'd [[DotProductFloat]]
    * expression (doGenCode inlines the loop into the stage's generated
    * Java). Same numeric contract as [[dot]]/[[dotK]] — KernelSpec
    * pins all three bit-identical.
    */
  def dotCol(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.VecExprs.dotGen(a, b)

  /** StaticInvoke wrapper for [[dotK]] — kept as the parity reference
    * one rung below [[dotCol]] on the extension ladder.
    */
  def dotColInvoke(a: Column, b: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    ColumnBridge.column(StaticInvoke(
      Class.forName("graft.functions.VecFns"),
      DoubleType, "dotK",
      Seq(ColumnBridge.expression(a), ColumnBridge.expression(b)),
      inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType)),
      propagateNull = true,
      returnNullable = false))
  }

  /** L2 norm via the native kernel. */
  def normK(a: Column): Column = sqrt(dotCol(a, a))

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), " +
      s"(x, y) -> x + y)"

  /** L2 norm with the same fold discipline. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  // -----------------------------------------------------------------
  // Sign-random-projection LSH (random hyperplanes)
  // -----------------------------------------------------------------

  final val Dim = 64
  final val NumPlanes = 6

  /** Deterministic ±1 hyperplanes, generated at *plan time* from a
    * fixed LCG and inlined as literals — zero per-row hashing cost,
    * and the identical literals are emitted into the oracle SQL.
    */
  final val planes: IndexedSeq[IndexedSeq[Int]] = {
    var s = 987654321L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) >>> 1; s }
    IndexedSeq.fill(NumPlanes)(IndexedSeq.fill(Dim)(((next() & 1L) * 2 - 1).toInt))
  }

  /** LSH bucket id in [0, 2^NumPlanes): bit j = [dot(v, plane_j) > 0].
    * One fused fold per plane; at 100 TB this is map-side-only work
    * that turns an O(n²) all-pairs search into per-bucket joins.
    */
  def lshBucket(v: Column): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val proj = aggregate(
        zip_with(v, array(p.map(lit): _*), (x, s) => x.cast("double") * s),
        lit(0.0),
        (acc, t) => acc + t)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  def lshBucketSql(v: String): String =
    planes.zipWithIndex.map { case (p, j) =>
      val lits = p.mkString("[", ", ", "]")
      val proj = s"list_reduce(list_prepend(0.0::DOUBLE, " +
        s"list_transform(generate_series(1, len($v)), i -> $v[i]::DOUBLE * ($lits)[i])), " +
        s"(x, y) -> x + y)"
      s"CASE WHEN $proj > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString("(", " + ", ")")
}
