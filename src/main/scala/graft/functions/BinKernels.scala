package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused binary-column statistics — the reference's four independent
  * per-row byte-stats UDFs (min/max/mean/std over image bytes,
  * radiography_analysis.py:128-131, 337-350) collapsed into ONE
  * single-pass native kernel returning a struct (SURVEY.md §4.3 item
  * 2). Population std (ddof=0), matching np.std.
  *
  * The double arithmetic is pinned to a fixed operation order
  * (s1/n, mean*mean, s2/n - msq, sqrt) so the DuckDB oracle twin
  * [[byteStatsSql]] is bit-identical.
  */
object BinKernels {

  final val statsType: StructType = StructType(Seq(
    StructField("bmin", IntegerType, nullable = false),
    StructField("bmax", IntegerType, nullable = false),
    StructField("bmean", DoubleType, nullable = false),
    StructField("bstd", DoubleType, nullable = false)))

  /** One pass over the bytes (unsigned): min, max, Σx, Σx² as exact
    * longs, then the pinned double sequence. Empty input → zeros.
    */
  def byteStats(bytes: Array[Byte]): InternalRow = {
    var mn = 256
    var mx = -1
    var s1 = 0L
    var s2 = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      val v = bytes(i) & 0xff
      if (v < mn) mn = v
      if (v > mx) mx = v
      s1 += v
      s2 += v.toLong * v
      i += 1
    }
    if (n == 0) new GenericInternalRow(Array[Any](0, 0, 0.0, 0.0))
    else {
      val mean = s1.toDouble / n
      val msq = mean * mean
      val variance = s2.toDouble / n - msq
      new GenericInternalRow(Array[Any](mn, mx, mean, math.sqrt(variance)))
    }
  }

  /** Expression-level builder — shared by the Column wrapper and the
    * SQL FunctionRegistry (GraftExtensions).
    */
  def byteStatsExpr(in: org.apache.spark.sql.catalyst.expressions.Expression)
    : org.apache.spark.sql.catalyst.expressions.Expression =
    StaticInvoke(
      Class.forName("graft.functions.BinKernels"),
      statsType, "byteStats",
      Seq(in),
      inputTypes = Seq(BinaryType),
      propagateNull = true,
      returnNullable = false)

  /** Column wrapper: binary → struct(bmin,bmax,bmean,bstd), inside
    * whole-stage codegen via StaticInvoke.
    */
  def byteStatsCol(bin: Column): Column =
    ColumnBridge.column(byteStatsExpr(ColumnBridge.expression(bin)))

  /** DuckDB twin over the codepoints of an ASCII string column (the
    * oracle corpus is ASCII, so codepoint == byte). `bytesExpr` must
    * be a list of 0-255 ints.
    */
  def byteStatsSql(bytesExpr: String): (String, String, String, String) = {
    val n = s"len($bytesExpr)"
    val s1 = s"list_reduce(list_prepend(0::BIGINT, $bytesExpr), (a, b) -> a + b)"
    val s2 = s"list_reduce(list_prepend(0::BIGINT, " +
      s"list_transform($bytesExpr, x -> x::BIGINT * x)), (a, b) -> a + b)"
    val mean = s"(($s1)::DOUBLE / $n)"
    val std = s"sqrt(($s2)::DOUBLE / $n - $mean * $mean)"
    (s"list_min($bytesExpr)", s"list_max($bytesExpr)", mean, std)
  }
}
