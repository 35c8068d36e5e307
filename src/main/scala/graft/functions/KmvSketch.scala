package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a custom Catalyst
  * aggregate: keep the k smallest DISTINCT hash values seen; with
  * hashes uniform on [0, P), the k-th smallest value m estimates the
  * distinct count as (k-1) · P / m (Bar-Yossef et al., "Counting
  * distinct elements in a data stream", RANDOM'02). Below k distinct
  * values the sketch IS the exact answer.
  *
  * Unlike approx_count_distinct (HLL), the estimator is an exact
  * deterministic function of the input hash set — so a SQL engine
  * holding the same hashes computes the identical estimate, which is
  * what makes it driver-oracle-checkable. Merge = set-union keeping k
  * smallest ⇒ associative+commutative ⇒ partial+final with k longs
  * per (partition, group) on the exchange, independent of input size.
  */
case class KmvSketch(
  child: Expression,
  k: Int,
  override val mutableAggBufferOffset: Int = 0,
  override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
    : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
    b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  /** (k-1)·P/m for a full sketch; exact |set| below k. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else ((k - 1).toDouble * TextFns.P.toDouble) / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketch =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "kmv_distinct"
}

object KmvSketch {
  final val DefaultK = 64

  /** Aggregate a long hash column into the group's KMV distinct-count
    * estimate.
    */
  def kmvDistinct(hash: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(hash), k).toAggregateExpression())

  /** DuckDB twin of the estimator over a hash expression `h` grouped
    * in the current GROUP BY: exact below k, (k-1)·P/m at k.
    */
  def kmvDistinctSql(h: String, k: Int = DefaultK): String =
    s"""CASE WHEN COUNT(DISTINCT $h) < $k THEN COUNT(DISTINCT $h)::DOUBLE
       |     ELSE ((${k - 1})::DOUBLE * ${TextFns.P}::DOUBLE)
       |          / (list_sort(list(DISTINCT $h))[$k])::DOUBLE END""".stripMargin
}
