package graft.functions

import java.nio.ByteBuffer
import java.util.Comparator
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact per-group top-k as a bounded-heap aggregate.
  *
  * The window-rank formulation (q17: rank() ≤ k) must SORT each
  * group — even with WindowGroupLimit pushdown the per-partition sort
  * and the full-width shuffle remain. This aggregate carries a
  * k-element bound through partial+final hash aggregation instead:
  * every partition keeps its k best (score, id1, id2) triples, the
  * exchange moves O(groups × k) rows, and no sort of group contents
  * ever happens — the top-k of 100 TB costs one scan plus a
  * groups-sized shuffle. Merge = fold the other side's candidates
  * through the same bounded insert ⇒ associative + commutative, safe
  * under any partial-aggregation order.
  *
  * Total order: score DESC, then (id1, id2) ASC — ties are broken by
  * identity so the result is deterministic and SQL-reproducible
  * (ROW_NUMBER OVER (ORDER BY score DESC, id1, id2) ≤ k).
  */
case class TopKAgg(
  score: Expression,
  id1: Expression,
  id2: Expression,
  k: Int,
  override val mutableAggBufferOffset: Int = 0,
  override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long, Long)]] {

  private def ord: Comparator[(Double, Long, Long)] = TopKAgg.BestFirst

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long, Long)] =
    new java.util.TreeSet[(Double, Long, Long)](ord)

  private def insert(buf: java.util.TreeSet[(Double, Long, Long)],
    t: (Double, Long, Long)): Unit = {
    if (buf.size < k) { buf.add(t); () }
    else if (ord.compare(t, buf.last()) < 0) {
      if (buf.add(t)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Double, Long, Long)],
    input: InternalRow): java.util.TreeSet[(Double, Long, Long)] = {
    val s = score.eval(input)
    if (s != null) {
      val a = id1.eval(input)
      val b = id2.eval(input)
      insert(buf, (s.asInstanceOf[Double],
        if (a == null) 0L else a.asInstanceOf[Long],
        if (b == null) 0L else b.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(a: java.util.TreeSet[(Double, Long, Long)],
    b: java.util.TreeSet[(Double, Long, Long)]): java.util.TreeSet[(Double, Long, Long)] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  /** Best-first array of struct(score, id1, id2). */
  override def eval(buf: java.util.TreeSet[(Double, Long, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val t = it.next()
      out(i) = new GenericInternalRow(Array[Any](t._1, t._2, t._3))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 24)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val t = it.next()
      bb.putDouble(t._1); bb.putLong(t._2); bb.putLong(t._3)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = createAggregationBuffer()
    var i = 0
    while (i < n) { s.add((bb.getDouble, bb.getLong, bb.getLong)); i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id1", LongType, nullable = false),
    StructField("id2", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id1, id2)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(score = c(0), id1 = c(1), id2 = c(2))
  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "top_k"
}

object TopKAgg {
  /** score DESC, (id1, id2) ASC. A named serializable object — the
    * aggregate ships to executors inside task closures.
    */
  object BestFirst extends Comparator[(Double, Long, Long)] with Serializable {
    override def compare(a: (Double, Long, Long), b: (Double, Long, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c
      else {
        val c1 = java.lang.Long.compare(a._2, b._2)
        if (c1 != 0) c1 else java.lang.Long.compare(a._3, b._3)
      }
    }
  }

  /** Aggregate (score, id1, id2) rows into the group's best-first
    * top-k array. score must be DOUBLE, ids LONG.
    */
  def topK(score: Column, id1: Column, id2: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(score), ColumnBridge.expression(id1),
        ColumnBridge.expression(id2), k).toAggregateExpression())
}
