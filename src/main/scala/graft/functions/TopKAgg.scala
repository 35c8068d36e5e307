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
  * (ROW_NUMBER OVER (ORDER BY score DESC, id1, id2) ≤ k). The heap is
  * a MULTISET: fully identical triples are kept, exactly as
  * ROW_NUMBER emits one row per duplicate input row. Rows with a null
  * score are not candidates; a null id ranks as 0 (callers should
  * pass non-null identity columns — q83 uses the lineitem PK).
  */
case class TopKAgg(
  score: Expression,
  id1: Expression,
  id2: Expression,
  k: Int,
  override val mutableAggBufferOffset: Int = 0,
  override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long, Long)]] {

  require(k >= 1, s"TopKAgg requires k >= 1, got $k")

  // the queue keeps the WORST kept triple at its head (reverse of the
  // output order) so the bound check is an O(1) peek
  private def worstFirst: Comparator[(Double, Long, Long)] =
    TopKAgg.BestFirst.reversed()

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long, Long)] =
    new java.util.PriorityQueue[(Double, Long, Long)](k, worstFirst)

  private def insert(buf: java.util.PriorityQueue[(Double, Long, Long)],
    t: (Double, Long, Long)): Unit = {
    if (buf.size < k) { buf.add(t); () }
    else if (TopKAgg.BestFirst.compare(t, buf.peek()) < 0) {
      buf.poll(); buf.add(t); ()
    }
  }

  override def update(buf: java.util.PriorityQueue[(Double, Long, Long)],
    input: InternalRow): java.util.PriorityQueue[(Double, Long, Long)] = {
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

  override def merge(a: java.util.PriorityQueue[(Double, Long, Long)],
    b: java.util.PriorityQueue[(Double, Long, Long)]): java.util.PriorityQueue[(Double, Long, Long)] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  private def sortedBestFirst(
    buf: java.util.PriorityQueue[(Double, Long, Long)]): Array[(Double, Long, Long)] = {
    val arr = buf.toArray(new Array[(Double, Long, Long)](buf.size))
    java.util.Arrays.sort(arr, TopKAgg.BestFirst)
    arr
  }

  /** Best-first array of struct(score, id1, id2). */
  override def eval(buf: java.util.PriorityQueue[(Double, Long, Long)]): Any = {
    val arr = sortedBestFirst(buf)
    val out = new Array[Any](arr.length)
    var i = 0
    while (i < arr.length) {
      out(i) = new GenericInternalRow(Array[Any](arr(i)._1, arr(i)._2, arr(i)._3))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long, Long)]): Array[Byte] = {
    val arr = sortedBestFirst(buf)
    val bb = ByteBuffer.allocate(4 + arr.length * 24)
    bb.putInt(arr.length)
    arr.foreach { t => bb.putDouble(t._1); bb.putLong(t._2); bb.putLong(t._3) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long, Long)] = {
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
    * top-k array. Inputs are cast to (DOUBLE, LONG, LONG) here — the
    * aggregate's eval assumes those exact runtime types, and an
    * uncast DECIMAL score would otherwise die with a
    * ClassCastException inside executors.
    */
  def topK(score: Column, id1: Column, id2: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(score.cast("double")),
        ColumnBridge.expression(id1.cast("long")),
        ColumnBridge.expression(id2.cast("long")), k).toAggregateExpression())
}
