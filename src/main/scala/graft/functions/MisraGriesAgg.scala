package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a mergeable
  * TypedImperativeAggregate — the standard corpus-profiling primitive
  * beside KMV (distinct), Count-Min (point frequency), and the
  * histogram sketch (quantiles): "which tokens exceed an n/(m+1)
  * frequency share", with O(m) state per partial buffer.
  *
  * Update is the classic MG step (Misra & Gries 1982): tracked item →
  * +1; free slot → insert at 1; else decrement ALL m counters by 1 and
  * drop zeros (O(m) on that branch — m is a small constant, so the
  * worst case is a bounded per-row constant, not a data-sized cost).
  * Merge is the mergeable-summaries rule (Agarwal et al., PODS 2012):
  * pointwise-sum the two counter maps, and if more than m survive,
  * subtract the (m+1)-th largest count from every counter and keep the
  * positives. Both preserve the MG invariant — for every item,
  * `true_count - n/(m+1) <= estimate <= true_count` — under ANY
  * partial-aggregation order, so the one property that matters is
  * deterministic even though the summary's exact contents are not:
  * EVERY item with true count > n/(m+1) is guaranteed present.
  *
  * That containment guarantee is why the exact two-pass pattern works
  * at 100 TB (q161): pass 1 runs this aggregate (partial+final merge,
  * exchange carries one m-entry summary per partition — no vocab-sized
  * shuffle ever); pass 2 recounts ONLY the <= m candidates exactly
  * (broadcast semi-join, aggregate state bounded by m, not vocabulary)
  * and applies the integer threshold cnt·(m+1) > n. The final answer
  * is EXACT — the sketch only prunes — so it oracles against a plain
  * GROUP BY ... HAVING in DuckDB.
  *
  * Estimates ride best-first in the output (count DESC, token ASC) so
  * driver-side consumers see a deterministic order; null inputs are
  * skipped (SQL COUNT semantics).
  */
case class MisraGriesAgg(
  item: Expression,
  m: Int,
  override val mutableAggBufferOffset: Int = 0,
  override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  require(m >= 1, s"MisraGriesAgg requires m >= 1, got $m")

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty[String, Long]

  override def update(buf: scala.collection.mutable.HashMap[String, Long],
    input: InternalRow): scala.collection.mutable.HashMap[String, Long] = {
    val v = item.eval(input)
    if (v != null) {
      val s = v.toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < m => buf.update(s, 1L)
        case None =>
          // decrement-all: every tracked counter absorbs one of the
          // untracked item's occurrences; zeros free their slots
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          buf.foreach { case (k, c) =>
            if (c == 1L) dead += k else buf.update(k, c - 1L)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: scala.collection.mutable.HashMap[String, Long],
    b: scala.collection.mutable.HashMap[String, Long]): scala.collection.mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > m) {
      // subtract the (m+1)-th largest count from all; >m positives
      // cannot survive, so the result respects the capacity again
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cStar = counts(counts.length - (m + 1))
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      a.foreach { case (k, c) =>
        if (c - cStar <= 0L) dead += k else a.update(k, c - cStar)
      }
      dead.foreach(a.remove)
    }
    a
  }

  private def sortedBestFirst(buf: scala.collection.mutable.HashMap[String, Long])
      : Array[(String, Long)] =
    buf.toArray.sortBy { case (k, c) => (-c, k) }

  /** Best-first array of struct(token, est). */
  override def eval(buf: scala.collection.mutable.HashMap[String, Long]): Any = {
    val arr = sortedBestFirst(buf)
    val out = new Array[Any](arr.length)
    var i = 0
    while (i < arr.length) {
      out(i) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(arr(i)._1), arr(i)._2))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
    val arr = sortedBestFirst(buf)
    val bytes = arr.map { case (k, _) => k.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + arr.map(_ => 12).sum + bytes.map(_.length).sum)
    bb.putInt(arr.length)
    arr.indices.foreach { i =>
      bb.putInt(bytes(i).length); bb.put(bytes(i)); bb.putLong(arr(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      out.update(new String(sb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    out
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(item)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(item = c(0))
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  /** Aggregate a string column into its m-counter MG summary:
    * array<struct<token, est>>, best-first.
    */
  def sketch(item: Column, m: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(item.cast("string")), m)
        .toAggregateExpression())
}
