package graft

import java.nio.ByteBuffer
import graft.functions.TopKAgg
import graft.queries.Extended

/** Bounded-heap top-k aggregate: buffer bound, multiset semantics,
  * merge order-independence, and end-to-end parity with the
  * window-rank formulation.
  */
class TopKSpec extends SparkTestBase {

  private def t(s: Double, a: Long, b: Long) = (s, a, b)

  private def newAgg = TopKAgg(null, null, null, k = 3)

  /** Best-first contents via the (sorted) serialized form. */
  private def contents(agg: TopKAgg,
    buf: java.util.PriorityQueue[(Double, Long, Long)]): Seq[(Double, Long, Long)] = {
    val bb = ByteBuffer.wrap(agg.serialize(buf))
    val n = bb.getInt
    (1 to n).map(_ => (bb.getDouble, bb.getLong, bb.getLong))
  }

  private def fold(agg: TopKAgg, items: Seq[(Double, Long, Long)]) = {
    val acc = agg.createAggregationBuffer()
    items.foreach { x =>
      val s = agg.createAggregationBuffer(); s.add(x); agg.merge(acc, s)
    }
    acc
  }

  test("buffer never exceeds k; keeps best by (score DESC, ids ASC)") {
    val agg = newAgg
    val buf = fold(agg, (1 to 100).map(i => t(i.toDouble, i.toLong, 0L)))
    assert(buf.size == 3)
    assert(contents(agg, buf) == Seq(t(100.0, 100, 0), t(99.0, 99, 0), t(98.0, 98, 0)))
  }

  test("identical triples are KEPT (multiset, like ROW_NUMBER), not deduped") {
    val agg = newAgg
    val buf = fold(agg, Seq(t(5.0, 1, 1), t(5.0, 1, 1), t(4.0, 2, 2), t(3.0, 9, 9)))
    assert(contents(agg, buf) == Seq(t(5.0, 1, 1), t(5.0, 1, 1), t(4.0, 2, 2)))
  }

  test("tie scores break by (id1, id2) ascending") {
    val agg = newAgg
    val buf = fold(agg, Seq(t(5.0, 9, 9), t(5.0, 1, 2), t(5.0, 1, 1), t(5.0, 3, 0)))
    assert(contents(agg, buf) == Seq(t(5.0, 1, 1), t(5.0, 1, 2), t(5.0, 3, 0)))
  }

  test("merge is order-independent (associative + commutative)") {
    val agg = newAgg
    val items = (1 to 40).map(i => t((i * 7 % 13).toDouble, i.toLong, (i % 3).toLong))
    def run(order: Seq[(Double, Long, Long)]) = {
      val groups = order.grouped(10).map(g => fold(agg, g)).toSeq
      val acc = agg.createAggregationBuffer()
      groups.foreach(g => agg.merge(acc, g))
      contents(agg, acc)
    }
    assert(run(items) == run(items.reverse))
  }

  test("serialize/deserialize round-trips") {
    val agg = newAgg
    val buf = fold(agg, Seq(t(3.5, 1, 2), t(-1.0, 4, 5)))
    val back = agg.deserialize(agg.serialize(buf))
    assert(contents(agg, back) == Seq(t(3.5, 1, 2), t(-1.0, 4, 5)))
  }

  test("q83 equals the window-rank formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val viaWindow = graft.sources.Tables.lineitem(spark, Sf)
      .withColumn("rk", row_number().over(Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))))
      .where(col("rk") <= Extended.TopK)
      .select(col("l_returnflag"), col("rk").as("rank"),
        col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("price"))
      .orderBy(col("l_returnflag"), col("rank"))
      .collect()
    val viaHeap = Extended.q83(spark, Sf).collect()
    assert(viaHeap.map(_.toSeq).toSeq == viaWindow.map(_.toSeq).toSeq)
  }

  test("q83 plan has no Sort below the aggregate and no Window") {
    val p = Extended.q83(spark, Sf).queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Window"), s"heap top-k must not plan a window:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected the TypedImperativeAggregate:\n$p")
  }

  test("duplicate rows survive end-to-end (multiset contract on a real frame)") {
    import org.apache.spark.sql.functions._
    val dup = spark.range(1).select(lit("X").as("g"), lit(5.0).as("s"),
      lit(1L).as("a"), lit(1L).as("b"))
    val df = dup.union(dup).union(
      spark.range(1).select(lit("X").as("g"), lit(4.0).as("s"),
        lit(2L).as("a"), lit(2L).as("b")))
      .groupBy(col("g"))
      .agg(TopKAgg.topK(col("s"), col("a"), col("b"), 3).as("top"))
      .select(explode(col("top")).as("t"))
    val rows = df.collect().map(r => r.getStruct(0))
    assert(rows.length == 3)
    assert(rows.count(s => s.getDouble(0) == 5.0) == 2, "duplicate kept")
  }
}
