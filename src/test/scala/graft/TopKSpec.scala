package graft

import graft.functions.TopKAgg
import graft.queries.Extended

/** Bounded-heap top-k aggregate: buffer bound, merge semantics, and
  * end-to-end parity with the window-rank formulation.
  */
class TopKSpec extends SparkTestBase {

  private def t(s: Double, a: Long, b: Long) = (s, a, b)

  private def newAgg = TopKAgg(null, null, null, k = 3)

  test("buffer never exceeds k; keeps best by (score DESC, ids ASC)") {
    val agg = newAgg
    val buf = agg.createAggregationBuffer()
    val other = agg.createAggregationBuffer()
    (1 to 100).foreach { i => other.add(t(i.toDouble, i.toLong, 0L)) }
    // merge respects the bound even from an oversized peer set
    val merged = agg.merge(buf, other)
    // NB: other was built by raw add (simulating deserialized partials
    // each ≤ k; here oversized on purpose) — merge must still bound
    assert(merged.size == 3)
    val best = merged.iterator()
    assert(best.next()._1 == 100.0)
    assert(best.next()._1 == 99.0)
    assert(best.next()._1 == 98.0)
  }

  test("tie scores break by (id1, id2) ascending") {
    val agg = newAgg
    val buf = agg.createAggregationBuffer()
    Seq(t(5.0, 9, 9), t(5.0, 1, 2), t(5.0, 1, 1), t(5.0, 3, 0)).foreach { x =>
      val b2 = agg.createAggregationBuffer(); b2.add(x); agg.merge(buf, b2)
    }
    val it = buf.iterator()
    assert(it.next() == t(5.0, 1, 1))
    assert(it.next() == t(5.0, 1, 2))
    assert(it.next() == t(5.0, 3, 0))
  }

  test("merge is order-independent (associative + commutative)") {
    val agg = newAgg
    val items = (1 to 40).map(i => t((i * 7 % 13).toDouble, i.toLong, (i % 3).toLong))
    def run(order: Seq[(Double, Long, Long)]) = {
      val groups = order.grouped(10).map { g =>
        val b = agg.createAggregationBuffer()
        g.foreach { x => val s = agg.createAggregationBuffer(); s.add(x); agg.merge(b, s) }
        b
      }.toSeq
      val acc = agg.createAggregationBuffer()
      groups.foreach(g => agg.merge(acc, g))
      agg.serialize(acc).toSeq
    }
    assert(run(items) == run(items.reverse))
  }

  test("serialize/deserialize round-trips") {
    val agg = newAgg
    val buf = agg.createAggregationBuffer()
    Seq(t(3.5, 1, 2), t(-1.0, 4, 5)).foreach(buf.add(_))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.size == 2 && back.first() == t(3.5, 1, 2))
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
}
