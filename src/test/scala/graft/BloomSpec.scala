package graft

import org.apache.spark.sql.functions._
import graft.functions.{BloomSketch, TextFns}
import graft.queries.SketchQueries
import graft.sources.Tables

/** Bloom semi-join reduction: membership contract (no false
  * negatives, bounded false positives), merge determinism, and the
  * actual pruning effect on the q77 join.
  */
class BloomSpec extends SparkTestBase {
  import spark.implicits._

  private def hashed(ids: Seq[Long]) =
    ids.toDF("k")
      .select(col("k"), (TextFns.hash60(col("k").cast("string")) % TextFns.P).as("h"))

  test("no false negatives; false-positive rate bounded; merge is partition-independent") {
    val keys = (0L until 500L).map(_ * 7 + 3)
    val keyDf = hashed(keys)
    def sketchOf(parts: Int): Array[Long] =
      keyDf.repartition(parts).agg(BloomSketch.bloomAgg(col("h")))
        .head().getAs[scala.collection.Seq[Long]](0).toArray
    val sketch = sketchOf(1)
    assert(sketchOf(7).toSeq == sketch.toSeq, "OR-merge must be order-independent")
    // every inserted key passes
    assert(keyDf.filter(BloomSketch.mightContain(col("h"), sketch)).count() == keys.size)
    // non-keys: expected fp ~ (1-exp(-k*n/m))^k ~ 0.2% here; assert a loose 5%
    val nonKeys = (100000L until 102000L)
    val fp = hashed(nonKeys.toSeq).filter(BloomSketch.mightContain(col("h"), sketch)).count()
    assert(fp <= nonKeys.size / 20, s"false-positive rate too high: $fp/2000")
  }

  test("q77: bloom prunes the fact side but never changes the join result") {
    val cust = Tables.customer(spark, Sf)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"),
        (TextFns.hash60(col("c_custkey").cast("string")) % TextFns.P).as("h"))
    val sketch = cust.agg(BloomSketch.bloomAgg(col("h")))
      .head().getAs[scala.collection.Seq[Long]](0).toArray
    val orders = Tables.orders(spark, Sf)
    val total = orders.count()
    val pruned = orders
      .withColumn("h", TextFns.hash60(col("o_custkey").cast("string")) % TextFns.P)
      .filter(BloomSketch.mightContain(col("h"), sketch))
      .count()
    val trueMatches = orders.join(cust, col("o_custkey") === col("c_custkey")).count()
    assert(pruned >= trueMatches, "bloom must never drop a real match")
    assert(pruned < total, "bloom must prune something on a selective key set")
    // declared query equals the plain-join aggregate
    val viaBloom = SketchQueries.q77(spark, Sf).head()
    assert(viaBloom.getAs[Long]("n_orders") == trueMatches)
  }
}
