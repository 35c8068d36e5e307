package graft

import org.apache.spark.sql.functions._
import graft.queries.Bucketed

/** Bucketing: pre-shuffling both join sides into the same bucket
  * layout removes the per-query exchange — the co-located-join
  * strategy for repeatedly-joined 100 TB fact tables (SURVEY.md
  * "Partitioning & shuffle"). Asserts the q57 join fragment plans
  * with NO Exchange on either side, and that the declared q57 result
  * matches the plain (unbucketed) join.
  */
class BucketingSpec extends SparkTestBase {

  test("q57 bucketed join fragment plans without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.bucketedJoin(spark, Sf)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("q57 values equal the unbucketed join") {
    val bucketed = Bucketed.q57(spark, Sf).collect().toSeq
    val plain = graft.sources.Tables.orders(spark, Sf)
      .join(graft.sources.Tables.lineitem(spark, Sf),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderpriority"))
      .collect().toSeq
    assert(bucketed.nonEmpty && bucketed == plain)
  }
}
