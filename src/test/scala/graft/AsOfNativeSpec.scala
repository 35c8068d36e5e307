package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinNative
import graft.queries.SketchQueries

/** The whole-operator as-of join (custom LogicalPlan + Strategy +
  * SparkPlan) must plan through AsOfJoinExec and equal the composed
  * window-based operator on real data, including the boundary
  * semantics (rightTime == leftTime matches; unmatched lefts drop).
  */
class AsOfNativeSpec extends SparkTestBase {

  test("q66 plans AsOfJoinExec and equals the composed q50") {
    val q66 = SketchQueries.q66(spark, Sf)
    assert(q66.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "the custom strategy must plan the custom exec")
    val q50 = SketchQueries.q50(spark, Sf)
    assert(q66.exceptAll(q50).isEmpty && q50.exceptAll(q66).isEmpty)
  }

  test("boundary semantics: <= matches, unmatched lefts drop, latest wins") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // after both right rows for key 1 → latest (t=90) wins
      (2L, 10L, 50L),  // exactly equal time → matches
      (3L, 10L, 40L),  // before any right row for key 10 at t>40... t=50,90 → drops
      (4L, 99L, 100L)  // key with no right rows at all → drops
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (10L, 50L, "a"),
      (10L, 90L, "b")
    ).toDF("rk", "rt", "payload")
    val got = AsOfJoinNative.asOf(left, right, "k", "rk", "t", "rt")
      .select(col("event_id"), col("payload"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "b", 2L -> "a"))
  }

  test("empty right side yields no rows (inner semantics)") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("event_id", "k", "t")
    val right = Seq.empty[(Long, Long, String)].toDF("rk", "rt", "payload")
    assert(AsOfJoinNative.asOf(left, right, "k", "rk", "t", "rt").count() == 0)
  }
}
