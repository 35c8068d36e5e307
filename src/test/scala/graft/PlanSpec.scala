package graft

import graft.queries.{Dedup, EventsOps, Relational}

/** Physical-plan assertions: the scale-critical properties promised in
  * the operator Scaladocs, checked against the actual executed plans —
  * pushdown reaches the scan, small sides broadcast, top-k avoids
  * global sorts, and co-partitioned stages share one exchange.
  */
class PlanSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q05: filters pushed to parquet scan; unused columns pruned") {
    val p = plan(Relational.q05(spark, Sf))
    val scanLine = p.split('\n').find(_.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("l_quantity"), s"filter not pushed: $scanLine")
    val readSchema = p.split('\n').find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_tax"), "unused column not pruned from scan")
    assert(!readSchema.contains("l_shipdate"), "unused column not pruned from scan")
  }

  test("q11: dimension side broadcast; top-10 via TakeOrderedAndProject") {
    val p = plan(Relational.q11(spark, Sf))
    assert(p.contains("BroadcastHashJoin"), "customer dim should broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k should not global-sort")
  }

  test("q06: top-k-then-resort plans TakeOrderedAndProject") {
    assert(plan(Relational.q06(spark, Sf)).contains("TakeOrderedAndProject"))
  }

  test("q39: lag + running-sum + groupBy share the user_id exchange") {
    val p = plan(EventsOps.q39(spark, Sf))
    val exchanges = p.split('\n').count(l =>
      l.contains("Exchange hashpartitioning"))
    // one hash exchange for the windows+aggregate; the final orderBy adds
    // a range exchange, counted separately
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("q34: LSH band self-join is a hash join, never nested-loop") {
    val p = plan(Dedup.q34(spark, Sf))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"),
      "band join must not degrade to a cartesian product")
  }

  test("q50: as-of join composition plans one hash exchange, no range join") {
    val p = plan(graft.queries.SketchQueries.q50(spark, Sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of join must not degrade to a product/range probe")
    val windowExchanges = p.split('\n')
      .count(l => l.contains("Exchange hashpartitioning") && l.contains("user_id"))
    assert(windowExchanges <= 2, s"expected at most union+window exchanges:\n$p")
  }

  test("graft_dot codegen expression stays inside WholeStageCodegen") {
    import org.apache.spark.sql.functions.col
    val df = graft.sources.Tables.embeddings(spark, Sf)
      .select(graft.functions.VecFns.dotCol(col("embedding"), col("embedding")).as("d"))
      .filter(col("d") > 0)
    val p = plan(df)
    // a star prefix (`*(n)`) marks an operator compiled into a
    // WholeStageCodegen stage; both the project evaluating graft_dot
    // and the filter referencing it must carry it (no interpreted
    // fallback)
    val lines = p.split('\n')
    val dotLines = lines.filter(_.contains("graft_dot"))
    assert(dotLines.nonEmpty, s"graft_dot not in plan:\n$p")
    dotLines.filterNot(_.contains("FileScan")).foreach { l =>
      val op = l.trim.replaceFirst("^[+\\-:| ]+", "") // strip tree-drawing prefix
      assert(op.startsWith("*"),
        s"graft_dot operator fell out of codegen: $l")
    }
    assert(df.count() > 0)
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan(Relational.q01(spark, Sf))
    val hashAggs = p.split('\n').count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, "expected partial + final HashAggregate")
  }
}
