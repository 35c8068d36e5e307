package graft

import org.apache.spark.sql.Row
import graft.queries.{RangeJoin, Reshape}

/** Reshape family (pivot / unpivot / grouping sets / shift windows)
  * and the bin-bucketed range join: result sanity at sf0.001 plus the
  * plan properties their Scaladocs promise.
  */
class ReshapeSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** AQE plan strings repeat the whole tree under "== Initial Plan ==";
    * counting nodes must stop at the final section's end.
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    plan(df).split("== Initial Plan ==")(0)

  test("q78: explicit-values pivot is one aggregate pass, static schema") {
    val df = Reshape.q78(spark, Sf)
    // cohort + 5 types × (cnt, val)
    assert(df.columns.length == 11)
    assert(df.columns.contains("click_cnt") && df.columns.contains("view_val"))
    val rows = df.collect()
    assert(rows.length == 4)
    // no distinct-scan job: the pivot values were given, so the plan
    // is the (cohort,type) pre-aggregate + pivotfirst pair — both
    // exchanges carry O(groups × values), and no separate job ran to
    // discover the pivot values
    val exchanges = finalPlan(df).split('\n')
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"pivot should be two skinny aggregates:\n${plan(df)}")
    assert(plan(df).contains("pivotfirst"), "expected pivotfirst aggregate")
  }

  test("q79: unpivot emits measures × groups rows via Expand, no extra shuffle") {
    val df = Reshape.q79(spark, Sf)
    val rows = df.collect()
    assert(rows.length == 3 * 3) // 3 flags × 3 measures
    assert(plan(df).contains("Expand"), "unpivot should plan an Expand generator")
  }

  test("q80: grouping sets levels disambiguated by gid in one pass") {
    val df = Reshape.q80(spark, Sf).cache()
    try {
      val gids = df.select("gid").distinct().collect().map(_.getInt(0)).sorted
      assert(gids.sameElements(Array(0, 1, 3)), gids.mkString(","))
      // grand total row aggregates everything
      val total = df.where("gid = 3").collect()
      assert(total.length == 1)
      // detail rows sum to the grand total
      val detail = df.where("gid = 0")
        .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
      assert(detail == total(0).getAs[Long]("n"))
    } finally df.unpersist()
  }

  test("q81: lag/lead/ntile share one hash exchange") {
    val df = Reshape.q81(spark, Sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // first row per user has null delta
    val byUser = rows.groupBy(_.getLong(0))
    byUser.values.foreach { rs =>
      assert(rs.head.isNullAt(3), "first day's delta must be null")
      assert(rs.last.isNullAt(4), "last day's lead must be null")
    }
    // the aggregate exchanges O(groups) on (user_id, day); lag, lead
    // and ntile then share ONE user_id exchange (two Window nodes,
    // one partitioning) — 2 hash exchanges total, neither O(rows)
    val hashEx = finalPlan(df).split('\n')
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 2,
      s"agg + shared window exchange expected:\n${plan(df)}")
  }

  test("q82: range join plans as equi-join on bin, never nested-loop") {
    val df = RangeJoin.q82(spark, Sf)
    val p = plan(df)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"bin join must be an equi-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must not degrade to nested-loop:\n$p")
    val rows = df.collect()
    // every window's count ≥ 1 (inner join) and pairs met exactly once:
    // total n_items equals the direct containment count
    val direct = {
      import org.apache.spark.sql.functions._
      val wins = graft.sources.Tables.orders(spark, Sf)
        .where(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1995-04-01"))
        .select(col("o_orderkey"), col("o_orderdate").as("s"))
      val pts = graft.sources.Tables.lineitem(spark, Sf).select(col("l_shipdate"))
      wins.crossJoin(pts)
        .where(col("l_shipdate") >= col("s") &&
          col("l_shipdate") < col("s") + org.apache.spark.sql.functions.expr(
            s"INTERVAL ${RangeJoin.WindowDays} DAYS"))
        .count()
    }
    assert(rows.map(_.getAs[Long]("n_items")).sum == direct,
      "binned join must produce exactly the containment pairs")
  }

  test("q88: optimizer rule turns the naive range join into an equi-join") {
    // a precomputed-attribute bound with no conf width stays a nested
    // loop — the rule has nothing to derive the bin width from
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf, "0")
    val naive = RangeJoin.naiveRangeJoin(spark, Sf)
    val pNaive = plan(naive)
    assert(pNaive.contains("BroadcastNestedLoopJoin") ||
      pNaive.contains("CartesianProduct"),
      s"expected the naive plan to nested-loop:\n$pNaive")
    // q88's inline 'lo + literal' bound self-configures — still no conf
    val auto = RangeJoin.q88(spark, Sf)
    val pAuto = plan(auto)
    assert(!pAuto.contains("BroadcastNestedLoopJoin") &&
      !pAuto.contains("CartesianProduct"),
      s"rule did not rewrite:\n$pAuto")
    assert(pAuto.contains("HashJoin") || pAuto.contains("SortMergeJoin"))
    assert(auto.collect().toSeq == RangeJoin.q82(spark, Sf).collect().toSeq)
  }

  test("binWidth conf enables the rewrite for precomputed-attribute bounds") {
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf,
      (RangeJoin.WindowDays * 86400L).toString)
    try {
      val df = RangeJoin.naiveRangeJoin(spark, Sf)
      val p = plan(df)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"conf-enabled rewrite did not fire:\n$p")
      assert(df.collect().toSeq == RangeJoin.q82(spark, Sf).collect().toSeq)
    } finally spark.conf.unset(graft.plans.RangeJoinRewrite.WidthConf)
  }

  test("range rule matches flipped orientations and strict lower bounds") {
    import org.apache.spark.sql.functions._
    // width conf OFF: only the structural derivation can fire
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf, "0")
    val wins = graft.sources.Tables.orders(spark, Sf)
      .where(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1995-04-01"))
      .select(col("o_orderkey"), unix_timestamp(col("o_orderdate")).as("s"))
    val pts = graft.sources.Tables.lineitem(spark, Sf)
      .select(unix_timestamp(col("l_shipdate")).as("d"))
    // the q82 oracle's own orientation: lo <= p AND hi > p — both
    // comparisons written bound-first
    val flipped = wins.join(pts,
      col("s") <= col("d") &&
        (col("s") + lit(RangeJoin.WindowDays * 86400L)) > col("d"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_items"))
    val p = plan(flipped)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"flipped-orientation rewrite did not fire:\n$p")
    val manual = RangeJoin.q82(spark, Sf)
      .select(col("o_orderkey"), col("n_items")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(flipped.collect().map(r => (r.getLong(0), r.getLong(1))).toMap == manual)
    // strict lower bound: p > lo-1 ⇔ p >= lo — same rows again. The
    // lo-1 bound breaks the structural width derivation (hi is no
    // longer lo + literal), so this form exercises the conf path.
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf,
      (RangeJoin.WindowDays * 86400L).toString)
    try {
      val strictLo = wins.join(pts,
        col("d") > col("s") - lit(1L) &&
          col("d") < col("s") + lit(RangeJoin.WindowDays * 86400L))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_items"))
      val p2 = plan(strictLo)
      assert(!p2.contains("BroadcastNestedLoopJoin") && !p2.contains("CartesianProduct"),
        s"strict-lower rewrite did not fire:\n$p2")
      assert(strictLo.collect().map(r => (r.getLong(0), r.getLong(1))).toMap == manual)
    } finally spark.conf.unset(graft.plans.RangeJoinRewrite.WidthConf)
  }

  test("range rule bins exactly for negative and >2^53 long domains") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // values where a double-cast floor(p/w) loses exactness (2^53+k is
    // not representable) plus a negative (pre-epoch) band — the bins
    // must come from exact integer floor division
    val big = (1L << 53)
    val pts = Seq(-1000003L, -7L, -1L, 0L, 5L, big + 1, big + 255, big + 1001)
      .toDF("p")
    val wins = Seq(-1000005L, -10L, 0L, big + 1, big + 1000).toDF("lo")
      .select(col("lo"), (col("lo") + lit(7L)).as("hi"))
    def joined() = wins.join(pts, col("p") >= col("lo") && col("p") < col("hi"))
      .select(col("lo"), col("p"))
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf, "0")
    val truth = joined().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf, "7")
    try {
      val rewritten = joined()
      val p = plan(rewritten)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rewrite did not fire on the long-domain join:\n$p")
      assert(rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == truth)
    } finally spark.conf.unset(graft.plans.RangeJoinRewrite.WidthConf)
  }

  test("malformed binWidth conf disables the rewrite instead of throwing") {
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf, "not-a-number")
    try {
      val df = RangeJoin.naiveRangeJoin(spark, Sf)
      assert(df.collect().nonEmpty) // optimization must not throw
    } finally spark.conf.unset(graft.plans.RangeJoinRewrite.WidthConf)
  }

  test("q99: 2-D containment rewrites automatically, equals the manual q92 cells") {
    // width conf OFF: both cell widths must derive structurally
    spark.conf.set(graft.plans.RangeJoinRewrite.WidthConf, "0")
    val auto = RangeJoin.q99(spark, Sf)
    val p = plan(auto)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"2-D rule did not rewrite:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
    assert(auto.collect().toSeq == RangeJoin.q92(spark, Sf).collect().toSeq)
  }

  test("q92: 2-D spatial join is an equi-join on cells, pairs meet exactly once") {
    val df = RangeJoin.q92(spark, Sf)
    val p = plan(df)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"cell join must be an equi-join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"spatial join must not nested-loop:\n$p")
    // exactly-once: total matched points equals the direct 2-D
    // containment count (the point side is never replicated)
    import org.apache.spark.sql.functions._
    val rects = graft.sources.Tables.orders(spark, Sf)
      .where(col("o_orderkey") % 100 === 0)
      .select((col("o_orderkey") % 180).as("x_lo"),
        (col("o_orderkey") % 180 + (RangeJoin.CellX - 1)).as("x_hi"),
        (col("o_custkey") % 6).as("y_lo"),
        (col("o_custkey") % 6 + (RangeJoin.CellY - 1)).as("y_hi"))
    val direct = rects.crossJoin(
        graft.sources.Tables.lineitem(spark, Sf)
          .select(col("l_partkey"), col("l_suppkey")))
      .where(col("l_partkey") >= col("x_lo") && col("l_partkey") <= col("x_hi") &&
        col("l_suppkey") >= col("y_lo") && col("l_suppkey") <= col("y_hi"))
      .count()
    assert(df.collect().map(_.getAs[Long]("n_points")).sum == direct)
  }

  test("q78/q80 row parity against direct computation") {
    val pivotTotal = Reshape.q78(spark, Sf).collect()
      .map(r => (1 to 10 by 2).map(i => r.getLong(i)).sum).sum
    val events = graft.sources.Tables.events(spark, Sf).count()
    assert(pivotTotal == events, "pivot cells must partition the event set")
  }
}
