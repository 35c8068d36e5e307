package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.AnalyzeOps

/** The ANALYZE→plan loop, pinned at the PLAN level: q188's bin-width
  * literal and q189's join strategy must FOLLOW the persisted stats
  * table — doctored stats move the plan, absent stats leave the naive
  * plan, and (q189) the rows never move at all. These are the asserts
  * that make "executed CBO" a property of the tree rather than a
  * scaladoc claim.
  */
class StatsPlanSpec extends SparkTestBase {

  private def physical(df: DataFrame): String =
    df.queryExecution.sparkPlan.toString

  /** Divisor literals of every integral divide in the optimized plan
    * — where the range rewrite's bin width lands (floorDiv is built
    * from IntegralDivide by the width literal, on both join sides).
    */
  private def widthLits(df: DataFrame): Set[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    df.queryExecution.optimizedPlan.flatMap(
      _.expressions.flatMap(_.collect {
        case d: IntegralDivide => d.right match {
          case Literal(w: Long, _) => Some(w)
          case _ => None
        }
      }.flatten)).toSet
  }

  /** Independent recount of the q188 decision arithmetic from a stats
    * table's stored row (deliberately re-derived here, not shared
    * with the implementation).
    */
  private def expectedWidth(statsTable: String): Long = {
    val r = spark.table(statsTable)
      .where(col("col_name") === AnalyzeOps.BandCol)
      .select(col("n"), col("min_v"), col("max_v")).head()
    val bins = 64 - java.lang.Long.numberOfLeadingZeros(r.getLong(0))
    val binW =
      math.floor((r.getDouble(2) - r.getDouble(1)) / bins * 1000000.0 + 0.5) /
        1000000.0
    math.ceil(binW * 100.0).toLong
  }

  test("q188: the plan's bin-width literal is read from the stored stats; " +
    "doctored stats move it; absent stats leave the nested loop") {
    val t = AnalyzeOps.ensureStatsTable(spark, Sf)
    val w = expectedWidth(t)
    val df = AnalyzeOps.statsBandedJoin(spark, Sf, t)
    val p = physical(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"stats-published width did not rewrite the containment join:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
    assert(widthLits(df).contains(w),
      s"plan width literals ${widthLits(df)} do not carry the stored-stats width $w")

    // doctored stats: 512x the row count => Sturges bins grow by 9 and
    // the recommended width shrinks — the PLAN must follow the store
    val doctored = "graft_statsplan_doctored"
    spark.table(t).withColumn("n", col("n") * 512)
      .createOrReplaceTempView(doctored)
    val w2 = expectedWidth(doctored)
    assert(w2 != w, "fixture: doctoring must change the decision")
    val df2 = AnalyzeOps.statsBandedJoin(spark, Sf, doctored)
    assert(widthLits(df2).contains(w2) && !widthLits(df2).contains(w),
      s"doctored stats ($w2) did not move the plan literal: ${widthLits(df2)}")

    // the CBO invariant: the rewrite moved the plan, not the rows —
    // the same bands joined naively (no conf, nested loop) agree
    import spark.implicits._
    val row = spark.table(t).where(col("col_name") === AnalyzeOps.BandCol)
      .select(col("n"), col("min_v"), col("max_v")).head()
    val bins = 64 - java.lang.Long.numberOfLeadingZeros(row.getLong(0))
    val lo0 = math.floor(row.getDouble(1) * 100.0 + 0.5).toLong
    val bands = (0 until bins)
      .map(b => (b, lo0 + b * w,
        lo0 + (b + 1) * w + (if (b == bins - 1) 1L else 0L)))
      .toDF("band", "lo", "hi")
    val pts = graft.sources.Tables.lineitem(spark, Sf)
      .select(floor(col(AnalyzeOps.BandCol) * 100.0 + lit(0.5)).as("p"),
        col("l_quantity"))
    val naive = pts.join(bands, col("p") >= col("lo") && col("p") < col("hi"))
      .groupBy(col("band"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("band"))
    // the shared session may carry a width conf from another suite —
    // "absent stats" means the conf is off
    spark.conf.unset(graft.plans.RangeJoinRewrite.WidthConf)
    val pNaive = physical(naive)
    assert(pNaive.contains("BroadcastNestedLoopJoin") ||
      pNaive.contains("CartesianProduct"),
      s"without published stats the containment join must nested-loop:\n$pNaive")
    assert(df.collect().toSeq == naive.collect().toSeq,
      "the stats-driven rewrite changed the rows")
    // the banding PARTITIONS the corpus: the inclusive top edge means
    // no row can fall off the end even when the rounded width exactly
    // tiles the range
    val banded = df.agg(sum(col("n_rows"))).head().getLong(0)
    val totalRows = graft.sources.Tables.lineitem(spark, Sf).count()
    assert(banded == totalRows,
      s"banding dropped rows: $banded of $totalRows assigned")
  }

  test("q189: broadcast-vs-shuffle follows the stored est_ndv; rows identical") {
    val t = AnalyzeOps.ensureStatsTable(spark, Sf)
    // isolate the STATS decision from Spark's size-estimate broadcast
    // (at spec scale the raw files are under the auto threshold; at
    // the stats' nominal scale they are not)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val bcast = AnalyzeOps.statsDictJoin(spark, Sf, t)
      assert(physical(bcast).contains("BroadcastHashJoin"),
        s"low-card stats must broadcast the dictionary:\n${physical(bcast)}")
      val doctored = "graft_statsplan_doctored_ndv"
      spark.table(t).withColumn("est_ndv", col("est_ndv") + lit(1000000.0))
        .createOrReplaceTempView(doctored)
      val shuffled = AnalyzeOps.statsDictJoin(spark, Sf, doctored)
      assert(!physical(shuffled).contains("BroadcastHashJoin"),
        s"high-card stats must not broadcast:\n${physical(shuffled)}")
      // stats move the plan, never the rows
      assert(bcast.collect().toSeq == shuffled.collect().toSeq)
    } finally spark.conf.set(key, prev)
  }

  test("q198: aggregation strategy follows the stored top-key share; rows identical") {
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    def aggPairs(df: DataFrame): Int =
      df.queryExecution.sparkPlan.collect { case a: HashAggregateExec => a }.size
    def hasSalt(df: DataFrame): Boolean =
      physical(df).toLowerCase.contains("pmod")
    val t = AnalyzeOps.ensureSkewStats(spark, Sf)
    // the real corpus: 5 event types over 100k+ rows → the top key
    // holds far more than SkewShare → the salted two-phase plan
    val salted = AnalyzeOps.statsSkewAgg(spark, Sf, t)
    assert(hasSalt(salted),
      s"skewed stats must pick the salted plan:\n${physical(salted)}")
    assert(aggPairs(salted) >= 4,
      "salted strategy must run two aggregate pairs (wide + combine)")
    // doctored stats: a uniform key → the single-exchange plan
    val doctored = "graft_statsplan_doctored_skew"
    spark.table(t).withColumn("top_share", lit(0.01))
      .createOrReplaceTempView(doctored)
    val plain = AnalyzeOps.statsSkewAgg(spark, Sf, doctored)
    assert(!hasSalt(plain),
      s"uniform stats must pick the plain aggregate:\n${physical(plain)}")
    assert(aggPairs(plain) <= 2)
    // strategy moves the plan, never the rows
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("q208: access path follows the stats cost estimate; rows identical") {
    import graft.queries.Layout
    val (t, st) = Layout.ensureShipdateZoned(spark, Sf)
    val total = spark.table(t).inputFiles.length
    // the wide window: candidate rows + fresh opens price above the
    // catalog scan → the optimizer DECLINES its index
    val (wPath, wide) = Layout.accessPathRead(spark, t, st,
      Layout.WideLo, Layout.WideHi)
    assert(wPath == "flat" && wide.inputFiles.length == total,
      s"wide window must flat-scan all $total files, got $wPath/${wide.inputFiles.length}")
    // the narrow window: the same estimate picks the pruned list
    val (nPath, narrow) = Layout.accessPathRead(spark, t, st,
      Layout.ShipLo, Layout.ShipHi)
    assert(nPath == "envelope" && narrow.inputFiles.length < total / 4,
      s"narrow window must prune, got $nPath/${narrow.inputFiles.length} of $total")
    // the cost model is SCALE-AWARE where a fraction threshold is
    // not: doctor the same stats to 100× rows per file and the wide
    // window's absolute savings now dominate the fixed open charge
    val heavy = "graft_statsplan_doctored_cnt"
    spark.table(st).withColumn("cnt", col("cnt") * 100)
      .createOrReplaceTempView(heavy)
    val (hPath, _) = Layout.accessPathRead(spark, t, heavy,
      Layout.WideLo, Layout.WideHi)
    assert(hPath == "envelope",
      s"100× rows/file must flip the wide window to pruned, got $hPath")
    // the path moves the plan, never the rows: force BOTH paths over
    // the SAME (wide) window and compare
    def agg(df: DataFrame) = df.where(
        col("l_shipdate").between(lit(Layout.WideLo).cast("timestamp"),
          lit(Layout.WideHi).cast("timestamp")))
      .groupBy(col("l_returnflag")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val forcedPruned = graft.io.ZoneMaps.prunedRead(spark, t, st,
      Seq(("l_shipdate", s"${Layout.WideLo} 00:00:00", s"${Layout.WideHi} 00:00:00")))
    assert(agg(wide) == agg(forcedPruned))
  }

  test("q212: the selector lands on each of flat/envelope/bloom/compound as the doctored stats dictate; rows identical") {
    import graft.queries.Layout
    import graft.io.ZoneMaps
    val (t, st) = Layout.ensureBloomZoned(spark, Sf)
    val ks = Layout.probeOrderkeys(spark, Sf)
    val hashes = ks.map(k => graft.functions.TextKernels.hash60StrCol(
      lit(k).cast("string")) % graft.functions.TextFns.P)
    val ranges = Seq(("l_shipdate",
      s"${Layout.CsLo} 00:00:00", s"${Layout.CsHi} 00:00:00"): (String, Any, Any))
    def run(statsTable: String): (String, Set[(Long, Long)]) = {
      val (path, df) = ZoneMaps.selectAccessPath(spark, t, statsTable, ranges, hashes)
      (path, df.where(col("l_orderkey").isin(ks: _*) &&
          col("l_shipdate").between(lit(Layout.CsLo).cast("timestamp"),
            lit(Layout.CsHi).cast("timestamp")))
        .groupBy(col("l_orderkey")).count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
    // honest stats at this SF: ~190-row files under a 1000-row open
    // charge — EVERY pruned path honestly prices above the catalog
    // scan, and the optimizer declines its whole index
    val (p0, r0) = run(st)
    assert(p0 == "flat",
      s"tiny files must make every pruned path lose to flat, got $p0")
    assert(r0.nonEmpty)
    // 100× rows per file (the at-scale file sizing): the open charge
    // stops dominating and the intersection prices lowest
    val heavy = "graft_statsplan_q212_heavy"
    spark.table(st).withColumn("cnt", col("cnt") * 100)
      .createOrReplaceTempView(heavy)
    val (pH, rH) = run(heavy)
    assert(pH == "compound", s"at-scale stats must pick compound, got $pH")
    // saturated Blooms keep every file → the Bloom dimension buys
    // nothing and the envelope alone must carry the pruning
    val satBloom = "graft_statsplan_sat_bloom"
    spark.table(heavy)
      .withColumn("bloom", array_repeat(lit(-1L),
        graft.functions.BloomSketch.NumWords))
      .createOrReplaceTempView(satBloom)
    val (p1, r1) = run(satBloom)
    assert(p1 == "envelope", s"saturated Blooms must leave envelope, got $p1")
    // domain-wide envelopes keep every file → only the Blooms prune
    val wideEnv = "graft_statsplan_wide_env"
    spark.table(heavy)
      .withColumn("l_shipdate_min", lit("1970-01-01").cast("timestamp"))
      .withColumn("l_shipdate_max", lit("2999-01-01").cast("timestamp"))
      .createOrReplaceTempView(wideEnv)
    val (p2, r2) = run(wideEnv)
    assert(p2 == "bloom", s"useless envelopes must leave bloom, got $p2")
    // both dimensions saturated → every pruned path reads everything
    // AND pays fresh opens → back to the flat scan
    val flatAll = "graft_statsplan_sat_both"
    spark.table(satBloom)
      .withColumn("l_shipdate_min", lit("1970-01-01").cast("timestamp"))
      .withColumn("l_shipdate_max", lit("2999-01-01").cast("timestamp"))
      .createOrReplaceTempView(flatAll)
    val (p3, r3) = run(flatAll)
    assert(p3 == "flat", s"fully saturated stats must fall back to flat, got $p3")
    // five plans, one answer — access-path selection is answer-neutral
    assert(rH == r0 && r1 == r0 && r2 == r0 && r3 == r0,
      "the chosen path moved the rows")
  }
}
