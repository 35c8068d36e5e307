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

  test("q208: access path follows the stats-estimated matched fraction; rows identical") {
    import graft.queries.Layout
    val (t, st) = Layout.ensureShipdateZoned(spark, Sf)
    val total = spark.table(t).inputFiles.length
    // the wide window: the estimate exceeds the threshold → the
    // optimizer DECLINES its index and takes the catalog flat scan
    val (wPath, wide) = Layout.accessPathRead(spark, t, st,
      Layout.WideLo, Layout.WideHi)
    assert(wPath == "flat" && wide.inputFiles.length == total,
      s"wide window must flat-scan all $total files, got $wPath/${wide.inputFiles.length}")
    // the narrow window: the same decision picks the pruned list
    val (nPath, narrow) = Layout.accessPathRead(spark, t, st,
      Layout.ShipLo, Layout.ShipHi)
    assert(nPath == "pruned" && narrow.inputFiles.length < total / 4,
      s"narrow window must prune, got $nPath/${narrow.inputFiles.length} of $total")
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
}
