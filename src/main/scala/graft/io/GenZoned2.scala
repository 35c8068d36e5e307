package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TWO-DIMENSIONAL zone-map skipping over a generation-logged table,
  * with a 2-D clustering-quality metric and a quality-triggered
  * Z-ORDER re-layout — GenZoned's maintenance loop (q214) lifted to
  * the multi-column case a single sort key cannot serve (q195's
  * point, now on a MAINTAINED layout):
  *
  *   - INGESTION NEVER RE-SORTS. Append waves land as their own
  *     files under a wave tag; their envelopes cover the full domain
  *     in BOTH tracked columns — more candidate files, never wrong
  *     answers.
  *   - STATS LIVE IN THE LOG. Both tracked columns' per-file
  *     envelopes are recorded by each commit itself
  *     ([[GenLog.configureStats]] once at creation;
  *     [[GenLog.snapshotStats]] serves the live set's) —
  *     transactional with the data, no sibling stats directory, no
  *     absorption step, no crash lag.
  *   - QUALITY IS A METADATA READ, AND IT IS 2-D: the row-weighted
  *     mean of each file's WORST normalized envelope width,
  *     max(w1/domain1, w2/domain2). A layout sorted on one key alone
  *     scores ~1 (tight in its key, full-domain in the other), so the
  *     metric measures exactly what a 2-D box predicate pays — a 1-D
  *     metric would call a partkey-sorted table "clustered" while
  *     every suppkey predicate scans it all.
  *   - THE BOUND TRIGGERS A Z-ORDER REWRITE. Past [[WidthBound2]] the
  *     current rows re-cluster through [[GenLog.recluster]] keyed by
  *     ALIGNED MORTON BLOCKS of the two columns (q86's curve,
  *     ZOrderLong.zorder2): both keys normalize onto a [[Grid]]²
  *     lattice, interleave, and bucket by the code's top bits — each
  *     bucket is an axis-aligned rectangle of ~1/8 × 1/8 of the
  *     domain, so BOTH envelopes tighten simultaneously. History
  *     keeps its files; readers never migrate.
  *
  * The reader re-applies the exact predicate after the pruned read,
  * so re-layout timing changes COST only, never answers (GenZonedSpec
  * pins the 2-D degrade → tolerate → trigger → recover cycle with the
  * answer asserted at every stage; q228 rides q195's oracle).
  */
object GenZoned2 {

  /** The layout's partition column: an aligned z-block for clustered
    * generations, a wave tag for raw append waves.
    */
  final val PartCol = "z2_k"

  /** Re-layout when the row-weighted mean WORST-dimension envelope
    * width exceeds this fraction of the live domain. The z-block
    * layout floors the metric at ~1/8 per dimension (block geometry),
    * so the bound sits above the clustered floor plus one full-domain
    * wave and below two — the same tolerate-one/trigger-at-two
    * economics as GenZoned.WidthBound, shifted for 2-D geometry.
    */
  final val WidthBound2 = 0.2

  /** Normalization lattice per dimension (2^10). */
  final val Grid = 1024L

  /** Top-bit shift for bucketing the interleaved code: dropping 14 of
    * the 20 lattice bits leaves 64 aligned blocks of 128 × 128
    * lattice cells — 1/8 of each dimension's domain.
    */
  final val BlockShift = 14

  /** The aligned-z-block clustering key for columns `(c1, c2)` whose
    * live maxima are `(max1, max2)`: normalize both onto the lattice,
    * interleave (q86's Morton kernel — codegen'd), keep the top bits.
    * Positive-domain integer arithmetic throughout.
    */
  def blockKey(c1: Column, c2: Column, max1: Long, max2: Long): Column = {
    // positive-domain lattice coordinates; floor(x/y) == integer
    // division here, and the products stay far under 2^53 exactness
    val n1 = floor((c1.cast("long") * lit(Grid)) / lit(max1 + 1))
    val n2 = floor((c2.cast("long") * lit(Grid)) / lit(max2 + 1))
    format_string("z%03d",
      shiftrightunsigned(
        org.apache.spark.sql.graftbridge.ZOrderLong.zorder2(n1, n2),
        BlockShift))
  }

  /** One stats row per live data file: (file, cnt, lo1, hi1, lo2,
    * hi2) — both tracked columns' envelopes, straight from the
    * latest snapshot's commit-recorded statistics. Completeness
    * enforced loudly, as in GenZoned.liveStats.
    */
  private def liveStats(spark: SparkSession, loc: String,
                        c1: String, c2: String)
      : Seq[(String, Long, Long, Long, Long, Long)] =
    GenLog.snapshotStats(spark, loc).map { fs =>
      def env(c: String) = fs.cols.getOrElse(c, sys.error(
        s"live file ${fs.file} has no commit-recorded '$c' envelope at " +
          s"$loc — configureStats must run before the first commit"))
      val ((lo1, hi1), (lo2, hi2)) = (env(c1), env(c2))
      (fs.file, fs.rows, lo1, hi1, lo2, hi2)
    }

  /** The live maxima of both tracked columns — an O(files) metadata
    * read (max of per-file maxes == the global max), never the data.
    */
  def liveMaxes(spark: SparkSession, loc: String,
                c1: String, c2: String): (Long, Long) = {
    val s = liveStats(spark, loc, c1, c2)
    (s.map(_._4).max, s.map(_._6).max)
  }

  /** The 2-D clustering metric: row-weighted mean over live files of
    * max(width1/domain1, width2/domain2) ∈ [0, 1]. Metadata-only.
    */
  def quality(spark: SparkSession, loc: String,
              c1: String, c2: String): Double = {
    val s = liveStats(spark, loc, c1, c2)
    val d1 = (s.map(_._4).max - s.map(_._3).min).toDouble
    val d2 = (s.map(_._6).max - s.map(_._5).min).toDouble
    val rows = s.map(_._2).sum.toDouble
    s.map { r =>
      val w1 = if (d1 == 0) 0.0 else (r._4 - r._3) / d1
      val w2 = if (d2 == 0) 0.0 else (r._6 - r._5) / d2
      r._2 * math.max(w1, w2)
    }.sum / rows
  }

  /** Re-layout IF the 2-D quality bound says so: re-cluster the full
    * current rows into aligned Morton blocks of `(c1, c2)` through
    * [[GenLog.recluster]] (one new generation; history keeps its
    * layout; the commit records its own envelopes). Returns whether
    * the rewrite ran. Idempotent through GenLog's gen-id guard.
    */
  def maybeRecluster(spark: SparkSession, loc: String, gen: String,
                     c1: String, c2: String,
                     bound: Double = WidthBound2): Boolean = {
    if (quality(spark, loc, c1, c2) <= bound) return false
    val (m1, m2) = liveMaxes(spark, loc, c1, c2)
    GenLog.recluster(spark, loc, gen,
      GenLog.readLatest(spark, loc)
        .withColumn(PartCol, blockKey(col(c1), col(c2), m1, m2)),
      PartCol)
    true
  }

  /** PARTIAL 2-D re-layout (liquid clustering in two dimensions):
    * when the quality bound fires, rewrite ONLY the decayed files —
    * the live files whose own WORST-dimension envelope exceeds the
    * bound (the unsorted waves; aligned z-blocks score ~1/8 per dim
    * and are untouched, byte-identically) — through
    * [[GenLog.replaceFiles]], re-keyed into Morton blocks. Rewrite
    * cost ∝ decayed data, never the table. Returns whether the
    * rewrite ran.
    */
  def maybeReclusterPartial(spark: SparkSession, loc: String, gen: String,
                            c1: String, c2: String,
                            bound: Double = WidthBound2): Boolean = {
    if (quality(spark, loc, c1, c2) <= bound) return false
    val s = liveStats(spark, loc, c1, c2)
    val d1 = (s.map(_._4).max - s.map(_._3).min).toDouble
    val d2 = (s.map(_._6).max - s.map(_._5).min).toDouble
    val wide = s.filter { r =>
      val w1 = if (d1 == 0) 0.0 else (r._4 - r._3) / d1
      val w2 = if (d2 == 0) 0.0 else (r._6 - r._5) / d2
      math.max(w1, w2) > bound
    }.map(_._1)
    require(wide.nonEmpty,
      "quality crossed the bound but no single file exceeds it — widen the metric")
    val (m1, m2) = liveMaxes(spark, loc, c1, c2)
    GenLog.replaceFiles(spark, loc, gen, wide, PartCol)(df =>
      df.drop(PartCol)
        .withColumn(PartCol, blockKey(col(c1), col(c2), m1, m2)))
    true
  }

  /** Read only the live files whose envelopes intersect the 2-D box
    * `[lo1, hi1] × [lo2, hi2]` — candidate superset pruned on BOTH
    * columns simultaneously; callers re-apply the exact predicate.
    */
  def prunedRead(spark: SparkSession, loc: String, c1: String, c2: String,
                 lo1: Long, hi1: Long, lo2: Long, hi2: Long): DataFrame = {
    val files = liveStats(spark, loc, c1, c2)
      .filter(r => r._4 >= lo1 && r._3 <= hi1 && r._6 >= lo2 && r._5 <= hi2)
      .map(_._1)
    if (files.isEmpty) GenLog.readLatest(spark, loc).where(lit(false))
    else spark.read.parquet(files: _*)
  }

  /** Fraction of live files the 2-D box keeps — the observable
    * skipping economics (GenZonedSpec asserts recovery after the
    * z-order re-layout).
    */
  def matchedFraction(spark: SparkSession, loc: String, c1: String, c2: String,
                      lo1: Long, hi1: Long, lo2: Long, hi2: Long): Double = {
    val s = liveStats(spark, loc, c1, c2)
    s.count(r => r._4 >= lo1 && r._3 <= hi1 && r._6 >= lo2 && r._5 <= hi2)
      .toDouble / s.size
  }
}
