package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map file skipping OVER a generation-logged table, with a
  * clustering-quality metric and a quality-triggered re-layout — the
  * maintenance loop every clustered lake table needs (Delta OPTIMIZE /
  * Iceberg rewrite_data_files, decided by the numbers instead of a
  * cron):
  *
  *   - INGESTION NEVER RE-SORTS. Append waves land as their own
  *     files under a wave partition tag (q199's economics: zone maps
  *     are per-file, so new files may cover wide envelopes — more
  *     candidate files, never wrong answers).
  *   - STATS LIVE IN THE LOG. Every commit records its added files'
  *     envelopes inside its own commit object
  *     ([[GenLog.configureStats]] declares the tracked column once at
  *     table creation; [[GenLog.snapshotStats]] serves the live
  *     set's) — transactional with the data, exactly Delta/Iceberg's
  *     per-file stats. The previous sibling stats TABLE and its
  *     separate absorption step are gone, and with them the crash
  *     window where a snapshot's files could outrun its stats.
  *   - QUALITY IS A METADATA READ. The clustering metric — the
  *     row-weighted mean envelope width over the LIVE files, as a
  *     fraction of the live domain — comes from the snapshot stats
  *     alone. Tight month-files score ~width(month)/domain; an
  *     unsorted append wave scores ~1 for its rows, so the metric
  *     degrades exactly in proportion to how much of the table has
  *     outgrown the layout.
  *   - THE BOUND TRIGGERS THE REWRITE. When the metric crosses
  *     [[WidthBound]], the full current rows re-cluster through
  *     [[GenLog.recluster]] (q209's partition-evolution mechanism):
  *     one new generation under the clustering key, history keeps
  *     its files for time travel, readers never migrate, and the
  *     rewrite commit carries its own files' tight envelopes.
  *
  * The reader re-applies the exact predicate after the pruned read,
  * so — like every skipping layer here — re-layout timing can change
  * COST only, never answers (GenZonedSpec pins the full degrade →
  * trigger → recover cycle with the answer asserted at every stage).
  */
object GenZoned {

  /** The layout's partition column: a coarse clustering bucket for
    * clustered generations, a wave tag for raw append waves.
    */
  final val PartCol = "zone_k"

  /** Re-layout when the row-weighted mean envelope width exceeds
    * this fraction of the live domain. At 0.1, a table whose rows
    * are ≳10% "unsorted" (one full-domain wave per ~10 clustered
    * waves of equal size) rewrites — the knob a real table service
    * exposes per table.
    */
  final val WidthBound = 0.1

  /** One stats row per live data file — (file, cnt, lo, hi) with the
    * tracked column's envelope — straight from the latest snapshot's
    * commit-recorded statistics. Completeness is enforced LOUDLY: a
    * live file without an envelope means the table was committed
    * without [[GenLog.configureStats]], and a silent partial metric
    * would understate decay.
    */
  private def liveStats(spark: SparkSession, loc: String,
                        tracked: String): Seq[(String, Long, Long, Long)] =
    GenLog.snapshotStats(spark, loc).map { fs =>
      val (lo, hi) = fs.cols.getOrElse(tracked, sys.error(
        s"live file ${fs.file} has no commit-recorded '$tracked' envelope " +
          s"at $loc — configureStats must run before the first commit"))
      (fs.file, fs.rows, lo, hi)
    }

  /** The clustering metric: row-weighted mean envelope width of the
    * live files / live domain ∈ [0, 1]. 0 = every file a point;
    * → 1 = every row in full-domain files. Metadata-only (a
    * checkpoint+tail log resolve).
    */
  def quality(spark: SparkSession, loc: String, tracked: String): Double = {
    val s = liveStats(spark, loc, tracked)
    val domain = (s.map(_._4).max - s.map(_._3).min).toDouble
    if (domain == 0) return 0.0
    val rows = s.map(_._2).sum.toDouble
    s.map(r => r._2 * (r._4 - r._3).toDouble).sum / rows / domain
  }

  /** Re-layout IF the quality bound says so: re-cluster the full
    * current rows under `clusterKey` through [[GenLog.recluster]]
    * (one new generation; history keeps its layout — and the commit
    * records the new files' envelopes itself). Returns whether the
    * rewrite ran. Idempotent through GenLog's gen-id guard.
    */
  def maybeRecluster(spark: SparkSession, loc: String, gen: String,
                     clusterKey: Column, tracked: String,
                     bound: Double = WidthBound): Boolean = {
    if (quality(spark, loc, tracked) <= bound) return false
    GenLog.recluster(spark, loc, gen,
      GenLog.readLatest(spark, loc).withColumn(PartCol, clusterKey), PartCol)
    true
  }

  /** PARTIAL re-layout (the liquid-clustering economics): when the
    * quality bound fires, rewrite ONLY the decayed files — the live
    * files whose own envelope width exceeds the bound (the unsorted
    * waves; clustered files score ~width(bucket)/domain and are
    * untouched, byte-identically) — through [[GenLog.replaceFiles]].
    * Rewrite cost ∝ decayed data, never the table: the difference
    * between q214's full recluster and this is the difference between
    * OPTIMIZE FULL and incremental clustering at 100 TB. Returns
    * whether the rewrite ran.
    */
  def maybeReclusterPartial(spark: SparkSession, loc: String, gen: String,
                            clusterKey: Column, tracked: String,
                            bound: Double = WidthBound): Boolean = {
    if (quality(spark, loc, tracked) <= bound) return false
    val s = liveStats(spark, loc, tracked)
    val domain = (s.map(_._4).max - s.map(_._3).min).toDouble
    val wide = s.filter(r => (r._4 - r._3) / domain > bound).map(_._1)
    require(wide.nonEmpty,
      "quality crossed the bound but no single file exceeds it — widen the metric")
    GenLog.replaceFiles(spark, loc, gen, wide, PartCol)(df =>
      df.drop(PartCol).withColumn(PartCol, clusterKey))
    true
  }

  /** Read only the live files whose envelope intersects
    * `[lo, hi]` (epoch micros) on the tracked column — candidate
    * superset; callers re-apply the exact predicate. Empty candidate
    * set short-circuits against the latest generation's schema.
    */
  def prunedRead(spark: SparkSession, loc: String, tracked: String,
                 lo: Long, hi: Long): DataFrame = {
    val files = liveStats(spark, loc, tracked)
      .filter(r => r._4 >= lo && r._3 <= hi).map(_._1)
    if (files.isEmpty) GenLog.readLatest(spark, loc).where(lit(false))
    else spark.read.parquet(files: _*)
  }

  /** Fraction of live files the `[lo, hi]` window keeps — the
    * observable skipping economics (GenZonedSpec asserts recovery
    * after re-layout).
    */
  def matchedFraction(spark: SparkSession, loc: String, tracked: String,
                      lo: Long, hi: Long): Double = {
    val s = liveStats(spark, loc, tracked)
    s.count(r => r._4 >= lo && r._3 <= hi).toDouble / s.size
  }
}
