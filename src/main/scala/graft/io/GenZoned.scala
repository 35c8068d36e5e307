package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map file skipping OVER a generation-logged table, with a
  * persisted clustering-quality metric and a quality-triggered
  * re-layout — the maintenance loop every clustered lake table needs
  * (Delta OPTIMIZE / Iceberg rewrite_data_files, decided by the
  * numbers instead of a cron):
  *
  *   - INGESTION NEVER RE-SORTS. Append waves land as their own
  *     files under a wave partition tag (q199's economics: zone maps
  *     are per-file, so new files may cover wide envelopes — more
  *     candidate files, never wrong answers).
  *   - STATS ABSORB INCREMENTALLY. One stats row per data file
  *     (row count + tracked-column min/max), appended for exactly
  *     the files not yet known — absorption scans the fresh files
  *     only, is idempotent by file-name anti-join, and stat rows are
  *     immutable so re-clustered history's rows simply stop matching
  *     the live set. The stats directory sits BESIDE the table
  *     (`<loc>_zstats`), outside the log's data-file namespace.
  *   - QUALITY IS A METADATA READ. The clustering metric — the
  *     row-weighted mean envelope width over the LIVE files, as a
  *     fraction of the live domain — comes from the stats rows
  *     alone. Tight month-files score ~width(month)/domain; an
  *     unsorted append wave scores ~1 for its rows, so the metric
  *     degrades exactly in proportion to how much of the table has
  *     outgrown the layout.
  *   - THE BOUND TRIGGERS THE REWRITE. When the metric crosses
  *     [[WidthBound]], the full current rows re-cluster through
  *     [[GenLog.recluster]] (q209's partition-evolution mechanism):
  *     one new generation under the clustering key, history keeps
  *     its files for time travel, readers never migrate, and the
  *     next stats absorption restores the tight envelopes.
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

  /** The stats directory for the layout at `loc` — a SIBLING, so the
    * log's data-file listing never sees stat files.
    */
  def statsLoc(loc: String): String = loc.stripSuffix("/") + "_zstats"

  /** One stats row per live data file: (file, cnt, lo, hi) with the
    * tracked timestamp column's envelope in epoch MICROS (exact
    * integer arithmetic, no zone ambiguity in the metric).
    */
  private def readStats(spark: SparkSession, loc: String): Seq[(String, Long, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(statsLoc(loc))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    spark.read.parquet(statsLoc(loc))
      .select(col("file"), col("cnt"), col("lo"), col("hi"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  /** Append stats rows for the latest generation's files not yet
    * known — the scan reads ONLY the fresh files (cost ∝ the newly
    * committed wave), and a replay after a crash between data commit
    * and stats append finds the same fresh set again (idempotent
    * convergence). Returns the number of files absorbed.
    */
  def absorbStats(spark: SparkSession, loc: String, tracked: String): Int = {
    val live = latestLive(spark, loc)
    val known = readStats(spark, loc).map(_._1).toSet
    val fresh = live.filterNot(known)
    if (fresh.isEmpty) return 0
    import spark.implicits._
    // one stats row per fresh file, collected (O(fresh files) —
    // metadata scale, same class as every readStats) so the file key
    // normalizes through URI DECODING to the log's plain-path form —
    // a scheme-strip regexp would leave percent-encoded paths that
    // never match the live list (spaces, non-ASCII partition values)
    val stats = spark.read.parquet(fresh: _*)
      .groupBy(input_file_name().as("raw"))
      // the tracked column may be TIMESTAMP_NTZ (parquet wall time);
      // the UTC session makes the cast an exact instant mapping
      .agg(count(lit(1)).as("cnt"),
        min(unix_micros(col(tracked).cast("timestamp"))).as("lo"),
        max(unix_micros(col(tracked).cast("timestamp"))).as("hi"))
      .collect()
      .map { r =>
        // an all-null tracked column leaves NULL min/max aggregates;
        // a silent getLong would NPE here — fail loudly naming the
        // file (an envelope cannot be stated for a stat-less file)
        require(!r.isNullAt(2) && !r.isNullAt(3),
          s"file ${r.getString(0)} has an all-null '$tracked' column — " +
            "no envelope can be absorbed for it")
        (new org.apache.hadoop.fs.Path(
          new java.net.URI(r.getString(0))).toUri.getPath,
          r.getLong(1), r.getLong(2), r.getLong(3))
      }.toSeq
    stats.toDF("file", "cnt", "lo", "hi")
      .write.mode("append").parquet(statsLoc(loc))
    fresh.size
  }

  private def latestLive(spark: SparkSession, loc: String): Seq[String] = {
    val gens = GenLog.generations(spark, loc)
    require(gens.nonEmpty, s"no generations committed at $loc")
    gens.last._2
  }

  /** Live-file stats rows (the join of the stats store with the
    * latest live set — re-clustered history's immutable rows simply
    * stop matching).
    */
  private def liveStats(spark: SparkSession, loc: String): Seq[(String, Long, Long, Long)] = {
    val live = latestLive(spark, loc).toSet
    val s = readStats(spark, loc).filter(r => live.contains(r._1))
    require(s.map(_._1).toSet == live,
      s"stats rows missing for live files at $loc — absorbStats must run after every commit")
    s
  }

  /** The clustering metric: row-weighted mean envelope width of the
    * live files / live domain ∈ [0, 1]. 0 = every file a point;
    * → 1 = every row in full-domain files. Metadata-only.
    */
  def quality(spark: SparkSession, loc: String): Double = {
    val s = liveStats(spark, loc)
    val domain = (s.map(_._4).max - s.map(_._3).min).toDouble
    if (domain == 0) return 0.0
    val rows = s.map(_._2).sum.toDouble
    s.map(r => r._2 * (r._4 - r._3).toDouble).sum / rows / domain
  }

  /** Re-layout IF the quality bound says so: re-cluster the full
    * current rows under `clusterKey` through [[GenLog.recluster]]
    * (one new generation; history keeps its layout) and absorb the
    * new files' stats. Returns whether the rewrite ran. Idempotent
    * through GenLog's gen-id guard.
    */
  def maybeRecluster(spark: SparkSession, loc: String, gen: String,
                     clusterKey: Column, tracked: String,
                     bound: Double = WidthBound): Boolean = {
    if (quality(spark, loc) <= bound) return false
    GenLog.recluster(spark, loc, gen,
      GenLog.readLatest(spark, loc).withColumn(PartCol, clusterKey), PartCol)
    absorbStats(spark, loc, tracked)
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
    if (quality(spark, loc) <= bound) return false
    val s = liveStats(spark, loc)
    val domain = (s.map(_._4).max - s.map(_._3).min).toDouble
    val wide = s.filter(r => (r._4 - r._3) / domain > bound).map(_._1)
    require(wide.nonEmpty,
      "quality crossed the bound but no single file exceeds it — widen the metric")
    GenLog.replaceFiles(spark, loc, gen, wide, PartCol)(df =>
      df.drop(PartCol).withColumn(PartCol, clusterKey))
    absorbStats(spark, loc, tracked)
    true
  }

  /** Read only the live files whose envelope intersects
    * `[lo, hi]` (epoch micros) on the tracked column — candidate
    * superset; callers re-apply the exact predicate. Empty candidate
    * set short-circuits against the latest generation's schema.
    */
  def prunedRead(spark: SparkSession, loc: String,
                 lo: Long, hi: Long): DataFrame = {
    val files = liveStats(spark, loc)
      .filter(r => r._4 >= lo && r._3 <= hi).map(_._1)
    if (files.isEmpty) GenLog.readLatest(spark, loc).where(lit(false))
    else spark.read.parquet(files: _*)
  }

  /** Fraction of live files the `[lo, hi]` window keeps — the
    * observable skipping economics (GenZonedSpec asserts recovery
    * after re-layout).
    */
  def matchedFraction(spark: SparkSession, loc: String,
                      lo: Long, hi: Long): Double = {
    val s = liveStats(spark, loc)
    s.count(r => r._4 >= lo && r._3 <= hi).toDouble / s.size
  }
}
