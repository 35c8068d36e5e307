package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.functions.VecFns
import graft.operators.KMeansCodebook

/** Streaming vector ingestion: embedding micro-batches absorbed into
  * the cell-partitioned ANN store (q182's layout) through a
  * foreachBatch seam — the vector-store twin of the q183 sketch seam,
  * composing it with q190's frozen-codebook maintenance.
  *
  * Ingestion semantics: every arriving vector is ASSIGNED under the
  * frozen persisted codebook (a pure per-vector function — nothing
  * retrains) and APPENDED into its cell's partition directory. Waves
  * are vec_id-disjoint, so append IS the correct merge (no updates),
  * and it writes only new files — zero rewrite amplification, unlike
  * a merge that rewrites the touched partitions. The cost of a batch
  * is batch-sized assignment + one file per touched cell; the store
  * is never rewritten. Accumulated small files are the standard
  * compaction story (Warehouse.compactPartition, exercised by
  * WarehouseMaintSpec).
  *
  * Exactly-once: the append is atomic per micro-batch (insertInto is
  * all-or-nothing; an uncommitted job leaves only _temporary files,
  * which scans ignore) but NOT idempotent, so each batch is guarded
  * by a DATA probe — the batch's first (vec_id, cell) row, looked up
  * with a literal cell predicate (a partition-pruned one-directory
  * read). Presence of that row ⇔ the whole batch committed. The
  * guard's soundness leans on `maxFilesPerTrigger=1`: every batch is
  * exactly one staged wave file in EVERY run (fresh checkpoints
  * included), so batch composition can never straddle a crash. A
  * `stream_complete` ingest-log marker lets later sessions skip the
  * replay entirely; durability lives in the table, never the
  * checkpoint (deleted eagerly, the q183 discipline).
  */
object VectorIngest {

  /** Number of staged ingest waves (stream micro-batches). */
  final val Waves = 4

  private[graft] def waveTable(dir: String): String =
    s"graft_emb_waves_${java.lang.Integer.toHexString(dir.hashCode)}"

  private[graft] def storeTable(dir: String): String =
    s"graft_emb_cellstream_${java.lang.Integer.toHexString(dir.hashCode)}"

  /** The corpus staged as `Waves` single-file wave partitions — the
    * stream's source directory (in production this is the landing
    * zone an upstream producer writes; here it derives from the
    * corpus with the standard fingerprint economics).
    */
  private def ensureWaveFiles(spark: SparkSession, dir: String): String = {
    val t = waveTable(dir)
    graft.io.Warehouse.ensurePartitionedTable(spark, t,
      s"$dir/embeddings.parquet", "wave") {
      graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"),
          pmod(col("vec_id"), lit(Waves)).cast("int").as("wave"))
        .repartition(col("wave"))
    }
    t
  }

  /** Ensure the streamed cell store is registered AND fully ingested;
    * returns the table name. Reruns are metadata-only once the
    * `stream_complete` marker is present.
    */
  def ensureStreamedCellStore(spark: SparkSession, dir: String): String = {
    val t = storeTable(dir)
    graft.io.Warehouse.ensureMaintainedPartitionedTable(spark, t,
      s"$dir/embeddings.parquet",
      "vec_id BIGINT, embedding ARRAY<FLOAT>, nrm DOUBLE, cell INT", "cell")
    if (!graft.io.Warehouse.ingestLogContains(spark, t, "stream_complete")) {
      streamIngest(spark, dir, t)
      graft.io.Warehouse.ingestLogAdd(spark, t, "stream_complete")
    }
    t
  }

  private def streamIngest(spark: SparkSession, dir: String, t: String): Unit = {
    val waves = ensureWaveFiles(spark, dir)
    val waveLoc = graft.io.Warehouse.tableLocation(spark, waves)
    // frozen coarse quantizer: trained once (or reread) from the
    // persisted artifact; the k×dim array is closure-captured into
    // every micro-batch
    val cents = KMeansCodebook.persisted(spark, dir,
      graft.queries.AnnTrained.Cells, graft.queries.AnnTrained.Iters)
    val src = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, wave INT")
      .option("maxFilesPerTrigger", "1") // one wave file per batch — the guard's atomicity unit
      .parquet(waveLoc)
    val ckptBase =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-ckpt"
      else s"${System.getProperty("java.io.tmpdir")}/graft-ckpt"
    val ckpt = s"$ckptBase/vec-ingest-${java.util.UUID.randomUUID()}"
    val q = src.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        absorbBatch(batch, cents, t)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally org.apache.spark.network.util.JavaUtils.deleteRecursively(
      new java.io.File(ckpt))
    // appends ran under micro-batch session clones; refresh the
    // caller's relation cache (q183's cross-session cache trap)
    spark.catalog.refreshTable(t)
  }

  /** The hot cell compacted by [[ensureCompactedHotCell]]. */
  final val HotCell = 0

  /** Compact the streamed store's hot cell (per-batch appends leave
    * one file per batch per cell — the deliberate cost of
    * rewrite-free ingestion) back to a single file, exactly once per
    * corpus generation. Targeted, not global: production compaction
    * runs on the partitions whose read latency pays for the rewrite —
    * the rest keep their append-history files. Rewrites only the one
    * partition directory (upsertPartitions dynamic overwrite), so the
    * probe path, the answers, and every other cell's files are
    * untouched; q200's shared q182 oracle certifies exactly that.
    */
  def ensureCompactedHotCell(spark: SparkSession, dir: String): String = {
    val t = ensureStreamedCellStore(spark, dir)
    val marker = s"compact_cell$HotCell"
    if (!graft.io.Warehouse.ingestLogContains(spark, t, marker)) {
      graft.io.Warehouse.compactPartition(spark, t, "cell", HotCell.toString)
      graft.io.Warehouse.ingestLogAdd(spark, t, marker)
    }
    t
  }

  /** Assign one micro-batch under the frozen codebook and absorb it
    * with an INLINE exactly-once protocol: probe, then plain append
    * or partition-scoped keyed-merge repair. Deliberately NOT
    * [[graft.io.Warehouse.appendExactlyOnce]] — that helper repairs a
    * partial commit by deleting "the batch's files", which is sound
    * only while generational files are never merged; THIS store has a
    * compaction lifecycle (q200 collapses a cell's files), so a
    * batch's rows can share a file with sibling batches and the
    * file-delete repair would destroy them. The presence predicate is
    * the batch's wave class (the staged waves ARE `vec_id % Waves`
    * classes, so one pmod literal identifies exactly this batch's
    * rows) intersected with its touched cells — the presence scan is
    * partition-pruned to the same directories the append writes, cost
    * ∝ the batch's cells' contents. A crash anywhere — including
    * inside the multi-directory job commit, which is NOT atomic
    * across cells — is repaired on replay: fully-present skips,
    * absent appends, partial triggers [[graft.io.Warehouse
    * .upsertMergeByKey]], which rewrites the touched cells as
    * (existing non-batch rows) ∪ batch and converges from any
    * intermediate state.
    */
  private def absorbBatch(batch: Dataset[Row], cents: Array[Array[Double]],
                          t: String): Unit = {
    val ss = batch.sparkSession
    val v = batch.select(col("vec_id"), col("embedding"),
      VecFns.normK(col("embedding")).as("nrm"))
    val assigned = KMeansCodebook.assignCells(v, KMeansCodebook.centsFrame(ss, cents))
      .join(v, "vec_id")
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = assigned.count()
      if (n > 0) {
        val w = assigned.select(pmod(col("vec_id"), lit(Waves.toLong)))
          .limit(1).collect()(0).getLong(0)
        // touched cells: bounded by the codebook size
        val cells = assigned.select(col("cell")).distinct()
          .collect().map(_.getInt(0))
        val presence =
          col("cell").isin(cells.map(c => c: java.lang.Integer).toIndexedSeq: _*) &&
            pmod(col("vec_id"), lit(Waves.toLong)) === lit(w)
        val present = ss.table(t).where(presence).count()
        if (present != n) {
          if (present == 0)
            // fast path: plain per-cell file append, zero rewrite
            assigned.select(ss.table(t).columns.map(col).toIndexedSeq: _*)
              .repartition(col("cell"))
              .write.mode("append").insertInto(t)
          else
            // partial commit exposed part of the batch. File-delete
            // repair is UNSOUND here: q200's compaction merges
            // batches' rows into shared files, so dropping "the
            // batch's files" can destroy sibling batches that were
            // already checked this replay. The partition-scoped keyed
            // merge converges from ANY intermediate state: touched
            // cells are rewritten as (existing non-batch rows) ∪
            // batch, other partitions untouched.
            graft.io.Warehouse.upsertMergeByKey(ss, t, assigned,
              "cell", "vec_id")
          ss.catalog.refreshTable(t)
        }
      }
    } finally { assigned.unpersist(blocking = false); () }
  }
}
