package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A generation log: the minimal transaction-log storage protocol
  * (the Delta/Iceberg core idea, executed small). The directory is
  * APPEND-ONLY — maintenance writes add files and never delete — and
  * a log at the root records, per generation, the exact live file
  * set. Everything else falls out of that one inversion:
  *
  *   - READERS RESOLVE THE LOG, NOT THE DIRECTORY. A query pins a
  *     generation's file list, so concurrent/later writes are
  *     invisible (snapshot isolation without locks).
  *   - LOGICAL OVERWRITE: restating a partition adds the new files
  *     and marks the old ones removed IN THE LOG — the bytes stay, so
  *     every earlier generation still reads bit-identically (time
  *     travel across overwrites).
  *   - CRASH SAFETY: files land before the log entry (temp+rename,
  *     the ingest-log discipline); a crash between leaves orphans
  *     that no reader can see and vacuum later collects. Exactly-once
  *     needs no data probes here — visibility IS the commit.
  *   - VACUUM: files referenced by no retained generation (plus
  *     crash orphans) are deleted; retained generations keep reading
  *     exactly what they read before.
  *
  * The log lists each generation's live set in full (O(gens × files)
  * — at real scale the log would store add/remove deltas and
  * checkpoints; the protocol is identical). Single-writer per table,
  * like every maintenance path here.
  *
  * Batch contract for [[appendBatch]]: the frame carries `partCol`,
  * and RESTATES every partition value it contains completely — the
  * previous generation's files for exactly those partitions are
  * marked removed. partitionBy guarantees one partition value per
  * file, so removal-by-path never strands rows of an untouched
  * partition.
  */
object GenLog {

  final val LogFile = "_graft_genlog"

  private def fsOf(spark: SparkSession, loc: String) = {
    val p = new org.apache.hadoop.fs.Path(loc)
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  /** All data files currently on disk (orphans included). */
  private def listDataFiles(spark: SparkSession, loc: String): Set[String] = {
    val (p, fs) = fsOf(spark, loc)
    if (!fs.exists(p)) return Set.empty
    def walk(s: org.apache.hadoop.fs.FileStatus): Seq[String] =
      if (s.isDirectory) fs.listStatus(s.getPath).toSeq.flatMap(walk)
      else Seq(s.getPath.toUri.getPath)
    walk(fs.getFileStatus(p)).filter(_.endsWith(".parquet")).toSet
  }

  /** Parsed log: (generation id, live files) in commit order. */
  def generations(spark: SparkSession, loc: String): Seq[(String, Seq[String])] = {
    val (p, fs) = fsOf(spark, loc)
    val lp = new org.apache.hadoop.fs.Path(p, LogFile)
    if (!fs.exists(lp)) return Nil
    val in = fs.open(lp)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
    lines.filter(_.nonEmpty).map { l =>
      val Array(g, fsv) = l.split("\\|", 2)
      (g, if (fsv.isEmpty) Nil else fsv.split(",").toSeq)
    }
  }

  def contains(spark: SparkSession, loc: String, gen: String): Boolean =
    generations(spark, loc).exists(_._1 == gen)

  private def appendLogEntry(spark: SparkSession, loc: String, gen: String,
                             live: Seq[String]): Unit = {
    val (p, fs) = fsOf(spark, loc)
    val lp = new org.apache.hadoop.fs.Path(p, LogFile)
    val tmp = new org.apache.hadoop.fs.Path(p, LogFile + ".tmp")
    val prev =
      if (fs.exists(lp)) {
        val in = fs.open(lp)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      } else ""
    val out = fs.create(tmp, true)
    try out.write((prev + gen + "|" + live.mkString(",") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(lp)) fs.delete(lp, false)
    fs.rename(tmp, lp)
    ()
  }

  /** Commit `df` as generation `gen`: append its files, mark the
    * previous generation's files for the RESTATED partitions removed,
    * record the new live set. Skips if `gen` is already committed
    * (crash replay: orphan files from the failed attempt stay
    * invisible and vacuum collects them).
    */
  def appendBatch(spark: SparkSession, loc: String, gen: String,
                  df: DataFrame, partCol: String): Unit = {
    if (contains(spark, loc, gen)) return
    val prevLive = generations(spark, loc).lastOption.map(_._2).getOrElse(Nil)
    val before = listDataFiles(spark, loc)
    // the batch's partitions — bounded by the batch's span
    val parts = df.select(col(partCol)).distinct()
      .collect().map(_.get(0).toString)
    df.repartition(col(partCol))
      .write.mode("append").partitionBy(partCol).parquet(loc)
    val added = (listDataFiles(spark, loc) -- before).toSeq.sorted
    val removed = prevLive.filter(f =>
      parts.exists(p => f.contains(s"/$partCol=$p/"))).toSet
    appendLogEntry(spark, loc, gen,
      prevLive.filterNot(removed) ++ added)
  }

  /** Read the table AS OF `gen` — exactly the files that generation
    * committed, regardless of every later append/overwrite. The
    * partition column comes back as a DATA column because the writer
    * stores it in-file too (callers include it in `df`).
    */
  def read(spark: SparkSession, loc: String, gen: String): DataFrame = {
    val live = generations(spark, loc).find(_._1 == gen).getOrElse(
      throw new IllegalArgumentException(
        s"generation '$gen' not in $loc/$LogFile (vacuumed or never committed)"))._2
    if (live.isEmpty)
      throw new IllegalArgumentException(s"generation '$gen' is empty")
    // a generation may span files written under evolving schemas
    // (q206): merge the footers so widened columns read as NULL where
    // history predates them
    spark.read.option("mergeSchema", "true").parquet(live: _*)
  }

  def readLatest(spark: SparkSession, loc: String): DataFrame = {
    val gens = generations(spark, loc)
    require(gens.nonEmpty, s"no generations committed at $loc")
    read(spark, loc, gens.last._1)
  }

  /** Retain the last `keepLastN` generations: files referenced by
    * none of them — overwritten history AND crash orphans — are
    * deleted, and the log is rewritten to the retained tail. Returns
    * the deleted paths. Retained generations read exactly what they
    * always read.
    */
  def vacuum(spark: SparkSession, loc: String, keepLastN: Int): Seq[String] = {
    val gens = generations(spark, loc)
    val kept = gens.takeRight(keepLastN)
    val referenced = kept.flatMap(_._2).toSet
    val doomed = (listDataFiles(spark, loc) -- referenced).toSeq.sorted
    val (_, fs) = fsOf(spark, loc)
    doomed.foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false); ()
    }
    // rewrite the log to the retained tail (temp+rename)
    val (p, _) = fsOf(spark, loc)
    val lp = new org.apache.hadoop.fs.Path(p, LogFile)
    val tmp = new org.apache.hadoop.fs.Path(p, LogFile + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(kept.map { case (g, l) => g + "|" + l.mkString(",") }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(lp)) fs.delete(lp, false)
    fs.rename(tmp, lp)
    doomed
  }
}
