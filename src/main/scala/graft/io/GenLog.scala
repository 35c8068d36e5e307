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
  *   - CRASH SAFETY: data files land before the log entry; a crash
  *     between leaves orphans no reader can see. The log itself
  *     replaces ATOMICALLY-OR-RECOVERABLY: the full next state is
  *     written to a SENTINEL-TERMINATED temp first, and every reader
  *     adopts a complete temp over the installed log — so a crash at
  *     any point leaves either the previous state or the (fully
  *     durable) next state, never a torn or missing log. A truncated
  *     temp (crash mid-write) fails sentinel validation and is
  *     ignored.
  *   - VACUUM: the retained log installs FIRST, then unreferenced
  *     files (dropped history and crash orphans) are deleted — a
  *     crash between the two leaves collectable orphans, never a log
  *     that advertises vanished files.
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
  * file, and removal matches the ESCAPED directory name Spark writes
  * (ExternalCatalogUtils.escapePathName), so removal-by-path never
  * strands rows of an untouched partition — for any value, not just
  * path-safe ones.
  */
object GenLog {

  final val LogFile = "_graft_genlog"

  private type Gens = Seq[(String, Seq[String])]

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

  private def readText(fs: org.apache.hadoop.fs.FileSystem,
                       p: org.apache.hadoop.fs.Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }

  /** Parse a log body; None unless the trailing sentinel proves the
    * write completed (`#end:<entry count>` as the final line).
    */
  private def parseLog(content: String): Option[Gens] = {
    val lines = content.split("\n").filter(_.nonEmpty).toSeq
    if (lines.isEmpty) return None
    val (entries, sentinel) = (lines.init, lines.last)
    if (sentinel != s"#end:${entries.size}") return None
    Some(entries.map { l =>
      val Array(g, fsv) = l.split("\\|", 2)
      (g, if (fsv.isEmpty) Nil else fsv.split(",").toSeq)
    })
  }

  /** Serialize + install a full log state: sentinel-terminated temp
    * first, then swap. Readers adopt a complete temp, so every crash
    * point resolves to prev-state or next-state.
    */
  private def writeLog(fs: org.apache.hadoop.fs.FileSystem,
                       dir: org.apache.hadoop.fs.Path, gens: Gens): Unit = {
    val lp = new org.apache.hadoop.fs.Path(dir, LogFile)
    val tmp = new org.apache.hadoop.fs.Path(dir, LogFile + ".tmp")
    val body = gens.map { case (g, l) => g + "|" + l.mkString(",") }
      .mkString("", "\n", "\n") + s"#end:${gens.size}\n"
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (fs.exists(lp)) fs.delete(lp, false)
    fs.rename(tmp, lp)
    ()
  }

  /** Parsed log with crash recovery: a COMPLETE temp is the intended
    * next state (it is only ever written immediately before install)
    * and wins over the installed log; an incomplete temp is a torn
    * write and is discarded. The adopted state is re-installed so
    * recovery happens once.
    */
  def generations(spark: SparkSession, loc: String): Seq[(String, Seq[String])] = {
    val (p, fs) = fsOf(spark, loc)
    val lp = new org.apache.hadoop.fs.Path(p, LogFile)
    val tp = new org.apache.hadoop.fs.Path(p, LogFile + ".tmp")
    val fromTmp = readText(fs, tp).flatMap(parseLog)
    fromTmp match {
      case Some(next) =>
        if (fs.exists(lp)) fs.delete(lp, false)
        fs.rename(tp, lp)
        next
      case None =>
        if (fs.exists(tp)) fs.delete(tp, false) // torn write
        readText(fs, lp).flatMap(parseLog).getOrElse(Nil)
    }
  }

  def contains(spark: SparkSession, loc: String, gen: String): Boolean =
    generations(spark, loc).exists(_._1 == gen)

  /** Commit `df` as generation `gen`: append its files, mark the
    * previous generation's files for the RESTATED partitions removed,
    * record the new live set. Skips if `gen` is already committed
    * (crash replay: orphan files from the failed attempt stay
    * invisible and vacuum collects them). One log parse per commit.
    */
  def appendBatch(spark: SparkSession, loc: String, gen: String,
                  df: DataFrame, partCol: String): Unit = {
    val gens = generations(spark, loc)
    if (gens.exists(_._1 == gen)) return
    val prevLive = gens.lastOption.map(_._2).getOrElse(Nil)
    val before = listDataFiles(spark, loc)
    // the batch's partitions — bounded by the batch's span; matched
    // against the ESCAPED directory names Spark actually writes
    val parts = df.select(col(partCol)).distinct()
      .collect().map(r => org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.escapePathName(r.get(0).toString))
    df.repartition(col(partCol))
      .write.mode("append").partitionBy(partCol).parquet(loc)
    val added = (listDataFiles(spark, loc) -- before).toSeq.sorted
    val removed = prevLive.filter(f =>
      parts.exists(p => f.contains(s"/$partCol=$p/"))).toSet
    val (p, fs) = fsOf(spark, loc)
    writeLog(fs, p, gens :+ ((gen, prevLive.filterNot(removed) ++ added)))
  }

  /** Commit `df` as a FULL RESTATEMENT under a (possibly new)
    * partition column: every previous file leaves the live set, the
    * new files are the generation. This is partition EVOLUTION /
    * re-clustering through the log — the physical layout changes
    * (day files → week files), the logical rows don't, earlier
    * generations keep reading their own layout, and the dropped
    * fine-grained files become vacuum-collectable history. Same
    * crash-safety as [[appendBatch]]: files land first, the log
    * install commits.
    */
  def recluster(spark: SparkSession, loc: String, gen: String,
                df: DataFrame, partCol: String): Unit = {
    val gens = generations(spark, loc)
    if (gens.exists(_._1 == gen)) return
    val before = listDataFiles(spark, loc)
    df.repartition(col(partCol))
      .write.mode("append").partitionBy(partCol).parquet(loc)
    val added = (listDataFiles(spark, loc) -- before).toSeq.sorted
    val (p, fs) = fsOf(spark, loc)
    writeLog(fs, p, gens :+ ((gen, added)))
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

  /** Retain the last `keepLastN` generations: the retained log
    * installs FIRST, then files referenced by none of them —
    * overwritten history AND crash orphans — are deleted. Returns the
    * deleted paths. A crash between install and deletion leaves only
    * collectable orphans; retained generations read exactly what they
    * always read.
    */
  def vacuum(spark: SparkSession, loc: String, keepLastN: Int): Seq[String] = {
    val gens = generations(spark, loc)
    val kept = gens.takeRight(keepLastN)
    val (p, fs) = fsOf(spark, loc)
    writeLog(fs, p, kept)
    val referenced = kept.flatMap(_._2).toSet
    val doomed = (listDataFiles(spark, loc) -- referenced).toSeq.sorted
    doomed.foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false); ()
    }
    doomed
  }
}
