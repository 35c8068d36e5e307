package graft.io

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A generation log: the minimal transaction-log storage protocol
  * (the Delta/Iceberg core idea, executed small). The directory is
  * APPEND-ONLY — maintenance writes add files and never delete — and
  * a log directory at the root records, per generation, the file-set
  * DELTA that generation committed. Everything else falls out of that
  * one inversion:
  *
  *   - READERS RESOLVE THE LOG, NOT THE DIRECTORY. A query pins a
  *     generation's file list, so concurrent/later writes are
  *     invisible (snapshot isolation without locks).
  *   - LOGICAL OVERWRITE: restating a partition adds the new files
  *     and marks the old ones removed IN THE LOG — the bytes stay, so
  *     every earlier generation still reads bit-identically (time
  *     travel across overwrites).
  *   - CRASH SAFETY: data files land before the log entry; a crash
  *     between leaves orphans no reader can see. Log objects are
  *     INSTALLED ATOMICALLY: a commit is written to a uuid-named temp
  *     and claimed into place by an atomic create-if-absent (hard
  *     link on a local FS, non-overwriting rename on HDFS), so a
  *     visible `N.commit` is always complete and a crashed writer
  *     leaves only an ignorable temp. Readers NEVER mutate the log —
  *     recovery is the writer's job alone, which is what makes
  *     concurrent readers safe by construction.
  *   - VACUUM: the retained state installs FIRST (a checkpoint at the
  *     retention cut), then dropped log objects and unreferenced data
  *     files (overwritten history and crash orphans) are deleted — a
  *     crash between the two leaves collectable garbage, never a log
  *     that advertises vanished files.
  *
  * == Log layout (the Delta/Iceberg shape, executed small) ==
  *
  * `<loc>/_genlog/` holds one object per commit plus periodic
  * checkpoints:
  *
  *   - `%020d.commit` — ONE generation's delta: its gen id, the
  *     partitions it restates (for writer-vs-writer conflict
  *     detection), added file paths, removed file paths. Commit cost
  *     is O(batch), never O(table) — the property a full-live-set log
  *     loses as history grows.
  *   - `%020d.checkpoint` — the RESOLVED live set as of that version,
  *     written every [[CheckpointInterval]] commits (and at every
  *     vacuum cut). A snapshot resolve reads the nearest checkpoint ≤
  *     the target plus the commit tail after it — O(interval), never
  *     O(history). [[resolveGen]] reports which checkpoint served and
  *     how many commits were replayed, so the economics are
  *     spec-pinned rather than asserted in prose.
  *
  * == Writer-vs-writer optimistic concurrency ==
  *
  * The version number IS the lock: a writer prepares its delta
  * against the latest snapshot it read, then attempts to claim
  * `(latest+1).commit` by atomic create-if-absent. Losing the race
  * means another writer committed first — the loser re-reads the
  * intervening commits and
  *
  *   - SKIPS if its own gen id landed (a replayed batch),
  *   - RETRIES at the next version if every intervening commit
  *     touched DISJOINT partitions (its delta is still valid: adds
  *     and removes are confined to its own partitions),
  *   - ABORTS with [[java.util.ConcurrentModificationException]] if
  *     any intervening commit overlaps its partitions (its removes
  *     were computed against a state that no longer holds).
  *
  * A full restatement ([[recluster]]) declares the wildcard partition
  * `*`, which conflicts with every concurrent commit — the correct
  * semantics for a rewrite of the whole live set.
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

  /** The log directory name under the table root. */
  final val LogDir = "_genlog"

  /** A checkpoint is written every this-many commits. */
  final val CheckpointInterval = 10

  /** The wildcard partition a full restatement declares: conflicts
    * with every concurrent commit.
    */
  final val AllParts = "*"

  /** One committed generation's delta. `parts` are
    * `partCol=escapedValue` tokens (or [[AllParts]]). `dataChange` is
    * false for LAYOUT-ONLY commits (re-clustering, compaction) whose
    * adds restate rows already delivered — incremental consumers
    * ([[readAppendedSince]]) skip them, exactly Delta's
    * dataChange=false contract.
    */
  private[graft] final case class Commit(version: Long, gen: String,
      parts: Seq[String], adds: Seq[String], removes: Seq[String],
      dataChange: Boolean = true,
      dvAdds: Seq[String] = Nil, dvRemoves: Seq[String] = Nil)

  /** How a snapshot resolve was served: the live set, the checkpoint
    * version it started from (None = replayed from empty), and the
    * number of commit files applied on top. The checkpoint+tail
    * economics, observable.
    */
  private[graft] final case class Resolution(live: Seq[String],
      checkpointUsed: Option[Long], commitsParsed: Int,
      dvLive: Seq[String] = Nil)

  // ----------------------------------------------------------------
  // filesystem plumbing
  // ----------------------------------------------------------------

  private def fsOf(spark: SparkSession, loc: String): (Path, FileSystem) = {
    val p = new Path(loc)
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  private def logDirOf(loc: Path) = new Path(loc, LogDir)

  private def commitPath(dir: Path, v: Long) =
    new Path(dir, f"$v%020d.commit")

  private def checkpointPath(dir: Path, v: Long) =
    new Path(dir, f"$v%020d.checkpoint")

  /** The deletion-vector sidecar directory under the table root. */
  final val DvDir = "_dv"

  /** All data files currently on disk (orphans included). Underscore
    * directories are metadata namespaces (`_genlog`, `_dv`), never
    * table data — the Hive hidden-path convention.
    */
  private def listDataFiles(spark: SparkSession, loc: String): Set[String] = {
    val (p, fs) = fsOf(spark, loc)
    if (!fs.exists(p)) return Set.empty
    def walk(s: org.apache.hadoop.fs.FileStatus): Seq[String] =
      if (s.isDirectory) {
        if (s.getPath.getName.startsWith("_")) Nil
        else fs.listStatus(s.getPath).toSeq.flatMap(walk)
      } else Seq(s.getPath.toUri.getPath)
    walk(fs.getFileStatus(p)).filter(_.endsWith(".parquet")).toSet
  }

  /** All deletion-vector sidecar files on disk (orphans included). */
  private def listDvFiles(spark: SparkSession, loc: String): Set[String] = {
    val (p, fs) = fsOf(spark, loc)
    val dv = new Path(p, DvDir)
    if (!fs.exists(dv)) return Set.empty
    fs.listStatus(dv).toSeq.map(_.getPath.toUri.getPath)
      .filter(_.endsWith(".parquet")).toSet
  }

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Install `body` at `dst` by atomic create-if-absent; returns
    * whether THIS call won the claim. On a local FS the claim is a
    * hard link (atomic, EEXIST on collision — java.io.File#renameTo
    * would silently REPLACE an existing dst, so rename cannot claim
    * here); elsewhere it is FileSystem.rename, which the HDFS
    * contract defines as non-overwriting for files. Either way a
    * visible dst is always a complete object and the loser's temp is
    * removed.
    */
  private def installIfAbsent(fs: FileSystem, dir: Path, body: String,
                              dst: Path): Boolean = {
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val claimed =
      if ("file" == Option(dst.toUri.getScheme).getOrElse(fs.getScheme)) {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else fs.rename(tmp, dst)
    fs.delete(tmp, false)
    claimed
  }

  // ----------------------------------------------------------------
  // serialization — line-oriented, sentinel-terminated. Paths and gen
  // ids may contain anything but line terminators (validated at
  // commit time); the prefix encoding needs no other escaping.
  // ----------------------------------------------------------------

  private def sentinelBody(lines: Seq[String]): String =
    lines.mkString("", "\n", "\n") + s"#end:${lines.size}\n"

  /** Lines iff the trailing sentinel proves the object is complete —
    * defense in depth; the atomic install should make torn objects
    * impossible.
    */
  private def parseLines(content: String): Option[Seq[String]] = {
    val lines = content.split("\n").filter(_.nonEmpty).toSeq
    if (lines.isEmpty) return None
    val (entries, sentinel) = (lines.init, lines.last)
    if (sentinel != s"#end:${entries.size}") None else Some(entries)
  }

  private def commitBody(c: Commit): String =
    sentinelBody(s"gen:${c.gen}" +:
      ((if (c.dataChange) Nil else Seq("nodata:1")) ++
        c.parts.map("part:" + _) ++
        c.adds.map("add:" + _) ++ c.removes.map("rm:" + _) ++
        c.dvAdds.map("dvadd:" + _) ++ c.dvRemoves.map("dvrm:" + _)))

  private def parseCommit(v: Long, content: String): Option[Commit] =
    parseLines(content).map { lines =>
      Commit(v,
        lines.collectFirst { case l if l.startsWith("gen:") => l.drop(4) }
          .getOrElse(sys.error(s"commit $v has no gen line")),
        lines.collect { case l if l.startsWith("part:") => l.drop(5) },
        lines.collect { case l if l.startsWith("add:") => l.drop(4) },
        lines.collect { case l if l.startsWith("rm:") => l.drop(3) },
        dataChange = !lines.contains("nodata:1"),
        dvAdds = lines.collect { case l if l.startsWith("dvadd:") => l.drop(6) },
        dvRemoves = lines.collect { case l if l.startsWith("dvrm:") => l.drop(5) })
    }

  private def checkpointBody(gen: String, live: Seq[String],
                             dvLive: Seq[String]): String =
    sentinelBody(s"gen:$gen" +: (live.map("live:" + _) ++
      dvLive.map("dvlive:" + _)))

  /** (gen id, live set, dv live set) of a checkpoint. */
  private def parseCheckpoint(content: String): Option[(String, Seq[String], Seq[String])] =
    parseLines(content).map { lines =>
      (lines.collectFirst { case l if l.startsWith("gen:") => l.drop(4) }
        .getOrElse(sys.error("checkpoint has no gen line")),
        lines.collect { case l if l.startsWith("live:") => l.drop(5) },
        lines.collect { case l if l.startsWith("dvlive:") => l.drop(7) })
    }

  // ----------------------------------------------------------------
  // log state
  // ----------------------------------------------------------------

  /** One listing of the log directory: commit versions and checkpoint
    * versions present. Temps (crashed writers pre-claim) are ignored
    * — readers never mutate the log.
    */
  private def listLog(fs: FileSystem, dir: Path): (Seq[Long], Seq[Long]) = {
    if (!fs.exists(dir)) return (Nil, Nil)
    val names = fs.listStatus(dir).toSeq.map(_.getPath.getName)
    def versionsOf(suffix: String) = names
      .filter(_.endsWith(suffix)).map(_.stripSuffix(suffix).toLong).sorted
    (versionsOf(".commit"), versionsOf(".checkpoint"))
  }

  private def readCommit(fs: FileSystem, dir: Path, v: Long): Commit =
    parseCommit(v, readText(fs, commitPath(dir, v)))
      .getOrElse(sys.error(s"torn commit object at version $v in $dir"))

  /** Ordered (version, gen, liveSet) for every RESOLVABLE generation:
    * a single forward pass from the earliest resolvable point (commit
    * 1, or the earliest checkpoint whose commit chain is unbroken —
    * i.e. after a vacuum cut). O(surviving log objects) — the
    * full-history listing; [[resolveGen]] is the O(interval) path a
    * single snapshot read takes.
    */
  private def genStates(spark: SparkSession, loc: String)
      : Seq[(Long, String, Seq[String], Seq[String])] = {
    val (p, fs) = fsOf(spark, loc)
    val dir = logDirOf(p)
    val (commits, checkpoints) = listLog(fs, dir)
    if (commits.isEmpty && checkpoints.isEmpty) return Nil
    val out = Seq.newBuilder[(Long, String, Seq[String], Seq[String])]
    var live = Set.empty[String]
    var dvLive = Set.empty[String]
    var from = 0L // replay commits > from
    if (!commits.headOption.contains(1L)) {
      // history was truncated (vacuum): start at the earliest
      // surviving checkpoint — the retention cut's resolved state
      val start = checkpoints.headOption.getOrElse(return Nil)
      val (g, l, dl) = parseCheckpoint(readText(fs, checkpointPath(dir, start)))
        .getOrElse(sys.error(s"torn checkpoint at version $start in $dir"))
      live = l.toSet
      dvLive = dl.toSet
      from = start
      out += ((start, g, l.sorted, dl.sorted))
    }
    val tail = commits.filter(_ > from)
    require(tail == ((from + 1) to tail.lastOption.getOrElse(from)),
      s"broken commit chain in $dir: have $tail after version $from")
    tail.foreach { v =>
      val c = readCommit(fs, dir, v)
      live = live -- c.removes ++ c.adds
      dvLive = dvLive -- c.dvRemoves ++ c.dvAdds
      out += ((v, c.gen, live.toSeq.sorted, dvLive.toSeq.sorted))
    }
    out.result()
  }

  /** All resolvable generations, oldest first: (gen id, live files).
    * The compatibility surface specs and maintenance jobs list
    * history through.
    */
  def generations(spark: SparkSession, loc: String): Seq[(String, Seq[String])] =
    genStates(spark, loc).map { case (_, g, l, _) => (g, l) }

  def contains(spark: SparkSession, loc: String, gen: String): Boolean =
    generations(spark, loc).exists(_._1 == gen)

  /** Resolve ONE generation checkpoint+tail: start from the nearest
    * checkpoint at or below the target version and apply only the
    * commit tail after it — O([[CheckpointInterval]]) log reads for a
    * current snapshot regardless of history length. Falls back to a
    * from-empty replay when the target predates every checkpoint
    * (short young history). Throws for a gen id that is absent or
    * vacuumed.
    */
  private[graft] def resolveGen(spark: SparkSession, loc: String,
                                gen: String): Resolution = {
    val (p, fs) = fsOf(spark, loc)
    val dir = logDirOf(p)
    val (commits, checkpoints) = listLog(fs, dir)
    // locate the target version: the checkpoint carrying the gen id,
    // or the commit carrying it (commits are read target-down so a
    // current-snapshot lookup stays O(tail))
    val target: Long = checkpoints.reverse.collectFirst {
      case cv if parseCheckpoint(readText(fs, checkpointPath(dir, cv)))
        .exists(_._1 == gen) => cv
    }.orElse {
      commits.reverse.collectFirst {
        case v if readCommit(fs, dir, v).gen == gen => v
      }
    }.getOrElse(throw new IllegalArgumentException(
      s"generation '$gen' not in $loc/$LogDir (vacuumed or never committed)"))
    resolveVersion(fs, dir, commits, checkpoints, target)
  }

  private def resolveVersion(fs: FileSystem, dir: Path, commits: Seq[Long],
                             checkpoints: Seq[Long], target: Long): Resolution = {
    val ck = checkpoints.filter(_ <= target).lastOption
    val tail = commits.filter(v => v > ck.getOrElse(0L) && v <= target)
    val expected = (ck.getOrElse(0L) + 1) to target
    require(ck.nonEmpty || commits.headOption.contains(1L),
      s"version $target predates the log's surviving history in $dir")
    require(tail == expected,
      s"broken commit chain resolving version $target in $dir: " +
        s"have $tail, need $expected")
    var (live: Set[String], dvLive: Set[String]) = ck match {
      case Some(cv) =>
        val c = parseCheckpoint(readText(fs, checkpointPath(dir, cv)))
          .getOrElse(sys.error(s"torn checkpoint at version $cv in $dir"))
        (c._2.toSet, c._3.toSet)
      case None => (Set.empty[String], Set.empty[String])
    }
    tail.foreach { v =>
      val c = readCommit(fs, dir, v)
      live = live -- c.removes ++ c.adds
      dvLive = dvLive -- c.dvRemoves ++ c.dvAdds
    }
    Resolution(live.toSeq.sorted, ck, tail.size, dvLive.toSeq.sorted)
  }

  // ----------------------------------------------------------------
  // the commit protocol
  // ----------------------------------------------------------------

  private def validateGen(gen: String): Unit =
    require(gen.nonEmpty && !gen.exists(c => c == '\n' || c == '\r'),
      s"generation id must be non-empty and line-terminator-free: '$gen'")

  private def partsOverlap(a: Seq[String], b: Seq[String]): Boolean =
    a.contains(AllParts) || b.contains(AllParts) ||
      a.toSet.intersect(b.toSet).nonEmpty

  /** Commit a prepared delta with optimistic-concurrency retry.
    * `snapshotVersion` is the version the delta was computed against
    * (0 for an empty table). Returns the installed version, or the
    * existing one if `gen` turned out to be already committed by a
    * racing writer.
    */
  private def commitDelta(spark: SparkSession, loc: String, c: Commit,
                          snapshotVersion: Long): Long = {
    val (p, fs) = fsOf(spark, loc)
    val dir = logDirOf(p)
    var attempt = snapshotVersion + 1
    while (true) {
      if (installIfAbsent(fs, dir, commitBody(c.copy(version = attempt)),
          commitPath(dir, attempt))) {
        maybeCheckpoint(fs, dir, attempt, c.gen)
        return attempt
      }
      // lost the race: examine every commit that landed since
      val (commits, _) = listLog(fs, dir)
      val landed = commits.filter(_ >= attempt).map(readCommit(fs, dir, _))
      landed.find(_.gen == c.gen) match {
        case Some(winner) => return winner.version // replayed batch: idempotent
        case None =>
      }
      val clash = landed.filter(l => partsOverlap(l.parts, c.parts))
      if (clash.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"generation '${c.gen}' conflicts with concurrently committed " +
            s"${clash.map(l => s"'${l.gen}' (v${l.version})").mkString(", ")} " +
            s"on partitions ${c.parts.mkString(",")} — recompute against " +
            "the new snapshot and retry")
      attempt = commits.last + 1 // disjoint writers: delta still valid
    }
    sys.error("unreachable")
  }

  /** Write a checkpoint at `v` when the interval says so. Resolved
    * from disk (checkpoint+tail), NOT from the writer's in-memory
    * state — a disjoint concurrent commit may have landed between the
    * writer's snapshot and its claim. Claim-if-absent: a racing
    * checkpointer's duplicate is dropped.
    */
  private def maybeCheckpoint(fs: FileSystem, dir: Path, v: Long,
                              gen: String): Unit =
    if (v % CheckpointInterval == 0) {
      val (commits, checkpoints) = listLog(fs, dir)
      val r = resolveVersion(fs, dir, commits, checkpoints, v)
      installIfAbsent(fs, dir, checkpointBody(gen, r.live, r.dvLive),
        checkpointPath(dir, v))
      ()
    }

  /** Latest (version, resolution), or (0, empty) for a virgin table. */
  private def latestFull(spark: SparkSession, loc: String): (Long, Resolution) = {
    val (p, fs) = fsOf(spark, loc)
    val dir = logDirOf(p)
    val (commits, checkpoints) = listLog(fs, dir)
    val latest = (commits ++ checkpoints).maxOption.getOrElse(0L)
    if (latest == 0L) (0L, Resolution(Nil, None, 0))
    else (latest, resolveVersion(fs, dir, commits, checkpoints, latest))
  }

  /** Latest (version, live set), or (0, empty) for a virgin table. */
  private def latestState(spark: SparkSession, loc: String): (Long, Seq[String]) = {
    val (v, r) = latestFull(spark, loc)
    (v, r.live)
  }

  /** A prepared-but-uncommitted generation: the data files are on
    * disk (invisible — no reader resolves them), the delta is
    * computed against `snapshotVersion`. [[commitStaged]] makes it
    * visible. The two-phase split IS the concurrency protocol: the
    * expensive write happens outside any critical section, and only
    * the O(batch)-sized commit contends.
    */
  private[graft] final case class Staged(gen: String, parts: Seq[String],
      adds: Seq[String], removes: Seq[String], snapshotVersion: Long)

  /** Phase one of [[appendBatch]]: write the batch's data files and
    * compute its delta against the CURRENT snapshot, without
    * committing. Exposed for the writer-vs-writer spec, which stages
    * two writers against the same snapshot deterministically.
    *
    * File-attribution caveat: `adds` comes from a before/after
    * listing diff, which assumes stagings do not INTERLEAVE their
    * physical writes (a production writer collects the task-committed
    * file names from the write job instead — same protocol, exact
    * attribution). The COMMIT phase is fully concurrent either way.
    */
  private[graft] def stageAppend(spark: SparkSession, loc: String, gen: String,
                                 df: DataFrame, partCol: String): Staged = {
    validateGen(gen)
    val (snapVer, prevLive) = latestState(spark, loc)
    val before = listDataFiles(spark, loc)
    // the batch's partitions — bounded by the batch's span; matched
    // against the ESCAPED directory names Spark actually writes
    val parts = df.select(col(partCol)).distinct()
      .collect().map(r => org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.escapePathName(r.get(0).toString)).toSeq
    df.repartition(col(partCol))
      .write.mode("append").partitionBy(partCol).parquet(loc)
    val added = (listDataFiles(spark, loc) -- before).toSeq.sorted
    val removed = prevLive.filter(f =>
      parts.exists(v => f.contains(s"/$partCol=$v/")))
    Staged(gen, parts.map(v => s"$partCol=$v"), added, removed, snapVer)
  }

  /** Phase two: install a staged generation's commit, with the object
    * scaladoc's optimistic-concurrency semantics (skip own gen, retry
    * past disjoint writers, abort on overlap). Returns the installed
    * version.
    */
  private[graft] def commitStaged(spark: SparkSession, loc: String,
                                  s: Staged): Long =
    commitDelta(spark, loc,
      Commit(0L, s.gen, s.parts, s.adds, s.removes), s.snapshotVersion)

  /** Commit `df` as generation `gen`: append its files, mark the
    * previous generation's files for the RESTATED partitions removed,
    * record the delta. Skips if `gen` is already committed (crash
    * replay: orphan files from the failed attempt stay invisible and
    * vacuum collects them — the gen-id scan is O(surviving log
    * objects), the price of idempotence). Concurrent-writer semantics
    * are the object scaladoc's: disjoint partitions retry,
    * overlapping partitions abort.
    */
  def appendBatch(spark: SparkSession, loc: String, gen: String,
                  df: DataFrame, partCol: String): Unit = {
    validateGen(gen)
    if (contains(spark, loc, gen)) return
    commitStaged(spark, loc, stageAppend(spark, loc, gen, df, partCol))
    ()
  }

  /** [[appendBatch]] with COMMIT-TIME CONSTRAINTS (SQL CHECK
    * semantics, Delta's constraint contract): each named predicate
    * must not evaluate FALSE on any batch row (NULL passes, as in
    * SQL CHECK); violations abort with per-constraint counts BEFORE
    * anything lands — not a data file, not a log object — so a bad
    * upstream batch can never become a generation readers see or
    * vacuum must clean. One validation aggregate over the batch
    * (a production writer fuses the checks into the write tasks;
    * the contract is identical).
    */
  def appendBatchChecked(spark: SparkSession, loc: String, gen: String,
                         df: DataFrame, partCol: String,
                         checks: Seq[(String, Column)]): Unit = {
    require(checks.nonEmpty, "appendBatchChecked needs at least one constraint")
    val aggs = checks.map { case (_, p) =>
      sum(when(!coalesce(p, lit(true)), 1L).otherwise(0L))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val bad = checks.zipWithIndex.collect {
      case ((n, _), i) if r.getLong(i) > 0 => s"$n (${r.getLong(i)} rows)"
    }
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"constraint violation in batch '$gen': ${bad.mkString(", ")} — " +
          "nothing was written")
    appendBatch(spark, loc, gen, df, partCol)
  }

  /** Commit `df` as a FULL RESTATEMENT under a (possibly new)
    * partition column: every previous file leaves the live set, the
    * new files are the generation. This is partition EVOLUTION /
    * re-clustering through the log — the physical layout changes
    * (day files → week files), the logical rows don't, earlier
    * generations keep reading their own layout, and the dropped
    * fine-grained files become vacuum-collectable history. Declares
    * the wildcard partition, so it conflicts with EVERY concurrent
    * commit — the only sound semantics for a whole-table rewrite.
    */
  def recluster(spark: SparkSession, loc: String, gen: String,
                df: DataFrame, partCol: String): Unit = {
    validateGen(gen)
    if (contains(spark, loc, gen)) return
    val (snapVer, prevLive) = latestState(spark, loc)
    val before = listDataFiles(spark, loc)
    df.repartition(col(partCol))
      .write.mode("append").partitionBy(partCol).parquet(loc)
    val added = (listDataFiles(spark, loc) -- before).toSeq.sorted
    commitDelta(spark, loc,
      Commit(0L, gen, Seq(AllParts), added, prevLive, dataChange = false),
      snapVer)
    ()
  }

  /** Commit `df` as PURE INSERTS under `partCol`: the files ADD to
    * their partitions without restating them — previous files stay
    * live, partitions accumulate one file per insert generation (the
    * append-only ingest mode; [[compactPartitionThroughLog]] is the
    * matching OPTIMIZE). The caller contracts that the batch's rows
    * are key-disjoint from every live row — inserts, not upserts
    * ([[mergeByKey]] is the upsert).
    *
    * Because an insert REMOVES nothing, its delta stays valid under
    * ANY concurrent commit — it declares no partitions and therefore
    * never aborts, only retries to the next version. That is the
    * protocol expressing real conflict semantics instead of a global
    * lock: blind inserts commute; restatements of the same partition
    * do not.
    */
  def appendInsert(spark: SparkSession, loc: String, gen: String,
                   df: DataFrame, partCol: String): Unit = {
    validateGen(gen)
    if (contains(spark, loc, gen)) return
    val (snapVer, _) = latestState(spark, loc)
    val before = listDataFiles(spark, loc)
    df.repartition(col(partCol))
      .write.mode("append").partitionBy(partCol).parquet(loc)
    val added = (listDataFiles(spark, loc) -- before).toSeq.sorted
    commitDelta(spark, loc, Commit(0L, gen, Nil, added, Nil), snapVer)
    ()
  }

  /** Commit an UPSERT (MERGE INTO) as generation `gen`: rows of
    * `updates` replace live rows with equal `keyCols` and insert
    * where no such row exists. Copy-on-write at FILE granularity:
    * one pass over the live files finds the files holding matched
    * keys (a semi-join against the updates' keys — distributed; the
    * collect is the affected-file names), those files' UNMATCHED rows
    * rewrite beside the full updates frame, and the commit removes
    * exactly the affected files. Untouched files stay live
    * byte-identically; AS-OF-before-merge still reads the old rows.
    * Cost ∝ affected files + updates, never the table — Delta's
    * MERGE, executed small. Declares the affected files' partitions
    * plus the updates' own (insert-target) partitions for conflict
    * detection.
    */
  def mergeByKey(spark: SparkSession, loc: String, gen: String,
                 updates: DataFrame, keyCols: Seq[String],
                 partCol: String): Unit = {
    validateGen(gen)
    if (contains(spark, loc, gen)) return
    val (snapVer, live) = latestState(spark, loc)
    require(live.nonEmpty, s"mergeByKey on an empty table at $loc — use appendBatch")
    val keys = updates.select(keyCols.map(col): _*).distinct()
    val withFile = spark.read.option("basePath", loc)
      .option("mergeSchema", "true").parquet(live: _*)
      .withColumn("__file", input_file_name())
    val affected = withFile.join(keys, keyCols, "left_semi")
      .select(col("__file")).distinct()
      .collect().map(r => new Path(new java.net.URI(r.getString(0)))
        .toUri.getPath).toSeq.sorted
    val partRe = java.util.regex.Pattern.compile("/" +
      java.util.regex.Pattern.quote(partCol) + "=([^/]+)/")
    val filePart = (f: String) => {
      val m = partRe.matcher(f)
      if (m.find()) s"$partCol=${m.group(1)}" else AllParts
    }
    val updParts = updates.select(col(partCol)).distinct()
      .collect().map(r => s"$partCol=" + org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.escapePathName(r.get(0).toString)).toSeq
    val parts = (affected.map(filePart) ++ updParts).distinct
    val before = listDataFiles(spark, loc)
    // surviving rows of the affected files (cast-aligned: the
    // basePath read infers the partition column's type from the
    // directory names, the updates frame carries the writer's)
    val kept =
      if (affected.isEmpty) None
      else Some(spark.read.option("basePath", loc)
        .option("mergeSchema", "true").parquet(affected: _*)
        .join(keys, keyCols, "left_anti")
        .select(updates.columns.toIndexedSeq
          .map(c => col(c).cast(updates.schema(c).dataType)): _*))
    kept.map(_.unionByName(updates)).getOrElse(updates)
      .repartition(col(partCol))
      .write.mode("append").partitionBy(partCol).parquet(loc)
    val added = (listDataFiles(spark, loc) -- before).toSeq.sorted
    commitDelta(spark, loc, Commit(0L, gen, parts, added, affected), snapVer)
    ()
  }

  /** OPTIMIZE one partition through the log: the partition's live
    * files rewrite as `numFiles` (default 1) in a new generation —
    * rows identical, siblings untouched, the small files the
    * append-only insert mode accumulates retained as history until
    * vacuum (AS-OF-before-compaction still reads them). The log twin
    * of [[Warehouse.compactPartition]]: there the partition overwrite
    * destroys the old files; here every earlier generation keeps
    * reading its own layout.
    */
  def compactPartitionThroughLog(spark: SparkSession, loc: String, gen: String,
                                 partCol: String, partValue: String,
                                 numFiles: Int = 1): Unit = {
    validateGen(gen)
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    if (contains(spark, loc, gen)) return
    val (snapVer, live) = latestState(spark, loc)
    val escaped = org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.escapePathName(partValue)
    val target = live.filter(_.contains(s"/$partCol=$escaped/"))
    require(target.nonEmpty, s"no live files under $partCol=$escaped at $loc")
    val before = listDataFiles(spark, loc)
    spark.read.option("basePath", loc).option("mergeSchema", "true")
      .parquet(target: _*)
      .repartition(numFiles)
      .write.mode("append").partitionBy(partCol).parquet(loc)
    val added = (listDataFiles(spark, loc) -- before).toSeq.sorted
    commitDelta(spark, loc,
      Commit(0L, gen, Seq(s"$partCol=$escaped"), added, target,
        dataChange = false), snapVer)
    ()
  }

  /** Generic LAYOUT-REWRITE commit: replace exactly the `target` live
    * files with `transform` applied to their rows, re-partitioned by
    * `partCol` — the building block behind partial re-clustering
    * (GenZoned.maybeReclusterPartial) and any file-scoped OPTIMIZE.
    * `transform` must be row-preserving (re-keying, re-sorting,
    * coalescing — never filtering), which is why the commit carries
    * dataChange=false: incremental consumers already have these rows.
    * Declares BOTH the target files' partitions and the rewrite's
    * output partitions for conflict detection (a concurrent
    * restatement of either side would invalidate the rewrite).
    * Cost ∝ target files, never the table.
    */
  def replaceFiles(spark: SparkSession, loc: String, gen: String,
                   target: Seq[String], partCol: String)
                  (transform: DataFrame => DataFrame): Unit = {
    validateGen(gen)
    if (contains(spark, loc, gen)) return
    val (snapVer, live) = latestState(spark, loc)
    require(target.nonEmpty, "replaceFiles needs at least one target file")
    require(target.forall(live.contains),
      s"replaceFiles targets must be live files of the latest generation")
    val partRe = java.util.regex.Pattern.compile("/" +
      java.util.regex.Pattern.quote(partCol) + "=([^/]+)/")
    val targetParts = target.flatMap { f =>
      val m = partRe.matcher(f)
      if (m.find()) Some(s"$partCol=${m.group(1)}") else Some(AllParts)
    }
    val out = transform(spark.read.option("basePath", loc)
      .option("mergeSchema", "true").parquet(target: _*))
    val outParts = out.select(col(partCol)).distinct()
      .collect().map(r => s"$partCol=" + org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.escapePathName(r.get(0).toString)).toSeq
    val before = listDataFiles(spark, loc)
    out.repartition(col(partCol))
      .write.mode("append").partitionBy(partCol).parquet(loc)
    val added = (listDataFiles(spark, loc) -- before).toSeq.sorted
    commitDelta(spark, loc,
      Commit(0L, gen, (targetParts ++ outParts).distinct, added,
        target.sorted, dataChange = false), snapVer)
    ()
  }

  /** RESTORE: make the table's latest state equal generation
    * `toGen`'s, as a NEW generation — the rollback that never erases
    * (Delta RESTORE): nothing is copied or written, the commit simply
    * re-lists the old generation's files (they are still on disk —
    * that is what the retention window is FOR) and removes the
    * current ones from live. Every intermediate generation stays
    * AS-OF readable, so the mistake being rolled back remains
    * auditable; dataChange=true because consumers see the table's
    * rows change. Wildcard conflict scope: a restore invalidates any
    * concurrent writer's snapshot by definition.
    */
  def restore(spark: SparkSession, loc: String, newGen: String,
              toGen: String): Unit = {
    validateGen(newGen)
    if (contains(spark, loc, newGen)) return
    val target = resolveGen(spark, loc, toGen)
    val (p, fs) = fsOf(spark, loc)
    (target.live ++ target.dvLive).foreach { f =>
      require(fs.exists(new Path(f)),
        s"restore target file vacuumed: $f — '$toGen' is outside the retention window")
    }
    val (snapVer, cur) = latestFull(spark, loc)
    commitDelta(spark, loc,
      Commit(0L, newGen, Seq(AllParts), target.live, cur.live,
        dvAdds = target.dvLive, dvRemoves = cur.dvLive), snapVer)
    ()
  }

  /** Commit a DELETE as generation `gen`: rows of the LATEST snapshot
    * matching `pred` leave the table by REWRITE-ON-DELETE of only the
    * files that contain them — untouched files stay in the live set
    * byte-identically, earlier generations still serve the deleted
    * rows (AS-OF-before-delete is the legal-hold read), and the
    * change feed between the adjacent snapshots shows the deletions.
    *
    * Mechanics: one pass over the live files finds the AFFECTED file
    * set (`input_file_name` + the predicate — distributed, collect
    * bounded by the affected-file count); the affected files'
    * surviving rows (`pred` false or NULL) rewrite as new files under
    * the same partition scheme (`basePath` read recovers the
    * partition column a partitioned write strips from the files); the
    * commit removes the affected files and adds the rewrites. A file
    * whose every row matches simply rewrites to nothing. Cost ∝
    * affected files, never the table — the Delta/Iceberg
    * copy-on-write DELETE, executed small. Declares the affected
    * files' partitions for conflict detection.
    */
  def deleteWhere(spark: SparkSession, loc: String, gen: String,
                  pred: Column, partCol: String): Unit = {
    validateGen(gen)
    if (contains(spark, loc, gen)) return
    val (snapVer, live) = latestState(spark, loc)
    require(live.nonEmpty, s"deleteWhere on an empty table at $loc")
    val hit = coalesce(pred, lit(false))
    val affected = spark.read.option("basePath", loc)
      .option("mergeSchema", "true").parquet(live: _*)
      .where(hit).select(input_file_name().as("f")).distinct()
      .collect().map(r => new Path(new java.net.URI(r.getString(0)))
        .toUri.getPath).toSeq.sorted
    if (affected.isEmpty) {
      // nothing matches: commit an empty delta so the generation
      // exists (the snapshot is the previous one's live set)
      commitDelta(spark, loc, Commit(0L, gen, Nil, Nil, Nil), snapVer)
      return
    }
    val partRe = java.util.regex.Pattern.compile("/" +
      java.util.regex.Pattern.quote(partCol) + "=([^/]+)/")
    val parts = affected.flatMap { f =>
      val m = partRe.matcher(f)
      if (m.find()) Some(s"$partCol=${m.group(1)}") else Some(AllParts)
    }.distinct
    val before = listDataFiles(spark, loc)
    spark.read.option("basePath", loc).option("mergeSchema", "true")
      .parquet(affected: _*)
      .where(!hit)
      .repartition(col(partCol))
      .write.mode("append").partitionBy(partCol).parquet(loc)
    val added = (listDataFiles(spark, loc) -- before).toSeq.sorted
    commitDelta(spark, loc, Commit(0L, gen, parts, added, affected), snapVer)
    ()
  }

  /** Commit a MERGE-ON-READ delete as generation `gen`: instead of
    * rewriting the affected files (the [[deleteWhere]] copy-on-write
    * path), the matched rows' (file, row-position) pairs land in a
    * DELETION-VECTOR sidecar (`_dv/`) and the commit adds it to the
    * DV live set — readers anti-join the vectors at scan time
    * ([[read]]). The write cost is O(matched positions) regardless of
    * how many rows the affected files hold — the Delta
    * deletion-vector / Iceberg position-delete trade: delete-heavy
    * workloads defer the rewrite, [[materializeDeletes]] settles the
    * debt when read amplification says so. Matching runs on the MoR
    * VIEW (existing vectors applied), so repeated deletes never
    * double-enter positions. Declares the affected files' partitions
    * for conflict detection.
    */
  def deleteWhereMoR(spark: SparkSession, loc: String, gen: String,
                     pred: Column, partCol: String): Unit = {
    validateGen(gen)
    if (contains(spark, loc, gen)) return
    val (snapVer, st) = latestFull(spark, loc)
    require(st.live.nonEmpty, s"deleteWhereMoR on an empty table at $loc")
    val hit = coalesce(pred, lit(false))
    val data = spark.read.option("basePath", loc)
      .option("mergeSchema", "true").parquet(st.live: _*)
      .withColumn("__graft_dv_f", col("_metadata.file_path"))
      .withColumn("__graft_dv_i", col("_metadata.row_index"))
    val view =
      if (st.dvLive.isEmpty) data
      else data.join(spark.read.parquet(st.dvLive: _*)
        .select(col("file_path").as("__graft_dv_f"),
          col("row_index").as("__graft_dv_i")),
        Seq("__graft_dv_f", "__graft_dv_i"), "left_anti")
    val matches = view.where(hit)
      .select(col("__graft_dv_f").as("file_path"),
        col("__graft_dv_i").as("row_index"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val affected = matches.select(col("file_path")).distinct()
        .collect().map(r => new Path(new java.net.URI(r.getString(0)))
          .toUri.getPath).toSeq.sorted
      if (affected.isEmpty) {
        commitDelta(spark, loc, Commit(0L, gen, Nil, Nil, Nil), snapVer)
        return
      }
      val partRe = java.util.regex.Pattern.compile("/" +
        java.util.regex.Pattern.quote(partCol) + "=([^/]+)/")
      val parts = affected.flatMap { f =>
        val m = partRe.matcher(f)
        if (m.find()) Some(s"$partCol=${m.group(1)}") else Some(AllParts)
      }.distinct
      val before = listDvFiles(spark, loc)
      matches.coalesce(1).write.mode("append").parquet(s"$loc/$DvDir")
      val dvAdds = (listDvFiles(spark, loc) -- before).toSeq.sorted
      commitDelta(spark, loc,
        Commit(0L, gen, parts, Nil, Nil, dvAdds = dvAdds), snapVer)
      ()
    } finally { matches.unpersist(blocking = false); () }
  }

  /** Settle the deletion-vector debt as generation `gen`: every data
    * file the live vectors reference rewrites WITHOUT its deleted
    * rows (copy-on-write, at last), the vectors leave the DV live
    * set, and the table is vector-free again. dataChange=false — the
    * MoR view's rows are identical before and after; this commit
    * moves read amplification, never answers. Cost ∝ affected files,
    * exactly the rewrite the MoR delete deferred.
    */
  def materializeDeletes(spark: SparkSession, loc: String, gen: String,
                         partCol: String): Unit = {
    validateGen(gen)
    if (contains(spark, loc, gen)) return
    val (snapVer, st) = latestFull(spark, loc)
    require(st.dvLive.nonEmpty, s"no deletion vectors to materialize at $loc")
    val dv = spark.read.parquet(st.dvLive: _*)
      .select(col("file_path").as("__graft_dv_f"),
        col("row_index").as("__graft_dv_i"))
    val affected = dv.select(col("__graft_dv_f")).distinct()
      .collect().map(r => new Path(new java.net.URI(r.getString(0)))
        .toUri.getPath).filter(st.live.contains).toSeq.sorted
    val partRe = java.util.regex.Pattern.compile("/" +
      java.util.regex.Pattern.quote(partCol) + "=([^/]+)/")
    val parts = affected.flatMap { f =>
      val m = partRe.matcher(f)
      if (m.find()) Some(s"$partCol=${m.group(1)}") else Some(AllParts)
    }.distinct
    val before = listDataFiles(spark, loc)
    if (affected.nonEmpty) {
      val kept = spark.read.option("basePath", loc)
        .option("mergeSchema", "true").parquet(affected: _*)
        .withColumn("__graft_dv_f", col("_metadata.file_path"))
        .withColumn("__graft_dv_i", col("_metadata.row_index"))
        .join(dv, Seq("__graft_dv_f", "__graft_dv_i"), "left_anti")
        .drop("__graft_dv_f", "__graft_dv_i")
      kept.repartition(col(partCol))
        .write.mode("append").partitionBy(partCol).parquet(loc)
    }
    val added = (listDataFiles(spark, loc) -- before).toSeq.sorted
    commitDelta(spark, loc,
      Commit(0L, gen, parts, added, affected, dataChange = false,
        dvRemoves = st.dvLive), snapVer)
    ()
  }

  /** Read the table AS OF `gen` — exactly the files that generation
    * committed, regardless of every later append/overwrite/delete.
    * The partition column comes back as a DATA column because the
    * writer stores it in-file too (callers include it in `df`).
    */
  def read(spark: SparkSession, loc: String, gen: String): DataFrame = {
    val r = resolveGen(spark, loc, gen)
    if (r.live.isEmpty)
      throw new IllegalArgumentException(s"generation '$gen' is empty")
    // a generation may span files written under evolving schemas
    // (q206): merge the footers so widened columns read as NULL where
    // history predates them
    val data = spark.read.option("mergeSchema", "true").parquet(r.live: _*)
    if (r.dvLive.isEmpty) data
    else {
      // merge-on-read: anti-join the deletion vectors' (file, row)
      // positions against the scan's metadata columns — deleted rows
      // vanish at read time, no data file is touched. DV rows whose
      // file left the live set match nothing (inert until vacuum).
      val dv = spark.read.parquet(r.dvLive: _*)
        .select(col("file_path").as("__graft_dv_f"),
          col("row_index").as("__graft_dv_i"))
      val cols = data.columns.toSeq
      data
        .withColumn("__graft_dv_f", col("_metadata.file_path"))
        .withColumn("__graft_dv_i", col("_metadata.row_index"))
        .join(dv, Seq("__graft_dv_f", "__graft_dv_i"), "left_anti")
        .select(cols.map(col): _*)
    }
  }

  def readLatest(spark: SparkSession, loc: String): DataFrame = {
    val gens = generations(spark, loc)
    require(gens.nonEmpty, s"no generations committed at $loc")
    read(spark, loc, gens.last._1)
  }

  /** INCREMENTAL CONSUMPTION: the rows APPENDED after `sinceGen`, as
    * the union of every later data-changing commit's added files —
    * never a table diff. Layout-only commits (re-clustering,
    * compaction: `dataChange=false`) are skipped even though they add
    * files, because their adds restate rows already delivered — and
    * the original small files they displaced stay readable until
    * vacuum, so a consumer mid-stream never loses data to an
    * OPTIMIZE. This is the append-feed a downstream training-data
    * pipeline tails (Delta's streaming-source contract): cost ∝ new
    * data since the consumer's cursor, never the table. Scope:
    * row-accurate for append-only tables (appendInsert); restating
    * writers' updates/deletes surface through the change feed
    * (q205/q211), not this feed.
    */
  def readAppendedSince(spark: SparkSession, loc: String,
                        sinceGen: String): DataFrame = {
    val (p, fs) = fsOf(spark, loc)
    val dir = logDirOf(p)
    val (commits, checkpoints) = listLog(fs, dir)
    val sinceVer: Long = commits.map(readCommit(fs, dir, _))
      .find(_.gen == sinceGen).map(_.version)
      .orElse(checkpoints.find(cv =>
        parseCheckpoint(readText(fs, checkpointPath(dir, cv)))
          .exists(_._1 == sinceGen)))
      .getOrElse(throw new IllegalArgumentException(
        s"generation '$sinceGen' not in $loc/$LogDir (vacuumed or never committed)"))
    val files = commits.filter(_ > sinceVer).map(readCommit(fs, dir, _))
      .filter(_.dataChange).flatMap(_.adds).distinct
    if (files.isEmpty) readLatest(spark, loc).where(lit(false))
    else spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** SHALLOW CLONE: commit generation `clone_<gen>` at `destLoc`
    * whose live set IS the source snapshot's file list — zero data
    * copied, the manifest is the clone (Delta shallow clone /
    * Iceberg snapshot ref). The clone is immediately writable as an
    * independent table: its later commits write under `destLoc` and
    * restate by removing SOURCE paths from its own live set — the
    * source's files and log are never touched, and the clone's
    * vacuum cannot collect source bytes (it only lists its own
    * directory). Lifecycle caveat, as in every shallow-clone system:
    * the SOURCE's vacuum can delete files the clone still
    * references — clone from snapshots inside the source's retention
    * window.
    */
  def cloneSnapshot(spark: SparkSession, srcLoc: String, gen: String,
                    destLoc: String): Unit = {
    val gname = s"clone_$gen"
    if (contains(spark, destLoc, gname)) return
    val src = resolveGen(spark, srcLoc, gen)
    val (snapVer, prev) = latestFull(spark, destLoc)
    commitDelta(spark, destLoc,
      Commit(0L, gname, Seq(AllParts), src.live, prev.live,
        dvAdds = src.dvLive, dvRemoves = prev.dvLive), snapVer)
    ()
  }

  /** Retain the last `keepLastN` generations: the retained state
    * installs FIRST (a checkpoint at the retention cut, so the cut
    * generation resolves without its dropped predecessors), then the
    * dropped log objects and the data files referenced by no retained
    * generation — overwritten history AND crash orphans — are
    * deleted. Returns the deleted data paths. A crash between install
    * and deletion leaves only collectable garbage; retained
    * generations read exactly what they always read.
    */
  def vacuum(spark: SparkSession, loc: String, keepLastN: Int): Seq[String] = {
    require(keepLastN >= 1,
      s"vacuum must retain at least one generation, got keepLastN=$keepLastN")
    val states = genStates(spark, loc)
    val kept = states.takeRight(keepLastN)
    val (p, fs) = fsOf(spark, loc)
    val dir = logDirOf(p)
    kept.headOption.foreach { case (cutVer, cutGen, cutLive, cutDv) =>
      // 1. retained state installs first (idempotent claim)
      installIfAbsent(fs, dir, checkpointBody(cutGen, cutLive, cutDv),
        checkpointPath(dir, cutVer))
      // 2. drop pre-cut log objects + the cut's now-redundant commit
      val (commits, checkpoints) = listLog(fs, dir)
      commits.filter(_ <= cutVer).foreach { v =>
        fs.delete(commitPath(dir, v), false); ()
      }
      checkpoints.filter(_ < cutVer).foreach { v =>
        fs.delete(checkpointPath(dir, v), false); ()
      }
      // crashed writers' pre-claim temps are dead weight too
      fs.listStatus(dir).toSeq.map(_.getPath)
        .filter(_.getName.startsWith(".tmp-"))
        .foreach { t => fs.delete(t, false); () }
    }
    // 3. collect data files AND deletion vectors no retained
    //    generation references
    val referenced = kept.flatMap(_._3).toSet
    val referencedDv = kept.flatMap(_._4).toSet
    val doomed = ((listDataFiles(spark, loc) -- referenced) ++
      (listDvFiles(spark, loc) -- referencedDv)).toSeq.sorted
    doomed.foreach { f => fs.delete(new Path(f), false); () }
    doomed
  }
}
