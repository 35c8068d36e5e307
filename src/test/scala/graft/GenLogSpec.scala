package graft

import org.apache.spark.sql.functions._
import graft.io.GenLog
import graft.queries.TimeTravel

/** The generation log (io/GenLog.scala): the file-level facts the
  * q203/q204 oracles can't see — overwritten-file retention, commit
  * idempotence, orphan invisibility, and the vacuum contract. All on
  * a throwaway location; the queries' warehouse artifact is never
  * touched.
  */
class GenLogSpec extends SparkTestBase {

  private def freshGens(): String = {
    val loc = java.nio.file.Files.createTempDirectory("genlog").toString + "/t"
    GenLog.appendBatch(spark, loc, "g1",
      TimeTravel.batch(spark, Sf, Some(TimeTravel.Cut1), None, Some(TimeTravel.Day1)), "day_k")
    GenLog.appendBatch(spark, loc, "g2",
      TimeTravel.batch(spark, Sf, Some(TimeTravel.Cut2), Some(TimeTravel.Day1), Some(TimeTravel.Day2)), "day_k")
    GenLog.appendBatch(spark, loc, "g3",
      TimeTravel.batch(spark, Sf, None, Some(TimeTravel.Day2), None), "day_k")
    loc
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, String, Long)] =
    df.select(col("day").cast("string"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("a logical overwrite removes the old file from live but retains it for history") {
    val loc = freshGens()
    val gens = GenLog.generations(spark, loc).toMap
    val g1Only = gens("g1").toSet -- gens("g3").toSet
    assert(g1Only.nonEmpty,
      "g2's day-10 restatement must have removed a g1 file from the live set")
    assert(g1Only.forall(f => new java.io.File(f).exists()),
      "removed files must stay on disk for history")
    // the removed file is exactly the boundary day's partial commit
    assert(g1Only.forall(_.contains(s"/day_k=${TimeTravel.Day1}/")))
  }

  test("generation reads are snapshots: each equals its cutoff recompute") {
    val loc = freshGens()
    def expect(cut: Option[String]) = rows {
      val ev = graft.sources.Tables.events(spark, Sf)
        .withColumn("day", to_date(col("ts")))
      cut.map(c => ev.where(col("ts") <= lit(c).cast("timestamp"))).getOrElse(ev)
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
    }
    assert(rows(GenLog.read(spark, loc, "g1")) == expect(Some(TimeTravel.Cut1)))
    assert(rows(GenLog.read(spark, loc, "g2")) == expect(Some(TimeTravel.Cut2)))
    assert(rows(GenLog.readLatest(spark, loc)) == expect(None))
  }

  test("re-committing an existing generation is a no-op; orphans are invisible until vacuum") {
    val loc = freshGens()
    val before = GenLog.generations(spark, loc)
    GenLog.appendBatch(spark, loc, "g2",
      TimeTravel.batch(spark, Sf, Some(TimeTravel.Cut2), Some(TimeTravel.Day1), Some(TimeTravel.Day2)), "day_k")
    assert(GenLog.generations(spark, loc) == before, "gen-id guard must skip")
    // a crashed writer's file: on disk, in no generation
    val orphanDir = new java.io.File(loc, "day_k=2024-01-05")
    val orphan = new java.io.File(orphanDir, "part-orphan.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    val g3 = rows(GenLog.readLatest(spark, loc))
    assert(g3.nonEmpty, "readers resolve the log, so a garbage orphan cannot break them")
    val deleted = GenLog.vacuum(spark, loc, keepLastN = 3)
    assert(deleted.exists(_.endsWith("part-orphan.parquet")))
    assert(!orphan.exists())
    assert(rows(GenLog.readLatest(spark, loc)) == g3)
  }

  test("vacuum(keep 2) deletes g1-only history, refuses g1 reads, leaves g2/g3 bit-identical") {
    val loc = freshGens()
    val gens = GenLog.generations(spark, loc).toMap
    val g1Only = gens("g1").toSet -- gens("g2").toSet -- gens("g3").toSet
    assert(g1Only.nonEmpty)
    val g2Rows = rows(GenLog.read(spark, loc, "g2"))
    val g3Rows = rows(GenLog.read(spark, loc, "g3"))
    val deleted = GenLog.vacuum(spark, loc, keepLastN = 2)
    assert(g1Only.subsetOf(deleted.toSet), "g1-only files must be collected")
    intercept[IllegalArgumentException](GenLog.read(spark, loc, "g1"))
    assert(rows(GenLog.read(spark, loc, "g2")) == g2Rows)
    assert(rows(GenLog.read(spark, loc, "g3")) == g3Rows)
  }

  test("schema evolution: earlier generations keep their own schema; the merged read nulls pre-column history") {
    val loc = freshGens()
    // widen at g4: day-20+ restated with n_users
    GenLog.appendBatch(spark, loc, "g4",
      TimeTravel.widenedBatch(spark, Sf, Some(TimeTravel.Day2)), "day_k")
    // AS OF g3: the column does not exist — time travel sees the
    // schema of its day
    assert(!GenLog.read(spark, loc, "g3").columns.contains("n_users"))
    val latest = GenLog.readLatest(spark, loc)
    assert(latest.columns.contains("n_users"))
    val d2 = lit(TimeTravel.Day2).cast("date")
    assert(latest.where(col("day") < d2 && col("n_users").isNotNull).isEmpty,
      "pre-column history must read as NULL")
    assert(latest.where(col("day") >= d2 && col("n_users").isNull).isEmpty,
      "widened rows must carry the column")
  }

  test("streamed generations: each micro-batch commit is the corpus at its window's cutoff") {
    val loc = graft.streaming.GenLogStream.ensureStreamedGenerations(spark, Sf)
    def expect(cut: Option[String]) = rows {
      val ev = graft.sources.Tables.events(spark, Sf)
        .withColumn("day", to_date(col("ts")))
      cut.map(c => ev.where(col("ts") <= lit(c).cast("timestamp"))).getOrElse(ev)
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
    }
    assert(GenLog.generations(spark, loc).map(_._1) == Seq("w1", "w2", "w3"),
      "three windows must commit in order")
    // the additive boundary-day restatement lands on the exact
    // cutoff recompute — the invariant that makes streamed snapshots
    // trustworthy
    assert(rows(GenLog.read(spark, loc, "w1")) == expect(Some(TimeTravel.Cut1)))
    assert(rows(GenLog.read(spark, loc, "w2")) == expect(Some(TimeTravel.Cut2)))
    assert(rows(GenLog.readLatest(spark, loc)) == expect(None))
  }

  test("a pinned snapshot survives writers: reads planned before a commit return the old state") {
    val loc = freshGens()
    // pin g3's file list NOW (the frame resolves the log at
    // construction), then let a writer commit a restatement on top
    val pinned = GenLog.read(spark, loc, "g3")
    val before = rows(pinned)
    GenLog.appendBatch(spark, loc, "g4",
      TimeTravel.widenedBatch(spark, Sf, Some(TimeTravel.Day2)), "day_k")
    assert(rows(pinned) == before,
      "a snapshot pinned before the commit must be unaffected by it")
    assert(rows(GenLog.readLatest(spark, loc)) != before ||
      GenLog.generations(spark, loc).last._1 == "g4")
  }

  test("log install crash windows recover: a complete temp is adopted, a torn temp is discarded") {
    val loc = freshGens()
    val before = GenLog.generations(spark, loc)
    val log = new java.io.File(loc, GenLog.LogFile)
    val tmp = new java.io.File(loc, GenLog.LogFile + ".tmp")
    // crash between delete and rename: the full next state sits in
    // the sentinel-terminated temp, the installed log is gone
    java.nio.file.Files.copy(log.toPath, tmp.toPath)
    assert(log.delete())
    assert(GenLog.generations(spark, loc) == before,
      "a complete temp must be adopted as the next state")
    assert(log.exists() && !tmp.exists(), "recovery must reinstall the log")
    // crash mid-temp-write: a torn temp must never shadow the log
    java.nio.file.Files.writeString(tmp.toPath, "w1|/nowhere.parquet\n")
    assert(GenLog.generations(spark, loc) == before,
      "a torn temp (no sentinel) must be ignored")
    assert(!tmp.exists(), "the torn temp must be discarded")
  }

  test("partition evolution: same rows, coarser files; history keeps the fine layout until vacuum") {
    val loc = TimeTravel.ensureEvolvedGenerations(spark, Sf)
    val gens = GenLog.generations(spark, loc).toMap
    val (daily, weekly) = (gens("g1_daily"), gens("g2_weekly"))
    assert(daily.size > weekly.size * 4,
      s"re-clustering must collapse files: ${daily.size} day files vs ${weekly.size} week files")
    assert(weekly.forall(_.contains("/week_k=")) && daily.forall(_.contains("/day_k=")),
      "each generation must live under its own partition scheme")
    // the physical change is invisible logically
    assert(rows(GenLog.read(spark, loc, "g1_daily")) ==
      rows(GenLog.read(spark, loc, "g2_weekly")))
    // the fine-grained history is retained (time travel) until vacuum
    assert(daily.forall(f => new java.io.File(f).exists()))
  }

  test("every committed file carries exactly one partition value (the restatement contract)") {
    val loc = freshGens()
    val all = GenLog.generations(spark, loc).flatMap(_._2).distinct
    all.foreach { f =>
      val days = spark.read.parquet(f).select(col("day")).distinct().count()
      assert(days == 1, s"$f carries $days days; restatement-by-path needs exactly 1")
    }
  }
}
