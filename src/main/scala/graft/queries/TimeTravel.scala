package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.GenLog
import graft.sources.Tables

/** Snapshot reads over a generation-logged table (io/GenLog.scala) —
  * time travel, logical overwrite, and retention as ORACLED query
  * semantics, not storage trivia.
  *
  * The fixture: daily event counts maintained through three ingest
  * generations with mid-day cutoffs, so every generation restates its
  * boundary day (the partial day completes in the next batch — the
  * q183 restatement shape, here through the log instead of partition
  * overwrite):
  *   g1: events up to Jan 10 noon   (day 10 committed PARTIAL)
  *   g2: days 10–20 up to Jan 20 noon (day 10 RESTATED full — g1's
  *       day-10 file leaves the live set but stays on disk)
  *   g3: day 20 restated + the rest of the month
  * Each generation is therefore exactly "the corpus as of its
  * cutoff", which is what makes snapshots SQL-expressible: the oracle
  * for AS OF g_k is the flat query with `ts <= cut_k` — the
  * hash-compare certifies snapshot isolation, not just row counts.
  */
object TimeTravel {

  type Q = (SparkSession, String) => DataFrame

  final val Cut1 = "2024-01-10 12:00:00"
  final val Cut2 = "2024-01-20 12:00:00"
  final val Day1 = "2024-01-10"
  final val Day2 = "2024-01-20"

  private[graft] def gensTable(dir: String): String =
    s"graft_ev_gens_${java.lang.Integer.toHexString(dir.hashCode)}"

  /** One ingest batch: daily counts for `dayLo..dayHi` from events at
    * or before `cut`. The day is stored BOTH as the partition key
    * (day_k — one day per file, the GenLog restatement contract) and
    * as a data column (explicit file-list reads don't see directory
    * keys).
    */
  private[graft] def batch(spark: SparkSession, dir: String, cut: Option[String],
                    dayLo: Option[String], dayHi: Option[String]): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("day", to_date(col("ts")))
    val preds =
      cut.map(c => col("ts") <= lit(c).cast("timestamp")).toSeq ++
        dayLo.map(d => col("day") >= lit(d).cast("date")) ++
        dayHi.map(d => col("day") <= lit(d).cast("date"))
    ev.where(preds.reduce(_ && _))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("day_k", date_format(col("day"), "yyyy-MM-dd"))
  }

  /** Build the three generations exactly once per corpus state. The
    * fingerprint doubles as the COMMIT MARKER: it is written after
    * g3, so a partial build (crash mid-generations) reads as stale
    * and rebuilds from empty — and GenLog.appendBatch's own gen-id
    * guard makes the per-batch commits idempotent inside one build.
    */
  private[graft] def ensureEventGenerations(spark: SparkSession, dir: String): String = {
    val tbl = gensTable(dir)
    val loc = graft.io.Warehouse.tableLocation(spark, tbl)
    val src = s"$dir/events.parquet"
    if (!graft.io.Warehouse.fingerprintMatches(spark, tbl, src)) {
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      GenLog.appendBatch(spark, loc, "g1",
        batch(spark, dir, Some(Cut1), None, Some(Day1)), "day_k")
      GenLog.appendBatch(spark, loc, "g2",
        batch(spark, dir, Some(Cut2), Some(Day1), Some(Day2)), "day_k")
      GenLog.appendBatch(spark, loc, "g3",
        batch(spark, dir, None, Some(Day2), None), "day_k")
      graft.io.Warehouse.writeFingerprint(spark, tbl, src)
    }
    loc
  }

  // ---------------------------------------------------------------
  // q203_snapshot_read — AS OF the MIDDLE generation: g2's pinned
  // file list serves days 1–9 from g1's surviving files, the
  // restated day 10 and days 11–19 from g2's, and ignores everything
  // g3 added or restated after it. The oracle is the flat corpus at
  // g2's cutoff — equality certifies the snapshot semantics by hash.
  // At 100 TB this is a reproducible training-data freeze: the
  // manifest (file list) IS the dataset version.
  // ---------------------------------------------------------------
  def q203(spark: SparkSession, dir: String): DataFrame =
    GenLog.read(spark, ensureEventGenerations(spark, dir), "g2")
      .select(col("day"), col("event_type"), col("n_events"))
      .orderBy(col("day"), col("event_type"))

  val q203Sql: String =
    s"""SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n_events
       |FROM events WHERE ts <= TIMESTAMP '$Cut2'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // q204_travel_overwritten — AS OF g1, read AFTER later generations
  // LOGICALLY OVERWROTE its boundary day: g2's restatement removed
  // g1's partial day-10 file from the live set, but the log retained
  // the bytes, so g1 still answers bit-identically (GenLogSpec pins
  // the file-level fact: g1's list contains a file absent from g3's).
  // The oracle is the corpus at g1's cutoff. This is the
  // read-repeatability contract a vacuumless overwrite breaks — and
  // exactly what q204 proves survives here.
  // ---------------------------------------------------------------
  def q204(spark: SparkSession, dir: String): DataFrame =
    GenLog.read(spark, ensureEventGenerations(spark, dir), "g1")
      .select(col("day"), col("event_type"), col("n_events"))
      .orderBy(col("day"), col("event_type"))

  val q204Sql: String =
    s"""SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n_events
       |FROM events WHERE ts <= TIMESTAMP '$Cut1'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def queries: Map[String, Q] = Map(
    "q203_snapshot_read" -> (q203 _),
    "q204_travel_overwritten" -> (q204 _))

  def oracles: Map[String, String] = Map(
    "q203_snapshot_read" -> q203Sql,
    "q204_travel_overwritten" -> q204Sql)
}
