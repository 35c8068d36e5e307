package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HllSketch, TextFns}
import graft.streaming.SketchWarehouse

/** The stream→warehouse sketch seam (q183): the two properties that
  * make merge-on-write the PRODUCTION path — (1) replaying the whole
  * backlog leaves the maintained table bit-identical (effectively-
  * once without a transactional sink), (2) a window whose rows split
  * across micro-batches merges to the exact whole-window registers
  * (the case q177's one-batch convention must assert away). Both are
  * pinned against an independent one-pass batch aggregate, byte for
  * byte.
  */
class StreamSeamSpec extends SparkTestBase {

  private def snapshot(table: String): Map[Long, Seq[Byte]] =
    spark.table(table).collect()
      .map(r => r.getAs[Long]("win_us") ->
        r.getAs[Array[Byte]]("regs").toSeq).toMap

  private def hashedEvents: DataFrame =
    graft.sources.Tables.events(spark, Sf)
      .select(
        expr("unix_micros(ts) DIV 3600000000 * 3600000000").as("win_us"),
        TextFns.hash60(col("user_id").cast("string")).as("h"),
        unix_micros(col("ts")).as("us"))

  private def directRegs(src: DataFrame): Map[Long, Seq[Byte]] =
    src.groupBy(col("win_us"))
      .agg(HllSketch.hllRegisters(col("h")).as("regs"))
      .collect()
      .map(r => r.getAs[Long]("win_us") ->
        r.getAs[Array[Byte]]("regs").toSeq).toMap

  test("replaying the backlog leaves the maintained table bit-identical") {
    val t = SketchWarehouse.streamHourlyRegs(spark, Sf)
    val first = snapshot(t)
    val t2 = SketchWarehouse.streamHourlyRegs(spark, Sf)
    assert(t2 == t)
    val second = snapshot(t2)
    assert(first.nonEmpty && second == first,
      "a full backlog replay must merge into an unchanged table")
    // and the maintained rows ARE the one-pass batch registers
    assert(first == directRegs(hashedEvents),
      "streamed+merged registers must equal the direct batch aggregate")
  }

  test("a window split across micro-batches merges to the exact whole") {
    val table = "graft_test_seam_hll"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    graft.io.Warehouse.ensureMaintainedPartitionedTable(spark, table,
      s"$Sf/events.parquet", "win_us BIGINT, regs BINARY, day DATE", "day")
    val ev = hashedEvents
    // split INSIDE windows: first/second half-hour of every hour land
    // in different "micro-batches", so every window's registers arrive
    // as two partial arrays
    val halves = Seq(
      ev.where(pmod(col("us"), lit(3600000000L)) < 1800000000L),
      ev.where(pmod(col("us"), lit(3600000000L)) >= 1800000000L))
    halves.foreach { h =>
      SketchWarehouse.mergeUpsert(spark, table,
        h.groupBy(col("win_us"))
          .agg(HllSketch.hllRegisters(col("h")).as("regs")))
    }
    val merged = snapshot(table)
    val direct = directRegs(ev)
    assert(merged.nonEmpty && merged == direct,
      "split-window partial registers must max together to the whole")
    // crash-replay of one batch: re-merging the first half changes nothing
    SketchWarehouse.mergeUpsert(spark, table,
      halves.head.groupBy(col("win_us"))
        .agg(HllSketch.hllRegisters(col("h")).as("regs")))
    assert(snapshot(table) == direct,
      "re-merging a replayed batch must be a no-op (register max is idempotent)")
  }

  test("q193: the week rollup reads only the target week's day directories") {
    val t = SketchWarehouse.ensureStreamedHourlyRegs(spark, Sf)
    val day0 = spark.table(t).agg(min(col("day"))).head().getDate(0)
    val ws = java.sql.Date.valueOf(day0.toLocalDate.plusDays(7))
    val we = java.sql.Date.valueOf(day0.toLocalDate.plusDays(14))
    val wk = spark.table(t)
      .where(col("day") >= lit(ws) && col("day") < lit(we))
      .agg(count(lit(1)).as("n_hours"))
    val scans = wk.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1)
    assert(scans.head.partitionFilters.exists(
      _.references.exists(_.name == "day")),
      s"week bounds must be partition filters, got ${scans.head.partitionFilters}")
    // PruneFileSourcePartitions already rewrote the location to the
    // pruned index; totals come from the catalog (the q146 pattern)
    val selected = scans.head.relation.location.listFiles(Nil, Nil)
      .map(_.files.size).sum
    val total = spark.sql(s"SHOW PARTITIONS $t").count().toInt
    assert(total > 7, s"fixture: expected a month of day partitions, got $total")
    // mergeUpsert leaves one file per day, so files == pruned days
    assert(selected == 7,
      s"expected exactly the 7 target-week files, listed $selected of $total days")
    // and the pruned read carries the right rows: one stored register
    // row per populated hour window of the week (independent recount)
    val expectHours = graft.sources.Tables.events(spark, Sf)
      .withColumn("day",
        expr("date_from_unix_date(CAST(unix_micros(ts) DIV 86400000000 AS INT))"))
      .where(col("day") >= lit(ws) && col("day") < lit(we))
      .select(expr("unix_micros(ts) DIV 3600000000")).distinct().count()
    assert(expectHours > 0 && wk.head().getLong(0) == expectHours)
  }

  test("maintained table lifecycle: files survive re-registration; a stale fingerprint restarts empty") {
    val t = "graft_test_seam_lifecycle"
    val ddl = "win_us BIGINT, regs BINARY, day DATE"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), t)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(loc, true)
    val m0 = graft.io.Warehouse.ensureMaintainedPartitionedTable(
      spark, t, s"$Sf/events.parquet", ddl, "day")
    assert(m0 == "created" && spark.table(t).count() == 0)
    // maintain some rows, then lose the CATALOG (new JVM): surviving
    // files must re-register with their rows intact (MSCK path)
    SketchWarehouse.mergeUpsert(spark, t,
      hashedEvents.limit(1000).groupBy(col("win_us"))
        .agg(HllSketch.hllRegisters(col("h")).as("regs")))
    val rows = snapshot(t)
    assert(rows.nonEmpty)
    spark.sql(s"DROP TABLE $t")
    val m1 = graft.io.Warehouse.ensureMaintainedPartitionedTable(
      spark, t, s"$Sf/events.parquet", ddl, "day")
    assert(m1 == "files", s"expected files-reuse, got $m1")
    assert(snapshot(t) == rows,
      "re-registered maintained rows must survive bit-identically")
    // a regenerated source corpus (stale fingerprint) must DROP the
    // maintained rows — sketches of data that no longer exists
    spark.sql(s"DROP TABLE $t")
    val fp = new org.apache.hadoop.fs.Path(loc,
      graft.io.Warehouse.FingerprintFile)
    val out = fs.create(fp, true)
    try out.write("stale".getBytes("UTF-8")) finally out.close()
    val m2 = graft.io.Warehouse.ensureMaintainedPartitionedTable(
      spark, t, s"$Sf/events.parquet", ddl, "day")
    assert(m2 == "created" && spark.table(t).count() == 0,
      "a fingerprint mismatch must restart the maintained table empty")
    spark.sql(s"DROP TABLE $t")
    fs.delete(loc, true)
  }
}
