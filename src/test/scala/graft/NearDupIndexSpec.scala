package graft

import org.apache.spark.sql.functions._
import graft.queries.Dedup

/** q196 — the maintained MinHash-LSH near-dup index. The oracle
  * (q34Sql, shared verbatim) certifies incremental == rebuild on the
  * top-30; here we pin the FULL pair-set equality, the crash-replay
  * idempotence the ingest log + data probe promise, and the file
  * economics (the wave absorption must not rewrite the base
  * generation's files).
  */
class NearDupIndexSpec extends SparkTestBase {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col("id_a"), col("id_b"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  /** Drop one id from the table's ingest log (simulating a crash
    * before the log record), clearing the checksum sidecar Hadoop's
    * LocalFileSystem keeps beside files it wrote.
    */
  private def dropLogEntry(table: String, id: String): Unit = {
    val loc = graft.io.Warehouse.tableLocation(spark, table)
    val log = new java.io.File(loc, graft.io.Warehouse.IngestLogFile)
    val kept = scala.io.Source.fromFile(log).getLines()
      .filterNot(_ == id).mkString("", "\n", "\n")
    java.nio.file.Files.writeString(log.toPath, kept)
    val crc = new java.io.File(loc, "." + graft.io.Warehouse.IngestLogFile + ".crc")
    if (crc.exists()) crc.delete()
    ()
  }

  test("maintained pair table equals the one-shot rebuild (full set, not top-k)") {
    val prs = Dedup.ensureIncrementalNearDup(spark, Sf)
    val maintained = pairSet(spark.table(prs))
    val rebuilt = pairSet(Dedup.lshScoredPairsUncached(spark, Sf))
    assert(maintained == rebuilt,
      s"maintained ${maintained.size} pairs vs rebuilt ${rebuilt.size}")
    assert(maintained.nonEmpty)
  }

  test("wave re-absorption (crash replay) converges: same content, no duplicate bands") {
    val prs = Dedup.ensureIncrementalNearDup(spark, Sf)
    val (idx, _) = Dedup.nearDupTables(Sf)
    val before = pairSet(spark.table(prs))
    val idxBefore = spark.table(idx).count()
    // simulate a crash between the wave writes and the log record:
    // drop the wave's ingest-log line and re-ensure
    dropLogEntry(prs, "append_mod8")
    Dedup.ensureIncrementalNearDup(spark, Sf)
    assert(pairSet(spark.table(prs)) == before,
      "replayed absorption must land on identical content")
    assert(spark.table(idx).count() == idxBefore,
      "the data probe must prevent a duplicate band append")
  }

  test("a partially-committed index append is surgically repaired on replay") {
    val prs = Dedup.ensureIncrementalNearDup(spark, Sf)
    val (idx, _) = Dedup.nearDupTables(Sf)
    val full = spark.table(idx).count()
    val wave = spark.table(idx).where(expr("doc_id % 8 = 0")).count()
    assert(wave > 0)
    // expose a partial commit: drop one file that carries wave bands
    val waveFile = spark.table(idx).where(expr("doc_id % 8 = 0"))
      .select(input_file_name()).distinct().collect().map(_.getString(0)).head
    val f = new java.io.File(new java.net.URI(waveFile))
    assert(f.delete())
    spark.catalog.refreshTable(idx)
    assert(spark.table(idx).count() < full, "fixture: bands must be missing")
    dropLogEntry(prs, "append_mod8")
    Dedup.ensureIncrementalNearDup(spark, Sf)
    spark.catalog.refreshTable(idx)
    assert(spark.table(idx).count() == full,
      "repair must restore the full band index")
    assert(spark.table(idx).where(expr("doc_id % 8 = 0")).count() == wave)
  }

  test("wave absorption leaves the base generation's files untouched") {
    val prs = Dedup.ensureIncrementalNearDup(spark, Sf)
    val loc = graft.io.Warehouse.tableLocation(spark, prs)
    val baseDir = new java.io.File(loc, "gen=base")
    assert(baseDir.isDirectory, "base generation partition must exist")
    val snapshot = baseDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSet
    // force a wave replay (the only write path that could touch base)
    dropLogEntry(prs, "append_mod8")
    Dedup.ensureIncrementalNearDup(spark, Sf)
    val after = baseDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSet
    assert(after == snapshot,
      "dynamic overwrite of gen=wave must not rewrite gen=base files")
  }

  test("every pair in the wave partition touches at least one wave doc; base touches none") {
    val prs = Dedup.ensureIncrementalNearDup(spark, Sf)
    val t = spark.table(prs)
    assert(t.where(col("gen") === "wave" &&
      expr("id_a % 8 != 0 AND id_b % 8 != 0")).isEmpty,
      "wave partition must not carry base-base pairs")
    assert(t.where(col("gen") === "base" &&
      expr("id_a % 8 = 0 OR id_b % 8 = 0")).isEmpty,
      "base partition must not carry wave-involved pairs")
  }
}
