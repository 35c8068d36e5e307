package graft

import org.apache.spark.sql.functions._
import graft.queries.AnnTrained
import graft.streaming.VectorIngest

/** q197 — streaming vector ingestion into the cell-partitioned store.
  * The shared q182 oracle certifies the probe's ANSWER; here we pin
  * what the oracle can't see: streamed-in content equals the one-shot
  * build, the replay path appends nothing (exactly-once), batches
  * appended files instead of rewriting the store, and the probe over
  * the streamed table still partition-prunes.
  */
class VectorIngestSpec extends SparkTestBase {

  private def storeRows(t: String): Set[(Long, Int, Double)] =
    spark.table(t)
      .select(col("vec_id"), col("cell"), round(col("nrm"), 9))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet

  /** Rebuild the streamed store from scratch. The tests that assert
    * per-batch APPEND HISTORY need it: a prior repair (keyed merge)
    * or q200 compaction legitimately collapses cell files in the
    * persistent warehouse, erasing the history those tests observe.
    */
  private def freshStore(): String = {
    val t = VectorIngest.storeTable(Sf)
    spark.sql(s"DROP TABLE IF EXISTS $t")
    org.apache.spark.network.util.JavaUtils.deleteRecursively(
      new java.io.File(graft.io.Warehouse.tableLocation(spark, t)))
    VectorIngest.ensureStreamedCellStore(spark, Sf)
  }

  test("streamed store content equals the one-shot q182 build") {
    val streamed = VectorIngest.ensureStreamedCellStore(spark, Sf)
    val oneShot = AnnTrained.ensureCellPartitionedEmbeddings(spark, Sf)
    assert(storeRows(streamed) == storeRows(oneShot))
    assert(spark.table(streamed).count() > 0)
  }

  test("re-streaming after a lost completion marker appends nothing (per-batch probes hold)") {
    val t = VectorIngest.ensureStreamedCellStore(spark, Sf)
    val loc = graft.io.Warehouse.tableLocation(spark, t)
    def files(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(loc)).map(_.getPath)
        .filter(_.endsWith(".parquet")).toSet
    }
    val before = files()
    val rowsBefore = spark.table(t).count()
    // drop ONLY the completion marker: the replay must re-run the
    // stream, and every batch's data probe must then skip its append
    val log = new java.io.File(loc, graft.io.Warehouse.IngestLogFile)
    java.nio.file.Files.deleteIfExists(
      new java.io.File(loc, "." + graft.io.Warehouse.IngestLogFile + ".crc").toPath)
    java.nio.file.Files.writeString(log.toPath, "")
    VectorIngest.ensureStreamedCellStore(spark, Sf)
    assert(files() == before, "replayed stream must not append duplicate files")
    assert(spark.table(t).count() == rowsBefore)
  }

  test("ingestion appended per-batch files; the store was never rewritten") {
    val t = freshStore()
    val loc = new java.io.File(graft.io.Warehouse.tableLocation(spark, t))
    // exclude the hot cell: q200's targeted compaction may have
    // legitimately collapsed it in this shared warehouse
    val perCell = loc.listFiles().filter(f => f.getName.startsWith("cell=") &&
        f.getName != s"cell=${VectorIngest.HotCell}")
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(perCell.nonEmpty)
    // 4 waves over 16 cells: most cells receive several waves, so a
    // rewrite-free ingest leaves >1 file in at least one cell dir
    assert(perCell.max > 1,
      s"expected per-batch appended files, got ${perCell.mkString(",")}")
  }

  test("a partially-committed batch (one exposed file lost) is surgically repaired on replay") {
    val t = freshStore()
    val loc = new java.io.File(graft.io.Warehouse.tableLocation(spark, t))
    val full = storeRows(t)
    // simulate a crash inside a batch's multi-directory job commit:
    // one of its per-batch files vanishes. Pick a NON-hot cell with
    // several per-batch files so compaction state can't interfere.
    val victim = loc.listFiles()
      .filter(f => f.getName.startsWith("cell=") &&
        f.getName != s"cell=${VectorIngest.HotCell}")
      .map(_.listFiles().filter(_.getName.endsWith(".parquet")))
      .filter(_.length > 1).head.head
    assert(victim.delete())
    spark.catalog.refreshTable(t)
    assert(storeRows(t).size < full.size, "fixture: rows must be missing")
    // lost completion marker + replay → the damaged batch's presence
    // count mismatches, its surviving files are dropped, the batch
    // re-appends; every intact batch is skipped
    val log = new java.io.File(loc, graft.io.Warehouse.IngestLogFile)
    java.nio.file.Files.deleteIfExists(
      new java.io.File(loc, "." + graft.io.Warehouse.IngestLogFile + ".crc").toPath)
    java.nio.file.Files.writeString(log.toPath, "")
    VectorIngest.ensureStreamedCellStore(spark, Sf)
    spark.catalog.refreshTable(t)
    assert(storeRows(t) == full, "repair must restore the exact content")
  }

  test("q200 compaction collapses the hot cell to one file, touches no sibling, keeps every row") {
    val t = VectorIngest.ensureStreamedCellStore(spark, Sf)
    val loc = new java.io.File(graft.io.Warehouse.tableLocation(spark, t))
    def cellFiles(c: Int): Set[(String, Long)] =
      new java.io.File(loc, s"cell=$c").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    val rows = storeRows(t)
    val siblings = (0 until graft.queries.AnnTrained.Cells)
      .filter(_ != VectorIngest.HotCell)
      .filter(c => new java.io.File(loc, s"cell=$c").isDirectory)
      .map(c => c -> cellFiles(c)).toMap
    VectorIngest.ensureCompactedHotCell(spark, Sf)
    spark.catalog.refreshTable(t)
    assert(cellFiles(VectorIngest.HotCell).size == 1,
      "hot cell must collapse to one file")
    siblings.foreach { case (c, before) =>
      assert(cellFiles(c) == before, s"compaction must not touch cell=$c")
    }
    assert(storeRows(t) == rows, "compaction must keep every row")
    // exactly-once: a second call is a marker hit, no rewrite
    val after = cellFiles(VectorIngest.HotCell)
    VectorIngest.ensureCompactedHotCell(spark, Sf)
    assert(cellFiles(VectorIngest.HotCell) == after)
  }

  test("q197 probe over the streamed store partition-prunes to the probed cells") {
    val df = AnnTrained.q197(spark, Sf)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val scan = scans.find(_.relation.location.rootPaths.exists(
      _.toString.contains("graft_emb_cellstream_"))).getOrElse(
      fail("no streamed-store scan in q197 plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"probed cells must be partition filters, got ${scan.partitionFilters}")
    val t = VectorIngest.ensureStreamedCellStore(spark, Sf)
    val selectedDirs = scan.relation.location.listFiles(Nil, Nil).size
    val total = spark.sql(s"SHOW PARTITIONS $t").count().toInt
    assert(selectedDirs < total,
      s"expected pruning: scanned $selectedDirs of $total cell directories")
  }
}
