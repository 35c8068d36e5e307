package graft

import org.apache.spark.sql.functions._
import graft.io.GenLog
import graft.queries.AnnTrained

/** Codebook evolution through the generation log (q215/q216): the
  * retrained generation must leave the old generation's files
  * untouched on disk, both generations must serve their own
  * codebook's answers, and the log-pinned probe must agree with the
  * catalog-table store that shares its oracle.
  */
class CodebookEvoSpec extends SparkTestBase {

  private def probeRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("cell"), col("vec_id"),
        col("cosine"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSeq

  test("the retrain commits a new generation; the old generation's files and answers are untouched") {
    val loc = AnnTrained.ensureEvolvedCellStore(spark, Sf)
    val gens = GenLog.generations(spark, loc).toMap
    val (old, neu) = (gens(s"cb_i${AnnTrained.Iters}"),
      gens(s"cb_i${AnnTrained.ItersEvolved}"))
    // the generations are disjoint layouts — the retrain wrote its
    // own files and REMOVED (not rewrote) the old ones from live
    assert(old.toSet.intersect(neu.toSet).isEmpty,
      "re-assignment must never co-locate with the old generation's files")
    assert(old.forall(f => new java.io.File(f).exists()),
      "the old codebook's files must survive for AS-OF reads")
    // the two assignments genuinely differ somewhere (the extra Lloyd
    // iteration moved at least one boundary vector)
    def cellsOf(gen: String) = GenLog.read(spark, loc, gen)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val (ca, cb) = (cellsOf(s"cb_i${AnnTrained.Iters}"),
      cellsOf(s"cb_i${AnnTrained.ItersEvolved}"))
    assert(ca.keySet == cb.keySet, "both generations hold the full corpus")
    assert(ca.exists { case (k, c) => cb(k) != c },
      "fixture: the retrained codebook must move at least one vector")
    // the AS-OF probe equals the catalog-table store probe (they
    // share q182's oracle; this pins the equality Spark-side too)
    assert(probeRows(AnnTrained.q215(spark, Sf)) ==
      probeRows(AnnTrained.q182(spark, Sf)),
      "AS-OF the old generation must serve exactly the old store's answers")
  }

  test("manifest pruning: the evolved probe reads only the probed cells' files") {
    val loc = AnnTrained.ensureEvolvedCellStore(spark, Sf)
    val evolved = AnnTrained.q216(spark, Sf)
    val live = GenLog.generations(spark, loc).toMap
      .apply(s"cb_i${AnnTrained.ItersEvolved}")
    // the probe also scans the flat corpus for its query batch; the
    // STORE-side reads are the files under the store location
    val read = evolved.inputFiles.map(f =>
      new org.apache.hadoop.fs.Path(new java.net.URI(f)).toUri.getPath)
      .filter(_.startsWith(loc)).toSet
    assert(read.nonEmpty && read.subsetOf(live.toSet),
      "the store-side reads must be live files only")
    assert(read.size < live.size,
      s"manifest pruning must skip unprobed cells: read ${read.size} of ${live.size}")
    // every file read belongs to a probed cell directory
    val cells = read.flatMap(f =>
      "/cell_k=(\\d+)/".r.findFirstMatchIn(f).map(_.group(1).toInt))
    assert(cells.size < AnnTrained.Cells,
      s"probed-cell union must be a strict subset, got $cells")
  }
}
