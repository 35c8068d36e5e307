package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.SketchQueries

/** Incremental maintenance of the persisted source-sketch table
  * (q185 / q180): merging an append batch's register rows into the
  * base table's rows must be BIT-EQUAL to rebuilding from the whole
  * corpus — at the register level, against the q180 table's stored
  * rows, and through a real in-place warehouse maintenance write
  * (including the idempotent re-merge).
  */
class IncrementalHllSpec extends SparkTestBase {

  private def regMap(df: DataFrame): Map[String, Seq[Byte]] =
    df.collect().map(r => r.getAs[String]("source") ->
      r.getAs[Array[Byte]]("r").toSeq).toMap

  private def docs = graft.sources.Tables.documents(spark, Sf)
  private def baseRegs =
    SketchQueries.sourceRegs(docs.where(pmod(col("doc_id"), lit(8)) =!= 0))
  private def batchRegs =
    SketchQueries.sourceRegs(docs.where(pmod(col("doc_id"), lit(8)) === 0))

  test("merge of base+batch registers is bit-equal to the full rebuild and to the q180 table") {
    val merged = regMap(SketchQueries.mergeSourceRegs(baseRegs, batchRegs))
    val full = regMap(SketchQueries.sourceRegs(docs))
    assert(merged.nonEmpty && merged == full,
      "incremental merge must reproduce the one-shot corpus aggregate bit-for-bit")
    // the persisted table q180 reads holds exactly these rows — the
    // table IS maintainable by batch merges, no rebuild ever needed
    val stored = regMap(SketchQueries.persistedSourceSketches(spark, Sf))
    assert(stored == full,
      "q180's persisted rows must equal the incrementally-maintainable content")
  }

  test("in-place maintenance write: append batch, idempotent re-append, q180 matrix unchanged") {
    val t = "graft_test_incr_hll"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    // base-generation table (the state before the append arrives)
    graft.io.Warehouse.ensureTable(spark, t,
      s"$Sf/documents.parquet", "source STRING, r BINARY")(baseRegs)
    // the stale-fingerprint path may have REUSED surviving files from
    // a previous suite run that already absorbed the batch — force the
    // base build so the append below actually transitions the table
    if (regMap(spark.table(t)) != regMap(baseRegs)) {
      spark.sql(s"DROP TABLE $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(loc, true)
      graft.io.Warehouse.ensureTable(spark, t,
        s"$Sf/documents.parquet", "source STRING, r BINARY")(baseRegs)
    }
    assert(regMap(spark.table(t)) == regMap(baseRegs))
    // absorb the append: O(sources) merge, no corpus re-read
    SketchQueries.appendSourceSketchBatch(spark, t, batchRegs,
      s"$Sf/documents.parquet")
    val full = regMap(SketchQueries.sourceRegs(docs))
    assert(regMap(spark.table(t)) == full,
      "maintained table must equal the full rebuild after the append")
    // the maintenance write must RESTORE the fingerprint (the
    // overwrite insert deletes the directory first): a new session's
    // re-registration must still take the files path, not a rebuild
    spark.sql(s"DROP TABLE $t")
    graft.io.Warehouse.ensureTable(spark, t,
      s"$Sf/documents.parquet", "source STRING, r BINARY")(
      fail("fingerprint lost by the maintenance write: rebuild forced"))
    assert(graft.io.Warehouse.lastProvision(spark, t).contains("files"),
      "maintained rows must re-register from surviving files")
    assert(regMap(spark.table(t)) == full)
    // a replayed append is a no-op (register max is idempotent)
    SketchQueries.appendSourceSketchBatch(spark, t, batchRegs,
      s"$Sf/documents.parquet")
    assert(regMap(spark.table(t)) == full,
      "re-appending an absorbed batch must not change the table")
    // and the q180 overlap matrix over the MAINTAINED table is the
    // q180 result itself
    val viaMaintained =
      SketchQueries.overlapMatrix(spark.table(t)).collect().toSeq
    val viaQ180 = SketchQueries.q180(spark, Sf).collect().toSeq
    assert(viaMaintained.nonEmpty && viaMaintained == viaQ180)
  }
}
