package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFns, TextKernels}
import graft.sources.Tables

/** The SQL surface registered by GraftExtensions must equal the
  * column-API kernels bit-for-bit.
  */
class ExtensionsSpec extends SparkTestBase {

  private lazy val docs =
    Tables.documents(spark, Sf).select(col("doc_id"), col("text")).limit(50)

  test("graft_hash60 / graft_minhash_sig / graft_bigram_set SQL == kernel columns") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_hash60(text) AS h, graft_bigram_set(text) AS sh,
        |  graft_minhash_sig(text) AS sig, graft_tf_embedding(text) AS emb
        |FROM ext_docs""".stripMargin)
    val viaCol = docs.select(col("doc_id"),
      TextFns.hash60(col("text")).as("h"),
      TextKernels.bigramSetCol(col("text")).as("sh"),
      TextKernels.minhashSigCol(col("text")).as("sig"),
      TextKernels.tfEmbeddingCol(col("text")).as("emb"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("graft_rep_metrics SQL == TextKernels column") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_rep_metrics(text) AS m FROM ext_docs")
    val viaCol = docs.select(col("doc_id"),
      graft.functions.TextKernels.repMetricsCol(col("text")).as("m"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("graft_byte_stats SQL == BinKernels column") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_byte_stats(encode(text, 'UTF-8')) AS s FROM ext_docs")
    val viaCol = docs.select(col("doc_id"),
      graft.functions.BinKernels.byteStatsCol(encode(col("text"), "UTF-8")).as("s"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("graft_simhash60 / graft_kmv_distinct / graft_countmin SQL == column API") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash60(text) AS sh FROM ext_docs")
    val viaCol = docs.select(col("doc_id"),
      TextKernels.simhash60Col(col("text")).as("sh"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)

    val fsSql = spark.sql(
      "SELECT doc_id, graft_fp_simhash16(text) AS fs FROM ext_docs")
    val fsCol = docs.select(col("doc_id"),
      TextKernels.fpSimhash16Col(col("text")).as("fs"))
    assert(fsSql.exceptAll(fsCol).isEmpty && fsCol.exceptAll(fsSql).isEmpty)

    Tables.documents(spark, Sf)
      .select(col("source"), (TextFns.hash60(col("text")) % TextFns.P).as("h"))
      .createOrReplaceTempView("ext_hashes")
    val aggSql = spark.sql(
      """SELECT source, graft_kmv_distinct(h) AS kmv, graft_countmin(h) AS cms
        |FROM ext_hashes GROUP BY source""".stripMargin)
    val aggCol = spark.table("ext_hashes").groupBy("source")
      .agg(graft.functions.KmvSketch.kmvDistinct(col("h")).as("kmv"),
        graft.functions.CountMinSketch.countMin(col("h")).as("cms"))
    assert(aggSql.count() > 0)
    assert(aggSql.exceptAll(aggCol).isEmpty && aggCol.exceptAll(aggSql).isEmpty)
  }

  test("graft_dot SQL == codegen dot column (bitwise)") {
    Tables.embeddings(spark, Sf).limit(100).createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS d FROM ext_emb")
    val viaCol = Tables.embeddings(spark, Sf).limit(100).select(col("vec_id"),
      graft.functions.VecFns.dotCol(col("embedding"), col("embedding")).as("d"))
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("graft_minhash_merge aggregates through SQL") {
    Tables.documents(spark, Sf)
      .select(col("source"), TextKernels.minhashSigCol(col("text")).as("sig"))
      .createOrReplaceTempView("ext_sigs")
    val viaSql = spark.sql(
      """SELECT source, graft_minhash_merge(sig) AS merged
        |FROM ext_sigs GROUP BY source""".stripMargin)
    val viaCol = Tables.documents(spark, Sf)
      .select(col("source"), TextKernels.minhashSigCol(col("text")).as("sig"))
      .groupBy("source")
      .agg(graft.functions.MinHashMerge.minhashMerge(col("sig")).as("merged"))
    assert(viaSql.count() > 0)
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
  }

  test("graft_bpe_encode SQL == bpeEncodeCol on the toy merge table") {
    import spark.implicits._
    Seq("hug", "pug", "pun", "bun", "hugs", "gg", "u").toDF("w")
      .createOrReplaceTempView("ext_bpe")
    // the classic toy table: (u,g) (u,n) (h,ug) (p,un)
    val viaSql = spark.sql(
      """SELECT w, graft_bpe_encode(w,
        |  array('u g', 'u n', 'h ug', 'p un')) AS seg FROM ext_bpe""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaSql == Map(
      "hug" -> "hug", "pug" -> "p·ug", "pun" -> "pun", "bun" -> "b·un",
      "hugs" -> "hug·s", "gg" -> "g·g", "u" -> "u"))
  }

  test("graft_misra_gries aggregates through SQL; exact below capacity") {
    import spark.implicits._
    // vocabulary below capacity → the MG summary IS the exact count
    // table (no decrement ever fires), so SQL output is deterministic
    // and checkable against a plain GROUP BY
    Seq("a", "b", "a", "c", "a", "b").toDF("t")
      .createOrReplaceTempView("ext_mg")
    val got = spark.sql(
      "SELECT graft_misra_gries(t, 8) AS s FROM ext_mg")
      .select(explode(col("s")).as("e"))
      .select(col("e.token"), col("e.est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 3L), ("b", 2L), ("c", 1L)),
      s"summary must be the exact best-first counts (got $got)")
    // and it equals the column API bit-for-bit
    val viaCol = Seq("a", "b", "a", "c", "a", "b").toDF("t")
      .agg(graft.functions.MisraGriesAgg.sketch(col("t"), 8).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.token"), col("e.est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == viaCol)
  }

  test("graft_histogram aggregates through SQL == the column API") {
    import spark.implicits._
    Seq(-1.0, 0.0, 2.5, 5.0, 9.99, 10.0, 42.0).toDF("x")
      .createOrReplaceTempView("ext_hist")
    val got = spark.sql(
      "SELECT graft_histogram(x, 0.0, 10.0, 4) AS h FROM ext_hist")
      .head().getAs[scala.collection.Seq[Long]](0).toSeq
    // [underflow, 4 bins over [0,10) width 2.5, overflow]:
    // -1→uf; 0.0→b1; 2.5→b2 (left-closed); 5.0→b3; 9.99→b4; 10,42→of
    assert(got == Seq(1L, 1L, 1L, 1L, 1L, 2L), s"got $got")
    val viaCol = Seq(-1.0, 0.0, 2.5, 5.0, 9.99, 10.0, 42.0).toDF("x")
      .agg(graft.functions.HistogramSketch.histogram(
        col("x"), 0.0, 10.0, 4).as("h"))
      .head().getAs[scala.collection.Seq[Long]](0).toSeq
    assert(got == viaCol)
  }

  test("graft_topk aggregates through SQL == the column API") {
    import spark.implicits._
    Seq((3.0, 30L), (1.0, 10L), (9.0, 90L), (9.0, 5L), (4.0, 40L))
      .toDF("s", "id").createOrReplaceTempView("ext_topk")
    val got = spark.sql(
      "SELECT graft_topk(s, id, 3) AS t FROM ext_topk")
      .select(explode(col("t")).as("e"))
      .select(col("e.score"), col("e.id1"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // score desc, id asc tiebreak, exactly k rows
    assert(got == Seq((9.0, 5L), (9.0, 90L), (4.0, 40L)), s"got $got")
    val viaCol = Seq((3.0, 30L), (1.0, 10L), (9.0, 90L), (9.0, 5L), (4.0, 40L))
      .toDF("s", "id")
      .agg(graft.functions.TopKAgg.topK(
        col("s"), col("id"), lit(0L), 3).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.score"), col("e.id1"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(got == viaCol)
  }

  test("graft_hll aggregates through SQL == the column API, with a hand-checked tiny case") {
    import spark.implicits._
    // two distinct hashes, chosen so registers are hand-computable:
    // h=5 → j=5, w=0 → rho=53; h=256 → j=0, w=1 → rho=52
    Seq(5L, 256L, 5L).toDF("h").createOrReplaceTempView("ext_hll")
    val got = spark.sql("SELECT graft_hll(h) AS s FROM ext_hll")
      .head().getAs[scala.collection.Seq[Long]](0).toSeq
    val expectS = (1L << 0) + (1L << 1) + 254L * (1L << 53)
    assert(got == Seq(expectS, 254L), s"got $got")
    val viaCol = Seq(5L, 256L, 5L).toDF("h")
      .agg(graft.functions.HllSketch.hllSummary(col("h")).as("s"))
      .head().getAs[scala.collection.Seq[Long]](0).toSeq
    assert(got == viaCol)
  }

  test("graft_hll_regs -> graft_hll_merge through SQL == direct graft_hll over the union") {
    import spark.implicits._
    // three groups of hashes; merging the per-group register arrays
    // must equal sketching the union directly (HLL union algebra)
    val rows = (1 to 300).map(i => (i % 3, (i * 2654435761L) & ((1L << 60) - 1)))
    rows.toDF("g", "h").createOrReplaceTempView("ext_hll_m")
    val merged = spark.sql(
      """SELECT graft_hll_merge(r) AS s FROM
        |  (SELECT g, graft_hll_regs(h) AS r FROM ext_hll_m GROUP BY g)""".stripMargin)
      .head().getAs[scala.collection.Seq[Long]](0).toSeq
    val direct = spark.sql("SELECT graft_hll(h) AS s FROM ext_hll_m")
      .head().getAs[scala.collection.Seq[Long]](0).toSeq
    assert(merged == direct, s"merged $merged != direct $direct")
    // and a non-long input to graft_hll fails at ANALYSIS, not runtime
    val err = intercept[Exception](
      spark.sql("SELECT graft_hll(CAST(h AS STRING)) FROM ext_hll_m").collect())
    assert(err.getMessage.contains("BIGINT"), err.getMessage)
  }
}
