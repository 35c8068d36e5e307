package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.KMeansCodebook
import graft.queries.{AnnTrained, Similarity}

/** Trained-quantizer ANN: recall versus the brute-force truth must be
  * at least the untrained sample quantizer's, and training must be
  * bit-deterministic (the property the DuckDB oracle depends on).
  */
class AnnSpec extends SparkTestBase {

  private def topSet(df: DataFrame, k: Int): Set[(Long, Long)] =
    df.filter(col("rank") <= k).select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("k-means IVF recall >= sample-codebook IVF recall (vs brute force)") {
    val truth = topSet(Similarity.q36(spark, Sf), 3)
    val sample = topSet(Similarity.q59(spark, Sf), 3)
    val trained = topSet(AnnTrained.q70(spark, Sf), 3)
    val rSample = (truth & sample).size.toDouble / truth.size
    val rTrained = (truth & trained).size.toDouble / truth.size
    assert(rTrained >= rSample,
      s"trained recall $rTrained < sample recall $rSample")
    assert(rTrained > 0.0)
  }

  test("q111 recall harness agrees with the independently computed set intersection") {
    val truth = topSet(Similarity.q36(spark, Sf), Similarity.RecallK)
    val lsh = Similarity.q37(spark, Sf).select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (truth & lsh).size
    val rows = Similarity.q111(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("lsh_hits")).sum == expected.toLong,
      "q111's per-probe hit counts must sum to the set-intersection size")
    rows.foreach { r =>
      assert(r.getAs[Double]("lsh_recall") >= 0.0 && r.getAs[Double]("lsh_recall") <= 1.0)
      assert(r.getAs[Double]("ivf_recall") >= 0.0 && r.getAs[Double]("ivf_recall") <= 1.0)
    }
  }

  test("IVF-PQ composition: structure sound; coarse stage carries the recall") {
    // On this ISOTROPIC synthetic corpus 4-bit PQ ranking is
    // data-limited (see PqQueries.q85 scaladoc — measured ~0.03, and
    // ≤0.33 across a parameter sweep), so the recall bar belongs to
    // the coarse stage, which scores exactly: q59 must keep real
    // recall. For q85 the spec pins structure: every probe answers
    // with a full, deduplicated top-3 and approximate cosines stay in
    // a cosine's range.
    val truth = topSet(Similarity.q36(spark, Sf), 3)
    val coarse = topSet(Similarity.q59(spark, Sf), 3)
    assert((truth & coarse).size.toDouble / truth.size >= 0.3,
      "coarse IVF stage lost its recall")
    val rows = graft.queries.PqQueries.q85(spark, Sf).collect()
    val queries = truth.map(_._1)
    assert(rows.map(_.getLong(0)).toSet == queries, "every probe must answer")
    queries.foreach { q =>
      val mine = rows.filter(_.getLong(0) == q)
      assert(mine.length == 3, s"probe $q returned ${mine.length} rows")
      assert(mine.map(_.getAs[Long]("vec_id")).distinct.length == 3)
      assert(!mine.map(_.getAs[Long]("vec_id")).contains(q), "self-match leaked")
    }
    rows.foreach(r => assert(math.abs(r.getAs[Double]("acos")) <= 1.5,
      "approximate cosine out of range"))
  }

  test("nprobe knob: probing every cell recovers brute-force exactly") {
    // nprobe == cells ⇒ the candidate set is the whole corpus, so the
    // IVF plan must return exactly the brute-force answer — the
    // recall/cost dial's correctness anchor
    spark.conf.set("spark.graft.ann.ivf.nprobe", Similarity.IvfCells.toString)
    try {
      val all = topSet(Similarity.q59(spark, Sf), 3)
      val truth = topSet(Similarity.q36(spark, Sf), 3)
      assert(all == truth, "full-probe IVF must equal brute force")
    } finally spark.conf.unset("spark.graft.ann.ivf.nprobe")
  }

  test("codebook training is bit-deterministic across runs") {
    val a = KMeansCodebook.train(spark, Sf, AnnTrained.Cells, AnnTrained.Iters)
    val b = KMeansCodebook.train(spark, Sf, AnnTrained.Cells, AnnTrained.Iters)
    assert(a.length == AnnTrained.Cells)
    a.zip(b).foreach { case (ca, cb) =>
      assert(java.util.Arrays.equals(ca, cb), "centroids must be bit-identical")
    }
    // training must actually move the centroids off the init sample
    val init = graft.sources.Tables.embeddings(spark, Sf)
      .filter(col("vec_id") < AnnTrained.Cells).orderBy("vec_id").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    assert(a.zip(init).exists { case (c, i) => !java.util.Arrays.equals(c, i) })
  }
}
