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
