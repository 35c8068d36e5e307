package graft

import org.apache.spark.sql.functions._
import graft.queries.Retrieval

/** q122's one transcendental, swept at its fixed-point floor — the
  * ScaledSumSpec discipline applied to BM25: `idf = ln(1 + (N-df+.5)
  * /(df+.5))` is correctly rounded only to ~1 ulp, and engines may
  * legitimately differ by that ulp. The contribution then lands in a
  * `floor(x*1e6+0.5)` bucket, so the ONLY way cross-engine drift can
  * surface is a bucket FLIP under a 1-ulp idf change. This spec
  * computes every (probe term × document) contribution the real
  * query produces — at the spec SF and the driver's oracle SF — and
  * asserts no contribution flips its bucket when the idf is perturbed
  * by ±1 ulp. That checks the actual failure predicate, not a proxy
  * distance: any future corpus that DOES land a boundary fails here
  * with the exact (term, doc) named, before the driver's row-exact
  * gate reports an opaque hash mismatch.
  */
class BmBoundarySpec extends SparkTestBase {

  private def sweep(dir: String): Unit = {
    val tf = Retrieval.tfIndex(spark, dir)
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val dfr = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val (nDocs, sumDl) = {
      val r = dl.agg(count(lit(1)), sum(col("dl"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val probeTerms = Retrieval.Probes.map(_._2).distinct
    val rows = tf.where(col("t").isin(probeTerms: _*))
      .join(dl, "doc_id")
      .join(dfr, "t")
      .select(col("t"), col("doc_id"), col("tf"), col("dl"), col("df"))
      .collect()
    assert(rows.nonEmpty, s"no probe-term rows at $dir — sweep is vacuous")
    val offenders = rows.flatMap { r =>
      val (tfv, dlv, dfv) = (r.getAs[Long]("tf"), r.getAs[Long]("dl"), r.getAs[Long]("df"))
      val idf = math.log(1.0 + (nDocs - dfv + 0.5) / (dfv + 0.5))
      def bucket(i: Double): Long = {
        val c = i * (tfv * (Retrieval.BmK1 + 1)) /
          (tfv + Retrieval.BmK1 * ((1 - Retrieval.BmB) + Retrieval.BmB *
            dlv / (sumDl.toDouble / nDocs)))
        math.floor(c * Retrieval.BmScale + 0.5).toLong
      }
      val b = bucket(idf)
      if (bucket(idf + Math.ulp(idf)) != b || bucket(idf - Math.ulp(idf)) != b)
        Some(s"(${r.getAs[String]("t")}, doc ${r.getAs[Long]("doc_id")})")
      else None
    }
    assert(offenders.isEmpty,
      s"fixed-point buckets at $dir flip under 1-ulp idf drift: ${offenders.mkString(", ")}")
    info(s"$dir: ${rows.length} contributions swept, no bucket within 1 ulp of a boundary")
  }

  test("no BM25 contribution sits within an idf ulp of its fixed-point boundary") {
    sweep(Sf)
    sweep("/root/testdata/sf0.01") // the driver's oracle SF
  }
}
