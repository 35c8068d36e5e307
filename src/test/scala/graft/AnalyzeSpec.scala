package graft

import graft.queries.AnalyzeOps

/** The unified ANALYZE operator (q184): the persisted stats table
  * must survive the rebuild-vs-reread boundary bit-identically, and
  * every decision column must recompute in plain Scala from the
  * stats row it was derived from (the oracle certifies values; this
  * pins the derivation rules independently of both engines' SQL).
  */
class AnalyzeSpec extends SparkTestBase {

  test("stats table rereads from surviving files bit-identically") {
    val t = AnalyzeOps.ensureStatsTable(spark, Sf)
    val built = spark.table(t).collect().toSet
    assert(built.size == 4, "one stats row per profiled column")
    spark.sql(s"DROP TABLE $t")
    val t2 = AnalyzeOps.ensureStatsTable(spark, Sf)
    assert(t2 == t)
    assert(graft.io.Warehouse.lastProvision(spark, t).contains("files"),
      "dropping the catalog entry must re-register surviving files, not rebuild")
    assert(spark.table(t).collect().toSet == built,
      "reread stats must equal the built stats bit-for-bit")
  }

  test("q184 decision columns recompute in plain Scala from the stats rows") {
    val rows = AnalyzeOps.q184(spark, Sf).collect()
    assert(rows.length == 4)
    def rn6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val bits = 64 - java.lang.Long.numberOfLeadingZeros(n)
      assert(r.getAs[Long]("n_bins") == bits.toLong,
        s"Sturges bins must be bitLength(n): $bits")
      val w = rn6((r.getAs[Double]("max_v") - r.getAs[Double]("min_v"))
        / bits.toDouble)
      assert(r.getAs[Double]("bin_w") == w)
      assert(r.getAs[Boolean]("low_card") ==
        (r.getAs[Double]("est_ndv") < AnalyzeOps.LowCardNdv))
      // quantiles must be ordered and inside the histogram ENVELOPE
      // (in-bin interpolation may legitimately overshoot the true max
      // by up to one bin width, but never the envelope)
      val (_, lo, hi) = graft.queries.SketchQueries.QProfileCols
        .find(_._1 == r.getAs[String]("col_name")).get
      val ps = Seq("p25", "p50", "p75", "p90", "p99").map(r.getAs[Double])
      assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
      assert(ps.head >= lo && ps.last <= hi)
    }
    // exactly one Bloom build side: the argmin-est_ndv column
    val picked = rows.filter(_.getAs[Boolean]("is_bloom_key"))
    assert(picked.length == 1)
    assert(picked.head.getAs[Double]("est_ndv") ==
      rows.map(_.getAs[Double]("est_ndv")).min)
  }

  test("q186 merged stats equal the direct single-pass stats (Spark-side identity)") {
    import org.apache.spark.sql.functions._
    import graft.queries.SketchQueries
    // the oracle certifies merged == direct cross-engine; this pins
    // the same identity WITHIN Spark against the q179/q181 green paths
    val merged = AnalyzeOps.q186(spark, Sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val direct = SketchQueries.q179(spark, Sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val qp = SketchQueries.quantileProfile(spark, Sf, SketchQueries.HistQs)
      .collect()
      .groupBy(_.getAs[String]("col_name"))
      .view.mapValues(_.map(r =>
        r.getAs[Double]("q") -> r.getAs[Double]("p_est")).toMap).toMap
    assert(merged.keySet == direct.keySet && merged.size == 4)
    merged.foreach { case (cn, m) =>
      val d = direct(cn)
      assert(m.getAs[Long]("n") == d.getAs[Long]("n"))
      assert(m.getAs[Double]("est_ndv") == d.getAs[Double]("est_ndv"),
        s"$cn: merged registers must estimate exactly like direct ones")
      assert(m.getAs[Double]("min_v") == d.getAs[Double]("min_v"))
      assert(m.getAs[Double]("max_v") == d.getAs[Double]("max_v"))
      assert(m.getAs[Double]("sum_v") == d.getAs[Double]("sum_v"))
      Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99").foreach { case (q, p) =>
        assert(m.getAs[Double](p) == qp(cn)(q),
          s"$cn $p: merged histogram counters must solve exactly like direct")
      }
    }
  }
}
