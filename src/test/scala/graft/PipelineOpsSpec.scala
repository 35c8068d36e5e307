package graft

import org.apache.spark.sql.functions._
import graft.queries.PipelineOps
import graft.sources.Tables

/** Structural properties of the training-pipeline operators that the
  * value-hash oracle can't express: conservation, exclusions, and
  * bound invariants.
  */
class PipelineOpsSpec extends SparkTestBase {

  test("q102 packing conserves every token and starts each shard at window 0") {
    val rows = PipelineOps.q102(spark, Sf).collect()
    val total = Tables.documents(spark, Sf)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("window_tokens")).sum == total,
      "packing must conserve the token count exactly")
    rows.groupBy(_.getAs[Long]("shard")).values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("window_id")).min == 0,
        "first document of a shard starts at offset 0 → window 0")
      rs.foreach(r => assert(r.getAs[Long]("n_docs") > 0))
    }
  }

  test("q155 DSIR weights match a plain-Scala hashed-distribution recount") {
    import graft.functions.TextKernels
    val docs = Tables.documents(spark, Sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def h(w: String): Long =
      TextKernels.hash60(w.getBytes("UTF-8")) % PipelineOps.DsirBuckets
    val toks = docs.flatMap { case (id, src, text) =>
      text.split(" ", -1).map(w => (id, src, h(w))) }
    val cAll = toks.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val cTgt = toks.filter(_._2 == PipelineOps.DsirTarget)
      .groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val nAll = toks.length.toLong
    val nTgt = toks.count(_._2 == PipelineOps.DsirTarget).toLong
    val expected = toks.groupBy(t => (t._1, t._2)).map { case ((id, src), ts) =>
      val raw = ts.groupBy(_._3).map { case (b, bs) =>
        bs.length.toLong * (cTgt.getOrElse(b, 0L) * nAll - cAll(b) * nTgt)
      }.sum
      (id, src, ts.length.toLong, raw, src == PipelineOps.DsirTarget)
    }.toSeq.sortBy(t => (-t._4, t._1)).take(PipelineOps.DsirTopK)
    val rows = PipelineOps.q155(spark, Sf).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(rows == expected)
    // the signal must be real: target docs lean positive vs the field
    val tgtMean = expected.filter(_._5).map(_._4).sum.toDouble /
      math.max(expected.count(_._5), 1)
    assert(expected.count(_._5) > 0, "target docs must reach the top-K")
    assert(tgtMean > 0, "target-leaning scores must be positive")
  }

  test("q100 never flags a benchmark document (index side excluded from corpus)") {
    val flagged = PipelineOps.q100(spark, Sf).collect()
    assert(flagged.forall(_.getAs[Long]("doc_id") % 23 != 1))
    flagged.foreach { r =>
      assert(r.getAs[Long]("overlap") <= r.getAs[Int]("total").toLong,
        "overlap is a subset of the doc's shingles")
    }
  }

  test("q104 thresholds are valid probabilities and kept mix lands near target") {
    val rows = PipelineOps.q104(spark, Sf).collect()
    rows.foreach { r =>
      val th = r.getAs[Long]("keep_thresh")
      assert(th >= 0 && th <= 10000, s"threshold $th out of [0, 10000]")
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
    val en = rows.find(_.getAs[String]("lang") == "en").get
    // basis-point thresholds on a small corpus: coarse but unbiased
    assert(math.abs(en.getAs[Double]("achieved_share") - 0.40) < 0.1,
      s"en share ${en.getAs[Double]("achieved_share")} far from target 0.40")
  }

  test("q113 temperature flattens the mix: kept max-share <= raw max-share, thresholds valid") {
    val rows = PipelineOps.q113(spark, Sf).collect()
    val rawTotal = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val rawMax = rows.map(_.getAs[Long]("n_docs")).max / rawTotal
    val keptMax = rows.map(_.getAs[Double]("achieved_share")).max
    assert(keptMax <= rawMax + 1e-9,
      s"tau=2 must not make the dominant language MORE dominant ($keptMax > $rawMax)")
    rows.foreach { r =>
      val th = r.getAs[Long]("keep_thresh")
      assert(th >= 0 && th <= 10000)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q167 waterfill matches an independent bisection solve and is max-min fair") {
    import org.apache.spark.sql.functions._
    val rows = PipelineOps.q167(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val avail = rows.map { case (_, a, _) => a }
    val budget = avail.sum * PipelineOps.WaterfillBudgetPct / 100
    // independent solve: bisect the waterline instead of the query's
    // sorted-prefix closed form
    def allocated(lam: Double) = avail.map(a => math.min(a.toDouble, lam)).sum
    var (lo, hi) = (0.0, avail.max.toDouble)
    for (_ <- 1 to 200) {
      val mid = (lo + hi) / 2
      if (allocated(mid) < budget) lo = mid else hi = mid
    }
    val lam = (lo + hi) / 2
    rows.foreach { case (s, a, alloc) =>
      assert(math.abs(alloc - math.min(a.toDouble, lam)) < 1e-3,
        s"$s: got $alloc, bisection says ${math.min(a.toDouble, lam)}")
    }
    // the budget is spent exactly (up to output rounding)
    assert(math.abs(rows.map(_._3).sum - budget.toDouble) < 0.01 * rows.length)
    // max-min fairness: every non-exhausted source gets the SAME share
    val unexhausted = rows.filter { case (_, a, alloc) => alloc < a - 1e-6 }
    assert(unexhausted.map(_._3).distinct.length <= 1,
      "two non-exhausted sources got different allocations")
    // and no exhausted source had more than the waterline available
    assert(rows.forall { case (_, a, alloc) =>
      alloc <= a + 1e-9 && alloc >= 0 })
  }

  test("q103 dedup manifest is internally consistent") {
    PipelineOps.q103(spark, Sf).collect().foreach { r =>
      val m = r.getAs[Long]("n_members")
      val d = r.getAs[Long]("n_dropped")
      assert(d <= math.max(0L, m - 1), "at least one member per cell survives")
      assert(r.getAs[Long]("n_dup_pairs") >= d,
        "every dropped id is witnessed by at least one pair")
    }
  }
}
