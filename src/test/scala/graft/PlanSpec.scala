package graft

import graft.queries.{CurationOps, Dedup, EventsOps, Relational}

/** Physical-plan assertions: the scale-critical properties promised in
  * the operator Scaladocs, checked against the actual executed plans —
  * pushdown reaches the scan, small sides broadcast, top-k avoids
  * global sorts, and co-partitioned stages share one exchange.
  */
class PlanSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q05: filters pushed to parquet scan; unused columns pruned") {
    val p = plan(Relational.q05(spark, Sf))
    val scanLine = p.split('\n').find(_.contains("PushedFilters")).getOrElse("")
    assert(scanLine.contains("l_quantity"), s"filter not pushed: $scanLine")
    val readSchema = p.split('\n').find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_tax"), "unused column not pruned from scan")
    assert(!readSchema.contains("l_shipdate"), "unused column not pruned from scan")
  }

  test("q11: dimension side broadcast; top-10 via TakeOrderedAndProject") {
    val p = plan(Relational.q11(spark, Sf))
    assert(p.contains("BroadcastHashJoin"), "customer dim should broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k should not global-sort")
  }

  test("q06: top-k-then-resort plans TakeOrderedAndProject") {
    assert(plan(Relational.q06(spark, Sf)).contains("TakeOrderedAndProject"))
  }

  test("q39: lag + running-sum + groupBy share the user_id exchange") {
    val p = plan(EventsOps.q39(spark, Sf))
    val exchanges = p.split('\n').count(l =>
      l.contains("Exchange hashpartitioning"))
    // one hash exchange for the windows+aggregate; the final orderBy adds
    // a range exchange, counted separately
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$p")
  }

  test("q155: corpus-distribution branch reuses the doc-bucket exchange") {
    // the per-doc aggregate and the corpus distribution branch from
    // one (doc_id, source, b) exchange; ReuseExchange must dedupe it
    // so the token explode is scanned and shuffled once for both (the
    // target branch intentionally re-scans — its source filter pushes
    // to the scan and reads 1/20 of the corpus instead). Inspected
    // with AQE off: under AQE the same dedup happens at runtime via
    // the stage cache, which the pre-execution plan string can't show.
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val p = plan(graft.queries.PipelineOps.q155(spark, Sf))
      assert(p.contains("ReusedExchange"),
        s"expected the doc-bucket exchange to be reused, plan:\n$p")
      assert(p.contains("BroadcastExchange"), "weight table must broadcast")
      // full-corpus scans: ONE shared by docB+allB; the pushed-filter
      // target scan is the only other read
      val scans = p.split('\n').filter(_.contains("Scan parquet"))
      assert(scans.length == 2,
        s"expected shared corpus scan + pushed target scan, saw:\n${scans.mkString("\n")}")
      assert(scans.count(_.contains("EqualTo(source,")) == 1,
        "target branch must push its source filter to the scan")
    } finally spark.conf.set(key, prev)
  }

  test("q34: LSH band self-join is a hash join, never nested-loop") {
    // the cached q34 plan is a LogicalRDD leaf (scored pairs are
    // materialized once per session); the assertion targets the
    // underlying pipeline that materialization runs
    val p = plan(Dedup.lshScoredPairsUncached(spark, Sf))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"),
      "band join must not degrade to a cartesian product")
  }

  test("q50: as-of join composition plans one hash exchange, no range join") {
    val p = plan(graft.queries.SketchQueries.q50(spark, Sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of join must not degrade to a product/range probe")
    val windowExchanges = p.split('\n')
      .count(l => l.contains("Exchange hashpartitioning") && l.contains("user_id"))
    assert(windowExchanges <= 2, s"expected at most union+window exchanges:\n$p")
  }

  test("graft_dot codegen expression stays inside WholeStageCodegen") {
    import org.apache.spark.sql.functions.col
    val df = graft.sources.Tables.embeddings(spark, Sf)
      .select(graft.functions.VecFns.dotCol(col("embedding"), col("embedding")).as("d"))
      .filter(col("d") > 0)
    val p = plan(df)
    // a star prefix (`*(n)`) marks an operator compiled into a
    // WholeStageCodegen stage; both the project evaluating graft_dot
    // and the filter referencing it must carry it (no interpreted
    // fallback)
    val lines = p.split('\n')
    val dotLines = lines.filter(_.contains("graft_dot"))
    assert(dotLines.nonEmpty, s"graft_dot not in plan:\n$p")
    dotLines.filterNot(_.contains("FileScan")).foreach { l =>
      val op = l.trim.replaceFirst("^[+\\-:| ]+", "") // strip tree-drawing prefix
      assert(op.startsWith("*"),
        s"graft_dot operator fell out of codegen: $l")
    }
    assert(df.count() > 0)
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan(Relational.q01(spark, Sf))
    val hashAggs = p.split('\n').count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, "expected partial + final HashAggregate")
  }

  test("q169: redaction output never shuffles; TWO exchanges total " +
      "(doc_id fan-out of the raw rows + the source rollup)") {
    val p = plan(CurationOps.q169(spark, Sf))
    val lines = p.split('\n')
    // two hash-partitioned exchanges: the fan-out of the RAW rows
    // before the regexp chain (the single-file scan is unsplittable —
    // guide §2.5; at production split counts the scan parallelizes
    // itself and this exchange is the only bench-scale concession)
    // and the source rollup. The MASKED text never shuffles: the
    // rollup exchange carries only the per-source partial aggregate.
    assert(lines.count(l =>
      l.contains("Exchange hashpartitioning")) == 2, p)
    // the fan-out must sit BELOW the redaction projection (the
    // regexp chain runs on the fanned side, not before the exchange):
    // in formatted tree order the LAST hashpartitioning exchange is
    // the deepest, and the redaction projection must appear above it
    val fanIdx = lines.lastIndexWhere(_.contains("Exchange hashpartitioning"))
    val redactIdx = lines.indexWhere(_.contains("regexp_replace"))
    assert(redactIdx >= 0 && redactIdx < fanIdx,
      s"redaction projection must run above the fan-out exchange:\n$p")
    val hashAggs = lines.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, "expected partial + final HashAggregate")
    assert(!p.contains("Join"), "redaction must not join")
  }

  test("q171: scale table broadcasts; corpus embeddings never shuffle before the label rollup") {
    val p = plan(graft.queries.PqQueries.q171(spark, Sf))
    assert(p.contains("BroadcastHashJoin"),
      s"64-row scale table must broadcast, plan:\n$p")
    // exchanges: the 64-group stats aggregate, the label rollup, and
    // the final sort — NO exchange carries the exploded corpus into
    // the join (that's what the broadcast buys)
    val lines = p.split('\n')
    assert(lines.count(_.contains("Exchange hashpartitioning")) == 2, p)
    assert(!p.contains("SortMergeJoin"), "encode join must not sort-merge")
  }

  test("q173: encode is map-only — no join, one rollup exchange, sign matrix is a literal") {
    val p = plan(graft.queries.PqQueries.q173(spark, Sf))
    assert(!p.contains("Join"), s"projection must not join, plan:\n$p")
    val lines = p.split('\n')
    assert(lines.count(_.contains("Exchange hashpartitioning")) == 1, p)
    // the 16x64 sign matrix rides the plan as a folded array literal,
    // not a scan or broadcast
    assert(lines.count(_.contains("Scan parquet")) == 1, p)
    assert(!p.contains("BroadcastExchange"), p)
  }

  test("q170: one corpus exchange; windows run on the (source, bin) frame") {
    val p = plan(graft.queries.CurationOps.q170(spark, Sf))
    val lines = p.split('\n')
    // corpus leaves the scan exactly once: the (source, bin) partial+
    // final aggregate. The window + second aggregate run on the tiny
    // bin frame, repartitioned by source — also hash exchanges, but
    // carrying O(sources x 16) rows, never documents
    assert(lines.count(_.contains("Scan parquet")) == 1, p)
    val aggExchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(aggExchangeIdx >= 0, p)
    assert(!p.contains("Join"), "drift audit must not join")
    assert(lines.count(_.contains("Window")) >= 1, p)
  }

  /** Queries whose plan legitimately contains a
    * BroadcastNestedLoopJoin: the loop side is a BROADCAST of a
    * bounded O(k) frame (ANN probe sets, the 3-row quantile literal),
    * so each corpus partition loops over a handful of broadcast rows —
    * map-side work, corpus never shuffles or replicates. Any query NOT
    * on this list that plans a BNLJ fails the sweep.
    */
  private val BoundedBroadcastLoop = Set(
    "q36_ann_bruteforce",     // ProbeN probe vectors × corpus
    "q59_ann_ivf",            // probe × broadcast centroids
    "q65_countmin_freq",      // heavy-hitter candidate literal
    "q70_ann_ivf_kmeans",     // probe × trained codebook
    "q73_histogram_quantiles", // 3-row quantile literal
    "q165_exact_quantiles",   // same 3-row quantile literal (pass 1)
    "q85_ivfpq_search",       // probe × ADC tables
    "q103_semantic_dedup",    // cell assignment × trained codebook
    "q105_boilerplate_ngrams", // 1-row corpus count × df frame
    "q111_ann_recall",        // composes q36/q59 → inherits their probe loops
    "q114_boilerplate_scrub", // 1-row top-K boilerplate array × corpus
    "q122_bm25_topk",         // 1-row (n_docs, sum_dl) scalar frame × tf index
    "q123_lm_quality",        // 1-row vocab-size and corpus-mean frames
    "q124_semantic_decontamination", // eval-suite broadcast × corpus (q36 shape)
    "q125_decontamination_ann", // cell assignment × broadcast codebook (q59 shape)
    "q128_priority_sample",   // 1-row tau threshold × K sampled rows
    "q138_salted_join",       // 5-row weight dim × 16-row salt range (dim build)
    "q139_triangle_count",    // three 1-row census frames joined for the summary
    "q153_kcore",             // per-round 1-row (n_removed × n_edges) stat frames
    "q163_hybrid_rrf",        // probe vectors × corpus (q36 shape) + 1-row scalar frame
    "q180_hll_overlap",       // sources × sources register-row pairs (tens × tens)
    "q181_profile_quantiles", // <=4x514-row counter frame × 3-row quantile literal (q73's shape)
    "q182_ann_partition_pruned", // probe × broadcast trained codebook (q70's shape); corpus side is the pruned equi-join
    "q186_analyze_incremental", // merged counter frame × 3-row quantile literal (q73/q181's shape)
    "q187_pq_store_search", // probe × broadcast trained codebook + ADC tables (q85's shape); store side is the pruned equi-join
    "q190_ann_store_incremental", // q182's probe shape over the maintained store
    "q191_pq_store_incremental", // q187's probe shape over the maintained store
    "q192_bm25_incremental",  // q122's 1-row scalar frame × the maintained tf index
    "q193_week_sketch_rollup") // two 1-row frames (week rollup × exact recount)

  test("q179: HLL profile plans no Expand and no distinct shuffle (q145's promised 100TB shape)") {
    // q145's exact NDV needs a per-(col, value) exchange; the HLL
    // variant must profile in ONE (col)-keyed aggregate with constant
    // state — no Expand node, a single hash exchange (the final
    // orderBy range exchange and the 4-literal right-join broadcast
    // are counted separately)
    val p = plan(graft.queries.SketchQueries.q179(spark, Sf))
    assert(!p.contains("Expand"), s"HLL profile must not plan an Expand:\n$p")
    val hashExchanges = p.split('\n')
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1,
      s"expected ONE keyed exchange, got $hashExchanges:\n$p")
  }

  test("q166: probe generate stays inside whole-stage codegen (r10 Janino 64KB fallback)") {
    // round 10 exploded 45 per-struct substr expressions in one
    // array(...) — the generated consume() blew Janino's 64 KB method
    // limit and the stage silently ran interpreted. The literal
    // offsets-table rewrite must (a) plan every Generate inside a
    // codegen region and (b) actually compile: fallback is disabled
    // for the execution so a Janino failure fails the test instead of
    // degrading.
    val aqe = "spark.sql.adaptive.enabled"
    val fb = "spark.sql.codegen.fallback"
    val prevA = spark.conf.get(aqe)
    spark.conf.set(aqe, "false")
    try {
      val df = Dedup.q166(spark, Sf)
      val p = plan(df)
      val genLines = p.split('\n').filter(_.contains("Generate explode"))
      assert(genLines.length >= 2, s"expected seg + probe generates:\n$p")
      genLines.foreach(l => assert(l.contains("*("),
        s"generate outside whole-stage codegen: $l"))
      spark.conf.set(fb, "false")
      try assert(df.collect().nonEmpty)
      finally spark.conf.unset(fb)
    } finally spark.conf.set(aqe, prevA)
  }

  test("inventory sweep: no cartesian; nested-loop only on bounded broadcast sides") {
    // every declared query's physical plan — a shuffled cartesian that
    // sneaks into ANY of them is a 100 TB scale-killer, so the whole
    // inventory is gated, not just the joins we remembered to check
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val p = plan(q(spark, Sf))
        if (p.contains("CartesianProduct")) Some(s"$name: CartesianProduct")
        else if (p.contains("BroadcastNestedLoopJoin") &&
          !BoundedBroadcastLoop(name)) Some(s"$name: BroadcastNestedLoopJoin")
        else None
    }
    assert(offenders.isEmpty,
      s"nested-loop/cartesian plans in: ${offenders.mkString(", ")}")
  }
}
