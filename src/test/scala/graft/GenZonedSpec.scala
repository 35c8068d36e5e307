package graft

import org.apache.spark.sql.functions._
import graft.io.{GenLog, GenZoned}
import graft.queries.Layout
import graft.sources.Tables

/** The quality-triggered re-layout loop (io/GenZoned.scala): wide
  * append waves degrade the persisted clustering metric, the bound
  * fires the GenLog.recluster rewrite, skipping economics recover —
  * and the windowed answer is identical at EVERY stage. All on a
  * throwaway location; q214's warehouse artifact is never touched.
  */
class GenZonedSpec extends SparkTestBase {

  private val Track = "l_shipdate"

  private def win = (Layout.micros(Layout.ShipLo), Layout.micros(Layout.ShipHi))

  /** The q194-shaped window answer off the PRUNED read. */
  private def answer(loc: String): Set[(String, Long)] = {
    val (lo, hi) = win
    GenZoned.prunedRead(spark, loc, lo, hi)
      .where(col(Track).between(lit(Layout.ShipLo).cast("timestamp"),
        lit(Layout.ShipHi).cast("timestamp")))
      .groupBy(col("l_returnflag")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  /** The same answer off the FLAT latest-generation read — what the
    * pruned path must always equal, at every maintenance stage.
    */
  private def expected(loc: String): Set[(String, Long)] =
    GenLog.readLatest(spark, loc)
      .where(col(Track).between(lit(Layout.ShipLo).cast("timestamp"),
        lit(Layout.ShipHi).cast("timestamp")))
      .groupBy(col("l_returnflag")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("wide waves degrade the metric, the bound triggers re-layout through the log, skipping recovers; the answer never moves") {
    val loc = java.nio.file.Files.createTempDirectory("genzoned").toString + "/t"
    val (lo, hi) = win
    // base: month-clustered — tight envelopes, sharp pruning
    GenLog.appendBatch(spark, loc, "base",
      Layout.adaptiveSlice(spark, Sf, "l_orderkey % 8 != 0")
        .withColumn(GenZoned.PartCol, Layout.monthKey), GenZoned.PartCol)
    assert(GenZoned.absorbStats(spark, loc, Track) > 0)
    val q0 = GenZoned.quality(spark, loc)
    val frac0 = GenZoned.matchedFraction(spark, loc, lo, hi)
    assert(q0 < GenZoned.WidthBound, s"month clustering must score tight, got $q0")
    assert(frac0 < 0.25, s"the 3-month window must prune sharply, got $frac0")
    assert(answer(loc) == expected(loc))

    // wave 1 (1/16 of rows, full-domain envelope): degraded but
    // TOLERATED — the metric moves, the bound does not fire
    GenLog.appendBatch(spark, loc, "wave1",
      Layout.adaptiveSlice(spark, Sf, "l_orderkey % 16 = 0")
        .withColumn(GenZoned.PartCol, lit("wave1")), GenZoned.PartCol)
    GenZoned.absorbStats(spark, loc, Track)
    assert(!GenZoned.maybeRecluster(spark, loc, "rl1", Layout.monthKey, Track),
      "one tolerable wave must not trigger the rewrite")
    val q1 = GenZoned.quality(spark, loc)
    assert(q1 > q0 && q1 <= GenZoned.WidthBound,
      s"wave 1 must degrade the metric within the bound, got $q0 -> $q1")
    assert(GenZoned.matchedFraction(spark, loc, lo, hi) > frac0,
      "the full-domain wave file must join every window's candidates")
    assert(answer(loc) == expected(loc), "degraded layout must still answer exactly")

    // wave 2: the metric crosses the bound — the rewrite fires
    GenLog.appendBatch(spark, loc, "wave2",
      Layout.adaptiveSlice(spark, Sf, "l_orderkey % 16 = 8")
        .withColumn(GenZoned.PartCol, lit("wave2")), GenZoned.PartCol)
    GenZoned.absorbStats(spark, loc, Track)
    assert(GenZoned.quality(spark, loc) > GenZoned.WidthBound,
      "two full-domain waves must push the metric past the bound")
    assert(GenZoned.maybeRecluster(spark, loc, "rl2", Layout.monthKey, Track),
      "the crossed bound must trigger the re-layout")
    val q2 = GenZoned.quality(spark, loc)
    val frac2 = GenZoned.matchedFraction(spark, loc, lo, hi)
    assert(q2 <= q0 * 1.05,
      s"re-clustering must restore the tight metric, got $q2 vs base $q0")
    assert(frac2 < 0.25, s"skipping economics must recover, got $frac2")
    assert(answer(loc) == expected(loc), "the re-layout must not move the answer")
    // the rewrite is idempotent through the gen-id guard, and a
    // healthy table declines further rewrites
    assert(!GenZoned.maybeRecluster(spark, loc, "rl3", Layout.monthKey, Track))

    // the full corpus is served, and the pre-relayout generations
    // keep their own (wave-file) layout for time travel
    assert(GenLog.readLatest(spark, loc).count() ==
      Tables.lineitem(spark, Sf).count())
    val gens = GenLog.generations(spark, loc).toMap
    assert(gens("wave2").exists(_.contains(s"/${GenZoned.PartCol}=wave2/")),
      "history must keep the wave layout")
    assert(gens("wave2").forall(f => new java.io.File(f).exists()))
    assert(gens("rl2").forall(f =>
      !f.contains(s"/${GenZoned.PartCol}=wave")),
      "the re-clustered generation must hold only clustered files")
  }

  test("partial re-layout rewrites only the decayed files; the clustered base survives byte-identically") {
    val loc = java.nio.file.Files.createTempDirectory("genzonedp").toString + "/t"
    val (lo, hi) = win
    GenLog.appendBatch(spark, loc, "base",
      Layout.adaptiveSlice(spark, Sf, "l_orderkey % 8 != 0")
        .withColumn(GenZoned.PartCol, Layout.monthKey), GenZoned.PartCol)
    GenZoned.absorbStats(spark, loc, Track)
    val baseFiles = GenLog.generations(spark, loc).toMap.apply("base").toSet
    Seq(1 -> "l_orderkey % 16 = 0", 2 -> "l_orderkey % 16 = 8").foreach {
      case (w, f) =>
        GenLog.appendBatch(spark, loc, s"wave$w",
          Layout.adaptiveSlice(spark, Sf, f)
            .withColumn(GenZoned.PartCol, lit(s"wave$w")), GenZoned.PartCol)
        GenZoned.absorbStats(spark, loc, Track)
    }
    assert(GenZoned.quality(spark, loc) > GenZoned.WidthBound)
    assert(GenZoned.maybeReclusterPartial(spark, loc, "prl", Layout.monthKey, Track))
    val after = GenLog.generations(spark, loc).toMap.apply("prl").toSet
    // the month-clustered base files are the SAME live paths — the
    // partial rewrite never touched them (q214's full recluster
    // replaces everything; this is the liquid-clustering economics)
    assert(baseFiles.subsetOf(after),
      "the clustered base must survive the partial re-layout byte-identically")
    // the wave files left the live set (rewritten) but stay on disk
    val waveFiles = after.filter(_.contains(s"/${GenZoned.PartCol}=wave"))
    assert(waveFiles.isEmpty, "no wave-tagged file may stay live after the rewrite")
    // quality and skipping recovered; the answer never moved
    assert(GenZoned.quality(spark, loc) <= GenZoned.WidthBound)
    assert(GenZoned.matchedFraction(spark, loc, lo, hi) < 0.25)
    assert(answer(loc) == expected(loc))
    assert(GenLog.readLatest(spark, loc).count() ==
      Tables.lineitem(spark, Sf).count())
  }

  test("2-D: wide waves degrade the worst-dimension metric, the bound fires a z-order re-layout, BOTH envelopes recover; the box answer never moves") {
    import graft.io.GenZoned2
    val loc = java.nio.file.Files.createTempDirectory("genzoned2").toString + "/t"
    def box(): (Long, Long, Long, Long) = {
      val (pm, sm) = GenZoned2.liveMaxes(spark, loc)
      Layout.zBox(pm, sm)
    }
    def answer2(): Set[(String, Long)] = {
      val (pLo, pHi, sLo, sHi) = box()
      GenZoned2.prunedRead(spark, loc, pLo, pHi, sLo, sHi)
        .where(col("l_partkey").between(lit(pLo), lit(pHi)) &&
          col("l_suppkey").between(lit(sLo), lit(sHi)))
        .groupBy(col("l_returnflag")).count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    def expected2(): Set[(String, Long)] = {
      val (pLo, pHi, sLo, sHi) = box()
      GenLog.readLatest(spark, loc)
        .where(col("l_partkey").between(lit(pLo), lit(pHi)) &&
          col("l_suppkey").between(lit(sLo), lit(sHi)))
        .groupBy(col("l_returnflag")).count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    // base: aligned Morton blocks — tight in BOTH dimensions (the
    // block geometry floors the metric near 1/8 per dim)
    val base = Layout.zoned2Slice(spark, Sf, "l_orderkey % 8 != 0")
    val m = base.agg(max(col("l_partkey")), max(col("l_suppkey"))).head()
    GenLog.appendBatch(spark, loc, "base",
      base.withColumn(GenZoned2.PartCol,
        GenZoned2.blockKey(col("l_partkey"), col("l_suppkey"),
          m.getLong(0), m.getLong(1))), GenZoned2.PartCol)
    assert(GenZoned2.absorbStats(spark, loc, "l_partkey", "l_suppkey") > 0)
    val q0 = GenZoned2.quality(spark, loc)
    assert(q0 < GenZoned2.WidthBound2,
      s"z-blocked base must score under the bound, got $q0")
    val (pLo, pHi, sLo, sHi) = box()
    val frac0 = GenZoned2.matchedFraction(spark, loc, pLo, pHi, sLo, sHi)
    assert(frac0 < 0.3, s"the 2-D box must prune the blocked base, got $frac0")
    assert(answer2() == expected2())

    // wave 1: full-domain in BOTH keys — degraded but tolerated
    GenLog.appendBatch(spark, loc, "wave1",
      Layout.zoned2Slice(spark, Sf, "l_orderkey % 16 = 0")
        .withColumn(GenZoned2.PartCol, lit("wave1")), GenZoned2.PartCol)
    GenZoned2.absorbStats(spark, loc, "l_partkey", "l_suppkey")
    assert(!GenZoned2.maybeRecluster(spark, loc, "zrl1", "l_partkey", "l_suppkey"),
      "one tolerable wave must not trigger the rewrite")
    val q1 = GenZoned2.quality(spark, loc)
    assert(q1 > q0 && q1 <= GenZoned2.WidthBound2,
      s"wave 1 must degrade within the bound, got $q0 -> $q1")
    assert(answer2() == expected2(), "degraded layout must answer exactly")

    // wave 2: the metric crosses — the Z-ORDER rewrite fires and
    // tightens BOTH dimensions at once
    GenLog.appendBatch(spark, loc, "wave2",
      Layout.zoned2Slice(spark, Sf, "l_orderkey % 16 = 8")
        .withColumn(GenZoned2.PartCol, lit("wave2")), GenZoned2.PartCol)
    GenZoned2.absorbStats(spark, loc, "l_partkey", "l_suppkey")
    assert(GenZoned2.quality(spark, loc) > GenZoned2.WidthBound2,
      "two full-domain waves must cross the bound")
    assert(GenZoned2.maybeRecluster(spark, loc, "zrl2", "l_partkey", "l_suppkey"),
      "the crossed bound must trigger the z-order re-layout")
    val q2 = GenZoned2.quality(spark, loc)
    assert(q2 <= q0 * 1.1,
      s"the z-order rewrite must restore the 2-D metric, got $q2 vs base $q0")
    assert(GenZoned2.matchedFraction(spark, loc, pLo, pHi, sLo, sHi) < 0.3,
      "2-D skipping economics must recover")
    assert(answer2() == expected2(), "the re-layout must not move the answer")
    assert(!GenZoned2.maybeRecluster(spark, loc, "zrl3", "l_partkey", "l_suppkey"))
    assert(GenLog.readLatest(spark, loc).count() ==
      Tables.lineitem(spark, Sf).count())

    // the 1-D counterfactual, measured not asserted-in-prose: a
    // partkey-SORTED layout scores ~1 on the 2-D metric (tight in
    // partkey, full supplier domain per file) — exactly the decay a
    // 1-D metric cannot see
    val loc1 = java.nio.file.Files.createTempDirectory("genzoned2s").toString + "/t"
    GenLog.appendBatch(spark, loc1, "sorted",
      base.withColumn(GenZoned2.PartCol,
        format_string("b%02d", floor(col("l_partkey") * 16 /
          (m.getLong(0) + 1)))), GenZoned2.PartCol)
    GenZoned2.absorbStats(spark, loc1, "l_partkey", "l_suppkey")
    val qSorted = GenZoned2.quality(spark, loc1)
    assert(qSorted > 0.8,
      s"a single-key sort must score near 1 on the 2-D metric, got $qSorted")
  }

  test("2-D partial re-layout rewrites only the decayed files into z-blocks; the blocked base survives byte-identically") {
    import graft.io.GenZoned2
    val loc = java.nio.file.Files.createTempDirectory("genzoned2p").toString + "/t"
    val base = Layout.zoned2Slice(spark, Sf, "l_orderkey % 8 != 0")
    val m = base.agg(max(col("l_partkey")), max(col("l_suppkey"))).head()
    GenLog.appendBatch(spark, loc, "base",
      base.withColumn(GenZoned2.PartCol,
        GenZoned2.blockKey(col("l_partkey"), col("l_suppkey"),
          m.getLong(0), m.getLong(1))), GenZoned2.PartCol)
    GenZoned2.absorbStats(spark, loc, "l_partkey", "l_suppkey")
    val baseFiles = GenLog.generations(spark, loc).toMap.apply("base").toSet
    Seq(1 -> "l_orderkey % 16 = 0", 2 -> "l_orderkey % 16 = 8").foreach {
      case (w, f) =>
        GenLog.appendBatch(spark, loc, s"wave$w",
          Layout.zoned2Slice(spark, Sf, f)
            .withColumn(GenZoned2.PartCol, lit(s"wave$w")), GenZoned2.PartCol)
        GenZoned2.absorbStats(spark, loc, "l_partkey", "l_suppkey")
    }
    assert(GenZoned2.quality(spark, loc) > GenZoned2.WidthBound2)
    assert(GenZoned2.maybeReclusterPartial(spark, loc, "zprl",
      "l_partkey", "l_suppkey"))
    val after = GenLog.generations(spark, loc).toMap.apply("zprl").toSet
    assert(baseFiles.subsetOf(after),
      "the z-blocked base must survive the 2-D partial re-layout byte-identically")
    assert(!after.exists(_.contains(s"/${GenZoned2.PartCol}=wave")),
      "no wave-tagged file may stay live after the rewrite")
    assert(GenZoned2.quality(spark, loc) <= GenZoned2.WidthBound2,
      "the 2-D metric must recover")
    assert(GenLog.readLatest(spark, loc).count() ==
      Tables.lineitem(spark, Sf).count())
  }
}
