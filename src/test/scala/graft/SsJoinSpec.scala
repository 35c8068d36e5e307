package graft

import org.apache.spark.sql.functions._
import graft.functions.TextKernels
import graft.queries.Dedup
import graft.sources.Tables

/** q121 exact set-similarity join: the prefix filter must be a pure
  * optimization — same pairs as the O(n²) definition — and the plan
  * must stay equi-join-shaped (the entire point of the rewrite).
  */
class SsJoinSpec extends SparkTestBase {

  test("q121 equals the brute-force Jaccard-threshold definition") {
    val got = Dedup.q121(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val base = Tables.documents(spark, Sf)
      .select(col("doc_id"), Dedup.ssShingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
    val x = base.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val y = base.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val want = x.join(y, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) -
            size(array_intersect(col("sh_a"), col("sh_b"))))).as("j"))
      .where(col("j") >= Dedup.SsTau)
      .select(col("id_a"), col("id_b"),
        graft.functions.TextFns.rnd(col("j"), 4).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(want.nonEmpty, "threshold yields no pairs — test corpus drifted")
    assert(got == want,
      s"prefix filter changed the result: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("q121 finds every pair the LSH path scores above the threshold") {
    // LSH (q61's edge set) can only MISS pairs; exact ssjoin cannot —
    // the containment direction is the operator's contract
    val exact = Dedup.q121(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.lshScoredPairsUncached(spark, Sf)
      .where(col("jaccard") >= Dedup.SsTau)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact),
      s"exact join missed LSH-found pairs: ${(lsh -- exact).take(5)}")
  }

  test("q121 plans as equi-joins; candidate count stays far below all-pairs") {
    val df = Dedup.q121(spark, Sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"ssjoin degraded to nested loop:\n$p")
    // pruning evidence: prefix-token candidates (pre-verify) vs n^2/2
    val nDocs = Tables.documents(spark, Sf).count()
    val verified = df.count()
    assert(verified < nDocs * (nDocs - 1) / 20,
      "suspiciously many pairs — prefix filter likely not pruning")
  }
}
