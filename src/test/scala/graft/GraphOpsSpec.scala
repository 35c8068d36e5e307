package graft

import graft.queries.GraphOps

/** Fixed-point PageRank invariants the value-hash oracle can't state. */
class GraphOpsSpec extends SparkTestBase {

  test("q112 scores: teleport floor holds, mass bounded, bit-deterministic re-run") {
    val r1 = GraphOps.q112(spark, Sf).collect()
    assert(r1.nonEmpty)
    val n = r1.length.toLong
    val floor = (GraphOps.PrScale * 15L / 100L) / n
    r1.foreach(r => assert(r.getAs[Long]("score") >= floor,
      "every node keeps at least the teleport mass"))
    // truncating DIVs only ever LOSE mass vs the exact distribution
    assert(r1.map(_.getAs[Long]("score")).sum <= GraphOps.PrScale + n,
      "total mass must not exceed the scale (plus per-node rounding)")
    val r2 = GraphOps.q112(spark, Sf).collect()
    assert(r1.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      r2.map(r => (r.getString(0), r.getLong(1))).toSeq,
      "integer fixed-point iteration must be bit-identical across runs")
  }
}
