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

  test("q153 k-core peel == in-memory recount; fixed point inside the round budget") {
    // independent peel over the collected edge set
    var edges = GraphOps.prunedEdges(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (1 to GraphOps.CoreRounds).map { _ =>
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val weak = deg.filter(_._2 < GraphOps.CoreK).keySet
      edges = edges.filter(e => !weak(e._1) && !weak(e._2))
      (weak.size.toLong, edges.size.toLong)
    }
    val rows = GraphOps.q153(spark, Sf).collect()
    assert(rows.length == GraphOps.CoreRounds)
    rows.zip(expect).foreach { case (r, (nRem, nEdges)) =>
      assert(r.getAs[Long]("n_removed") == nRem)
      assert(r.getAs[Long]("n_edges_remaining") == nEdges)
    }
    // the peel must CONVERGE inside the unrolled budget — the final
    // round removing anything would mean the trajectory is truncated
    assert(rows.last.getAs[Long]("n_removed") == 0L,
      "fixed point not reached within CoreRounds")
    // every survivor really has core degree >= K
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(deg.values.forall(_ >= GraphOps.CoreK),
      "a surviving node has degree below K")
  }
}
