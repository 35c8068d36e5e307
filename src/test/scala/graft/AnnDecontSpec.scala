package graft

import org.apache.spark.sql.functions._
import graft.queries.PipelineOps

/** q125 (IVF-pruned semantic decontamination) versus q124 (exact
  * broadcast scan): the pruning is one-sided by construction —
  * candidates are a subset of all (train, eval) pairs, so a
  * candidate max-cosine can only under-state the exact one. That
  * gives two machine-checkable properties: every q125 flag is a q124
  * flag, and per flagged vector the q125 score never exceeds q124's.
  * The spec also quantifies the miss side (recall), the way q111
  * quantifies the ANN search paths.
  */
class AnnDecontSpec extends SparkTestBase {

  private def flags(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("max_cosine")).toMap

  test("q125 flags are contained in q124's, with never-higher scores") {
    val exact = PipelineOps.q124(spark, Sf)
    val ann = PipelineOps.q125(spark, Sf)
    val exactRows = flags(exact)
    val annRows = flags(ann)
    // the containment argument compares FLAG SETS; the display
    // limit(40) must not be the thing truncating either side here
    assert(exactRows.size < 40, "sf too large: q124 limit binds, containment unprovable")
    assert(annRows.size < 40, "sf too large: q125 limit binds, containment unprovable")
    val missingFromExact = annRows.keySet -- exactRows.keySet
    assert(missingFromExact.isEmpty,
      s"q125 flagged vectors q124 did not: $missingFromExact")
    annRows.foreach { case (id, annScore) =>
      assert(annScore <= exactRows(id) + 1e-9,
        s"vec $id: candidate max $annScore exceeds exact max ${exactRows(id)}")
    }
    // recall: the fraction of exact flags the pruned variant kept.
    // nprobe=2 of 16 cells scans ~1/8 of the corpus per eval vector;
    // the bar here is a floor, not a target — raise nprobe for more.
    val recall = (annRows.keySet & exactRows.keySet).size.toDouble /
      math.max(exactRows.size, 1)
    info(f"q125 recall vs exact flags: $recall%.2f (${annRows.size}/${exactRows.size})")
    assert(exactRows.isEmpty || recall > 0.0, "pruned variant found none of the exact flags")
  }
}
