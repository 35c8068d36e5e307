package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative min-label
  * propagation with pointer jumping — the clustering step of a dedup
  * pipeline (near-dup PAIRS → duplicate GROUPS → one canonical doc
  * per group).
  *
  * Algorithm: every node starts labeled with its own id; each round
  * every node takes the min of its label and its neighbors' labels,
  * then compresses label chains by following its label's label
  * (pointer jumping — Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SOCC'14 use the same halving idea). At
  * fixpoint label(v) = min id reachable from v = component id.
  * Rounds: O(log diameter) thanks to the compression step; each round
  * is two keyed joins + one aggregate, never all-pairs work.
  *
  * Scale: the label frame is one row per node OF THE EDGE SET (the
  * near-dup subset, not the corpus), so loop shuffles are sized to
  * the edge count — adaptively, since a fixed cluster-wide partition
  * count would schedule thousands of empty tasks per round on a small
  * duplicate graph and too few on a big one. Convergence is detected
  * by an O(1)-result aggregate per round (the label sum strictly
  * decreases until fixpoint), never by collecting labels.
  */
object ConnectedComponents {

  /** `edges` must have two long columns `src`/`dst` (undirected; one
    * row per edge either direction). Returns (id, cluster_id).
    */
  def run(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    val both = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materializes the cache and sizes the loop's shuffles: ~500k
    // edges per partition, capped at the cluster's parallelism
    val tEdges0 = System.nanoTime()
    val nEdges = both.count()
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      println(f"[cc] edges=$nEdges materialize=${(System.nanoTime() - tEdges0) / 1e9}%.2f s")
    val loopParts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, nEdges / 500000L + 1L)).toString
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", loopParts)
    try {
      // localCheckpoint (not persist) between iterations: the
      // pointer-jumping step joins the label frame WITH ITSELF, so the
      // logical plan would DOUBLE per iteration — exponential
      // analysis/stringification cost by iteration ~10 even though the
      // data is tiny. Checkpointing truncates lineage to a LogicalRDD
      // leaf each round, the standard iterative-algorithm discipline
      // (GraphX/ALS do the same).
      var labels = both.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl"))
        .localCheckpoint(true)
      var checksum = labels.agg(sum("lbl")).head().getLong(0)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIters) {
        val neighborMin = both.join(labels, col("dst") === col("id"))
          .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
        val propagated = labels.join(neighborMin, col("id") === col("src"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        // pointer jumping: follow the label's label to collapse chains
        val next = propagated.as("p")
          .join(propagated.select(col("id").as("lid"), col("lbl").as("llbl")).as("q"),
            col("p.lbl") === col("q.lid"), "left")
          .select(col("p.id").as("id"),
            least(col("p.lbl"), coalesce(col("llbl"), col("p.lbl"))).as("lbl"))
          .localCheckpoint(true)
        val nextSum = next.agg(sum("lbl")).head().getLong(0)
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          println(f"[cc] iter=$iter sum=$nextSum")
        labels = next
        converged = nextSum == checksum
        checksum = nextSum
        iter += 1
      }
      both.unpersist()
      labels.select(col("id"), col("lbl").as("cluster_id"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }
}
