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
      // (GraphX/ALS do the same). The checkpoint is LAZY: the
      // changed-label count below is what materializes (and caches)
      // each round's frame, so a round costs ONE job, not an eager
      // checkpoint job plus a convergence job — at small edge counts
      // the loop is pure per-job latency, so halving the job count
      // halves the wall time. (Safe because count() computes every
      // partition; a limit-style first action would checkpoint only
      // some.)
      var labels = both.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl"))
        .localCheckpoint(true)
      var iter = 0
      var converged = nEdges == 0L // no edges → every node labels itself
      while (!converged && iter < maxIters) {
        val neighborMin = both.join(labels, col("dst") === col("id"))
          .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
        val propagated = labels.join(neighborMin, col("id") === col("src"), "left")
          .select(col("id"), col("lbl").as("prev"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        // pointer jumping: follow the label's label to collapse chains
        val next = propagated.as("p")
          .join(propagated.select(col("id").as("lid"), col("lbl").as("llbl")).as("q"),
            col("p.lbl") === col("q.lid"), "left")
          .select(col("p.id").as("id"), col("p.prev").as("prev"),
            least(col("p.lbl"), coalesce(col("llbl"), col("p.lbl"))).as("lbl"))
          .localCheckpoint(false)
        // min-label propagation only lowers labels, so "no label moved
        // this round" IS the fixpoint — counted directly, no separate
        // checksum pass
        val nChanged = next.where(col("lbl") =!= col("prev")).count()
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          println(s"[cc] iter=$iter changed=$nChanged")
        // nChanged materialized `next`, so the PREVIOUS round's
        // checkpoint is dead — free its pinned RDD deterministically
        // (Dataset.unpersist is a CacheManager no-op on checkpoints;
        // see PlanBridge.checkpointRdd). The loop then pins O(1)
        // rounds of storage instead of O(iterations).
        val stale = labels
        labels = next.select(col("id"), col("lbl"))
        org.apache.spark.sql.graftbridge.PlanBridge.checkpointRdd(stale)
          .foreach(_.unpersist(blocking = false))
        converged = nChanged == 0L
        iter += 1
      }
      both.unpersist()
      labels.select(col("id"), col("lbl").as("cluster_id"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  /** Alternating large-star/small-star connected components (the
    * two-operation algorithm of Kiveris et al., "Connected Components
    * in MapReduce and Beyond", SOCC'14 — re-derived here on
    * DataFrames). Each round rewrites the EDGE SET rather than a
    * label table:
    *
    *   - large-star: every node u links each strictly-larger
    *     neighbor to m = min(N(u) ∪ {u});
    *   - small-star: every node u links its smaller neighbors and
    *     itself to m = min(N⁻(u) ∪ {u}).
    *
    * Both operations preserve connectivity and strictly shrink a
    * potential function until the edge set is a star forest whose
    * centers are the component minima. Convergence is provably
    * O(log² n) rounds and O(log n) in practice — including on the
    * CHAIN graph that makes plain min-label propagation take O(n)
    * rounds without pointer jumping (CCStarSpec pins ≤ ~2·log₂ n
    * rounds on a 1024-chain).
    *
    * Scale: every step is a keyed self-aggregate + keyed join on the
    * edge frame (never all-pairs); the frame's size is bounded by the
    * original edge count; localCheckpoint truncates the per-round
    * lineage exactly as [[run]] does. Use this variant when the
    * duplicate graph may contain long paths (transitive near-dup
    * chains); [[run]]'s label propagation is marginally cheaper on
    * the shallow clique-like graphs LSH thresholds produce.
    */
  def runStarWithRounds(edges: DataFrame, maxIters: Int = 50): (DataFrame, Int) = {
    // evaluated once, inside the final labels query — an upfront
    // eager checkpoint would spend a whole job on a single-use frame
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct()

    def canon(df: DataFrame): DataFrame =
      df.select(least(col("src"), col("dst")).as("src"),
          greatest(col("src"), col("dst")).as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct()

    def bidir(df: DataFrame): DataFrame =
      df.union(df.select(col("dst").as("src"), col("src").as("dst")))

    // large-star: m(u) = min(N(u) ∪ {u}); emit (m, v) for v ∈ N(u), v > u
    def largeStar(cur: DataFrame): DataFrame = {
      val nb = bidir(cur)
      val m = nb.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src").as("u"), least(col("mn"), col("src")).as("m"))
      canon(nb.join(m, col("src") === col("u"))
        .where(col("dst") > col("src"))
        .select(col("m").as("src"), col("dst").as("dst")))
    }

    // small-star: m(u) = min(N⁻(u) ∪ {u}); emit (m, v) for
    // v ∈ N⁻(u) ∪ {u}
    def smallStar(cur: DataFrame): DataFrame = {
      val nb = bidir(cur)
      val sm = nb.where(col("dst") < col("src"))
      val m = sm.groupBy(col("src")).agg(min(col("dst")).as("m"))
      canon(
        sm.join(m, "src").select(col("m").as("src"), col("dst").as("dst"))
          .union(m.select(col("m").as("src"), col("src").as("dst"))))
    }

    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)).as("n"),
        coalesce(sum(hash(col("src"), col("dst")).cast("long")), lit(0L)).as("h")).head()
      (r.getAs[Long]("n"), r.getAs[Long]("h"))
    }

    // lazy checkpoints: each round's checksum() is the action that
    // materializes (and caches) the round's edge frame — one job per
    // round instead of an eager-checkpoint job plus a checksum job
    var e = canon(edges).localCheckpoint(false)
    var cs = checksum(e)
    var rounds = 0
    var converged = cs._1 == 0L // empty edge set is already a star forest
    while (!converged && rounds < maxIters) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val ncs = checksum(next) // materializes next's checkpoint
      // the previous round's checkpoint is now dead — free its pinned
      // RDD (the bpeTrain discipline); only the FINAL round's
      // checkpoint survives, as the returned labels frame reads it
      val stale = e
      e = next
      org.apache.spark.sql.graftbridge.PlanBridge.checkpointRdd(stale)
        .foreach(_.unpersist(blocking = false))
      rounds += 1
      converged = ncs == cs
      cs = ncs
    }
    // star forest: (src = component min, dst = member); centers and
    // isolated nodes label themselves
    val labels = nodes
      .join(e.groupBy(col("dst")).agg(min(col("src")).as("lbl")),
        col("id") === col("dst"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("cluster_id"))
    (labels, rounds)
  }

  /** [[runStarWithRounds]] without the round count. */
  def runStar(edges: DataFrame, maxIters: Int = 50): DataFrame =
    runStarWithRounds(edges, maxIters)._1
}
