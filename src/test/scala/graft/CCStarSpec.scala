package graft

import org.apache.spark.sql.DataFrame
import graft.operators.ConnectedComponents

/** Alternating large-star/small-star CC: round bound on the
  * adversarial chain graph, and output equality with the min-label
  * propagation implementation across graph shapes (two independent
  * algorithms pinning each other).
  */
class CCStarSpec extends SparkTestBase {

  private def edgesOf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("1024-node chain: one component in <= ~2*log2(n) rounds") {
    val n = 1024
    val chain = edgesOf((0L until (n - 1).toLong).map(i => (i, i + 1)))
    val (labels, rounds) = ConnectedComponents.runStarWithRounds(chain)
    val m = labelMap(labels)
    assert(m.size == n)
    assert(m.values.forall(_ == 0L), "chain must collapse to component 0")
    val bound = 2 * (math.log(n.toDouble) / math.log(2)).ceil.toInt + 3
    assert(rounds <= bound, s"took $rounds rounds, bound $bound")
  }

  test("iterative loops pin O(1) checkpoints, not O(rounds)") {
    // both CC loops free the previous round's pinned checkpoint RDD
    // once the next round is materialized (the bpeTrain discipline —
    // Dataset.unpersist is a CacheManager no-op on checkpoints).
    // After a many-round run, the persistent-RDD set may keep only
    // the FINAL round's checkpoint (the returned labels frame reads
    // it) plus the pointer-jumping loop's persisted edge frame —
    // never one entry per round. The 1024-chain takes ~2*log2(n)
    // rounds, so a per-round leak would show up as ~20 extra ids.
    val n = 1024
    val chain = edgesOf((0L until (n - 1).toLong).map(i => (i, i + 1)))
    val sc = spark.sparkContext
    Seq[DataFrame => DataFrame](
      ConnectedComponents.runStar(_),
      ConnectedComponents.run(_)).zipWithIndex.foreach { case (algo, i) =>
      val before = sc.getPersistentRDDs.keySet
      algo(chain).count()
      val leaked = sc.getPersistentRDDs.keySet -- before
      assert(leaked.size <= 2,
        s"algo $i pinned ${leaked.size} RDDs after completion " +
          s"(expected <= 2: final checkpoint + cached edges): $leaked")
    }
  }

  test("matches min-label propagation on mixed graph shapes") {
    // two cliques, a chain bridge, an isolated pair, a self-contained
    // triangle with non-contiguous ids
    val pairs =
      (for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)) ++
        (for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)) ++
        Seq((4L, 20L), (20L, 21L), (21L, 10L)) ++ // bridge joins the cliques
        Seq((30L, 31L)) ++
        Seq((40L, 52L), (52L, 47L), (47L, 40L))
    val e = edgesOf(pairs)
    val viaStar = labelMap(ConnectedComponents.runStar(e))
    val viaProp = labelMap(ConnectedComponents.run(e))
    assert(viaStar == viaProp)
    assert(viaStar(13L) == 0L, "bridged cliques must merge into component 0")
    assert(viaStar(31L) == 30L && viaStar(47L) == 40L)
  }

  test("deterministic under input edge order and direction") {
    val pairs = Seq((5L, 1L), (2L, 5L), (9L, 2L), (7L, 8L))
    val a = labelMap(ConnectedComponents.runStar(edgesOf(pairs)))
    val b = labelMap(ConnectedComponents.runStar(edgesOf(pairs.reverse.map(p => (p._2, p._1)))))
    assert(a == b)
    assert(a(9L) == 1L && a(8L) == 7L)
  }
}
