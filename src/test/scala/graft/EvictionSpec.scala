package graft

import org.apache.spark.scheduler.SparkListenerApplicationEnd
import graft.queries.{Bucketed, Dedup}

/** Session-lifecycle cache eviction: the listener GraftSession
  * attaches must drop the session's checkpointed LSH base frame and
  * its layout BOOKKEEPING — while the bucketed layout FILES, a shared
  * warehouse artifact, must survive the session (cross-session reuse
  * is the bucketing economics; BucketingSpec covers the re-register
  * path). The listener is fired directly (stopping the suite-shared
  * SparkContext would tear down every other suite); GraftSession.local
  * wires this exact listener to the real application-end event.
  */
class EvictionSpec extends SparkTestBase {

  // a dir no other suite materializes against, so eviction here can't
  // race another suite's cached state
  private val dir = "/root/testdata/sf0.01"

  test("session stop evicts the LSH base frame; layout files survive") {
    // populate both caches
    Dedup.q34(spark, dir).count()
    assert(Dedup.lshBaseCached(spark, dir), "q34 must populate the base cache")
    Bucketed.ensureBucketed(spark, dir)
    val layouts = Bucketed.layoutsTracked(spark)
    assert(layouts.nonEmpty, "bucketed layout paths must be tracked")
    layouts.foreach(p => assert(new java.io.File(p).exists(), s"missing layout $p"))

    // fire the same listener GraftSession attaches for this session
    new GraftEvictionListener(CacheRegistry.sessionKey(spark))
      .onApplicationEnd(SparkListenerApplicationEnd(0L))

    assert(!Dedup.lshBaseCached(spark, dir), "base frame must be evicted")
    assert(Bucketed.layoutsTracked(spark).isEmpty, "layout tracking must be cleared")
    layouts.foreach(p => assert(new java.io.File(p).exists(),
      s"layout files must OUTLIVE the session (warehouse artifact): $p"))

    // the session object itself is still alive here (the spec fired the
    // listener without a real stop) — caches must simply repopulate
    assert(Dedup.q34(spark, dir).count() > 0)
    assert(Bucketed.q57(spark, dir).count() > 0)
  }
}
