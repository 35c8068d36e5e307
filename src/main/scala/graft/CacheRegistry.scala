package graft

import scala.collection.concurrent.TrieMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-lifecycle eviction for session-scoped caches.
  *
  * Several operators keep per-(session, dir) materialisations —
  * Dedup's localCheckpoint'd LSH base frame, Bucketed's bucketed
  * table layouts. Keyed by session identity they can never be hit by
  * a *different* session, but without eviction a long-lived process
  * that starts and stops many sessions accumulates dead checkpointed
  * RDD references and orphaned warehouse directories.
  *
  * Cache owners register an eviction hook (idempotent, keyed by
  * name); [[GraftSession]] attaches a [[GraftEvictionListener]] to
  * every session it builds, which fires all hooks for that session's
  * identity when the underlying context shuts down
  * (`SparkSession.stop` stops the context, so application end IS
  * session end in every deployment shape we run).
  */
object CacheRegistry {

  private val hooks = TrieMap.empty[String, Int => Unit]

  /** Identity key used by all session-scoped caches. */
  def sessionKey(spark: SparkSession): Int = System.identityHashCode(spark)

  /** Register (or replace) a named eviction hook. The hook receives a
    * session identity and must drop only that session's entries.
    */
  def register(name: String)(evict: Int => Unit): Unit = hooks.put(name, evict)

  /** Fire every hook for one session's identity. */
  def evict(sessionIdentity: Int): Unit = hooks.values.foreach(_(sessionIdentity))
}

/** The one session-scoped DataFrame memoizer: build once per
  * (name, session, dir), localCheckpoint so every reader shares the
  * materialization instead of replaying corpus-sized lineage, and
  * evict with the session. Replaces the previously hand-rolled
  * TrieMap-per-owner copies (Dedup's LSH base + scored pairs,
  * CorpusOps' trigram base); non-DataFrame caches (Bucketed layouts,
  * KMeansCodebook state) keep their own typed maps but share
  * [[CacheRegistry]] eviction.
  */
object FrameCache {

  private val frames =
    TrieMap.empty[(String, Int, String), org.apache.spark.sql.DataFrame]

  CacheRegistry.register("framecache") { sid =>
    frames.keys.filter(_._2 == sid).foreach(frames.remove)
  }

  /** Build-or-reuse the named frame for (session, dir). The build is
    * localCheckpoint'd: eager, lineage-truncated, executor-resident.
    */
  def memoize(name: String, spark: SparkSession, dir: String)(
    build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    frames.getOrElseUpdate((name, CacheRegistry.sessionKey(spark), dir),
      build.localCheckpoint())

  /** Test/introspection hook: is the named frame cached? */
  private[graft] def cached(name: String, spark: SparkSession, dir: String): Boolean =
    frames.contains((name, CacheRegistry.sessionKey(spark), dir))
}

/** Spark listener bound to one session's identity: evicts that
  * session's cache entries when the context ends.
  */
class GraftEvictionListener(sessionIdentity: Int) extends SparkListener {
  override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit =
    CacheRegistry.evict(sessionIdentity)
}
