package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the reference's `start_spark` bootstrap
  * (/root/reference/spark/dependencies/spark.py:10-59) re-expressed for
  * Spark 4.x: UTC session time zone (oracle parity), AQE on (runtime
  * shuffle coalescing + skew-join handling at scale), shuffle
  * partitions sized to the local core count rather than the 200
  * default. On a real cluster the same builder is used with
  * `spark.sql.shuffle.partitions` sized to ~2-3x total executor cores.
  */
object GraftSession {

  def builder(appName: String, cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      // native-kernel SQL surface (graft_minhash_sig, graft_byte_stats…)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // nested-schema pruning matters for the deep CORD-19-style structs
      // (SURVEY.md §4.2) and for multimodal metadata structs.
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      // snapshot maintenance is for long-running streams; a short
      // backlog replay (2-3 micro-batches) should never pay for it
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
      .config("spark.ui.enabled", "false")

  /** Local session sized from env (driver harness passes SPARK_GRAFT_CPUS). */
  def local(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = builder(appName, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // evict this session's cached frames/layouts when the context ends
    spark.sparkContext.addSparkListener(
      new GraftEvictionListener(CacheRegistry.sessionKey(spark)))
    spark
  }
}
