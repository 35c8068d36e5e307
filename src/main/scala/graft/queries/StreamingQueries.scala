package graft.queries

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams

/** Structured-Streaming queries surfaced through the declared-query
  * inventory: each runs its stream over the full backlog with
  * Trigger.AvailableNow into a memory sink and returns the final
  * table. Results are deterministic and equal to their batch twins,
  * so they share the batch oracles (q40/q39 SQL).
  */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  private val runId = new AtomicLong(0)

  /** State partitions for the backlog-replay twins: each state store
    * pays a fixed per-micro-batch snapshot/commit cost, so the count
    * tracks throughput, not the session's batch-shuffle setting — 8
    * covers a single-file backlog; a production continuous run sizes
    * it to the cluster (see EventStreams.runToMemoryTracked).
    */
  private val ReplayStateParts = Some(8)

  // q42_stream_tumbling — watermark + tumbling window over the
  // events backlog; equals EventsOps.q40.
  def q42(spark: SparkSession, dir: String): DataFrame = {
    val name = s"stream_tumbling_${runId.incrementAndGet()}"
    EventStreams.runToMemory(
      EventStreams.tumblingHourly(EventStreams.readEvents(spark, dir)),
      name, OutputMode.Complete(), ReplayStateParts)
      .orderBy(col("hour_start"), col("event_type"))
  }

  // q43_stream_sessions — flatMapGroupsWithState sessionization;
  // equals EventsOps.q39.
  def q43(spark: SparkSession, dir: String): DataFrame = {
    val name = s"stream_sessions_${runId.incrementAndGet()}"
    EventStreams.runToMemory(
      EventStreams.sessionize(EventStreams.readEvents(spark, dir)).toDF(),
      name, OutputMode.Append(), ReplayStateParts)
      .orderBy(col("user_id"), col("session_idx"))
  }

  // q60_stream_dedup — watermark-bounded streaming dropDuplicates;
  // equals the batch DISTINCT below. Bounded to user_id <= 300 (the
  // q50 pattern) to keep the emitted result proportionate; the
  // filter is applied BEFORE the stateful operator, so it also prunes
  // dedup state at the source.
  def q60(spark: SparkSession, dir: String): DataFrame = {
    val name = s"stream_dedup_${runId.incrementAndGet()}"
    EventStreams.runToMemory(
      EventStreams.dedupFirstInHour(
        EventStreams.readEvents(spark, dir).filter(col("user_id") <= 300)),
      name, OutputMode.Append(), ReplayStateParts)
      .orderBy(col("user_id"), col("event_type"), col("hour_start"))
  }

  val q60Sql: String =
    """SELECT DISTINCT user_id, event_type,
      |  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start
      |FROM events WHERE user_id <= 300
      |ORDER BY user_id, event_type, hour_start""".stripMargin

  // q63_stream_interval_join — stream-stream join, both sides
  // watermarked, event-time-bounded condition; equals the batch join.
  // A stream-stream join keeps FOUR state stores per partition (two
  // maps per side), so its per-partition commit overhead is 4x a
  // dedup/agg's — the replay uses fewer, bigger state partitions.
  def q63(spark: SparkSession, dir: String): DataFrame = {
    val name = s"stream_ssjoin_${runId.incrementAndGet()}"
    EventStreams.runToMemory(
      EventStreams.purchaseClickJoin(spark, dir),
      name, OutputMode.Append(), Some(2))
      .orderBy(col("user_id"), col("purchase_id"), col("click_id"))
  }

  val q63Sql: String =
    """SELECT p.user_id AS user_id, p.event_id AS purchase_id,
      |  c.event_id AS click_id,
      |  CAST(floor((epoch_us(p.ts) - epoch_us(c.ts)) / 1000000) AS BIGINT) AS gap_s
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      | AND p.event_type = 'purchase' AND c.event_type = 'click'
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |ORDER BY user_id, purchase_id, click_id""".stripMargin

  // q72_stream_static_join — the event stream enriched by the static
  // customer dimension (broadcast, stateless join; see
  // EventStreams.enrichBySegment), then watermarked hourly counts per
  // market segment. Oracle: the equivalent batch join+group.
  def q72(spark: SparkSession, dir: String): DataFrame = {
    val name = s"stream_enrich_${runId.incrementAndGet()}"
    EventStreams.runToMemory(
      EventStreams.enrichBySegment(spark, dir),
      name, OutputMode.Complete(), ReplayStateParts)
      .orderBy(col("hour_start"), col("c_mktsegment"))
  }

  val q72Sql: String =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
      |  c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY 1, 2 ORDER BY hour_start, c_mktsegment""".stripMargin

  // q74_stream_kmv — the KMV distinct sketch as STREAMING window
  // state: per-hour distinct-user estimates with watermark-evicted,
  // size-bounded sketch state (EventStreams.hourlyDistinctUsers).
  // Oracle: the identical deterministic estimator in batch SQL.
  def q74(spark: SparkSession, dir: String): DataFrame = {
    val name = s"stream_kmv_${runId.incrementAndGet()}"
    EventStreams.runToMemory(
      EventStreams.hourlyDistinctUsers(EventStreams.readEvents(spark, dir)),
      name, OutputMode.Complete(), ReplayStateParts)
      .orderBy(col("hour_start"))
  }

  val q74Sql: String = {
    import graft.functions.{KmvSketch, TextFns}
    val h = s"${TextFns.hash60Sql("user_id::VARCHAR")} % ${TextFns.P}"
    s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
       |  COUNT(*) AS n_events,
       |  ${TextFns.rndSql(KmvSketch.kmvDistinctSql("h"), 4)} AS est_users
       |FROM (SELECT ts, $h AS h FROM events)
       |GROUP BY 1 ORDER BY hour_start""".stripMargin
  }

  // q84_stream_outer_join — the LEFT OUTER form of q63: purchases
  // with no preceding-hour click surface as NULL rows once the right
  // watermark passes their match interval
  // (EventStreams.purchaseClickLeftJoin). Oracle: the batch LEFT JOIN.
  def q84(spark: SparkSession, dir: String): DataFrame = {
    val name = s"stream_ssouter_${runId.incrementAndGet()}"
    EventStreams.runToMemory(
      EventStreams.purchaseClickLeftJoin(spark, dir),
      name, OutputMode.Append(), Some(2))
      .orderBy(col("user_id"), col("purchase_id"), col("click_id"))
  }

  val q84Sql: String =
    """SELECT p.user_id AS user_id, p.event_id AS purchase_id,
      |  c.event_id AS click_id,
      |  CAST(floor((epoch_us(p.ts) - epoch_us(c.ts)) / 1000000) AS BIGINT) AS gap_s
      |FROM (SELECT * FROM events
      |      WHERE event_type = 'purchase' AND ts < '2024-01-28') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |ORDER BY user_id, purchase_id, click_id""".stripMargin

  def queries: Map[String, Q] = Map(
    "q42_stream_tumbling" -> (q42 _),
    "q43_stream_sessions" -> (q43 _),
    "q60_stream_dedup" -> (q60 _),
    "q63_stream_interval_join" -> (q63 _),
    "q72_stream_static_join" -> (q72 _),
    "q74_stream_kmv" -> (q74 _),
    "q84_stream_outer_join" -> (q84 _))

  def oracles: Map[String, String] = Map(
    "q42_stream_tumbling" -> EventsOps.q40Sql,
    "q43_stream_sessions" -> EventsOps.q39Sql,
    "q60_stream_dedup" -> q60Sql,
    "q63_stream_interval_join" -> q63Sql,
    "q72_stream_static_join" -> q72Sql,
    "q74_stream_kmv" -> q74Sql,
    "q84_stream_outer_join" -> q84Sql)
}
