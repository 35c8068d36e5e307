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

  def queries: Map[String, Q] = Map(
    "q42_stream_tumbling" -> (q42 _),
    "q43_stream_sessions" -> (q43 _))

  def oracles: Map[String, String] = Map(
    "q42_stream_tumbling" -> EventsOps.q40Sql,
    "q43_stream_sessions" -> EventsOps.q39Sql)
}
