package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._
import graft.queries.EventsOps

/** Structured Streaming over the `events` table: watermarked tumbling
  * windows and stateful sessionization — the streaming capability the
  * reference lacks (batch-only, SURVEY.md §0) re-expressed on the
  * driver corpus. Each streaming query has a batch twin in EventsOps
  * whose DuckDB oracle also pins the streaming result (the specs
  * assert stream == batch).
  *
  * Scale: the file source is replaced by Kafka/queue sources in
  * production; everything downstream (watermark, window aggregation
  * state store, per-key GroupState) shards by the grouping key across
  * executors. AvailableNow processes the backlog incrementally and
  * terminates — the same code runs continuous with a processing-time
  * trigger.
  */
object EventStreams {

  /** The events parquet schema, declared explicitly — streaming file
    * sources cannot infer schemas. ts arrives as TIMESTAMP(NANOS),
    * read as long (SPARK-40819 escape hatch, same as Tables.events).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of the events file with event-time `ts`. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Watermarked 1-hour tumbling counts per event type — the
    * streaming twin of EventsOps.q40. The 2h watermark bounds state:
    * windows older than (max event time − 2h) are finalized and their
    * state evicted.
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** One user's event (micros since epoch). */
  case class UserEvent(user_id: Long, event_id: Long, us: Long)

  /** One closed session — mirrors EventsOps.q39's output row. */
  case class Session(user_id: Long, session_idx: Long, n_events: Long,
    start_us: Long, end_us: Long, duration_s: Long)

  /** Per-user session state carried across micro-batches. */
  case class SessionState(nextIdx: Long, events: Seq[UserEvent])

  /** Stateful sessionization with flatMapGroupsWithState: buffers a
    * user's events in GroupState, splits on >GapUs inactivity, emits
    * every session of the batch (state is kept so a continuation
    * batch could re-open the last session; with AvailableNow's single
    * batch all sessions close at end of input, matching q39).
    */
  def sessionize(events: DataFrame): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[UserEvent], state: GroupState[SessionState]) =>
          val prior = if (state.exists) state.get.events else Seq.empty
          val all = (prior ++ it.toSeq).sortBy(e => (e.us, e.event_id))
          var idx = if (state.exists) state.get.nextIdx else 1L
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          var cur = scala.collection.mutable.ArrayBuffer[UserEvent]()
          def close(): Unit = if (cur.nonEmpty) {
            val s = cur.head.us
            val e = cur.last.us
            out += Session(userId, idx, cur.size.toLong, s, e,
              math.floor((e - s).toDouble / 1000000).toLong)
            idx += 1
            cur = scala.collection.mutable.ArrayBuffer[UserEvent]()
          }
          all.foreach { ev =>
            if (cur.nonEmpty && ev.us - cur.last.us > EventsOps.GapUs) close()
            cur += ev
          }
          close()
          state.update(SessionState(idx, Seq.empty))
          out.iterator
      }
  }

  /** Run a streaming frame to completion over the existing backlog
    * (Trigger.AvailableNow) into an in-memory table; returns the
    * final result as a batch DataFrame.
    */
  def runToMemory(df: DataFrame, name: String,
    mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val spark = df.sparkSession
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
