package graft

import org.apache.spark.sql.streaming.OutputMode
import graft.queries.{EventsOps, StreamingQueries}
import graft.streaming.EventStreams

/** Streaming twins must equal their batch counterparts row-for-row. */
class StreamingSpec extends SparkTestBase {

  test("stream tumbling window == batch q40") {
    val stream = StreamingQueries.q42(spark, Sf).collect().toSet
    val batch = EventsOps.q40(spark, Sf).collect().toSet
    assert(stream.nonEmpty && stream == batch)
  }

  test("flatMapGroupsWithState sessionization == batch q39") {
    val stream = StreamingQueries.q43(spark, Sf).collect().toSet
    val batch = EventsOps.q39(spark, Sf).collect().toSet
    assert(stream.nonEmpty && stream == batch)
  }

  test("watermark column is set on the tumbling stream") {
    val df = EventStreams.tumblingHourly(EventStreams.readEvents(spark, Sf))
    assert(df.isStreaming)
  }

  test("continuous sessionize: state rows bounded by users, not events") {
    val (out, progress) = EventStreams.runToMemoryTracked(
      EventStreams.sessionize(EventStreams.readEvents(spark, Sf),
        boundedBacklog = false).toDF(),
      "sessions_state_bound", OutputMode.Append())
    val nUsers = graft.sources.Tables.events(spark, Sf)
      .select("user_id").distinct().count()
    val nEvents = graft.sources.Tables.events(spark, Sf).count()
    val stateRows = progress.flatMap(_.stateOperators.toSeq.map(_.numRowsTotal))
    // One OpenSession (4 longs) per user with an open session — never
    // one row per event. The payload being O(1) is structural (the
    // state type is a fixed-width case class).
    assert(stateRows.nonEmpty && stateRows.max <= nUsers)
    assert(stateRows.max < nEvents / 10)
    // sessions emitted in continuous mode (closed by gap or by the
    // final watermark advance) are exactly a subset of the batch result
    val batch = EventsOps.q39(spark, Sf).collect().toSet
    val streamed = out
      .orderBy("user_id", "session_idx")
      .collect().toSet
    assert(streamed.nonEmpty && streamed.subsetOf(batch))
  }
}
