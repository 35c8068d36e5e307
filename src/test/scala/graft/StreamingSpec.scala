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
}
