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

  test("streaming span trim == batch q130's hit rows (stream-static vs warehouse index)") {
    val stream = StreamingQueries.q132(spark, Sf).collect()
    assert(stream.nonEmpty, "corpus has batch docs with duplicated spans")
    // q132 emits exactly q130's rows with >= 1 hit window (the batch
    // variant left-joins zero-hit docs in; ordering puts hits first,
    // so below the display limit the hit-prefix must match exactly)
    val batchHits = graft.queries.CurationOps.q130(spark, Sf).collect()
      .filter(_.getAs[Long]("n_hit_windows") > 0)
    assert(stream.length == batchHits.length)
    stream.zip(batchHits).foreach { case (s, b) =>
      assert(s.getAs[Long]("doc_id") == b.getAs[Long]("doc_id"))
      assert(s.getAs[Long]("trimmed_tokens") == b.getAs[Long]("trimmed_tokens"))
      assert(s.getAs[Double]("kept_frac") == b.getAs[Double]("kept_frac"))
    }
  }

  test("stream-stream LEFT OUTER join == batch left join, nulls included") {
    import org.apache.spark.sql.functions._
    val stream = StreamingQueries.q84(spark, Sf).collect()
    // unmatched purchases must surface as null click rows — the whole
    // point of the outer form (and the rows a stalled watermark loses)
    assert(stream.exists(_.isNullAt(2)), "expected watermark-flushed null rows")
    val batch = graft.sources.Tables.events(spark, Sf).alias("p")
      .where(col("p.event_type") === "purchase" && col("p.ts") < lit("2024-01-28"))
      .join(graft.sources.Tables.events(spark, Sf).alias("c")
          .where(col("c.event_type") === "click"),
        expr("""p.user_id = c.user_id AND
               |c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts""".stripMargin),
        "leftOuter")
      .select(col("p.user_id"), col("p.event_id").as("purchase_id"),
        col("c.event_id").as("click_id"),
        floor((unix_micros(col("p.ts")) - unix_micros(col("c.ts"))) / 1000000L)
          .cast("long").as("gap_s"))
      .collect()
    assert(stream.map(_.toSeq).toSet == batch.map(_.toSeq).toSet)
    assert(stream.length == batch.length)
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
