package graft

import java.sql.Timestamp
import graft.queries.EventsOps

/** q133/q134 pinned by a plain-Scala recomputation over the collected
  * sf0.001 event log — independent of both the Spark window plan and
  * the DuckDB oracle.
  */
class FunnelRetentionSpec extends SparkTestBase {

  private lazy val events: Seq[(Long, String, Timestamp)] =
    graft.sources.Tables.events(spark, Sf)
      .select("user_id", "event_type", "ts").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))

  test("q133 funnel == sequential scan over per-user sorted events") {
    val byUser = events.groupBy(_._1)
    val H = 3600L * 1000000L // micros per hour
    def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos % 1000000) / 1000
    val stages = byUser.values.map { es =>
      val sorted = es.sortBy(e => us(e._3))
      val t1 = sorted.collectFirst { case (_, "view", t) => t }
      val t2 = t1.flatMap(a => sorted.collectFirst {
        case (_, "click", t) if us(t) > us(a) && us(t) <= us(a) + 24 * H => t
      })
      val t3 = t2.flatMap(b => sorted.collectFirst {
        case (_, "purchase", t) if us(t) > us(b) && us(t) <= us(b) + 72 * H => t
      })
      (t1, t2, t3)
    }.toSeq
    val row = EventsOps.q133(spark, Sf).collect().head
    assert(row.getAs[Long]("n_users") == byUser.size.toLong)
    assert(row.getAs[Long]("n_view") == stages.count(_._1.isDefined).toLong)
    assert(row.getAs[Long]("n_click_after_view") == stages.count(_._2.isDefined).toLong)
    assert(row.getAs[Long]("n_full_funnel") == stages.count(_._3.isDefined).toLong)
    val sumUs = stages.collect { case (Some(a), _, Some(c)) => us(c) - us(a) }.sum
    val n3 = stages.count(_._3.isDefined)
    val mean = math.floor(sumUs.toDouble / n3 / 3.6e9 * 1e4 + 0.5) / 1e4
    assert(row.getAs[Double]("mean_hours_to_convert") == mean)
    // the conversion windows must actually bind — otherwise the
    // funnel degenerates to "did the user ever do X" (rate 1.0)
    assert(row.getAs[Double]("cr_click") < 1.0)
  }

  test("q134 retention: offsets partition activity, rates from the cohort base") {
    val dayMs = 86400000L
    def day(t: Timestamp): Long = Math.floorDiv(t.getTime, dayMs)
    val byUser = events.groupBy(_._1).view.mapValues(_.map(e => day(e._3)))
    val firstDay = byUser.mapValues(_.min).toMap
    val offsets = Set(0L, 1L, 3L, 7L, 14L)
    val expected = byUser.toSeq
      .flatMap { case (u, ds) =>
        ds.map(d => (firstDay(u), d - firstDay(u), u)).distinct }
      .filter { case (_, off, _) => offsets(off) }
      .groupBy { case (c, off, _) => (c, off) }
      .view.mapValues(_.map(_._3).distinct.size).toMap
    val rows = EventsOps.q134(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = day(Timestamp.valueOf(r.getAs[java.sql.Date]("cohort").toString + " 00:00:00"))
      val key = (c, r.getAs[Long]("day_offset"))
      assert(expected.contains(key), s"unexpected cell $key")
      assert(r.getAs[Long]("n_active") == expected(key).toLong, s"cell $key")
      val base = expected((c, 0L)).toLong
      assert(r.getAs[Long]("cohort_size") == base)
      val rate = math.floor(expected(key).toDouble / base * 1e4 + 0.5) / 1e4
      assert(r.getAs[Double]("retention") == rate)
    }
    assert(rows.length == expected.size, "every populated cell emits")
  }
}
