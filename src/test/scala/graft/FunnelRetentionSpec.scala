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

  test("q135 transition matrix == plain-Scala per-user bigram count, rows sum to 1") {
    // recount in the PLAN'S exact order: (ts, event_id) per user
    val full = graft.sources.Tables.events(spark, Sf)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3)))
    val byId = full.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3.getTime, e._4))
      sorted.map(_._2).sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq
    }.groupBy(identity).view.mapValues(_.size).toMap
    val rows = EventsOps.q135(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == byId.values.sum.toLong)
    rows.foreach { r =>
      val key = (r.getAs[String]("prev_type"), r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == byId(key).toLong, s"cell $key")
    }
    // per-prev probabilities sum to ~1 (rounding at 4 dp)
    rows.groupBy(_.getAs[String]("prev_type")).values.foreach { g =>
      val s = g.map(_.getAs[Double]("p")).sum
      assert(math.abs(s - 1.0) < 5e-4, s"row sums to $s")
    }
  }

  test("q136 anomalies == recomputed z-scores from exact integer sums") {
    val hourMs = 3600000L
    val hourly = events.groupBy(e => (Math.floorDiv(e._3.getTime, hourMs), e._2))
      .view.mapValues(_.size).toMap
    val byType = hourly.groupBy(_._1._2)
    val flagged = byType.flatMap { case (t, cells) =>
      val cs = cells.values.map(_.toLong).toSeq
      val n = cs.size.toDouble
      val s = cs.sum.toDouble
      val ss = cs.map(c => c * c).sum.toDouble
      val mean = s / n
      val std = math.sqrt((ss - s * s / n) / n)
      cells.collect { case ((h, _), c) if math.abs((c - mean) / std) >= EventsOps.ZCut =>
        ((h, t), (c, (c - mean) / std))
      }
    }
    val rows = EventsOps.q136(spark, Sf).collect()
    assert(rows.nonEmpty && rows.length == flagged.size)
    rows.foreach { r =>
      val h = Math.floorDiv(r.getAs[Timestamp]("hour_start").getTime, hourMs)
      val key = (h, r.getAs[String]("event_type"))
      val (c, z) = flagged(key)
      assert(r.getAs[Long]("c") == c.toLong)
      assert(r.getAs[Double]("z") == math.floor(z * 1e4 + 0.5) / 1e4, s"z at $key")
    }
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
