package graft

import java.sql.Timestamp
import scala.math.BigDecimal.RoundingMode
import graft.queries.{GraphOps, SkewQueries, TemporalOps}

/** The round-7 skew/temporal/graph additions pinned by plain-Scala
  * recomputations over the collected sf0.001 corpus — independent of
  * both the Spark plans and the DuckDB oracles. The skew queries get
  * the extra physical assert: salting must actually reach the plan
  * (a salted agg that Catalyst collapses back to one level would
  * still pass the semantic check while defeating the point).
  */
class SkewTemporalSpec extends SparkTestBase {

  private def dec6(v: Double): BigDecimal =
    BigDecimal(v).setScale(6, RoundingMode.HALF_UP)

  private lazy val events: Seq[(Long, Long, String, Double, Timestamp, String)] =
    graft.sources.Tables.events(spark, Sf)
      .select("event_id", "user_id", "event_type", "value", "ts", "props")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getTimestamp(4), r.getString(5)))

  test("q137 salted agg == unsalted recount, and the salt reaches the plan") {
    val expect = events.groupBy(_._3).map { case (t, es) =>
      t -> ((es.size.toLong, es.map(_._2).distinct.size.toLong,
        es.map(e => dec6(e._4)).sum))
    }
    val df = SkewQueries.q137(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("salt"), "level-1 salt grouping was optimized away")
    val rows = df.collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, u, s) = expect(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("n_users") == u)
      assert(r.getAs[Double]("sum_value") == s.toDouble)
      assert(r.getAs[Double]("avg_value") == s.toDouble / n)
    }
  }

  test("q138 salted join == plain weighted rollup, via a shuffle join") {
    val weights = Map("view" -> 1, "click" -> 3, "signup" -> 10,
      "purchase" -> 25, "error" -> 0)
    val expect = events.groupBy(_._3).map { case (t, es) =>
      t -> ((es.size.toLong, es.map(e => dec6(weights(t) * e._4)).sum))
    }
    val df = SkewQueries.q138(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      "the dim-cannot-broadcast scenario must plan a shuffle join")
    assert(plan.contains("salt"), "join keys lost the salt")
    val rows = df.collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, s) = expect(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("weighted_value") == s.toDouble)
    }
  }

  test("q139 degree-oriented census == brute-force adjacency count") {
    val li = graft.sources.Tables.lineitem(spark, Sf)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val edges = li.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity)
      // NB: Map.collect over tuple results would rebuild a Map and
      // collapse edges sharing a first endpoint — filter + keySet
      .filter(_._2.size >= GraphOps.MinSupport).keySet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    val tri = adj.map { case (_, ns) =>
      (for (i <- ns.indices; j <- (i + 1) until ns.length
            if edges.contains((ns(i), ns(j)))) yield 1).size.toLong
    }.sum
    val row = GraphOps.q139(spark, Sf).collect().head
    assert(row.getAs[Long]("n_nodes") == deg.size.toLong)
    assert(row.getAs[Long]("n_edges") == edges.size.toLong)
    assert(row.getAs[Long]("n_wedges") == deg.values.map(d => d * (d - 1) / 2).sum)
    assert(row.getAs[Long]("n_triangles") == tri)
    assert(tri > 0, "degenerate fixture: no triangles to certify against")
  }

  // o_orderdate scans as TIMESTAMP_NTZ → LocalDateTime in collect()
  private def ntz(x: Any): Timestamp = x match {
    case t: Timestamp               => t
    case d: java.time.LocalDateTime => Timestamp.valueOf(d)
  }

  test("q140 SCD2 intervals == per-customer run-length fold") {
    val orders = graft.sources.Tables.orders(spark, Sf)
      .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), ntz(r.get(1)), r.getLong(2), r.getString(3)))
    val expected = orders.groupBy(_._1).flatMap { case (ck, os) =>
      val sorted = os.sortBy(o => (o._2.getTime, o._3))
      val runs = sorted.foldLeft(Vector.empty[(String, Timestamp, Long)]) {
        case (acc, (_, d, _, p)) =>
          if (acc.nonEmpty && acc.last._1 == p)
            acc.init :+ ((p, acc.last._2, acc.last._3 + 1))
          else acc :+ ((p, d, 1L))
      }
      runs.zipWithIndex.map { case ((p, from, n), i) =>
        val to = if (i + 1 < runs.length) Some(runs(i + 1)._2) else None
        (ck, (i + 1).toLong, p, from, to, n, to.isEmpty)
      }
    }.toSeq.sortBy(r => (r._1, r._2))
    val rows = TemporalOps.q140(spark, Sf).collect().map { r =>
      (r.getAs[Long]("o_custkey"), r.getAs[Long]("version"),
        r.getAs[String]("priority"), ntz(r.getAs[Any]("valid_from")),
        Option(r.getAs[Any]("valid_to")).map(ntz), r.getAs[Long]("n_orders"),
        r.getAs[Boolean]("is_current"))
    }.toSeq
    assert(rows == expected)
    assert(rows.map(_._6).sum == orders.length.toLong,
      "interval order counts must conserve the change log")
  }

  test("q141 cumulative uniques == first-seen attribution recount") {
    def day(t: Timestamp): java.time.LocalDate =
      t.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
    val byDay = events.groupBy(e => day(e._5))
    val firstDay = events.groupBy(_._2).view
      .mapValues(es => es.map(e => day(e._5)).min).toMap
    val days = byDay.keys.toSeq.sorted(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    var cum = 0L
    val expected = days.map { d =>
      val es = byDay(d)
      val nu = firstDay.count(_._2 == d).toLong
      cum += nu
      (d.toString, es.size.toLong, es.map(_._2).distinct.size.toLong, nu, cum)
    }
    val rows = TemporalOps.q141(spark, Sf).collect().map { r =>
      (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("n_events"),
        r.getAs[Long]("daily_active"), r.getAs[Long]("new_users"),
        r.getAs[Long]("cum_users"))
    }.toSeq
    assert(rows == expected)
  }

  test("q144 trailing 7-day window == per-type calendar recount") {
    def day(t: Timestamp): Long = t.toInstant.atZone(java.time.ZoneOffset.UTC)
      .toLocalDate.toEpochDay
    val daily = events.groupBy(e => (day(e._5), e._3)).view.mapValues { es =>
      (es.size.toLong, es.map(e => dec6(e._4)).sum)
    }.toMap
    val rows = queries.TemporalOps.q144(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay
      val t = r.getAs[String]("event_type")
      val trail = (d - 6 to d).flatMap(dd => daily.get((dd, t)))
      assert(r.getAs[Long]("n_events") == daily((d, t))._1)
      assert(r.getAs[Long]("n_7d") == trail.map(_._1).sum)
      assert(r.getAs[Double]("value_7d") == trail.map(_._2).sum.toDouble)
    }
    // the frame must be calendar-based: at least one row's trail has
    // fewer than 7 populated days yet still spans exactly [d-6, d]
    assert(rows.map(_.getAs[Long]("n_7d")).distinct.length > 1)
  }

  test("q145 one-pass column profile == per-column recount") {
    val li = graft.sources.Tables.lineitem(spark, Sf)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .collect()
    val byCol = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
      .map(c => c -> li.map(_.getAs[Double](c)))
    val rows = queries.SketchQueries.q145(spark, Sf).collect()
    assert(rows.map(_.getAs[String]("col_name")).toSeq == byCol.map(_._1))
    rows.zip(byCol).foreach { case (r, (_, vs)) =>
      assert(r.getAs[Long]("n") == vs.length.toLong)
      assert(r.getAs[Long]("n_distinct") == vs.distinct.length.toLong)
      assert(r.getAs[Double]("min_v") == vs.min)
      assert(r.getAs[Double]("max_v") == vs.max)
      assert(r.getAs[Double]("sum_v") == vs.map(dec6).sum.toDouble)
    }
    // single-pass shape: exactly ONE FILE scan of lineitem in the
    // plan (the 4-row literal column frame for null-column zero-fill
    // is a LocalTableScan leaf, not a data scan). Counted on the
    // pre-AQE sparkPlan: executedPlan wraps everything in a single
    // AdaptiveSparkPlanExec LEAF, which made the old collectLeaves
    // count vacuous.
    val leaves = queries.SketchQueries.q145(spark, Sf).queryExecution
      .sparkPlan.collectLeaves()
    val scans = leaves.count(l =>
      l.getClass.getSimpleName.contains("FileSourceScan") ||
        l.getClass.getSimpleName.contains("BatchScan"))
    assert(scans == 1, s"profile must be one scan, saw $scans of " +
      leaves.map(_.getClass.getSimpleName).mkString(","))
  }

  test("q145 profile emits n=0 rows for entirely-null columns") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the oracle's per-column UNION ALL emits a row for an all-null
    // column (n=0, NULL min/max/sum); the pairs frame loses it at the
    // isNotNull filter, so the literal-frame right join must restore it
    val src = Seq((1.0, 2.0, 0.1), (3.0, 4.0, 0.2))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
      .withColumn("l_tax", lit(null).cast("double"))
    val rows = queries.SketchQueries.profile(src).collect()
    assert(rows.map(_.getAs[String]("col_name")).toSeq ==
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
    val tax = rows.find(_.getAs[String]("col_name") == "l_tax").get
    assert(tax.getAs[Long]("n") == 0L && tax.getAs[Long]("n_distinct") == 0L)
    assert(tax.isNullAt(tax.fieldIndex("min_v")) &&
      tax.isNullAt(tax.fieldIndex("max_v")) &&
      tax.isNullAt(tax.fieldIndex("sum_v")))
    val q = rows.find(_.getAs[String]("col_name") == "l_quantity").get
    assert(q.getAs[Long]("n") == 2L && q.getAs[Double]("sum_v") == 4.0)
  }

  test("q148 top paths == per-user-day first-5 recount") {
    def day(t: Timestamp): Long = t.toInstant.atZone(java.time.ZoneOffset.UTC)
      .toLocalDate.toEpochDay
    val paths = events.groupBy(e => (e._2, day(e._5))).values.map { es =>
      es.sortBy(e => (e._5.getTime * 1000L + (e._5.getNanos % 1000000) / 1000,
        e._1)).take(queries.EventsOps.PathLen).map(_._3).mkString(">")
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = paths.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(queries.EventsOps.PathTopK)
    val rows = queries.EventsOps.q148(spark, Sf).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions"))).toSeq
    assert(rows == expected && rows.nonEmpty)
  }

  test("q147 pruned corpus == docs minus non-representative cluster members") {
    val clusters = graft.queries.Dedup.q61(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id")))
    assert(clusters.nonEmpty, "fixture must contain duplicate clusters")
    val dropSet = clusters.filter { case (d, c) => d != c }.map(_._1).toSet
    val allDocs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = graft.queries.Dedup.q147(spark, Sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept == allDocs -- dropSet)
    // every cluster keeps exactly its representative
    clusters.groupBy(_._2).foreach { case (rep, members) =>
      assert(kept(rep), s"representative $rep was pruned")
      members.map(_._1).filterNot(_ == rep).foreach(m =>
        assert(!kept(m), s"non-representative $m survived"))
    }
  }

  test("q142 last-touch attribution == sequential per-user scan") {
    val kOf = """"k":\s*(\d+)""".r
    val credits = events.groupBy(_._2).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._5.getTime * 1000L
        + (e._5.getNanos % 1000000) / 1000, e._1))
      var lastChan: Option[String] = None
      sorted.flatMap { case (_, _, tpe, v, _, props) =>
        val out = if (tpe == "purchase")
          Some((lastChan.getOrElse("direct"), dec6(v))) else None
        if (tpe == "click")
          lastChan = kOf.findFirstMatchIn(props).map(m => "ch" + (m.group(1).toLong % 3))
        out
      }
    }.toSeq
    val expect = credits.groupBy(_._1).map { case (c, vs) =>
      c -> ((vs.size.toLong, vs.map(_._2).sum))
    }
    val rows = TemporalOps.q142(spark, Sf).collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, s) = expect(r.getAs[String]("channel"))
      assert(r.getAs[Long]("n_purchases") == n)
      assert(r.getAs[Double]("attributed_value") == s.toDouble)
    }
    assert(expect.contains("direct") || expect.keys.exists(_.startsWith("ch")))
  }

  test("AQE OptimizeSkewedJoin splits the unsalted q138 join shape at runtime") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // q137/q138 prove the MANUAL salt rewrites; this pins when AQE's
    // automatic skew handling covers the same join shape instead —
    // and, by contrast, when the salt stays necessary (see the
    // assertion trailer below). Thresholds are scaled down to the
    // sf0.001 corpus; the MECHANISM (a skewed reduce partition split
    // into per-mapper ranges, the dim partition duplicated per
    // split) is byte-size-invariant. The fact side is repartitioned
    // first because skew splits are per-MAPPER ranges: a one-mapper
    // shuffle (one parquet file at this SF) has nothing to split.
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "512b",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512b")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = Seq("view" -> 1, "click" -> 3, "signup" -> 10,
        "purchase" -> 25, "error" -> 0).toDF("event_type", "weight")
      val fact = graft.sources.Tables.events(spark, Sf)
        .select(col("event_type"), col("value"), col("props"))
        .repartition(8)
      val joined = fact.join(dim, Seq("event_type"))
      // execute JOINED itself (count() would be a different query
      // execution and the adaptive plan under inspection would never
      // finalize) — the AQE plan is only readable after an action
      val n = joined.collect().length
      assert(n == events.size, "inner join on a total dim keeps every event")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"adaptive plan did not split the skewed join:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
    // Where the manual rewrites remain NECESSARY (documented here so
    // the suite carries the decision rule, SCALE_NOTES has the prose):
    //  - aggregates: OptimizeSkewedJoin only rewrites joins; a skewed
    //    groupBy key still needs q137's key-derived salt;
    //  - joins whose output partitioning must survive (a groupBy on
    //    the join key downstream): the skew split breaks it, and AQE
    //    declines unless forceOptimizeSkewedJoin accepts the extra
    //    exchange — q138's salt keeps the single-exchange shape.
  }
}
