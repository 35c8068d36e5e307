package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic per-key trend forecasting — the Spark-native
  * re-expression of the reference's Prophet GROUPED_MAP pandas UDF
  * (distributed_model_prediction, cases_time_analysis.py:268-306):
  * group by key, fit per group, emit a forecast frame. Prophet has no
  * JVM port and is unseeded in the reference (SURVEY.md §7.4 risk 2),
  * so the model here is ordinary least squares on the day index —
  * deterministic, closed-form, and oracle-checkable.
  *
  * Scale: groupByKey shuffles once on the forecast key; each group's
  * fit is a single O(n) pass in one task. Keys (countries /
  * priorities) are few and group sizes bounded by the calendar, so
  * skew is structural, not data-dependent.
  *
  * Exact-parity discipline: all sums are exact Longs; the double
  * operations follow a pinned order (numerator/denominator division,
  * then (sy - slope*st)/n, then intercept + slope*t) mirrored
  * token-for-token in the oracle SQL.
  */
object Forecast {

  /** One observation: day index t (days since epoch), count y. */
  case class TrendPoint(key: String, t: Long, y: Long)

  /** One forecast row, h days past the last observed day (t = the
    * forecast day's absolute index). Bands are ±1.96 × the population
    * residual std of the fit (Prophet-shaped contract:
    * yhat/yhat_lower/yhat_upper).
    */
  case class ForecastRow(key: String, n_days: Long, slope: Double,
    intercept: Double, h: Int, t: Long, yhat: Double,
    yhat_lower: Double, yhat_upper: Double)

  /** OLS fit + H-step forecast per key. Groups with <2 distinct days
    * are dropped (no slope).
    */
  def linearForecast(points: Dataset[TrendPoint], horizon: Int): Dataset[ForecastRow] =
    forecast(points, horizon, includeHistory = false)

  /** Like [[linearForecast]] but also re-predicts every observed day
    * (h = t - tmax ≤ 0) — the `include_history=True` shape of the
    * reference's make_future_dataframe (cases_time_analysis.py:296-300).
    */
  def linearForecastWithHistory(points: Dataset[TrendPoint], horizon: Int): Dataset[ForecastRow] =
    forecast(points, horizon, includeHistory = true)

  /** One trend+seasonality forecast row. `dow` is the day index
    * modulo 7 (a pure 7-period phase, not a named calendar weekday —
    * the reference's Prophet weekly term is likewise a pure
    * 7-periodic component, cases_time_analysis.py:277–306).
    */
  case class SeasonalRow(key: String, n_days: Long, slope: Double,
    intercept: Double, h: Int, t: Long, dow: Int, seasonal: Double,
    yhat: Double)

  /** Trend + weekly seasonality by two-stage closed-form least
    * squares — the deterministic re-expression of the reference's
    * Prophet trend+weekly fit (cases_time_analysis.py:277–306,
    * SURVEY §7.3): (1) OLS on the day index exactly as
    * [[linearForecast]]; (2) the weekly component of each
    * day-of-week bucket is that bucket's mean trend residual — the
    * exact dummy-variable least-squares solution conditional on the
    * trend. Every per-bucket sum stays an exact integer and every
    * double op follows a pinned order mirrored token-for-token in the
    * q93 oracle SQL, so the whole fit replays bit-identically in
    * DuckDB. Same one-shuffle groupByKey scale shape as the linear
    * fit; the extra state is 3×7 longs per group.
    */
  def seasonalForecast(points: Dataset[TrendPoint], horizon: Int): Dataset[SeasonalRow] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key).flatMapGroups { (key, it) =>
      val pts = it.toArray
      var n = 0L; var st = 0L; var sy = 0L; var sty = 0L; var st2 = 0L
      var tmax = Long.MinValue
      val nd = new Array[Long](7)
      val std = new Array[Long](7)
      val syd = new Array[Long](7)
      pts.foreach { p =>
        n += 1; st += p.t; sy += p.y
        sty += p.t * p.y; st2 += p.t * p.t
        if (p.t > tmax) tmax = p.t
        val d = (((p.t % 7) + 7) % 7).toInt
        nd(d) += 1; std(d) += p.t; syd(d) += p.y
      }
      val den = n * st2 - st * st
      if (n < 2 || den == 0) Iterator.empty
      else {
        val slope = (n * sty - st * sy).toDouble / den.toDouble
        val intercept = (sy.toDouble - slope * st.toDouble) / n.toDouble
        val seas = Array.tabulate(7) { d =>
          if (nd(d) == 0) 0.0
          else (syd(d).toDouble - intercept * nd(d).toDouble -
            slope * std(d).toDouble) / nd(d).toDouble
        }
        (1 to horizon).iterator.map { h =>
          val t = tmax + h
          val d = (((t % 7) + 7) % 7).toInt
          SeasonalRow(key, n, slope, intercept, h, t, d, seas(d),
            intercept + slope * t.toDouble + seas(d))
        }
      }
    }
  }

  private def forecast(points: Dataset[TrendPoint], horizon: Int,
    includeHistory: Boolean): Dataset[ForecastRow] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.key).flatMapGroups { (key, it) =>
      val pts = it.toArray
      var n = 0L; var st = 0L; var sy = 0L; var sty = 0L; var st2 = 0L
      var tmax = Long.MinValue
      pts.foreach { p =>
        n += 1; st += p.t; sy += p.y
        sty += p.t * p.y; st2 += p.t * p.t
        if (p.t > tmax) tmax = p.t
      }
      val den = n * st2 - st * st
      if (n < 2 || den == 0) Iterator.empty
      else {
        val slope = (n * sty - st * sy).toDouble / den.toDouble
        val intercept = (sy.toDouble - slope * st.toDouble) / n.toDouble
        var rss = 0.0
        // ascending-t accumulation: group iteration order is shuffle
        // order, and a float sum must not depend on it
        pts.sortBy(_.t).foreach { p =>
          val r = p.y.toDouble - (intercept + slope * p.t.toDouble)
          rss += r * r
        }
        val sigma = math.sqrt(rss / n.toDouble)
        def row(t: Long): ForecastRow = {
          val yhat = intercept + slope * t.toDouble
          ForecastRow(key, n, slope, intercept, (t - tmax).toInt, t, yhat,
            yhat - 1.96 * sigma, yhat + 1.96 * sigma)
        }
        val future = (1 to horizon).iterator.map(h => row(tmax + h))
        if (includeHistory)
          pts.map(_.t).distinct.sorted.iterator.map(row) ++ future
        else future
      }
    }
  }
}
