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
        pts.foreach { p =>
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
