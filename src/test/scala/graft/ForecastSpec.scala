package graft

import graft.operators.Forecast
import graft.operators.Forecast.TrendPoint

/** The trend + weekly-seasonality fit (D11 Prophet parity): exact
  * recovery on constructed series, 7-periodicity of the seasonal
  * component, and shuffle-order determinism of the float math.
  */
class ForecastSpec extends SparkTestBase {

  private val Eps = 1e-9

  test("pure trend series: seasonal components are ~0, yhat continues the line") {
    import spark.implicits._
    // y = 100 + 3t over 4 complete weeks
    val pts = (0L until 28L).map(t => TrendPoint("k", t, 100 + 3 * t)).toDS()
    val rows = Forecast.seasonalForecast(pts, 7).collect().sortBy(_.h)
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(math.abs(r.slope - 3.0) < Eps, s"slope ${r.slope}")
      assert(math.abs(r.intercept - 100.0) < Eps, s"intercept ${r.intercept}")
      assert(math.abs(r.seasonal) < Eps, s"seasonal ${r.seasonal}")
      assert(math.abs(r.yhat - (100.0 + 3.0 * r.t)) < Eps)
    }
  }

  test("trend + weekly pattern over complete weeks: pattern recovered exactly") {
    import spark.implicits._
    // weekly pattern that is mean-zero AND uncorrelated with the day
    // index (Σp=0, Σd·p[d]=0) on top of y = 50 + 2t: doubly
    // orthogonal, so the two-STAGE fit recovers both components
    // exactly over complete weeks. (A t-correlated pattern would leak
    // into the trend stage — inherent to sequential fitting, same as
    // detrend-then-season decompositions everywhere.)
    val pattern = Array(4L, -4L, -3L, 2L, 1L, 0L, 0L)
    assert(pattern.sum == 0)
    assert(pattern.zipWithIndex.map { case (p, d) => p * d }.sum == 0)
    val pts = (0L until 56L)
      .map(t => TrendPoint("k", t, 50 + 2 * t + pattern((t % 7).toInt))).toDS()
    val rows = Forecast.seasonalForecast(pts, 14).collect().sortBy(_.h)
    assert(rows.length == 14)
    rows.foreach { r =>
      assert(math.abs(r.slope - 2.0) < 1e-6, s"slope ${r.slope}")
      assert(math.abs(r.seasonal - pattern(r.dow)) < 1e-6,
        s"dow ${r.dow}: seasonal ${r.seasonal} != ${pattern(r.dow)}")
      assert(math.abs(r.yhat - (50.0 + 2.0 * r.t + pattern(r.dow))) < 1e-6)
    }
    // the forecast's seasonal phase repeats with period 7
    rows.take(7).zip(rows.drop(7)).foreach { case (a, b) =>
      assert(a.dow == b.dow && math.abs(a.seasonal - b.seasonal) < Eps)
    }
  }

  test("bit-identical under input row order (pinned float-op order)") {
    import spark.implicits._
    val base = (0L until 45L).map(t => TrendPoint("k", t, 10 + t * t % 13))
    val a = Forecast.seasonalForecast(base.toDS().repartition(7), 10)
      .collect().sortBy(_.h)
    val b = Forecast.seasonalForecast(scala.util.Random.shuffle(base).toDS()
      .repartition(3), 10).collect().sortBy(_.h)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("groups with <2 days are dropped; never-observed dow gets 0 seasonal") {
    import spark.implicits._
    // key "solo" has one observation — no slope, dropped. key "gap"
    // observes only dows {0,1}: forecasts landing on other dows carry
    // seasonal = 0 (trend-only)
    val pts = (Seq(TrendPoint("solo", 3L, 5L)) ++
      Seq(0L, 1L, 7L, 8L, 14L, 15L).map(t => TrendPoint("gap", t, 20 + t))).toDS()
    val rows = Forecast.seasonalForecast(pts, 7).collect()
    assert(rows.forall(_.key == "gap"))
    rows.filter(r => r.dow >= 2).foreach(r => assert(r.seasonal == 0.0))
  }
}
