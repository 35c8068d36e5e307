package graft

class EntrySpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key with an oracle exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without a query: $missing")
  }

  test("all declared queries run at sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, Sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q01 pricing summary has expected shape") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, Sf)
    assert(df.columns.toSet == Set("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
      "count_order"))
    assert(df.count() <= 9) // at most 3 returnflags x 3 linestatus
  }
}
