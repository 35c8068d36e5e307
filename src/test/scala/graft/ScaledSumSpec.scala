package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.ScaledSum.scaledDsum

/** The escalated scaled-long sum (functions/ScaledSum.scala) must be
  * value-identical to the SUM(CAST(x AS DECIMAL(18,s))) parity idiom
  * it replaces — including where plain long summation would silently
  * wrap. These tests force the escalation path explicitly (the corpus
  * never reaches it) and sweep every dsum input column for
  * half-up rounding boundary divergence.
  */
class ScaledSumSpec extends SparkTestBase {

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  test("matches decimal sums on random signed data across many partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(20000) { i =>
      (i % 7, math.round(rnd.nextGaussian() * 1e8) / 100.0 * (if (i % 3 == 0) -1 else 1))
    }
    val df = rows.toDF("k", "v").repartition(16)
    val got = df.groupBy("k").agg(scaledDsum(col("v"), 2).as("s")).orderBy("k").collect()
    val want = df.groupBy("k").agg(dsum(col("v"), 2).as("s")).orderBy("k").collect()
    assert(got.map(_.getDouble(1)).sameElements(want.map(_.getDouble(1))))
  }

  test("escalates past Long range instead of wrapping") {
    import spark.implicits._
    // 9.1e18-scale addends at scale 0: three of them exceed Long.MaxValue
    // (9.22e18) on the second add — a plain long sum wraps negative
    val big = 9.1e18
    val df = Seq.fill(6)(big).toDF("v").repartition(2)
    val got = df.agg(scaledDsum(col("v"), 0).as("s")).collect()(0).getDouble(0)
    assert(got == 6 * big, s"escalation lost magnitude: $got")
    // and the same through a single partition (update-path escalation)
    val one = Seq.fill(6)(big).toDF("v").coalesce(1)
      .agg(scaledDsum(col("v"), 0).as("s")).collect()(0).getDouble(0)
    assert(one == 6 * big)
    // sign flip mid-stream: escalated total must come back down exactly
    val mixed = (Seq.fill(4)(big) ++ Seq.fill(4)(-big)).toDF("v").coalesce(1)
      .agg(scaledDsum(col("v"), 0).as("s")).collect()(0).getDouble(0)
    assert(mixed == 0.0, s"signed escalation drifted: $mixed")
  }

  test("empty and all-null groups evaluate to NULL, zero sums to 0") {
    import spark.implicits._
    val df = Seq((1, None: Option[Double]), (1, None), (2, Some(0.0)), (2, Some(0.0)))
      .toDF("k", "v")
    val rows = df.groupBy("k").agg(scaledDsum(col("v"), 2).as("s")).orderBy("k").collect()
    assert(rows(0).isNullAt(1), "all-null group must be NULL like SUM")
    assert(!rows(1).isNullAt(1) && rows(1).getDouble(1) == 0.0)
  }

  test("corpus-wide rounding boundary sweep: floor-half-up == decimal rescale") {
    // the helper rounds the double product x*10^s half-up via floor;
    // CAST(x AS DECIMAL(18,s)) rescales x's exact binary value. They
    // can only differ on representable half-integer products — assert
    // the corpus has none, for every column dsum actually touches.
    val li = graft.sources.Tables.lineitem(spark, Sf)
    val ev = graft.sources.Tables.events(spark, Sf)
    val od = graft.sources.Tables.orders(spark, Sf)
    def mismatches(df: org.apache.spark.sql.DataFrame, c: Column, sc: Int): Long = {
      val f = math.pow(10, sc).toLong
      val viaFloor = when(c >= 0, floor(c * lit(f.toDouble) + lit(0.5)))
        .otherwise(-floor(-(c * lit(f.toDouble)) + lit(0.5))).cast("long")
      val viaDecimal = (c.cast(s"decimal(18,$sc)") * lit(f)).cast("long")
      df.select(viaFloor.as("a"), viaDecimal.as("b"))
        .where(col("a") =!= col("b")).count()
    }
    val cu = graft.sources.Tables.customer(spark, Sf)
    val cases: Seq[(String, org.apache.spark.sql.DataFrame, Column, Int)] = Seq(
      ("l_quantity", li, col("l_quantity"), 2),
      ("l_extendedprice", li, col("l_extendedprice"), 2),
      ("l_discount", li, col("l_discount"), 2),
      ("disc_price", li, col("l_extendedprice") * (lit(1) - col("l_discount")), 6),
      ("charge", li,
        col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6),
      ("o_totalprice", od, col("o_totalprice"), 2),
      ("c_acctbal", cu, col("c_acctbal"), 2), // negative balances exist
      ("event_value", ev, col("value"), 2),   // Reshape sums at scale 2...
      ("event_value6", ev, col("value"), 6))  // ...EventsOps at scale 6
    cases.foreach { case (name, df, c, sc) =>
      assert(mismatches(df, c, sc) == 0L, s"rounding boundary hit in $name")
    }
  }
}
