package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ZOrderLong
import graft.sources.Tables

/** Data-layout queries: the write-side organization that makes the
  * read side prunable. The reference tunes layout only by
  * `repartition(200)` (radiography_analysis.py:102); at 100 TB layout
  * IS the query optimizer's raw material — min/max envelopes per
  * file decide how much of the lake a predicate reads.
  */
object Layout {

  type Q = (SparkSession, String) => DataFrame

  /** Aligned z-block size: 2^18 codes = a 512 × 512 key rectangle. */
  final val BucketBits = 18

  // ---------------------------------------------------------------
  // q86_zorder_layout — per z-bucket key-envelope audit over
  // lineitem's (l_partkey, l_suppkey): bucket rows by the top bits of
  // the Morton code and report each bucket's min/max of BOTH keys.
  // The point the numbers make: every bucket's envelope spans < 512
  // in part AND supplier dimensions simultaneously (an aligned 2^18
  // z-block is exactly a 512×512 rectangle), so files written in
  // z-bucket order serve predicates on EITHER key with bounded
  // false-positive reads. A single-key sort gets a tight envelope in
  // one dimension and the full domain in the other.
  // Plan shape: pure map (codegen'd interleave) + one hash aggregate.
  // ---------------------------------------------------------------
  def q86(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        ZOrderLong.zorder2(col("l_partkey"), col("l_suppkey")).as("z"))
      .groupBy(shiftrightunsigned(col("z"), BucketBits).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
        min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
      .orderBy(col("z_bucket"))

  val q86Sql: String = {
    def step(shift: Int, mask: Long) =
      s"SELECT ((xs | (xs << $shift)) & $mask) AS xs, " +
        s"((ys | (ys << $shift)) & $mask) AS ys, x, y"
    s"""WITH pts AS (
       |  SELECT l_partkey AS x, l_suppkey AS y FROM lineitem),
       |s0 AS (SELECT x & 2147483647 AS xs, y & 2147483647 AS ys, x, y FROM pts),
       |s1 AS (${step(16, 281470681808895L)} FROM s0),
       |s2 AS (${step(8, 71777214294589695L)} FROM s1),
       |s3 AS (${step(4, 1085102592571150095L)} FROM s2),
       |s4 AS (${step(2, 3689348814741910323L)} FROM s3),
       |s5 AS (${step(1, 6148914691236517205L)} FROM s4),
       |z AS (SELECT x, y, (xs | (ys << 1)) AS z FROM s5)
       |SELECT z >> $BucketBits AS z_bucket, COUNT(*) AS n,
       |  MIN(x) AS p_min, MAX(x) AS p_max,
       |  MIN(y) AS s_min, MAX(y) AS s_max
       |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin
  }

  def queries: Map[String, Q] = Map("q86_zorder_layout" -> (q86 _))

  def oracles: Map[String, String] = Map("q86_zorder_layout" -> q86Sql)
}
