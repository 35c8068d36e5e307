package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Relational operator inventory over the star-schema corpus — one
  * query per SURVEY.md §2 operator family, each with a DuckDB-runnable
  * oracle (SparkEntry.oracleSql).
  *
  * Float-parity discipline: monetary aggregates are summed as
  * DECIMAL (exact, order-independent — a double sum would differ in
  * final ULPs between Spark's partial-agg tree and DuckDB's sequential
  * sum) and cast back to DOUBLE only at the end; the double<->decimal
  * conversions are deterministic and identical across engines. The
  * same shape is used in both the Spark plan and the oracle SQL.
  *
  * Scale notes are per-query in the Scaladoc: every aggregate is
  * partial+final (map-side combine), every dim join is broadcast,
  * filters/projections sit directly on the scan for pushdown.
  */
object Relational {

  /** sum(x) via exact decimal, emitted as double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------
  // q01_pricing_summary — SURVEY §2.6 A1 (groupBy + multi-sum), §2.4 F1
  // (scan-pushed predicate), §2.8 O1 (sort). TPC-H Q1 shape.
  // Scale: single shuffle on a 6-value grouping key; partial aggregation
  // collapses ~all rows map-side, so the exchange carries O(groups) rows.
  // ---------------------------------------------------------------
  def q01(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> (q01 _)
  )

  def oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql
  )
}
