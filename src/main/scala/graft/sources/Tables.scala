package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed accessors for the driver's star-schema test corpus
  * (/root/repo/TESTDATA.md). One parquet file per table under the
  * scale-factor directory.
  *
  * Every accessor is a plain parquet scan — filters and projections
  * applied by callers are pushed into the scan by Catalyst
  * (PushedFilters / ReadSchema), which is the scale-critical property:
  * at 100 TB the scan must never read columns or row groups a query
  * doesn't need.
  */
object Tables {
  final val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  /** The events table carries TIMESTAMP(NANOS) parquet timestamps,
    * which Spark 4 rejects outright (PARQUET_TYPE_ILLEGAL). Public
    * escape hatch (SPARK-40819): read nanos as Long, then rebuild a
    * microsecond timestamp. Integer division (`DIV`) is mandatory —
    * ns-since-epoch ≈ 1.7e18 exceeds double's 2^53 exact-integer
    * range, so a fractional divide would corrupt timestamps.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
