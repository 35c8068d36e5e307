package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import graft.sources.Tables

/** The pure-SQL entry point: registerViews exposes the whole corpus
  * to `spark.sql(...)` text with the same semantics as the typed
  * accessors (including the events ts-encoding normalization).
  */
class SqlSurfaceSpec extends SparkTestBase {

  test("SQL text over registered views == DataFrame query") {
    Tables.registerViews(spark, Sf)
    val viaSql = spark.sql(
      """SELECT n_name, COUNT(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin).collect().toSeq
    val viaDf = Tables.customer(spark, Sf)
      .join(Tables.nation(spark, Sf),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      .orderBy(col("n_name")).collect().toSeq
    assert(viaSql.nonEmpty && viaSql == viaDf)
  }

  test("events view carries the normalized ts contract") {
    Tables.registerViews(spark, Sf)
    assert(spark.sql("SELECT ts FROM events").schema("ts").dataType == TimestampType)
    // and the graft kernel SQL surface composes with the views
    val h = spark.sql(
      "SELECT graft_minhash_sig(text) AS sig FROM documents LIMIT 1")
      .collect().head
    assert(h.getAs[scala.collection.Seq[Long]]("sig").nonEmpty)
  }
}
