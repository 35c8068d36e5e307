package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketed co-located join through the declared inventory: both join
  * sides are pre-shuffled ONCE into the same bucket layout
  * (bucketBy(orderkey) + sortBy), after which every orderkey join is
  * a zero-exchange sort-merge — the strategy for repeatedly-joined
  * 100 TB fact tables, where paying one layout write amortizes over
  * every downstream query. BucketingSpec pins the no-Exchange plan;
  * the driver oracle pins the values.
  */
object Bucketed {

  type Q = (SparkSession, String) => DataFrame

  final val NumBuckets = 8

  /** Bucketed copies of orders/lineitem for `dir` as EXTERNAL tables
    * in the warehouse — table names are dir-keyed so different scale
    * factors don't collide. The layout is a WAREHOUSE-KEYED ONE-TIME
    * ARTIFACT, not session state: the files carry a fingerprint of
    * their source parquet, and a fresh JVM whose catalog has never
    * seen the table re-REGISTERS the surviving files (one DDL, no
    * rewrite) instead of paying the layout shuffle again. That
    * cross-session reuse is the bucketing economics the whole
    * operator exists for — charging the layout write to every session
    * (the pre-round-7 behavior) inverts it. A source-corpus
    * regeneration changes the fingerprint and forces the rewrite, so
    * a stale layout can never serve a new corpus generation (the
    * round-5 events-encoding lesson, applied to derived data).
    */
  private val createdLayouts =
    scala.collection.concurrent.TrieMap.empty[(Int, String), Seq[String]]

  graft.CacheRegistry.register("bucketed.layouts") { sid =>
    // session end clears BOOKKEEPING only — the layout files are a
    // shared warehouse artifact that outlives every session by design
    createdLayouts.keys.filter(_._1 == sid).foreach(createdLayouts.remove)
  }

  /** Test/introspection hooks. */
  private[graft] def layoutsTracked(spark: SparkSession): Seq[String] =
    createdLayouts.toSeq
      .filter(_._1._1 == System.identityHashCode(spark)).flatMap(_._2)
  private[graft] def lastProvision(spark: SparkSession, table: String): Option[String] =
    graft.io.Warehouse.lastProvision(spark, table)

  def ensureBucketed(spark: SparkSession, dir: String): (String, String) = {
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val li = s"graft_li_bkt_$tag"
    val ord = s"graft_ord_bkt_$tag"
    graft.io.Warehouse.ensureBucketedTable(spark, li,
      s"$dir/lineitem.parquet", "l_orderkey", NumBuckets)(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice"))
    graft.io.Warehouse.ensureBucketedTable(spark, ord,
      s"$dir/orders.parquet", "o_orderkey", NumBuckets)(
      Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"))
    createdLayouts.putIfAbsent(
      (System.identityHashCode(spark), dir),
      Seq(li, ord).map(graft.io.Warehouse.tableLocation(spark, _)))
    (li, ord)
  }

  /** The co-located join itself (pre-aggregation) — the fragment
    * BucketingSpec plan-asserts has no Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (li, ord) = ensureBucketed(spark, dir)
    spark.table(ord).join(spark.table(li),
      col("o_orderkey") === col("l_orderkey"))
  }

  // ---------------------------------------------------------------
  // q57_bucketed_join — revenue per order priority through the
  // zero-exchange orders⋈lineitem. The only shuffle in the whole
  // query is the final small groupBy on o_orderpriority (5 keys);
  // the fact-fact join itself moves no rows.
  // ---------------------------------------------------------------
  def q57(spark: SparkSession, dir: String): DataFrame =
    bucketedJoin(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderpriority"))

  val q57Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  def queries: Map[String, Q] = Map("q57_bucketed_join" -> (q57 _))

  def oracles: Map[String, String] = Map("q57_bucketed_join" -> q57Sql)
}
