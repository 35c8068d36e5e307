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

  /** How this session last provided each table: "catalog" (already
    * registered), "files" (re-registered surviving warehouse files),
    * or "written" (paid the layout shuffle). Introspection for specs
    * and the Bench setup report.
    */
  private val provisioned =
    scala.collection.concurrent.TrieMap.empty[(Int, String), String]

  graft.CacheRegistry.register("bucketed.layouts") { sid =>
    // session end clears BOOKKEEPING only — the layout files are a
    // shared warehouse artifact that outlives every session by design
    createdLayouts.keys.filter(_._1 == sid).foreach(createdLayouts.remove)
    provisioned.keys.filter(_._1 == sid).foreach(provisioned.remove)
  }

  /** Test/introspection hooks. */
  private[graft] def layoutsTracked(spark: SparkSession): Seq[String] =
    createdLayouts.toSeq
      .filter(_._1._1 == System.identityHashCode(spark)).flatMap(_._2)
  private[graft] def lastProvision(spark: SparkSession, table: String): Option[String] =
    provisioned.get((System.identityHashCode(spark), table))

  private val FingerprintFile = "_graft_src_fingerprint"

  /** (length, mtime) of every data file under the source path —
    * local-fs stat here; etag/length on an object store, same shape.
    */
  private def sourceFingerprint(spark: SparkSession, src: String): String = {
    val p = new org.apache.hadoop.fs.Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(s: org.apache.hadoop.fs.FileStatus): Seq[String] =
      if (s.isDirectory) fs.listStatus(s.getPath).toSeq.flatMap(walk)
      else Seq(s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
    walk(fs.getFileStatus(p)).sorted.mkString("|")
  }

  def ensureBucketed(spark: SparkSession, dir: String): (String, String) = {
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val li = s"graft_li_bkt_$tag"
    val ord = s"graft_ord_bkt_$tag"
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val hconf = spark.sparkContext.hadoopConfiguration

    def ensure(table: String, src: String, key: String,
               select: => org.apache.spark.sql.DataFrame): Unit = {
      val skey = (System.identityHashCode(spark), table)
      if (spark.catalog.tableExists(table)) {
        provisioned.putIfAbsent(skey, "catalog"); return
      }
      val loc = new org.apache.hadoop.fs.Path(warehouse, table)
      val fs = loc.getFileSystem(hconf)
      val fpPath = new org.apache.hadoop.fs.Path(loc, FingerprintFile)
      val fp = sourceFingerprint(spark, s"$dir/$src.parquet")
      // an unreadable/corrupt fingerprint is a MISMATCH (forces the
      // rewrite), never an error — the artifact must be self-healing
      val surviving = scala.util.Try {
        fs.exists(fpPath) && {
          val in = fs.open(fpPath)
          val prev = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
          prev == fp
        }
      }.getOrElse(false)
      if (surviving) {
        // one DDL re-registers the surviving layout: external bucketed
        // table over the files the previous JVM wrote (bucket ids are
        // encoded in the file names, so the zero-exchange property is
        // fully recovered from disk + catalog metadata)
        spark.sql(
          s"""CREATE TABLE $table (${select.schema.toDDL})
             |USING parquet
             |CLUSTERED BY ($key) SORTED BY ($key) INTO $NumBuckets BUCKETS
             |LOCATION '${loc.toString}'""".stripMargin)
        provisioned.put(skey, "files")
      } else {
        if (fs.exists(loc)) fs.delete(loc, true)
        select.write
          .option("path", loc.toString) // external: DROP TABLE keeps files
          .bucketBy(NumBuckets, key).sortBy(key)
          .mode("overwrite").saveAsTable(table)
        val out = fs.create(fpPath, true)
        try out.write(fp.getBytes("UTF-8")) finally out.close()
        provisioned.put(skey, "written")
      }
    }

    ensure(li, "lineitem", "l_orderkey",
      Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice"))
    ensure(ord, "orders", "o_orderkey",
      Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"))
    createdLayouts.putIfAbsent(
      (System.identityHashCode(spark), dir),
      Seq(li, ord).map(t => new org.apache.hadoop.fs.Path(warehouse, t).toUri.getPath))
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
