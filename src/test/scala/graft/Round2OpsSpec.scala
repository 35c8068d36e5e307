package graft

import org.apache.spark.sql.functions._
import graft.functions.{KmvSketch, TextFns}
import graft.operators.ConnectedComponents
import graft.queries.{Dedup, Similarity, StreamingQueries}

/** Specs for the round-2 operator additions: connected-components
  * clustering, the KMV distinct sketch, SimHash banding, IVF ANN, and
  * the new streaming twins (dedup, stream-stream join).
  */
class Round2OpsSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("ConnectedComponents: labels = min reachable id, converges on chains") {
    import spark.implicits._
    // components: {1,2,3,4} as a chain (worst-case diameter), {10,11},
    // {20} appears only as an isolated self-edge
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (20L, 20L))
      .toDF("src", "dst")
    val got = ConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("q61: every cluster id is the min doc_id of its cluster") {
    val cc = Dedup.q61(spark, Sf).cache()
    val bad = cc.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("mn"), count(lit(1)).as("n"))
      .join(cc.select(col("cluster_id"), col("cluster_size")).distinct(), "cluster_id")
      .filter(col("mn") =!= col("cluster_id") || col("n") =!= col("cluster_size"))
      .count()
    assert(bad == 0)
    cc.unpersist()
  }

  test("KmvSketch: exact below k, within 25% above k, partition-invariant") {
    import spark.implicits._
    val small = (1 to 40).map(i => ("g", TextFns.hashParams.head._1 * i % TextFns.P))
      .toDF("g", "h")
    val exactSmall = small.groupBy("g").agg(KmvSketch.kmvDistinct(col("h")).as("e"))
      .head().getDouble(1)
    assert(exactSmall == 40.0, s"below k the sketch must be exact, got $exactSmall")

    // 5000 distinct md5-derived hashes: estimator within 25% (k=64
    // gives ~12.5% standard error); estimate must not depend on
    // partitioning (merge correctness)
    val big = spark.range(5000)
      .select(lit("g").as("g"),
        (TextFns.hash60(col("id").cast("string")) % TextFns.P).as("h"))
    def est(parts: Int): Double =
      big.repartition(parts).groupBy("g")
        .agg(KmvSketch.kmvDistinct(col("h")).as("e")).head().getDouble(1)
    val e1 = est(1)
    assert(math.abs(e1 - 5000) / 5000 < 0.25, s"estimate $e1 too far from 5000")
    assert(est(16) == e1, "estimate must be independent of partitioning")
  }

  test("simhash60 kernel == declarative simhashN(tokens, 60)") {
    val mismatch = graft.sources.Tables.documents(spark, Sf)
      .select(graft.functions.TextKernels.simhash60Col(col("text")).as("k"),
        TextFns.simhashN(TextFns.tokens(col("text")), 60).as("d"))
      .filter(col("k") =!= col("d"))
      .count()
    assert(mismatch == 0)
  }

  test("q58: SimHash band self-join is a hash join, never a cartesian") {
    val p = plan(Dedup.q58(spark, Sf))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q59: IVF joins broadcast the codebook; no corpus-corpus cartesian") {
    val p = plan(Similarity.q59(spark, Sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "codebook side must broadcast")
    assert(!p.contains("CartesianProduct"),
      "corpus must never cartesian with itself")
  }

  test("CountMinSketch: estimates never undercount and are partition-invariant") {
    import graft.functions.CountMinSketch
    val toks = graft.sources.Tables.documents(spark, Sf)
      .select(explode(TextFns.tokens(col("text"))).as("token"))
      .select(col("token"), (TextFns.hash60(col("token")) % TextFns.P).as("h"))
    def estimates(parts: Int) = {
      val cms = toks.repartition(parts).agg(CountMinSketch.countMin(col("h")).as("cms"))
      toks.groupBy(col("token"), col("h")).agg(count(lit(1)).as("exact_n"))
        .join(broadcast(cms))
        .select(col("token"), col("exact_n"),
          CountMinSketch.estimate(col("cms"), col("h")).as("est"))
    }
    val e = estimates(4).cache()
    // CMS error is one-sided: est >= exact always
    assert(e.filter(col("est") < col("exact_n")).count() == 0)
    // merge correctness: sketch identical under any partitioning
    assert(estimates(1).exceptAll(e).isEmpty)
    e.unpersist()
  }

  test("q64: sampling is deterministic and per-stratum fractions are sane") {
    val r1 = graft.queries.Extended.q64(spark, Sf).collect()
    val r2 = graft.queries.Extended.q64(spark, Sf).collect()
    assert(r1.sameElements(r2), "hash sampling must be reproducible")
    r1.foreach { row =>
      val (total, sampled, rate) =
        (row.getLong(1), row.getLong(2), row.getLong(3))
      assert(sampled <= total)
      // hash-threshold sampling concentrates near rate% (loose bound
      // for small strata)
      val frac = sampled.toDouble / total
      assert(math.abs(frac - rate / 100.0) < 0.35,
        s"stratum ${row.getString(0)}: frac $frac vs rate $rate%")
    }
  }

  test("q64: scan reads only the columns the sample needs (text pruned)") {
    val p = plan(graft.queries.Extended.q64(spark, Sf))
    val readSchema = p.split('\n').find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("lang") && readSchema.contains("doc_id"),
      s"expected lang+doc_id in scan: $readSchema")
    assert(!readSchema.contains("text"), s"text must be pruned: $readSchema")
  }

  test("q62/q65: custom sketch aggregates plan partial+final (ObjectHashAggregate)") {
    val p62 = plan(graft.queries.SketchQueries.q62(spark, Sf))
    assert(p62.contains("ObjectHashAggregate"),
      "KMV TypedImperativeAggregate should use object hash aggregation")
    val p65 = plan(graft.queries.SketchQueries.q65(spark, Sf))
    assert(p65.contains("ObjectHashAggregate"),
      "Count-Min TypedImperativeAggregate should use object hash aggregation")
  }

  test("q60: streaming dedup equals batch DISTINCT") {
    val stream = StreamingQueries.q60(spark, Sf)
    val batch = graft.sources.Tables.events(spark, Sf)
      .filter(col("user_id") <= 300)
      .select(col("user_id"), col("event_type"),
        date_trunc("hour", col("ts")).as("hour_start"))
      .distinct()
    assert(stream.count() == batch.count())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("q63: stream-stream interval join equals the batch join") {
    val stream = StreamingQueries.q63(spark, Sf)
    val ev = graft.sources.Tables.events(spark, Sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    val batch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .join(clicks, expr(
        "user_id = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        floor((unix_micros(col("p_ts")) - unix_micros(col("c_ts"))) / 1000000L)
          .cast("long").as("gap_s"))
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }
}
