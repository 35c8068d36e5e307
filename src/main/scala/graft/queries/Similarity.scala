package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFns.{rnd, rndSql}
import graft.functions.VecFns
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table:
  * brute-force cosine top-k as the correctness baseline, and a
  * sign-random-projection LSH-bucketed variant as the scale path.
  *
  * Scale design: the query set is always the small side and is
  * BROADCAST — the corpus never shuffles for the probe join. The LSH
  * variant additionally cuts the scanned candidates per query from n
  * to n/2^planes; at 100 TB the bucket id would also be the parquet
  * partition key, turning each probe into partition-pruned reads.
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic probe set: every 50th vector. */
  private val QueryFilter = "vec_id % 50 = 0"

  // ---------------------------------------------------------------
  // q36_ann_bruteforce — exact cosine top-5 per probe vector.
  // Probe side broadcast; per-vector norms computed once pre-join;
  // ranking via row_number with a unique (cos, vec_id) tiebreak.
  // ---------------------------------------------------------------
  def q36(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VecFns.normK(col("embedding")).as("nrm"))
    val q = v.filter(expr(QueryFilter))
      .select(col("vec_id").as("query_id"), col("embedding").as("e_q"),
        col("nrm").as("n_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        rnd(VecFns.dotCol(col("embedding"), col("e_q")) / (col("nrm") * col("n_q")), 4)
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .orderBy(col("query_id"), col("rank"))
  }

  val q36Sql: String =
    s"""WITH v AS (SELECT vec_id, embedding,
       |  ${VecFns.normSql("embedding")} AS nrm FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS e_q, nrm AS n_q
       |      FROM v WHERE $QueryFilter)
       |SELECT query_id, vec_id,
       |  ${rndSql(s"${VecFns.dotSql("v.embedding", "q.e_q")} / (v.nrm * q.n_q)", 4)} AS cosine,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY ${rndSql(s"${VecFns.dotSql("v.embedding", "q.e_q")} / (v.nrm * q.n_q)", 4)} DESC, vec_id ASC) AS INT) AS rank
       |FROM v JOIN q ON v.vec_id <> q.query_id
       |QUALIFY rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------
  // q37_ann_lsh — LSH-bucketed ANN: 6 sign-projection hyperplanes →
  // 64 buckets; probes only scan their own bucket. Hyperplanes are
  // plan-time literals (VecFns.planes) — zero per-row hash cost.
  // A probe whose bucket has no other member simply yields no rows
  // (the recall/latency trade LSH makes by construction).
  // ---------------------------------------------------------------
  def q37(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VecFns.normK(col("embedding")).as("nrm"),
        VecFns.lshBucket(col("embedding")).as("bucket"))
    val q = v.filter(expr(QueryFilter))
      .select(col("vec_id").as("query_id"), col("embedding").as("e_q"),
        col("nrm").as("n_q"), col("bucket").as("q_bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    v.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("bucket"), col("vec_id"),
        rnd(VecFns.dotCol(col("embedding"), col("e_q")) / (col("nrm") * col("n_q")), 4)
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .orderBy(col("query_id"), col("rank"))
  }

  val q37Sql: String =
    s"""WITH v AS (SELECT vec_id, embedding,
       |  ${VecFns.normSql("embedding")} AS nrm,
       |  ${VecFns.lshBucketSql("embedding")} AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS e_q, nrm AS n_q,
       |        bucket AS q_bucket
       |      FROM v WHERE $QueryFilter)
       |SELECT query_id, v.bucket AS bucket, vec_id,
       |  ${rndSql(s"${VecFns.dotSql("v.embedding", "q.e_q")} / (v.nrm * q.n_q)", 4)} AS cosine,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY ${rndSql(s"${VecFns.dotSql("v.embedding", "q.e_q")} / (v.nrm * q.n_q)", 4)} DESC, vec_id ASC) AS INT) AS rank
       |FROM v JOIN q ON v.bucket = q.q_bucket AND v.vec_id <> q.query_id
       |QUALIFY rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  def queries: Map[String, Q] = Map(
    "q36_ann_bruteforce" -> (q36 _),
    "q37_ann_lsh" -> (q37 _))

  def oracles: Map[String, String] = Map(
    "q36_ann_bruteforce" -> q36Sql,
    "q37_ann_lsh" -> q37Sql)
}
