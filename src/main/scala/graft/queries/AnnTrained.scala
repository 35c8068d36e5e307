package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns.{rnd, rndSql}
import graft.functions.VecFns
import graft.operators.KMeansCodebook
import graft.sources.Tables

/** IVF ANN over a TRAINED coarse quantizer — q59's shape with the
  * deterministic-sample codebook replaced by k-means centroids
  * (KMeansCodebook: fixed init, fixed iterations, fixed-point
  * updates, so the DuckDB oracle replays the training bit-for-bit by
  * unrolling the iterations as CTEs). Data-following cells tighten
  * recall at the same nprobe versus the untrained sample quantizer —
  * AnnSpec measures exactly that against the q36 brute-force truth.
  */
object AnnTrained {

  type Q = (SparkSession, String) => DataFrame

  final val Cells = 16
  final val Iters = 2
  final val Probe = 2
  final val Dim = 64

  private val QueryFilter = "vec_id % 50 = 0"

  def q70(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VecFns.normK(col("embedding")).as("nrm"))
    val cents =
      KMeansCodebook.centsFrame(spark,
        KMeansCodebook.trained(spark, dir, Cells, Iters))
    val assign = KMeansCodebook.assignCells(v, cents)
    // probes search their nprobe nearest trained cells
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_c").desc, col("cid").asc)
    val probeCells = v.filter(expr(QueryFilter)).join(broadcast(cents))
      .select(col("vec_id").as("query_id"), col("cid"),
        (VecFns.dotCol(col("embedding"), col("e_c")) / (col("nrm") * col("n_c")))
          .as("cos_c"))
      .withColumn("rk", row_number().over(wProbe))
      .where(col("rk") <= Probe)
      .select(col("query_id"), col("cid").as("cell"))
    val q = v.filter(expr(QueryFilter))
      .select(col("vec_id").as("query_id"), col("embedding").as("e_q"),
        col("nrm").as("n_q"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    assign.join(broadcast(probeCells), "cell")
      .where(col("vec_id") =!= col("query_id"))
      .join(v, "vec_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("cell"), col("vec_id"),
        rnd(VecFns.dotCol(col("embedding"), col("e_q")) / (col("nrm") * col("n_q")), 4)
          .as("cosine"))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= 3)
      .orderBy(col("query_id"), col("rank"))
  }

  val q70Sql: String = {
    def cosC(e: String, n: String) =
      s"${VecFns.dotSql(e, "c.e_c")} / ($n * c.n_c)"
    val cents = s"cents$Iters"
    s"""WITH v AS (SELECT vec_id, embedding,
       |  ${VecFns.normSql("embedding")} AS nrm FROM embeddings),
       |${KMeansCodebook.centsSql(Cells, Iters, Dim)},
       |assign AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT v.vec_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${cosC("v.embedding", "v.nrm")} DESC, c.cid ASC) AS rk
       |    FROM v CROSS JOIN $cents c) WHERE rk = 1
       |),
       |probe AS (
       |  SELECT query_id, cid AS cell FROM (
       |    SELECT v.vec_id AS query_id, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${cosC("v.embedding", "v.nrm")} DESC, c.cid ASC) AS rk
       |    FROM v CROSS JOIN $cents c WHERE $QueryFilter) WHERE rk <= $Probe
       |),
       |q AS (SELECT vec_id AS query_id, embedding AS e_q, nrm AS n_q
       |      FROM v WHERE $QueryFilter)
       |SELECT query_id, probe.cell AS cell, v.vec_id,
       |  ${rndSql(s"${VecFns.dotSql("v.embedding", "q.e_q")} / (v.nrm * q.n_q)", 4)} AS cosine,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY ${rndSql(s"${VecFns.dotSql("v.embedding", "q.e_q")} / (v.nrm * q.n_q)", 4)} DESC, v.vec_id ASC) AS INT) AS rank
       |FROM assign JOIN probe USING (cell)
       |  JOIN v ON assign.vec_id = v.vec_id
       |  JOIN q USING (query_id)
       |WHERE v.vec_id <> query_id
       |QUALIFY rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }

  def queries: Map[String, Q] = Map("q70_ann_ivf_kmeans" -> (q70 _))

  def oracles: Map[String, String] = Map("q70_ann_ivf_kmeans" -> q70Sql)
}
