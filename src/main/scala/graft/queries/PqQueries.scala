package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns.{rnd, rndSql}
import graft.sources.Tables

/** Product quantization (PQ) encode — the embedding-compression step
  * of a 100 TB vector store: the 64-dim vector splits into
  * NumBlocks=4 16-dim sub-vectors, each assigned to its nearest
  * sub-codebook centroid by L2, so a vector stores as NumBlocks small
  * codes (here 4×4 bits) instead of 64 floats — a 64x compression
  * with bounded reconstruction error (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI'11 — re-derived
  * on DataFrames).
  *
  * Scale shape: sub-codebooks broadcast; per-block assignment ranks
  * on a skinny (vec_id, blk, cid, dist) frame — embeddings never
  * shuffle; the emitted (vec_id, codes) frame IS the compressed
  * store. Codebooks here are the deterministic vec_id < K sample per
  * block (the q59 pattern) so the oracle replays assignment exactly;
  * production trains each block with KMeansCodebook's machinery.
  */
object PqQueries {

  type Q = (SparkSession, String) => DataFrame

  final val Dim = 64
  final val NumBlocks = 4
  final val BlockDim = Dim / NumBlocks
  final val Codes = 16

  /** Squared L2 distance between two float sub-vectors: strict
    * ascending fold of (a-b)^2 in DOUBLE — mirrored in [[distSql]].
    */
  private def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))),
      lit(0.0),
      (acc, v) => acc + v)

  private def distSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(generate_series(1, $BlockDim), " +
      s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))), " +
      s"(x, y) -> x + y)"

  // ---------------------------------------------------------------
  // q75_pq_encode — every vector's 4 block codes plus its total
  // squared reconstruction error. Output codes joined to one string
  // (pandas gate can't hash arrays).
  // ---------------------------------------------------------------
  def q75(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // (blk, sub) per vector
    val blkArr = array((0 until NumBlocks).map { b =>
      struct(lit(b).as("blk"),
        slice(col("embedding"), b * BlockDim + 1, BlockDim).as("sub"))
    }: _*)
    val sub = v.select(col("vec_id"), explode(blkArr).as("e"))
      .select(col("vec_id"), col("e.blk").as("blk"), col("e.sub").as("sub"))
    // sub-codebooks: the first Codes vectors' blocks
    val cents = sub.where(col("vec_id") < Codes)
      .select(col("blk").as("c_blk"), col("vec_id").cast("int").as("cid"),
        col("sub").as("c_sub"))
    val w = Window.partitionBy(col("vec_id"), col("blk"))
      .orderBy(col("d2").asc, col("cid").asc)
    val assigned = sub.join(broadcast(cents), col("blk") === col("c_blk"))
      .select(col("vec_id"), col("blk"), col("cid"),
        dist2(col("sub"), col("c_sub")).as("d2"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
    // collect per-block rows, sort by blk, then fold the error in that
    // pinned order — a plain SUM's merge order is nondeterministic in
    // doubles, which would break oracle bit-parity
    assigned.groupBy(col("vec_id"))
      .agg(array_sort(collect_list(
        struct(col("blk"), col("cid"), col("d2")))).as("arr"))
      .select(col("vec_id"),
        array_join(col("arr").getField("cid").cast("array<string>"), "_")
          .as("codes"),
        rnd(aggregate(col("arr"), lit(0.0), (acc, s) => acc + s.getField("d2")), 4)
          .as("recon_err"))
      .orderBy(col("vec_id"))
  }

  val q75Sql: String =
    s"""WITH sub AS (
       |  SELECT vec_id, blk,
       |    (embedding)[blk * $BlockDim + 1 : blk * $BlockDim + $BlockDim] AS sub
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${NumBlocks - 1})) AS blk) b),
       |cents AS (
       |  SELECT blk AS c_blk, CAST(vec_id AS INT) AS cid, sub AS c_sub
       |  FROM sub WHERE vec_id < $Codes),
       |assigned AS (
       |  SELECT vec_id, blk, cid, d2 FROM (
       |    SELECT s.vec_id, s.blk, c.cid, ${distSql("s.sub", "c.c_sub")} AS d2,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.blk
       |        ORDER BY ${distSql("s.sub", "c.c_sub")} ASC, c.cid ASC) AS rk
       |    FROM sub s JOIN cents c ON s.blk = c.c_blk) WHERE rk = 1)
       |SELECT vec_id,
       |  array_to_string(list(cid ORDER BY blk), '_') AS codes,
       |  ${rndSql("list_reduce(list_prepend(0.0::DOUBLE, list(d2 ORDER BY blk)), (x, y) -> x + y)", 4)} AS recon_err
       |FROM assigned GROUP BY vec_id ORDER BY vec_id""".stripMargin

  def queries: Map[String, Q] = Map("q75_pq_encode" -> (q75 _))

  def oracles: Map[String, String] = Map("q75_pq_encode" -> q75Sql)
}
