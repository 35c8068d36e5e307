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
  /** Per-vector per-block sub-vectors: (vec_id, blk, sub). */
  private def subVectors(spark: SparkSession, dir: String): DataFrame = {
    val blkArr = array((0 until NumBlocks).map { b =>
      struct(lit(b).as("blk"),
        slice(col("embedding"), b * BlockDim + 1, BlockDim).as("sub"))
    }: _*)
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      .select(col("vec_id"), explode(blkArr).as("e"))
      .select(col("vec_id"), col("e.blk").as("blk"), col("e.sub").as("sub"))
  }

  /** Sub-codebooks (c_blk, cid, c_sub): the first Codes vectors' blocks. */
  private def codebooks(sub: DataFrame): DataFrame =
    sub.where(col("vec_id") < Codes)
      .select(col("blk").as("c_blk"), col("vec_id").cast("int").as("cid"),
        col("sub").as("c_sub"))

  /** PQ code assignment: (vec_id, blk, cid, d2) — nearest sub-centroid
    * per block, (d2 ASC, cid ASC) tie-break.
    */
  private def assignments(sub: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("blk"))
      .orderBy(col("d2").asc, col("cid").asc)
    sub.join(broadcast(cents), col("blk") === col("c_blk"))
      .select(col("vec_id"), col("blk"), col("cid"),
        dist2(col("sub"), col("c_sub")).as("d2"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
  }

  def q75(spark: SparkSession, dir: String): DataFrame = {
    val sub = subVectors(spark, dir)
    val assigned = assignments(sub, codebooks(sub))
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

  // ---------------------------------------------------------------
  // q76_pq_adc — asymmetric distance computation over the PQ codes:
  // each probe precomputes a (blk, cid) → distance table against the
  // sub-codebooks (Codes·NumBlocks doubles — broadcast), then every
  // candidate's approximate distance is FOUR TABLE LOOKUPS summed in
  // pinned blk order, never a 64-dim computation. This is why PQ
  // exists at 100 TB: the corpus is scanned as 4-byte codes and the
  // float embeddings are touched only by the probes. Top-3 neighbors
  // per probe by (adc ASC, vec_id ASC).
  // ---------------------------------------------------------------
  private val QueryFilter = "vec_id % 50 = 0"

  def q76(spark: SparkSession, dir: String): DataFrame = {
    val sub = subVectors(spark, dir)
    val cents = codebooks(sub)
    val codes = assignments(sub, cents)
      .select(col("vec_id"), col("blk"), col("cid"))
    // per-probe distance table: (query_id, blk, cid, t)
    val table = sub.where(expr(QueryFilter))
      .join(broadcast(cents), col("blk") === col("c_blk"))
      .select(col("vec_id").as("query_id"), col("blk").as("t_blk"),
        col("cid").as("t_cid"), dist2(col("sub"), col("c_sub")).as("t"))
    val adc = codes.join(broadcast(table),
        col("blk") === col("t_blk") && col("cid") === col("t_cid") &&
          col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(array_sort(collect_list(struct(col("blk"), col("t")))).as("arr"))
      .select(col("query_id"), col("vec_id"),
        aggregate(col("arr"), lit(0.0), (acc, s) => acc + s.getField("t"))
          .as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("vec_id").asc)
    adc.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("query_id"), col("vec_id"), rnd(col("adc"), 4).as("adc"),
        col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  val q76Sql: String =
    s"""WITH sub AS (
       |  SELECT vec_id, blk,
       |    (embedding)[blk * $BlockDim + 1 : blk * $BlockDim + $BlockDim] AS sub
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${NumBlocks - 1})) AS blk) b),
       |cents AS (
       |  SELECT blk AS c_blk, CAST(vec_id AS INT) AS cid, sub AS c_sub
       |  FROM sub WHERE vec_id < $Codes),
       |codes AS (
       |  SELECT vec_id, blk, cid FROM (
       |    SELECT s.vec_id, s.blk, c.cid, ${distSql("s.sub", "c.c_sub")} AS d2,
       |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.blk
       |        ORDER BY ${distSql("s.sub", "c.c_sub")} ASC, c.cid ASC) AS rk
       |    FROM sub s JOIN cents c ON s.blk = c.c_blk) WHERE rk = 1),
       |tbl AS (
       |  SELECT s.vec_id AS query_id, s.blk AS t_blk, c.cid AS t_cid,
       |    ${distSql("s.sub", "c.c_sub")} AS t
       |  FROM sub s JOIN cents c ON s.blk = c.c_blk WHERE $QueryFilter),
       |adc AS (
       |  SELECT query_id, vec_id,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(t ORDER BY blk)), (x, y) -> x + y) AS adc
       |  FROM codes JOIN tbl
       |    ON codes.blk = tbl.t_blk AND codes.cid = tbl.t_cid
       |   AND codes.vec_id <> tbl.query_id
       |  GROUP BY query_id, vec_id)
       |SELECT query_id, vec_id, ${rndSql("adc", 4)} AS adc,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY adc ASC, vec_id ASC) AS INT) AS rank
       |FROM adc QUALIFY rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  def queries: Map[String, Q] = Map(
    "q75_pq_encode" -> (q75 _),
    "q76_pq_adc" -> (q76 _))

  def oracles: Map[String, String] = Map(
    "q75_pq_encode" -> q75Sql,
    "q76_pq_adc" -> q76Sql)
}
