package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns.{hash60Sql, rnd, rndSql}
import graft.multimodal.Multimodal

/** Multimodal-column queries. Both are DuckDB-oracled: the metadata
  * derivation (q46) and the decode stub's feature math (q47) are
  * md5/byte-deterministic, so the oracle mirrors them exactly —
  * including q47's FLOAT-precision division (the kernel computes
  * `s1.toFloat / n`; the SQL twin does the same division in FLOAT).
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------
  // q46_multimodal_meta — per-kind metadata rollup. Only doc_id and
  // the meta struct leave the scan (payload pruned away — the
  // property that makes metadata queries cheap at 100 TB).
  // ---------------------------------------------------------------
  def q46(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaTable(spark, dir)
      .groupBy(col("meta.kind").as("kind"))
      .agg(count(lit(1)).as("n"),
        min(col("meta.width")).as("min_w"), max(col("meta.width")).as("max_w"),
        rnd(sum(col("meta.n_frames")).cast("double") / count(lit(1)), 4)
          .as("avg_frames"),
        sum(length(col("payload"))).as("total_bytes"))
      .orderBy(col("kind"))

  val q46Sql: String = {
    val h = hash60Sql("doc_id::VARCHAR")
    s"""SELECT kind, COUNT(*) AS n, MIN(width) AS min_w, MAX(width) AS max_w,
       |  ${rndSql("SUM(n_frames)::DOUBLE / COUNT(*)", 4)} AS avg_frames,
       |  CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
       |FROM (SELECT
       |        CASE ($h) % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |                      ELSE 'video' END AS kind,
       |        64 + ($h) % 192 AS width,
       |        1 + ($h) % 30 AS n_frames,
       |        text
       |      FROM documents)
       |GROUP BY kind ORDER BY kind""".stripMargin
  }

  // ---------------------------------------------------------------
  // q47_multimodal_features — the batched stub-decode pipeline. The
  // stub's features[2] is `s1.toFloat / max(len,1)` over the payload
  // bytes (Multimodal.decodeStub); ASCII corpus ⇒ codepoints == bytes,
  // so the oracle recomputes s1 from the text and repeats the division
  // in FLOAT to stay bit-identical before the 4 dp rounding.
  // ---------------------------------------------------------------
  def q47(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
      .select(col("doc_id"), col("meta.kind").as("kind"),
        size(col("features")).as("n_features"),
        rnd(element_at(col("features"), 2).cast("double"), 4).as("mean_byte"))
      .orderBy(col("doc_id"))

  val q47Sql: String = {
    val h = hash60Sql("doc_id::VARCHAR")
    val s1 = "list_reduce(list_prepend(0::BIGINT, " +
      "list_transform(generate_series(1, length(text)), i -> ord(substr(text, i, 1)))), " +
      "(a, b) -> a + b)"
    val meanByte = "CAST(s1::FLOAT / GREATEST(n, 1)::FLOAT AS DOUBLE)"
    s"""SELECT doc_id, kind, 8 AS n_features,
       |  ${rndSql(meanByte, 4)} AS mean_byte
       |FROM (SELECT doc_id,
       |        CASE ($h) % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |                      ELSE 'video' END AS kind,
       |        strlen(text) AS n, $s1 AS s1
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  def queries: Map[String, Q] = Map(
    "q46_multimodal_meta" -> (q46 _),
    "q47_multimodal_features" -> (q47 _))

  def oracles: Map[String, String] = Map(
    "q46_multimodal_meta" -> q46Sql,
    "q47_multimodal_features" -> q47Sql)
}
