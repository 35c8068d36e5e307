package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared-operator inventory (one entry per
  * implemented operator family from SURVEY.md §2 plus the
  * LLM-pipeline additions); `oracleSql` carries the DuckDB-equivalent
  * SQL for every hash-checkable query. Column names are aligned
  * between the two on purpose — the driver sorts columns by name
  * before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Similarity.queries ++ EventsOps.queries ++ StreamingQueries.queries ++
      Advanced.queries ++ MultimodalQueries.queries ++ SketchQueries.queries ++
      Extended.queries ++ Bucketed.queries ++ BinaryFiles.queries ++ AnnTrained.queries ++ PqQueries.queries ++
      Reshape.queries ++ RangeJoin.queries ++ Layout.queries ++ // q85 rides in PqQueries.queries
      JobCores.queries ++ PipelineOps.queries ++ CorpusOps.queries ++
      GraphOps.queries ++ Retrieval.queries ++ CurationOps.queries ++
      SkewQueries.queries ++ TemporalOps.queries ++ AnalyzeOps.queries ++
      TimeTravel.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ EventsOps.oracles ++ StreamingQueries.oracles ++
      Advanced.oracles ++ MultimodalQueries.oracles ++ SketchQueries.oracles ++
      Extended.oracles ++ Bucketed.oracles ++ BinaryFiles.oracles ++ AnnTrained.oracles ++ PqQueries.oracles ++
      Reshape.oracles ++ RangeJoin.oracles ++ Layout.oracles ++
      JobCores.oracles ++ PipelineOps.oracles ++ CorpusOps.oracles ++
      GraphOps.oracles ++ Retrieval.oracles ++ CurationOps.oracles ++
      SkewQueries.oracles ++ TemporalOps.oracles ++ AnalyzeOps.oracles ++
      TimeTravel.oracles
}
