package graft.io

import org.apache.spark.sql.DataFrame

/** Sinks — the L of the ETL jobs (SURVEY.md §2.2). */
object Writers {

  /** K1 — the reference's single-file JSON contract:
    * `coalesce(1).write.json(dir, overwrite)` (cases_time_analysis
    * .py:309-314). coalesce(1) funnels the (small, aggregated) result
    * through one task because the downstream consumer reads exactly
    * one file — a deliberate bottleneck on final outputs only, never
    * on intermediate data (SURVEY.md §7.4 risk 6).
    */
  def singleFileJson(df: DataFrame, dir: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(dir)

  /** K2 — parquet materialization (cases_clinical_spectrum_analysis
    * .py:115-116).
    */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Partitioned JSON — the scale-path variant of K1 for large
    * results: same format, no single-task funnel.
    */
  def partitionedJson(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)
}
