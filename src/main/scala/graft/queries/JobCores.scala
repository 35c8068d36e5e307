package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFns.{rnd, rndSql}
import graft.jobs.{CasesTimeAnalysis, ClinicalAnalysis}
import graft.sources.Tables

/** The four reference jobs' RELATIONAL CORES as oracled queries — the
  * CSV-regime operator chains (SURVEY §2: P2/P3/P5, F3/F5, C5/C6,
  * D1–D3, A3/A4) previously covered only by job specs. Each query
  * builds a deterministic "job-shaped" all-string frame from the
  * driver corpus (events → cases-time shape, customer → clinical
  * shape) and pushes it through the REAL job functions
  * (CasesTimeAnalysis.transform, ClinicalAnalysis.missingValues /
  * valueDistribution / ageRelations / testResultDistribution), so the
  * green oracle row certifies the job code path itself, not a
  * lookalike.
  *
  * Output columns are re-aliased to snake_case: the job frames carry
  * the reference's header names (`SARS-Cov-2 exam result`,
  * `sum(confirmed)`), which are part of the job contract but not
  * parquet-friendly for the gate's output files.
  */
object JobCores {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------
  // cases-time shape: events → the reference's daily-cases header
  // (cases_time_analysis.py:86-119 regime — all-string columns with
  // nulls to exercise the fill/cast chain, and a 'Mainland China'
  // slice for the C1 rename).
  // ---------------------------------------------------------------
  private def casesShaped(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      date_format(col("ts"), "yyyy-MM-dd").as("ObservationDate"),
      when(col("user_id") % 5 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("S"), (col("user_id") % 3).cast("string")))
        .as("Province/State"),
      when(col("user_id") % 40 === 7, lit("Mainland China"))
        .otherwise(concat(lit("C"), (col("user_id") % 40).cast("string")))
        .as("Country/Region"),
      date_format(col("ts"), "yyyy-MM-dd").as("Last Update"),
      when(col("event_id") % 17 === 0, lit(null).cast("string"))
        .otherwise((col("event_id") % 1000).cast("string")).as("Confirmed"),
      when(col("event_id") % 19 === 0, lit(null).cast("string"))
        .otherwise((col("event_id") % 97).cast("string")).as("Deaths"),
      when(col("event_id") % 23 === 0, lit(null).cast("string"))
        .otherwise((col("event_id") % 53).cast("string")).as("Recovered"))

  /** The shared oracle CTE rebuilding [[casesShaped]] +
    * CasesTimeAnalysis.transform in DuckDB (fill '0' → int cast →
    * derived active → China rename).
    */
  private val casesNormCte: String =
    """raw AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS d,
      |    CASE WHEN user_id % 40 = 7 THEN 'Mainland China'
      |         ELSE 'C' || (user_id % 40)::VARCHAR END AS country,
      |    CASE WHEN event_id % 17 = 0 THEN NULL
      |         ELSE (event_id % 1000)::VARCHAR END AS confirmed_s,
      |    CASE WHEN event_id % 19 = 0 THEN NULL
      |         ELSE (event_id % 97)::VARCHAR END AS deaths_s,
      |    CASE WHEN event_id % 23 = 0 THEN NULL
      |         ELSE (event_id % 53)::VARCHAR END AS recovered_s
      |  FROM events),
      |norm AS (
      |  SELECT d, replace(country, 'Mainland China', 'China') AS country,
      |    COALESCE(confirmed_s, '0')::INT AS confirmed,
      |    COALESCE(deaths_s, '0')::INT AS deaths,
      |    COALESCE(recovered_s, '0')::INT AS recovered,
      |    COALESCE(confirmed_s, '0')::INT - COALESCE(deaths_s, '0')::INT
      |      - COALESCE(recovered_s, '0')::INT AS active
      |  FROM raw)""".stripMargin

  // ---------------------------------------------------------------
  // q94_job_mortality_topk — CasesTime's mortality-rate core
  // (cases_time_analysis.py:175-189): transform chain → latest
  // snapshot per country (W1+F4) → 4-column sum (A1 auto names) →
  // rate → top-10 → re-sort ascending (O3). Two gate-determinism
  // concessions, both documented: floor-rounding rnd() replaces
  // round() (cross-engine half-case parity) and (rate, country) is
  // the pinned sort key (top-k at equal rates is otherwise
  // tie-arbitrary between engines).
  // ---------------------------------------------------------------
  def q94(spark: SparkSession, dir: String): DataFrame = {
    val df = CasesTimeAnalysis.transform(casesShaped(spark, dir))
    val w = Window.partitionBy("country")
    val latest = df.withColumn("maxDate", max("date").over(w))
      .where(col("date") === col("maxDate"))
    latest.groupBy("country")
      .sum("confirmed", "deaths", "recovered", "active")
      .where(col("sum(confirmed)") > 0)
      .withColumn("mortality_rate",
        rnd(col("sum(deaths)").cast("double")
          / col("sum(confirmed)").cast("double") * 100, 2))
      .orderBy(desc("mortality_rate"), asc("country")).limit(10)
      .orderBy(asc("mortality_rate"), asc("country"))
      .select(col("country"),
        col("sum(confirmed)").as("sum_confirmed"),
        col("sum(deaths)").as("sum_deaths"),
        col("sum(recovered)").as("sum_recovered"),
        col("sum(active)").as("sum_active"),
        col("mortality_rate"))
  }

  val q94Sql: String =
    s"""WITH $casesNormCte,
       |latest AS (
       |  SELECT * FROM (
       |    SELECT *, MAX(d) OVER (PARTITION BY country) AS maxd FROM norm)
       |  WHERE d = maxd),
       |agg AS (
       |  SELECT country, SUM(confirmed) AS sum_confirmed,
       |    SUM(deaths) AS sum_deaths, SUM(recovered) AS sum_recovered,
       |    SUM(active) AS sum_active
       |  FROM latest GROUP BY country),
       |rated AS (
       |  SELECT *,
       |    ${rndSql("sum_deaths::DOUBLE / sum_confirmed::DOUBLE * 100", 2)}
       |      AS mortality_rate
       |  FROM agg WHERE sum_confirmed > 0),
       |top AS (
       |  SELECT * FROM rated ORDER BY mortality_rate DESC, country LIMIT 10)
       |SELECT country, sum_confirmed, sum_deaths, sum_recovered, sum_active,
       |  mortality_rate
       |FROM top ORDER BY mortality_rate ASC, country""".stripMargin

  // ---------------------------------------------------------------
  // clinical shape: customer → the reference's wide all-string
  // lab-results regime (cases_clinical_spectrum_analysis.py:74-82):
  // NULLs, 'nan' strings, categorical markers, plus two sparse
  // columns for the P5 drop.
  // ---------------------------------------------------------------
  private def clinicalShaped(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey").cast("string").as("Patient ID"),
      when(col("c_custkey") % 13 === 0, lit(null).cast("string"))
        .when(col("c_custkey") % 7 === 0, lit("nan"))
        .when(col("c_custkey") % 7 <= 2, lit("positive"))
        .otherwise(lit("negative")).as("SARS-Cov-2 exam result"),
      (col("c_custkey") % 20).cast("string").as("Patient age quantile"),
      when(col("c_custkey") % 11 === 0, lit("nan"))
        .when(col("c_custkey") % 17 === 0, lit(null).cast("string"))
        .otherwise((col("c_custkey") % 160).cast("string")).as("Hemoglobin"),
      when(col("c_custkey") % 9 === 0, lit("nan"))
        .otherwise(col("c_nationkey").cast("string")).as("Leukocytes"),
      when(col("c_custkey") % 3 === 0, lit("detected"))
        .when(col("c_custkey") % 3 === 1, lit("not_detected"))
        .otherwise(lit("nan")).as("Mycoplasma pneumoniae"),
      when(col("c_custkey") % 10 === 0, (col("c_custkey") % 50).cast("string"))
        .otherwise(lit(null).cast("string")).as("D-Dimer"))

  /** DuckDB twin of [[clinicalShaped]] (ClinicalAnalysis.transform is
    * the identity here — every column is already a string).
    */
  private val clinicalCte: String =
    """shaped AS (
      |  SELECT c_custkey::VARCHAR AS patient_id,
      |    CASE WHEN c_custkey % 13 = 0 THEN NULL
      |         WHEN c_custkey % 7 = 0 THEN 'nan'
      |         WHEN c_custkey % 7 <= 2 THEN 'positive'
      |         ELSE 'negative' END AS exam_result,
      |    (c_custkey % 20)::VARCHAR AS age_quantile,
      |    CASE WHEN c_custkey % 11 = 0 THEN 'nan'
      |         WHEN c_custkey % 17 = 0 THEN NULL
      |         ELSE (c_custkey % 160)::VARCHAR END AS hemoglobin,
      |    CASE WHEN c_custkey % 9 = 0 THEN 'nan'
      |         ELSE c_nationkey::VARCHAR END AS leukocytes,
      |    CASE WHEN c_custkey % 3 = 0 THEN 'detected'
      |         WHEN c_custkey % 3 = 1 THEN 'not_detected'
      |         ELSE 'nan' END AS mycoplasma,
      |    CASE WHEN c_custkey % 10 = 0 THEN (c_custkey % 50)::VARCHAR
      |         ELSE NULL END AS d_dimer
      |  FROM customer)""".stripMargin

  /** The C6 remap as a SQL expression over an already-'0'-filled
    * column (the reference's na.replace map, :243-264).
    */
  private def remapSql(c: String): String =
    s"""CASE COALESCE($c, '0') WHEN 'nan' THEN '0' WHEN 'detected' THEN '1'
       | WHEN 'not_detected' THEN '0' WHEN 'present' THEN '1'
       | WHEN 'absent' THEN '0' WHEN 'positive' THEN '1'
       | WHEN 'negative' THEN '0' ELSE COALESCE($c, '0') END""".stripMargin

  // ---------------------------------------------------------------
  // q95_job_missing_profile — ClinicalAnalysis.missingValues (A4):
  // the per-column NULL-or-'nan' profile over the all-string frame.
  // One row; every count replayed by the oracle.
  // ---------------------------------------------------------------
  def q95(spark: SparkSession, dir: String): DataFrame =
    ClinicalAnalysis.missingValues(
      ClinicalAnalysis.transform(clinicalShaped(spark, dir)))
      .select(col("Patient ID").as("patient_id"),
        col("SARS-Cov-2 exam result").as("exam_result"),
        col("Patient age quantile").as("age_quantile"),
        col("Hemoglobin").as("hemoglobin"),
        col("Leukocytes").as("leukocytes"),
        col("Mycoplasma pneumoniae").as("mycoplasma"),
        col("D-Dimer").as("d_dimer"))

  val q95Sql: String = {
    def cnt(c: String) =
      s"COUNT(CASE WHEN $c IS NULL OR $c = 'nan' THEN 1 END) AS $c"
    s"""WITH $clinicalCte
       |SELECT ${cnt("patient_id")}, ${cnt("exam_result")},
       |  ${cnt("age_quantile")}, ${cnt("hemoglobin")}, ${cnt("leukocytes")},
       |  ${cnt("mycoplasma")}, ${cnt("d_dimer")}
       |FROM shaped""".stripMargin
  }

  // ---------------------------------------------------------------
  // q96_job_value_distribution — ClinicalAnalysis.valueDistribution
  // (P5 sparse-column drop + C5 type-directed fill + C6 categorical
  // remap), aggregated per remapped exam result so the gate output
  // stays small while every remap decision feeds a checked number.
  // ---------------------------------------------------------------
  def q96(spark: SparkSession, dir: String): DataFrame =
    ClinicalAnalysis.valueDistribution(
      ClinicalAnalysis.transform(clinicalShaped(spark, dir)))
      .groupBy(col("SARS-Cov-2 exam result").as("exam_result"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("Hemoglobin")).as("n_hemoglobin"),
        sum(col("Patient age quantile").cast("int")).as("sum_age"),
        sum(col("Leukocytes").cast("int")).as("sum_leukocytes"))
      .orderBy(col("exam_result"))

  val q96Sql: String =
    s"""WITH $clinicalCte,
       |remapped AS (
       |  SELECT ${remapSql("exam_result")} AS exam_result,
       |    ${remapSql("hemoglobin")} AS hemoglobin,
       |    ${remapSql("age_quantile")} AS age_quantile,
       |    ${remapSql("leukocytes")} AS leukocytes
       |  FROM shaped)
       |SELECT exam_result, COUNT(*) AS n,
       |  COUNT(DISTINCT hemoglobin) AS n_hemoglobin,
       |  SUM(age_quantile::INT) AS sum_age,
       |  SUM(leukocytes::INT) AS sum_leukocytes
       |FROM remapped GROUP BY exam_result ORDER BY exam_result""".stripMargin

  // ---------------------------------------------------------------
  // q97_job_age_relations — ClinicalAnalysis.ageRelations (D1: the
  // positive/negative indicator when-chains over the RAW string
  // result) + aggregateAgeResult's max/avg shape (A3), grouped to a
  // bounded output. avg(int) is exact on both engines (integer sum,
  // one double division).
  // ---------------------------------------------------------------
  def q97(spark: SparkSession, dir: String): DataFrame =
    ClinicalAnalysis.ageRelations(
      ClinicalAnalysis.transform(clinicalShaped(spark, dir)))
      .groupBy(col("result"), col("positive"), col("negative"))
      .agg(count(lit(1)).as("n"), max(col("age")).as("max_age"),
        avg(col("age")).as("avg_age"))
      .orderBy(col("result"))

  val q97Sql: String =
    s"""WITH $clinicalCte
       |SELECT exam_result AS result,
       |  CASE WHEN exam_result = 'positive' THEN '1' ELSE '0' END AS positive,
       |  CASE WHEN exam_result = 'negative' THEN '1' ELSE '0' END AS negative,
       |  COUNT(*) AS n, MAX(age_quantile::INT) AS max_age,
       |  AVG(age_quantile::INT) AS avg_age
       |FROM shaped GROUP BY 1, 2, 3 ORDER BY result""".stripMargin

  // ---------------------------------------------------------------
  // q98_job_test_result_dist — ClinicalAnalysis.testResultDistribution
  // (the D3 string-vs-int quirk preserved from the reference: every
  // non-null row labels 'Positive test result').
  // ---------------------------------------------------------------
  def q98(spark: SparkSession, dir: String): DataFrame =
    ClinicalAnalysis.testResultDistribution(
      ClinicalAnalysis.transform(clinicalShaped(spark, dir)))
      .select(col("result"), col("count").as("n"))
      .orderBy(col("result"))

  val q98Sql: String =
    s"""WITH $clinicalCte
       |SELECT CASE WHEN exam_result IS NOT NULL THEN 'Positive test result'
       |            ELSE 'Negative test result' END AS result,
       |  COUNT(*) AS n
       |FROM shaped GROUP BY 1 ORDER BY result""".stripMargin

  def queries: Map[String, Q] = Map(
    "q94_job_mortality_topk" -> (q94 _),
    "q95_job_missing_profile" -> (q95 _),
    "q96_job_value_distribution" -> (q96 _),
    "q97_job_age_relations" -> (q97 _),
    "q98_job_test_result_dist" -> (q98 _))

  def oracles: Map[String, String] = Map(
    "q94_job_mortality_topk" -> q94Sql,
    "q95_job_missing_profile" -> q95Sql,
    "q96_job_value_distribution" -> q96Sql,
    "q97_job_age_relations" -> q97Sql,
    "q98_job_test_result_dist" -> q98Sql)
}
