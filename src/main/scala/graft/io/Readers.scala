package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.StructType

/** Source readers — the E of the reference's ETL jobs (SURVEY.md §2.1).
  * Each mirrors one scan family; schema/option choices are part of the
  * behavioral contract (header inference ⇒ all-string columns, ISO
  * date strings, multiLine JSON, dropInvalid images).
  */
object Readers {

  /** S1 — header CSV, every column StringType (schema inference off,
    * like the reference: spark.read.csv(path, header=True) with no
    * schema ⇒ strings; dates stay ISO strings whose lexicographic
    * order is relied upon downstream).
    */
  def csvAllString(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(path)

  /** JSONL scan — line-delimited JSON (the corpus exchange format
    * Writers.shardedJsonl produces). multiLine stays false (the
    * default) so every line is an independent record and the scan
    * SPLITS: a 100 TB JSONL directory reads at full parallelism,
    * which multiLine JSON structurally cannot. Explicit schema for
    * the same reason as nestedJson — no inference pass.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC scan — columnar twin of the parquet sources; predicate
    * pushdown and column pruning work identically (Catalyst emits
    * PushedFilters/ReadSchema for ORC scans too).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S2 — multi-line JSON with an explicit nested schema, tagged with
    * a source label (research_challenge_analysis.py:39-69). At scale
    * the explicit schema is mandatory: inference would scan the
    * corpus twice, and nested-schema pruning needs declared types.
    */
  def nestedJson(spark: SparkSession, path: String, schema: StructType,
    sourceTag: String): DataFrame =
    spark.read
      .schema(schema)
      .option("multiLine", "true")
      .json(path)
      .withColumn("source", lit(sourceTag))

  /** S3 — the built-in image source with invalid files dropped
    * (radiography_analysis.py:77-88). Listing cost is driver-side; at
    * 100 TB prefer `binaryFile` + a decode expression and keep this
    * for parity (SURVEY.md §7.4 risk 4).
    */
  def images(spark: SparkSession, dir: String, label: Int): DataFrame =
    spark.read
      .format("image")
      .option("dropInvalid", "true")
      .load(dir)
      .withColumn("label", lit(label))

  /** S3 at scale — same contract as [[images]] (image struct +
    * label, invalid files dropped) over the `binaryFile` source + the
    * ImgKernels decode expression (SURVEY.md §7.4 risk 4; reference
    * radiography_analysis.py:71-89). The scan is a plain distributed
    * file scan; decode happens inside the projection, only in plans
    * that use the decoded struct; NULL-decode filter ≡ dropInvalid.
    * The origin is normalised to the image source's
    * `file:///…` URI form so path-string operators (D6 hdfs_origin
    * stripping) behave identically on either reader.
    */
  def imagesBinary(spark: SparkSession, dir: String, label: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, regexp_replace}
    val origin = regexp_replace(col("path"), "^file:/(?=[^/])", "file:///")
    spark.read
      .format("binaryFile")
      .load(dir)
      .select(graft.functions.ImgKernels.decodeImage(origin, col("content"))
        .as("image"))
      .filter(col("image").isNotNull)
      .withColumn("label", lit(label))
  }

  /** S4 — parquet re-read through SQL, preserving the reference's
    * mid-query materialization idiom
    * (cases_clinical_spectrum_analysis.py:115-118).
    */
  def parquetViaSql(spark: SparkSession, path: String): DataFrame =
    spark.sql(s"SELECT * FROM parquet.`$path`")

  /** Schema-evolution read: union the footers of every file under
    * `path` (mergeSchema) so a column added mid-history appears
    * corpus-wide, null before its introduction date. Footer merging
    * is a per-file driver-side cost — that is why it is OFF by
    * default and an explicit reader here, not a session default: a
    * 100 TB table with a frozen schema should never pay it, and one
    * with real evolution pays it once per query against the file
    * listing it already needs. (Production systems amortize via a
    * catalog schema; this is the catalog-less form.)
    */
  def parquetMergeSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
