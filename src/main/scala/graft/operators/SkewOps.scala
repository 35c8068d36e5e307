package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation: salted two-phase aggregation. A heavy-hitter
  * grouping key (5 event types over 100k+ rows here; at 100 TB a
  * handful of keys over billions of rows) concentrates each key's
  * entire partial state in one reducer. Salting splits every key into
  * `salt` sub-keys for the first (wide) aggregation, then combines
  * the sub-aggregates in a second (tiny) one — the second exchange
  * carries keys×salt rows, not data rows.
  *
  * AQE's skew-join handling covers joins; this covers aggregations,
  * where AQE does not re-split a hot grouping key.
  */
object SkewOps {

  /** count + sum(col) per key, salted. The salt derives from a
    * uniform existing column (deterministic — results are identical
    * to the unsalted aggregate, which is what the oracle checks).
    */
  def saltedCountSum(df: DataFrame, key: Column, saltSource: Column,
    valueCol: Column, salt: Int = 16): DataFrame = {
    val partial = df
      .groupBy(key.as("k"), pmod(saltSource, lit(salt)).as("s"))
      .agg(count(lit(1)).as("pn"),
        sum(valueCol.cast("decimal(18,6)")).as("psum"))
    partial
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"),
        sum(col("psum")).cast("double").as("sum_value"))
  }
}
