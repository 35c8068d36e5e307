package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** As-of join — for each left row, the latest right row with
  * rightTime <= leftTime on the same key. Spark has no built-in; per
  * the preference order (compose > custom Expression > custom
  * Strategy) this is the composition: tag-union both sides, one
  * shuffle+sort per key, carry the most recent right payload forward
  * with last(ignoreNulls) over a running frame, keep left rows.
  *
  * Scale: exactly ONE exchange (hash on the key) and one sort —
  * the same physical work a dedicated SortMergeAsOfJoinExec would do;
  * no range explosion, no per-row probing. Skew follows key
  * cardinality (salt the key if a single entity dominates).
  *
  * Right side must be unique per (key, time) — pre-aggregate with
  * max_by for deterministic results (mirrors DuckDB's ASOF JOIN,
  * whose tie-breaking is otherwise unspecified).
  */
object AsOfJoin {

  /** Both frames must carry `key`; `right`'s time column is cast to
    * `left`'s time type. Returns left rows (inner semantics:
    * unmatched dropped) plus an `asof` struct holding the matched
    * right row.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
    leftTime: String, rightTime: String): DataFrame = {
    val tType = left.schema(leftTime).dataType
    val rightStruct = StructType(right.schema.fields)
    val lTagged = left
      .withColumn("__t", col(leftTime).cast(tType))
      .withColumn("__is_left", lit(1))
      .withColumn("__rp", lit(null).cast(rightStruct))
    val rTagged = right
      .withColumn("__rp", struct(right.columns.toIndexedSeq.map(col): _*))
      .withColumn("__t", col(rightTime).cast(tType))
      .withColumn("__is_left", lit(0))
    // align to the left schema (+tags): right contributes only key/time
    val rAligned = rTagged.select(
      left.columns.toIndexedSeq.map(c =>
        if (c == key) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__t"), col("__is_left"), col("__rp")): _*)
    val unioned = lTagged
      .select(left.columns.toIndexedSeq.map(col) ++
        Seq(col("__t"), col("__is_left"), col("__rp")): _*)
      .union(rAligned)
    // right rows sort before left rows at equal time ⇒ <= semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof", last(col("__rp"), ignoreNulls = true).over(w))
      .where(col("__is_left") === 1 && col("asof").isNotNull)
      .drop("__t", "__is_left", "__rp")
  }
}
