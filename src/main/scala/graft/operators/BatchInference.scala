package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Distributed batched model inference — the Spark-native form of the
  * reference's SCALAR_ITER pandas UDF (predict_batch_udf,
  * radiography_analysis.py:307-326): the model is loaded ONCE per
  * partition, inputs stream through in fixed-size batches, and
  * predictions stream back. That load-once/batch-apply shape is the
  * capability; the model itself is pluggable (any JVM-loadable
  * scoring function — the TF dependency is deliberately dropped,
  * SURVEY.md §7.3 D12).
  *
  * Scale: pure mapPartitions — no shuffle, no driver involvement;
  * executor memory holds one model + one batch at a time.
  */
object BatchInference {

  /** Apply `loadModel`'s batch scorer to `inputCol` (binary),
    * appending `prediction: Array[Float]`. `loadModel` runs once per
    * partition; inputs are scored `batchSize` rows at a time.
    */
  def inferBinary(df: DataFrame, inputCol: String, batchSize: Int)(
    loadModel: () => Array[Array[Byte]] => Array[Array[Float]]): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("prediction", ArrayType(FloatType, containsNull = false)))
    val idx = df.schema.fieldIndex(inputCol)
    val rdd = df.rdd.mapPartitions { it =>
      val model = loadModel() // once per partition
      it.grouped(batchSize).flatMap { batch =>
        val preds = model(batch.map(_.getAs[Array[Byte]](idx)).toArray)
        batch.iterator.zip(preds.iterator).map { case (row, p) =>
          Row.fromSeq(row.toSeq :+ p.toSeq)
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** A deterministic stand-in scorer (the real DenseNet is a
    * driver-side Keras artifact in the reference, out of JVM scope):
    * 4 pseudo-logits from byte statistics, normalized to sum 1.
    */
  def stubModel(): Array[Array[Byte]] => Array[Array[Float]] =
    (batch: Array[Array[Byte]]) => batch.map { bytes =>
      var s1 = 0L; var s2 = 0L; var mn = 255; var mx = 0
      bytes.foreach { b =>
        val v = b & 0xff
        s1 += v; s2 += v.toLong * v
        if (v < mn) mn = v
        if (v > mx) mx = v
      }
      val n = math.max(bytes.length, 1)
      val raw = Array(mn + 1f, mx + 1f, s1.toFloat / n + 1f,
        (s2.toFloat / n) / 256f + 1f)
      val tot = raw.sum
      raw.map(_ / tot)
    }
}
