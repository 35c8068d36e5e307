package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {

  private lazy val media = Multimodal.mediaTable(spark, Sf)

  test("media table schema: binary payload + typed metadata struct") {
    val f = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(f("payload") == "binary")
    assert(f("meta") == "struct")
    assert(media.select("meta.kind").distinct().count() == 3)
  }

  test("metadata query prunes the payload from the scan") {
    val plan = media.groupBy(col("meta.kind")).count()
      .queryExecution.executedPlan.toString
    // ReadSchema must not include text (the payload source column)
    val readSchema = plan.split('\n').find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), s"payload not pruned: $readSchema")
  }

  test("extractFeatures: batched stub decode with stable values") {
    val rows = Multimodal.extractFeatures(media, batchSize = 32)
      .orderBy("doc_id").limit(5).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val feats = r.getAs[scala.collection.Seq[Float]]("features")
      assert(feats.length == Multimodal.FeatureDim)
      // feature 0 = payload length = n_chars of the doc text
      assert(feats(0) > 0)
    }
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, batchSize = 7)
      .orderBy("doc_id").limit(5).collect()
    assert(rows.map(_.getAs[scala.collection.Seq[Float]]("features")).toSeq ==
      again.map(_.getAs[scala.collection.Seq[Float]]("features")).toSeq)
  }

  test("sampleFrames halves the frame count with stride 2") {
    val before = media.select(col("doc_id"),
      ceil(length(col("payload")).cast("double") / 16).cast("int").as("nf"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sampled = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
      .select(col("doc_id"), length(col("payload")).as("len"), col("meta.n_frames"))
      .collect()
    sampled.foreach { r =>
      val nf = before(r.getLong(0))
      val kept = r.getAs[Int]("n_frames")
      // every 2nd frame of the ORIGINAL payload: ceil(nf / 2)
      assert(kept == (nf + 1) / 2, s"doc ${r.getLong(0)}: $kept of $nf")
      // and the sampled payload holds exactly those frames' bytes
      assert(r.getAs[Int]("len") <= kept * 16 && r.getAs[Int]("len") > (kept - 1) * 16)
    }
  }
}
