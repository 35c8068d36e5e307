package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Bridge to the `private[sql]` Dataset⇄LogicalPlan converters —
  * needed by custom whole-operator plans (graft.plans.AsOfJoinPlan):
  * the builder takes analyzed child plans from the input frames and
  * lifts the composed custom node back into a DataFrame.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[CDataset[_]].queryExecution.analyzed

  /** Post-execution per-node metric rows for PLANS.md: walks the
    * EXECUTED plan (resolving AQE's final plan, which is private[sql]
    * — hence this bridge) and reports each node's output rows plus
    * every time-ish SQL metric that actually accumulated a value.
    */
  def executedMetrics(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: SparkPlan, depth: Int): Unit = {
      // AQE wraps executed subtrees in QueryStageExec nodes whose
      // `children` is Nil — the subtree hides in `.plan`; unwrap until
      // a real operator surfaces
      var resolved = p
      var unwrapped = true
      while (unwrapped) {
        resolved = resolved match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case q: QueryStageExec => q.plan
          case r: ReusedExchangeExec => r.child
          case other => unwrapped = false; other
        }
      }
      val interesting = resolved.metrics.toSeq
        .filter { case (k, m) =>
          m.value > 0 && (k == "numOutputRows" || k.toLowerCase.contains("time"))
        }
        .sortBy(_._1)
        .map { case (k, m) =>
          val v = m.metricType match {
            case "timing" => s"${m.value} ms"
            case "nsTiming" => f"${m.value / 1e6}%.1f ms"
            case _ => m.value.toString
          }
          s"$k=$v"
        }
      out += ("  " * depth + s"${resolved.nodeName}" +
        (if (interesting.nonEmpty) interesting.mkString(" [", ", ", "]") else ""))
      resolved.children.foreach(walk(_, depth + 1))
    }
    walk(df.asInstanceOf[CDataset[_]].queryExecution.executedPlan, 0)
    out.toSeq
  }

  /** The PINNED RDD behind a localCheckpoint'd frame. `Dataset
    * .unpersist` cannot free a checkpoint — it routes through the
    * CacheManager, which never registered the checkpoint's internal
    * RDD, so the MEMORY_AND_DISK blocks otherwise live until the
    * ContextCleaner happens to GC the orphan. Iterative loops
    * (BPE train, connected components) call this on the frame they
    * are about to replace and unpersist the exact RDD — deterministic
    * and thread-safe (no global persistent-RDD diffing, which could
    * mis-attribute a concurrent session's persist).
    *
    * `LogicalRDD` is `private[sql]`, hence this bridge.
    */
  def checkpointRdd(df: DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.asInstanceOf[CDataset[_]].queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }
}
