package graft

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` for named queries to files — the
  * plans/r16 before/after evidence. Usage:
  *   sbt "runMain graft.PlanDump /root/testdata/sf0.1 plans/r16 _before q52_ngram_jaccard,q175_hll_growth"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, list) = args
    val spark = GraftSession.local("graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    list.split(",").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"$name$suffix.txt"), plan)
      println(s"[plandump] wrote $outDir/$name$suffix.txt")
    }
    spark.stop()
  }
}
