package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line. A tiny untimed warmup pass (flagship query
  * at sf0.001) absorbs JVM/codegen/classloader warmup so per-query
  * timings measure the plans, not the first query's luck.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    // min of two runs per query, taken as two INTERLEAVED full passes
    // over the suite (A..Z, A..Z) rather than back-to-back runs: the
    // first execution of a plan pays one-time janino codegen + JIT,
    // and a transient host-noise window then correlates back-to-back
    // samples — minutes-apart samples decorrelate it. A failed run
    // poisons the query to the -1 sentinel (never folded into the
    // min — an instant abort must read as breakage, not speed) and is
    // excluded from the total.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = (1 to 2).map { _ =>
      ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        // memory-sink tables from streaming queries hold their full
        // result on the driver; drop them once timed so earlier
        // queries' results don't crowd the heap for later ones
        spark.catalog.listTables().collect()
          .filter(t => t.isTemporary && t.name.startsWith("stream_"))
          .foreach(t => spark.catalog.dropTempView(t.name))
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
    }
    val results = ordered.zipWithIndex.map { case ((name, _), i) =>
      val times = samples.map(_(i))
      name -> (if (times.forall(_.isDefined)) times.flatten.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val nFailed = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","failed":$nFailed}""")
    spark.stop()
  }
}
