package graft
object Q90Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("q90probe")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val df = SparkEntry.queries("q90_resize_grid")(spark, dir)
      df.collect()
      val d2 = SparkEntry.queries("q90_resize_grid")(spark, dir)
      val t0 = System.nanoTime(); val n = d2.collect().length
      println(f"[probe] $dir rows=$n warm ${(System.nanoTime()-t0)/1e9}%.2f s parts=${d2.rdd.getNumPartitions}")
    }
    spark.stop()
  }
}
