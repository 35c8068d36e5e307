package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.KMeansCodebook
import graft.queries.{AnnTrained, Similarity}

/** Trained-quantizer ANN: recall versus the brute-force truth must be
  * at least the untrained sample quantizer's, and training must be
  * bit-deterministic (the property the DuckDB oracle depends on).
  */
class AnnSpec extends SparkTestBase {

  private def topSet(df: DataFrame, k: Int): Set[(Long, Long)] =
    df.filter(col("rank") <= k).select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("k-means IVF recall >= sample-codebook IVF recall (vs brute force)") {
    val truth = topSet(Similarity.q36(spark, Sf), 3)
    val sample = topSet(Similarity.q59(spark, Sf), 3)
    val trained = topSet(AnnTrained.q70(spark, Sf), 3)
    val rSample = (truth & sample).size.toDouble / truth.size
    val rTrained = (truth & trained).size.toDouble / truth.size
    assert(rTrained >= rSample,
      s"trained recall $rTrained < sample recall $rSample")
    assert(rTrained > 0.0)
  }

  test("q111 recall harness agrees with the independently computed set intersection") {
    val truth = topSet(Similarity.q36(spark, Sf), Similarity.RecallK)
    val lsh = Similarity.q37(spark, Sf).select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (truth & lsh).size
    val rows = Similarity.q111(spark, Sf).collect()
    assert(rows.map(_.getAs[Long]("lsh_hits")).sum == expected.toLong,
      "q111's per-probe hit counts must sum to the set-intersection size")
    rows.foreach { r =>
      assert(r.getAs[Double]("lsh_recall") >= 0.0 && r.getAs[Double]("lsh_recall") <= 1.0)
      assert(r.getAs[Double]("ivf_recall") >= 0.0 && r.getAs[Double]("ivf_recall") <= 1.0)
    }
  }

  test("IVF-PQ composition: structure sound; coarse stage carries the recall") {
    // On this ISOTROPIC synthetic corpus 4-bit PQ ranking is
    // data-limited (see PqQueries.q85 scaladoc — measured ~0.03, and
    // ≤0.33 across a parameter sweep), so the recall bar belongs to
    // the coarse stage, which scores exactly: q59 must keep real
    // recall. For q85 the spec pins structure: every probe answers
    // with a full, deduplicated top-3 and approximate cosines stay in
    // a cosine's range.
    val truth = topSet(Similarity.q36(spark, Sf), 3)
    val coarse = topSet(Similarity.q59(spark, Sf), 3)
    assert((truth & coarse).size.toDouble / truth.size >= 0.3,
      "coarse IVF stage lost its recall")
    val rows = graft.queries.PqQueries.q85(spark, Sf).collect()
    val queries = truth.map(_._1)
    assert(rows.map(_.getLong(0)).toSet == queries, "every probe must answer")
    queries.foreach { q =>
      val mine = rows.filter(_.getLong(0) == q)
      assert(mine.length == 3, s"probe $q returned ${mine.length} rows")
      assert(mine.map(_.getAs[Long]("vec_id")).distinct.length == 3)
      assert(!mine.map(_.getAs[Long]("vec_id")).contains(q), "self-match leaked")
    }
    rows.foreach(r => assert(math.abs(r.getAs[Double]("acos")) <= 1.5,
      "approximate cosine out of range"))
  }

  test("nprobe knob: probing every cell recovers brute-force exactly") {
    // nprobe == cells ⇒ the candidate set is the whole corpus, so the
    // IVF plan must return exactly the brute-force answer — the
    // recall/cost dial's correctness anchor
    spark.conf.set("spark.graft.ann.ivf.nprobe", Similarity.IvfCells.toString)
    try {
      val all = topSet(Similarity.q59(spark, Sf), 3)
      val truth = topSet(Similarity.q36(spark, Sf), 3)
      assert(all == truth, "full-probe IVF must equal brute force")
    } finally spark.conf.unset("spark.graft.ann.ivf.nprobe")
  }

  test("codebook training is bit-deterministic across runs") {
    val a = KMeansCodebook.train(spark, Sf, AnnTrained.Cells, AnnTrained.Iters)
    val b = KMeansCodebook.train(spark, Sf, AnnTrained.Cells, AnnTrained.Iters)
    assert(a.length == AnnTrained.Cells)
    a.zip(b).foreach { case (ca, cb) =>
      assert(java.util.Arrays.equals(ca, cb), "centroids must be bit-identical")
    }
    // training must actually move the centroids off the init sample
    val init = graft.sources.Tables.embeddings(spark, Sf)
      .filter(col("vec_id") < AnnTrained.Cells).orderBy("vec_id").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    assert(a.zip(init).exists { case (c, i) => !java.util.Arrays.equals(c, i) })
  }

  test("q171 SQ8 quantization matches a plain-Scala recount and the scale/2 error bound") {
    val rows = graft.queries.PqQueries.q171(spark, Sf).collect()
    val vecs = graft.sources.Tables.embeddings(spark, Sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
    val dim = graft.queries.PqQueries.Dim
    // per-dimension symmetric max-abs scale over FLOATS (exact max)
    val maxabs = Array.fill(dim)(0f)
    vecs.foreach { case (_, _, e) =>
      var d = 0
      while (d < dim) { val a = math.abs(e(d)); if (a > maxabs(d)) maxabs(d) = a; d += 1 }
    }
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    // Spark's round() on DoubleType: BigDecimal(shortest repr), HALF_UP
    def sparkRound(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    def rn(x: Double, n: Int): Double = {
      val k = math.pow(10, n); math.floor(x * k + 0.5) / k
    }
    val L = graft.queries.PqQueries.SqLevels.toLong
    case class Acc(var n: Long = 0L, var errFp: Long = 0L,
      var maxErr: Double = 0.0, var sig: Long = 0L)
    val byLabel = scala.collection.mutable.Map.empty[Int, Acc]
    vecs.foreach { case (id, label, e) =>
      val acc = byLabel.getOrElseUpdate(label, Acc())
      var d = 0
      while (d < dim) {
        val xd = e(d).toDouble
        val scale = maxabs(d).toDouble / 127.0
        val code =
          if (maxabs(d) == 0f) 0L
          else math.max(-L, math.min(L, sparkRound(xd / (maxabs(d).toDouble / 127.0))))
        val err = math.abs(xd - code.toDouble * scale)
        // FAISS-style SQ8 invariant: in-range values reconstruct to
        // within half a quantization step of the stored float
        assert(err <= scale / 2.0 + 1e-12, s"dim $d err $err > ${scale / 2}")
        acc.n += 1
        acc.errFp += math.floor(err * 10000000.0 + 0.5).toLong
        if (err > acc.maxErr) acc.maxErr = err
        acc.sig ^= h60(s"$id:$d:$code")
        d += 1
      }
    }
    assert(rows.length == byLabel.size)
    rows.foreach { r =>
      val a = byLabel(r.getAs[Int]("label"))
      assert(r.getAs[Long]("n_vals") == a.n)
      assert(r.getAs[Double]("mean_abs_err") ==
        rn(a.errFp.toDouble / 10000000.0 / a.n.toDouble, 7))
      assert(r.getAs[Double]("max_abs_err") == rn(a.maxErr, 7))
      assert(r.getAs[Long]("code_sig") == a.sig)
    }
  }

  test("q173 random projection matches a plain-Scala recount; JL distortion centered on 1") {
    import graft.queries.PqQueries
    val rows = PqQueries.q173(spark, Sf).collect()
    val vecs = graft.sources.Tables.embeddings(spark, Sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
    val dim = PqQueries.Dim
    val K = PqQueries.RpK
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    // independent sign matrix from the same public md5-parity rule
    val signs = Array.tabulate(K, dim)((k, d) =>
      if (h60(s"$d:$k") % 2 == 0L) 1L else -1L)
    def rn(x: Double, n: Int): Double = {
      val p = math.pow(10, n); math.floor(x * p + 0.5) / p
    }
    case class Acc(var n: Long = 0L, var distFp: Long = 0L,
      var minD: Double = Double.MaxValue, var maxD: Double = Double.MinValue,
      var sig: Long = 0L)
    val byLabel = scala.collection.mutable.Map.empty[Int, Acc]
    var globalDistSum = 0.0
    var globalN = 0L
    vecs.foreach { case (id, label, e) =>
      val xfp = e.map(x => math.floor(x.toDouble * PqQueries.RpFp + 0.5).toLong)
      val yfp = Array.tabulate(K) { k =>
        var s = 0L; var d = 0
        while (d < dim) { s += xfp(d) * signs(k)(d); d += 1 }
        s
      }
      val nx2 = xfp.map(v => v * v).sum
      val ny2 = yfp.map(v => v * v).sum
      if (nx2 > 0L) {
        val dist = (ny2.toDouble / K.toDouble) / nx2.toDouble
        val acc = byLabel.getOrElseUpdate(label, Acc())
        acc.n += 1
        acc.distFp += math.floor(dist * 1000000.0 + 0.5).toLong
        if (dist < acc.minD) acc.minD = dist
        if (dist > acc.maxD) acc.maxD = dist
        acc.sig ^= h60(s"$id:${yfp.mkString(",")}")
        globalDistSum += dist
        globalN += 1
      }
    }
    assert(rows.length == byLabel.size)
    rows.foreach { r =>
      val a = byLabel(r.getAs[Int]("label"))
      assert(r.getAs[Long]("n_vecs") == a.n)
      assert(r.getAs[Double]("mean_dist") ==
        rn(a.distFp.toDouble / 1000000.0 / a.n.toDouble, 6))
      assert(r.getAs[Double]("min_dist") == rn(a.minD, 6))
      assert(r.getAs[Double]("max_dist") == rn(a.maxD, 6))
      assert(r.getAs[Long]("proj_sig") == a.sig)
    }
    // Johnson-Lindenstrauss: E[||y||^2 / (K ||x||^2)] = 1; at K=16
    // the corpus-wide mean over hundreds of vectors is tightly
    // concentrated even though single vectors swing +-3 sigma
    val gMean = globalDistSum / globalN.toDouble
    assert(gMean > 0.7 && gMean < 1.3, s"JL mean distortion off: $gMean")
  }

  test("q182 probe scan prunes to the probed cell directories (PartitionFilters)") {
    val df = AnnTrained.q182(spark, Sf)
    // the partitioned-table scan leaf must carry the probed-cell set
    // as PARTITION filters (directory pruning); identify it among the
    // plan's other scans (probe reads, codebook) by its location
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val scan = scans.find(_.relation.location.rootPaths.exists(
      _.toString.contains("graft_emb_cell_"))).getOrElse(
      fail("no cell-partitioned scan in q182 plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"probed cells must be partition filters, got ${scan.partitionFilters}")
    // PruneFileSourcePartitions already rewrote the scan's location
    // to the PRUNED file index (only the probed-cell directories were
    // even listed), and Catalyst ALSO inserted a DynamicPruningSubquery
    // from the broadcast join on cell — so `selected` is the pruned
    // index's size and `total` must come from the catalog, not the scan
    val selected = scan.relation.location.listFiles(Nil, Nil).size
    val table = AnnTrained.ensureCellPartitionedEmbeddings(spark, Sf)
    val total = spark.sql(s"SHOW PARTITIONS $table").count().toInt
    assert(selected < total,
      s"expected pruning: scanned $selected of $total cell directories")
    // the pruned directory count is exactly the probed-cell union:
    // recompute it independently from the same persisted codebook
    val cents = KMeansCodebook.centsFrame(spark,
      KMeansCodebook.persisted(spark, Sf, AnnTrained.Cells, AnnTrained.Iters))
    val probed = graft.sources.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding"),
        graft.functions.VecFns.normK(col("embedding")).as("nrm"))
      .filter(expr("vec_id % 500 = 0"))
      .join(broadcast(cents))
      .select(col("vec_id").as("query_id"), col("cid"),
        (graft.functions.VecFns.dotCol(col("embedding"), col("e_c"))
          / (col("nrm") * col("n_c"))).as("cos_c"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cos_c").desc, col("cid").asc)))
      .where(col("rk") <= AnnTrained.Probe)
      .select("cid").distinct().count()
    assert(selected.toLong == probed,
      s"scanned $selected directories, probed-cell union is $probed")
    // and the pruned read answers correctly: full top-3 per probe
    val rows = df.collect()
    assert(rows.nonEmpty && rows.groupBy(_.getLong(0)).values
      .forall(_.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 3)))
  }

  test("q187 code-store scan is partition-pruned AND payload-free (no embedding column)") {
    import graft.queries.PqQueries
    val df = PqQueries.q187(spark, Sf)
    val scans = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val scan = scans.find(_.relation.location.rootPaths.exists(
      _.toString.contains("graft_pq_cell_"))).getOrElse(
      fail("no code-store scan in q187 plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"probed cells must be partition filters, got ${scan.partitionFilters}")
    // the claim q85's scaladoc makes: the store read is CODES, never
    // float payloads — the scan's schema must not contain embeddings
    assert(!scan.schema.fieldNames.contains("embedding"),
      s"code-store scan must be payload-free, read ${scan.schema.fieldNames.mkString(",")}")
    val selected = scan.relation.location.listFiles(Nil, Nil).size
    val table = PqQueries.ensurePqCellStore(spark, Sf)
    val total = spark.sql(s"SHOW PARTITIONS $table").count().toInt
    assert(selected < total,
      s"expected pruning: scanned $selected of $total cell directories")
    // packed nibbles decode to the exact PQ assignment: unpack every
    // stored code in plain Scala and compare against q75's oracled
    // codes-string column
    val packed = spark.table(table).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("code")).toMap
    val q75codes = PqQueries.q75(spark, Sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("codes")).toMap
    assert(packed.keySet == q75codes.keySet && packed.nonEmpty)
    packed.foreach { case (vid, code) =>
      val unpacked = (0 until 4).map(b => (code >> (b * 4)) & 15).mkString("_")
      assert(unpacked == q75codes(vid),
        s"vec $vid: packed $code unpacks to $unpacked, q75 says ${q75codes(vid)}")
    }
  }
}
