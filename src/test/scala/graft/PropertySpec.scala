package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{TextFns, TextKernels}

/** Property tests for the semantics SURVEY.md §5 flags as subtle:
  * rounding determinism, the W1 latest-per-key idiom, O3 top-k, and
  * kernel/declarative hash parity on arbitrary token streams.
  * Generators are driven by fixed seeds (deterministic CI).
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8))
  private val doc = Gen.listOfN(12, word).map(_.mkString(" "))

  test("property: kernel minhash equals declarative on arbitrary docs") {
    val docs = samples(doc, 40)
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val mismatch = df.select(
        TextKernels.minhashSigCol(col("text")).as("k"),
        TextFns.minhashSig(
          array_distinct(TextFns.shingles(TextFns.tokens(col("text")), 2))).as("d"))
      .filter(not(col("k") === col("d")))
      .count()
    assert(mismatch == 0)
  }

  test("property: rnd is deterministic and within half-ulp of scale") {
    val xs = samples(Gen.chooseNum(-1000.0, 1000.0), 50)
    val rs = xs.toDF("x").select(col("x"), TextFns.rnd(col("x"), 4).as("r")).collect()
    rs.foreach { row =>
      val (x, r) = (row.getDouble(0), row.getDouble(1))
      assert(math.abs(r - x) <= 0.00005 + math.ulp(x), s"x=$x r=$r")
    }
    val again = xs.toDF("x").select(TextFns.rnd(col("x"), 4)).collect().map(_.getDouble(0))
    assert(rs.map(_.getDouble(1)).toSeq == again.toSeq)
  }

  test("property: simhash60 kernel equals declarative on arbitrary docs; " +
    "near-identical docs stay Hamming-close") {
    val docs = samples(doc, 30)
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val mismatch = df.select(
        TextKernels.simhash60Col(col("text")).as("k"),
        TextFns.simhashN(TextFns.tokens(col("text")), 60).as("d"))
      .filter(col("k") =!= col("d")).count()
    assert(mismatch == 0)
    // locality: appending one token moves few of the 60 bits
    val perturbed = df.select(
        TextKernels.simhash60Col(col("text")).as("a"),
        TextKernels.simhash60Col(concat(col("text"), lit(" zzz"))).as("b"))
      .select(bit_count(col("a").bitwiseXOR(col("b"))).as("ham"))
      .collect().map(_.getInt(0))
    assert(perturbed.forall(_ <= 30), s"perturbation moved too many bits: ${perturbed.max}")
  }

  test("property: KMV estimate is exact below k for arbitrary distinct sets") {
    val sets = samples(Gen.listOfN(50, Gen.chooseNum(1L, 1000000L)), 6)
    sets.foreach { xs =>
      val distinct = xs.distinct
      val df = distinct.toDF("x")
        .select((TextFns.hash60(col("x").cast("string")) % TextFns.P).as("h"))
      val est = df.agg(graft.functions.KmvSketch.kmvDistinct(col("h")))
        .head().getDouble(0)
      // k=64 > 50 inputs → sketch must be exact on DISTINCT HASHES
      val nHashes = df.distinct().count()
      assert(est == nHashes.toDouble, s"est $est vs $nHashes")
    }
  }

  test("property: W1 latest-per-key equals groupBy-max join") {
    val rows = samples(Gen.listOfN(60, Gen.zip(Gen.chooseNum(1, 5), Gen.chooseNum(1, 20))), 5)
    rows.foreach { data =>
      val df = data.map { case (k, d) => (k.toLong, d.toLong) }.toDF("k", "d")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      val viaWindow = df.withColumn("m", max("d").over(w))
        .where(col("d") === col("m")).select("k", "d").distinct()
      val viaJoin = df.groupBy("k").agg(max("d").as("d")).select("k", "d")
      assert(viaWindow.except(viaJoin).count() == 0)
      assert(viaJoin.except(viaWindow).count() == 0)
    }
  }

  test("property: codegen dot product equals exact BigDecimal fold on arbitrary vectors") {
    val vec = Gen.listOfN(16, Gen.chooseNum(-8f, 8f))
    val pairs = samples(Gen.zip(vec, vec), 30)
    val df = pairs.map { case (a, b) => (a, b) }.toDF("a", "b")
    val got = df.select(graft.functions.VecFns.dotCol(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0))
    pairs.zip(got).foreach { case ((a, b), d) =>
      // the pinned contract is a strict ascending double fold — replay
      // it exactly on the driver
      var expect = 0.0
      a.zip(b).foreach { case (x, y) => expect += x.toDouble * y.toDouble }
      assert(java.lang.Double.doubleToLongBits(d) ==
        java.lang.Double.doubleToLongBits(expect), s"d=$d expect=$expect")
      // and it must be within float-product accumulation error of the
      // infinitely precise value
      val exact = a.zip(b).map { case (x, y) =>
        BigDecimal(x.toDouble) * BigDecimal(y.toDouble)
      }.sum
      assert((BigDecimal(d) - exact).abs < BigDecimal(1e-9), s"drift vs exact: $d vs $exact")
    }
  }

  test("property: image decode round-trips arbitrary RGB rasters byte-for-byte") {
    val px = Gen.chooseNum(0, 255)
    val dims = samples(Gen.zip(Gen.chooseNum(1, 13), Gen.chooseNum(1, 11)), 6)
    dims.zipWithIndex.foreach { case ((w, h), i) =>
      val pixels = samples(Gen.listOfN(w * h * 3, px), 1).head.toArray
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        img.setRGB(x, y, (pixels(o) << 16) | (pixels(o + 1) << 8) | pixels(o + 2))
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos) // png is lossless
      val row = graft.functions.ImgKernels.decode(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"mem:$i"),
        baos.toByteArray)
      assert(row != null)
      assert(row.getInt(1) == h && row.getInt(2) == w && row.getInt(3) == 3)
      val data = row.getBinary(5)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        // stored BGR row-major; generator wrote (r, g, b) at o
        assert((data(o) & 0xff) == pixels(o + 2), s"B mismatch at ($x,$y)")
        assert((data(o + 1) & 0xff) == pixels(o + 1), s"G mismatch at ($x,$y)")
        assert((data(o + 2) & 0xff) == pixels(o), s"R mismatch at ($x,$y)")
      }
    }
  }

  test("property: histogram sketch is partition-independent and within one bin of exact") {
    val lists = samples(Gen.listOfN(400, Gen.chooseNum(0.0, 1000.0)), 5)
    val (lo, hi, bins) = (0.0, 1000.0, 100)
    val width = (hi - lo) / bins
    lists.foreach { xs =>
      val df = xs.toDF("x")
      def counts(parts: Int): Seq[Long] =
        df.repartition(parts)
          .agg(graft.functions.HistogramSketch.histogram(col("x"), lo, hi, bins).as("h"))
          .head().getAs[scala.collection.Seq[Long]]("h").toSeq
      // merge order/partitioning must not change the counters
      assert(counts(1) == counts(7))
      // p50 from the counters lands within one bin width of the true median
      val c = counts(7)
      val n = c.sum
      val rank = math.ceil(0.5 * n).toLong
      var cum = 0L
      var pos = -1 // counter index: 0 = underflow, i covers [lo+(i-1)w, lo+iw)
      while (cum < rank) { pos += 1; cum += c(pos) }
      val est = lo + (pos - 1) * width +
        (rank - (cum - c(pos))).toDouble / c(pos) * width
      val exact = xs.sorted.apply((n / 2).toInt - (if (n % 2 == 0) 1 else 0))
      assert(math.abs(est - exact) <= width + 1e-9,
        s"est=$est exact=$exact width=$width")
    }
  }

  test("property: top-k-then-resort returns the true top k") {
    val lists = samples(Gen.listOfN(30, Gen.chooseNum(-1000, 1000)), 8)
    lists.foreach { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v.toLong) }.toDF("id", "v")
      val k = 5
      val got = df.orderBy(col("v").desc, col("id").asc).limit(k)
        .orderBy(col("v").asc, col("id").asc)
        .collect().map(r => (r.getLong(1), r.getLong(0)))
      val expect = xs.zipWithIndex.map { case (v, i) => (v.toLong, i.toLong) }
        .sortBy { case (v, i) => (-v, i) }.take(k)
        .sortBy { case (v, i) => (v, i) }
      assert(got.toSeq == expect)
    }
  }

  test("property: BPE merge fold == in-memory leftmost non-overlapping merge") {
    // arbitrary lowercase segmentations and merge pairs, including
    // adversarial shapes the toy test can't cover: chains (aaaa...),
    // pairs whose merged symbol prefixes/suffixes other symbols, and
    // pairs absent from the word entirely
    def refMerge(syms: List[String], lf: String, rt: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == lf && syms(i + 1) == rt) {
          out += (lf + rt); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    val sym = Gen.oneOf("a", "b", "ab", "ba", "aa", "c")
    val segGen = Gen.nonEmptyListOf(sym).map(_.take(10))
    val pairGen = for { l <- sym; r <- sym } yield (l, r)
    val cases = samples(Gen.zip(segGen, pairGen), 120)
    cases.groupBy(_._2).foreach { case ((lf, rt), group) =>
      val segs = group.map(_._1)
      val df = segs.map(_.mkString("·")).toDF("seg")
      val got = df.select(col("seg"),
        graft.queries.CorpusOps.testMergeFold(lf, rt).as("m")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      segs.foreach { s =>
        val expect = refMerge(s, lf, rt).mkString("·")
        assert(got(s.mkString("·")) == expect,
          s"fold diverged on ${s.mkString("·")} with ($lf,$rt)")
      }
    }
  }

  test("property: Misra-Gries keeps the MG invariant under any partitioning") {
    // the error-bound/merge proof behind q161's two-pass exactness,
    // on a stream whose vocabulary DWARFS the capacity (the corpus's
    // 31-token vocab can't exercise truncation): a skewed stream of
    // n=60000 draws over ~4000 distinct keys through an m=32 summary,
    // under three physical layouts (single partition = pure update
    // path; 7 and 32 partitions = partial+final merge trees of
    // different shapes). The SUMMARY CONTENTS legitimately differ by
    // merge order — the INVARIANT may not:
    //   (a) size <= m,
    //   (b) every key with true count > n/(m+1) is present
    //       (containment — what makes the candidate recount exact),
    //   (c) for every kept key: est <= true and true - est <= n/(m+1)
    //       (the two-sided MG error bound).
    val m = 32
    val rnd = new scala.util.Random(7)
    // u^3 skew: a few hundred hot keys over a ~4000-key tail
    val stream = Seq.fill(60000) {
      val u = rnd.nextDouble()
      s"k${(u * u * u * 4000).toInt}"
    }
    val n = stream.size.toLong
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bound = n / (m + 1).toLong // floor; strict > below is conservative
    val mustContain = exact.collect { case (k, c) if c > bound => k }.toSet
    assert(exact.size > 10 * m, "stream must out-card the capacity")
    assert(mustContain.nonEmpty, "skew must produce guaranteed hitters")
    val df = stream.toDF("t")
    Seq(1, 7, 32).foreach { parts =>
      val sk = df.repartition(parts)
        .agg(graft.functions.MisraGriesAgg.sketch(col("t"), m).as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e.token"), col("e.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sk.size <= m, s"parts=$parts: summary exceeded capacity (${sk.size})")
      // truncation proof: a 4000-key stream through 32 counters MUST
      // have decremented — kept estimates can't cover the full mass
      assert(sk.values.sum < n,
        s"parts=$parts: truncation not exercised (estimates cover all $n)")
      val missing = mustContain -- sk.keySet
      assert(missing.isEmpty,
        s"parts=$parts: guaranteed hitters missing from summary: $missing")
      sk.foreach { case (k, est) =>
        val truth = exact.getOrElse(k, 0L)
        assert(est <= truth,
          s"parts=$parts: overestimate for $k (est=$est true=$truth)")
        assert(truth - est <= bound + 1,
          s"parts=$parts: error bound broken for $k (est=$est true=$truth)")
      }
    }
  }

  test("property: HLL registers are partition-independent, match a " +
    "plain-Scala recount, and estimate within 3 sigma") {
    import graft.functions.HllSketch
    val rnd = new scala.util.Random(11)
    // ~11k distinct over 40k draws: well past the biased small range
    val vals = Seq.fill(40000)(s"v${rnd.nextInt(12000)}")
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val hashes = vals.map(h60)
    val exact = hashes.distinct.size
    val regs = Array.fill(HllSketch.M)(0)
    hashes.foreach { h =>
      val j = (h % HllSketch.M).toInt
      val w = h / HllSketch.M
      val rho =
        if (w == 0L) HllSketch.RhoMax
        else HllSketch.RhoMax - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(j)) regs(j) = rho
    }
    val sTrue = regs.map(m => 1L << (HllSketch.RhoMax - m)).sum
    val zerosTrue = regs.count(_ == 0).toLong
    val df = vals.toDF("t")
      .select(TextKernels.hash60StrCol(col("t")).as("h"))
    // 1 partition = pure update path; 7 and 32 = different-shape
    // partial+final merge trees. Register maxes are order-free, so
    // unlike MG the SUMMARY itself must be bit-identical in all three.
    Seq(1, 7, 32).foreach { parts =>
      val arr = df.repartition(parts)
        .agg(HllSketch.hllSummary(col("h")).as("hs"))
        .head().getSeq[Long](0)
      assert(arr(0) == sTrue, s"parts=$parts: S ${arr(0)} != $sTrue")
      assert(arr(1) == zerosTrue, s"parts=$parts: zeros ${arr(1)} != $zerosTrue")
    }
    val est = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
      9007199254740992.0 / sTrue.toDouble
    // m=256: sigma = 1.04/16 = 6.5%; 3 sigma ~ 19.5%
    val relErr = math.abs(est - exact.toDouble) / exact.toDouble
    assert(relErr < 0.2, s"raw HLL estimate off by $relErr (est=$est exact=$exact)")
    assert(zerosTrue == 0L, "11k distinct must fill all 256 registers")
  }

  test("q181 profile quantiles match a plain-Scala histogram recount and bound the exact quantile") {
    val cols = Seq(
      ("l_quantity", 0.0, 64.0), ("l_extendedprice", 0.0, 131072.0),
      ("l_discount", 0.0, 0.125), ("l_tax", 0.0, 0.125))
    val bins = 512
    val qs = Seq(0.5, 0.9, 0.99)
    val data = graft.sources.Tables.lineitem(spark, Sf)
      .select(cols.map(c => col(c._1)): _*).collect()
    val rows = graft.queries.SketchQueries.q181(spark, Sf).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(rows.size == cols.size * qs.size)
    cols.zipWithIndex.foreach { case ((cn, lo, hi), ci) =>
      val vs = data.map(_.getDouble(ci)).sorted
      val counters = new Array[Long](bins + 2)
      vs.foreach { x =>
        val b = if (x < lo) 0
          else if (x >= hi) bins + 1
          else math.floor((x - lo) / (hi - lo) * bins).toInt + 1
        counters(b) += 1
      }
      val w = (hi - lo) / bins
      qs.foreach { q =>
        val rank = math.ceil(q * vs.length.toDouble).toLong
        var cum = 0L; var bin = 0
        while (cum < rank) { cum += counters(bin); bin += 1 }
        val c = counters(bin - 1)
        val est = lo + (bin - 1 - 1) * w + (rank - (cum - c)).toDouble / c.toDouble * w
        val expected = math.floor(est * 10000.0 + 0.5) / 10000.0
        assert(rows((cn, q)) == expected, s"$cn q=$q: ${rows((cn, q))} != $expected")
        // estimator contract: within one bin width of the exact quantile
        val exact = vs((rank - 1).toInt)
        assert(math.abs(rows((cn, q)) - exact) <= w + 1e-9,
          s"$cn q=$q: est ${rows((cn, q))} vs exact $exact exceeds bin width $w")
      }
    }
  }

  test("HLL scalar kernels: unionCol/sCol over register rows == direct sketch of the union") {
    import graft.functions.{HllKernels, HllSketch}
    val rnd = new scala.util.Random(17)
    val xs = Seq.fill(5000)(s"a${rnd.nextInt(3000)}")
    val ys = Seq.fill(5000)(s"b${rnd.nextInt(3000)}")
    def df(vs: Seq[String], g: Int) = vs.toDF("t")
      .select(lit(g).as("g"), TextKernels.hash60StrCol(col("t")).as("h"))
    val regs = df(xs, 0).union(df(ys, 1))
      .groupBy("g").agg(HllSketch.hllRegisters(col("h")).as("r"))
    val a = regs.where(col("g") === 0).select(col("r").as("ra"))
    val b = regs.where(col("g") === 1).select(col("r").as("rb"))
    val got = a.crossJoin(b)
      .select(HllKernels.sCol(HllKernels.unionCol(col("ra"), col("rb"))).as("su"),
        HllKernels.sCol(col("ra")).as("sa"))
      .head()
    val direct = df(xs, 0).union(df(ys, 1))
      .agg(HllSketch.hllSummary(col("h")).as("s"))
      .head().getSeq[Long](0).head
    assert(got.getLong(0) == direct,
      "union kernel over register rows must equal the direct union sketch")
    val aDirect = df(xs, 0).agg(HllSketch.hllSummary(col("h")))
      .head().getSeq[Long](0).head
    assert(got.getLong(1) == aDirect, "sCol must equal the aggregate's S")
  }

  test("q175 HLL growth algebra: union dominates reference; in-regime estimates track exact") {
    import graft.functions.HllSketch
    val rows = graft.queries.SketchQueries.q175(spark, Sf).collect()
    assert(rows.nonEmpty)
    // independent growth recount: pull the exact S integers per source
    // via a separate aggregation, then redo est_growth = rnd(est(all)
    // - est(ref), 4) in plain Scala (same IEEE tree + floor-rounding
    // as the query) — the r10 test compared the column to itself
    val sBySource = graft.sources.Tables.documents(spark, Sf)
      .select(col("source"), expr("(doc_id DIV 20) % 2 = 0").as("is_ref"),
        explode(TextKernels.winHashCol(col("text"), 3)).as("h"))
      .groupBy(col("source"))
      .agg(HllSketch.hllSummary(when(col("is_ref"), col("h"))).as("hsr"),
        HllSketch.hllSummary(col("h")).as("hsa"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[Long](1).head, r.getSeq[Long](2).head)).toMap
    def est(s: Long): Double =
      0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0 / s.toDouble
    def rnd4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    rows.foreach { r =>
      val (exactRef, exactNew) = (r.getAs[Long]("exact_ref"), r.getAs[Long]("exact_new"))
      val (eRef, eUni, eGro) = (r.getAs[Double]("est_ref"),
        r.getAs[Double]("est_union"), r.getAs[Double]("est_growth"))
      // union = elementwise register max, so S can only shrink and the
      // estimate can only grow — growth is non-negative STRUCTURALLY,
      // before any statistics
      assert(eUni >= eRef && eGro >= 0.0, s"${r.getString(0)}: union must dominate")
      val (sRef, sAll) = sBySource(r.getString(0))
      assert(eGro == rnd4(est(sAll) - est(sRef)),
        s"${r.getString(0)}: growth must equal rnd(est(union) - est(ref)) recomputed from S")
      assert(eUni == rnd4(est(sAll)) && eRef == rnd4(est(sRef)),
        s"${r.getString(0)}: estimates must match the S-integer recount")
      assert(exactNew >= 0L)
      // in-regime accuracy (trigram vocab >> m): 3-sigma at m=256
      val exactAll = exactRef + exactNew
      if (exactAll > 640) {
        val rel = math.abs(eUni - exactAll.toDouble) / exactAll.toDouble
        assert(rel < 0.2, s"${r.getString(0)}: union est off by $rel")
      }
    }
  }
}
