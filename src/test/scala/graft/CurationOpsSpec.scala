package graft

import graft.queries.CurationOps

/** Property pins for the round-7 curation wave. Each query gets an
  * INDEPENDENT recomputation (plain Scala over collected sf0.001
  * text) or an algebraic invariant — not a re-run of the same plan —
  * so a shared bug in the Spark expression and its DuckDB twin would
  * still be caught here.
  */
class CurationOpsSpec extends SparkTestBase {

  private lazy val texts: Map[Long, Array[String]] =
    spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
      .toMap

  test("q126 repetition metrics match a plain-Scala recount") {
    val rows = CurationOps.q126(spark, Sf).collect()
    assert(rows.length == CurationOps.RepTopK)
    rows.take(10).foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val n = t.length.toDouble
      val topWord = t.groupBy(identity).values.map(_.length).max / n
      val bg = t.sliding(2).map(_.mkString(" ")).toArray
      val topBigram = bg.groupBy(identity).values.map(_.length).max * 2.0 / n
      val dupIdx = bg.zipWithIndex
        .filter { case (g, _) => bg.count(_ == g) >= 2 }
        .flatMap { case (_, i) => Seq(i, i + 1) }.distinct.length / n
      def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      assert(r.getAs[Double]("top_word_frac") == r4(topWord))
      assert(r.getAs[Double]("top_bigram_frac") == r4(topBigram))
      assert(r.getAs[Double]("dup_cov_frac") == r4(dupIdx))
      val keep = topWord <= CurationOps.RepTopWordMax &&
        topBigram <= CurationOps.RepTopBigramMax &&
        dupIdx <= CurationOps.RepDupCovMax
      assert(r.getAs[Boolean]("keep") == keep)
    }
  }

  test("q156 paragraph dedup matches a brute-force first-occurrence recount") {
    // recount on block CONTENT (not hashes) — also certifies the
    // 60-bit hash is collision-free on this corpus's block set
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val w = CurationOps.ParaW
    val blocks = docs.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      (0 until t.length / w).map(b =>
        (id, b.toLong, t.slice(b * w, b * w + w).mkString(" ")))
    }
    val firstKey = blocks.groupBy(_._3).view
      .mapValues(bs => bs.map(x => x._1 * 100000L + x._2).min).toMap
    val expected = blocks.groupBy(_._1).map { case (id, bs) =>
      val kept = bs.count(x => x._1 * 100000L + x._2 == firstKey(x._3)).toLong
      val frac = math.floor(kept.toDouble / bs.length * 10000 + 0.5) / 10000
      (id, bs.length.toLong, kept, frac)
    }.toSeq.sortBy(t => (t._4, t._1)).take(CurationOps.ParaTopK)
    val rows = CurationOps.q156(spark, Sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rows == expected && rows.nonEmpty)
    // the operator must actually resolve duplicates on this corpus
    assert(rows.exists(r => r._3 < r._2),
      "corpus must contain at least one non-first-occurrence block")
  }

  /** The q164 cut rule in plain Scala: chunk contents of one doc. */
  private def cdcChunks(text: String): Seq[String] = {
    import graft.functions.TextKernels
    val k = CurationOps.CdcK
    def h(s: String): Long =
      TextKernels.hash60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val t = text.split(" ", -1)
    val n = t.length
    val cuts = (0 to n - k).flatMap { j => // 0-based window start
      val e = j + k // 1-based cut-after position
      if (h(t.slice(j, j + k).mkString(" ")) % CurationOps.CdcD == 0 && e < n)
        Some(e)
      else None
    }
    val starts = 1 +: cuts.map(_ + 1)
    val ends = cuts :+ n
    starts.zip(ends).map { case (s, e) => t.slice(s - 1, e).mkString(" ") }
  }

  test("q164 CDC chunks match a plain-Scala chunking recount on content") {
    import graft.functions.TextKernels
    def h(s: String): Long =
      TextKernels.hash60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // recount on chunk CONTENT (certifies hash collision-freedom too)
    val chunks = docs.flatMap { case (id, text) =>
      cdcChunks(text).map(c =>
        (id, c, (c.count(_ == ' ') + 1).toLong))
    }
    val expected = chunks.groupBy(_._2).map { case (content, cs) =>
      (h(content), cs.head._3, cs.map(_._1).distinct.size.toLong, cs.size.toLong)
    }.toSeq.sortBy { case (hh, _, nd, no) => (-no, -nd, hh) }
      .take(CurationOps.CdcTopK)
    val rows = CurationOps.q164(spark, Sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == expected && rows.nonEmpty)
    // the operator must actually CUT and actually DEDUP on this corpus
    assert(chunks.groupBy(_._1).exists(_._2.size > 1),
      "no document produced more than one chunk — cut rule never fired")
    assert(rows.exists(_._3 >= 2), "no cross-document duplicate chunks found")
  }

  test("q164 boundaries are shift-resistant: a prepended token leaves the tail chunks intact") {
    // the property that earns CDC its place beside fixed windows: an
    // edit at the head of a document moves EVERY fixed window (q127)
    // and every fixed block (q156), but only the chunks touching the
    // edit — boundaries are functions of local content, so the tail
    // chunk sequence survives verbatim and still dedups against the
    // unedited original
    val texts = graft.sources.Tables.documents(spark, Sf)
      .select("text").collect().map(_.getString(0))
    val multi = texts.map(t => t -> cdcChunks(t)).filter(_._2.length >= 3)
    assert(multi.length >= 10, "need docs with >= 3 chunks to exercise the property")
    var preserved = 0
    multi.foreach { case (t, before) =>
      val after = cdcChunks("zzz " + t)
      // longest common suffix of the two chunk-content sequences
      val lcs = before.reverse.zip(after.reverse).takeWhile {
        case (a, b) => a == b
      }.length
      // the edit may reshape the chunk containing it and (by creating
      // or destroying one cut) its immediate neighbor — never more
      if (lcs >= before.length - 2) preserved += 1
    }
    assert(preserved == multi.length,
      s"only $preserved/${multi.length} docs kept their tail chunks after a head edit")
  }

  test("q176 incremental chunk novelty matches a plain-Scala recount") {
    // independent recount: history chunk-hash set and per-batch-doc
    // dup accounting from the plain-Scala chunker — never the Spark
    // plan — then compare the declared query's full output
    import graft.functions.TextKernels
    def h(s: String): Long =
      TextKernels.hash60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val hist = docs.filter(_._1 % 10 != 7)
      .flatMap { case (_, t) => cdcChunks(t).map(h) }.toSet
    val expected = docs.filter(_._1 % 10 == 7).map { case (id, t) =>
      val cs = cdcChunks(t).map(c => (h(c), (c.count(_ == ' ') + 1).toLong))
      val dupToks = cs.collect { case (hh, l) if hist(hh) => l }.sum
      val nTok = cs.map(_._2).sum
      (id, cs.size.toLong, nTok, cs.count(c => hist(c._1)).toLong, dupToks,
        math.floor((1.0 - dupToks.toDouble / nTok.toDouble) * 10000.0 + 0.5) / 10000.0)
    }.sortBy { case (id, _, _, _, dt, _) => (-dt, id) }
      .take(CurationOps.CdcIncTopK).toSeq
    val rows = CurationOps.q176(spark, Sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5))).toSeq
    assert(rows == expected && rows.nonEmpty)
    // the batch must contain genuinely duplicated AND genuinely novel text
    assert(rows.exists(_._5 > 0L), "no batch chunk ever hit history")
    assert(rows.exists(r => r._4 < r._2), "every batch chunk hit history")
  }

  test("q127 duplicated-window coverage matches a brute-force window map") {
    val k = CurationOps.WinK
    // window -> distinct docs, over the whole corpus, in plain Scala
    val winDocs = texts.toSeq
      .flatMap { case (id, t) => t.sliding(k).filter(_.length == k)
        .map(_.mkString(" ")).map(w => (w, id)) }
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).distinct.size }
    val dup = winDocs.filter(_._2 >= 2).keySet
    val rows = CurationOps.q127(spark, Sf).collect()
    assert(rows.nonEmpty && rows.head.getAs[Double]("dup_frac") > 0.0,
      "corpus has cross-doc duplicate windows; top row must reflect them")
    rows.take(10).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val t = texts(id)
      val hits = t.sliding(k).zipWithIndex
        .filter { case (w, _) => w.length == k && dup(w.mkString(" ")) }
        .map(_._2).toArray
      val covered = hits.flatMap(p => p until p + k).distinct.length
      assert(r.getAs[Long]("n_dup_windows") == hits.length.toLong)
      assert(r.getAs[Long]("covered_tokens") == covered.toLong)
      val act = if (covered.toDouble / t.length >= CurationOps.WinDropFrac) "drop"
        else if (covered > 0) "trim" else "keep"
      assert(r.getAs[String]("action") == act)
    }
  }

  test("q128 priority sample: size K, pri >= tau, unbiased-estimator shape") {
    val rows = CurationOps.q128(spark, Sf).collect()
    assert(rows.length == CurationOps.PriK)
    val pris = rows.map(_.getAs[Double]("pri"))
    assert(pris.sameElements(pris.sorted.reverse), "descending priority order")
    // est_tokens = max(w, tau) with tau below every sampled priority
    val tauCandidates = rows.filter(r =>
      r.getAs[Double]("est_tokens") > r.getAs[Long]("n_tokens").toDouble)
      .map(_.getAs[Double]("est_tokens"))
    rows.foreach { r =>
      val w = r.getAs[Long]("n_tokens").toDouble
      val est = r.getAs[Double]("est_tokens")
      assert(est >= w)
      assert(r.getAs[Double]("pri") >= est - 1e-9 || est == w,
        "tau can never exceed a sampled priority")
    }
    assert(tauCandidates.distinct.length <= 1, "single tau across the sample")
    // DLT unbiasedness: E[sum(est)] = total corpus tokens. One draw,
    // so the pin is a sanity band, not a tight bound.
    val total = texts.values.map(_.length.toLong).sum.toDouble
    val estTotal = rows.map(_.getAs[Double]("est_tokens")).sum
    assert(estTotal > total * 0.3 && estTotal < total * 3.0,
      f"estimate $estTotal%.0f implausible vs true $total%.0f")
  }

  test("q130 span trim matches a brute-force batch-vs-history window check") {
    val k = CurationOps.WinK
    val hist = texts.toSeq.filter(_._1 % 10 != 7)
      .flatMap { case (_, t) => t.sliding(k).filter(_.length == k).map(_.mkString(" ")) }
      .toSet
    val rows = CurationOps.q130(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.take(10).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id % 10 == 7, "only batch docs may appear")
      val t = texts(id)
      val hits = t.sliding(k).zipWithIndex
        .filter { case (w, _) => w.length == k && hist(w.mkString(" ")) }
        .map(_._2).toArray
      val trimmed = hits.flatMap(p => p until p + k).distinct.length
      assert(r.getAs[Long]("n_hit_windows") == hits.length.toLong)
      assert(r.getAs[Long]("trimmed_tokens") == trimmed.toLong)
      assert(r.getAs[Double]("kept_frac") >= 0.0 && r.getAs[Double]("kept_frac") <= 1.0)
    }
  }

  test("q131 source overlap matches plain-Scala per-source trigram Jaccard") {
    val srcOf: Map[Long, String] =
      spark.read.parquet(s"$Sf/documents.parquet")
        .select("doc_id", "source").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val setsBySource: Map[String, Set[String]] = texts.toSeq
      .groupBy { case (id, _) => srcOf(id) }
      .map { case (s, ds) =>
        s -> ds.flatMap(_._2.sliding(3).filter(_.length == 3).map(_.mkString(" "))).toSet
      }
    val rows = CurationOps.q131(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.take(10).foreach { r =>
      val (s1, s2) = (r.getAs[String]("s1"), r.getAs[String]("s2"))
      assert(s1 < s2, "upper-triangle pairs only")
      val (a, b) = (setsBySource(s1), setsBySource(s2))
      val inter = (a & b).size
      assert(r.getAs[Long]("n1") == a.size.toLong)
      assert(r.getAs[Long]("n2") == b.size.toLong)
      assert(r.getAs[Long]("inter") == inter.toLong)
      val j = math.floor(inter.toDouble / (a.size + b.size - inter) * 1e4 + 0.5) / 1e4
      assert(r.getAs[Double]("jaccard") == j)
    }
  }

  test("q129 calibration: quintiles partition each source, quality descends") {
    val rows = CurationOps.q129(spark, Sf).collect()
    val perSource = rows.groupBy(_.getAs[String]("source"))
    val docCounts = texts.keySet.groupBy(_ => ()).size // silence unused warning
    assert(docCounts == 1)
    val sourceSizes = spark.read.parquet(s"$Sf/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (src, bs) =>
      val buckets = bs.map(_.getAs[Long]("bucket")).sorted
      assert(buckets.head == 0 && buckets.last <= 4 && buckets.distinct.length == buckets.length)
      assert(bs.map(_.getAs[Long]("n_docs")).sum == sourceSizes(src))
      // integer-quintile sizes differ by at most 1 within a source
      val sizes = bs.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, s"$src quintile sizes $sizes")
      // bucket 0 holds the highest TTR ranks: min_ttr non-increasing
      val mins = bs.sortBy(_.getAs[Long]("bucket")).map(_.getAs[Double]("min_ttr"))
      assert(mins.zip(mins.tail).forall { case (a, b) => a >= b },
        s"$src min_ttr not descending: ${mins.toSeq}")
    }
  }

  test("q169 PII redaction matches a plain java.util.regex recount") {
    val rows = CurationOps.q169(spark, Sf).collect()
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def dirtyOf(id: Long, text: String): String = {
      val sb = new StringBuilder(text)
      sb.append(" contact user").append(id).append("@example.com")
      if (id % 3 == 0) sb.append(" cc admin@mail.example.org")
      if (id % 2 == 0) sb.append(" from ").append((id * 7 + 13) % 223 + 1)
        .append('.').append((id * 3 + 5) % 256).append('.')
        .append((id * 11 + 1) % 256).append('.').append(id % 254 + 1)
      if (id % 5 != 4) sb.append(" call +1 555-").append(id % 900 + 100)
        .append('-').append(f"${id % 10000}%04d")
      sb.toString
    }
    val res = Seq(CurationOps.EmailRe -> "<EMAIL>",
      CurationOps.PhoneRe -> "<PHONE>", CurationOps.IpRe -> "<IP>")
    def cleanOf(dirty: String): String =
      res.foldLeft(dirty) { case (s, (re, m)) => s.replaceAll(re, m) }
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      var (ne, np, ni, chars, sig) = (0L, 0L, 0L, 0L, 0L)
      ds.foreach { case (id, _, text) =>
        val dirty = dirtyOf(id, text)
        val clean = cleanOf(dirty)
        ne += CurationOps.EmailRe.r.findAllIn(dirty).length
        np += CurationOps.PhoneRe.r.findAllIn(dirty).length
        ni += CurationOps.IpRe.r.findAllIn(dirty).length
        chars += dirty.length - clean.length
        sig ^= h60(clean)
        // idempotence: a second pass over masked text changes nothing
        assert(cleanOf(clean) == clean)
      }
      src -> ((ds.length.toLong, ne, np, ni, chars, sig))
    }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (docsN, ne, np, ni, chars, sig) = expect(r.getAs[String]("source"))
      assert(r.getAs[Long]("docs") == docsN)
      assert(r.getAs[Long]("emails") == ne && ne > docsN,
        s"emails $ne vs docs $docsN") // every doc has >=1, %3 docs have 2
      // sources are round-robin doc_id % nSources, so a source's ids
      // share a mod-2/mod-5 residue: phone/ip counts can be 0 for
      // SOME sources by construction — positivity is global, below
      assert(r.getAs[Long]("phones") == np)
      assert(r.getAs[Long]("ips") == ni)
      assert(r.getAs[Long]("chars_redacted") == chars && chars > 0)
      assert(r.getAs[Long]("content_sig") == sig)
    }
    assert(rows.map(_.getAs[Long]("phones")).sum > 0)
    assert(rows.map(_.getAs[Long]("ips")).sum > 0)
  }

  test("q170 distribution drift matches a plain-Scala recount") {
    val rows = CurationOps.q170(spark, Sf).collect()
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bySrc = docs.groupBy(_._2)
    assert(rows.length == bySrc.size)
    def rn(x: Double, n: Int): Double = {
      val k = math.pow(10, n); math.floor(x * k + 0.5) / k
    }
    var anyDropped = false
    rows.foreach { row =>
      val src = row.getAs[String]("source")
      val srcIdx = src.drop(3).toInt
      val binned = bySrc(src).map { case (id, _, text) =>
        val nTok = text.split(" ", -1).length
        val dropped = srcIdx % 2 == 0 && nTok >= CurationOps.DriftTokMin
        val b = math.min(nTok / CurationOps.DriftBinW, 15)
        val isRef = (id / 20) % 2 == 0
        val isCur = (id / 20) % 2 == 1 && !dropped
        if (!isRef && (id / 20) % 2 == 1 && dropped) anyDropped = true
        (b, isRef, isCur)
      }
      // every doc contributes an observed bin, including cur-half
      // docs the injected regression dropped (0/0 bins are real bins)
      val bins = binned.groupBy(_._1).map { case (b, xs) =>
        (b, xs.count(_._2).toLong, xs.count(_._3).toLong)
      }.toArray
      val nb = bins.length.toLong
      val nRef = bins.map(_._2).sum
      val nCur = bins.map(_._3).sum
      var schi = 0L
      var stvd = 0L
      bins.foreach { case (_, rc, cc) =>
        val pRef = (rc + 1).toDouble / (nRef + nb).toDouble
        val pCur = (cc + 1).toDouble / (nCur + nb).toDouble
        schi += math.floor(
          (pCur - pRef) * (pCur - pRef) / pRef * 1000000.0 + 0.5).toLong
        stvd += math.floor(math.abs(pCur - pRef) * 1000000.0 + 0.5).toLong
      }
      val chi2 = rn(nCur.toDouble * (schi.toDouble / 1000000.0), 4)
      val tvd = rn(0.5 * (stvd.toDouble / 1000000.0), 6)
      assert(row.getAs[Long]("n_ref") == nRef, s"$src n_ref")
      assert(row.getAs[Long]("n_cur") == nCur, s"$src n_cur")
      assert(row.getAs[Long]("n_bins") == nb, s"$src n_bins")
      assert(row.getAs[Double]("chi2") == chi2, s"$src chi2")
      assert(row.getAs[Double]("tvd") == tvd, s"$src tvd")
      assert(row.getAs[Boolean]("drifted") ==
        (tvd > CurationOps.DriftTvdMax), s"$src drifted")
    }
    // the injected extractor regression actually fires somewhere
    assert(anyDropped, "no doc hit the injected truncation — dead test")
  }
}
