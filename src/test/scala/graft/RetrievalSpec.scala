package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.queries.Retrieval
import graft.sources.Tables

/** BM25 retrieval (q122) + bigram-LM quality scoring (q123):
  * ranking/containment invariants and the exact-arithmetic contracts
  * the Scaladocs promise.
  */
class RetrievalSpec extends SparkTestBase {

  test("q157: index-join phrase matches equal a plain-Scala adjacency recount") {
    val (p1, p2, p3) = Retrieval.phraseFor(spark, Sf)
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      val hits = (0 until t.length - 2).filter(i =>
        t(i) == p1 && t(i + 1) == p2 && t(i + 2) == p3)
      if (hits.nonEmpty)
        Some((id, s"$p1 $p2 $p3", hits.length.toLong, hits.head.toLong + 1))
      else None
    }.sortBy(t => (-t._3, t._1)).take(Retrieval.PhraseTopK).toSeq
    val rows = Retrieval.q157(spark, Sf).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == expected && rows.nonEmpty,
      s"phrase '$p1 $p2 $p3' index join must equal the brute-force scan")
    // the argmax phrase must actually be the most frequent trigram
    val allTri = docs.flatMap { case (_, text) =>
      val t = text.split(" ", -1)
      (0 until t.length - 2).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
    }.groupBy(identity).view.mapValues(_.length).toSeq
    val best = allTri.sortBy { case (g, n) => (-n, g) }.head._1
    assert(s"$p1 $p2 $p3" == best)
  }

  test("q122: ranks are dense, scores non-increasing, hits contain a query term") {
    val rows = Retrieval.q122(spark, Sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getString(0))
    assert(byQ.keySet == Retrieval.Probes.map(_._1).toSet,
      "every probe query must rank some documents")
    byQ.foreach { case (q, rs) =>
      val ranks = rs.map(_.getInt(1)).toSeq
      assert(ranks == (1 to rs.length), s"$q ranks not dense: $ranks")
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse, s"$q scores not non-increasing")
    }
    // containment: a ranked doc must actually contain >=1 term of its query
    val terms = Retrieval.Probes.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val texts = Tables.documents(spark, Sf)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    rows.foreach { r =>
      val (q, doc) = (r.getString(0), r.getLong(2))
      assert(terms(q).exists(texts(doc).contains),
        s"doc $doc ranked for $q but contains none of its terms")
    }
  }

  test("q122: per-(query,doc) score equals an independent BM25 computation") {
    // recompute one query's scores driver-side from raw tf/df/dl
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val n = docs.size
    val dl = docs.view.mapValues(_.length).toMap
    val avgdl = dl.values.map(_.toLong).sum.toDouble / n
    val qTerms = Retrieval.Probes.filter(_._1 == "join_path").map(_._2)
    val df = qTerms.map(t => t -> docs.values.count(_.contains(t))).toMap
    def bm25(doc: Long): Double = {
      val toks = docs(doc)
      qTerms.map { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) 0L
        else {
          val idf = math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5))
          val c = idf * (tf * (Retrieval.BmK1 + 1)) /
            (tf + Retrieval.BmK1 * (1 - Retrieval.BmB + Retrieval.BmB * dl(doc) / avgdl))
          math.floor(c * Retrieval.BmScale + 0.5).toLong
        }
      }.sum.toDouble / Retrieval.BmScale
    }
    Retrieval.q122(spark, Sf).where(col("query_id") === "join_path").collect()
      .foreach { r =>
        assert(r.getDouble(3) == bm25(r.getLong(2)),
          s"doc ${r.getLong(2)}: engine=${r.getDouble(3)} reference=${bm25(r.getLong(2))}")
      }
  }

  test("q163: fused ranking equals a full plain-Scala RRF recount") {
    // independent reimplementation: tokenize + BM25 more-like-this and
    // cosine ranking in driver-side Scala, fuse with 1/(k0+rank), and
    // demand row-exact equality with the engine's plan
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val n = docs.size
    val dl = docs.view.mapValues(_.length).toMap
    val avgdl = dl.values.map(_.toLong).sum.toDouble / n
    val tf = docs.view.mapValues(_.groupBy(identity).view.mapValues(_.size).toMap).toMap
    val dfm = docs.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val probes = docs.keys.filter(_ % 100 == 0).toSeq.sorted
    assert(probes.nonEmpty)
    def sparseRanks(q: Long): Map[Long, Int] = {
      // MoreLikeThis term budget: the M rarest terms, (df, term) order
      val qTerms = docs(q).distinct
        .sortBy(t => (dfm(t), t)).take(Retrieval.RrfMltTerms)
      // candidate = shares >=1 term (the join's semantics), even if
      // every contribution rounds to 0
      val scored = docs.keys.filter(_ != q).flatMap { d =>
        if (!qTerms.exists(t => tf(d).getOrElse(t, 0) > 0)) None
        else Some(d -> qTerms.map { t =>
          val f = tf(d).getOrElse(t, 0)
          if (f == 0) 0L
          else {
            val idf = math.log(1 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
            val c = idf * (f * (Retrieval.BmK1 + 1)) /
              (f + Retrieval.BmK1 * (1 - Retrieval.BmB + Retrieval.BmB * dl(d) / avgdl))
            math.floor(c * Retrieval.BmScale + 0.5).toLong
          }
        }.sum)
      }.toSeq
      scored.sortBy { case (d, s) => (-s, d) }.take(Retrieval.RrfListN)
        .zipWithIndex.map { case ((d, _), i) => d -> (i + 1) }.toMap
    }
    def denseRanks(q: Long): Map[Long, Int] = {
      def dot(a: Array[Double], b: Array[Double]) =
        a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i)) // the kernel's fold order
      def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
      val eq = vecs(q)
      vecs.keys.filter(_ != q).map { d =>
        val c = dot(vecs(d), eq) / (nrm(vecs(d)) * nrm(eq))
        d -> math.floor(c * 10000 + 0.5) / 10000 // rnd(,4)
      }.toSeq.sortBy { case (d, c) => (-c, d) }.take(Retrieval.RrfListN)
        .zipWithIndex.map { case ((d, _), i) => d -> (i + 1) }.toMap
    }
    val expected = probes.flatMap { q =>
      val sr = sparseRanks(q); val dr = denseRanks(q)
      (sr.keySet ++ dr.keySet).toSeq.map { d =>
        val rrf = sr.get(d).map(r => 1.0 / (Retrieval.RrfK0 + r)).getOrElse(0.0) +
          dr.get(d).map(r => 1.0 / (Retrieval.RrfK0 + r)).getOrElse(0.0)
        (q, d, rrf, sr.get(d), dr.get(d))
      }.sortBy { case (_, d, rrf, _, _) => (-rrf, d) }
        .take(Retrieval.RrfTopK).zipWithIndex
        .map { case ((q2, d, rrf, rs, rd), i) => (q2, i + 1, d, rrf, rs, rd) }
    }
    val rows = Retrieval.q163(spark, Sf).collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)),
        if (r.isNullAt(5)) None else Some(r.getInt(5)))
    }.toSeq
    assert(rows == expected, s"engine=${rows.take(3)}... reference=${expected.take(3)}...")
    // ensembling sanity: the fused list must actually draw on BOTH lists
    assert(rows.exists(_._5.isEmpty) || rows.exists(_._6.isEmpty) ||
      rows.exists(r => r._5.nonEmpty && r._6.nonEmpty))
  }

  test("q163Ivf: full-probe IVF hybrid equals the brute-force hybrid exactly") {
    // the q59 anchor, applied to the fused query: nprobe = cells makes
    // the IVF candidate set the whole corpus, so every (cosine, rank)
    // and hence the fused output must be BIT-identical to q163 —
    // pinning that the 100 TB dense-leg swap changes the candidate
    // set, never the scoring or fusion
    val cells = 8
    val exact = Retrieval.q163(spark, Sf).collect().toSeq
    val ivf = Retrieval.q163Ivf(spark, Sf, cells = cells, nprobe = cells)
      .collect().toSeq
    assert(ivf == exact)
    // and a pruned probe stays rank-list-shaped: same schema, same
    // probes, <= TopK rows each, fused score still in (0, 2/(k0+1)]
    val pruned = Retrieval.q163Ivf(spark, Sf, cells = cells, nprobe = 2)
      .collect()
    val probes = exact.map(_.getLong(0)).distinct.sorted
    assert(pruned.map(_.getLong(0)).distinct.sorted.toSeq == probes.toSeq)
    val perProbe = pruned.groupBy(_.getLong(0)).values
    assert(perProbe.forall(_.length <= Retrieval.RrfTopK))
    assert(pruned.forall { r =>
      val s = r.getDouble(3)
      s > 0.0 && s <= 2.0 / (Retrieval.RrfK0 + 1)
    })
  }

  test("q123: probabilities in (0,1), bigram conservation, calibrated cull") {
    val rows = Retrieval.q123(spark, Sf).collect()
    val docsWithBigrams = Tables.documents(spark, Sf)
      .where(size(TextFns.tokens(col("text"))) >= 2).count()
    assert(rows.length == docsWithBigrams, "every multi-token doc must be scored")
    rows.foreach { r =>
      val s = r.getDouble(2)
      assert(s > 0 && s < 1, s"doc ${r.getLong(0)} score out of range: $s")
    }
    // conservation: per-doc bigram counts sum to tokens - docs
    val totTokens = Tables.documents(spark, Sf)
      .select(sum(size(TextFns.tokens(col("text"))))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum == totTokens - docsWithBigrams)
    // the self-calibrating threshold must CULL something and KEEP most
    val kept = rows.count(_.getBoolean(3))
    assert(kept < rows.length, "cull threshold never fired")
    assert(kept > rows.length / 2, "cull threshold removed most of the corpus")
  }
}
