package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native JVM kernels for the hot text-hashing path (SURVEY.md §4.3:
  * "fused custom Expression for scale").
  *
  * The declarative higher-order-function pipeline in [[TextFns]] is
  * oracle-exact but interpreted: Catalyst evaluates HOF lambdas
  * row-at-a-time with boxed longs and per-element allocations
  * (~0.8 ms/doc). These kernels compute the same values in one tight
  * JIT'd loop (~10 µs/doc) and are wired in via `StaticInvoke`, which
  * generates a direct static call inside whole-stage codegen — no UDF
  * registry, no serialization, null-propagation handled by codegen.
  *
  * Parity contract (tested in KernelSpec): for every document,
  * `bigramSet`/`minhashSig` equal TextFns' declarative
  * `array_distinct(shingles(tokens(text),2))` / `minhashSig` — same
  * tokenizer (single-space split), same first-occurrence distinct
  * order, same md5→60-bit→affine-mod-P hash family, same constants.
  */
object TextKernels {

  import TextFns.{P, hashParams}

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes) as a non-negative long — equals
    * `conv(substring(md5(s),1,15),16,10)`.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    // 15 hex digits = bytes 0..6 (56 bits) + high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** [[hash60]] of a string's UTF-8 bytes — value-identical to the
    * declarative `conv(substring(md5(s),1,15),16,10)` chain but skips
    * its hex-string round-trip (md5 → 32-char hex → substring →
    * base-16 string parse) per row.
    */
  def hash60Str(text: UTF8String): Long = hash60(text.getBytes)

  private def splitTokens(text: UTF8String): Array[String] =
    text.toString.split(" ", -1)

  private def distinctBigrams(text: UTF8String): java.util.LinkedHashSet[String] = {
    val toks = splitTokens(text)
    val set = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < toks.length - 1) {
      set.add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    set
  }

  /** Distinct word-bigram shingles in first-occurrence order. */
  def bigramSet(text: UTF8String): ArrayData = {
    val set = distinctBigrams(text)
    val out = new Array[AnyRef](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct word-trigram shingles (w-shingling's w=3, the q121
    * basis) in first-occurrence order — equals the declarative
    * `array_distinct(shingles(tokens(text), 3))`, which builds each
    * shingle through slice+join HOFs (measured 12 s over 5k docs at
    * sf0.1 vs ~1 s here).
    */
  def trigramSet(text: UTF8String): ArrayData = {
    val toks = splitTokens(text)
    val set = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < toks.length - 2) {
      set.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[AnyRef](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  private val as: Array[Long] = hashParams.map(_._1).toArray
  private val bs: Array[Long] = hashParams.map(_._2).toArray

  /** hash60 of every k-token window of `text` (positions implicit by
    * array index, 0-based) — the q127 exact-substring-dedup basis.
    * Equals the declarative `transform(shingles(tokens(text), k),
    * w -> hash60(w))` but in one JIT'd loop: the HOF form re-splits
    * the text for every element_at reference inside the shingle
    * lambda (no CSE in interpreted HOFs), which measured 57 s over
    * 5k docs at sf0.1 vs ~1 s here. Short docs (< k tokens) → [].
    */
  def winHash(text: UTF8String, k: Int): ArrayData = {
    val toks = splitTokens(text)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = hash60(sb.toString.getBytes("UTF-8"))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature (k = TextFns.NumHashes) over the distinct
    * bigram set of `text`: one md5 per shingle, k affine minima, all
    * in primitive longs. Empty shingle set → all-P signature
    * (matches the declarative fold's seed).
    */
  def minhashSig(text: UTF8String): ArrayData = {
    val k = as.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, P)
    val it = distinctBigrams(text).iterator()
    while (it.hasNext) {
      val h = hash60(it.next().getBytes("UTF-8")) % P
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** Hashing-trick term-frequency embedding: token t adds 1.0 to
    * bucket hash60(t) mod dim; the vector is L2-normalized (zero
    * vector stays zero). One pass, float output — the text→embedding
    * bridge into the ANN/dedup pipeline. DuckDB twin in
    * TextFns.tfEmbeddingSql (same bucket hash, same normalization
    * order: norm computed from FLOAT-cast weights).
    */
  final val EmbeddingDim = 32

  def tfEmbedding(text: UTF8String): ArrayData = {
    val v = new Array[Float](EmbeddingDim)
    val toks = splitTokens(text)
    var i = 0
    while (i < toks.length) {
      val b = (hash60(toks(i).getBytes("UTF-8")) % EmbeddingDim).toInt
      v(b) += 1f
      i += 1
    }
    var ss = 0.0
    var j = 0
    while (j < EmbeddingDim) { ss += v(j).toDouble * v(j); j += 1 }
    if (ss > 0) {
      val inv = math.sqrt(ss)
      j = 0
      while (j < EmbeddingDim) { v(j) = (v(j) / inv).toFloat; j += 1 }
    }
    new GenericArrayData(v)
  }

  /** 60-bit SimHash over the token stream — same semantics as the
    * declarative `TextFns.simhashN(tokens(text), 60)` (one hash60 per
    * token, per-bit sign sums, bit set where the sum is positive) in
    * one primitive loop. The declarative 60-wide HOF fold generates
    * pathologically large codegen when CollapseProject inlines it into
    * band keys (measured ~20 s compile+interpret on first run); this
    * kernel is a single static call.
    */
  final val SimhashBits = 60

  def simhash60(text: UTF8String): Long = {
    val sums = new Array[Int](SimhashBits)
    val toks = splitTokens(text)
    var i = 0
    while (i < toks.length) {
      val h = hash60(toks(i).getBytes("UTF-8"))
      var j = 0
      while (j < SimhashBits) {
        sums(j) += ((((h >>> j) & 1L) << 1) - 1).toInt
        j += 1
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < SimhashBits) { if (sums(j) > 0) v |= 1L << j; j += 1 }
    v
  }

  /** Fused q30 kernel: rolling-hash fingerprint + 16-bit SimHash in
    * ONE token pass with each token md5-hashed once. Returns
    * [fp, simhash16]. Value-identical to the declarative pair
    * `TextFns.fingerprint(toks)` / `TextFns.simhash16(toks)` (same
    * tokenization, same hash60, same fold arithmetic) — those HOF
    * folds allocate a boxed 16-wide array per token per row and
    * hash every token twice (measured 2.4 s over 5000 docs at
    * sf0.1); this loop is a single JIT'd pass.
    */
  def fpSimhash16(text: UTF8String): ArrayData = {
    val toks = splitTokens(text)
    val sums = new Array[Int](16)
    var fp = 0L
    var i = 0
    while (i < toks.length) {
      val h = hash60(toks(i).getBytes("UTF-8"))
      fp = (fp * 131 + h % P) % P
      var j = 0
      while (j < 16) {
        sums(j) += ((((h >>> j) & 1L) << 1) - 1).toInt
        j += 1
      }
      i += 1
    }
    var sh = 0L
    var j = 0
    while (j < 16) { if (sums(j) > 0) sh |= 1L << j; j += 1 }
    ArrayData.toArrayData(Array(fp, sh))
  }

  /** Fused Gopher repetition metrics (q126) in ONE pass over the
    * token stream: word counts, bigram counts, and repeated-bigram
    * position coverage via two hash maps and a boolean cover array —
    * O(d) per document. The declarative HOF formulation recomputes
    * `filter(tk, _ === w)` for every DISTINCT token/bigram, which is
    * O(d²) per document: correct and shuffle-free, but quadratic in
    * doc LENGTH — a megabyte document pays ~10⁹ comparisons there vs
    * ~10⁶ hash updates here.
    *
    * Returns (n_tok, top_word_frac, top_bigram_frac, dup_cov_frac)
    * with division order exactly matching the declarative build
    * (`(double)top * 2.0 / (double)n`), so results are bit-identical
    * doubles (KernelSpec parity). Single-token docs (no bigrams)
    * yield a NULL top_bigram_frac, matching `array_max([])`; the
    * declarative dup-coverage would raise on those under ANSI
    * (sequence(1,0) descends through index 0), so the kernel's 0.0 is
    * strictly more defined, never different where both are defined.
    */
  def repMetrics(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = splitTokens(text)
    val n = toks.length
    val wc = new java.util.HashMap[String, Integer]()
    var topWord = 0
    var i = 0
    while (i < n) {
      val c = wc.merge(toks(i), 1, (a, b) => a + b)
      if (c > topWord) topWord = c
      i += 1
    }
    val row = new Array[Any](4)
    row(0) = n
    row(1) = topWord.toDouble / n.toDouble
    if (n < 2) {
      row(2) = null
      row(3) = 0d
    } else {
      val bg = new Array[String](n - 1)
      val bc = new java.util.HashMap[String, Integer]()
      var topBigram = 0
      i = 0
      while (i < n - 1) {
        val g = toks(i) + " " + toks(i + 1)
        bg(i) = g
        val c = bc.merge(g, 1, (a, b) => a + b)
        if (c > topBigram) topBigram = c
        i += 1
      }
      val cover = new Array[Boolean](n)
      var dup = 0
      i = 0
      while (i < n - 1) {
        if (bc.get(bg(i)) >= 2) {
          if (!cover(i)) { cover(i) = true; dup += 1 }
          if (!cover(i + 1)) { cover(i + 1) = true; dup += 1 }
        }
        i += 1
      }
      row(2) = topBigram.toDouble * 2d / n.toDouble
      row(3) = dup.toDouble / n.toDouble
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(row)
  }

  /** Separator between BPE symbols in segmentation strings — shared
    * with CorpusOps' fold-based trainer/applier (symbols are token
    * characters and their concatenations, never this glyph).
    */
  final val BpeSep = "·"

  /** One-slot rank-map cache: the merges array reaches the kernel as
    * the SAME ArrayData instance every row (it is a Literal), so a
    * reference-equality check amortizes the parse to once per task
    * instead of once per row. Volatile pair — concurrent tasks with
    * different literals at worst re-parse (a few µs for thousands of
    * merges), never read a wrong map.
    */
  @volatile private var bpeRanks: (AnyRef, java.util.HashMap[String, Integer]) = _

  private def bpeRankMap(merges: ArrayData): java.util.HashMap[String, Integer] = {
    val cached = bpeRanks
    if (cached != null && (cached._1 eq merges)) return cached._2
    val m = new java.util.HashMap[String, Integer](merges.numElements() * 2)
    var i = 0
    while (i < merges.numElements()) {
      val s = merges.getUTF8String(i).toString // "lft rgt", rank = index
      val sp = s.indexOf(' ')
      m.put(s.substring(0, sp) + " " + s.substring(sp + 1), Integer.valueOf(i))
      i += 1
    }
    bpeRanks = (merges, m)
    m
  }

  /** Greedy BPE APPLY in one pass per word — the production encoder
    * for realistic (10k–100k-entry) merge tables, where the fold
    * applier (CorpusOps.mergeFold: one Catalyst column transform PER
    * MERGE) stops being expressible: a 50k-merge vocabulary would
    * need a 50k-node plan.
    *
    * Algorithm: char-split the word, then repeatedly find the
    * LOWEST-RANK adjacent pair present and merge ALL its
    * leftmost-non-overlapping occurrences, until no tracked pair
    * remains. Cost is O(len² ) map lookups per word, INDEPENDENT of
    * the merge-table size.
    *
    * Produces BIT-IDENTICAL segmentations to applying the merges
    * sequentially in rank order (q150/q152's fold semantics):
    * training creates merge r's pair from symbols that exist at step
    * r, so a pair of rank r can never be (re)created by merging any
    * rank > r — processing the minimal present rank therefore sees
    * exactly the state the sequential pass r would, and a full
    * leftmost-non-overlap merge of that pair IS pass r. KernelSpec
    * pins the equality on adversarial symbol chains; q162 shares
    * q152's DuckDB oracle through it.
    */
  def bpeEncode(word: UTF8String, merges: ArrayData): UTF8String = {
    val w = word.toString
    if (w.isEmpty) return word
    val ranks = bpeRankMap(merges)
    var syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) { syms.add(String.valueOf(w.charAt(i))); i += 1 }
    var done = false
    while (!done && syms.size() > 1) {
      var best = Integer.MAX_VALUE
      var bi = -1
      var j = 0
      while (j < syms.size() - 1) {
        val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r.intValue() < best) { best = r.intValue(); bi = j }
        j += 1
      }
      if (bi < 0) done = true
      else {
        val lf = syms.get(bi)
        val rt = syms.get(bi + 1)
        val out = new java.util.ArrayList[String](syms.size())
        var p = 0
        while (p < syms.size()) {
          if (p + 1 < syms.size() && syms.get(p) == lf && syms.get(p + 1) == rt) {
            out.add(lf + rt); p += 2
          } else { out.add(syms.get(p)); p += 1 }
        }
        syms = out
      }
    }
    UTF8String.fromString(String.join(BpeSep, syms))
  }

  // -----------------------------------------------------------------
  // Column wrappers (StaticInvoke → stays inside whole-stage codegen)
  // -----------------------------------------------------------------

  private val kernelClass: Class[_] = Class.forName("graft.functions.TextKernels")

  /** Expression-level builder — the construction site shared by the
    * Column API below and the SQL FunctionRegistry (GraftExtensions).
    */
  def invokeExpr(name: String, dt: DataType,
    in: org.apache.spark.sql.catalyst.expressions.Expression)
    : org.apache.spark.sql.catalyst.expressions.Expression =
    StaticInvoke(
      kernelClass, dt, name,
      Seq(in),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = false)

  final val bigramSetType: DataType = ArrayType(StringType, containsNull = false)
  final val minhashSigType: DataType = ArrayType(LongType, containsNull = false)
  final val tfEmbeddingType: DataType = ArrayType(FloatType, containsNull = false)

  private def invoke(name: String, dt: DataType, in: Column): Column =
    ColumnBridge.column(invokeExpr(name, dt, ColumnBridge.expression(in)))

  def bigramSetCol(text: Column): Column =
    invoke("bigramSet", bigramSetType, text)

  def trigramSetCol(text: Column): Column =
    invoke("trigramSet", bigramSetType, text)

  def tfEmbeddingCol(text: Column): Column =
    invoke("tfEmbedding", tfEmbeddingType, text)

  /** DuckDB twin of [[tfEmbedding]] over a token-list expression. */
  def tfEmbeddingSql(toksExpr: String): String = {
    val dim = EmbeddingDim
    val bks = s"list_transform($toksExpr, t -> ${TextFns.hash60Sql("t")} % $dim)"
    val w = s"list_transform(generate_series(0, ${dim - 1}), " +
      s"b -> len(list_filter($bks, x -> x = b))::DOUBLE)"
    val ss = s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform($w, x -> x * x)), (a, b) -> a + b)"
    s"CASE WHEN ($ss) > 0 THEN " +
      s"list_transform($w, x -> (x / sqrt($ss))::FLOAT) " +
      s"ELSE list_transform($w, x -> x::FLOAT) END"
  }

  def minhashSigCol(text: Column): Column =
    invoke("minhashSig", minhashSigType, text)

  def simhash60Col(text: Column): Column =
    invoke("simhash60", LongType, text)

  final val fpSimhash16Type: DataType = ArrayType(LongType, containsNull = false)

  def fpSimhash16Col(text: Column): Column =
    invoke("fpSimhash16", fpSimhash16Type, text)

  def hash60StrCol(text: Column): Column =
    invoke("hash60Str", LongType, text)

  final val repMetricsType: DataType = StructType(Seq(
    StructField("n_tok", IntegerType, nullable = false),
    StructField("top_word_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = true),
    StructField("dup_cov_frac", DoubleType, nullable = false)))

  def repMetricsCol(text: Column): Column =
    invoke("repMetrics", repMetricsType, text)

  /** Two-arg StaticInvoke builder — (text, int literal) kernels. */
  def invokeExpr2(name: String, dt: DataType,
    in: org.apache.spark.sql.catalyst.expressions.Expression,
    k: org.apache.spark.sql.catalyst.expressions.Expression)
    : org.apache.spark.sql.catalyst.expressions.Expression =
    StaticInvoke(
      kernelClass, dt, name,
      Seq(in, k),
      inputTypes = Seq(StringType, IntegerType),
      propagateNull = true,
      returnNullable = false)

  final val winHashType: DataType = ArrayType(LongType, containsNull = false)

  def winHashCol(text: Column, k: Int): Column =
    ColumnBridge.column(invokeExpr2("winHash", winHashType,
      ColumnBridge.expression(text),
      org.apache.spark.sql.catalyst.expressions.Literal(k)))

  /** Greedy BPE apply: (word, merges-array) → "·"-joined symbols.
    * `merges` must be an array<string> literal of "lft rgt" entries
    * in rank order (see bpeEncode's one-slot cache contract).
    */
  def bpeEncodeCol(word: Column, merges: Column): Column =
    ColumnBridge.column(StaticInvoke(
      kernelClass, StringType, "bpeEncode",
      Seq(ColumnBridge.expression(word), ColumnBridge.expression(merges)),
      inputTypes = Seq(StringType, ArrayType(StringType)),
      propagateNull = true,
      returnNullable = false))
}
