package graft

import org.apache.spark.sql.functions._
import graft.queries.CorpusOps
import graft.sources.Tables

/** Structural properties of the corpus-curation operators beyond the
  * value-hash oracle: partition-function invariants, cap bounds, and
  * funnel monotonicity.
  */
class CorpusOpsSpec extends SparkTestBase {

  test("q106 split is a partition: every document lands in exactly one split") {
    val rows = CorpusOps.q106(spark, Sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = Tables.documents(spark, Sf).count()
    assert(total == nDocs, "split manifest must cover the corpus exactly once")
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    val train = rows.filter(_.getAs[String]("split") == "train")
      .map(_.getAs[Long]("n_docs")).sum
    assert(train.toDouble / nDocs > 0.85,
      s"train share ${train.toDouble / nDocs} far from the 96% target")
  }

  test("q107 cap binds: n_kept = min(n_docs, cap) and kept tokens <= corpus tokens per source") {
    CorpusOps.q107(spark, Sf).collect().foreach { r =>
      val kept = r.getAs[Long]("n_kept")
      assert(kept == math.min(r.getAs[Long]("n_docs"), CorpusOps.DomainCap.toLong),
        s"source ${r.getAs[String]("source")}: cap must bind exactly")
      assert(r.getAs[Long]("kept_tokens") > 0)
    }
  }

  test("q108 funnel stages are monotone non-increasing") {
    CorpusOps.q108(spark, Sf).collect().foreach { r =>
      val stages = Seq(r.getAs[Long]("n_total"), r.getAs[Long]("pass_length"),
        r.getAs[Long]("pass_repetition"), r.getAs[Long]("pass_lang"))
      assert(stages == stages.sorted.reverse,
        s"funnel must only lose documents: $stages")
      if (r.getAs[String]("lang") == "zh")
        assert(r.getAs[Long]("pass_lang") == 0, "zh is not on the allowlist")
    }
  }

  test("q105 boilerplate ratio is a valid fraction over the doc's own grams") {
    CorpusOps.q105(spark, Sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_boiler") <= r.getAs[Int]("n_grams").toLong)
      val ratio = r.getAs[Double]("boiler_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("q110 upsampling: integer-epoch sources replicate exactly, fractional in range") {
    CorpusOps.q110(spark, Sf).collect().foreach { r =>
      val epochs = r.getAs[Double]("achieved_epochs")
      if (r.getAs[Long]("w_bp") == CorpusOps.BaseEpochBp)
        assert(epochs == 1.0, "1.0-epoch source must emit exactly one copy per doc")
      else {
        assert(epochs >= 2.0 && epochs <= 3.0,
          s"2.75-epoch source outside [2,3]: $epochs")
        assert(r.getAs[Long]("n_emitted") >= 2 * r.getAs[Long]("n_docs"))
      }
    }
  }

  test("q114 scrub: removals bounded by 3x hit count; untouched docs keep their text verbatim") {
    val rows = CorpusOps.q114(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val removed = r.getAs[Int]("n_removed")
      assert(removed >= 0 && removed <= r.getAs[Int]("n_tok"))
    }
    // an untouched doc's cleaned signature is the md5 of its raw text
    val untouched = rows.filter(_.getAs[Int]("n_removed") == 0).map(_.getAs[Long]("doc_id"))
    if (untouched.nonEmpty) {
      val sigs = rows.filter(_.getAs[Int]("n_removed") == 0)
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_sig")).toMap
      Tables.documents(spark, Sf)
        .where(col("doc_id").isin(untouched: _*))
        .select(col("doc_id"), md5(col("text")).as("m")).collect()
        .foreach(r => assert(sigs(r.getLong(0)) == r.getString(1)))
    }
  }

  test("q109 pair counts conserve: sum of pair weights = sum over vocab of cnt*(len-1)") {
    val vocab = Tables.documents(spark, Sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .where(length(col("w")) >= 2)
      .select(sum(col("cnt") * (length(col("w")) - 1))).head().getLong(0)
    val allPairs = CorpusOps.q109(spark, Sf)
    // top-k truncates; re-derive the untruncated total from the same plan
    val total = Tables.documents(spark, Sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .where(length(col("w")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .agg(sum("cnt")).head().getLong(0)
    assert(total == vocab, "every adjacent char position yields exactly one pair")
    assert(allPairs.collect().forall(_.getAs[Long]("pair_count") > 0))
  }

  test("q150 BPE loop reproduces the hand-computed toy vocabulary") {
    import spark.implicits._
    // the classic BPE walkthrough corpus: merges are hand-computed —
    //   pairs: ug 20, pu 17, un 16, hu 15 -> merge 1 = (u,g) 20
    //   then (u,n) 16, then (h,ug) 15, then (p,un) 12
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L),
      ("bun", 4L), ("hugs", 5L)).toDF("w", "cnt")
    val chars = transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1)))
    val seg0 = words.select(array_join(chars, "·").as("seg"), col("cnt"))
    val merges = CorpusOps.bpeTrain(seg0, 4)
    assert(merges == Seq(
      (1, "u", "g", "ug", 20L),
      (2, "u", "n", "un", 16L),
      (3, "h", "ug", "hug", 15L),
      (4, "p", "un", "pun", 12L)))
  }

  test("bpeTrain frees every per-step checkpoint deterministically") {
    import spark.implicits._
    // the storage-metrics proof for the unpersist fix: Dataset
    // .unpersist on a localCheckpoint'd frame is a CacheManager no-op
    // (cleanup would be GC-timing driven); bpeTrain frees the exact
    // pinned RDD via the LogicalRDD handle, so after training the
    // persistent-RDD set must return to its baseline — no orphaned
    // checkpoint blocks awaiting the ContextCleaner. (Deterministic
    // here: forked test suites run sequentially, nothing else
    // persists concurrently.)
    val words = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L),
      ("bun", 4L), ("hugs", 5L)).toDF("w", "cnt")
    val chars = transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1)))
    val seg0 = words.select(array_join(chars, "·").as("seg"), col("cnt"))
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val merges = CorpusOps.bpeTrain(seg0, 4)
    assert(merges.size == 4)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"bpeTrain must unpersist every checkpoint it pinned (leaked: $leaked)")
  }

  test("bpeEncode kernel == rank-order fold for trained tables on arbitrary words") {
    import spark.implicits._
    // q162's correctness hinge: the one-pass greedy encoder (merge
    // the lowest-rank pair present, all leftmost-non-overlapping
    // occurrences, repeat) must segment EXACTLY like applying the
    // trained merges sequentially in rank order (q152's fold). The
    // equivalence relies on the table being TRAINED (a rank-r pair
    // can only use symbols that exist at step r, so later merges can
    // never re-create it) — hence both tables here come from real
    // bpeTrain runs: the classic toy corpus and a random 3-letter
    // corpus whose merges produce overlapping/prefix-heavy symbols.
    val rnd = new scala.util.Random(11)
    def charsOf(c: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), length(c)), i => c.substr(i, lit(1)))
    val corpora: Seq[Seq[(String, Long)]] = Seq(
      Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L)),
      Seq.fill(40)((
        Seq.fill(3 + rnd.nextInt(6))("abc" (rnd.nextInt(3))).mkString,
        (1 + rnd.nextInt(20)).toLong)))
    corpora.zipWithIndex.foreach { case (words, ci) =>
      val seg0 = words.toDF("w", "cnt")
        .groupBy("w").agg(sum("cnt").as("cnt"))
        .select(array_join(charsOf(col("w")), "·").as("seg"), col("cnt"))
      val merges = CorpusOps.bpeTrain(seg0, 8)
      assert(merges.nonEmpty)
      val alphabet = "abcgunshp"
      val testWords = Seq.fill(300)(
        Seq.fill(1 + rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length)))
          .mkString).distinct
      val wdf = testWords.toDF("w")
      val viaFold = merges.foldLeft(
          wdf.select(col("w"), array_join(charsOf(col("w")), "·").as("seg"))) {
          case (d, (_, lf, rt, _, _)) =>
            d.withColumn("seg", CorpusOps.testMergeFold(lf, rt))
        }.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val viaKernel = wdf.select(col("w"),
          graft.functions.TextKernels.bpeEncodeCol(col("w"),
            CorpusOps.mergesLit(merges)).as("seg"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val diff = testWords.filter(w => viaFold(w) != viaKernel(w))
      assert(diff.isEmpty,
        s"corpus $ci: kernel diverged from fold on ${diff.take(5).map(w =>
          s"$w: fold=${viaFold(w)} kernel=${viaKernel(w)}")}")
    }
  }

  test("BPE merge fold is leftmost non-overlapping and delimiter-anchored") {
    import spark.implicits._
    // odd chain: a·a·a·a·a with (a,a) -> aa·aa·a (leftmost pairs);
    // anchor: x·ab must NOT merge (a,b) inside the symbol "ab";
    // merged symbol must not re-match its left half: ab·b with (a,b)
    // stays (the last symbol is "ab", not "a")
    val segs = Seq("a·a·a·a·a", "x·ab", "ab·b").toDF("seg")
    val lf = "a"; val rt = "b"
    val mergedAb = segs.select(col("seg"),
      graft.queries.CorpusOps.testMergeFold(lf, rt).as("m")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mergedAb("x·ab") == "x·ab")
    assert(mergedAb("ab·b") == "ab·b")
    val mergedAa = segs.select(col("seg"),
      graft.queries.CorpusOps.testMergeFold("a", "a").as("m")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mergedAa("a·a·a·a·a") == "aa·aa·a")
  }
}
