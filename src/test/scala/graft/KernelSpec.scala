package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFns, TextKernels}
import graft.functions.TextFns._
import graft.sources.Tables

/** Parity: the native StaticInvoke kernels must produce exactly the
  * values of the declarative (oracle-checked) expression pipeline on
  * the real corpus.
  */
class KernelSpec extends SparkTestBase {

  private lazy val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))

  test("bigramSet kernel == declarative array_distinct(shingles)") {
    val mismatch = docs.select(
        TextKernels.bigramSetCol(col("text")).as("k"),
        array_distinct(shingles(tokens(col("text")), 2)).as("d"))
      .filter(not(col("k") === col("d")))
      .count()
    assert(mismatch == 0)
  }

  test("trigramSet kernel == declarative array_distinct(shingles(3))") {
    // q121's shingle basis — includes the <3-token degenerate docs,
    // which must yield empty arrays on both paths
    val withEdge = docs.unionByName(
      spark.createDataFrame(Seq((9001L, ""), (9002L, "solo"), (9003L, "two tokens")))
        .toDF("doc_id", "text"))
    val mismatch = withEdge.select(
        TextKernels.trigramSetCol(col("text")).as("k"),
        array_distinct(shingles(tokens(col("text")), 3)).as("d"))
      .filter(not(col("k") === col("d")))
      .count()
    assert(mismatch == 0)
  }

  test("winHash kernel == declarative transform(shingles(k), hash60)") {
    // q127's window-hash basis — include <k-token docs (empty array
    // on both paths) and a k-exact doc (single window)
    val withEdge = docs.unionByName(
      spark.createDataFrame(Seq((9001L, ""), (9002L, "just a few tokens"),
        (9003L, "one two three four five six seven eight nine ten")))
        .toDF("doc_id", "text"))
    val mismatch = withEdge.select(
        TextKernels.winHashCol(col("text"), 10).as("k"),
        transform(shingles(tokens(col("text")), 10), w => hash60(w)).as("d"))
      .filter(not(col("k") === col("d")))
      .count()
    assert(mismatch == 0)
  }

  test("repMetrics kernel == declarative Gopher metrics, bit-exact doubles") {
    // q126's basis: the O(d) hash-pass kernel must equal the O(d²)
    // declarative HOF build double-for-double (division order is
    // mirrored in the kernel, so equality is bitwise, not epsilon).
    // Edge docs: 2 tokens (single bigram, no repeats) and a fully
    // repetitive doc (everything covered). Single-token docs are
    // excluded — the declarative dup-coverage raises on them under
    // ANSI (sequence(1,0) descends through index 0) while the kernel
    // defines them; that asymmetry is documented at the kernel.
    val withEdge = docs.unionByName(
      spark.createDataFrame(Seq((9002L, "two tokens"),
        (9003L, "a b a b a b a b"), (9004L, "x x x")))
        .toDF("doc_id", "text"))
    val mismatch = withEdge.select(
        TextKernels.repMetricsCol(col("text")).as("k"),
        graft.queries.CurationOps.repMetricsDeclarative.as("d"))
      .filter(not(col("k") === col("d")))
      .count()
    assert(mismatch == 0)
  }

  test("minhashSig kernel == declarative minhashSig") {
    val mismatch = docs.select(
        TextKernels.minhashSigCol(col("text")).as("k"),
        TextFns.minhashSig(array_distinct(shingles(tokens(col("text")), 2))).as("d"))
      .filter(not(col("k") === col("d")))
      .count()
    assert(mismatch == 0)
  }

  test("hash60Str kernel == declarative conv(substring(md5)) chain") {
    val mismatch = docs.select(
        TextKernels.hash60StrCol(col("text")).as("k"),
        TextFns.hash60(col("text")).as("d"))
      .filter(not(col("k") === col("d")))
      .count()
    assert(mismatch == 0)
  }

  test("fpSimhash16 kernel == declarative fingerprint + simhash16") {
    val mismatch = docs.select(
        TextKernels.fpSimhash16Col(col("text")).as("k"),
        array(TextFns.fingerprint(tokens(col("text"))),
          TextFns.simhash16(tokens(col("text")))).as("d"))
      .filter(not(col("k") === col("d")))
      .count()
    assert(mismatch == 0)
  }

  test("dot product: declarative == StaticInvoke kernel == codegen expression (bitwise)") {
    val emb = Tables.embeddings(spark, Sf)
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("embedding").as("b")).limit(5))
    val mismatch = pairs.select(
        graft.functions.VecFns.dot(col("a"), col("b")).as("d"),
        graft.functions.VecFns.dotColInvoke(col("a"), col("b")).as("k"),
        graft.functions.VecFns.dotCol(col("a"), col("b")).as("g"))
      .filter(not(col("d") === col("k")) || not(col("d") === col("g"))) // bit-exact
      .count()
    assert(mismatch == 0)
  }

  test("DotProductFloat: null propagation + interpreted eval parity") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1f, 2f, 3f)), Some(Seq(4f, 5f, 6f))),
      (None, Some(Seq(1f, 1f, 1f))),
      (Some(Seq(1f, 1f, 1f)), None))
      .toDF("a", "b")
    val rows = df.select(graft.functions.VecFns.dotCol(col("a"), col("b")).as("d"))
      .collect()
    assert(rows(0).getDouble(0) == (4.0 + 10.0 + 18.0))
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))
    // interpreted path (eval) must agree with codegen
    val e = org.apache.spark.sql.graftbridge.DotProductFloat(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1f, 2f, 3f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(4f, 5f, 6f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null) == 32.0)
  }

  test("DotProductFloat: mixed FLOAT x DOUBLE arrays equal the declarative cast fold") {
    import spark.implicits._
    val df = Seq((Seq(1.5f, -2.25f, 3.125f), Seq(0.5, 4.0, -1.25)))
      .toDF("f", "d")
    val row = df.select(
        graft.functions.VecFns.dotCol(col("f"), col("d")).as("g"),
        graft.functions.VecFns.dot(col("f"), col("d")).as("ref"),
        graft.functions.VecFns.dotCol(col("d"), col("f")).as("swapped"))
      .head()
    assert(row.getDouble(0) == row.getDouble(1))
    assert(row.getDouble(2) == row.getDouble(1))
    assert(row.getDouble(0) == (1.5 * 0.5 + -2.25 * 4.0 + 3.125 * -1.25))
  }

  test("minhash_merge: empty/all-null group sketches to the all-P sentinel") {
    import spark.implicits._
    // a group whose signatures are all null must equal an empty
    // document's signature (all-P), not Long.MaxValue
    val df = Seq(("g", Option.empty[Seq[Long]]), ("g", None)).toDF("k", "sig")
      .select(col("k"), col("sig").cast("array<long>").as("sig"))
      .groupBy("k")
      .agg(graft.functions.MinHashMerge.minhashMerge(col("sig")).as("merged"))
    val merged = df.head().getAs[scala.collection.Seq[Long]]("merged")
    assert(merged.forall(_ == TextFns.P))
  }

  test("hash60 kernel == conv(substring(md5,1,15),16,10)") {
    val rows = docs.limit(50)
      .select(col("text"), conv(substring(md5(col("text")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .collect()
    rows.foreach { row =>
      val expect = row.getLong(1)
      val got = TextKernels.hash60(row.getString(0).getBytes("UTF-8"))
      assert(got == expect, s"hash60 mismatch for ${row.getString(0).take(30)}")
    }
  }
}
