package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Driver-side fit of a small classification head on
  * distributed-extracted features, then broadcast scoring — the
  * fit-then-distributed-inference pattern of the reference's DenseNet
  * transfer learning (radiography_analysis.py:226–310): Keras trains
  * on the driver from collected features (:226–290), saves the model
  * artifact (:285), and a pandas UDF broadcast-scores the corpus
  * (:307–326). The head here is multinomial softmax regression by
  * deterministic full-batch gradient descent (zero init, fixed step
  * and iteration count, caller-pinned input order) — a small JVM
  * model standing in for the Keras head with the same data flow:
  *
  *   distributed feature pass → BOUNDED driver-side collect → fit →
  *   save/load artifact (K4) → scorer closure → mapPartitions (D12)
  *
  * Scale: the collect is the fine-tune sample (limit(n)), never the
  * corpus; the artifact is O(classes × dim) doubles; scoring is
  * stateless map-side work through BatchInference.
  */
object TransferHead {

  /** Softmax head: `w` is row-major (classes × dim), `b` per class. */
  case class Head(dim: Int, classes: Int, w: Array[Double], b: Array[Double]) {
    override def equals(o: Any): Boolean = o match {
      case h: Head => h.dim == dim && h.classes == classes &&
        java.util.Arrays.equals(h.w, w) && java.util.Arrays.equals(h.b, b)
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(w)
  }

  /** The scorer-side feature map: byte-stats of the payload scaled to
    * [0, 1] — the same (min, max, mean, population-std) the
    * distributed BinKernels.byteStats pass produces, so driver
    * training features and executor scoring features agree exactly.
    */
  def features(bytes: Array[Byte]): Array[Double] = {
    var s1 = 0L; var s2 = 0L; var mn = 255; var mx = 0
    bytes.foreach { b =>
      val v = b & 0xff
      s1 += v; s2 += v.toLong * v
      if (v < mn) mn = v
      if (v > mx) mx = v
    }
    val n = math.max(bytes.length, 1)
    val mean = s1.toDouble / n
    val std = math.sqrt(math.max(0.0, s2.toDouble / n - mean * mean))
    Array(mn / 255.0, mx / 255.0, mean / 255.0, std / 255.0)
  }

  private def softmax(z: Array[Double]): Array[Double] = {
    val m = z.max
    val e = z.map(v => math.exp(v - m))
    val s = e.sum
    e.map(_ / s)
  }

  /** Deterministic full-batch gradient descent on softmax
    * cross-entropy: zero-initialized, `iters` fixed steps of rate
    * `lr`. The result depends only on (xs, ys) CONTENT AND ORDER —
    * callers collecting from a shuffle must sort before fitting.
    */
  def fit(xs: Array[Array[Double]], ys: Array[Int], classes: Int,
    iters: Int = 300, lr: Double = 0.5): Head = {
    require(xs.nonEmpty && xs.length == ys.length, "empty or ragged training set")
    val dim = xs(0).length
    val w = Array.fill(classes * dim)(0.0)
    val b = Array.fill(classes)(0.0)
    val n = xs.length
    var it = 0
    while (it < iters) {
      val gw = Array.fill(classes * dim)(0.0)
      val gb = Array.fill(classes)(0.0)
      var i = 0
      while (i < n) {
        val x = xs(i)
        val z = Array.tabulate(classes) { c =>
          var s = b(c); var j = 0
          while (j < dim) { s += w(c * dim + j) * x(j); j += 1 }
          s
        }
        val p = softmax(z)
        var c = 0
        while (c < classes) {
          val g = p(c) - (if (ys(i) == c) 1.0 else 0.0)
          gb(c) += g
          var j = 0
          while (j < dim) { gw(c * dim + j) += g * x(j); j += 1 }
          c += 1
        }
        i += 1
      }
      var k = 0
      while (k < classes * dim) { w(k) -= lr * gw(k) / n; k += 1 }
      var c = 0
      while (c < classes) { b(c) -= lr * gb(c) / n; c += 1 }
      it += 1
    }
    Head(dim, classes, w, b)
  }

  /** K4 model artifact sink: plain text (readable, versionable),
    * doubles serialized via raw long bits so load() round-trips
    * bit-exactly.
    */
  def save(h: Head, path: String): Unit = {
    val lines = Seq(s"${h.dim} ${h.classes}",
      h.w.map(d => java.lang.Double.doubleToLongBits(d).toString).mkString(" "),
      h.b.map(d => java.lang.Double.doubleToLongBits(d).toString).mkString(" "))
    Files.write(Paths.get(path),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** K4 model artifact source. */
  def load(path: String): Head = {
    val lines = new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8).split('\n')
    val Array(dim, classes) = lines(0).split(' ').map(_.toInt)
    def longs(s: String) =
      s.split(' ').map(t => java.lang.Double.longBitsToDouble(t.toLong))
    Head(dim, classes, longs(lines(1)), longs(lines(2)))
  }

  /** Batch scorer over raw payloads for BatchInference: features →
    * softmax probabilities. The head is captured by value — on a real
    * cluster the closure ships once per task and the model loads
    * once per partition (BatchInference's contract).
    */
  def scorer(h: Head): Array[Array[Byte]] => Array[Array[Float]] =
    (batch: Array[Array[Byte]]) => batch.map { bytes =>
      val x = features(bytes)
      val z = Array.tabulate(h.classes) { c =>
        var s = h.b(c); var j = 0
        while (j < h.dim) { s += h.w(c * h.dim + j) * x(j); j += 1 }
        s
      }
      softmax(z).map(_.toFloat)
    }
}
