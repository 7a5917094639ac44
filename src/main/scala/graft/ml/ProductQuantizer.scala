package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for embedding columns — the compression tier
  * below int8 scalar quantization (s39): split each d-dim vector into
  * `m` subvectors, learn a `k`-centroid codebook per subspace (seeded
  * k-means), and store each vector as `m` small codes. With m=8, k=16
  * a 64-dim float vector (256 B) becomes 8 4-bit codes (4 B packed) —
  * 64× compression.
  *
  * Search uses ASYMMETRIC distance (ADC): the query stays uncompressed;
  * per query a m×k lookup table of exact subspace distances to every
  * centroid is built driver-side (tiny: m·k doubles), enters the plan
  * as a literal, and each corpus vector's approximate distance is m
  * table lookups over its codes — no decompression, no per-row UDF:
  * encode and ADC are both Catalyst higher-order-function expressions.
  *
  * 100 TB posture: codebooks train on a bounded sample (here the
  * per-SF table, coalesced for seeded determinism); encode is a
  * map-only pass; ADC search broadcasts the query LUTs and scans codes
  * (4 B/vector instead of 256 B — the scan is what shrinks).
  */
case class ProductQuantizerModel(m: Int, k: Int, dsub: Int,
    codebooks: Array[Array[Array[Double]]]) {

  /** Append `codeCol`: array<int> of length m, code j = index of the
    * nearest subspace-j centroid (first-min tie-break, deterministic). */
  def encode(df: DataFrame, embCol: String = "emb",
      codeCol: String = "pq_code"): DataFrame = {
    val codes = (0 until m).map { j =>
      val cb = typedlit(codebooks(j).map(_.toSeq).toSeq)
      val sub = slice(col(embCol), j * dsub + 1, dsub)
      val dists = transform(cb, c =>
        aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, v) => a + v))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    df.withColumn(codeCol, array(codes: _*))
  }

  /** Exact squared-L2 distances from `query` to every subspace
    * centroid: lut(j)(c). Built driver-side per query (m×k doubles). */
  def lut(query: Array[Double]): Seq[Seq[Double]] =
    Seq.tabulate(m) { j =>
      Seq.tabulate(k) { c =>
        var s = 0.0
        var i = 0
        while (i < dsub) {
          val d = query(j * dsub + i) - codebooks(j)(c)(i)
          s += d * d
          i += 1
        }
        s
      }
    }

  /** Approximate squared-L2 via m lookups: sum_j lutCol[j][code[j]]. */
  def adc(lutCol: Column, codeCol: Column): Column =
    aggregate(
      zip_with(codeCol, sequence(lit(0), lit(m - 1)),
        (c, j) => element_at(element_at(lutCol, j + 1), c + 1)),
      lit(0.0), (a, v) => a + v)

  /** ADC as the NATIVE codegen'd expression
    * ([[graft.functions.PqAdcDistance]]) — one fused loop over the
    * codes with the codebooks as a reference object, no per-query LUT
    * column and no interpreted lambdas. Identical accumulation order to
    * [[adc]], so results are bitwise-equal. */
  def adcNative(codeCol: Column, qembCol: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.PqAdcDistance(
        org.apache.spark.sql.GraftBridge.expression(codeCol),
        org.apache.spark.sql.GraftBridge.expression(qembCol),
        codebooks.map(_.map(_.toSeq).toSeq).toSeq))

  /** Bytes per stored vector, 4-bit-packed codes. */
  def bytesPerVector: Double =
    m * (math.log(k) / math.log(2)) / 8.0
}

object ProductQuantizer {

  /** Train per-subspace codebooks: seeded k-means++ init + Lloyd's
    * iterations, run DRIVER-SIDE over a deterministic bounded sample
    * (sorted by vector value, capped at `sampleSize` — ~0.5 MB of
    * doubles). Codebook training on a bounded sample is the standard
    * PQ recipe at any corpus size, and keeping it off the cluster makes
    * the fitted centroids independent of input partitioning — they can
    * enter any engine's plan as literals. Centroids are rounded to 6 dp
    * for cross-engine literal portability. */
  def fit(df: DataFrame, embCol: String = "emb", m: Int = 8, k: Int = 16,
      seed: Long = 42L, sampleSize: Int = 2048): ProductQuantizerModel = {
    val sample = df.select(col(embCol)).orderBy(col(embCol))
      .limit(sampleSize).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val codebooks = Array.tabulate(m) { j =>
      val pts = sample.map(v =>
        java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      lloyd(pts, k, new scala.util.Random(seed + j))
        .map(_.map(x => math.rint(x * 1e6) / 1e6))
    }
    ProductQuantizerModel(m, k, dsub, codebooks)
  }

  private def lloyd(pts: Array[Array[Double]], k: Int,
      rng: scala.util.Random, iters: Int = 20): Array[Array[Double]] = {
    val d = pts.head.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    // k-means++ seeding: next center drawn ∝ squared distance to the
    // nearest already-chosen one
    val centers = Array.ofDim[Array[Double]](k)
    centers(0) = pts(rng.nextInt(pts.length)).clone()
    for (c <- 1 until k) {
      val dists = pts.map(p => (0 until c).map(ci => d2(p, centers(ci))).min)
      val total = dists.sum
      if (total == 0) centers(c) = pts(rng.nextInt(pts.length)).clone()
      else {
        var r = rng.nextDouble() * total
        var i = 0
        while (i < pts.length - 1 && r > dists(i)) { r -= dists(i); i += 1 }
        centers(c) = pts(i).clone()
      }
    }
    val assign = Array.fill(pts.length)(-1)
    var it = 0
    var moved = true
    while (it < iters && moved) {
      moved = false
      var p = 0
      while (p < pts.length) {
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          val dd = d2(pts(p), centers(c))
          if (dd < bd) { bd = dd; best = c }
          c += 1
        }
        if (assign(p) != best) { assign(p) = best; moved = true }
        p += 1
      }
      if (moved) {
        val sums = Array.fill(k, d)(0.0)
        val cnt = Array.fill(k)(0)
        for (p <- pts.indices) {
          val a = assign(p)
          cnt(a) += 1
          var i = 0
          while (i < d) { sums(a)(i) += pts(p)(i); i += 1 }
        }
        for (c <- 0 until k if cnt(c) > 0) {
          var i = 0
          while (i < d) { centers(c)(i) = sums(c)(i) / cnt(c); i += 1 }
        }
      }
      it += 1
    }
    centers
  }
}
