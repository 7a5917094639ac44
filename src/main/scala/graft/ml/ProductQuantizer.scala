package graft.ml

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
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

  /** Bytes per stored vector, 4-bit-packed codes. */
  def bytesPerVector: Double =
    m * (math.log(k) / math.log(2)) / 8.0
}

object ProductQuantizer {

  /** Train per-subspace codebooks with seeded k-means. `df` must carry
    * `embCol: array<double>` of fixed dimension divisible by m. The
    * input is coalesced to one partition: seeded k-means is only
    * reproducible for a fixed input order, and codebook training runs
    * on a bounded sample by design. */
  def fit(df: DataFrame, embCol: String = "emb", m: Int = 8, k: Int = 16,
      seed: Long = 42L): ProductQuantizerModel = {
    val dim = df.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val one = df.select(col(embCol)).coalesce(1).cache()
    val codebooks = Array.tabulate(m) { j =>
      val sub = one.select(
        array_to_vector(slice(col(embCol), j * dsub + 1, dsub)).as("v"))
      new KMeans().setK(k).setSeed(seed + j).setFeaturesCol("v")
        .fit(sub).clusterCenters.map(_.toArray)
    }
    one.unpersist()
    ProductQuantizerModel(m, k, dsub, codebooks)
  }
}
