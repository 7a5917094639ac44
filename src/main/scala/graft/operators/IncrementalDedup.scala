package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection: find every Jaccard pair that
  * TOUCHES a small "new batch" of documents, against an arbitrarily
  * large existing corpus — the daily-ingest shape of a training-data
  * pipeline (dedupe today's crawl against the lake; reference surface:
  * Data_transform.py has no incremental path, this is engine extension).
  *
  * Scale design: the full self-join (d28) shuffles EVERY exploded
  * shingle of the corpus. Here only the new batch's shingles matter —
  * a candidate pair must share ≥1 shingle with a new doc — so the
  * corpus side is PRE-FILTERED against the new batch's shingle-hash
  * set before any shuffle:
  *
  *  - `semi`:  broadcast left-semi join on the distinct new-side
  *    hashes. Exact pruning, fully codegen'd, zero shuffle for the
  *    pruned rows; right for new batches whose distinct shingle set
  *    fits the broadcast budget (millions of 8-byte hashes).
  *  - `bloom`: a driver-built bloom filter over the same hashes
  *    (`df.stat.bloomFilter`), broadcast and probed per row. ~10 bits
  *    per element at 1% FP instead of 64 — an order of magnitude less
  *    broadcast traffic when the new batch is itself large. False
  *    positives only admit extra CANDIDATES; the exact confirm on full
  *    shingle sets removes them, so output is bit-identical to `semi`.
  *    The probe runs through Spark's codegen'd BloomFilterMightContain
  *    expression (the one its runtime bloom joins plan — registered by
  *    name since 4.1 doesn't expose it), map-side pre-shuffle where
  *    its cost is dwarfed by the shuffle bytes it saves.
  *  - `none`:  no pruning (baseline for shuffle-volume comparisons).
  *
  * StressBench's `incremental_*` scenarios measure the shuffle-record
  * cut of each mode at a 1k-new vs 100k-corpus split with identical
  * outputs; registry query d35 oracle-checks the `semi` mode.
  *
  * @param sh   (doc_id, shingles: array<string>, is_new: boolean) —
  *             one row per doc, full corpus INCLUDING the new batch
  * @param minJ emit pairs with Jaccard >= minJ
  */
object IncrementalDedup {

  def pairs(sh: DataFrame, minJ: Double, prefilter: String = "semi",
      expectedNewShingles: Long = 1000000L): DataFrame = {
    val shP = sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ex = shP.select(col("doc_id"), col("is_new"),
      explode(col("shingles")).as("sstr"))
      .select(col("doc_id"), col("is_new"), xxhash64(col("sstr")).as("sv"))
    val newEx = ex.filter(col("is_new"))
    val pruned: DataFrame = prefilter match {
      case "none" => ex
      case "semi" =>
        ex.join(broadcast(newEx.select(col("sv")).distinct()), Seq("sv"),
          "left_semi")
      case "bloom" =>
        val bf = newEx.stat.bloomFilter("sv", expectedNewShingles, 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        // probe through Spark's own codegen'd BloomFilterMightContain
        // (what its runtime bloom joins plan) instead of a boxing scala
        // UDF: the serialized filter rides as a BINARY literal exactly
        // like the engine's injected runtime filters do
        graft.functions.VectorFunctions.register(ex.sparkSession)
        ex.filter(call_function("bloom_might_contain",
          lit(bos.toByteArray), col("sv")))
      case other => throw new IllegalArgumentException(
        s"prefilter must be none|semi|bloom, got $other")
    }
    // candidate = (new doc, any doc) sharing a shingle; normalize the
    // pair so ia < ib regardless of which side is new
    val cands = newEx.select(col("doc_id").as("na"), col("sv"))
      .join(pruned.select(col("doc_id").as("nb"), col("sv").as("svb")),
        col("sv") === col("svb") && col("na") =!= col("nb"))
      .select(least(col("na"), col("nb")).as("ia"),
        greatest(col("na"), col("nb")).as("ib"))
      .distinct()
    // exact confirm on the FULL shingle sets (pre-filtering and banding
    // only shape candidate generation, never the score)
    val confirmed = cands
      .join(shP.select(col("doc_id").as("ia"), col("shingles").as("sa")), "ia")
      .join(shP.select(col("doc_id").as("ib"), col("shingles").as("sb")), "ib")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jac", col("inter") /
        (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("jac") >= minJ)
      .select(col("ia"), col("ib"), round(col("jac"), 4).as("jaccard"))
    confirmed
  }

  /** Convenience: mark `isNew` by a doc_id threshold. */
  def markNew(sh: DataFrame, threshold: Column): DataFrame =
    sh.withColumn("is_new", col("doc_id") >= threshold)
}
