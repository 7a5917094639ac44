package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate edge list — the dedup
  * CLUSTERING step: group mutually-similar documents so one canonical
  * doc per component survives (min id here).
  *
  * Algorithm: iterative min-label propagation — each superstep every
  * node adopts the smallest component label among itself and its
  * neighbors; converges in O(component diameter) supersteps, each one
  * shuffle-join + aggregate. Near-dup components have tiny diameters
  * (pairs/small cliques), so this terminates in 1-3 supersteps; for
  * adversarial long chains at 100 TB swap in the large-star/small-star
  * variant (same join primitive, logarithmic rounds).
  *
  * Driver involvement is one `count()` per superstep (the convergence
  * check) — labels/edges themselves never leave the executors.
  */
object DedupClustering {

  def connectedComponents(edges: DataFrame, maxIter: Int = 10): DataFrame = {
    val sym = edges
      .select(col("ia").cast("long").as("src"), col("ib").cast("long").as("dst"))
      .union(edges
        .select(col("ib").cast("long").as("src"), col("ia").cast("long").as("dst")))
      .distinct().persist()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node")).persist()
    // labels only ever decrease, so sum(comp) strictly decreases iff any
    // label changed — convergence is one cheap aggregate per superstep
    // instead of a self-join diff
    def labelSum(df: DataFrame): Long =
      df.agg(sum(col("comp"))).head().getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val prop = sym
        .join(labels.select(col("node").as("src"), col("comp")), "src")
        .groupBy(col("dst")).agg(min(col("comp")).as("ncomp"))
      val next = labels
        .join(prop, col("node") === col("dst"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .persist()
      val nextSum = labelSum(next)
      labels.unpersist()
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      i += 1
    }
    sym.unpersist()
    labels.select(col("node").as("doc_id"), col("comp").as("cluster_id"))
  }
}
