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
    // localCheckpoint (not persist) per superstep: persist caches the
    // DATA but the logical plan still nests one join level per
    // superstep — at O(diameter) supersteps even *stringifying* the
    // plan (event log, explain) is O(2^depth)/OOM territory. Eager
    // checkpoint truncates lineage to the materialized blocks, keeping
    // every superstep's plan shallow no matter how many run.
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node")).localCheckpoint(true)
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
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      // next is materialized (eager checkpoint + the labelSum action) —
      // release the superseded generation's blocks or storage grows
      // O(supersteps × nodes) inside a single query
      org.apache.spark.sql.GraftBridge.uncheckpoint(labels)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      i += 1
    }
    sym.unpersist()
    labels.select(col("node").as("doc_id"), col("comp").as("cluster_id"))
  }

  /** Large-star/small-star connected components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — same output
    * contract as [[connectedComponents]], but alternating large/small
    * star rounds converge in O(log n) REGARDLESS of component
    * diameter, where label propagation needs O(diameter) supersteps.
    * This is the adversarial-chain fallback the 100 TB posture calls
    * for: a transitive near-dup chain of length 10k converges in ~14
    * rounds here vs 10k supersteps there.
    *
    * Each round is two join+aggregate passes over the edge list;
    * driver involvement is one (count, hash-sum) aggregate per round
    * for the fixpoint check.
    */
  def connectedComponentsStar(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // localCheckpoint (not persist): each round's plan embeds the
    // previous one 4× over (symmetrize + two join branches), so after
    // ~10 rounds the LOGICAL PLAN itself is exponentially large —
    // checkpointing truncates lineage to the materialized blocks
    var e = edges
      .select(col("ia").cast("long").as("a"), col("ib").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .distinct().localCheckpoint(true)
    // eager checkpoint, NOT lazy persist: the in-loop uncheckpoint of
    // superseded edge generations drops gen-0's blocks, so allNodes
    // must materialize (and truncate its lineage off gen-0) before the
    // first round runs — a lazy persist would first compute at the
    // final join and find its parent blocks gone
    val allNodes = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node"))).distinct().localCheckpoint(true)
    // fixpoint check: (edge count, order-independent xor of edge
    // hashes — xor, not sum: ANSI mode makes a long sum overflow)
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prevSig = sig(e)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // LARGE-STAR: for each center c, attach every strictly larger
      // neighbor to m = min(N(c) ∪ {c})
      val sym = e.select(col("u").as("c"), col("v").as("n"))
        .union(e.select(col("v").as("c"), col("u").as("n")))
      val mins = sym.groupBy(col("c")).agg(min(col("n")).as("mn"))
        .select(col("c"), least(col("mn"), col("c")).as("m"))
      val ls = sym.join(mins, "c")
        .filter(col("n") > col("c"))
        .select(col("n").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct().persist()
      // SMALL-STAR: for each center u over its smaller neighbors S,
      // attach S ∪ {u} to min(S) (ls edges are already big→small)
      val minsS = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = ls.join(minsS, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .union(minsS.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"),
          least(col("a"), col("b")).as("v"))
        .distinct().localCheckpoint(true)
      val nextSig = sig(next)
      ls.unpersist()
      // release the superseded round's checkpoint blocks (next is
      // already materialized by the eager checkpoint + sig action)
      org.apache.spark.sql.GraftBridge.uncheckpoint(e)
      e = next
      converged = nextSig == prevSig
      prevSig = nextSig
      i += 1
    }
    // at the fixpoint the edges form stars rooted at component minima;
    // min(v) per u guards the not-converged maxIter edge case
    val stars = e.groupBy(col("u")).agg(min(col("v")).as("root"))
    // allNodes' checkpoint blocks stay resident — they are a leaf of
    // the returned (lazy) plan and cannot be recomputed once dropped;
    // SparkEntry.release() reaps them between queries
    allNodes
      .join(stars, col("node") === col("u"), "left")
      .select(col("node").as("doc_id"),
        coalesce(col("root"), col("node")).as("cluster_id"))
  }
}
