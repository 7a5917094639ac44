package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle enumeration over a canonical undirected edge list
  * (columns `ia < ib`, one row per edge). Both variants emit each
  * triangle exactly once as (a, b, c) with a < b < c — identical
  * output, different scale behavior:
  *
  *  - [[idOrdered]] — the classic two-path + closure join keyed by
  *    vertex id (Suri & Vassilvitskii's MapReduce pattern). Simple and
  *    oracle-transparent, but the two-path fan-out from a vertex is
  *    quadratic in its out-degree under ID order: a low-id hub with
  *    degree d materializes d(d-1)/2 candidate paths.
  *
  *  - [[degreeOrdered]] — the production variant: vertices rank by
  *    (degree, id) and every edge orients from the lower-ranked
  *    endpoint to the higher. Each triangle is then found exactly once
  *    at its LOWEST-ranked vertex, and a vertex's oriented out-degree
  *    is bounded by the graph degeneracy (arboricity) — a degree-10⁶
  *    hub contributes ZERO two-paths because all its edges point
  *    inward. Total candidate paths are O(m^1.5) worst-case instead of
  *    sum-of-d² (Chiba–Nishizeki bound); StressBench plants a hub and
  *    measures the gap. Costs one extra degree aggregate + two
  *    broadcast-able joins over the edge list.
  */
object Triangles {

  /** Two-path + closure under vertex-id order: path (a,b)+(b,c) with
    * a < b < c, closed by edge (a,c). `edges` must be persisted by the
    * caller if reuse across the three branches matters. */
  def idOrdered(edges: DataFrame): DataFrame =
    idOrderedPaths(edges)
      .join(edges.select(col("ia").as("a3"), col("ib").as("c3")),
        col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))

  /** The candidate two-paths of the id-ordered variant — exposed so
    * StressBench can measure the structural fan-out the orientation
    * pays before the closure join prunes it. */
  private[graft] def idOrderedPaths(edges: DataFrame): DataFrame =
    edges.select(col("ia").as("a"), col("ib").as("b"))
      .join(edges.select(col("ia").as("b2"), col("ib").as("c")),
        col("b") === col("b2"))

  /** The candidate two-paths under (degree, id) orientation — each
    * unordered {y, z} destination pair of a common lowest-ranked
    * source emitted once. Shared by [[degreeOrdered]] and the
    * StressBench fan-out measurement. */
  private[graft] def degreeOrientedPaths(edges: DataFrame): DataFrame = {
    val deg = edges.select(explode(array(col("ia"), col("ib"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // orient low-rank → high-rank; carry the destination's rank so the
    // two-path join needs no further degree lookup
    val oriented = edges
      .join(deg.select(col("v").as("ia"), col("deg").as("da")), "ia")
      .join(deg.select(col("v").as("ib"), col("deg").as("db")), "ib")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("ia") < col("ib")),
          col("ia")).otherwise(col("ib")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("ia") < col("ib")),
          col("ib")).otherwise(col("ia")).as("dst"),
        greatest(col("da"), col("db")).as("ddeg"))
    oriented
      .select(col("src"), col("dst").as("y"), col("ddeg").as("dy"))
      .join(oriented.select(col("src").as("src2"), col("dst").as("z"),
        col("ddeg").as("dz")),
        col("src") === col("src2") &&
          (col("dy") < col("dz") ||
            (col("dy") === col("dz") && col("y") < col("z"))))
  }

  /** Two-path + closure under (degree, id) order — each triangle is
    * charged to its lowest-ranked vertex, so hub fan-out is bounded by
    * degeneracy instead of degree. */
  def degreeOrdered(edges: DataFrame): DataFrame = {
    // closure against the canonical undirected list, then canonical
    // id-sorted output — identical rows to idOrdered
    degreeOrientedPaths(edges)
      .join(edges,
        least(col("y"), col("z")) === col("ia") &&
          greatest(col("y"), col("z")) === col("ib"))
      .select(
        least(col("src"), col("ia")).as("a"),
        (col("src") + col("y") + col("z") -
          least(col("src"), col("ia")) -
          greatest(col("src"), col("ib"))).as("b"),
        greatest(col("src"), col("ib")).as("c"))
  }
}
