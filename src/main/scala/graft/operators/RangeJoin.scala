package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the second classic operator Spark's
  * DataFrame API lacks (a raw `BETWEEN` join plans as
  * BroadcastNestedLoop/cartesian + filter, which dies at scale).
  *
  * Composition: quantize the value axis into buckets of width `w`.
  * Each interval [lo, hi] replicates to every bucket it overlaps
  * (`explode(sequence(...))`), each point lands in exactly one bucket —
  * then an ordinary equi-join on the bucket id + an exact BETWEEN
  * filter. Shuffle volume is O(points + intervals × span/w), never the
  * cross product; `w` trades replication against bucket selectivity
  * (set it near the median interval span).
  *
  * Contract: column names of `left` and `right` must be disjoint.
  */
object RangeJoin {

  def pointInInterval(left: DataFrame, right: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    val lb = left.withColumn("__b",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val rb = right.withColumn("__b",
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    lb.join(rb, "__b")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__b")
  }
}
