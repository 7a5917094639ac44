package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.IntegerType

import graft.plans.{TopKPerKeyPlan, TopKPerKeyStrategy}

/** User-facing entry for the NATIVE top-k-per-key operator
  * (graft.plans.TopKPerKeyNative): the k best rows per key group under
  * `order`, ranked 1..k in an `IntegerType` column `rankName` — the
  * same output contract as `row_number().over(window).filter(<= k)`,
  * without the per-partition sort that composition requires.
  */
object TopKPerKeyApi {

  private def ensureStrategy(df: DataFrame): Unit = {
    val spark = df.sparkSession
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[TopKPerKeyStrategy]))
      spark.experimental.extraStrategies = cur :+ new TopKPerKeyStrategy
  }

  /** @param order (column, ascending) pairs; must form a total order
    *              (add a tiebreaker) for deterministic ranks. */
  def topKPerKey(df: DataFrame, keys: Seq[String],
      order: Seq[(String, Boolean)], k: Int,
      rankName: String = "rnk"): DataFrame = {
    ensureStrategy(df)
    val plan = GraftBridge.analyzedPlan(df)
    def attr(p: LogicalPlan, name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val sortOrders = order.map { case (c, asc) =>
      SortOrder(attr(plan, c), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    GraftBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(plan, keys.map(attr(plan, _)), sortOrders, k, rankAttr))
  }
}
