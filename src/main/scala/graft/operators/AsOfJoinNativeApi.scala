package graft.operators

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col

import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}

/** User-facing entry for the NATIVE as-of join (custom LogicalPlan +
  * Strategy + exec — see graft.plans.AsOfJoinNative). Same contract as
  * [[AsOfJoin.asofJoin]]: left-outer, inclusive `>=`, (keys, rightTime)
  * unique in `right`. Output columns: left's, then rightTime and right
  * payload prefixed with `rightPrefix`.
  */
object AsOfJoinNativeApi {

  /** Idempotently make the planner strategy available on a live session
    * (the spark.sql.extensions route via GraftExtensions covers
    * sessions built from config). */
  private def ensureStrategy(df: DataFrame): Unit = {
    val spark = df.sparkSession
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[AsOfJoinStrategy]))
      spark.experimental.extraStrategies = cur :+ new AsOfJoinStrategy
  }

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightPrefix: String = "asof_"): DataFrame = {
    ensureStrategy(left)
    // alias every right column: fresh attribute ids (safe self-joins)
    // and the output naming contract in one step
    val renamedRight = right.select(right.columns.map { c =>
      if (keys.contains(c)) col(c).as(s"__rk_$c")
      else col(c).as(rightPrefix + c)
    }.toSeq: _*)
    val lPlan = GraftBridge.analyzedPlan(left)
    val rPlan = GraftBridge.analyzedPlan(renamedRight)
    def attr(plan: LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    // the exec merges on getLong over the time slot, so only long-backed
    // time types are admissible — reject anything else here rather than
    // silently misreading bytes at execution time
    def requireLongBacked(a: org.apache.spark.sql.catalyst.expressions.Attribute): a.type = a.dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.LongType => a
      case dt => throw new IllegalArgumentException(
        s"asofJoin time column ${a.name} has type ${dt.simpleString}; " +
          "expected timestamp, timestamp_ntz, or bigint")
    }
    val node = AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)),
      keys.map(k => attr(rPlan, s"__rk_$k")),
      requireLongBacked(attr(lPlan, leftTime)),
      requireLongBacked(attr(rPlan, rightPrefix + rightTime)))
    GraftBridge.ofRows(left.sparkSession, node)
      .drop(keys.map(k => s"__rk_$k"): _*)
  }
}
