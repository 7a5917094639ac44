package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — an operator Spark's DataFrame API lacks
  * (pandas-on-Spark has merge_asof; plain SQL users fall back to range
  * joins). For each left row, attaches the LATEST right row with
  * `right.time <= left.time` within the same key group.
  *
  * Implementation: composed from built-ins per the preference order
  * (SURVEY.md §7.3) — a tagged union sorted by (keys, time, side) and a
  * running `last(_, ignoreNulls)` window carries the most recent right
  * payload forward onto left rows. Cost: ONE shuffle on the keys + a
  * per-partition sort — never the O(left × right-per-key) intermediate a
  * naive range join materializes, so it survives 100 TB event tables.
  * Right rows sort before left rows at equal timestamps (inclusive
  * `>=` semantics, matching DuckDB/QuestDB ASOF).
  *
  * Contract: (keys, rightTime) must be unique in `right` (pre-aggregate
  * duplicates first) — otherwise which same-timestamp right row wins is
  * tie-broken arbitrarily.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightPrefix: String = "asof_"): DataFrame = {
    val leftPayload = left.columns
      .filterNot(c => keys.contains(c) || c == leftTime).toSeq
    val rightPayload = right.columns
      .filterNot(c => keys.contains(c) || c == rightTime).toSeq

    def nullOf(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType)

    val lNorm = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftPayload.map(col) ++
        Seq(nullOf(right, rightTime).as(rightPrefix + rightTime)) ++
        rightPayload.map(c => nullOf(right, c).as(rightPrefix + c)): _*)
    val rNorm = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftPayload.map(c => nullOf(left, c).as(c)) ++
        Seq(col(rightTime).as(rightPrefix + rightTime)) ++
        rightPayload.map(c => col(c).as(rightPrefix + c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = (rightTime +: rightPayload).foldLeft(lNorm.union(rNorm)) {
      case (df, c) =>
        df.withColumn(rightPrefix + c,
          last(col(rightPrefix + c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftPayload.map(col) ++
        (rightTime +: rightPayload).map(c => col(rightPrefix + c)): _*)
  }
}
