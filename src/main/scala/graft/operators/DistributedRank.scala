package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global rank arithmetic WITHOUT a one-task-per-group sort.
  *
  * `row_number()/sum() over (partition by g order by v)` plans ONE task
  * per window partition, so a low-cardinality `g` (5 event types, 25
  * brands) sorts the whole corpus in a handful of tasks no matter how
  * large the cluster is — linear work, but a straggler at 100 TB. The
  * scalable rendering is t31's seq-packing discipline generalized
  * (TextOps.scala t31: per-block cumsum + broadcast prefix offsets):
  *
  *  1. rows group into BLOCKS by a caller-supplied key that is monotone
  *     non-decreasing in the sort value — `floor(v)` for numerics, a
  *     string prefix for names — so ordering by (block, v) equals
  *     ordering by v, and the intra-block window partitions by
  *     (group, block): parallelism = #groups × #blocks, with block
  *     granularity a free knob (widen the prefix / shrink the bucket as
  *     the corpus grows);
  *  2. per-(group, block) row counts roll into PREFIX OFFSETS with one
  *     window over the tiny #groups × #blocks aggregate;
  *  3. offsets broadcast back; global rank = offset + intra-block rank.
  *
  * Exact integer arithmetic throughout: the result is bitwise identical
  * to the single-window rendering under any partitioning, which is what
  * keeps the DuckDB oracles of the call sites (q85/q86/q81) green
  * unchanged.
  */
object DistributedRank {

  /** Null-safe inner equi-join on `keys` (broadcasting `right`),
    * dropping the right side's copy of the keys. A plain equi-join
    * would silently DROP any row whose group or block key is NULL
    * (e.g. blockKey = floor(value) over a NULL value), whereas the
    * single-window rendering ranks it — `<=>` keeps the operator a
    * true drop-in for row_number() on nullable inputs. */
  private def joinNullSafe(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    val cond = keys.map(k => left(k) <=> right(k)).reduce(_ && _)
    keys.foldLeft(left.join(broadcast(right), cond))((d, k) => d.drop(right(k)))
  }

  /** `df` plus `out` = `row_number() over (partition by group order by
    * order*)`, computed with #groups × #blocks parallelism.
    *
    * `blockKey` must be a monotone non-decreasing function of the
    * LEADING order column (e.g. its prefix), so that (blockKey, order*)
    * sorts identically to (order*) alone. A NULL order value should map
    * to a NULL blockKey (any expression OF the value does); NULL blocks
    * then sort first under the default ascending NULLS FIRST, matching
    * where the single-window rendering places NULL values, and the
    * null-safe offset join ranks them instead of dropping them.
    */
  def rowNumber(df: DataFrame, group: Seq[String], order: Seq[Column],
      blockKey: Column, out: String): DataFrame = {
    val g = group.map(col)
    val withBlk = df.withColumn("__blk", blockKey)
    val wIn = Window.partitionBy(g :+ col("__blk"): _*).orderBy(order: _*)
    val wBlk = Window.partitionBy(g: _*).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // one row per (group, block): the offset window is over a tiny
    // aggregate, never the corpus
    val offsets = withBlk.groupBy(g :+ col("__blk"): _*)
      .agg(count(lit(1)).as("__bt"))
      .withColumn("__off", coalesce(sum(col("__bt")).over(wBlk), lit(0L)))
      .select(g :+ col("__blk") :+ col("__off"): _*)
    val ranked = withBlk.withColumn("__lrn", row_number().over(wIn))
    joinNullSafe(ranked, offsets, group :+ "__blk")
      .withColumn(out, col("__off") + col("__lrn"))
      .drop("__blk", "__lrn", "__off")
  }

  /** Rank geometry of every DISTINCT value per group: one row per
    * (group, v) carrying
    *  - `__cnt`  — multiplicity of v,
    *  - `__cum`  — rank of the LAST occurrence of v in ascending order
    *               (so v's rank span is [__cum - __cnt + 1, __cum]),
    *  - `__n`    — the group row total.
    * Any "value at rank k" question — median, nearest-rank percentile —
    * filters `k between __cum - __cnt + 1 and __cum`. The heavy groupBy
    * shuffles on (group, v) (full width), the cumsum windows on
    * (group, block); only the #groups × #blocks offset aggregate is
    * single-window.
    */
  def valueRanks(df: DataFrame, group: String, v: String,
      blockKey: Column): DataFrame = {
    val vc = df.groupBy(col(group), col(v)).agg(count(lit(1)).as("__cnt"))
      .withColumn("__blk", blockKey)
    val wIn = Window.partitionBy(col(group), col("__blk")).orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBlk = Window.partitionBy(col(group)).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col(group))
    val offsets = vc.groupBy(col(group), col("__blk"))
      .agg(sum(col("__cnt")).as("__bt"))
      .withColumn("__off", coalesce(sum(col("__bt")).over(wBlk), lit(0L)))
      .withColumn("__n", sum(col("__bt")).over(wAll))
      .select(col(group), col("__blk"), col("__off"), col("__n"))
    val cum = vc.withColumn("__icum", sum(col("__cnt")).over(wIn))
    joinNullSafe(cum, offsets, Seq(group, "__blk"))
      .withColumn("__cum", col("__off") + col("__icum"))
      .select(col(group), col(v), col("__cnt"), col("__cum"), col("__n"))
  }

  /** avg of the values at the given 1-based ranks per group — ranks are
    * expressions over the group total (passed as a Column). With the
    * two middle ranks this is the exact rank-median (bitwise identical
    * to the row_number rendering: when both ranks land on one distinct
    * value, avg over that single row equals (v+v)/2 exactly). */
  def valueAtRanks(df: DataFrame, group: String, v: String,
      blockKey: Column, ranks: Column => Seq[Column],
      out: String): DataFrame = {
    val r = valueRanks(df, group, v, blockKey)
    val lo = col("__cum") - col("__cnt") + lit(1L)
    val covered = ranks(col("__n")).map(_.between(lo, col("__cum")))
      .reduce(_ || _)
    r.filter(covered).groupBy(col(group)).agg(avg(col(v)).as(out))
  }
}
