package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.StructType

/** A DataFrame leaf whose rows are computed by a DRIVER-SIDE thunk at
  * first execution — the lazy form of "materialize a small result
  * eagerly and wrap it in a local relation".
  *
  * Why it exists: multi-job sweep queries (d61_shingle_size_sweep runs
  * three concurrent per-arm job groups with an eager cache lifecycle)
  * produce a handful of result rows but cannot be expressed as one
  * lazy Catalyst plan without giving up the per-arm unpersist
  * discipline. The r16 form ran the sweep at DataFrame-BUILD time, so
  * plan-only callers — explain(), schema inspection, the driver's
  * warm-up — paid the full sweep. This leaf restores laziness: the
  * plan carries only the schema; the thunk fires inside
  * [[DeferredRowsExec.doExecute]] on the driver (where submitting the
  * sweep's Spark jobs is legal — the same place a subquery or
  * broadcast build executes), and its result is memoized so repeated
  * actions on one DataFrame run the sweep once.
  *
  * SCALE CONTRACT: the thunk must return a DRIVER-SIZED row set (sweep
  * summaries, calibration tables — tens of rows). It is the lazy twin
  * of the "head() on a provably 1-row frame" posture, not a data path;
  * anything corpus-sized belongs in a real distributed plan.
  */
case class DeferredRowsPlan(output: Seq[Attribute],
    thunk: () => Seq[InternalRow]) extends LeafNode {
  // a constant tiny size: the contract bounds the result to driver
  // scale, and the only consumer joins it broadcasts anyway
  override def computeStats(): Statistics = Statistics(sizeInBytes = 1L)
}

case class DeferredRowsExec(output: Seq[Attribute],
    thunk: () => Seq[InternalRow]) extends LeafExecNode {
  // runs on the driver at execution time; the thunk may submit jobs.
  // Downstream operators require UnsafeRow (SparkPlan.getByteArrayRdd
  // casts), so project the generic rows the thunk returns — the same
  // conversion LocalTableScanExec applies to its driver-side rows.
  override protected def doExecute(): RDD[InternalRow] = {
    val proj = org.apache.spark.sql.catalyst.expressions
      .UnsafeProjection.create(output, output)
    sparkContext.parallelize(thunk().map(r => proj(r).copy()), 1)
  }
}

class DeferredRowsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DeferredRowsPlan(out, thunk) => DeferredRowsExec(out, thunk) :: Nil
    case _ => Nil
  }
}

object DeferredRows {
  /** Build a lazy DataFrame over `build`: schema now, rows at first
    * action. `build` runs once per returned DataFrame (memoized across
    * actions); each fresh call of the registry entry re-runs it. */
  def ofRows(spark: SparkSession, schema: StructType)(
      build: () => Seq[Row]): DataFrame = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[DeferredRowsStrategy]))
      spark.experimental.extraStrategies = cur :+ new DeferredRowsStrategy
    val attrs =
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    lazy val rows: Seq[InternalRow] = {
      val conv = CatalystTypeConverters.createToCatalystConverter(schema)
      build().map(r => conv(r).asInstanceOf[InternalRow])
    }
    GraftBridge.ofRows(spark, DeferredRowsPlan(attrs, () => rows))
  }
}
