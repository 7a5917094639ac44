package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct}

/** SparkSessionExtensions entry point: injects the engine's custom
  * Catalyst expressions at session build, so a deployment enables them
  * cluster-wide with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`),
  * instead of calling [[graft.functions.VectorFunctions.register]] per
  * session. Same builder the per-session registration uses — one
  * definition, two wiring paths.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    e.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => new graft.plans.TopKPerKeyStrategy)
    e.injectPlannerStrategy(_ => new graft.plans.DeferredRowsStrategy)
  }
}
