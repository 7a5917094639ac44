package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for product-quantization asymmetric
  * distance: squared-L2 from an uncompressed query vector to a
  * PQ-coded corpus vector, the codebooks baked in as a reference
  * object.
  *
  * Why a custom Expression instead of the nested
  * `aggregate(zip_with(...))` rendering: Spark evaluates higher-order-
  * function lambdas interpreted (they fall out of whole-stage codegen),
  * and the HOF form materializes a per-row term array plus a slice per
  * subspace. This is one fused loop — m × dsub multiply-adds over a
  * flat codebook array — inlined into whole-stage codegen via
  * `doGenCode`.
  *
  * Accumulation matches the HOF/oracle rendering exactly: inner
  * subspace sum left-to-right from 0.0, then the outer sum over
  * subspaces left-to-right from 0.0 — so swapping it in keeps the
  * DuckDB hash compare green.
  *
  * Caller contract: `code` holds m valid centroid indices in [0, k)
  * (the output of [[graft.ml.ProductQuantizerModel.encode]]).
  */
case class PqAdcDistance(left: Expression, right: Expression,
    codebooks: Seq[Seq[Seq[Double]]]) extends BinaryExpression {

  private val m = codebooks.length
  private val k = codebooks.head.length
  private val dsub = codebooks.head.head.length

  /** Flat (j, c, i) → m*k*dsub layout for O(1) indexed access. */
  @transient private lazy val flat: Array[Double] =
    codebooks.flatten.flatten.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<int> code, array<double> query), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(codeAny: Any, qAny: Any): Any = {
    val code = codeAny.asInstanceOf[ArrayData]
    val q = qAny.asInstanceOf[ArrayData]
    var total = 0.0
    var j = 0
    while (j < m) {
      val base = (j * k + code.getInt(j)) * dsub
      var s = 0.0
      var i = 0
      while (i < dsub) {
        val d = q.getDouble(j * dsub + i) - flat(base + i)
        s += d * d
        i += 1
      }
      total += s
      j += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, q) => {
      val cb = ctx.addReferenceObj("pqCodebook", flat, "double[]")
      val total = ctx.freshName("total")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      s"""
         |double $total = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $base = ($j * $k + $code.getInt($j)) * $dsub;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dsub; $i++) {
         |    double $d = $q.getDouble($j * $dsub + $i) - $cb[$base + $i];
         |    $s += $d * $d;
         |  }
         |  $total += $s;
         |}
         |${ev.value} = $total;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
