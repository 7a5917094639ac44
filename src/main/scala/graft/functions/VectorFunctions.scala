package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns.
  *
  * Why a custom Expression instead of
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)`: the higher-order-function
  * route materializes an intermediate array per row and evaluates three
  * lambda chains (dot, |a|, |b|); this is one fused loop with three
  * scalar accumulators, codegen'd via `doGenCode` so it inlines into
  * whole-stage codegen. On the brute-force O(n²) similarity joins this
  * is the hot path.
  *
  * Accumulation is left-to-right in doubles — the same order DuckDB's
  * `list_dot_product` uses — so oracle comparisons agree to ~1 ulp and
  * survive round(…, 6).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = $denom == 0.0 ? 0.0 : $dot / $denom;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for the raw inner product over two
  * `array<double>` columns — the MIPS (maximum-inner-product search)
  * scoring primitive, where cosine's normalization is exactly what a
  * recommender must NOT apply (popular items earn their larger norms).
  *
  * Same design rationale as [[CosineSimilarity]]: one fused
  * left-to-right loop with a single scalar accumulator, codegen'd via
  * `doGenCode` so the corpus×queries scoring join stays inside
  * whole-stage codegen; the accumulation order matches DuckDB's
  * `list_dot_product`, so oracle comparisons survive round(…, 6).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<double>, array<double>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Register the engine's named functions in the session registry
    * (idempotent; Spark 4's Column API goes through the registry +
    * `call_function`). `simhash48` is an AggregateFunction — the
    * analyzer wraps registry-built aggregates in AggregateExpression
    * automatically, so it works from SQL GROUP BY like any built-in. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => CosineSimilarity(exprs.head, exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => DotProduct(exprs.head, exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash48",
      exprs => SimHash48Agg(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nibble_hist",
      exprs => NibbleHist(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_chunks",
      exprs => CdcChunks(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_payload_chunks",
      exprs => CdcPayloadChunks(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gear_chunks",
      exprs => GearChunks(exprs.head),
      "scala_udf")
    // clamp bounds must be foldable INT literals — the kernel call is
    // baked into generated code, and data-dependent clamps would make
    // the chunk table's row-volume contract unauditable. Guarded here
    // (foldable + non-null + integral) so a column or NULL argument
    // fails analysis with a named error instead of an opaque
    // NullPointerException/ClassCastException from eval().
    def clampArg(e: Expression, which: String): Int = {
      def fail(actual: String): Nothing =
        throw new org.apache.spark.sql.AnalysisException(
          "NON_FOLDABLE_ARGUMENT",
          Map("funcName" -> "`gear_chunks_clamped`",
            "paramName" -> s"`$which`",
            "paramType" -> s"non-null integer literal (got $actual)"))
      if (!e.foldable) fail(s"non-foldable ${e.sql}")
      e.eval() match {
        case n: java.lang.Number => n.intValue()
        case null => fail("NULL")
        case other => fail(s"${other.getClass.getSimpleName} $other")
      }
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gear_chunks_clamped",
      exprs => GearChunksClamped(exprs.head,
        clampArg(exprs(1), "min"),
        clampArg(exprs(2), "max")),
      "scala_udf")
    // Spark's own codegen'd bloom probe (the expression its runtime
    // bloom-filter joins plan), exposed by name: 4.1 ships
    // BloomFilterMightContain but does not register it in the builtin
    // registry. First arg is the serialized filter as a BINARY literal
    // (org.apache.spark.util.sketch.BloomFilter.writeTo bytes), second
    // the LONG value to probe — replaces the boxing scala UDF on the
    // incremental-dedup candidate prefilter hot path.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs.head, exprs(1)),
      "scala_udf")
  }

  /** Cosine similarity Column over two array<double> columns; caller must
    * have invoked [[register]] on the session first. */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** 16-slot nibble histogram of a string (hex chars) or binary column;
    * caller must have invoked [[register]] on the session first. */
  def nibbleHist(x: Column): Column = call_function("nibble_hist", x)

  /** One-pass map-side CDC chunking of a text column
    * (array<struct<ctokens, chunk_md5>> in chunk order); caller must
    * have invoked [[register]] on the session first. */
  def cdcChunks(x: Column): Column = call_function("cdc_chunks", x)

  /** One-pass LINEAR payload-tile CDC over a binary column
    * (array<struct<cbytes, chunk_md5>> in chunk order); caller must
    * have invoked [[register]] on the session first. */
  def cdcPayloadChunks(x: Column): Column =
    call_function("cdc_payload_chunks", x)

  /** Byte-rolling gear-hash CDC over a binary column — re-anchoring,
    * stateless boundary rule (array<struct<cbytes, chunk_md5>> in
    * chunk order); caller must have invoked [[register]] first. */
  def gearChunks(x: Column): Column = call_function("gear_chunks", x)

  /** The production gear-CDC tier: FastCDC min/max chunk clamps over
    * the same rolling boundary rule (zero-run payloads stay at
    * ~bytes/minChunk rows instead of 1-byte chunks); caller must have
    * invoked [[register]] first. */
  def gearChunksClamped(x: Column, minChunk: Int, maxChunk: Int): Column =
    call_function("gear_chunks_clamped", x, lit(minChunk), lit(maxChunk))

  /** Raw inner product Column over two array<double> columns; caller
    * must have invoked [[register]] on the session first. */
  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)
}
