package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: FastCDC-at-token-granularity chunking
  * of a document, in ONE map-side pass.
  *
  * t60/d64's chunking was first declared as posexplode(tokens) → a
  * boundary flag per token → a (doc_id)-partitioned prefix-sum window
  * → a (doc_id, chunk_idx) hash-aggregate. Correct, but the window
  * forces an EXCHANGE OF EVERY TOKEN ROW on doc_id — at 100 TB that
  * shuffle (tokens × (pos, token, doc, source)) dwarfs every later
  * stage, and all of it reconstructs per-doc state that was available
  * where the doc was read. This expression computes the identical
  * chunk table with zero pre-chunk shuffle: per document, one pass
  * over the tokens, emitting `array<struct<ctokens, chunk_md5>>` in
  * chunk order; consumers posexplode the ~tokens/8 chunk rows (the
  * position IS the old chunk_idx) and proceed straight to the
  * chunk-hash / source stages.
  *
  * Semantics are replicated EXACTLY from the declarative form (same
  * results, same oracles — only the evaluation strategy changes):
  *  - tokenization ≡ `split(trim(text), "[ \t\n\f\r]+")` with Spark's
  *    space-only trim and Java split semantics at limit -1 (a leading
  *    separator yields a leading empty token; an all-space text
  *    yields no tokens at all, rendered here as an empty array —
  *    callers filter `size(...) > 0` exactly as they filtered
  *    `size(tokens) > 0`);
  *  - a chunk boundary falls AFTER any token whose
  *    [[graft.queries.SamplingOps.bucket]] ≡ 0 (mod 8); the bucket is
  *    the first 6 hex nibbles of md5(token), so bucket % 8 depends
  *    only on the digest's third byte (& 7) — computed here without
  *    rendering the hex;
  *  - chunk_md5 ≡ md5 hex of the chunk's tokens joined by a single
  *    space (the q124 array_sort discipline's rendered form);
  *  - ctokens ≡ the chunk's token count.
  *
  * Codegen'd via a static one-call kernel (the whole-stage pipeline
  * keeps a single virtual call per row; the kernel itself is a tight
  * JVM loop with a thread-local MessageDigest).
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ctokens", LongType, nullable = false),
      StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |${ev.value} = graft.functions.CdcChunks$$.MODULE$$.compute($in);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {

  private val splitter = java.util.regex.Pattern.compile("[ \\t\\n\\f\\r]+")

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(digest: MessageDigest, bytes: Array[Byte]): String = {
    val d = digest.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** The one-pass kernel (called from generated code). */
  def compute(text: UTF8String): ArrayData = {
    // Spark's trim() removes 0x20 only — NOT Java's trim — so the
    // tokenization matches split(trim(text), ...) byte for byte.
    val trimmed = text.trim().toString
    if (trimmed.isEmpty) return new GenericArrayData(Array.empty[Any])
    val tokens = splitter.split(trimmed, -1)
    val digest = md.get()
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Any]
    val sb = new java.lang.StringBuilder
    var ctokens = 0L
    var i = 0
    while (i < tokens.length) {
      if (ctokens > 0L) sb.append(' ')
      sb.append(tokens(i))
      ctokens += 1L
      // boundary AFTER any token whose md5 bucket ≡ 0 (mod 8): the
      // bucket is the first 6 hex nibbles (= first 3 digest bytes),
      // so % 8 is the third byte's low 3 bits
      val d = digest.digest(tokens(i).getBytes("UTF-8"))
      if ((d(2) & 7) == 0) {
        chunks += new GenericInternalRow(Array[Any](ctokens,
          UTF8String.fromString(md5Hex(digest,
            sb.toString.getBytes("UTF-8")))))
        sb.setLength(0)
        ctokens = 0L
      }
      i += 1
    }
    if (ctokens > 0L) {
      chunks += new GenericInternalRow(Array[Any](ctokens,
        UTF8String.fromString(md5Hex(digest,
          sb.toString.getBytes("UTF-8")))))
    }
    new GenericArrayData(chunks.toArray)
  }
}
