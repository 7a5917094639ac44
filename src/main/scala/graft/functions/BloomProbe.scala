package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the d66 bloom membership probe in ONE
  * fused pass — md5 of the key's UTF-8 bytes, three 24-bit big-endian
  * slices of the raw digest (bytes 3i..3i+2 ≡ hex digits 6i+1..6i+6,
  * so the value is EXACTLY `conv(substring(md5(g), 1+6i, 6), 16, 10)`
  * — the DuckDB oracle's arithmetic is untouched), each masked to the
  * bitmap width and tested against the bitmap word.
  *
  * Why it exists: the column-function rendering of the same probe
  * (`DedupOps.bloomHitM` — conv/substring/md5/getbit/element_at) pays
  * THREE full md5+hex-render+substring+parse chains per gram plus an
  * ArrayData element lookup per probe. This expression computes one
  * digest (thread-local MessageDigest, no per-row allocation beyond
  * the 16-byte digest) and three AND/SHIFT bit tests against a plain
  * `long[]` referenced directly from generated code. Measured 1.6×
  * end-to-end on the StressBench probe rows (100k docs 2.80 → 1.74 s,
  * 1M docs 14.0 → 8.68 s — the gram explode and doc rollup share the
  * remaining cost), flags byte-identical.
  *
  * The bitmap rides IN the expression as a plain `long[]` (it is
  * always a driver-built literal in this family — the d66 posture),
  * so codegen references it via `addReferenceObj` with zero per-row
  * conversion. Width must be a power of two ≤ 2²⁴ bits: the 24-bit
  * slice then mods without bias and `& (width-1)` replaces `%`.
  */
case class BloomProbe(child: Expression, bits: Array[Long])
    extends UnaryExpression {

  private val mBits: Int = bits.length * 64
  require(mBits > 0 && (mBits & (mBits - 1)) == 0 && mBits <= (1 << 24),
    s"bloom bitmap must be a power-of-two width <= 2^24 bits, got $mBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe expects a string key, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override def nullSafeEval(input: Any): Any =
    BloomProbe.hit(input.asInstanceOf[UTF8String], bits, mBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.BloomProbe.hit($in, $ref, $mBits);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // VALUE equality over the bitmap (r18): the synthesized case-class
  // equals compares an Array[Long] field by REFERENCE, so two plans
  // building identical bitmaps never compared equal and identical
  // probes could not canonicalize together (a missed common-
  // subexpression dedup, never a correctness issue). Arrays-based
  // equals/hashCode restore the semantics every other literal-carrying
  // expression gets for free; semanticEquals/semanticHash ride on
  // these via the canonicalized tree.
  override def equals(other: Any): Boolean = other match {
    case BloomProbe(c, b) => child == c && java.util.Arrays.equals(bits, b)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bits)
}

object BloomProbe {
  private val MD = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** One digest, three 24-bit raw-byte slices, three bit tests. Public
    * + JVM-typed so generated code calls it directly. */
  def hit(key: UTF8String, bits: Array[Long], mBits: Int): Boolean = {
    val md = MD.get()
    md.reset()
    val d = md.digest(key.getBytes)
    var i = 0
    while (i < 3) {
      val s = ((d(3 * i) & 0xff) << 16) |
        ((d(3 * i + 1) & 0xff) << 8) | (d(3 * i + 2) & 0xff)
      val p = s & (mBits - 1)
      if (((bits(p >>> 6) >>> (p & 63)) & 1L) == 0L) return false
      i += 1
    }
    true
  }
}
