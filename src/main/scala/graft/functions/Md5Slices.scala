package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The counter-hash uniform kernel, fused: md5 of the key string →
  * `n` disjoint 40-bit (10-hex-nibble) slices as longs, in one
  * codegen'd expression.
  *
  * Bit-identical to the composable spelling the oracles keep —
  * `conv(substring(md5(key), 1 + 10*i, 10), 16, 10)` — but skips the
  * hex ENCODING of the digest, the per-slice substring allocations,
  * and the base-16 string re-parse: slice i is read straight from
  * digest nibbles [10i, 10i+10). The CCLD Monte-Carlo family draws
  * 3-9 uniforms per (event, draw) row, which made those string ops
  * the dominant cost of the `ccld_*` queries (the md5 digest itself
  * is irreducible — it is the documented portability anchor;
  * production swaps the whole kernel for xxhash64 seeds).
  * [[KernelsSpec]] pins slice equality against the string spelling
  * on arbitrary keys.
  */
case class Md5Slices(child: Expression, nSlices: Int) extends UnaryExpression {
  require(nSlices >= 1 && nSlices * 10 <= 32, s"nSlices $nSlices out of md5 range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_slices"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_slices requires string, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    Md5Slices.compute(a.asInstanceOf[UTF8String], nSlices)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5Slices.compute($a, $nSlices);")

  override protected def withNewChildInternal(newChild: Expression): Md5Slices =
    copy(child = newChild)
}

object Md5Slices {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def digestOf(key: UTF8String): Array[Byte] = {
    val d = md.get()
    d.reset()
    d.digest(key.getBytes)
  }

  private def nibbles(digest: Array[Byte], from: Int, count: Int): Long = {
    var v = 0L
    var j = from
    val end = from + count
    while (j < end) {
      val b = digest(j >> 1) & 0xFF
      val nib = if ((j & 1) == 0) (b >> 4) & 0xF else b & 0xF
      v = (v << 4) | nib
      j += 1
    }
    v
  }

  /** md5(key) → n leading 40-bit big-endian nibble slices. */
  def compute(key: UTF8String, n: Int): GenericArrayData = {
    val digest = digestOf(key)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = nibbles(digest, 10 * i, 10)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** md5(key) → leading 15 hex nibbles as a long ([[Md5Prefix60]]). */
  def prefix60(key: UTF8String): Long = nibbles(digestOf(key), 0, 15)
}

/** The [[graft.functions.Portable.h60]] hash, fused: bit-identical to
  * `conv(substring(md5(key), 1, 15), 16, 10)` without the hex
  * encode / substring / base-16 reparse. This is the per-shingle
  * kernel of the whole dedup family (every MinHash/SimHash signature
  * hashes every shingle through it) and the per-row draw of the
  * sampling/mixing operators. */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_prefix60 requires string, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    Md5Slices.prefix60(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5Slices.prefix60($a);")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}
