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

  /** md5(key) → n leading 40-bit big-endian nibble slices. */
  def compute(key: UTF8String, n: Int): GenericArrayData = {
    val d = md.get()
    d.reset()
    val digest = d.digest(key.getBytes)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var v = 0L
      var j = 10 * i
      val end = j + 10
      while (j < end) {
        val b = digest(j >> 1) & 0xFF
        val nib = if ((j & 1) == 0) (b >> 4) & 0xF else b & 0xF
        v = (v << 4) | nib
        j += 1
      }
      out(i) = v
      i += 1
    }
    new GenericArrayData(out)
  }
}
