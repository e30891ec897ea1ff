package graft.functions

/** Portable single-degree-of-freedom oscillator kernel — the pSA
  * (pseudo-spectral acceleration) reduction that dominates the
  * reference's flatfile columns (`nzgmdb/calculation/ims.py:18-97`
  * drives it per record over `psa_periods`; the numeric core is the
  * classic 5%-damped SDOF response).
  *
  * Discretization: Newmark-beta, average-acceleration variant
  * (gamma=1/2, beta=1/4 — unconditionally stable, so the coarse
  * synthetic dt is safe). With m=1 and the acceleration state
  * eliminated via the equation of motion, each step is
  *
  *   u' = (p + p_prev + (a1-k)*u + (a2-c)*v) / (k + a1)
  *   v' = (2/dt)*(u' - u) - v
  *
  * with a1 = 4/dt^2 + 2c/dt, a2 = 4/dt + c, k = omega^2,
  * c = 2*zeta*omega, p = -ground_acc. pSA = omega^2 * max|u|.
  *
  * Everything is +,-,*,/,abs,greatest over doubles — the portable
  * subset (dev/PORTABILITY.md): the same fold, written with the same
  * association order, is bit-exact on Spark (`aggregate`) and DuckDB
  * (`list_reduce`). Constants are computed once in Scala and embedded
  * as string-cast literals so both engines parse the identical double.
  * No UDF: the whole kernel stays inside codegen as a higher-order
  * function over a 16-element array column.
  */
object Sdof {

  val Dt      = 0.05                      // sampling interval of the synthetic series (s)
  val Zeta    = 0.05                      // 5% damping, the published pSA convention
  // psa_periods subset (ims.py:142) — the reference grid is ~100
  // log-spaced periods; these 8 span its range and each adds one
  // codegen'd kernel column (cost is linear in periods).
  val Periods = Seq(0.1, 0.2, 0.3, 0.5, 1.0, 2.0, 3.0, 5.0)
  val NFreq: Int = Portable.SeriesN       // grid length (shared source of truth)

  /** psa_p01 / psa_p05 / psa_p10 / psa_p30 (period in deci-seconds). */
  def colName(t: Double): String = f"psa_p${(t * 10).round}%02d"

  /** Double literal that parses to the identical bits on both engines:
    * Scala's shortest-roundtrip repr through a string cast. */
  private def dl(d: Double): String = Portable.dl(d)

  private[functions] case class Coef(cu: Double, cv: Double, keff: Double, tdt: Double, k: Double)
  private[functions] def coef(t: Double): Coef = {
    val om = 2.0 * math.Pi / t
    val k  = om * om
    val c  = 2.0 * Zeta * om
    val a1 = 4.0 / (Dt * Dt) + 2.0 * c / Dt
    val a2 = 4.0 / Dt + c
    Coef(a1 - k, a2 - c, k + a1, 2.0 / Dt, k)
  }

  /** Negated synthetic ground-acceleration series (centi-units), one
    * double per grid step, derived from the record key `pk` — same
    * derivation as SignalOps.grid's acc_c. Spark SQL expression. */
  def psSpark: String =
    s"transform(sequence(0, ${NFreq - 1}), j -> -CAST(${Portable.accTerm("pk", "j")} AS DOUBLE))"

  /** DuckDB twin of [[psSpark]]. */
  def psSql: String =
    s"list_transform(range(0, $NFreq), j -> -CAST(${Portable.accTerm("pk", "j")} AS DOUBLE))"

  /** pSA over a materialized p-series column: the Newmark recurrence
    * runs inside whole-stage codegen via the [[SdofPeak]] expression
    * (the equivalent `aggregate` fold is interpreted — measured 5-10x
    * slower); arithmetic order is identical to the DuckDB
    * `list_reduce` twin, so checked outputs are bit-equal. */
  def psaCol(t: Double, ps: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
    import org.apache.spark.sql.functions.lit
    val C = coef(t)
    lit(C.k) * ExpressionUtils.column(
      SdofPeak(ExpressionUtils.expression(ps), C.cu, C.cv, C.keff, C.tdt)) / lit(100.0)
  }

  /** DuckDB twin of [[psaSpark]] — `list_reduce` needs accumulator and
    * element types equal, so elements are wrapped as 1-lists and the
    * initial state is prepended; the arithmetic is structurally
    * identical to the Spark fold (same association order). */
  def psaSql(t: Double, ps: String): String = {
    val C  = coef(t)
    def u1(u: String, v: String, pn: String, x: String) =
      s"($x + $pn + ${dl(C.cu)} * $u + ${dl(C.cv)} * $v) / ${dl(C.keff)}"
    val (u, v, pn, pk) = ("st[1]", "st[2]", "st[3]", "st[4]")
    val un = u1(u, v, pn, "el[1]")
    s"${dl(C.k)} * list_reduce(list_prepend([${dl(0.0)}, ${dl(0.0)}, $ps[1], ${dl(0.0)}], " +
      s"list_transform(list_slice($ps, 2, $NFreq), x -> [x])), " +
      s"(st, el) -> [$un, ${dl(C.tdt)} * ($un - $u) - $v, el[1], greatest($pk, abs($un))])[4] / ${dl(100.0)}"
  }
}
