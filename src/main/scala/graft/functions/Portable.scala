package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable (cross-engine bit-exact) primitives shared by the LLM-data
  * operators and their DuckDB oracle twins.
  *
  * Every helper here exists twice — a Spark `Column` and a SQL-text
  * generator — kept line-for-line parallel. Probed cross-engine rules
  * (see dev/PORTABILITY.md for the probe evidence):
  *
  *  - md5 hex agrees between Spark and DuckDB; the first 15 hex chars
  *    parsed as int64 give a portable 60-bit string hash (`h60`).
  *  - sequential lambda folds over double arrays (`aggregate` /
  *    `list_reduce`) agree bit-for-bit — so dot products and norms are
  *    checkable as raw doubles.
  *  - transcendental functions (sin, atan2, pow, exp, ln) do NOT agree
  *    (last-ulp differences) — never in checked output columns.
  *  - windowed sums over raw doubles do NOT agree (DuckDB segment-tree
  *    accumulation order) — running sums use scaled integers.
  *
  * At production scale `xxhash64(...)` (one CPU instruction-width op,
  * codegen'd) replaces md5-based `h60`; the md5 variant exists so the
  * oracle can recompute identical values in ANSI SQL.
  */
object Portable {

  /** Prime modulus small enough that a*h+b stays < 2^62 under
    * Spark 4 ANSI arithmetic (no silent wrap on either engine). */
  val P: Long = 1048573L // largest prime < 2^20

  /** Double literal that parses to the identical bits on both engines:
    * Scala's shortest-roundtrip repr through a string cast (probed —
    * dev/PORTABILITY.md "literal double embedding"). The ONE spelling
    * of this idiom; every constant-table generator routes through it. */
  def dl(d: Double): String = s"CAST('${d}' AS DOUBLE)"

  /** The synthetic per-record series the whole signal family reads —
    * ONE source of truth for length and derivation: SignalOps.grid's
    * exploded acc_c, its gridCte SQL twin, and the array forms the
    * pSA / DFT / preproc kernels fold over are all generated from
    * these (the expression text is valid in both Spark SQL and
    * DuckDB). Changing the formula or length here changes every
    * consumer together. */
  val SeriesN = 16
  def accTerm(pk: String, j: String): String = s"($pk * 13 + $j * 29) % 400 - 200"
  def noiseTerm(pk: String, j: String): String = s"($pk * 7 + $j * 31) % 100 - 50"
  /** The 090-axis horizontal twin of [[accTerm]] (000 axis) — the
    * second component the RotD rotation combines. */
  def acc090Term(pk: String, j: String): String = s"($pk * 23 + $j * 37) % 400 - 200"

  /** Portable 60-bit hash of a string expression — the fused
    * [[Md5Prefix60]] kernel (bit-identical to
    * `conv(substring(md5(c), 1, 15), 16, 10)`, which remains the
    * oracle spelling; KernelsSpec pins equality). */
  def h60(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge => B}
    B.column(Md5Prefix60(B.expression(c)))
  }
  def h60Sql(e: String): String =
    s"CAST('0x' || substring(md5($e),1,15) AS BIGINT)"

  /** h60 reduced into the permutation field [0, P). */
  def hmod(c: Column): Column = h60(c) % P
  def hmodSql(e: String): String = s"(${h60Sql(e)} % $P)"

  /** Deterministic per-permutation coefficients for the MinHash family
    * h_j(x) = (a_j * x + b_j) mod P. Odd multiplier, Knuth-style
    * spread; all intermediates < 2^40. */
  def permA(j: Int): Long = (2 * j + 1) * 40503L % P
  def permB(j: Int): Long = (j * 65537L + 17L) % P

  /** Word tokens (split on single space; interior empties preserved
    * identically on both engines). */
  def tokens(c: Column): Column = split(c, " ")
  def tokensSql(e: String): String = s"string_split($e, ' ')"

  /** Word n-gram shingles of `toks`; empty array when too short
    * (guarded — Spark's `sequence` would run descending otherwise). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))
    ).otherwise(array().cast("array<string>"))

  /** SQL twin of [[shingles]]; `e` must be a token-list expression. */
  def shinglesSql(e: String, n: Int): String =
    s"CASE WHEN len($e) >= $n THEN list_transform(range(1, len($e) - ${n - 2}), " +
      s"i -> array_to_string(list_slice($e, i, i + ${n - 1}), ' ')) ELSE CAST([] AS VARCHAR[]) END"

  /** Sequential-fold dot product of two double arrays — bit-exact on
    * both engines because the accumulation order is the array order
    * (probed: zero mismatches over all sf0.01 pairs). */
  def dot(a: Column, b: Column): Column = {
    val prods = zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y)
    aggregate(prods, lit(0.0), (acc, v) => acc + v)
  }
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (acc, v) -> acc + v)"

  /** Sequential-fold L2 norm (sqrt is IEEE-exact on both engines). */
  def norm(a: Column): Column = {
    val sq = transform(a.cast("array<double>"), x => x * x)
    sqrt(aggregate(sq, lit(0.0), (acc, v) => acc + v))
  }
  def normSql(a: String): String =
    s"sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform($a, " +
      s"x -> x::DOUBLE * x::DOUBLE)), (acc, v) -> acc + v))"
}
