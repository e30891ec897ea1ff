package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryFn
import graft.functions.Portable
import graft.sources.Tables

/** Mergeable distinct-count sketches — the cardinality estimates a
  * pipeline needs where an exact COUNT(DISTINCT) is a corpus-wide
  * shuffle it can't afford (unique users per segment, unique shingles
  * per shard, vocabulary size during ingest).
  *
  * The sketch here is KMV (K Minimum Values, Bar-Yossef et al. 2002):
  * keep the K smallest distinct hash values per group; the K-th
  * smallest estimates the density of a uniform hash over [0, 2^60),
  * so est ≈ (K-1)·2^60 / h_(K). Chosen over HyperLogLog deliberately:
  * the sketch STATE is integer hashes (order-independent,
  * cross-engine bit-exact via the md5-based `h60`), and the estimate
  * needs ONE float division at the end — where HLL's harmonic mean is
  * a float accumulation the DuckDB twin could not reproduce bitwise.
  * Spark's own `approx_count_distinct` (HLL++) remains the
  * black-box alternative; this one is checkable.
  *
  * Merge property (what makes it a sketch): the K smallest of a union
  * is computable from the K smallest of each part — so partial
  * per-partition top-K states combine associatively on a cluster and
  * across days. */
object SketchOps {

  val KmvK = 64
  /** Hash domain size 2^60 as an EXACT double literal (6-bit mantissa
    * × power of two — the product (K-1)·M is exact in IEEE double). */
  val KmvDomain = 1152921504606846976.0

  /** Distinct users per event_type, sketched. `n_kept` < K means the
    * group had fewer distinct values than the sketch size and the
    * count is exact. One distinct on (type, hash) + a per-type top-K
    * window (at production scale the window input is prefiltered by a
    * corpus-sized hash threshold, same trick as `sample_reservoir` —
    * the result is unchanged because only the K smallest survive
    * either way). */
  def distinctKmv(s: SparkSession, d: String): DataFrame = {
    val h = Tables.events(s, d)
      .select(col("event_type"),
        Portable.h60(concat(lit("kmv:"), col("user_id").cast("string"))).as("h"))
      .distinct()
    val rankW = Window.partitionBy(col("event_type")).orderBy(col("h"))
    h.withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= KmvK)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_min"))
      .select(col("event_type"), col("n_kept"), col("kth_min"),
        when(col("n_kept") < KmvK, col("n_kept").cast("double"))
          .otherwise(lit((KmvK - 1).toDouble * KmvDomain) / col("kth_min").cast("double"))
          .as("est_distinct"))
  }

  val queries: Map[String, QueryFn] = Map(
    "distinct_kmv" -> (distinctKmv _)
  )

  val oracles: Map[String, String] = Map(
    "distinct_kmv" ->
      s"""WITH h AS (
         |  SELECT DISTINCT event_type,
         |         ${Portable.h60Sql("'kmv:' || CAST(user_id AS VARCHAR)")} AS h
         |  FROM events),
         |r AS (
         |  SELECT event_type, h,
         |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM h),
         |k AS (
         |  SELECT event_type, count(*) AS n_kept, max(h) AS kth_min
         |  FROM r WHERE rn <= $KmvK GROUP BY event_type)
         |SELECT event_type, n_kept, kth_min,
         |       CASE WHEN n_kept < $KmvK THEN CAST(n_kept AS DOUBLE)
         |            ELSE ${Portable.dl((KmvK - 1).toDouble * KmvDomain)} / CAST(kth_min AS DOUBLE) END
         |         AS est_distinct
         |FROM k""".stripMargin
  )
}
