package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
    * count is exact.
    *
    * The sketch's merge property lives in the PHYSICAL plan: the
    * custom [[graft.functions.KmvKSmallest]] TypedImperativeAggregate
    * keeps a bounded (≤K longs) buffer per group, partial-aggregates
    * map-side and merges associatively — so the only shuffle is ≤K
    * longs per (group × input partition), with dedup riding the
    * sketch state for free. The previous formulation (hash-distinct
    * on (type, hash), then a per-type Window sort to rank-filter K)
    * shuffled EVERY distinct hash and sorted whole groups to keep 64
    * rows — O(n log n) per group where the sketch is O(n log K);
    * that shape survives at 100 TB only with a pre-filter, this one
    * needs none. It is also the exact associative fold the streaming
    * twin ([[graft.streaming.StreamingDistinctKmv]]) applies per
    * micro-batch, so batch and streaming now share one merge
    * semantics (the spec's multi-batch split pins them equal). */
  def distinctKmv(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val h = Tables.events(s, d)
      .select(col("event_type"),
        Portable.h60(concat(lit("kmv:"), col("user_id").cast("string"))).as("h"))
    val sketch = ColumnBridge.column(
      graft.functions.KmvKSmallest(ColumnBridge.expression(col("h")), KmvK)
        .toAggregateExpression())
    h.groupBy(col("event_type"))
      .agg(sketch.as("sk"))
      .select(col("event_type"),
        size(col("sk")).cast("long").as("n_kept"),
        element_at(col("sk"), -1).as("kth_min"))
      .select(col("event_type"), col("n_kept"), col("kth_min"),
        when(col("n_kept") < KmvK, col("n_kept").cast("double"))
          .otherwise(lit((KmvK - 1).toDouble * KmvDomain) / col("kth_min").cast("double"))
          .as("est_distinct"))
  }

  val BloomBits  = 1024 // m: filter size (32 words x 32 bits)
  val BloomWords = 32
  val BloomK     = 3    // hash functions

  /** Deterministic BLOOM-FILTER semi-join — the runtime-filter pattern
    * made explicit and checkable: build a 1024-bit Bloom filter over
    * the purchaser user set (one partial-agg `bit_or` into 32 words —
    * broadcast-sized at ANY member count, which is the whole point:
    * the filter's size is fixed while the set it summarizes grows),
    * then probe every user against it with `BloomK` h60-derived bit
    * positions. Output carries both the filter's verdict and the exact
    * membership flag, so the false-positive rate is itself part of the
    * checked result — no false NEGATIVES is the Bloom guarantee the
    * spec asserts. In production the probe side never joins the member
    * set at all (the exact flag here is the audit); this is how a scan
    * pre-filters against a huge dimension before paying the real
    * join. Bits use 32-bit words in int64 so no shift ever reaches the
    * sign bit — identical two's-complement semantics on both
    * engines. */
  def bloomSemiFilter(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val users = ev.select(col("user_id")).distinct()
    val purchasers = ev.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
    val js = explode(array((0 until BloomK).map(lit): _*)).as("j")
    def positions(df: DataFrame): DataFrame =
      df.select(col("user_id"), js)
        .select(col("user_id"), col("j"),
          (Portable.h60(concat(lit("bf"), col("j").cast("string"), lit(":"),
            col("user_id").cast("string"))) % BloomBits).as("pos"))
    val bloom = positions(purchasers)
      .select((col("pos") / BloomWords).cast("long").as("w"),
        expr(s"shiftleft(1L, cast(pos % $BloomWords as int))").as("mask"))
      .groupBy(col("w")).agg(expr("bit_or(mask)").as("bw"))
    val probe = positions(users)
      .withColumn("w", (col("pos") / BloomWords).cast("long"))
      .join(broadcast(bloom), Seq("w"), "left")
      .select(col("user_id"),
        (expr(s"coalesce(bw, 0L) & shiftleft(1L, cast(pos % $BloomWords as int))") =!= 0L)
          .as("hit"))
      .groupBy(col("user_id")).agg(expr("bool_and(hit)").as("might_purchaser"))
    probe.join(purchasers.withColumn("isp", lit(true)), Seq("user_id"), "left")
      .select(col("user_id"), col("might_purchaser"),
        coalesce(col("isp"), lit(false)).as("is_purchaser"))
  }

  val queries: Map[String, QueryFn] = Map(
    "distinct_kmv" -> (distinctKmv _),
    "bloom_semi_filter" -> (bloomSemiFilter _)
  )

  val oracles: Map[String, String] = Map(
    "bloom_semi_filter" ->
      s"""WITH pu AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         |us AS (SELECT DISTINCT user_id FROM events),
         |jx AS (SELECT unnest(range(0, $BloomK)) AS j),
         |bp AS (
         |  SELECT ${Portable.h60Sql("'bf' || CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")} % $BloomBits AS pos
         |  FROM pu, jx),
         |bw AS (
         |  SELECT pos // $BloomWords AS w,
         |         bit_or(CAST(1 AS BIGINT) << CAST(pos % $BloomWords AS INTEGER)) AS bw
         |  FROM bp GROUP BY 1),
         |qp AS (
         |  SELECT user_id,
         |         ${Portable.h60Sql("'bf' || CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")} % $BloomBits AS pos
         |  FROM us, jx),
         |hits AS (
         |  SELECT qp.user_id,
         |         (coalesce(bw.bw, 0) & (CAST(1 AS BIGINT) << CAST(qp.pos % $BloomWords AS INTEGER))) <> 0 AS hit
         |  FROM qp LEFT JOIN bw ON qp.pos // $BloomWords = bw.w),
         |m AS (SELECT user_id, bool_and(hit) AS might_purchaser FROM hits GROUP BY user_id)
         |SELECT m.user_id, m.might_purchaser, (pu.user_id IS NOT NULL) AS is_purchaser
         |FROM m LEFT JOIN pu ON m.user_id = pu.user_id""".stripMargin,
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
