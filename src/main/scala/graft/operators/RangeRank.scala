package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe EXACT global ordering primitives: grouped prefix sums
  * and row numbers computed with NO data-sized single-partition
  * window — the replacement for `Window.orderBy(...)` (and for
  * `Window.partitionBy(lowCardKey).orderBy(...)`) wherever the
  * ordered input is corpus-sized. A plain global window moves ALL
  * rows through ONE task (Spark's own `WindowExec: No Partition
  * Defined` warning); partitioning by a handful of event types is the
  * same failure at N/|types| rows per task, and AQE cannot split a
  * window partition.
  *
  * The construction is the textbook distributed ranking:
  *   1. `repartitionByRange` on (group ++ order) keys — contiguous,
  *      balanced ranges, ascending range per ascending partition id
  *      (AQE may coalesce ADJACENT ranges, which preserves both
  *      contiguity and id order);
  *   2. a within-partition running sum, windowed on the
  *      (partition-id, group) pair — every window partition is
  *      bounded by the range-partition size ≈ N/parts, never by the
  *      group's row count;
  *   3. per-(partition-id, group) totals — at most parts × |groups|
  *      rows — cumulated into start offsets by a K-BOUNDED window
  *      (≤ `parts` rows per group) and broadcast back.
  * The result is bit-identical to the single-partition window
  * whenever the order key is unique within its group (range bounds
  * only move rows between partitions; rank arithmetic is
  * partition-independent), which every call site guarantees with a
  * primary-key tiebreak.
  *
  * The partitioned table is pinned to ONE physical evaluation (a
  * LAZY local checkpoint: every consumer branch references the same
  * persisted RDD, materialized by the first action — lazy so query
  * CONSTRUCTION stays job-free; an eager checkpoint here measurably
  * added one synchronous 32-task job per call), for two load-bearing
  * reasons:
  *   - determinism: `__pid` derives from nondeterministic physical
  *     position (spark_partition_id / monotonically_increasing_id),
  *     and the offset aggregate joins the same subtree against
  *     itself — without materialization, correctness would silently
  *     ride on `spark.sql.exchange.reuse` canonicalizing the two
  *     range exchanges to ONE evaluation; if they ever evaluated
  *     independently, boundary sampling (seeded per RDD id) could
  *     assign rows different `__pid`s on the two sides and corrupt
  *     every rank. The checkpoint wraps one concrete RDD, so both
  *     sides read the same blocks by construction.
  *   - plan cost: rank outputs fan out into several consumers at
  *     most call sites (totals aggregate + percentile pick + join
  *     back); an unmaterialized subtree re-derives the FULL upstream
  *     lineage — base scan, tokenize, groupBy — once per consumer
  *     (measured 3-10 redundant corpus scans per query in round 13).
  *     The checkpoint bounds every caller at one upstream pass.
  * The materialized table is the caller's (usually value-count
  * compressed, KB-sized) input plus two long columns; blocks are
  * freed by the ContextCleaner when the result DataFrame goes
  * unreachable. */
object RangeRank {

  /** Range partitions per ranking. Sized so a partition holds ~1/32
    * of the input per the session's shuffle width; a production job
    * raises it with the cluster (offsets stay tiny: parts × |groups|
    * rows). */
  val RangeParts = 32

  /** Inclusive grouped prefix sum of `value` over `sort` order within
    * each `grp` combination: for every input row,
    * out = Σ value over rows of the same group with sort-key ≤ this
    * row's (ties resolved by the caller's unique tiebreak column).
    * Input columns pass through unchanged. */
  def runningSum(df: DataFrame, grp: Seq[String], sort: Seq[Column],
                 value: Column, out: String,
                 parts: Int = RangeParts): DataFrame = {
    val grpCols = grp.map(col)
    val parted = df
      .repartitionByRange(parts, (grpCols ++ sort): _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .localCheckpoint(false) // pin __pid + bound upstream to one pass
    val keyCols = col("__pid") +: grpCols
    val inW = Window.partitionBy(keyCols: _*).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a constant partition key when ungrouped: the offset table is
    // ≤ `parts` rows either way, but an empty partition spec would
    // fire the WindowExec single-partition warning this object exists
    // to eliminate — and a FOLDABLE key (lit) is stripped back to
    // empty by Spark 4's EliminateWindowPartitions, so the constant
    // must reference a column (`__pid div parts` = 0 for every row:
    // range partitioning hands out ids below `parts`)
    val offPart =
      if (grpCols.isEmpty) Seq(expr(s"__pid div $parts")) else grpCols
    val offW = Window.partitionBy(offPart: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parted.groupBy(keyCols: _*).agg(sum(value).as("__c"))
      .withColumn("__off", sum(col("__c")).over(offW))
      .select((keyCols :+ col("__off")): _*)
    parted.withColumn("__run", sum(value).over(inW))
      .join(broadcast(offs), "__pid" +: grp)
      .withColumn(out, col("__run") + coalesce(col("__off"), lit(0L)))
      .drop("__pid", "__run", "__off")
  }

  /** `row_number()` over a K-BOUNDED table (post-`limit` top-K ranks,
    * constant-budget residuals) without the `WindowExec: No Partition
    * Defined` warning: the partition key `pmod(hash(anchor), 1)` is 0
    * for EVERY row (hash never returns null) but references a column,
    * so Spark 4's EliminateWindowPartitions cannot strip it back to
    * an empty — warning-firing — spec. Single-partition execution is
    * the POINT here (the input is K rows); for data-sized input use
    * [[rowNumber]]. `sort` MUST end in a unique tiebreak. */
  def kRank(anchor: Column, sort: Column*): Column =
    row_number().over(
      Window.partitionBy(pmod(hash(anchor), lit(1))).orderBy(sort: _*))

  /** Exact `row_number() OVER (PARTITION BY grp ORDER BY sort)` as a
    * long column — `sort` MUST end in a unique-within-group tiebreak
    * for a deterministic result.
    *
    * Cheaper than [[runningSum]] of 1: the in-partition position
    * falls out of `monotonically_increasing_id` over the range-sorted
    * data (partition id in the high bits, a 0-based in-partition
    * counter in the low 33 — and groups are CONTIGUOUS within a
    * partition sorted by (grp ++ sort), so id − min(id per (pid,
    * grp)) is the 0-based in-group rank), which removes the second
    * full-data exchange and the WindowExec from the data path
    * entirely: one range shuffle + in-partition sort, a
    * parts × |groups|-row aggregate for block minima / start offsets,
    * and a broadcast join back. Deterministic under retries: a
    * re-run task re-reads and re-sorts the same shuffle partition, so
    * ids are reproducible; AQE may coalesce ADJACENT ranges, which
    * preserves block contiguity and pid order. */
  def rowNumber(df: DataFrame, grp: Seq[String], sort: Seq[Column],
                out: String, parts: Int = RangeParts): DataFrame = {
    val grpCols = grp.map(col)
    val parted = df
      .repartitionByRange(parts, (grpCols ++ sort): _*)
      .sortWithinPartitions((grpCols ++ sort): _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", expr("__mid >> 33"))
      .localCheckpoint(false) // pin __mid/__pid + bound upstream to one pass
    val keyCols = col("__pid") +: grpCols
    val offPart = if (grpCols.isEmpty) Seq(expr(s"__pid div $parts")) else grpCols
    val offW = Window.partitionBy(offPart: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parted.groupBy(keyCols: _*)
      .agg(min(col("__mid")).as("__mn"), count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(offW), lit(0L)))
      .select((keyCols :+ col("__mn") :+ col("__off")): _*)
    parted.join(broadcast(offs), "__pid" +: grp)
      .withColumn(out, col("__mid") - col("__mn") + 1L + col("__off"))
      .drop("__pid", "__mid", "__mn", "__off")
  }
}
