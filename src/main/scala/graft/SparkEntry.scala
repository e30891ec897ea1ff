package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 + §7.
  *
  * `queries` maps every implemented SURVEY §2 operator key to its
  * DataFrame plan; `oracleSql` carries the DuckDB-checkable SQL twin
  * the driver hashes against at sf0.01. Keys and output column names
  * are identical on both sides by construction (each operator object
  * keeps the pair adjacent).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    MergeOps.mergeFlatfile(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Quality.queries ++ MergeOps.queries ++ TextOps.queries ++
      GeoOps.queries ++ SignalOps.queries ++ CcldOps.queries ++
      EventOps.queries ++ AnnOps.queries ++ MultiModalOps.queries ++
      MixOps.queries ++ GraphOps.queries ++ SketchOps.queries ++
      Map(
        "streaming_sessionize" -> ((s, d) => graft.streaming.StreamingSessionize.run(s, d)),
        "streaming_window_counts" -> ((s, d) => graft.streaming.StreamingWindowCounts.run(s, d)),
        "streaming_dedup_exact" -> ((s, d) => graft.streaming.StreamingDedup.run(s, d)),
        "streaming_corpus_filter" -> ((s, d) => graft.streaming.StreamingCorpusFilter.run(s, d)),
        "streaming_interval_join" -> ((s, d) => graft.streaming.StreamingIntervalJoin.run(s, d)),
        "streaming_running_aggs" -> ((s, d) => graft.streaming.StreamingRunningAggs.run(s, d)),
        "streaming_asof_join" -> ((s, d) => graft.streaming.StreamingAsofJoin.run(s, d)),
        "streaming_trailing_counts" -> ((s, d) => graft.streaming.StreamingTrailingCounts.run(s, d)),
        "streaming_funnel" -> ((s, d) => graft.streaming.StreamingFunnel.run(s, d)),
        "streaming_db_upsert" -> ((s, d) => graft.streaming.StreamingUpsert.run(s, d)),
        "streaming_sliding_counts" -> ((s, d) => graft.streaming.StreamingSlidingCounts.run(s, d)),
        "streaming_distinct_kmv" -> ((s, d) => graft.streaming.StreamingDistinctKmv.run(s, d)),
        "streaming_hot_keys" -> ((s, d) => graft.streaming.StreamingHotKeys.run(s, d)),
        "streaming_quantile_hist" -> ((s, d) => graft.streaming.StreamingQuantileHist.run(s, d)),
        "streaming_hll" -> ((s, d) => graft.streaming.StreamingHll.run(s, d)),
        "streaming_cms" -> ((s, d) => graft.streaming.StreamingCms.run(s, d)),
        "streaming_bloom" -> ((s, d) => graft.streaming.StreamingBloom.run(s, d)),
        "streaming_markov_score" -> ((s, d) => graft.streaming.StreamingMarkovScore.run(s, d)),
        "streaming_dedup_minhash" -> ((s, d) => graft.streaming.StreamingDedupMinhash.run(s, d)),
        "streaming_span_dedup" -> ((s, d) => graft.streaming.StreamingSpanDedup.run(s, d)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Quality.oracles ++ MergeOps.oracles ++ TextOps.oracles ++
      GeoOps.oracles ++ SignalOps.oracles ++ CcldOps.oracles ++
      EventOps.oracles ++ AnnOps.oracles ++ MultiModalOps.oracles ++
      MixOps.oracles ++ GraphOps.oracles ++ SketchOps.oracles ++
      // the streaming variants are deterministic under AvailableNow
      // (bounded input), so batch SQL oracles can check them
      Map(
        "streaming_sessionize" -> EventOps.oracles("sessionize"),
        "streaming_window_counts" -> graft.streaming.StreamingWindowCounts.oracle,
        "streaming_dedup_exact" -> graft.streaming.StreamingDedup.oracle,
        "streaming_corpus_filter" -> graft.streaming.StreamingCorpusFilter.oracle,
        "streaming_interval_join" -> graft.streaming.StreamingIntervalJoin.oracle,
        "streaming_running_aggs" -> EventOps.oracles("user_running_aggs"),
        "streaming_asof_join" -> EventOps.oracles("asof_join"),
        "streaming_trailing_counts" -> EventOps.oracles("trailing_window_counts"),
        "streaming_funnel" -> graft.streaming.StreamingFunnel.oracle,
        "streaming_db_upsert" -> MergeOps.oracles("db_upsert"),
        "streaming_sliding_counts" -> EventOps.oracles("sliding_window_counts"),
        "streaming_distinct_kmv" -> SketchOps.oracles("distinct_kmv"),
        "streaming_hot_keys" -> EventOps.oracles("hot_keys"),
        "streaming_quantile_hist" -> SketchOps.oracles("quantile_hist_sketch"),
        "streaming_hll" -> SketchOps.oracles("hll_distinct"),
        "streaming_cms" -> SketchOps.cmsCountersOracle,
        "streaming_bloom" -> SketchOps.bloomWordsOracle,
        "streaming_markov_score" -> graft.streaming.StreamingMarkovScore.oracle,
        "streaming_dedup_minhash" -> graft.streaming.StreamingDedupMinhash.oracle,
        "streaming_span_dedup" -> graft.streaming.StreamingSpanDedup.oracle)
}
