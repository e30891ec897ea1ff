package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryFn
import graft.functions.Portable
import graft.sources.Tables

/** Training-mix construction operators over the `documents` table —
  * the steps between a cleaned corpus and an actual training run:
  * token-budget allocation across sources, the deterministic sampled
  * mix itself, and PII screening.
  *
  * All arithmetic that crosses the oracle stays integer (counts,
  * ppm rates, integer division) so the DuckDB twin is bit-exact; the
  * per-source tables are sources-sized (tiny against the corpus), so
  * every join here has a broadcastable build side that AQE picks up
  * without a forced hint.
  */
object MixOps {

  /** Fraction of total tokens the mix keeps: budget = total / BudgetDiv. */
  val BudgetDiv = 5L

  /** Sampling salt for the mix draw (independent of
    * [[TextOps.SampleSalt]]'s stratified-sampling stream). */
  val MixSalt = "mix1"

  /** (doc_id, source, lang, n_tokens), persisted once per data dir: the
    * tokenize pass feeds BOTH the per-source rate aggregation and
    * the per-doc sampling join — without materialization the mix
    * sample tokenizes the corpus twice (the [[TextOps]] sigCache
    * disease; same cure). Four narrow columns. Lifetime mirrors the
    * signature cache: session-long for the gate/bench; a long-lived
    * service calls [[clearTokenCache]] between corpus versions. */
  private val tokCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private[operators] def docTokens(s: SparkSession, d: String): DataFrame =
    tokCache.computeIfAbsent(d, _ =>
      TextOps.docs(s, d)
        .select(col("doc_id"), col("source"), col("lang"),
          size(col("tk")).cast("long").as("n_tokens"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Materialize the per-dir token projection — the bench's named
    * SETUP step (the TextOps warmCaches pattern), now shared by the
    * mix/pack family and `corpus_quantiles`. */
  def warmCaches(s: SparkSession, d: String): Unit = {
    docTokens(s, d).queryExecution.toRdd.count()
    ()
  }

  def clearTokenCache(): Unit = {
    tokCache.values.forEach(df => { df.unpersist(); () })
    tokCache.clear()
  }

  /** Per-source token-budget allocation — the data-mixing step of a
    * training-data pipeline (the published mixes weight sources, then
    * downsample each to its token share). Source weights here derive
    * from the source hash (4 tiers, as `sample_stratified`); a
    * production mix passes an explicit weight table. Every rate is
    * integer ppm arithmetic: budget = total/5 tokens, each source
    * gets budget*w/Σw, its rate is that budget over its token count
    * (capped at 1), expected tokens follow — all exact integer
    * division, replayable anywhere. Scale shape: one corpus scan +
    * one partial-aggregable groupBy(source); the totals are a one-row
    * aggregate cross-joined back (sources-sized result, trivially
    * broadcast). At web scale the per-source budget products stay
    * under 2^62 for corpora to ~10^12 tokens; past that the same
    * plan runs on DECIMAL(38). */
  def tokenBudgetMix(s: SparkSession, d: String): DataFrame =
    budgetRates(perSourceTokens(s, d)
      .withColumn("weight", Portable.h60(col("source")) % 4L + 1L))

  /** Production variant: per-source weights come from an explicit
    * `(source, weight)` table instead of the source hash — how a real
    * mix config arrives (the published mixes are hand-tuned tables).
    * Inner join: the weight table IS the source allowlist; sources
    * absent from it are excluded from the mix. Same integer-ppm
    * arithmetic and plan shape (the weight table is sources-sized, so
    * AQE broadcasts it into the partial-agg output). */
  def tokenBudgetMix(s: SparkSession, d: String, weights: DataFrame): DataFrame =
    budgetRates(perSourceTokens(s, d).join(weights, Seq("source")))

  private def perSourceTokens(s: SparkSession, d: String): DataFrame =
    docTokens(s, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens"))

  /** Gate-pinned mixing temperature for `token_budget_mix_t` and the
    * per-unit integer resolution of the root (weight_t ≈
    * [[TempScale]]·weight^(1/T), so T=1 keeps weights exactly
    * proportional and the floor loses < 1/[[TempScale]] relative). */
  val MixTemp   = 2
  val TempScale = 1000L

  /** EXACT integer t-th root of a non-negative long column:
    * floor(x^(1/t)) seeded from the double pow, then corrected ±2 in
    * exact integer arithmetic — the result is the mathematical
    * integer root whatever the float seed rounded to, so both
    * engines agree by definition, not by matching float behavior.
    * Valid while (s0+2)^t fits a long — x ≤ 4·10^12 here. */
  private def iroot(x: Column, t: Int): Column = {
    def ipow(c: Column): Column = (1 to t).map(_ => c).reduce(_ * _)
    val s0 = floor(pow(x.cast("double"), lit(1.0 / t))).cast("long")
    val up = when(ipow(s0 + 2) <= x, s0 + 2)
      .when(ipow(s0 + 1) <= x, s0 + 1).otherwise(s0)
    when(ipow(up) > x,
      when(ipow(up - lit(1)) > x, up - 2).otherwise(up - 1)).otherwise(up)
  }

  /** TEMPERATURE-scaled token-budget allocation — the standard
    * multinomial temperature knob of the published data mixes
    * (Gopher, LLaMA: sampling rate ∝ share^(1/T); T=1 is the natural
    * mix, T→∞ uniform across sources): [[tokenBudgetMix]]'s linear
    * weights are replaced by weight_t = iroot(weight·TempScale^T, T)
    * ≈ TempScale·weight^(1/T) — an INTEGER-EXACT rational-root
    * definition, so the oracle replays it bit-for-bit (a float pow
    * would leave the family rows-only). The constant TempScale^(1/T)
    * factor cancels in the weight_t/Σweight_t normalization, and at
    * T=1 weight_t = TempScale·weight makes every rate IDENTICAL to
    * `token_budget_mix` (floor of equal rationals — spec-pinned).
    * Same plan shape as the linear mix: one partial-agg groupBy +
    * one-row totals broadcast; per-source budget products stay under
    * 2^62 for corpora to ~10^9 tokens per unit weight·TempScale —
    * past that the same plan runs on DECIMAL(38). */
  def tokenBudgetMixT(s: SparkSession, d: String): DataFrame =
    tokenBudgetMixT(s, d, MixTemp)

  /** Parameterized temperature (integer 1..4 — the published mixes
    * use T in [1, 4]; rational T re-expresses as iroot of an integer
    * power and needs only a wider intermediate). */
  def tokenBudgetMixT(s: SparkSession, d: String, t: Int): DataFrame = {
    require(t >= 1 && t <= 4, s"integer temperature 1..4 supported, got $t")
    val c = (1 to t).map(_ => TempScale).product
    val perSource = perSourceTokens(s, d)
      .withColumn("weight", Portable.h60(col("source")) % 4L + 1L)
      .withColumn("weight_t", iroot(col("weight") * c, t))
    val totals = perSource.agg(
      sum(col("tokens")).as("total_tokens"), sum(col("weight_t")).as("wsum"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("rate_ppm",
        when(col("tokens") > 0,
          least(lit(1000000L),
            expr(s"((total_tokens div $BudgetDiv) * weight_t div wsum) * 1000000 div tokens")))
          .otherwise(lit(0L)))
      .withColumn("expected_tokens", expr("tokens * rate_ppm div 1000000"))
      .select(col("source"), col("n_docs"), col("tokens"), col("weight"),
        col("weight_t"), col("rate_ppm"), col("expected_tokens"))
  }

  /** Temperature grid for [[tokenBudgetMixSweep]] — the published
    * mixes tune T in [1, 4]; the grid brackets the gate-pinned
    * [[MixTemp]] with the linear and near-uniform ends. */
  val TempGrid = Seq(1, 2, 4)

  /** Temperature-TUNING instrument for the mix family (the
    * `ivf_probe_sweep` / `lsh_band_sweep` pattern): a production mix
    * is tuned, not pinned — `token_budget_mix_t` serves one T, this
    * emits the full per-source rate/token allocation across
    * [[TempGrid]] plus the per-T FLATNESS metric (max/min
    * expected-token share ratio, integer ppm: 1e6 = perfectly flat,
    * the T→∞ limit) — the two numbers a mix owner trades off when
    * picking T (how much the cold sources gain vs how far the mix
    * drifts from natural). Pure integer arithmetic over the same
    * per-source totals every leg shares (the iroot rational-root
    * rule keeps all three legs oracle-exact); the T=1 leg reproduces
    * `token_budget_mix`'s rates bit-for-bit and the T=[[MixTemp]]
    * leg `token_budget_mix_t`'s (both spec-pinned). Shape: the legs
    * re-aggregate the persisted [[docTokens]] projection (sources ×
    * |grid| rows total), each with its one-row totals broadcast; the
    * flatness join is a broadcast equi-join on temp. */
  def tokenBudgetMixSweep(s: SparkSession, d: String): DataFrame = {
    val legs = TempGrid.map(t =>
      tokenBudgetMixT(s, d, t).withColumn("temp", lit(t.toLong)))
    // sources × |grid| rows consumed twice (flatness agg + final
    // join) — pin to one evaluation so the three legs' aggregations
    // don't re-run per consumer (the sketch-table rule)
    val all = legs.reduce(_ unionByName _).localCheckpoint(false)
    val flat = all.groupBy(col("temp"))
      .agg(max(col("expected_tokens")).as("max_share_tokens"),
        min(when(col("expected_tokens") > 0, col("expected_tokens")))
          .as("min_share_tokens"))
      .withColumn("flat_ratio_ppm",
        when(col("min_share_tokens") > 0,
          expr("max_share_tokens * 1000000 div min_share_tokens"))
          .otherwise(lit(null).cast("long")))
    all.join(broadcast(flat), Seq("temp"))
      .select(col("temp"), col("source"), col("n_docs"), col("tokens"),
        col("weight"), col("weight_t"), col("rate_ppm"), col("expected_tokens"),
        col("max_share_tokens"), col("min_share_tokens"), col("flat_ratio_ppm"))
  }

  private def budgetRates(perSource: DataFrame): DataFrame = {
    val totals = perSource.agg(
      sum(col("tokens")).as("total_tokens"), sum(col("weight")).as("wsum"))
    perSource.crossJoin(totals)
      // tokens=0 would make the `div` NULL, and NULL-skipping least()
      // would silently turn that into rate_ppm=1000000 (full sampling)
      // — the opposite of the sensible 0 rate for an empty source.
      .withColumn("rate_ppm",
        when(col("tokens") > 0,
          least(lit(1000000L), expr(s"((total_tokens div $BudgetDiv) * weight div wsum) * 1000000 div tokens")))
          .otherwise(lit(0L)))
      .withColumn("expected_tokens", expr("tokens * rate_ppm div 1000000"))
      .select(col("source"), col("n_docs"), col("tokens"), col("weight"),
        col("rate_ppm"), col("expected_tokens"))
  }

  /** The sampled training mix itself: every document draws a
    * counter-hash uniform (same no-state RNG as `sample_stratified`,
    * independent salt) and survives iff it lands under its source's
    * budget-derived rate from [[tokenBudgetMix]]. ONE tokenize pass:
    * both the rate aggregation and the sampling join read the
    * persisted [[docTokens]] projection, and the sources-sized rate
    * table joins back via AQE broadcast. */
  def corpusMixSample(s: SparkSession, d: String): DataFrame =
    mixSample(s, d, tokenBudgetMix(s, d))

  /** Weighted-table companion of [[corpusMixSample]]. */
  def corpusMixSample(s: SparkSession, d: String, weights: DataFrame): DataFrame =
    mixSample(s, d, tokenBudgetMix(s, d, weights))

  private def mixSample(s: SparkSession, d: String, budget: DataFrame): DataFrame = {
    val rates = budget.select(col("source"), col("rate_ppm"))
    docTokens(s, d)
      .join(rates, Seq("source"))
      .withColumn("u_ppm",
        Portable.h60(concat(col("doc_id").cast("string"), lit(":" + MixSalt))) % 1000000L)
      .filter(col("u_ppm") < col("rate_ppm"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("rate_ppm"), col("u_ppm"))
  }

  // ---- sequence packing ------------------------------------------

  /** Training context-window length (tokens) and the shard fan-out of
    * the packing order. */
  val CtxTokens = 2048L
  val PackShards = 8L

  /** Context-window packing — the step between a sampled mix and an
    * actual training run: documents are concatenated in a
    * deterministic order and split at fixed token boundaries
    * (GPT-style concat-and-chunk). Emits, per document, the sequence
    * it starts in, its token offset there, and how many windows it
    * spans. Order is (source, shard, doc_id) with shard =
    * hash(doc_id) — the shard key bounds each window-function
    * partition so packing parallelizes at corpus scale instead of
    * serializing per source (one running-sum partition per
    * (source, shard), sequence ids unique per partition). Rides the
    * persisted [[docTokens]] projection; empty/NULL-text documents
    * are skipped (nothing to pack). */
  def packSequences(s: SparkSession, d: String): DataFrame =
    packFrame(docTokens(s, d))

  /** Production profile: pack the SAMPLED mix, not the whole corpus —
    * the real pipeline is budget → sample → pack, so the packing
    * input is [[corpusMixSample]]'s survivor set (same window, input
    * swapped). The whole-corpus [[packSequences]] stays the
    * DuckDB-checked entry; this composition's invariants (row count =
    * mix size, per-partition token conservation) are pinned by
    * OperatorSpec. One extra plan node only: the mix filter runs over
    * the same persisted [[docTokens]] projection the packer reads. */
  def packMixSequences(s: SparkSession, d: String): DataFrame =
    packFrame(corpusMixSample(s, d))

  /** Weighted-table companion of [[packMixSequences]] — the full
    * production chain with an explicit `(source, weight)` mix table. */
  def packMixSequences(s: SparkSession, d: String, weights: DataFrame): DataFrame =
    packFrame(corpusMixSample(s, d, weights))

  /** Pack on LEARNED tokens: the same concat-and-chunk window keyed
    * on per-doc BPE symbol counts from the fitted tokenizer
    * ([[TextOps.bpeDocTokens]]) instead of whitespace words — what a
    * training run actually consumes is model tokens, and through r15
    * the packer budgeted context windows in a different tokenization
    * than the fit reported (`bpe_apply`). Per-source packed token
    * totals reconcile with `bpe_apply`'s syms_total by construction
    * (spec-pinned). Same plan shape: the BPE count projection rides
    * the cached fit + one broadcast vocab join, then the RangeRank
    * running sum. */
  def packSequencesBpe(s: SparkSession, d: String): DataFrame =
    packFrame(TextOps.bpeDocTokens(s, d))

  private def packFrame(docs: DataFrame): DataFrame = {
    // the packer's prefix sum rides RangeRank (range-partitioned with
    // per-partition offsets): a (source, shard) window puts
    // ~N/(|sources|·PackShards) rows through ONE task — the r12
    // exact-rank hazard class — whereas here PackShards stays a
    // logical grouping knob and the physical parallelism follows the
    // range partitioning regardless of shard count
    val sharded = docs
      .filter(col("n_tokens").isNotNull)
      .withColumn("shard", Portable.h60(col("doc_id").cast("string")) % PackShards)
    RangeRank.runningSum(sharded, Seq("source", "shard"), Seq(col("doc_id")),
        col("n_tokens"), "cum_incl")
      .withColumn("cum_before", col("cum_incl") - col("n_tokens"))
      .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"),
        expr(s"cum_before div $CtxTokens").as("seq_id"),
        (col("cum_before") % CtxTokens).as("seq_offset"),
        // A zero-token (empty non-NULL text) document spans no windows:
        // without the guard the ceil-minus-floor difference reports 1
        // whenever its start offset is not window-aligned.
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr(s"(cum_before + n_tokens + ${CtxTokens - 1}) div $CtxTokens - cum_before div $CtxTokens"))
          .as("n_seqs"))
  }

  // ---- PII screening ---------------------------------------------

  /** Patterns kept inside the regex subset Java (Spark) and RE2
    * (DuckDB) match identically: literal classes, bounded repeats,
    * \b anchors — no backrefs, no lookaround. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  val Ipv4Re  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII screening/redaction — the corpus-hygiene pass production
    * pipelines run before release (emails / phone numbers / IPv4
    * literals): per document, match counts per category, a combined
    * flag, and the post-redaction length (each category replaced by
    * a fixed tag, applied email→phone→ip). Pure codegen'd projection,
    * no shuffle, embarrassingly parallel. The synthetic corpus
    * contains no digits, so the oracle pins the zero-match agreement
    * of both regex engines; the real match path is pinned by the
    * fixture spec (OperatorSpec) with literal PII strings. */
  def piiCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).as("n_emails"),
      regexp_count(col("text"), lit(PhoneRe)).as("n_phones"),
      regexp_count(col("text"), lit(Ipv4Re)).as("n_ipv4"),
      (regexp_count(col("text"), lit(EmailRe)) +
        regexp_count(col("text"), lit(PhoneRe)) +
        regexp_count(col("text"), lit(Ipv4Re)) > 0).as("has_pii"),
      length(regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        Ipv4Re, "<IP>")).as("redact_len"))

  val MaxEpochs     = 4L // data-constrained-scaling repeat cap (~4 epochs)
  val EpochBudgetMul = 2L // epoch-planning budget = total tokens × this

  /** Multi-EPOCH mix plan — the data-constrained regime (Muennighoff
    * et al. 2023, arXiv 2305.16264): when the training budget exceeds
    * a source's unique tokens, the source REPEATS, with returns
    * decaying past ~4 epochs — so the plan allocates per-source
    * desired tokens (weight share of the budget), converts them to
    * epochs capped at MaxEpochs, and reports the tokens actually
    * served. The companion of [[tokenBudgetMix]] for budgets ABOVE
    * the corpus size where that operator's rates saturate at 1. All
    * integer arithmetic (ceil = (d + n − 1) div n), one corpus scan +
    * one partial-agg groupBy + the one-row totals broadcast. */
  def epochPlan(s: SparkSession, d: String): DataFrame = {
    val perSource = perSourceTokens(s, d)
      .withColumn("weight", Portable.h60(col("source")) % 4L + 1L)
    val totals = perSource.agg(
      sum(col("tokens")).as("total_tokens"), sum(col("weight")).as("wsum"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("desired_tokens",
        expr(s"(total_tokens * $EpochBudgetMul) * weight div wsum"))
      .withColumn("epochs",
        when(col("tokens") > 0,
          least(lit(MaxEpochs), expr("(desired_tokens + tokens - 1) div tokens")))
          .otherwise(0L))
      // epochs=0 (empty source) must serve 0, and least() skips NULLs
      .withColumn("served_tokens",
        when(col("epochs") > 0, least(col("desired_tokens"), col("epochs") * col("tokens")))
          .otherwise(0L))
      .select(col("source"), col("n_docs"), col("tokens").cast("long").as("tokens"),
        col("weight"), col("desired_tokens"), col("epochs"), col("served_tokens"))
  }

  /** Packing-efficiency report: per source, the context windows the
    * packer consumes and the integer-ppm fill ratio — the yield
    * metric that says whether `CtxTokens`/`PackShards` sizing wastes
    * budget (each shard's final partial window is the only slack, so
    * fill approaches 1e6 as shards fill; a low number means
    * over-sharding for the corpus size). Windows per (source, shard)
    * = ceil(shard tokens / window) — exactly what the packer's
    * running-sum consumes — aggregated per source from the same
    * persisted token projection, one partial-agg groupBy chain. */
  def packEfficiency(s: SparkSession, d: String): DataFrame =
    docTokens(s, d)
      .filter(col("n_tokens").isNotNull)
      .withColumn("shard", Portable.h60(col("doc_id").cast("string")) % PackShards)
      .groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("toks"))
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("toks")).as("n_tokens"),
        sum(expr(s"(toks + ${CtxTokens - 1}) div $CtxTokens")).as("n_windows"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_windows"),
        expr(s"(n_tokens * 1000000) div (n_windows * $CtxTokens)").cast("long").as("fill_ppm"))

  /** Target-vs-achieved mix audit: per source, the token count the
    * weight table ASKED for (its share of the budget) against what
    * the capped rates DELIVER, with the shortfall in tokens and ppm —
    * the report that says which sources cannot fill their target
    * share (rate capped at 1 because the source is smaller than its
    * allocation), i.e. where the published mix silently re-normalizes.
    * Pure integer arithmetic over [[tokenBudgetMix]]'s own rates (the
    * same budget/weight divisions, so target and achieved are
    * commensurable exactly); one-row totals broadcast back. */
  def mixDeficitReport(s: SparkSession, d: String): DataFrame = {
    val mix = tokenBudgetMix(s, d)
    val totals = mix.agg(
      sum(col("tokens")).as("total_tokens"), sum(col("weight")).as("wsum"))
    mix.crossJoin(broadcast(totals))
      .withColumn("target_tokens",
        expr(s"(total_tokens div $BudgetDiv) * weight div wsum"))
      .withColumn("deficit_tokens",
        greatest(lit(0L), col("target_tokens") - col("expected_tokens")))
      .withColumn("deficit_ppm",
        when(col("target_tokens") > 0,
          expr("(deficit_tokens * 1000000) div target_tokens")).otherwise(lit(0L)))
      .select(col("source"), col("tokens"), col("weight"),
        col("target_tokens"), col("expected_tokens").as("achieved_tokens"),
        col("deficit_tokens"), col("deficit_ppm"))
  }

  val SplitMod = 100L
  val TestPct  = 5L  // bucket < 5        → test  (5%)
  val ValPct   = 10L // bucket ∈ [5, 10)  → val   (5%)
  val SplitSalt = "split1"

  /** Deterministic train/val/test assignment — the split every
    * training pipeline needs FROZEN across reruns and incremental
    * ingests: membership is a pure function of doc_id (salted h60 mod
    * [[SplitMod]]), so re-running after new data arrives never moves
    * an old document between splits (a random split resampled per run
    * leaks eval docs into training history). A pure projection — no
    * shuffle, no state, pushdown-friendly — and the same bucket
    * arithmetic replays in any engine; holdout fraction changes are a
    * threshold edit, not a reshuffle. */
  def dataSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        (Portable.h60(concat(col("doc_id").cast("string"), lit(":" + SplitSalt)))
          % SplitMod).as("bucket"))
      .withColumn("split",
        when(col("bucket") < TestPct, lit("test"))
          .when(col("bucket") < ValPct, lit("val"))
          .otherwise(lit("train")))

  /** Split-stratification QA over [[dataSplit]]: per (split, source),
    * the source's share WITHIN the split vs its global share, as an
    * integer-ppm skew — the check that a hash split really did
    * stratify (a salted uniform hash balances sources in expectation;
    * a systematic skew here means doc_id correlates with source and
    * the salt must change). Composes the split projection with three
    * partial-agg groupBys (split×source, split, source — all
    * dimension-sized) + a one-row total broadcast; exact integers
    * throughout. */
  def splitBalanceReport(s: SparkSession, d: String): DataFrame = {
    val sp = dataSplit(s, d).select(col("split"), col("source"))
    val cell = sp.groupBy(col("split"), col("source")).agg(count(lit(1)).as("n_docs"))
    val bySplit = cell.groupBy(col("split")).agg(sum(col("n_docs")).as("n_split"))
    val bySrc = cell.groupBy(col("source")).agg(sum(col("n_docs")).as("n_source"))
    val tot = cell.agg(sum(col("n_docs")).as("total"))
    cell.join(bySplit, Seq("split")).join(bySrc, Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("(n_docs * 1000000) div n_split"))
      .withColumn("global_ppm", expr("(n_source * 1000000) div total"))
      .select(col("split"), col("source"), col("n_docs"),
        col("share_ppm"), col("global_ppm"),
        (col("share_ppm") - col("global_ppm")).as("skew_ppm"))
  }

  val queries: Map[String, QueryFn] = Map(
    "data_split" -> (dataSplit _),
    "split_balance_report" -> (splitBalanceReport _),
    "mix_deficit_report" -> (mixDeficitReport _),
    "pack_efficiency" -> (packEfficiency _),
    "epoch_plan"        -> (epochPlan _),
    "token_budget_mix"  -> (tokenBudgetMix _),
    "token_budget_mix_t" -> ((s: SparkSession, d: String) => tokenBudgetMixT(s, d)),
    "token_budget_mix_sweep" -> (tokenBudgetMixSweep _),
    "corpus_mix_sample" -> (corpusMixSample _),
    "pack_sequences"    -> (packSequences _),
    "pack_sequences_bpe" -> (packSequencesBpe _),
    "pack_mix_sequences" -> ((s: SparkSession, d: String) => packMixSequences(s, d)),
    "pii_count"         -> (piiCount _))

  private val tkSql = Portable.tokensSql("text")

  private val budgetCtes =
    s"""toks AS (SELECT doc_id, source, $tkSql AS tk FROM documents),
       |ps AS (SELECT source, count(*) AS n_docs, CAST(sum(len(tk)) AS BIGINT) AS tokens,
       |       ${Portable.h60Sql("source")} % 4 + 1 AS weight
       |       FROM toks GROUP BY source),
       |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
       |               CAST(sum(weight) AS BIGINT) AS wsum FROM ps),
       |rates AS (
       |  SELECT source, n_docs, tokens, weight,
       |    CASE WHEN tokens > 0
       |      THEN least(1000000, ((total_tokens // $BudgetDiv) * weight // wsum) * 1000000 // tokens)
       |      ELSE 0 END AS rate_ppm
       |  FROM ps, tot)""".stripMargin

  /** One temperature leg of the sweep's oracle: the generic integer
    * t-th root (double-pow seed, exact ±2 integer correction — the
    * `token_budget_mix_t` rule generalized from sqrt) over the shared
    * `ps` per-source CTE, producing `leg<t>` with the same columns as
    * the Spark leg. Integer powers are written as explicit products
    * so every comparison is exact int64 arithmetic. */
  private def mixTLegSql(t: Int): String = {
    val c = (1 to t).map(_ => TempScale).product
    def ip(e: String) = (1 to t).map(_ => s"($e)").mkString(" * ")
    s"""pw$t AS (SELECT *, weight * $c AS wq FROM ps),
       |sq$t AS (SELECT *, CAST(floor(pow(CAST(wq AS DOUBLE), 1.0 / $t)) AS BIGINT) AS s0 FROM pw$t),
       |su$t AS (SELECT *, CASE WHEN ${ip("s0 + 2")} <= wq THEN s0 + 2
       |                        WHEN ${ip("s0 + 1")} <= wq THEN s0 + 1
       |                        ELSE s0 END AS up FROM sq$t),
       |wt$t AS (SELECT source, n_docs, tokens, weight,
       |         CASE WHEN ${ip("up")} > wq THEN
       |                CASE WHEN ${ip("up - 1")} > wq THEN up - 2 ELSE up - 1 END
       |              ELSE up END AS weight_t
       |       FROM su$t),
       |tt$t AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
       |                CAST(sum(weight_t) AS BIGINT) AS wsum FROM wt$t),
       |leg$t AS (
       |  SELECT CAST($t AS BIGINT) AS temp, source, n_docs, tokens, weight, weight_t,
       |    CASE WHEN tokens > 0
       |      THEN least(1000000, ((total_tokens // $BudgetDiv) * weight_t // wsum) * 1000000 // tokens)
       |      ELSE 0 END AS rate_ppm
       |  FROM wt$t, tt$t)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "token_budget_mix_sweep" ->
      s"""WITH toks AS (SELECT doc_id, source, $tkSql AS tk FROM documents),
         |ps AS (SELECT source, count(*) AS n_docs, CAST(sum(len(tk)) AS BIGINT) AS tokens,
         |       ${Portable.h60Sql("source")} % 4 + 1 AS weight
         |       FROM toks GROUP BY source),
         |${TempGrid.map(mixTLegSql).mkString(",\n")},
         |legs AS (SELECT *, tokens * rate_ppm // 1000000 AS expected_tokens
         |  FROM (${TempGrid.map(t => s"SELECT * FROM leg$t").mkString(" UNION ALL ")})),
         |flat AS (SELECT temp,
         |    CAST(max(expected_tokens) AS BIGINT) AS max_share_tokens,
         |    CAST(min(CASE WHEN expected_tokens > 0 THEN expected_tokens END) AS BIGINT)
         |      AS min_share_tokens
         |  FROM legs GROUP BY temp)
         |SELECT l.temp, l.source, l.n_docs, l.tokens, l.weight, l.weight_t,
         |  l.rate_ppm, l.expected_tokens, f.max_share_tokens, f.min_share_tokens,
         |  CASE WHEN f.min_share_tokens > 0
         |    THEN f.max_share_tokens * 1000000 // f.min_share_tokens END AS flat_ratio_ppm
         |FROM legs l JOIN flat f ON l.temp = f.temp""".stripMargin,
    "data_split" ->
      s"""SELECT doc_id, source, bucket,
         |  CASE WHEN bucket < $TestPct THEN 'test'
         |       WHEN bucket < $ValPct THEN 'val'
         |       ELSE 'train' END AS split
         |FROM (SELECT doc_id, source,
         |        ${Portable.h60Sql(s"CAST(doc_id AS VARCHAR) || ':$SplitSalt'")} % $SplitMod AS bucket
         |      FROM documents)""".stripMargin,
    "split_balance_report" ->
      s"""WITH sp AS (
         |  SELECT source,
         |    CASE WHEN b < $TestPct THEN 'test'
         |         WHEN b < $ValPct THEN 'val'
         |         ELSE 'train' END AS split
         |  FROM (SELECT source,
         |          ${Portable.h60Sql(s"CAST(doc_id AS VARCHAR) || ':$SplitSalt'")} % $SplitMod AS b
         |        FROM documents)),
         |cell AS (SELECT split, source, count(*) AS n_docs FROM sp GROUP BY 1, 2),
         |bs AS (SELECT split, CAST(sum(n_docs) AS BIGINT) AS n_split FROM cell GROUP BY 1),
         |src AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_source FROM cell GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM cell)
         |SELECT cell.split, cell.source, cell.n_docs,
         |       (cell.n_docs * 1000000) // bs.n_split AS share_ppm,
         |       (src.n_source * 1000000) // tot.total AS global_ppm,
         |       (cell.n_docs * 1000000) // bs.n_split
         |         - (src.n_source * 1000000) // tot.total AS skew_ppm
         |FROM cell
         |JOIN bs ON cell.split = bs.split
         |JOIN src ON cell.source = src.source, tot""".stripMargin,
    "pack_efficiency" ->
      s"""WITH toks AS (SELECT doc_id, source, $tkSql AS tk FROM documents),
         |tt AS (SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n_tokens,
         |         ${Portable.h60Sql("CAST(doc_id AS VARCHAR)")} % $PackShards AS shard
         |       FROM toks WHERE tk IS NOT NULL),
         |sh AS (SELECT source, shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS toks
         |       FROM tt GROUP BY source, shard)
         |SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |       CAST(sum(toks) AS BIGINT) AS n_tokens,
         |       CAST(sum((toks + ${CtxTokens - 1}) // $CtxTokens) AS BIGINT) AS n_windows,
         |       CAST((CAST(sum(toks) AS BIGINT) * 1000000)
         |            // (CAST(sum((toks + ${CtxTokens - 1}) // $CtxTokens) AS BIGINT) * $CtxTokens) AS BIGINT) AS fill_ppm
         |FROM sh GROUP BY source""".stripMargin,
    "epoch_plan" ->
      s"""WITH toks AS (SELECT doc_id, source, $tkSql AS tk FROM documents),
         |ps AS (SELECT source, count(*) AS n_docs, CAST(sum(len(tk)) AS BIGINT) AS tokens,
         |       ${Portable.h60Sql("source")} % 4 + 1 AS weight
         |       FROM toks GROUP BY source),
         |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
         |               CAST(sum(weight) AS BIGINT) AS wsum FROM ps),
         |des AS (
         |  SELECT source, n_docs, tokens, weight,
         |         (total_tokens * $EpochBudgetMul) * weight // wsum AS desired_tokens
         |  FROM ps, tot),
         |ep AS (
         |  SELECT *, CASE WHEN tokens > 0
         |    THEN least($MaxEpochs, (desired_tokens + tokens - 1) // tokens)
         |    ELSE 0 END AS epochs
         |  FROM des)
         |SELECT source, n_docs, tokens, weight, desired_tokens, epochs,
         |       CASE WHEN epochs > 0 THEN least(desired_tokens, epochs * tokens)
         |            ELSE 0 END AS served_tokens
         |FROM ep""".stripMargin,
    "pack_sequences" ->
      s"""WITH toks AS (SELECT doc_id, source, $tkSql AS tk FROM documents),
         |tt AS (SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n_tokens,
         |         ${Portable.h60Sql("CAST(doc_id AS VARCHAR)")} % $PackShards AS shard
         |       FROM toks WHERE tk IS NOT NULL),
         |cb AS (SELECT *, CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM tt)
         |SELECT doc_id, source, shard, n_tokens,
         |  cum_before // $CtxTokens AS seq_id,
         |  cum_before % $CtxTokens AS seq_offset,
         |  CASE WHEN n_tokens = 0 THEN 0
         |    ELSE (cum_before + n_tokens + ${CtxTokens - 1}) // $CtxTokens - cum_before // $CtxTokens
         |  END AS n_seqs
         |FROM cb""".stripMargin,
    "pack_sequences_bpe" ->
      s"""WITH ${TextOps.bpeCtesSql},
         |vocab AS (
         |  SELECT w, CAST(len(string_split(seq, '${TextOps.BpeDelim}')) - 1 AS BIGINT) AS n_syms
         |  FROM w${TextOps.BpeMerges}),
         |corpus AS (SELECT doc_id, source, unnest($tkSql) AS w
         |           FROM documents WHERE text IS NOT NULL),
         |bt AS (
         |  SELECT doc_id, source, CAST(sum(v.n_syms) AS BIGINT) AS n_tokens
         |  FROM corpus c JOIN vocab v ON c.w = v.w
         |  WHERE c.w <> '' GROUP BY doc_id, source),
         |tt AS (SELECT doc_id, source, n_tokens,
         |         ${Portable.h60Sql("CAST(doc_id AS VARCHAR)")} % $PackShards AS shard
         |       FROM bt),
         |cb AS (SELECT *, CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM tt)
         |SELECT doc_id, source, shard, n_tokens,
         |  cum_before // $CtxTokens AS seq_id,
         |  cum_before % $CtxTokens AS seq_offset,
         |  CASE WHEN n_tokens = 0 THEN 0
         |    ELSE (cum_before + n_tokens + ${CtxTokens - 1}) // $CtxTokens - cum_before // $CtxTokens
         |  END AS n_seqs
         |FROM cb""".stripMargin,
    "pack_mix_sequences" ->
      s"""WITH $budgetCtes,
         |samp AS (
         |  SELECT t.doc_id, t.source, t.tk
         |  FROM toks t JOIN rates r ON t.source = r.source
         |  WHERE ${Portable.h60Sql(s"CAST(t.doc_id AS VARCHAR) || ':$MixSalt'")} % 1000000 < r.rate_ppm),
         |tt AS (SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS n_tokens,
         |         ${Portable.h60Sql("CAST(doc_id AS VARCHAR)")} % $PackShards AS shard
         |       FROM samp WHERE tk IS NOT NULL),
         |cb AS (SELECT *, CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before FROM tt)
         |SELECT doc_id, source, shard, n_tokens,
         |  cum_before // $CtxTokens AS seq_id,
         |  cum_before % $CtxTokens AS seq_offset,
         |  CASE WHEN n_tokens = 0 THEN 0
         |    ELSE (cum_before + n_tokens + ${CtxTokens - 1}) // $CtxTokens - cum_before // $CtxTokens
         |  END AS n_seqs
         |FROM cb""".stripMargin,
    "token_budget_mix" ->
      s"""WITH $budgetCtes
         |SELECT source, n_docs, tokens, weight, rate_ppm,
         |  tokens * rate_ppm // 1000000 AS expected_tokens
         |FROM rates""".stripMargin,
    "token_budget_mix_t" -> {
      // exact integer sqrt: double-seeded floor + exact +-2 correction
      // (the corrected value is THE integer root whatever the float
      // seed rounded to — engine-agreement by definition)
      val c2 = TempScale * TempScale
      s"""WITH toks AS (SELECT doc_id, source, $tkSql AS tk FROM documents),
         |ps AS (SELECT source, count(*) AS n_docs, CAST(sum(len(tk)) AS BIGINT) AS tokens,
         |       ${Portable.h60Sql("source")} % 4 + 1 AS weight
         |       FROM toks GROUP BY source),
         |pw AS (SELECT *, weight * $c2 AS wq FROM ps),
         |sq0 AS (SELECT *, CAST(floor(sqrt(CAST(wq AS DOUBLE))) AS BIGINT) AS s0 FROM pw),
         |squ AS (SELECT *, CASE WHEN (s0 + 2) * (s0 + 2) <= wq THEN s0 + 2
         |                       WHEN (s0 + 1) * (s0 + 1) <= wq THEN s0 + 1
         |                       ELSE s0 END AS up FROM sq0),
         |wt AS (SELECT source, n_docs, tokens, weight,
         |         CASE WHEN up * up > wq THEN
         |                CASE WHEN (up - 1) * (up - 1) > wq THEN up - 2 ELSE up - 1 END
         |              ELSE up END AS weight_t
         |       FROM squ),
         |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
         |               CAST(sum(weight_t) AS BIGINT) AS wsum FROM wt),
         |rts AS (
         |  SELECT source, n_docs, tokens, weight, weight_t,
         |    CASE WHEN tokens > 0
         |      THEN least(1000000, ((total_tokens // $BudgetDiv) * weight_t // wsum) * 1000000 // tokens)
         |      ELSE 0 END AS rate_ppm
         |  FROM wt, tot)
         |SELECT source, n_docs, tokens, weight, weight_t, rate_ppm,
         |  tokens * rate_ppm // 1000000 AS expected_tokens
         |FROM rts""".stripMargin
    },
    "mix_deficit_report" ->
      s"""WITH $budgetCtes,
         |r2 AS (
         |  SELECT source, tokens, weight,
         |         tokens * rate_ppm // 1000000 AS achieved_tokens
         |  FROM rates),
         |t2 AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens,
         |              CAST(sum(weight) AS BIGINT) AS wsum FROM r2),
         |b AS (
         |  SELECT source, tokens, weight, achieved_tokens,
         |         (total_tokens // $BudgetDiv) * weight // wsum AS target_tokens
         |  FROM r2, t2),
         |c AS (
         |  SELECT source, tokens, weight, target_tokens, achieved_tokens,
         |         greatest(CAST(0 AS BIGINT), target_tokens - achieved_tokens) AS deficit_tokens
         |  FROM b)
         |SELECT source, tokens, weight, target_tokens, achieved_tokens, deficit_tokens,
         |  CASE WHEN target_tokens > 0 THEN (deficit_tokens * 1000000) // target_tokens
         |       ELSE CAST(0 AS BIGINT) END AS deficit_ppm
         |FROM c""".stripMargin,
    "corpus_mix_sample" ->
      s"""WITH $budgetCtes
         |SELECT doc_id, source, n_tokens, rate_ppm, u_ppm FROM (
         |  SELECT t.doc_id, t.source, CAST(len(t.tk) AS BIGINT) AS n_tokens, r.rate_ppm,
         |    ${Portable.h60Sql(s"CAST(t.doc_id AS VARCHAR) || ':$MixSalt'")} % 1000000 AS u_ppm
         |  FROM toks t JOIN rates r ON t.source = r.source)
         |WHERE u_ppm < rate_ppm""".stripMargin,
    "pii_count" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS INT) AS n_phones,
         |  CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS INT) AS n_ipv4,
         |  (len(regexp_extract_all(text, '$EmailRe')) +
         |   len(regexp_extract_all(text, '$PhoneRe')) +
         |   len(regexp_extract_all(text, '$Ipv4Re'))) > 0 AS has_pii,
         |  CAST(length(regexp_replace(
         |    regexp_replace(
         |      regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
         |      '$PhoneRe', '<PHONE>', 'g'),
         |    '$Ipv4Re', '<IP>', 'g')) AS INT) AS redact_len
         |FROM documents""".stripMargin)
}
