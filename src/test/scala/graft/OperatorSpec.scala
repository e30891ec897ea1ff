package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators._
import graft.streaming.StreamingSessionize

/** Operator-level tests on the sf0.001 testdata.
  *
  * The DuckDB oracle (dev/verify.sh) is the cross-engine correctness
  * gate; these tests pin the properties the oracle can't see:
  * determinism under re-partitioning (every window must order on a
  * unique key), semantic invariants recomputed in plain Scala, and
  * batch/streaming equivalence.
  */
class OperatorSpec extends AnyFunSuite with BeforeAndAfterAll {

  val Sf = "/root/testdata/sf0.001"
  var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark = Sessions.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) {
    // exercise the cache-release path (every per-dir session cache,
    // including the checkpointed ABWD pair table) before shutdown
    graft.operators.Caches.clearAll()
    spark.stop()
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(df.col): _*).collect()
      .map(r => (0 until r.length).map(r.get))
      .sortBy(_.mkString("|")).toSeq
  }

  /** Every batch operator must give identical results regardless of
    * partitioning — catches any window orderBy missing its unique-key
    * (pk) tiebreaker, the exact defect class fixed this round. */
  test("all batch operators are deterministic under re-partitioning") {
    for (name <- SparkEntry.queries.keys.toSeq.sorted if !name.startsWith("streaming_")) {
      val fn = SparkEntry.queries(name)
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = sortedRows(fn(spark, Sf))
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = sortedRows(fn(spark, Sf))
      assert(a == b, s"$name changed results when shuffle partitioning changed")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("driver contract: every query has an oracle and distinct output columns") {
    // Iterative driver-loop operators are not single-query SQL; the
    // driver records a rows-only check for them (no oracle entry).
    val rowsOnly = Set("aftershock_clusters", "event_station_distances_geo",
      "rrup_distances_geo", "ccld_vertices",
      // float Viterbi-EM (log scores are transcendental, outside the
      // cross-engine bit-exact set) — gated by the sequential
      // recompute spec instead, documented in uniFitUncached
      "unigram_lm_train", "unigram_fertility")
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet -- rowsOnly,
      s"queries/oracles key mismatch: ${SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)} " +
        s"/ ${(SparkEntry.queries.keySet -- rowsOnly).diff(SparkEntry.oracleSql.keySet)}")
    // iterative driver-loop operators execute during CONSTRUCTION
    // (eager checkpoints), so reading .columns would run the whole
    // loop; their schemas are asserted by their own dedicated tests
    val iterative = Set("aftershock_clusters", "dup_clusters")
    for (name <- SparkEntry.queries.keys.toSeq.sorted
         if !name.startsWith("streaming_") && !iterative(name)) {
      val cols = SparkEntry.queries(name)(spark, Sf).columns.toSeq
      assert(cols.distinct.length == cols.length, s"$name has duplicate output columns: $cols")
    }
  }

  test("quality_gopher keeps a row for NULL-text documents") {
    import org.apache.spark.sql.functions._
    // a real corpus contains NULL text; explode would silently drop
    // those docs (split(NULL) -> NULL -> no rows) where the oracle's
    // per-row projection keeps a row of NULL metrics — pin the
    // explode_outer + count(term) + ratio-guard path on a fixture
    // the driver testdata doesn't cover
    val dir = java.nio.file.Files.createTempDirectory("graft_gopher_null").toString
    val base = graft.sources.Tables.documents(spark, Sf).limit(20)
    val extra = spark.range(2).select(
      (col("id") + 1000000L).as("doc_id"),
      when(col("id") === 0, lit(null).cast("string")).otherwise(lit("")).as("text"),
      lit("en").as("lang"), lit("synthetic").as("source"),
      lit(0L).as("n_chars"))
    base.unionByName(extra).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.qualityGopher(spark, dir)
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 22, s"expected all 22 docs to survive, got ${rows.size}")
    val nullDoc = rows(1000000L)
    assert(nullDoc.isNullAt(nullDoc.fieldIndex("top_word_ratio")),
      "NULL-text doc must carry NULL top_word_ratio")
    assert(nullDoc.isNullAt(nullDoc.fieldIndex("n_words")),
      "NULL-text doc must carry NULL n_words")
    assert(rows.contains(1000001L), "empty-text doc must survive")
  }

  test("typed Graft API matches the untyped catalogue plans") {
    import org.apache.spark.sql.functions._
    val g = graft.api.Graft(spark, Sf)
    // typed filter on a case-class field equals the Column filter
    val typedBig = g.events.filter(_.mag >= 5.5).collect().map(_.evid).sorted.toSeq
    val untypedBig = graft.model.Catalog.events(spark, Sf)
      .filter(col("mag") >= 5.5).select("evid").collect().map(_.getLong(0)).sorted.toSeq
    assert(typedBig == untypedBig)
    // nullable columns surface as Options
    assert(g.stations.collect().exists(_.sta_vs30.isEmpty),
      "Vs30 nulls must decode as None")
    // materialize every typed accessor: encoder/schema drift between
    // the case classes and Catalog.records/Tables.documents would
    // otherwise pass tests and fail only at first user call
    assert(g.records.head().record_id.nonEmpty)
    assert(g.documents.head().doc_id >= 0L)
    // the operator registry is reachable by name and rejects unknowns
    assert(g.query("q_catalog").count() > 0)
    assert(g.queryNames.contains("dedup_minhash"))
    intercept[IllegalArgumentException](g.query("nope"))
  }

  test("corpus operators tolerate an empty documents/embeddings table") {
    // empty ingest batches are routine in a continuously-fed pipeline;
    // every corpus operator must plan and execute to an empty (or
    // totals-only) result, not throw
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    spark.read.parquet(s"$Sf/documents.parquet").limit(0)
      .write.parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$Sf/embeddings.parquet").limit(0)
      .write.parquet(s"$dir/embeddings.parquet")
    val names = (operators.TextOps.queries.keys ++ operators.MixOps.queries.keys ++
      operators.AnnOps.queries.keys).toSeq.sorted
    for (n <- names) {
      val df = try { val d = SparkEntry.queries(n)(spark, dir); d.collect(); d }
      catch { case e: Throwable => fail(s"$n threw on empty input: $e") }
      if (n == "filter_funnel") {
        // the funnel is a TOTALS report: on empty input it must still
        // emit its 4 stages, every count zero (a vanished report would
        // hide an empty-ingest incident)
        val rows = df.collect()
        assert(rows.length == 4 && rows.forall(r =>
          r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L),
          s"filter_funnel empty-input report malformed")
      } else if (n == "ivf_balance_report") {
        // an empty INDEX still has its cells: the report must show
        // every cell at 0 occupancy, 0 ppm (the all-empty state is
        // itself the re-train signal)
        val rows = df.collect()
        assert(rows.length == AnnOps.NCells && rows.forall(r =>
          r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L),
          s"ivf_balance_report empty-index report malformed")
      } else if (n == "minhash_recall_sample") {
        // a one-row totals report: zero sample docs / zero pairs,
        // vacuous recall 1e6 — not a vanished report
        val rows = df.collect()
        assert(rows.length == 1 && rows.head.getLong(0) == 0L &&
          rows.head.getLong(1) == 0L && rows.head.getLong(2) == 0L &&
          rows.head.getLong(3) == 1000000L,
          s"minhash_recall_sample empty-input report malformed")
      } else if (n == "ivf_probe_sweep") {
        // a TOTALS report per probe level: zero queries/candidates,
        // NULL ratios — not a vanished sweep
        val rows = df.collect()
        assert(rows.length == AnnOps.ProbeSweep.size && rows.forall(r =>
          r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L &&
            r.getLong(4) == 0L && r.isNullAt(5) && r.isNullAt(6)),
          s"ivf_probe_sweep empty-index report malformed")
      } else if (n == "graph_walk_sweep") {
        // a TOTALS report per beam level: zero queries/visited/hits,
        // 0-ppm recall (the ivf_balance_report zero convention) —
        // not a vanished sweep
        val rows = df.collect()
        assert(rows.length == AnnOps.WalkBeamGrid.size && rows.forall(r =>
          (1 until 7).forall(i => r.getLong(i) == 0L)),
          s"graph_walk_sweep empty-index report malformed")
      } else if (n == "unigram_fertility") {
        // a one-row totals report: zero words/pieces/symbols, zero
        // ppm ratios — not a vanished comparison
        val rows = df.collect()
        assert(rows.length == 1 && (0 until 5).forall(i => rows.head.getLong(i) == 0L),
          s"unigram_fertility empty-input report malformed")
      } else if (n == "lsh_band_sweep") {
        // a TOTALS report per config: 0 candidates / 0 verified rows,
        // not a vanished sweep
        val rows = df.collect()
        assert(rows.length == TextOps.LshSweepRs.size && rows.forall(r =>
          r.getLong(2) == 0L && r.getLong(3) == 0L),
          s"lsh_band_sweep empty-input report malformed")
      } else
        assert(df.count() == 0, s"$n returned rows on empty input")
    }
  }

  test("im_rotd production profile (180 angles x 111 periods) runs the same plan end-to-end") {
    import graft.functions.{Rotd, Sdof}
    val prod = SignalOps.imRotdProfile(spark, Sf,
      Rotd.anglesN(Rotd.ProdNAngles), Sdof.ProdPeriods, Rotd.suffixMs)
    // 1 record_id + 3 stats per period + 3 PGA stats; all names distinct
    assert(prod.columns.length == 1 + 3 * Sdof.ProdPeriods.length + 3)
    assert(prod.columns.distinct.length == prod.columns.length,
      "production period naming must not collide")
    // limit keeps the test fast: the plan is a pure projection, so
    // Spark evaluates only the collected rows
    val rows = prod.limit(20).collect()
    assert(rows.length == 20)
    for (r <- rows; t <- Seq(0.1, 1.0, 10.0)) {
      val s = Rotd.suffixMs(t)
      val (lo, med, hi) = (r.getDouble(r.fieldIndex(s"rotd0_$s")),
        r.getDouble(r.fieldIndex(s"rotd50_$s")), r.getDouble(r.fieldIndex(s"rotd100_$s")))
      assert(lo <= med && med <= hi, s"rotd ordering violated at $t s: $lo / $med / $hi")
    }
  }

  test("FlatfileSink.splitByComponent writes per-component files with pruned schemas") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    // component-shaped IM table: rotd rows must lose the fas column,
    // eas rows the psa column — the merge_flatfiles.py:631-644 rule
    // deterministic fixture: limit() over a repartitioned scan picks
    // arbitrary rows and can miss a component class; an evid filter
    // always selects the same ~60 rows
    val df = graft.model.Catalog.records(spark, Sf).filter(col("evid") <= 15)
      .select(col("record_id"),
        (col("pk") % 3).cast("int").as("ci"),
        col("im_val").as("psa_p10"), col("snr_val").as("fas_k2"))
      .withColumn("component",
        when(col("ci") === 0, "rotd50").when(col("ci") === 1, "eas").otherwise("000"))
      .drop("ci")
    val paths = graft.sources.FlatfileSink.splitByComponent(df, "component",
      Map("rotd50" -> Seq("fas_k2"), "eas" -> Seq("psa_p10")), dir)
    assert(paths.keySet == Set("000", "eas", "rotd50"))
    val back000 = spark.read.option("header", "true").csv(paths("000"))
    val backR = spark.read.option("header", "true").csv(paths("rotd50"))
    val backE = spark.read.option("header", "true").csv(paths("eas"))
    assert(back000.columns.toSet == Set("record_id", "psa_p10", "fas_k2", "component"))
    assert(backR.columns.toSet == Set("record_id", "psa_p10", "component"))
    assert(backE.columns.toSet == Set("record_id", "fas_k2", "component"))
    val total = back000.count() + backR.count() + backE.count()
    assert(total == df.count(), s"split lost rows: $total vs ${df.count()}")
  }

  test("token_budget_mix never over-allocates the global token budget") {
    import org.apache.spark.sql.functions._
    val mix = MixOps.tokenBudgetMix(spark, Sf).collect()
    val totalTokens = mix.map(r => r.getLong(r.fieldIndex("tokens"))).sum
    val expected = mix.map(r => r.getLong(r.fieldIndex("expected_tokens"))).sum
    val budget = totalTokens / MixOps.BudgetDiv
    assert(expected <= budget,
      s"sum(expected_tokens)=$expected exceeds budget=$budget of total=$totalTokens")
    // every rate is a valid ppm and capped sources keep all their tokens
    for (r <- mix) {
      val rate = r.getLong(r.fieldIndex("rate_ppm"))
      assert(rate >= 0 && rate <= 1000000, s"rate_ppm $rate out of range")
      if (rate == 1000000)
        assert(r.getLong(r.fieldIndex("expected_tokens")) == r.getLong(r.fieldIndex("tokens")))
    }
    // the sampled mix respects each source's rate exactly
    val sampled = MixOps.corpusMixSample(spark, Sf).collect()
    for (r <- sampled)
      assert(r.getLong(r.fieldIndex("u_ppm")) < r.getLong(r.fieldIndex("rate_ppm")))
  }

  test("pii_count matches hand-counted PII on a literal fixture") {
    import org.apache.spark.sql.functions._
    // the driver corpus has no digits, so the oracle only pins
    // zero-match agreement; this fixture exercises the real match
    // and redaction path with known counts
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    val rows = Seq(
      (1L, "contact alice@example.com or bob.smith@mail.co today", 2, 0, 0),
      (2L, "call 555-123-4567 or 555 987 6543 now", 0, 2, 0),
      (3L, "server at 10.0.0.1 and 192.168.001.200 talked", 0, 0, 2),
      (4L, "mixed: c@d.io, 111-222-3333, 8.8.8.8", 1, 1, 1),
      (5L, "clean text with no personal data at all", 0, 0, 0))
    val df = spark.createDataFrame(rows).toDF("doc_id", "text", "e", "p", "i")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("fix").as("source"), length(col("text")).cast("long").as("n_chars"))
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = MixOps.piiCount(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))).toMap
    val want = rows.map(r => r._1 -> ((r._3, r._4, r._5, r._3 + r._4 + r._5 > 0))).toMap
    assert(got == want, s"got $got, want $want")
    // redaction shrinks or grows length only where matches exist
    val lens = MixOps.piiCount(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(5)).toMap
    assert(lens(5L) == rows.find(_._1 == 5L).get._2.length,
      "no-PII doc must keep its exact length after redaction")
    assert(lens(4L) != rows.find(_._1 == 4L).get._2.length,
      "PII doc length must change under redaction")
  }

  test("explicit weight-table mix: hash-weight identity + source allowlist") {
    val ss = spark; import ss.implicits._
    // passing the hash-derived weights back as a literal table must
    // reproduce the default output exactly
    val hashOut = MixOps.tokenBudgetMix(spark, Sf).collect()
    val wtab = hashOut.map(r => (r.getString(0), r.getLong(3))).toSeq
      .toDF("source", "weight")
    val tabOut = MixOps.tokenBudgetMix(spark, Sf, wtab).collect()
    assert(tabOut.map(_.toString).sorted.toSeq == hashOut.map(_.toString).sorted.toSeq)
    // a subset weight table is a source allowlist; the rate follows
    // the integer ppm arithmetic recomputed here exactly
    val src = hashOut.map(_.getString(0)).min
    val sub = MixOps.tokenBudgetMix(spark, Sf,
      Seq((src, 3L)).toDF("source", "weight")).collect()
    assert(sub.map(_.getString(0)).toSeq == Seq(src))
    val tokens = sub.head.getLong(2)
    val want = math.min(1000000L,
      ((tokens / MixOps.BudgetDiv) * 3L / 3L) * 1000000L / tokens)
    assert(sub.head.getLong(4) == want)
    val samp = MixOps.corpusMixSample(spark, Sf,
      Seq((src, 3L)).toDF("source", "weight"))
    assert(samp.select("source").distinct().collect()
      .map(_.getString(0)).toSeq == Seq(src))
  }

  test("zero-token source gets rate_ppm 0, not full sampling") {
    val ss = spark; import ss.implicits._
    // a source whose docs all have NULL text sums to NULL tokens; the
    // NULL-skipping least() would silently yield rate 1000000 without
    // the tokens>0 guard
    val dir = java.nio.file.Files.createTempDirectory("graft_zerotok").toString
    // src_a needs enough tokens that the integer ppm arithmetic
    // doesn't round its rate to zero on a toy corpus
    val longText = Seq.fill(100)("tok").mkString(" ")
    Seq((1L, Some(longText), "en", "src_a", longText.length.toLong),
        (2L, Some("delta epsilon"), "en", "src_a", 13L),
        (3L, Option.empty[String], "en", "src_b", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rates = MixOps.tokenBudgetMix(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(rates("src_b") == 0L, "zero-token source must get rate 0")
    assert(rates("src_a") > 0L)
    val samp = MixOps.corpusMixSample(spark, dir).collect()
    assert(samp.forall(_.getString(1) == "src_a"))
  }

  test("pack_sequences composes over the sampled mix (production profile)") {
    import org.apache.spark.sql.functions._
    val mixRows = MixOps.corpusMixSample(spark, Sf).count()
    val packedMix = MixOps.packMixSequences(spark, Sf).collect()
    val packedCorpus = MixOps.packSequences(spark, Sf).collect()
    // packing annotates, never drops or duplicates: one output row per
    // sampled document, and the mix is a strict subset of the corpus
    assert(packedMix.length.toLong == mixRows)
    assert(mixRows > 0 && packedMix.length < packedCorpus.length)
    // every packed-mix doc appears in the packed corpus with the same
    // token count (the sample changes WHICH docs pack, not their size)
    val corpusTok = packedCorpus.map(r => r.getLong(0) -> r.getLong(3)).toMap
    for (r <- packedMix)
      assert(corpusTok.get(r.getLong(0)).contains(r.getLong(3)))
    // exact packing invariant per (source, shard) partition: the last
    // occupied window index must equal (sum(tokens)-1) div ctx — the
    // running sum leaves no gaps and spans no phantom windows
    val ctx = MixOps.CtxTokens
    for ((_, rs) <- packedMix.groupBy(r => (r.getString(1), r.getLong(2)))) {
      val tokens = rs.map(_.getLong(3)).sum
      if (tokens > 0) {
        val lastWin = rs.filter(_.getLong(3) > 0)
          .map(r => r.getLong(4) + r.getLong(6) - 1).max
        assert(lastWin == (tokens - 1) / ctx,
          s"packing gap: last window $lastWin vs expected ${(tokens - 1) / ctx}")
      }
    }
  }

  test("quality_all equals the composition of the individual quality filters") {
    import org.apache.spark.sql.functions._
    // intersect the per-filter survivor sets, then channel-dedup them —
    // must equal the one-pass quality_all output record set
    val ids = Seq("quality_has_score", "quality_score_min", "quality_multi_max",
      "quality_fmax_min", "quality_fmin_max", "quality_missing_sta", "quality_ground_level")
      .map(n => SparkEntry.queries(n)(spark, Sf).select("record_id"))
      .reduce(_ intersect _)
    val deduped = operators.Quality.queries("dedup_channels")(spark, Sf)
      .select("record_id")
    val expected = ids.intersect(deduped).collect().map(_.getString(0)).toSet
    val got = operators.Quality.qualityAll(spark, Sf)
      .select("record_id").collect().map(_.getString(0)).toSet
    // quality_all dedups within survivors, not globally, so compare on
    // the survivor side only: every quality_all record passes each filter
    assert(got.subsetOf(ids.collect().map(_.getString(0)).toSet))
    assert(expected.subsetOf(got),
      "records surviving all filters and global dedup must appear in quality_all")
  }

  test("ground_level_argmin picks |loc_elev| minimum with pk tiebreak") {
    val recs = graft.model.Catalog.records(spark, Sf)
      .select("evid", "sta", "record_id", "loc_elev", "lnum", "pk").collect()
    val expected = recs.groupBy(r => (r.getLong(0), r.getLong(1))).map { case (k, rows) =>
      val best = rows.minBy { r =>
        val elev = if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3))
        (if (elev == null) 1 else 0,
          if (elev == null) 0.0 else math.abs(elev.doubleValue),
          r.getLong(4), r.getLong(5))
      }
      k -> best.getString(2)
    }
    val got = MergeOps.groundLevelArgmin(spark, Sf)
      .select("evid", "sta", "record_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got.size == expected.size)
    for ((k, rid) <- expected) assert(got(k) == rid, s"group $k picked ${got(k)}, expected $rid")
  }

  test("sessionize matches a plain-Scala gap-rule recomputation") {
    val out = EventOps.sessionize(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = out.groupBy(_._2)
    for ((_, evs) <- byUser) {
      val ordered = evs.sortBy(e => (e._3, e._1))
      var sess = 0L; var last = Long.MinValue
      for ((_, _, ts, gotSess) <- ordered) {
        if (last == Long.MinValue || ts - last > EventOps.GapUs) sess += 1
        assert(gotSess == sess, s"session index mismatch at ts=$ts")
        last = ts
      }
    }
  }

  test("streaming sessionize equals the batch window result") {
    val batch = sortedRows(EventOps.sessionize(spark, Sf))
    val stream = sortedRows(StreamingSessionize.run(spark, Sf))
    assert(stream == batch)
  }

  /** The deployment-shape guarantee: a durable sink + checkpoint means
    * a RESTARTED stream resumes from the offset log with every user's
    * open session rehydrated from the state store. Split the events
    * time-wise, run the stream, add the second half, restart with the
    * SAME checkpoint — the union of sink output must equal the batch
    * window over the full data, which can only happen if run 2 (a) did
    * not re-emit run 1's rows and (b) continued run 1's open sessions
    * rather than restarting session indices at 1. */
  test("streaming sessionize survives a restart: checkpoint carries open-session state") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    val schema = ev.schema
    // split TIME-wise: the state fold only moves forward in event
    // time, so part 2 must be strictly later than part 1
    val withUs = ev.withColumn("us", EventOps.tsUs(schema("ts").dataType))
    val Array(mid) = withUs.stat.approxQuantile("us", Array(0.5), 0.0)
    withUs.filter(col("us") <= mid).drop("us").write.parquet(s"$src/part1.parquet")
    graft.streaming.StreamingSessionize.runFileSink(
      spark, s"$src/*.parquet", sink, ckpt, schema)
    val rowsAfterRun1 = spark.read.parquet(sink).count()
    assert(rowsAfterRun1 > 0 && rowsAfterRun1 < ev.count())
    withUs.filter(col("us") > mid).drop("us").write.parquet(s"$src/part2.parquet")
    graft.streaming.StreamingSessionize.runFileSink(
      spark, s"$src/*.parquet", sink, ckpt, schema)
    val streamed = sortedRows(spark.read.parquet(sink))
    val batch = sortedRows(EventOps.sessionize(spark, Sf))
    assert(streamed == batch,
      "restarted stream output must equal the batch window over full data")
  }

  /** Watermark contract, pinned across a restart: a row older than the
    * CHECKPOINTED watermark is dropped before aggregation (the rule
    * that bounds streaming state at any scale), and append mode emits
    * each closed window exactly once. Run 1 processes the early half
    * (persisting watermark = max(part1) − 2 h); run 2 adds the late
    * half plus a DUPLICATE of the very earliest event — far below the
    * persisted watermark, so its window's emitted count must equal the
    * batch count WITHOUT the duplicate. */
  test("streaming window counts drop sub-watermark late data across a restart") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_late").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    val schema = ev.schema
    val withUs = ev.withColumn("us", EventOps.tsUs(schema("ts").dataType))
    val Array(mid) = withUs.stat.approxQuantile("us", Array(0.5), 0.0)
    val stats = withUs.agg(min("us"), max("us")).head
    assert(mid - stats.getLong(0) > 4L * 3600 * 1000000,
      "fixture needs part1 to span > watermark delay + window")
    withUs.filter(col("us") <= mid).drop("us").write.parquet(s"$src/part1.parquet")
    graft.streaming.StreamingWindowCounts.runFileSinkAppend(
      spark, s"$src/*.parquet", sink, ckpt, schema)
    // the too-late row: a duplicate of the earliest event
    val late = withUs.orderBy(col("us")).limit(1).drop("us")
    withUs.filter(col("us") > mid).drop("us").unionByName(late)
      .write.parquet(s"$src/part2.parquet")
    graft.streaming.StreamingWindowCounts.runFileSinkAppend(
      spark, s"$src/*.parquet", sink, ckpt, schema)
    val emitted = spark.read.parquet(sink)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(emitted.nonEmpty, "some windows must have closed")
    // batch truth over the ON-TIME events only (no duplicate)
    val batch = withUs
      .select((col("us") - col("us") % (3600L * 1000000)).as("win_start_us"),
        col("event_type"), expr("cast(round(value * 100) as bigint)").as("cents"))
      .groupBy("win_start_us", "event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    for ((k, v) <- emitted)
      assert(batch(k) == v, s"window $k: emitted $v != batch-without-late ${batch(k)}")
    val lateRow = late.select(EventOps.tsUs(schema("ts").dataType).as("us"),
      col("event_type")).head
    val lateKey = (lateRow.getLong(0) - lateRow.getLong(0) % (3600L * 1000000),
      lateRow.getString(1))
    assert(emitted.contains(lateKey),
      "the late event's window must have been emitted (closed) — otherwise the drop is untested")
  }

  test("streaming running aggs equal the batch window result") {
    val batch = sortedRows(EventOps.userRunningAggs(spark, Sf))
    val stream = sortedRows(graft.streaming.StreamingRunningAggs.run(spark, Sf))
    assert(stream == batch)
  }

  /** r9 postmortem guard: a hand-declared `LongType` stream schema over
    * a column the driver had regenerated as TIMESTAMP(MICROS) silently
    * misscaled every timestamp 1000x — plausible numbers, caught only
    * by the oracle. Two invariants keep that class dead: the stream
    * schema must BE the batch footer schema, and both ts vintages must
    * convert to identical epoch-micros. */
  test("stream schema matches the parquet footer and both ts vintages convert identically") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val sp = spark
    import sp.implicits._
    val declared = StreamingSessionize.eventsSchema(spark, Sf)
    val batch = spark.read.parquet(s"$Sf/events.parquet").schema
    assert(declared == batch, "stream schema must derive from the parquet footer")
    val us = Seq(0L, 1755043200123456L, 86400L * 1000000L + 7L)
    val fromNanos = us.map(_ * 1000L).toDF("ts")
      .select(EventOps.tsUs(org.apache.spark.sql.types.LongType).as("us"))
      .as[Long].collect().toSeq
    val ntz = us.toDF("raw")
      .select(timestamp_micros(col("raw")).cast("timestamp_ntz").as("ts"))
    val fromNtz = ntz.select(EventOps.tsUs(ntz.schema("ts").dataType).as("us"))
      .as[Long].collect().toSeq
    assert(fromNanos == us, s"nanos-long vintage misconverted: $fromNanos")
    assert(fromNtz == us, s"TIMESTAMP_NTZ vintage misconverted: $fromNtz")
  }

  /** Chunking invariants, recomputed in plain Scala against whatever
    * documents live in `dir`: dense chunk_idx, stride-spaced starts,
    * exact per-chunk token counts, full coverage of every token, one
    * all-NULL row per NULL-text doc. */
  private def checkChunkInvariants(dir: String): Unit = {
    val ct = TextOps.ChunkTokens; val st = TextOps.ChunkStride
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    val rows = TextOps.chunkDocuments(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getString(4))))
    assert(rows.map(_._1).distinct.length == docs.size, "every doc appears")
    for ((docId, chunks) <- rows.groupBy(_._1)) {
      val n = docs(docId).map(_.split(" ", -1).length.toLong)
      if (n.isEmpty) {
        assert(chunks.length == 1 && chunks.head._2.isEmpty, s"doc $docId: NULL text row")
      } else {
        val idx = chunks.flatMap(_._2).sorted
        assert(idx.toSeq == (0L until idx.length).toSeq, s"doc $docId: dense chunk_idx")
        for ((_, Some(i), Some(start), Some(len), Some(text)) <- chunks) {
          assert(start == i * st && len == math.min(n.get - start, ct))
          assert(text.split(" ", -1).length.toLong == len, s"doc $docId chunk $i token count")
        }
        val last = chunks.flatMap(c => c._3.zip(c._4).map { case (s0, l) => s0 + l }).max
        assert(last == n.get, s"doc $docId: chunks cover all $n tokens")
      }
    }
  }

  test("chunk_documents covers every token with stride-spaced dense chunks") {
    checkChunkInvariants(Sf)
  }

  /** r10 width-fix pin: a single-row-group parquet scan must come out
    * of Tables widened to session parallelism (otherwise every
    * map-side pipeline runs single-threaded until its first exchange),
    * while the values stay identical to an unwidened read. */
  test("under-split scans are widened to session parallelism") {
    val width = spark.sparkContext.defaultParallelism
    val t = graft.sources.Tables.lineitem(spark, Sf)
    assert(t.rdd.getNumPartitions >= width,
      s"lineitem read has ${t.rdd.getNumPartitions} partitions, want >= $width")
    val raw = spark.read.parquet(s"$Sf/lineitem.parquet")
    assert(t.count() == raw.count())
  }

  test("chunk_documents multi-chunk path on synthetic long docs (testdata docs are all 1-chunk)") {
    // boundary fixture: n == window (1 chunk), n == window+1 (2),
    // n == window+stride (2), n == window+stride+1 (3), a long doc,
    // a NULL text, and an empty string
    val sp = spark
    import sp.implicits._
    val ct = TextOps.ChunkTokens.toInt; val st = TextOps.ChunkStride.toInt
    def doc(n: Int): String = (0 until n).map(i => s"w$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_chunk").toString
    Seq(
      (1L, Option(doc(ct))), (2L, Option(doc(ct + 1))),
      (3L, Option(doc(ct + st))), (4L, Option(doc(ct + st + 1))),
      (5L, Option(doc(1000))), (6L, None), (7L, Option(""))
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    checkChunkInvariants(dir)
    val counts = TextOps.chunkDocuments(spark, dir)
      .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 1, 2L -> 2, 3L -> 2, 4L -> 3, 5L -> 5, 6L -> 1, 7L -> 1))
  }

  test("minhash candidate pairs are ordered, distinct, with exact jaccard in [0,1]") {
    val rows = TextOps.ngramJaccard(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty, "expected at least one candidate pair at sf0.001")
    assert(rows.forall { case (a, b, _) => a < b }, "pairs must be (ida < idb)")
    assert(rows.map(p => (p._1, p._2)).distinct.length == rows.length, "pairs must be distinct")
    assert(rows.forall { case (_, _, j) => j >= 0.0 && j <= 1.0 })
  }

  test("dedup_keep_best keeps exactly one max-length member per cluster") {
    val clusters = TextOps.dupClusters(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nWords = TextOps.textQuality(spark, Sf)
      .collect().map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Int].toLong))).toMap
    val kept = TextOps.dedupKeepBest(spark, Sf)
      .collect().map(r => (r.getLong(1), (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    val byCluster = clusters.groupBy(_._2)
    assert(kept.size == byCluster.size, "one kept doc per cluster")
    for ((cid, members) <- byCluster) {
      val best = members.map(_._1)
        .map(id => (nWords(id).getOrElse(-1L), id))
        .sortBy { case (n, id) => (-n, id) }.head
      assert(kept(cid)._1 == best._2,
        s"cluster $cid: kept ${kept(cid)._1}, expected argmax ${best._2}")
    }
  }

  test("dedup keeps a canonical doc per duplicate class and never drops uniques") {
    val n = spark.read.parquet(s"$Sf/documents.parquet").count()
    val exact = TextOps.dedupExact(spark, Sf).count()
    val mh = TextOps.dedupMinhash(spark, Sf).count()
    assert(exact <= n && mh <= n)
    assert(mh > 0 && exact > 0)
    // near-dup dedup can only remove docs that exact dedup keeps
    assert(mh <= exact)
  }

  test("ann top-k ranks are dense from 1 and cosines are valid and descending") {
    val rows = AnnOps.annCosineTopk(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    for ((q, group) <- rows.groupBy(_._1)) {
      val byRank = group.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1 to byRank.length).toSeq, s"ranks not dense for query $q")
      assert(byRank.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
        s"cosine not descending for query $q")
      assert(group.forall(r => r._4 >= -1.0000001 && r._4 <= 1.0000001))
    }
  }

  test("lsh ann results are a subset of same-bucket candidates, never self-matches") {
    val rows = AnnOps.annLshTopk(spark, Sf).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)), "self-match leaked")
  }

  test("multimodal decode kernel is deterministic and plumbing preserves ids") {
    val bytes = "some payload".getBytes("UTF-8")
    assert(MultiModalOps.decodeStub(bytes) == MultiModalOps.decodeStub(bytes))
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val out = MultiModalOps.multimodalMeta(spark, Sf)
    assert(out.count() == docs.count())
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_bytes", "header0", "header1", "width", "height", "n_frames"))
  }

  test("every nested-loop join in every plan is a classified bounded shape") {
    // Every BroadcastNestedLoopJoin a plan is ALLOWED to contain is
    // declared here with its boundedness class and a node-count cap —
    // an unclassified query growing a BNLJ, or a classified query
    // growing MORE of them, fails. The classes (each broadcast side
    // is bounded by something other than the corpus size):
    //  scalar — a ONE-ROW broadcast (corpus totals, budget totals,
    //    watermarks, time-span bounds, per-dim scale rows) crossed
    //    onto data or dimension rows; never a pair fan.
    //  dim2   — the unordered type/source-dimension² pair frame: two
    //    broadcast DISTINCT-key dims crossed over ≤K-row sketch
    //    states or per-dim count rows.
    //  ann    — the ANN gates: broadcast centroid table (~√N rows,
    //    IVF coarse quantizer), 128-row PQ codebook, the bounded
    //    query set of the brute-force baseline / exhaustive ADC
    //    scans, plus their one-row scale/total companions.
    //  sample — minhash_recall_sample's deliberately sample-bounded
    //    ground-truth cross (fixed-size hash-rank slice vs itself).
    val bnlj: Map[String, (String, Int)] = Map(
      // ann: brute-force baseline, IVF/PQ/SQ assignment + ADC scans,
      // trainer/QA companions (each also carries scalar totals).
      // r17: NCells-assignment consumers carry +1 — the cached
      // assignedCells InMemoryRelation lineage prints its N×cells
      // cross in plan text (runs once at setup; cached-lineage note)
      "ann_cosine_topk" -> ("ann", 1), "ann_ivf_topk" -> ("ann", 3),
      "ann_pq_topk" -> ("ann", 2), "ann_sq_topk" -> ("ann", 2),
      // recall report composes all six index variants (r14 added
      // PQ + IVF+PQ, r15 the graph walk): brute(1) + ivf(2) + pq(2)
      // + ivfpq(3) + graph-walk seed cross(1) gates
      // recall report: +1 r17 — the cached assignedCells lineage's
      // assignment cross shows in plan text when the cache is cold
      "ann_ivf_pq_topk" -> ("ann", 4), "ann_recall_report" -> ("ann", 10),
      // the query-side × GraphSeeds entry-point cross (both tiny)
      "ann_graph_search" -> ("ann", 1),
      // 3 beam legs × the two one-row aggregate crosses
      // (volume × hits × n_true); walk internals sit behind per-round
      // checkpoints and the cached refined-edge table
      "graph_walk_sweep" -> ("ann", 6),
      // probe sweep: checkpointed brute baseline (BNLJ runs at
      // construction, not in this plan) + 3 probe legs × (centroid
      // assignment + query-probe crosses) + the one-row corpus total
      "ivf_probe_sweep" -> ("ann", 10),
      // kmeans_step: the assignment cross appears once live and once
      // inside the cached assignedCells InMemoryRelation lineage
      // (plan-text count; runs once — the spec's cached-lineage note)
      "semdedup" -> ("ann", 2), "kmeans_step" -> ("ann", 2),
      "kmeanspp_init" -> ("ann", 3), "quantize_error" -> ("ann", 1),
      "ivf_balance_report" -> ("ann", 5),
      // dim2: type/source-dimension² pair frames over sketch states
      "kmv_intersect" -> ("dim2", 4), "kmv_difference" -> ("dim2", 2),
      "hll_intersect" -> ("dim2", 2), "cms_join_estimate" -> ("dim2", 1),
      "source_overlap" -> ("dim2", 1),
      // sample: the recall ground truth is a fixed-size sample cross
      "minhash_recall_sample" -> ("sample", 3),
      // scalar: one-row totals/watermark/bounds broadcasts
      "tfidf_topk" -> ("scalar", 1), "token_budget_mix" -> ("scalar", 1),
      // same one-row budget-totals broadcast as the linear mix
      "token_budget_mix_t" -> ("scalar", 1),
      // one budget-totals broadcast per temperature leg
      "token_budget_mix_sweep" -> ("scalar", 3),
      "corpus_mix_sample" -> ("scalar", 1),
      // pack_mix_sequences: the sampled-mix input (with its one-row
      // budget-totals scalar) appears twice in the packer's RangeRank
      // (main + offsets passes)
      "pack_mix_sequences" -> ("scalar", 2),
      "bm25_topk" -> ("scalar", 1), "bigram_lift" -> ("scalar", 1),
      "split_balance_report" -> ("scalar", 1), "epoch_plan" -> ("scalar", 1),
      "timeseries_fill" -> ("scalar", 1), "hot_keys" -> ("scalar", 1),
      "session_cooccurrence" -> ("scalar", 1), "churn_flags" -> ("scalar", 1),
      "mix_deficit_report" -> ("scalar", 3),
      // rfm_segments: the watermark/user-count scalar appears once in
      // the output row and twice inside the recency rank's
      // RangeRank (main + offset passes)
      "rfm_segments" -> ("scalar", 3),
      // conversion_lag: the one-row converted-count broadcast that
      // feeds the nearest-rank pick targets
      "conversion_lag" -> ("scalar", 1),
      "cms_heavy_hitters" -> ("scalar", 1), "shuffle_skew_report" -> ("scalar", 1),
      "salt_plan" -> ("scalar", 1), "ngram_kn_probs" -> ("scalar", 1),
      // lm_doc_score: the one-row bigram-type-count broadcast inside
      // the full-model pkn table
      "lm_doc_score" -> ("scalar", 1),
      "session_duration_histogram" -> ("scalar", 1),
      "tfidf_cosine_pairs" -> ("scalar", 4))
    // pin the per-dir session caches to their steady (built) state
    // first: a cold cache's first consumer constructs the cached
    // DataFrame inside its own plan, so BNLJ plan-text counts would
    // depend on which spec ran first (observed r17: ±1 on the IVF
    // family between isolation and full-suite runs). Warm = the state
    // the bench and every real session run in.
    operators.TextOps.warmCaches(spark, Sf)
    operators.AnnOps.warmCaches(spark, Sf)
    operators.GeoOps.warmCaches(spark, Sf)
    operators.MixOps.warmCaches(spark, Sf)
    val batchQueries = SparkEntry.queries.keys.filterNot(_.startsWith("streaming_"))
    for (name <- batchQueries) {
      val df = SparkEntry.queries(name)(spark, Sf)
      // driver-sortable contract: the driver's compare harness sorts
      // rows with pandas, which cannot hash array/map cells (r16:
      // bpe_encode / chunk_documents_bpe went RED on raw array<long>
      // columns) — every ORACLE-COMPARED query must emit scalars only
      if (SparkEntry.oracleSql.contains(name))
        for (f <- df.schema.fields)
          assert(!f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
                 !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType],
            s"$name checked output column ${f.name} is ${f.dataType.simpleString} — " +
              "the driver's pandas sorter cannot hash it; emit a joined string or exploded rows")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plan has a CartesianProduct")
      val n = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
      bnlj.get(name) match {
        case None => assert(n == 0,
          s"$name plan has $n UNCLASSIFIED nested-loop join(s) — declare its bounded shape or fix the plan")
        case Some((shape, cap)) => assert(n <= cap,
          s"$name ($shape) grew nested-loop joins: $n > declared cap $cap")
      }
    }
  }

  test("no plan scans a base table more times than its declared cap") {
    // The guard for the round-13 regression class: an unmaterialized
    // shared subtree re-derives its base scan once per consumer, so a
    // mechanical refactor can silently turn one corpus pass into 8-10
    // (conversion_lag scanned events 8×, rfm_segments 10× in r13).
    // Counts come from the same formatted plans committed as the
    // dev/plans_r* audit artifacts. Default cap: 2 scans per base
    // table per query (one data pass + one independent aggregate /
    // join-back leg). Anything above must be DECLARED here. The
    // declared queries fall into two classes, both bounded:
    //  - reuse-covered: byte-identical aggregate subtrees repeated in
    //    the plan text whose exchanges canonicalize equal, so the
    //    runtime executes ONE pass (verified: each runs <2.5 s at
    //    sf0.1 where a real N-pass plan would multiply); kept as
    //    plan-text duplicates because a checkpoint barrier measurably
    //    costs more than the reuse at any scale.
    //  - multi-pass by design: iterative/driver-loop operators whose
    //    passes are over DIMENSION-bounded (not corpus-bounded)
    //    tables — the ABWD dependency build, the kNN-graph composers.
    // NOTE: scans hidden behind materialization (localCheckpoint /
    // persisted caches) run exactly once by construction — the point
    // of the fix — so they rightly don't count here.
    val caps: Map[String, Map[String, Int]] = Map(
      "aftershock_flags" -> Map("orders" -> 7),
      "aftershock_mainshock" -> Map("orders" -> 6),
      "ann_ivf_pq_topk" -> Map("embeddings" -> 3),
      // 5 index variants × ~2 legs each + the brute baseline (r14:
      // PQ + IVF+PQ joined the gate) — all reuse-covered scans of a
      // dimension-bounded table
      "ann_recall_report" -> Map("embeddings" -> 11),
      // brute ground truth is checkpointed (1 evaluation); the three
      // probe legs repeat the byte-identical assignment subtree
      // (reuse-covered) + the 1-row corpus count
      "ivf_probe_sweep" -> Map("embeddings" -> 7),
      "ann_sq_topk" -> Map("embeddings" -> 3),
      "bigram_lift" -> Map("documents" -> 4),
      "bloom_semi_filter" -> Map("events" -> 3),
      "bm25_topk" -> Map("documents" -> 4),
      "ccld_mw_scaling" -> Map("orders" -> 3),
      "ccld_sample_sigma" -> Map("orders" -> 3),
      "cdc_apply" -> Map("lineitem" -> 3),
      "cms_error_report" -> Map("documents" -> 3),
      "cms_heavy_hitters" -> Map("documents" -> 4),
      "dedup_cross_source" -> Map("documents" -> 3),
      "dedup_incremental" -> Map("documents" -> 4),
      "edit_ratio_pairs" -> Map("documents" -> 3),
      "kmeanspp_init" -> Map("embeddings" -> 4),
      "knn_degree_stats" -> Map("embeddings" -> 3),
      // two exact-cosine scoring joins into the vector table + the
      // plan-TEXT scans embedded in the persisted kNN-edge relation's
      // lineage (InMemoryRelation bodies print their build plan; the
      // build runs once by construction)
      "knn_refine" -> Map("embeddings" -> 4),
      "knn_label_purity" -> Map("embeddings" -> 4),
      "knn_predict" -> Map("embeddings" -> 4),
      "ngram_kn_probs" -> Map("documents" -> 4),
      "ngram_lm_counts" -> Map("documents" -> 4),
      "pagerank_knn" -> Map("embeddings" -> 7),
      "source_overlap" -> Map("documents" -> 4),
      // spans (2 corpus passes: hash occurrence counts + the positioned
      // run merge) + the token explode + the base row set — 4 distinct
      // single-evaluation legs, no redundant derivation
      "span_excise" -> Map("documents" -> 4),
      // base-frame agg scan + the survivor-side positioned explode
      // referenced by both the occurrence count and the islands merge
      // (reuse-covered, the span_excise class); the keep verdict is
      // checkpointed to one evaluation
      "dedup_stack_report" -> Map("documents" -> 4),
      // span_excise's 4 declared legs + the per-source size projection
      // it aggregates against (Catalyst prunes the clean_text rebuild,
      // not the scans)
      "span_excise_savings" -> Map("documents" -> 5),
      // spans (2 passes) + the per-source token total
      "dup_span_stats" -> Map("documents" -> 3),
      "split_balance_report" -> Map("documents" -> 4),
      "split_leakage_report" -> Map("documents" -> 3),
      "tfidf_cosine_pairs" -> Map("documents" -> 13),
      "tfidf_topk" -> Map("documents" -> 3),
      "triangle_count" -> Map("embeddings" -> 3))
    val scanRe =
      """\(\d+\) Scan parquet ?\n(?:.*\n)*?Location: \S+ \[file:([^\]]+)\]""".r
    val batchQueries = SparkEntry.queries.keys.filterNot(_.startsWith("streaming_"))
    for (name <- batchQueries) {
      val plan = SparkEntry.queries(name)(spark, Sf).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      val counts = scanRe.findAllMatchIn(plan)
        .map(_.group(1).stripSuffix("/").split("/").last.stripSuffix(".parquet"))
        .toSeq.groupBy(identity).map { case (t, xs) => t -> xs.size }
      for ((table, n) <- counts) {
        val cap = caps.getOrElse(name, Map.empty).getOrElse(table, 2)
        assert(n <= cap,
          s"$name scans $table $n times (cap $cap) — materialize the shared subtree " +
            "or declare the multi-pass design here")
      }
    }
  }

  test("every per-dir session cache is wired into Caches.clearAll") {
    // greps the operator sources for per-dir cache declarations and
    // compares against the count declared NEXT TO the release switch:
    // adding a cache without bumping Caches.WiredCaches fails here,
    // and bumping it means looking at clearAll — the friction that
    // prevents the stale-cache-after-corpus-swap defect from shipping
    // a third time
    import scala.jdk.CollectionConverters._
    val srcRoot = java.nio.file.Paths.get("src/main/scala/graft")
    val declared = java.nio.file.Files.walk(srcRoot).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      // any qualification of the class name counts — an imported or
      // partially-qualified ConcurrentHashMap must not dodge the gate
      .map(s => "new (java\\.util\\.concurrent\\.)?(concurrent\\.)?ConcurrentHashMap\\[String".r
        .findAllIn(s).length)
      .sum
    assert(declared == Caches.WiredCaches,
      s"$declared per-dir caches declared in source but Caches.WiredCaches says " +
        s"${Caches.WiredCaches} — wire the new cache into Caches.clearAll and bump the constant")
  }

  test("exchange reuse actually fires for the largest reuse-dependent plans") {
    // The two declared plan-text multi-scans whose COST rides on
    // exchange-reuse canonicalization (ann_recall_report,
    // tfidf_cosine_pairs) — exactly the fragility class behind the
    // r13 RangeRank defect ("correctness/cost silently riding on two
    // subtrees canonicalizing equal"). The scan-cap test above pins
    // plan-TEXT counts; this one pins RUNTIME truth: it EXECUTES each
    // query and sums the source rows actually read (task
    // inputMetrics; block-manager reads of persisted/checkpointed
    // tables count too but are identical on both sides). The baseline
    // is measured IN THIS TEST by re-running the same query with
    // spark.sql.exchange.reuse off — no calibrated absolute
    // multipliers to rot when a fixture, a constant, or Spark's
    // input accounting changes (the r15 spec pinned 15x/7x absolute
    // caps and was one QMod edit away from a false failure). A
    // refactor that makes the repeated subtrees canonicalize
    // differently erases the on/off gap and fails HERE instead of
    // silently multiplying corpus scans at 100 TB. Warm-up runs
    // first so per-dir cache construction (kNN graph, walk results,
    // signatures) is charged to neither side.
    val readAcc = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) readAcc.addAndGet(m.inputMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      def recordsRead(q: String): Long = {
        Thread.sleep(500) // drain in-flight listener events
        readAcc.set(0L)
        SparkEntry.queries(q)(spark, Sf).queryExecution.toRdd.count()
        Thread.sleep(800) // drain the async listener bus
        readAcc.get
      }
      for (q <- Seq("ann_recall_report", "tfidf_cosine_pairs")) {
        recordsRead(q) // warm caches; measurement discarded
        val withReuse = recordsRead(q)
        spark.conf.set("spark.sql.exchange.reuse", "false")
        val withoutReuse =
          try recordsRead(q)
          finally spark.conf.set("spark.sql.exchange.reuse", "true")
        // measured gap on this data: ann ~11x vs ~20x of its base
        // table (0.55), tfidf ~4.2x vs ~12.1x (0.35); the 0.85 bar
        // sits far above both honest ratios but below "reuse does
        // nothing" (1.0 ± noise)
        assert(withReuse <= (withoutReuse * 0.85).toLong,
          s"$q reads $withReuse source rows with exchange reuse vs $withoutReuse " +
            "without — the repeated subtrees no longer canonicalize equal (reuse " +
            "buys <15%); re-unify them or materialize the shared subtree")
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bench corrected-median rule is robust to a burst in either window") {
    // the three adjudication classes the committed record must get
    // right, each with the run values observed live
    // r13-r15 class: burst in the suite window, quiet tail — corrects
    // down to the honest cost
    assert(Bench.sixRunMedian(Seq(8.18, 5.41, 4.85), Seq(1.36, 1.33, 1.49)) == 1.49)
    // r16 class: burst landing ON the tail window (ccld_sample_sigma,
    // first r16 run) — a tail-only rule records 3.45, min() records
    // the luckiest median; the 6-run median stays at the honest spread
    assert(Bench.sixRunMedian(Seq(2.83, 1.59, 1.92), Seq(3.4, 3.45, 3.6)) == 2.83)
    // a genuine regression reproduces in both windows and stays high
    assert(Bench.sixRunMedian(Seq(5.0, 5.2, 5.1), Seq(5.05, 5.3, 5.15)) == 5.1)
    assert(Bench.sixRunMedian(Seq(1.0, 1.0, 1.0), Seq(1.0, 1.0, 1.0)) == 1.0)
  }

  test("bench regression floor resists a contended committed record") {
    // the r16 baseline-poisoning loophole: a contended run committed
    // as bench_detail_last ratcheted the cross-run baseline up and
    // masked six >2× movers. The floor is the per-query min over the
    // committed record AND the rolling corrected-median history, so:
    // r16 live values — dedup_normalized committed at 1.26 (contended)
    // with a 0.48 quiet run in history keeps the honest 0.48 floor
    assert(Bench.floorBaseline(
      Map("dedup_normalized" -> 1.26), Map("dedup_normalized" -> Seq(0.48, 1.26)))
      ("dedup_normalized") == 0.48)
    // a query only the committed record knows still gets a floor
    assert(Bench.floorBaseline(Map("new_q" -> 2.0), Map())("new_q") == 2.0)
    // a query only history knows (record overwritten by a dev run)
    assert(Bench.floorBaseline(Map(), Map("q" -> Seq(1.5, 1.2)))("q") == 1.2)
    // an intentional regression ages out: once history holds only
    // post-change runs, the floor follows the new honest cost
    assert(Bench.floorBaseline(
      Map("q" -> 3.1), Map("q" -> Seq(3.0, 3.2, 3.1, 3.05)))("q") == 3.0)
  }

  test("streaming_span_dedup equals the batch span_dedup_incremental exactly") {
    // same probe, same index, same islands merge — the stream variant
    // must reproduce the batch operator's located spans value-for-value
    def keyset(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val batch = keyset(SparkEntry.queries("span_dedup_incremental")(spark, Sf).collect())
    val stream = keyset(SparkEntry.queries("streaming_span_dedup")(spark, Sf).collect())
    assert(stream.nonEmpty && stream == batch,
      s"stream located ${stream.size} spans vs batch ${batch.size}")
  }

  test("dedup_stack_report composes the three dedup stages consistently") {
    // the stack report must partition every document into exactly one
    // outcome, share its exact stage with dedup_savings verbatim, and
    // its survivor-relocated span coverage can only SHRINK against the
    // full-corpus coverage (duplicate occurrences are monotone in the
    // doc set — the double-counting the composed report exists to
    // avoid)
    val sv = SparkEntry.queries("dedup_savings")(spark, Sf).collect()
      .map(r => r.getString(r.fieldIndex("source")) -> r).toMap
    val st = SparkEntry.queries("dup_span_stats")(spark, Sf).collect()
      .map(r => r.getString(r.fieldIndex("source")) -> r).toMap
    val rep = SparkEntry.queries("dedup_stack_report")(spark, Sf).collect()
    assert(rep.nonEmpty && rep.length == sv.size)
    for (r <- rep) {
      val s0 = r.getString(r.fieldIndex("source"))
      def L(c: String) = r.getLong(r.fieldIndex(c))
      assert(L("exact_removed_docs") + L("near_removed_docs") + L("surviving_docs")
        == L("n_docs"), s"$s0 outcome partition")
      assert(L("final_tokens") == L("surviving_tokens") - L("span_tokens_removed"), s"$s0 final")
      assert(L("surviving_docs") > 0, s"$s0 nothing survived")
      val v = sv(s0)
      assert(L("exact_removed_docs") == v.getLong(v.fieldIndex("exact_dup_docs")),
        s"$s0 exact stage differs from dedup_savings")
      assert(L("n_tokens") == v.getLong(v.fieldIndex("n_tokens")), s"$s0 token total")
      val t = st(s0)
      assert(L("span_tokens_removed") <= t.getLong(t.fieldIndex("span_tokens")),
        s"$s0 survivor-relocated spans exceed full-corpus coverage")
    }
  }

  test("span_excise_savings reconciles with dup_span_stats and span_excise") {
    import org.apache.spark.sql.functions._
    // the savings KPI and the coverage KPI are two aggregations of
    // the SAME union-of-extents covered set — every shared column
    // must agree exactly, and the removed totals must equal what the
    // excision operator actually cut
    val st = SparkEntry.queries("dup_span_stats")(spark, Sf).collect()
      .map(r => r.getString(r.fieldIndex("source")) -> r).toMap
    val sv = SparkEntry.queries("span_excise_savings")(spark, Sf).collect()
    assert(sv.nonEmpty && sv.length == st.size)
    for (r <- sv) {
      val s0 = r.getString(r.fieldIndex("source")); val t = st(s0)
      assert(r.getLong(r.fieldIndex("n_docs")) == t.getLong(t.fieldIndex("n_docs")), s"$s0 n_docs")
      assert(r.getLong(r.fieldIndex("docs_excised")) ==
        t.getLong(t.fieldIndex("docs_with_spans")), s"$s0 docs_excised")
      assert(r.getLong(r.fieldIndex("tokens_before")) ==
        t.getLong(t.fieldIndex("total_tokens")), s"$s0 tokens_before")
      assert(r.getLong(r.fieldIndex("tokens_removed")) ==
        t.getLong(t.fieldIndex("span_tokens")), s"$s0 tokens_removed")
      assert(r.getLong(r.fieldIndex("removed_ppm")) ==
        t.getLong(t.fieldIndex("span_ppm")), s"$s0 removed_ppm")
      assert(r.getLong(r.fieldIndex("tokens_after")) ==
        r.getLong(r.fieldIndex("tokens_before")) - r.getLong(r.fieldIndex("tokens_removed")))
    }
    val exTotal = SparkEntry.queries("span_excise")(spark, Sf)
      .agg(sum(col("n_removed"))).collect()(0).getLong(0)
    assert(exTotal == sv.map(r => r.getLong(r.fieldIndex("tokens_removed"))).sum,
      "savings total != sum of per-doc excised tokens")
  }

  test("token_budget_mix_t at T=1 reproduces token_budget_mix; weight_t is the exact root") {
    // T=1: weight_t = TempScale * weight is exactly proportional to
    // the linear mix's weights, and floor((B*kw)/(k*sum w)) ==
    // floor((B*w)/sum w) for any k — so every rate and expected-token
    // count must be BIT-identical to token_budget_mix
    val lin = SparkEntry.queries("token_budget_mix")(spark, Sf).collect()
      .map(r => r.getString(r.fieldIndex("source")) ->
        (r.getLong(r.fieldIndex("rate_ppm")), r.getLong(r.fieldIndex("expected_tokens"))))
      .toMap
    val t1 = MixOps.tokenBudgetMixT(spark, Sf, 1).collect()
    assert(t1.nonEmpty && t1.length == lin.size)
    for (r <- t1) {
      val s0 = r.getString(r.fieldIndex("source"))
      assert(r.getLong(r.fieldIndex("weight_t")) ==
        r.getLong(r.fieldIndex("weight")) * MixOps.TempScale, s"source $s0 weight_t at T=1")
      assert((r.getLong(r.fieldIndex("rate_ppm")),
        r.getLong(r.fieldIndex("expected_tokens"))) == lin(s0),
        s"source $s0 T=1 rates differ from token_budget_mix")
    }
    // T=2 (the gate-pinned default): weight_t must be the EXACT
    // integer sqrt of weight*TempScale^2 — the float seed's rounding
    // must never leak through the correction
    for (r <- MixOps.tokenBudgetMixT(spark, Sf, 2).collect()) {
      val w = r.getLong(r.fieldIndex("weight"))
      val wt = r.getLong(r.fieldIndex("weight_t"))
      val x = w * MixOps.TempScale * MixOps.TempScale
      assert(wt >= 0 && wt * wt <= x && (wt + 1) * (wt + 1) > x,
        s"weight_t $wt is not isqrt($x)")
    }
  }

  test("token_budget_mix_sweep legs equal the pinned mixes; flatness falls with T") {
    // the sweep is the TUNING instrument over the same arithmetic the
    // gate-pinned mixes ship: its T=1 leg must equal token_budget_mix
    // and its T=MixTemp leg token_budget_mix_t, column for column,
    // and the iroot weight compression must make the mix FLATTER as
    // T rises (max/min weight_t ratio non-increasing — exact, since
    // weight_t = floor(TempScale·w^(1/T)) and w ≥ 1)
    val sw = SparkEntry.queries("token_budget_mix_sweep")(spark, Sf).collect()
    assert(sw.nonEmpty)
    assert(sw.map(_.getLong(sw.head.fieldIndex("temp"))).distinct.sorted.toSeq ==
      MixOps.TempGrid.map(_.toLong), "temperature grid mismatch")
    def legMap(t: Long) = sw.filter(_.getLong(sw.head.fieldIndex("temp")) == t)
      .map(r => r.getString(r.fieldIndex("source")) ->
        (r.getLong(r.fieldIndex("weight_t")), r.getLong(r.fieldIndex("rate_ppm")),
          r.getLong(r.fieldIndex("expected_tokens")))).toMap
    val lin = SparkEntry.queries("token_budget_mix")(spark, Sf).collect()
      .map(r => r.getString(r.fieldIndex("source")) ->
        (r.getLong(r.fieldIndex("rate_ppm")), r.getLong(r.fieldIndex("expected_tokens"))))
      .toMap
    val l1 = legMap(1L)
    assert(l1.keySet == lin.keySet)
    for ((s0, (_, rate, exp)) <- l1)
      assert((rate, exp) == lin(s0), s"sweep T=1 leg differs from token_budget_mix at $s0")
    val pinned = SparkEntry.queries("token_budget_mix_t")(spark, Sf).collect()
      .map(r => r.getString(r.fieldIndex("source")) ->
        (r.getLong(r.fieldIndex("weight_t")), r.getLong(r.fieldIndex("rate_ppm")),
          r.getLong(r.fieldIndex("expected_tokens")))).toMap
    assert(legMap(MixOps.MixTemp.toLong) == pinned,
      "sweep T=MixTemp leg differs from token_budget_mix_t")
    // weight-compression flatness: per T, max/min weight_t ratio
    // non-increasing in T; and the reported flat_ratio matches the
    // leg's own expected-token extremes
    val byT = sw.groupBy(_.getLong(sw.head.fieldIndex("temp")))
    val wtRatio = MixOps.TempGrid.map { t =>
      val ws = byT(t.toLong).map(_.getLong(sw.head.fieldIndex("weight_t")))
      ws.max.toDouble / ws.min.toDouble
    }
    assert(wtRatio.zip(wtRatio.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"weight_t max/min ratio not non-increasing across $wtRatio")
    for ((t, rows) <- byT) {
      val exp = rows.map(_.getLong(rows.head.fieldIndex("expected_tokens")))
      val mx = rows.head.getLong(rows.head.fieldIndex("max_share_tokens"))
      val mn = rows.head.getLong(rows.head.fieldIndex("min_share_tokens"))
      assert(mx == exp.max, s"T=$t max_share_tokens")
      assert(mn == exp.filter(_ > 0).min, s"T=$t min_share_tokens")
      assert(rows.forall(r => r.getLong(r.fieldIndex("flat_ratio_ppm")) == mx * 1000000L / mn))
    }
  }

  test("bpe_encode and pack_sequences_bpe reconcile with bpe_apply's totals") {
    import org.apache.spark.sql.functions._
    // fit → encode → pack must agree on ONE tokenization: the encoded
    // id streams, the packer's per-doc token counts, and bpe_apply's
    // per-source symbol totals are three views of the same fit
    val ap = SparkEntry.queries("bpe_apply")(spark, Sf).collect()
      .map(r => r.getString(r.fieldIndex("source")) ->
        (r.getLong(r.fieldIndex("n_tokens")), r.getLong(r.fieldIndex("syms_total"))))
      .toMap
    val enc = TextOps.bpeEncode(spark, Sf)
      .agg(sum(col("n_words")).as("w"), sum(col("n_ids")).as("i")).collect()(0)
    assert(enc.getLong(0) == ap.values.map(_._1).sum, "encoded word total != bpe_apply n_tokens")
    assert(enc.getLong(1) == ap.values.map(_._2).sum, "emitted id total != bpe_apply syms_total")
    val pk = SparkEntry.queries("pack_sequences_bpe")(spark, Sf).collect()
    val bySrc = pk.groupBy(_.getString(1)).map { case (s0, xs) =>
      s0 -> xs.map(r => r.getLong(r.fieldIndex("n_tokens"))).sum }
    for ((s0, (_, syms)) <- ap)
      assert(bySrc.getOrElse(s0, 0L) == syms,
        s"source $s0 packed token total != bpe_apply syms_total")
    // per doc, the packer budgets exactly the ids the encoder emits
    val encByDoc = TextOps.bpeEncode(spark, Sf)
      .select("doc_id", "n_ids").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- pk) {
      val d0 = r.getLong(r.fieldIndex("doc_id"))
      assert(encByDoc.getOrElse(d0, -1L) == r.getLong(r.fieldIndex("n_tokens")),
        s"doc $d0 packed n_tokens != encoded n_ids")
    }
    assert(pk.length == encByDoc.size, "packed doc set != encoded doc set")
  }

  test("chunk_documents_bpe slices the encoded id stream with full stride coverage") {
    // each chunk must be exactly the ID SLICE of its document's
    // encoded stream at the stride boundary, the chunk count must
    // follow the window formula, and the last chunk must end at the
    // stream's end (no token uncovered, none invented)
    val enc = TextOps.bpeEncode(spark, Sf).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getSeq[Long](r.fieldIndex("token_ids")))
      .toMap
    val ch = TextOps.chunkDocumentsBpe(spark, Sf).collect()
    assert(ch.nonEmpty)
    val byDoc = ch.groupBy(_.getLong(0))
    assert(byDoc.keySet == enc.keySet, "chunked doc set != encoded doc set")
    val C = TextOps.ChunkTokens
    val S = TextOps.ChunkStride
    for ((d0, rows) <- byDoc) {
      val ids = enc(d0); val n = ids.length.toLong
      val expK = if (n <= C) 1L else 1L + (n - C + S - 1) / S
      assert(rows.length.toLong == expK, s"doc $d0 chunk count")
      for (r <- rows) {
        val idx = r.getLong(r.fieldIndex("chunk_idx"))
        val start = r.getLong(r.fieldIndex("chunk_start"))
        val len = r.getLong(r.fieldIndex("n_chunk_ids"))
        assert(start == idx * S, s"doc $d0 chunk $idx start")
        assert(len == math.min(n - start, C) && len > 0, s"doc $d0 chunk $idx length")
        assert(r.getSeq[Long](r.fieldIndex("chunk_ids")) ==
          ids.slice(start.toInt, (start + len).toInt), s"doc $d0 chunk $idx ids")
        if (idx == expK - 1)
          assert(start + len == n, s"doc $d0 last chunk does not reach the stream end")
      }
    }
  }

  test("driver-checked BPE views stringify the internal id arrays losslessly") {
    // the REGISTERED bpe_encode / chunk_documents_bpe emit the canonical
    // space-joined id string (driver-sortable); this pins that string to
    // the internal array API cell for cell, so the checked view cannot
    // drift from what pack/chunk consumers actually read
    val enc = TextOps.bpeEncode(spark, Sf).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getSeq[Long](r.fieldIndex("token_ids")).mkString(" ")).toMap
    val encS = SparkEntry.queries("bpe_encode")(spark, Sf).collect()
    assert(encS.length == enc.size && encS.nonEmpty)
    for (r <- encS)
      assert(r.getString(r.fieldIndex("token_ids_s")) ==
        enc(r.getLong(r.fieldIndex("doc_id"))), "token_ids_s != joined token_ids")
    val ch = TextOps.chunkDocumentsBpe(spark, Sf).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("chunk_idx"))) ->
        r.getSeq[Long](r.fieldIndex("chunk_ids")).mkString(" ")).toMap
    val chS = SparkEntry.queries("chunk_documents_bpe")(spark, Sf).collect()
    assert(chS.length == ch.size && chS.nonEmpty)
    for (r <- chS)
      assert(r.getString(r.fieldIndex("chunk_ids_s")) ==
        ch((r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("chunk_idx")))),
        "chunk_ids_s != joined chunk_ids")
  }

  test("bpe_train and bpe_apply match a plain-Scala BPE fit") {
    // Independent sequential recompute of the looped fit: word counts,
    // then BpeMerges rounds of pair-count → argmax → two-pass
    // leftmost-non-overlapping rewrite — the same semantics the
    // operator and its unrolled DuckDB oracle implement.
    import scala.collection.mutable
    val docRows = spark.read.parquet(s"$Sf/documents.parquet")
      .select("source", "text").collect()
    val words = mutable.Map[String, Long]().withDefaultValue(0L)
    for (r <- docRows; t = r.getString(1); if t != null;
         w <- t.split(" ", -1); if w.nonEmpty) words(w) += 1
    var seqs: Map[String, String] =
      words.keys.map(w => w -> w.map(c => s"$c~").mkString).toMap
    val expected = mutable.Buffer[(Long, String, Long, Long)]()
    for (r <- 1 to TextOps.BpeMerges) {
      val pc = mutable.Map[String, Long]().withDefaultValue(0L)
      for ((w, sq) <- seqs) {
        val syms = sq.split("~", -1).dropRight(1)
        for (i <- 0 until syms.length - 1)
          pc(syms(i) + " " + syms(i + 1)) += words(w)
      }
      val (pair, cnt) = pc.toSeq.sortBy { case (p, c) => (-c, p) }.head
      val Array(a, b) = pair.split(" ", 2)
      val pat = s"~$a~$b~"; val rep = s"~$a$b~"
      var touched = 0L
      seqs = seqs.map { case (w, sq) =>
        val f = "~" + sq
        if (f.contains(pat)) touched += 1
        w -> f.replace(pat, rep).replace(pat, rep).substring(1)
      }
      expected += ((r.toLong, pair, cnt, touched))
    }
    val got = SparkEntry.queries("bpe_train")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == expected.toSeq, "learned merge table differs from sequential BPE")

    // apply side: per-source symbol totals under the final vocabulary
    val agg = mutable.Map[String, (Long, Long, Long)]().withDefaultValue((0L, 0L, 0L))
    for (r <- docRows; t = r.getString(1); if t != null;
         w <- t.split(" ", -1); if w.nonEmpty) {
      val (n, ch, sy) = agg(r.getString(0))
      agg(r.getString(0)) =
        (n + 1, ch + w.length, sy + (seqs(w).split("~", -1).length - 1))
    }
    val gotApply = SparkEntry.queries("bpe_apply")(spark, Sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(gotApply.keySet == agg.keySet)
    for ((src, (n, ch, sy)) <- agg) {
      assert(gotApply(src) == ((n, ch, sy, sy * 1000000L / ch)),
        s"bpe_apply differs for source $src")
    }
    // merges must actually compress: symbols after < characters before
    for ((_, (_, ch, sy)) <- agg) assert(sy < ch)

    // vocab side: per-symbol occurrence counts + word-type coverage
    val symCnt = mutable.Map[String, Long]().withDefaultValue(0L)
    val symWords = mutable.Map[String, mutable.Set[String]]()
    for ((w, sq) <- seqs; sym <- sq.split("~", -1).dropRight(1)) {
      symCnt(sym) += words(w)
      symWords.getOrElseUpdate(sym, mutable.Set.empty) += w
    }
    val expVocab = symCnt.toSeq.sortBy { case (sym, c) => (-c, sym) }
      .take(TextOps.BpeK).zipWithIndex
      .map { case ((sym, c), i) =>
        (i + 1L, sym, c, symWords(sym).size.toLong)
      }
    val gotVocab = SparkEntry.queries("bpe_vocab_topk")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(gotVocab == expVocab, "subword vocabulary differs from sequential fit")
    // the FINAL round's merged symbol must be in the vocabulary (an
    // earlier merge can be absorbed entirely by a later one; the last
    // cannot)
    val lastMerged = expected.last._2.replace(" ", "")
    assert(gotVocab.exists(_._2 == lastMerged),
      s"final merged symbol $lastMerged missing from vocab")
  }

  test("markov_path_score matches a plain-Scala sequential recompute") {
    import scala.collection.mutable
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$Sf/events.parquet")
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp))").as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      ordered.zip(ordered.drop(1)).map { case (a, b) => (uid, a, b) }
    }
    val n = mutable.Map[(String, String), Long]().withDefaultValue(0L)
    val tot = mutable.Map[String, Long]().withDefaultValue(0L)
    for ((_, a, b) <- trans) { n((a, b)) += 1; tot(a) += 1 }
    val ppm = n.map { case ((a, b), c) => (a, b) -> c * 1000000L / tot(a) }
    val expected = trans.groupBy(_._1).map { case (uid, ts) =>
      val ps = ts.map { case (_, a, b) => ppm((a, b)) }
      uid -> (ps.size.toLong, ps.sum, ps.min, ps.sum / ps.size)
    }
    val got = SparkEntry.queries("markov_path_score")(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected, "per-user path scores differ from sequential recompute")
  }

  test("ivf_probe_sweep: monotone recall/cost curve, consistent with the recall report") {
    val sw = SparkEntry.queries("ivf_probe_sweep")(spark, Sf).collect()
      .sortBy(_.getLong(0))
    assert(sw.map(_.getLong(0)).toSeq == AnnOps.ProbeSweep.map(_.toLong))
    for (Seq(lo, hi) <- sw.toSeq.sliding(2)) {
      // more probes can only widen the candidate set, never shrink it
      assert(hi.getLong(4) >= lo.getLong(4), "n_candidates not monotone in nprobe")
      assert(hi.getLong(3) >= lo.getLong(3), "n_hits not monotone in nprobe")
    }
    for (r <- sw) {
      assert(r.getLong(3) <= r.getLong(2), "hits exceed ground truth")
      assert(r.getLong(5) <= 1000000L && r.getLong(6) <= 1000000L)
    }
    // the nprobe = NProbe row must agree with ann_recall_report's IVF column
    val rr = SparkEntry.queries("ann_recall_report")(spark, Sf).collect()
    val rrTrue = rr.map(r => r.getLong(r.fieldIndex("n_true"))).sum
    val rrHits = rr.map(r => r.getLong(r.fieldIndex("ivf_hits"))).sum
    val p2 = sw.find(_.getLong(0) == AnnOps.NProbe.toLong).get
    assert(p2.getLong(2) == rrTrue && p2.getLong(3) == rrHits,
      "probe-sweep row disagrees with ann_recall_report at the index's own nprobe")
  }

  test("dedup_savings reconciles with dedup_exact and dedup_keep_best exactly") {
    import org.apache.spark.sql.functions.col
    val docsDf = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
    val bySource = docsDf.groupBy(_.getString(1))
    val srcOf = docsDf.map(r => r.getLong(0) -> r.getString(1)).toMap
    val tokensOf = docsDf.map { r =>
      r.getLong(0) -> Option(r.getString(2)).map(_.split(" ", -1).length.toLong)
    }.toMap
    val keptExact = SparkEntry.queries("dedup_exact")(spark, Sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val keptBest = SparkEntry.queries("dedup_keep_best")(spark, Sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val sv = SparkEntry.queries("dedup_savings")(spark, Sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(sv.keySet == bySource.keySet)
    for ((src, rows) <- bySource) {
      val r = sv(src)
      val ids = rows.map(_.getLong(0)).toSet
      val nTokens = ids.toSeq.flatMap(tokensOf(_)).sum
      assert(r.getLong(1) == ids.size, s"$src n_docs")
      assert(r.getLong(2) == nTokens, s"$src n_tokens")
      assert(r.getLong(3) == ids.count(!keptExact.contains(_)), s"$src exact_dup_docs")
      assert(r.getLong(4) ==
        ids.filter(!keptExact.contains(_)).toSeq.flatMap(tokensOf(_)).sum,
        s"$src exact_dup_tokens")
      assert(r.getLong(5) == ids.count(!keptBest.contains(_)), s"$src near_dup_docs")
      val ndt = ids.filter(!keptBest.contains(_)).toSeq.flatMap(tokensOf(_)).sum
      assert(r.getLong(6) == ndt, s"$src near_dup_tokens")
      assert(r.getLong(7) == ndt * 1000000L / nTokens, s"$src savings_ppm")
    }
    // the source map is a partition: sources attribute every doc once
    assert(srcOf.size == docsDf.length)
  }

  test("rolling_hll_distinct matches a plain-Scala register-merge recompute") {
    import org.apache.spark.sql.functions._
    def rho(w: Long): Int = {
      var b = SketchOps.HllWBits - 1
      while (b >= 0 && w < (1L << b)) b -= 1
      if (b < 0) SketchOps.HllWBits + 1 else SketchOps.HllWBits - b
    }
    val ev = spark.read.parquet(s"$Sf/events.parquet")
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp))").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val daily = scala.collection.mutable.Map[(Long, Long), Int]() // (day, reg) -> mrho
    for ((uid, us) <- ev) {
      val day = us / SketchOps.DayUs
      val h = scalaH60(s"hll:$uid")
      val reg = h % SketchOps.HllM
      val r = rho(h / SketchOps.HllM)
      val k = (day, reg)
      daily(k) = math.max(daily.getOrElse(k, 0), r)
    }
    val days = daily.keys.map(_._1).toSet
    def harm(regs: Map[Long, Int]): Long =
      regs.values.map(r => 1L << (SketchOps.HllWBits + 1 - r)).sum +
        (SketchOps.HllM - regs.size).toLong * (1L << (SketchOps.HllWBits + 1))
    val expected = days.map { day =>
      val dregs = daily.toSeq.collect { case ((dd, reg), r) if dd == day => reg -> r }.toMap
      val tregs = daily.toSeq.collect {
        case ((dd, reg), r) if dd <= day && dd > day - SketchOps.RollW => (reg, r)
      }.groupBy(_._1).map { case (reg, xs) => reg -> xs.map(_._2).max }
      val (hd, ht) = (harm(dregs), harm(tregs))
      val (ed, et) = (SketchOps.HllEstNum / hd, SketchOps.HllEstNum / ht)
      day -> ((hd, ed, ht, et, math.floor(ed * 1000000.0 / et).toLong))
    }.toMap
    val got = SparkEntry.queries("rolling_hll_distinct")(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(got == expected, "rolling register merge differs from sequential recompute")
    // merged windows only add registers: trailing estimate >= daily
    for ((_, (hd, ed, ht, et, _)) <- expected) { assert(ht <= hd); assert(et >= ed) }
  }

  test("rolling_quantile_hist matches a plain-Scala additive-merge recompute") {
    import org.apache.spark.sql.functions._
    def bucket(cents: Long): Long = {
      var b = SketchOps.HistMaxPow
      while (b >= 0 && cents < (1L << b)) b -= 1
      b.toLong
    }
    val ev = spark.read.parquet(s"$Sf/events.parquet")
      .select(expr("unix_micros(cast(ts as timestamp))").as("us"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect().map(r => (r.getLong(0) / SketchOps.DayUs, bucket(r.getLong(1))))
    val daily = ev.groupBy(identity).map { case ((day, b), xs) => (day, b) -> xs.length.toLong }
    val days = daily.keys.map(_._1).toSet
    val expected = days.map { day =>
      val trail = daily.toSeq.collect {
        case ((dd, b), c) if dd <= day && dd > day - SketchOps.RollW => (b, c)
      }.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
      val n = trail.values.sum
      val nDaily = daily.toSeq.collect { case ((dd, _), c) if dd == day => c }.sum
      val sorted = trail.toSeq.sortBy(_._1)
      def pick(q: Int): Long = {
        val target = (n * q + 99) / 100
        var cum = 0L
        val b = sorted.collectFirst { case (bb, c) if { cum += c; cum >= target } => bb }.get
        if (b < 0) 0L else 1L << b
      }
      day -> ((nDaily, n, pick(50), pick(90), pick(99)))
    }.toMap
    val got = SparkEntry.queries("rolling_quantile_hist")(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, "rolling histogram merge differs from sequential recompute")
    // trailing count covers at least the day's own events
    for ((_, (nd, nt, _, _, _)) <- expected) assert(nt >= nd)
  }

  test("doc_novelty matches a plain-Scala first-occurrence recompute") {
    val docRows = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    def shingles(t: String): Seq[String] = {
      val tk = t.split(" ", -1)
      if (tk.length < TextOps.ShingleN) Seq.empty
      else tk.sliding(TextOps.ShingleN).map(_.mkString(" ")).toSeq
    }
    // NULL and sub-ShingleN text both shingle to the EMPTY set (the
    // Portable.shingles guard) — such docs report (0, 0, NULL ppm)
    val shsets = docRows.map { case (id, t) =>
      id -> Option(t).map(x => shingles(x).distinct).getOrElse(Seq.empty)
    }
    val firstOf = scala.collection.mutable.Map[String, Long]()
    for ((id, ss) <- shsets; sh <- ss)
      if (!firstOf.contains(sh) || firstOf(sh) > id) firstOf(sh) = id
    val expected = shsets.map { case (id, sh) =>
      val novel = sh.count(firstOf(_) == id).toLong
      val ppm = if (sh.nonEmpty) Some(novel * 1000000L / sh.length) else None
      id -> ((sh.length.toLong, novel, ppm))
    }.toMap
    val got = SparkEntry.queries("doc_novelty")(spark, Sf).collect().map { r =>
      val ppm = if (r.isNullAt(3)) None else Some(r.getLong(3))
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), ppm))
    }.toMap
    assert(got == expected, "novelty shares differ from sequential recompute")
  }

  test("streaming minhash dedup equals the batch verdicts (no bucket overflow at this sf)") {
    import org.apache.spark.sql.functions._
    // Precondition that makes arrival-cap == global-cap semantics: no
    // LSH bucket exceeds MaxBucket at this scale. If testdata changes
    // and a bucket overflows, this assert explains the divergence.
    val docsDf = spark.read.parquet(s"$Sf/documents.parquet")
    val maxBucket = TextOps.bandedSignatures(docsDf)
      .groupBy(col("band"), col("bkey")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxBucket <= TextOps.MaxBucket,
      s"bucket overflow at test sf ($maxBucket > ${TextOps.MaxBucket}): cap semantics diverge by design")
    val expected = SparkEntry.queries("ngram_jaccard")(spark, Sf).collect()
      .filter(r => !r.isNullAt(2) && r.getDouble(2) >= TextOps.JaccT)
      .groupBy(_.getLong(1))
      .map { case (idb, rs) => idb -> rs.map(_.getLong(0)).min }
    val got = SparkEntry.queries("streaming_dedup_minhash")(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "streaming dup verdicts differ from the batch pair table")
    // every verdict names an earlier document
    assert(got.forall { case (doc, canon) => canon < doc })
  }

  test("quality_model_score matches a plain-Scala forward pass and keeps NULL-text rows") {
    def sig(x: Double) = 0.5 + 0.5 * x / (1.0 + math.abs(x))
    def mlp(x: Array[Double]): Double = {
      var out = TextOps.QmB2
      for (j <- 0 until TextOps.QmHidden) {
        var acc = TextOps.qmB1(j)
        for (i <- 0 until TextOps.QmInputs) acc += TextOps.qmW1(i, j) * x(i)
        out += TextOps.qmW2(j) * sig(acc)
      }
      sig(out)
    }
    val docRows = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
    val expected = docRows.map { r =>
      val t = r.getString(1)
      r.getLong(0) -> Option(t).map { text =>
        val tk = text.split(" ", -1)
        val stop = tk.count(w => w == "a" || w == "the")
        mlp(Array(text.length / 1000.0, tk.length / 100.0,
          (text.length - (tk.length - 1)).toDouble / tk.length,
          stop.toDouble / tk.length,
          tk.distinct.length.toDouble / tk.length))
      }
    }.toMap
    val got = SparkEntry.queries("quality_model_score")(spark, Sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == expected, "forward pass differs from sequential recompute")
    assert(got.values.flatten.forall(p => p > 0.0 && p < 1.0))
  }

  test("streaming markov score equals the running-window batch recompute") {
    import scala.collection.mutable
    val ev = spark.read.parquet(s"$Sf/events.parquet")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.expr("unix_micros(cast(ts as timestamp))").as("us"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      ordered.zip(ordered.drop(1)).map { case (a, b) => (uid, a._4, b._4, b._3) }
    }
    val n = mutable.Map[(String, String), Long]().withDefaultValue(0L)
    val tot = mutable.Map[String, Long]().withDefaultValue(0L)
    for ((_, a, b, _) <- trans) { n((a, b)) += 1; tot(a) += 1 }
    val expected = trans.groupBy(_._1).flatMap { case (_, ts) =>
      var (cnt, sum, mn) = (0L, 0L, Long.MaxValue)
      ts.map { case (uid, a, b, eid) =>
        val ppm = n((a, b)) * 1000000L / tot(a)
        cnt += 1; sum += ppm; mn = math.min(mn, ppm)
        eid -> ((uid, cnt, sum, mn, sum / cnt))
      }
    }
    val got = SparkEntry.queries("streaming_markov_score")(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, "streaming running scores differ from batch recompute")
  }

  test("codegen'd vec_dot is bit-equal to the portable fold") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
    val mismatch = emb.select(
      graft.functions.Portable.dot(col("embedding"), col("embedding")).as("a"),
      expr("vec_dot(cast(embedding as array<double>), cast(embedding as array<double>))").as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatch == 0)
  }

  test("bucketed tables co-locate the fact-fact evid join: zero shuffles") {
    // The 100 TB answer to repeated evid joins: bucket both fact tables
    // on the join key at write time; the join then needs no Exchange.
    graft.model.Catalog.records(spark, Sf).select("evid", "sta", "pk", "chan")
      .write.bucketBy(8, "evid").sortBy("evid")
      .mode("overwrite").saveAsTable("b_records")
    graft.model.Catalog.events(spark, Sf).select("evid", "mag", "ev_us")
      .write.bucketBy(8, "evid")
      .mode("overwrite").saveAsTable("b_events")
    // at test scale the planner would broadcast (bucket info unused);
    // disable broadcast to surface the sort-merge path a fact-fact
    // join takes at 100 TB, where bucketing removes the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_records").join(spark.table("b_events"), "evid")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() ==
        graft.model.Catalog.records(spark, Sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
  }

  test("csv and partitioned-parquet IO round-trips preserve data") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_io").toString
    val src = spark.read.parquet(s"$Sf/nation.parquet")
    graft.sources.Io.writeCsv(src, s"$tmp/csv")
    val back = graft.sources.Io.readCsv(spark, s"$tmp/csv", src.schema)
    assert(sortedRows(back) == sortedRows(src))
    graft.sources.Io.writeJsonLines(src, s"$tmp/json")
    val backJ = graft.sources.Io.readJsonLines(spark, s"$tmp/json", src.schema)
    assert(sortedRows(backJ) == sortedRows(src))
    val ev = graft.model.Catalog.events(spark, Sf)
      .withColumn("yr", year(timestamp_micros(col("ev_us"))))
    graft.sources.Io.writePartitionedParquet(ev, s"$tmp/part", Seq("yr"), Seq("evid"))
    val backP = spark.read.parquet(s"$tmp/part")
    assert(backP.count() == ev.count())
    // partition pruning must reach the scan for a partition-key filter
    val pruned = backP.filter(col("yr") === 1995).queryExecution.executedPlan.toString
    assert(!pruned.contains("yr#") || backP.filter(col("yr") === 1995).count() ==
      ev.filter(col("yr") === 1995).count())
  }

  test("portable h60 hash is stable (golden value, matches DuckDB scheme)") {
    import org.apache.spark.sql.functions._
    val got = spark.range(1)
      .select(graft.functions.Portable.h60(lit("hello")).as("h"))
      .head().getLong(0)
    // first 15 hex chars of md5("hello") = 5d41402abc4b2a7 -> base-16
    assert(got == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }

  test("event_station_distances: r_hyp >= r_epi, all within the cutoff") {
    val rows = GeoOps.eventStationDistances(spark, Sf)
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getInt(4)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (epi, hyp, oct) => hyp >= epi && epi <= GeoOps.MaxKm && oct >= 0 && oct <= 7 })
  }

  test("abwd greedy matches the sequential reference on a hand-computed fixture") {
    val sp = spark; import sp.implicits._
    // The interleaved case where naive parallel batching diverges from
    // the sequential greedy (A > B > C > E > D by order; A∋B, B∋C,
    // C∋D, E∋D): sequentially A claims B, then C — never claimed,
    // because B was — becomes a mainshock and claims D before E runs.
    val events = Seq((1L, 5.5), (2L, 4.5), (3L, 3.5), (4L, 2.5), (5L, 2.0)).toDF("evid", "mag")
    val pairs = Seq(
      (2L, 4.5, 1L, 5.5), // B in A's window
      (3L, 3.5, 2L, 4.5), // C in B's window
      (5L, 2.0, 3L, 3.5), // D in C's window
      (5L, 2.0, 4L, 2.5)  // D in E's window
    ).toDF("evid", "mag", "m_evid", "m_mag")
    val out = GeoOps.abwdLabel(events, pairs).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2))).toMap
    assert(out(1L) == ((Some(1L), false)))
    assert(out(2L) == ((Some(1L), true)))
    assert(out(3L) == ((Some(3L), false)))
    assert(out(5L) == ((Some(3L), true)))
    assert(out(4L) == ((None, false))) // E: candidate mainshock, no claims
  }

  test("abwd greedy honors backward claims and own-step mainshock priority") {
    val sp = spark; import sp.implicits._
    // Reference semantics (`aftershocks.py:222`): claims carry no
    // magnitude condition. Two sub-cases in one catalogue:
    //  - P(mag 5) is barren at its own step; later, smaller Q(mag 4)
    //    has P in its forward window and claims it (backward claim).
    //  - X(mag 6) has claimee R, so X labels itself at its own step
    //    and is NOT claimable by later Y(mag 5.5) even though Y's
    //    window holds X; Y then claims nothing => unclustered.
    val events = Seq((1L, 5.0), (2L, 4.0), (10L, 6.0), (11L, 5.5), (12L, 3.0))
      .toDF("evid", "mag")
    val pairs = Seq(
      (1L, 5.0, 2L, 4.0),   // P in Q's forward window (backward claim)
      (12L, 3.0, 10L, 6.0), // R in X's window
      (10L, 6.0, 11L, 5.5), // X in Y's window
      (12L, 3.0, 11L, 5.5)  // R in Y's window too (X claims it first)
    ).toDF("evid", "mag", "m_evid", "m_mag")
    val out = GeoOps.abwdLabel(events, pairs).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getBoolean(2))).toMap
    assert(out(10L) == ((Some(10L), false))) // X mainshock
    assert(out(12L) == ((Some(10L), true)))  // R claimed by X, not Y
    assert(out(11L) == ((None, false)))      // Y barren
    assert(out(2L) == ((Some(2L), false)))   // Q mainshock via backward claim
    assert(out(1L) == ((Some(2L), true)))    // P claimed by smaller, later Q
  }

  test("abwd clusters match a sequential greedy replay on the sf0.001 catalogue") {
    val pairs = GeoOps.abwdPairs(spark, Sf)
      .select("evid", "m_evid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val claimable = pairs.groupBy(_._2).map { case (m, ps) => m -> ps.map(_._1).toSet }
    val order = graft.model.Catalog.events(spark, Sf).select("evid", "mag").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy { case (evid, mag) => (-mag, evid) }
      .map(_._1)
    val label = scala.collection.mutable.Map.empty[Long, Long]
    val flagged = scala.collection.mutable.Set.empty[Long]
    // order.init: the reference loops `range(neq - 1)` — the
    // order-last event never claims.
    for (i <- order.init if !label.contains(i)) {
      val claims = claimable.getOrElse(i, Set.empty).filterNot(label.contains)
      if (claims.nonEmpty) {
        label(i) = i
        claims.foreach { e => label(e) = i; flagged += e }
      }
    }
    val out = GeoOps.aftershockClusters(spark, Sf).collect()
    assert(out.length == order.length)
    for (r <- out) {
      val evid = r.getLong(0)
      val clus = if (r.isNullAt(1)) None else Some(r.getLong(1))
      assert(clus == label.get(evid), s"evid $evid: cluster $clus vs sequential ${label.get(evid)}")
      assert(r.getBoolean(2) == flagged.contains(evid), s"evid $evid: flag mismatch")
    }
  }

  test("band_edges: every skip path carries rows; survivors have ordered edges") {
    val rows = SignalOps.bandEdges(spark, Sf).collect()
    val reasons = rows.map(r => if (r.isNullAt(4)) None else Some(r.getString(4))).toSet
    // a dead branch here means a catalog-derivation change silently
    // stopped exercising part of the resolution logic
    assert(reasons == Set(None, Some("bandpass_failed"), Some("lowcut_ge_highcut")))
    for (r <- rows if r.isNullAt(4)) {
      assert(!r.isNullAt(2) && !r.isNullAt(3))
      assert(r.getDouble(2) < r.getDouble(3), s"unskipped row with lowcut >= highcut: $r")
    }
  }

  test("clip_prob serving path: forward pass, NULL propagation, feature join") {
    // forward pass against an independent recompute on fixed inputs
    val model = MultiModalOps.loadClipNet()
    val x = Array(5.5, 120.0, 1.0, 0.0, 1.0)
    val want = {
      def sig(v: Double) = 0.5 + 0.5 * v / (1.0 + math.abs(v))
      val hidden = (0 until MultiModalOps.ClipHidden).map { j =>
        sig((0 until MultiModalOps.ClipInputs)
          .foldLeft(MultiModalOps.clipB1(j))((acc, i) => acc + MultiModalOps.clipW1(i, j) * x(i)))
      }
      sig(hidden.zipWithIndex.foldLeft(MultiModalOps.ClipB2) {
        case (acc, (h, j)) => acc + MultiModalOps.clipW2(j) * h
      })
    }
    assert(model.evaluate(x) == want)
    // probabilities live in (0, 1); clip-flagged inputs must move the score
    assert(want > 0.0 && want < 1.0)
    assert(model.evaluate(x) != model.evaluate(Array(5.5, 120.0, 0.0, 0.0, 0.0)))
    // end-to-end: one scored row per clip_features row; NULL distance
    // (beyond the pair cutoff) must yield NULL prob, never a score
    val feats = SignalOps.clipFeatures(spark, Sf).collect()
      .map(r => r.getString(0) -> r.isNullAt(2)).toMap
    val scored = MultiModalOps.clipProb(spark, Sf).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(scored.size == feats.size)
    for ((rid, distNull) <- feats)
      assert(scored(rid).isEmpty == distNull, s"record $rid: prob/dist null mismatch")
    assert(scored.values.flatten.forall(p => p > 0.0 && p < 1.0))
  }

  test("abwd distributed rounds and sequential driver tail agree") {
    import org.apache.spark.sql.functions.col
    // a thinned catalogue keeps the pure-distributed run quick
    val ev = graft.model.Catalog.events(spark, Sf)
      .select("evid", "mag").filter(col("evid") % 3 === 0)
    val pr = GeoOps.abwdPairs(spark, Sf)
      .filter(col("evid") % 3 === 0 && col("m_evid") % 3 === 0)
    val dist = sortedRows(GeoOps.abwdLabel(ev, pr, 0L))          // all rounds, no tail
    val tail = sortedRows(GeoOps.abwdLabel(ev, pr, Long.MaxValue)) // pure driver tail
    assert(dist.nonEmpty && dist == tail,
      "batched distributed greedy and sequential driver tail must decide identically")
    // tiny chunk size → the driver finish runs MANY processing-order
    // chunks (and, below the chunk budget, no distributed round at
    // all for the first prefix): chunk boundaries must be invisible
    val chunked = sortedRows(GeoOps.abwdLabel(ev, pr, 37L))
    assert(chunked == dist,
      "chunked sequential driver finish must decide identically to the distributed rounds")
  }

  test("training-data ops: segment dedup, gopher quality, sampling, tfidf invariants") {
    // dedup_segments: ratios and word counts are internally consistent,
    // and a duplicated segment must appear in >= 2 docs by definition.
    val seg = TextOps.dedupSegments(spark, Sf).collect()
    assert(seg.nonEmpty)
    for (r <- seg) {
      val (nSeg, nDup) = (r.getLong(1), r.getLong(2))
      val (tot, kept, ratio) = (r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nDup <= nSeg && kept <= tot)
      assert(ratio == nDup.toDouble / nSeg.toDouble)
    }
    // quality_gopher: every ratio bounded, pass flag consistent
    for (r <- TextOps.qualityGopher(spark, Sf).collect()) {
      val (n, mwl) = (r.getInt(1), r.getDouble(2))
      val (d2, d3, top) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(d2 >= 0 && d2 <= 1 && d3 >= 0 && d3 <= 1 && top > 0 && top <= 1)
      val expect = n >= 50 && n <= 100000 && mwl >= 3.0 && mwl <= 10.0 &&
        d2 < 0.2 && d3 < 0.18 && top < 0.2
      assert(r.getBoolean(6) == expect)
    }
    // sample_stratified: deterministic (same rows twice), under-rate by construction
    val s1 = TextOps.sampleStratified(spark, Sf).collect().map(_.getLong(0)).sorted.toSeq
    val s2 = TextOps.sampleStratified(spark, Sf).collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2 && s1.nonEmpty)
    // tfidf_topk: <= K rows per doc, ranks are 1..K, score consistent
    val tf = TextOps.tfidfTopk(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(5), r.getDouble(4)))
    val perDoc = tf.groupBy(_._1)
    assert(perDoc.values.forall(rs => rs.length <= TextOps.TfidfK &&
      rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq))
    assert(tf.forall(_._3 > 0))
  }

  test("geo distances: haversine/bearing match a driver-side recompute, same pairs as gate op") {
    val gate = GeoOps.eventStationDistances(spark, Sf)
      .select("evid", "sta").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.model.Catalog.events(spark, Sf).select("evid", "ev_lat", "ev_lon", "ev_depth")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val st = graft.model.Catalog.stations(spark, Sf).select("sta", "sta_lat", "sta_lon")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val out = GeoOps.eventStationDistancesGeo(spark, Sf).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == gate,
      "geo variant must publish exactly the gate operator's pair set")
    for (r <- out.take(2000)) {
      val (elat, elon, edep) = ev(r.getLong(0))
      val (slat, slon) = st(r.getLong(1))
      val (p1, p2) = (math.toRadians(elat), math.toRadians(slat))
      val (dp, dl) = (math.toRadians(slat - elat), math.toRadians(slon - elon))
      val h = math.pow(math.sin(dp / 2), 2) +
        math.cos(p1) * math.cos(p2) * math.pow(math.sin(dl / 2), 2)
      val rEpi = 2 * GeoOps.EarthRadiusKm * math.asin(math.sqrt(h))
      val az = (math.toDegrees(math.atan2(math.sin(dl) * math.cos(p2),
        math.cos(p1) * math.sin(p2) - math.sin(p1) * math.cos(p2) * math.cos(dl))) + 360) % 360
      assert(math.abs(r.getDouble(2) - rEpi) < 1e-9, s"r_epi mismatch for ${r.getLong(0)}/${r.getLong(1)}")
      assert(math.abs(r.getDouble(3) - math.sqrt(rEpi * rEpi + edep * edep)) < 1e-9)
      assert(math.abs(r.getDouble(4) - az) < 1e-9, s"azimuth mismatch for ${r.getLong(0)}/${r.getLong(1)}")
    }
  }

  test("oblique rupture distances match a driver-side 3D recompute") {
    val ev = graft.model.Catalog.events(spark, Sf)
      .filter(s"mag >= ${GeoOps.RupMagMin}")
      .select("evid", "ev_lat", "ev_lon", "ev_depth", "mag").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val st = graft.model.Catalog.stations(spark, Sf).select("sta", "sta_lat", "sta_lon")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val out = GeoOps.rrupDistancesGeo(spark, Sf).collect()
    assert(out.nonEmpty)
    for (r <- out.take(2000)) {
      val (elat, elon, edep, mag) = ev(r.getLong(0))
      val (slat, slon) = st(r.getLong(1))
      val evid = r.getLong(0)
      val strike = math.toRadians((evid % 360).toDouble)
      val dip = math.toRadians(30.0 + (evid % 6) * 10.0)
      val halfL = (math.floor(mag) - 3) * 5.0 + 2.5
      val wid = halfL
      val ztop = edep * 0.5
      val dx = (slon - elon) * GeoOps.KmPerDegLon
      val dy = (slat - elat) * GeoOps.KmPerDegLat
      val (sx, sy) = (math.sin(strike), math.cos(strike))
      val (hx, hy) = (math.cos(strike), -math.sin(strike))
      def clamp(x: Double, lo: Double, hi: Double) = math.max(lo, math.min(hi, x))
      val sp = clamp(dx * sx + dy * sy, -halfL, halfL)
      val wp = clamp(dx * hx * math.cos(dip) + dy * hy * math.cos(dip) - ztop * math.sin(dip), 0.0, wid)
      val (nx, ny, nz) = (sp * sx + wp * math.cos(dip) * hx, sp * sy + wp * math.cos(dip) * hy, wp * -math.sin(dip))
      val rrup = math.sqrt(math.pow(dx - nx, 2) + math.pow(dy - ny, 2) + math.pow(ztop - nz, 2))
      val s2 = clamp(dx * sx + dy * sy, -halfL, halfL)
      val w2 = clamp(dx * hx + dy * hy, 0.0, wid * math.cos(dip))
      val rjb = math.sqrt(math.pow(dx - (s2 * sx + w2 * hx), 2) + math.pow(dy - (s2 * sy + w2 * hy), 2))
      assert(math.abs(r.getDouble(2) - rrup) < 1e-9, s"r_rup mismatch for $evid/${r.getLong(1)}")
      assert(math.abs(r.getDouble(3) - rjb) < 1e-9, s"r_jb mismatch for $evid/${r.getLong(1)}")
      assert(r.getDouble(2) >= r.getDouble(3) - 1e-9, "r_rup must dominate r_jb")
    }
  }

  test("ANN sizing rules and parameterized variants") {
    assert(AnnOps.planesFor(2000) == 6)
    assert(AnnOps.planesFor(1L << 40) == 35) // grows with log2(N)
    // table-driven assignment: cells ~ N/targetCell, no representation cap
    assert(AnnOps.cellsFor(10000000L) == 9766)
    for (p <- Seq(4, 10)) {
      val res = AnnOps.annLshTopkWith(spark, Sf, p)
        .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(res.distinct.length == res.length, s"duplicate (q,v) pairs at $p planes")
      assert(res.forall { case (q, v) => q != v })
    }
    assert(AnnOps.annIvfTopkWith(spark, Sf, 4, 2).count() > 0)
    // a cell count far beyond the old literal-expression cap still plans
    assert(AnnOps.annIvfTopkWith(spark, Sf, 64, 8).count() > 0)
    assert(AnnOps.dedupEmbeddingWith(spark, Sf, 2, 10).count() > 0)
  }

  test("flatfile psa columns are bit-equal to the im_psa operator") {
    import graft.functions.Sdof
    val cols = Sdof.Periods.map(Sdof.colName)
    val ff = MergeOps.mergeFlatfile(spark, Sf)
      .select((Seq("record_id") ++ cols).map(org.apache.spark.sql.functions.col): _*)
      .collect().map(r => r.getString(0) -> cols.indices.map(i => r.getDouble(i + 1))).toMap
    val psa = SignalOps.imPsa(spark, Sf)
      .select((Seq("record_id") ++ cols).map(org.apache.spark.sql.functions.col): _*)
      .collect().map(r => r.getString(0) -> cols.indices.map(i => r.getDouble(i + 1))).toMap
    assert(ff.keySet == psa.keySet)
    for ((rid, vals) <- psa.take(5000))
      assert(ff(rid) == vals, s"flatfile/im_psa psa mismatch for $rid")
  }

  test("decimal_year matches the reference's golden values") {
    // `tests/test_aftershocks.py:120-128` (atol 1e-3)
    val golden = Seq(
      "2020-01-01 00:00:00" -> 2020.0,
      "2020-07-02 12:00:00" -> 2020.5,
      "2020-12-31 23:59:59" -> 2020.999999,
      "2021-03-01 00:00:00" -> 2021.163)
    val sp = spark; import sp.implicits._
    val us = golden.map { case (d, _) =>
      java.time.LocalDateTime.parse(d.replace(" ", "T"))
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    }
    val got = us.toDF("ev_us")
      .select(GeoOps.decimalYearCol(org.apache.spark.sql.functions.col("ev_us")))
      .collect().map(_.getDouble(0))
    // np.isclose semantics: atol=1e-3 plus the default rtol=1e-5*|b|
    // (the reference's 2020-07-02 case needs the rtol headroom: the
    // exact elapsed/duration value in leap-year 2020 is 2020.50137)
    for (((_, want), g) <- golden.zip(got))
      assert(math.abs(g - want) < 1e-3 + 1e-5 * math.abs(want), s"expected $want got $g")
  }

  test("rupture corner vertices form the expected dipping rectangle") {
    val out = GeoOps.ccldVertices(spark, Sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    val ev = graft.model.Catalog.events(spark, Sf)
      .filter(s"mag >= ${GeoOps.RupMagMin}").select("evid", "ev_lat", "ev_lon", "ev_depth", "mag")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == ev.keySet)
    for ((evid, cs) <- out.take(200)) {
      assert(cs.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
      val (_, _, edep, mag) = ev(evid)
      val halfL = (math.floor(mag) - 3) * 5.0 + 2.5
      val dip = math.toRadians(30.0 + (evid % 6) * 10.0)
      def km(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row): Double = {
        val dx = (a.getDouble(3) - b.getDouble(3)) * GeoOps.KmPerDegLon
        val dy = (a.getDouble(2) - b.getDouble(2)) * GeoOps.KmPerDegLat
        math.sqrt(dx * dx + dy * dy)
      }
      // top edge length = 2*halfL; down-dip horizontal extent = W*cos(dip)
      assert(math.abs(km(cs(0), cs(1)) - 2 * halfL) < 1e-6)
      assert(math.abs(km(cs(0), cs(2)) - halfL * math.cos(dip)) < 1e-6)
      // top corners at ztop, bottom corners deeper by W*sin(dip)
      assert(math.abs(cs(0).getDouble(4) - edep * 0.5) < 1e-9)
      assert(math.abs(cs(2).getDouble(4) - (edep * 0.5 + halfL * math.sin(dip))) < 1e-9)
    }
  }

  test("aftershock flags: flagged events always have a qualifying larger neighbor") {
    val ev = graft.model.Catalog.events(spark, Sf)
      .select("evid", "mag", "ev_us", "ev_lat", "ev_lon").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val flagged = GeoOps.aftershockFlags(spark, Sf)
      .filter("is_aftershock").select("evid").collect().map(_.getLong(0)).toSet
    val winByClass = GeoOps.magClasses.map(c => c._1 -> (c._2, c._3)).toMap
    def qualifies(s: (Long, Double, Long, Double, Double)) = ev.exists { m =>
      val (tUs, dKm) = winByClass(math.floor(m._2).toInt)
      m._1 != s._1 && m._2 >= s._2 + GeoOps.MagGapMin &&
        math.abs(s._3 - m._3) <= tUs &&
        math.sqrt(math.pow((m._5 - s._5) * GeoOps.KmPerDegLon, 2) +
          math.pow((m._4 - s._4) * GeoOps.KmPerDegLat, 2)) <= dKm
    }
    for (s <- ev) {
      assert(flagged.contains(s._1) == qualifies(s),
        s"evid ${s._1}: flag=${flagged.contains(s._1)} but brute-force says ${qualifies(s)}")
    }
  }

  test("asof_join matches a brute-force latest-click recompute") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, Sf)
    val tsd = ev.schema("ts").dataType
    val rows = ev.select(col("event_id"), col("user_id"), col("event_type"),
        EventOps.tsUs(tsd).as("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicks = rows.filter(_._3 == "click")
    val expected = rows.filter(_._3 == "purchase").map { p =>
      val best = clicks.filter(c => c._2 == p._2 && c._4 <= p._4)
        .sortBy(c => (c._4, c._1)).lastOption
      (p._1, p._2, p._4, best.map(_._1), best.map(_._4))
    }.toSet
    val got = EventOps.asofJoin(spark, Sf).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toSet
    assert(got == expected, "asof_join disagrees with the brute-force recompute")
    // lag is non-negative whenever a click matched
    val lags = EventOps.asofJoin(spark, Sf).filter(col("lag_us").isNotNull)
      .select(min(col("lag_us"))).collect()(0).getLong(0)
    assert(lags >= 0L, "matched click after the purchase")
  }

  test("event_funnel: stage ordering invariants and strict event-order semantics") {
    import org.apache.spark.sql.functions._
    val f = EventOps.eventFunnel(spark, Sf).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5))
    }
    for ((u, v, c, p, stage) <- f) {
      // a later stage implies every earlier one, in temporal order
      assert(stage == (if (p.isDefined) 3 else if (c.isDefined) 2 else if (v.isDefined) 1 else 0),
        s"user $u: stage $stage inconsistent with timestamps")
      for (cv <- c) assert(v.isDefined && v.get <= cv, s"user $u: click before first view")
      for (pv <- p) assert(c.isDefined && c.get <= pv, s"user $u: purchase before first click")
    }
    // strict-order semantics on a fixture: a click BEFORE the first
    // view must not advance the funnel
    val ev = graft.sources.Tables.events(spark, Sf)
    val tsd = ev.schema("ts").dataType
    val raw = ev.select(col("user_id"), col("event_type"), EventOps.tsUs(tsd).as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byU = raw.groupBy(_._1)
    for ((u, v, c, _, _) <- f; fv <- v; fc <- c) {
      val evs = byU(u)
      val expFirstClick = evs.filter(e => e._2 == "click" && e._3 >= fv).map(_._3).min
      assert(fc == expFirstClick, s"user $u: first_click_us $fc != recomputed $expFirstClick")
    }
  }

  test("semdedup: kept set equals a sequential within-cell greedy recompute") {
    import org.apache.spark.sql.functions._
    val vecs = graft.sources.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val cents = (0 until AnnOps.SemCells)
      .map(c => (0 until AnnOps.Dim).map(i => AnnOps.centroidCoef(c, i).toDouble).toArray)
    def cellOf(e: Array[Double]): Int =
      cents.indices.maxBy(c => (dot(e, cents(c)), -c)) // argmax dot, tie lowest cell
    val byCell = vecs.groupBy(v => cellOf(v._2))
    val dropped = byCell.values.flatMap { members =>
      val srt = members.sortBy(_._1)
      for {
        j <- srt.indices; i <- 0 until j
        (ida, ea) = srt(i); (idb, eb) = srt(j)
        if dot(ea, eb) / (math.sqrt(dot(ea, ea)) * math.sqrt(dot(eb, eb))) >= AnnOps.SemCosT
      } yield idb
    }.toSet
    val expected = vecs.map(_._1).toSet -- dropped
    val got = AnnOps.semDedup(spark, Sf).collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.map(_._1).toSet == expected, "semdedup kept-set mismatch vs sequential recompute")
    for ((id, cell) <- got)
      assert(cell == cellOf(vecs.find(_._1 == id).get._2), s"vec $id reported wrong cell")
  }

  test("minhash_containment: containment bounds jaccard and flags doc-in-doc") {
    import org.apache.spark.sql.functions._
    val cont = TextOps.minhashContainment(spark, Sf)
      .join(TextOps.ngramJaccard(spark, Sf), Seq("ida", "idb"))
      .collect()
    assert(cont.nonEmpty, "no candidate pairs at sf0.001")
    for (r <- cont) {
      val j = r.getAs[Double]("jacc")
      for (ca <- Option(r.getAs[java.lang.Double]("contain_a")))
        assert(ca >= j - 1e-12 && ca <= 1.0 + 1e-12, s"contain_a $ca out of [jacc, 1]")
      for (cb <- Option(r.getAs[java.lang.Double]("contain_b")))
        assert(cb >= j - 1e-12 && cb <= 1.0 + 1e-12, s"contain_b $cb out of [jacc, 1]")
    }
    // literal fixture: B is a strict substring of A ⇒ contain_b = 1, jacc < 1
    val fix = spark.createDataFrame(Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "fix", 8L),
      (1L, "alpha beta gamma delta epsilon", "en", "fix", 5L)
    )).toDF("doc_id", "text", "lang", "source", "n_chars")
    val sh = fix.select(col("doc_id"),
      graft.functions.Portable.shingles(graft.functions.Portable.tokens(col("text")), TextOps.ShingleN).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet)).toMap
    val inter = sh(0L).intersect(sh(1L)).size.toDouble
    assert(inter / sh(1L).size == 1.0, "fixture: B's shingles all inside A")
    assert(inter / sh(0L).size < 1.0, "fixture: A has extra shingles")
  }

  test("trailing_window_counts matches a brute-force range recompute") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, Sf)
    val tsd = ev.schema("ts").dataType
    val rows = ev.select(col("event_id"), col("user_id"), EventOps.tsUs(tsd).as("ts_us"),
        expr("cast(round(value * 100) as bigint)").as("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byU = rows.groupBy(_._2)
    val got = EventOps.trailingWindowCounts(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got.size == rows.length)
    for ((id, u, t, _) <- rows) {
      val frame = byU(u).filter(e => e._3 >= t - EventOps.TrailUs && e._3 <= t)
      assert(got(id) == ((frame.length.toLong, frame.map(_._4).sum)),
        s"event $id trailing frame mismatch")
    }
  }

  test("vocab_topk equals a plain-Scala term-count recompute") {
    import org.apache.spark.sql.functions._
    val texts = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    val perDoc = texts.collect { case (id, Some(t)) => (id, t.split(" ", -1).toSeq) }
    val tf = perDoc.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val df = perDoc.flatMap { case (id, ts) => ts.distinct.map(t => (t, id)) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.length.toLong }
    val expected = tf.toSeq.sortBy { case (t, n) => (-n, t) }.take(TextOps.VocabK)
      .zipWithIndex.map { case ((t, n), i) => (i + 1L, t, n, df(t)) }
    val got = TextOps.vocabTopk(spark, Sf).collect()
      .map(r => (r.getInt(0).toLong, r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    assert(got == expected, "vocab_topk disagrees with recompute")
  }

  test("ann_knn_graph matches a sequential LSH-bucket recompute") {
    import org.apache.spark.sql.functions._
    val vecs = graft.sources.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def bucket(e: Array[Double], off: Int, n: Int): Long =
      (0 until n).map { j =>
        val pl = (0 until AnnOps.Dim).map(i => AnnOps.planeCoef(off + j, i).toDouble).toArray
        if (dot(e, pl) > 0) 1L << j else 0L
      }.sum
    // banded buckets, cap, in-bucket pairs — mirror of the operator
    val banded = for {
      (id, e) <- vecs; t <- 0 until AnnOps.DedupTables
    } yield ((t, bucket(e, t * AnnOps.DedupPlanes, AnnOps.DedupPlanes)), id)
    val buckets = banded.groupBy(_._1).values
      .filter(_.size <= AnnOps.MaxBucket).map(_.map(_._2).sorted)
    val pairs = buckets.flatMap(ids =>
      for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))).toSet
    val em = vecs.toMap
    def cos(a: Long, b: Long): Double =
      dot(em(a), em(b)) / (math.sqrt(dot(em(a), em(a))) * math.sqrt(dot(em(b), em(b))))
    val sym = pairs.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val expected = sym.groupBy(_._1).flatMap { case (src, es) =>
      es.map { case (_, dst) => (src, dst, cos(src, dst)) }
        .sortBy { case (_, dst, c) => (-c, dst) }.take(AnnOps.KnnK)
        .zipWithIndex.map { case ((s0, d0, c), i) => (s0, d0, i + 1, c) }
    }.toSet
    val got = AnnOps.annKnnGraph(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(got == expected, "ann_knn_graph disagrees with sequential recompute")
  }

  test("corpus_rollup levels are mutually consistent and match the detail rows") {
    import org.apache.spark.sql.functions._
    val rows = TextOps.corpusRollup(spark, Sf).collect().map { r =>
      (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2),
        r.getLong(3), r.getLong(4), if (r.isNullAt(5)) 0L else r.getLong(5))
    }
    val detail = rows.filter(_._3 == 0L)
    val bySrc  = rows.filter(_._3 == 1L)
    val total  = rows.filter(_._3 == 3L)
    assert(total.length == 1 && total.head._1.isEmpty && total.head._2.isEmpty)
    // per-source rows equal the sum of their detail rows
    for ((src, _, _, n, nn, st) <- bySrc) {
      val d = detail.filter(_._1 == src)
      assert(d.nonEmpty && d.map(_._4).sum == n && d.map(_._5).sum == nn &&
        d.map(_._6).sum == st, s"source $src rollup != sum of detail")
    }
    assert(detail.map(_._4).sum == total.head._4, "grand total n_docs")
    assert(bySrc.map(_._4).sum == total.head._4, "source level sums to total")
  }

  test("label_centroids equals an exact fixed-point mean recompute") {
    import org.apache.spark.sql.functions._
    val vecs = graft.sources.Tables.embeddings(spark, Sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val got = AnnOps.labelCentroids(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val byLabel = vecs.groupBy(_._1)
    for ((lab, vs) <- byLabel; i <- vs.head._2.indices) {
      // Spark's round() is BigDecimal HALF_UP (away from zero for
      // negatives), which math.round is NOT — match it exactly
      val sx = vs.map(v => BigDecimal(v._2(i).toDouble * AnnOps.CentScale)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
      val exp = (sx.toDouble / vs.length.toDouble) / AnnOps.CentScale.toDouble
      val (n, c) = got((lab, i.toLong))
      assert(n == vs.length && c == exp, s"label $lab dim $i centroid mismatch")
    }
    assert(got.size == byLabel.size * vecs.head._2.length)
  }

  test("knn_label_purity is consistent with the knn graph and label table") {
    import org.apache.spark.sql.functions._
    val labels = graft.sources.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = AnnOps.annKnnGraph(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exp = edges.groupBy(e => labels(e._1)).map { case (lab, es) =>
      lab -> (es.length.toLong, es.count(e => labels(e._2) == lab).toLong)
    }
    val got = AnnOps.knnLabelPurity(spark, Sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == exp.keySet)
    for ((lab, (n, same)) <- exp) {
      assert(got(lab)._1 == n && got(lab)._2 == same, s"label $lab edge counts")
      assert(got(lab)._3 == same.toDouble / n.toDouble, s"label $lab purity")
    }
  }

  test("streaming asof join equals the batch merged-scan result") {
    val a = sortedRows(EventOps.asofJoin(spark, Sf))
    val b = sortedRows(graft.streaming.StreamingAsofJoin.run(spark, Sf))
    assert(a == b, "streaming asof attribution != batch asof_join")
  }

  test("streaming trailing counts equal the batch RANGE-frame result") {
    val a = sortedRows(EventOps.trailingWindowCounts(spark, Sf))
    val b = sortedRows(graft.streaming.StreamingTrailingCounts.run(spark, Sf))
    assert(a == b, "streaming sliding-buffer features != batch RANGE window")
  }

  test("dedup_incremental screens the incoming batch against the index only") {
    import org.apache.spark.sql.functions._
    val out = TextOps.dedupIncremental(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    val (inc, idx) = docs.partition(_._1 % TextOps.IncMod == 0)
    // output covers exactly the incoming slice
    assert(out.keySet == inc.map(_._1).toSet, "output rows != incoming batch")
    // exact flag recomputed brute-force on text equality (same-content
    // docs hash equal; NULL text never matches)
    val idxTexts = idx.flatMap(_._2).toSet
    for ((id, txt) <- inc) {
      val expExact = txt.exists(idxTexts.contains)
      assert(out(id)._1 == expExact, s"doc $id dup_exact=${out(id)._1}, brute-force $expExact")
      // keep is the negated disjunction
      assert(out(id)._3 == !(out(id)._1 || out(id)._2), s"doc $id keep flag inconsistent")
      // exact dup implies near candidate machinery CAN miss it only if
      // the pair fell out of a capped bucket — don't over-constrain;
      // but near-dup on identical text must hold when both have shingles
    }
    // an exact index duplicate with >= ShingleN tokens must also be
    // near-flagged unless every shared band bucket got capped — verify
    // at least that near ⊇ exact for docs with shingles (cap rarely
    // binds at sf0.001; if it ever does, loosen this to a warning)
    val longIncDups = inc.filter { case (id, txt) =>
      txt.exists(t => idxTexts.contains(t) && t.split(" ", -1).length >= TextOps.ShingleN)
    }.map(_._1)
    for (id <- longIncDups)
      assert(out(id)._2, s"doc $id exact-dups an index doc but not near-flagged")
  }

  test("corpus_quantiles equals a sorted nearest-rank recompute") {
    import org.apache.spark.sql.functions._
    val toks = graft.sources.Tables.documents(spark, Sf)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val bySource = toks.groupBy(_._1)
    val got = TextOps.corpusQuantiles(spark, Sf).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    }
    def rank(n: Long, pct: Int): Int = ((n * pct + 99) / 100).toInt
    for ((src, nDocs, nNull, mn, p50, p90, p99, mx) <- got) {
      val all = bySource(src)
      val vals = all.flatMap(_._3).sorted
      assert(nDocs == vals.length && nNull == all.count(_._3.isEmpty), s"$src counts")
      assert(mn == vals.head && mx == vals.last, s"$src min/max")
      assert(p50 == vals(rank(vals.length, 50) - 1), s"$src p50")
      assert(p90 == vals(rank(vals.length, 90) - 1), s"$src p90")
      assert(p99 == vals(rank(vals.length, 99) - 1), s"$src p99")
    }
    assert(got.map(_._1).toSet == bySource.keySet.filter(s => bySource(s).exists(_._3.isDefined)))
  }

  test("corpus_quantiles_lang equals a sorted nearest-rank recompute keyed on lang") {
    import org.apache.spark.sql.functions._
    val toks = graft.sources.Tables.documents(spark, Sf)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val byLang = toks.groupBy(_._1)
    val got = TextOps.corpusQuantilesLang(spark, Sf).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    }
    def rank(n: Long, pct: Int): Int = ((n * pct + 99) / 100).toInt
    for ((lg, nDocs, nNull, mn, p50, p90, p99, mx) <- got) {
      val all = byLang(lg)
      val vals = all.flatMap(_._3).sorted
      assert(nDocs == vals.length && nNull == all.count(_._3.isEmpty), s"$lg counts")
      assert(mn == vals.head && mx == vals.last, s"$lg min/max")
      assert(p50 == vals(rank(vals.length, 50) - 1), s"$lg p50")
      assert(p90 == vals(rank(vals.length, 90) - 1), s"$lg p90")
      assert(p99 == vals(rank(vals.length, 99) - 1), s"$lg p99")
    }
    assert(got.map(_._1).toSet == byLang.keySet.filter(l => byLang(l).exists(_._3.isDefined)))
  }

  test("dedup_fingerprint equals a plain-Scala fingerprint-Jaccard recompute") {
    // recompute pairwise fingerprint Jaccard from docFingerprint's own
    // output (that operator has its own winnowing recompute spec) —
    // pins the bucket cap, the filtered-space sizes and the integer
    // ppm arithmetic
    val fps = TextOps.docFingerprint(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byFp = fps.groupBy(_._2).filter(_._2.length <= TextOps.FpMaxBucket)
    val good = fps.filter(x => byFp.contains(x._2))
    val sz = good.groupBy(_._1).map { case (d, xs) => d -> xs.length.toLong }
    val exp = byFp.values.toSeq
      .flatMap { xs =>
        val ds = xs.map(_._1).toSeq
        for (a <- ds; b <- ds if a < b) yield (a, b)
      }
      .groupBy(identity).map { case (p, ps) => p -> ps.length.toLong }
    val got = TextOps.dedupFingerprint(spark, Sf).collect()
    assert(got.nonEmpty)
    assert(got.length == exp.size, s"pair count ${got.length} != ${exp.size}")
    for (r <- got) {
      val (a, b) = (r.getLong(0), r.getLong(1))
      val shared = r.getLong(2)
      assert(shared == exp((a, b)), s"($a,$b) n_shared")
      assert(r.getLong(3) == sz(a) && r.getLong(4) == sz(b), s"($a,$b) sizes")
      val jacc = shared * 1000000L / (sz(a) + sz(b) - shared)
      assert(r.getLong(5) == jacc, s"($a,$b) jacc_ppm")
      assert(r.getBoolean(6) == (jacc >= TextOps.FpDupPpm), s"($a,$b) is_dup")
    }
  }

  test("dedup_spans and span_excise equal a plain-Scala ExactSubstr recompute") {
    // independent sequential recompute of the whole span pipeline:
    // tokens -> positioned shingles -> h60 -> corpus occurrence counts
    // -> consecutive-run merge -> spans -> excision
    val docRows = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").collect()
    val toks: Map[Long, Array[String]] = docRows.map { r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1).split(" ", -1))
    }.toMap
    def shingleList(tk: Array[String]): Seq[String] =
      if (tk == null || tk.length < TextOps.ShingleN) Seq.empty
      else (0 to tk.length - TextOps.ShingleN)
        .map(i => tk.slice(i, i + TextOps.ShingleN).mkString(" "))
    val posed = toks.toSeq.flatMap { case (id, tk) =>
      shingleList(tk).zipWithIndex.map { case (sh, p) => (id, p, scalaH60(sh)) } }
    val occ = posed.groupBy(_._3).map { case (h, xs) => h -> xs.size }
    val dupPos: Map[Long, Seq[Int]] = posed.filter(x => occ(x._3) >= 2)
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).sorted }
    val expSpans = scala.collection.mutable.Set[(Long, Long, Long, Long, Long)]()
    for ((id, ps) <- dupPos) {
      var runStart = ps.head
      var prevP = ps.head
      def emit(s0: Int, e0: Int): Unit = {
        val n = e0 - s0 + 1
        if (n >= TextOps.SpanMinRun)
          expSpans += ((id, s0.toLong, (e0 + TextOps.ShingleN - 1).toLong,
            n.toLong, (e0 - s0 + TextOps.ShingleN).toLong))
      }
      for (p <- ps.tail) {
        if (p != prevP + 1) { emit(runStart, prevP); runStart = p }
        prevP = p
      }
      emit(runStart, prevP)
    }
    val gotSpans = TextOps.dedupSpans(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(gotSpans.nonEmpty, "no spans located at all on data with planted dups")
    assert(gotSpans.length == gotSpans.toSet.size, "duplicate span rows")
    assert(gotSpans.toSet == expSpans.toSet, "span set mismatch vs recompute")
    // excision: every non-NULL doc appears exactly once; kept tokens
    // are exactly the positions no span covers
    val covered: Map[Long, Set[Long]] = expSpans.toSeq.groupBy(_._1)
      .map { case (id, xs) => id -> xs.flatMap(x => x._2 to x._3).toSet }
    val got = TextOps.spanExcise(spark, Sf).collect()
    val gotMap = got.map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val nonNull = toks.filter(_._2 != null)
    assert(got.length == gotMap.size && gotMap.size == nonNull.size)
    for ((id, tk) <- nonNull) {
      val cov = covered.getOrElse(id, Set.empty[Long])
      val keptToks = tk.zipWithIndex.collect { case (t, i) if !cov.contains(i.toLong) => t }
      val (ct, nRemoved) = gotMap(id)
      assert(ct == keptToks.mkString(" "), s"doc $id clean_text mismatch")
      assert(nRemoved == tk.length - keptToks.length, s"doc $id n_removed mismatch")
    }
    // and the two operators stay consistent with each other: total
    // removed tokens == total covered positions
    assert(got.map(_.getLong(2)).sum == covered.values.map(_.size.toLong).sum)
    // dup_span_stats: recompute the per-source coverage KPI from the
    // same covered-position UNION the excise check built (token
    // extents of nearby runs overlap, so coverage is a distinct
    // count, never a sum of span lengths) + the doc source map
    val srcOf = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val covPerDoc = covered.map { case (id, ps) => id -> ps.size.toLong }
    val bySource = nonNull.keys.toSeq.groupBy(srcOf)
    val stats = TextOps.dupSpanStats(spark, Sf).collect()
    assert(stats.map(_.getString(0)).toSet == bySource.keySet)
    for (r <- stats) {
      val src = r.getString(0)
      val ids = bySource(src)
      assert(r.getLong(r.fieldIndex("n_docs")) == ids.size, s"$src n_docs")
      assert(r.getLong(r.fieldIndex("docs_with_spans")) ==
        ids.count(covPerDoc.contains), s"$src docs_with_spans")
      val totTok = ids.map(id => toks(id).length.toLong).sum
      val covTok = ids.map(id => covPerDoc.getOrElse(id, 0L)).sum
      assert(r.getLong(r.fieldIndex("total_tokens")) == totTok, s"$src total_tokens")
      assert(r.getLong(r.fieldIndex("span_tokens")) == covTok, s"$src span_tokens")
      assert(r.getLong(r.fieldIndex("span_ppm")) ==
        (if (totTok > 0) covTok * 1000000L / totTok else 0L), s"$src span_ppm")
    }
    // span_dedup_incremental: recompute the index-probe variant and
    // pin the containment property (index presence implies corpus
    // occurrence >= 2, so every incremental span lies inside some
    // full-corpus duplicated-position run of its doc)
    val idxHashes = posed.filter(x => x._1 % TextOps.IncMod != 0).map(_._3).toSet
    val incDup: Map[Long, Seq[Int]] = posed
      .filter(x => x._1 % TextOps.IncMod == 0 && idxHashes.contains(x._3))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).sorted }
    val expInc = scala.collection.mutable.Set[(Long, Long, Long, Long, Long)]()
    for ((id, ps) <- incDup) {
      var runStart = ps.head
      var prevP = ps.head
      def emit(s0: Int, e0: Int): Unit = {
        val n = e0 - s0 + 1
        if (n >= TextOps.SpanMinRun)
          expInc += ((id, s0.toLong, (e0 + TextOps.ShingleN - 1).toLong,
            n.toLong, (e0 - s0 + TextOps.ShingleN).toLong))
      }
      for (p <- ps.tail) {
        if (p != prevP + 1) { emit(runStart, prevP); runStart = p }
        prevP = p
      }
      emit(runStart, prevP)
    }
    val gotInc = TextOps.spanDedupIncremental(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(gotInc.nonEmpty, "no incremental spans on data with planted dups")
    assert(gotInc.toSet == expInc.toSet, "incremental span set mismatch vs recompute")
    val fullDupPos = dupPos // full-corpus duplicated shingle positions per doc
    for ((id, s0, e0, n, _) <- gotInc) {
      val full = fullDupPos.getOrElse(id, Seq.empty).toSet
      val shingleRun = (s0 until (e0 - TextOps.ShingleN + 2)).map(_.toInt)
      assert(shingleRun.forall(full.contains),
        s"incremental span ($id,$s0,$e0,$n) not contained in full-corpus duplication")
    }
  }

  /** CDC idempotence across a restart: run 1 processes the full
    * update stream into a durable changelog; run 2 restarts from the
    * same checkpoint after the SAME data arrives again as a new file.
    * The rehydrated latest-value state makes the replay a no-op (every
    * replayed version fails the monotone guard), so the changelog is
    * unchanged and still equals the batch keep-last table — the
    * exactly-once-compaction property a downstream consumer relies
    * on. Without state rehydration run 2 would re-emit every key. */
  test("streaming db_upsert replay after restart emits nothing new") {
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_ckpt").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    li.write.parquet(s"$src/part1.parquet")
    graft.streaming.StreamingUpsert.runFileSink(
      spark, s"$src/*.parquet", sink, ckpt, li.schema)
    val afterRun1 = spark.read.parquet(sink).count()
    assert(afterRun1 > 0)
    li.write.mode("append").parquet(s"$src/part2.parquet") // replay: same updates again
    graft.streaming.StreamingUpsert.runFileSink(
      spark, s"$src/*.parquet", sink, ckpt, li.schema)
    val afterRun2 = spark.read.parquet(sink).count()
    assert(afterRun2 == afterRun1,
      s"replayed updates must emit nothing ($afterRun1 -> $afterRun2)")
    val compacted = sortedRows(spark.read.parquet(sink))
    val batch = sortedRows(MergeOps.dbUpsert(spark, Sf))
    assert(compacted == batch, "changelog after replay must equal batch keep-last")
  }

  /** Funnel state survives a restart: a user who viewed before the
    * restart must still convert on a click delivered after it (stage
    * rehydrated from the checkpoint), and already-emitted transitions
    * must not re-emit. Time-wise split → the union of both runs'
    * emissions equals the batch funnel's transition unpivot. */
  test("streaming funnel survives a restart: checkpoint carries stage state") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft_funnel_ckpt").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    val schema = ev.schema
    val withUs = ev.withColumn("us", EventOps.tsUs(schema("ts").dataType))
    // split EARLY (10% quantile): most stage advancements land in run
    // 2, so conversions that depend on run-1 state actually occur
    val Array(mid) = withUs.stat.approxQuantile("us", Array(0.1), 0.0)
    withUs.filter(col("us") <= mid).drop("us").write.parquet(s"$src/part1.parquet")
    graft.streaming.StreamingFunnel.runFileSink(
      spark, s"$src/*.parquet", sink, ckpt, schema)
    val run1 = spark.read.parquet(sink).collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")), r.getLong(r.fieldIndex("stage"))))
    assert(run1.nonEmpty)
    withUs.filter(col("us") > mid).drop("us").write.parquet(s"$src/part2.parquet")
    graft.streaming.StreamingFunnel.runFileSink(
      spark, s"$src/*.parquet", sink, ckpt, schema)
    val streamed = sortedRows(spark.read.parquet(sink))
    val batch = EventOps.eventFunnel(spark, Sf).collect().flatMap { r =>
      val u = r.getLong(r.fieldIndex("user_id"))
      def at(c: String): Option[Long] =
        if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getLong(r.fieldIndex(c)))
      at("first_view_us").map(t => Seq[Any](u, 1L, t)) ++
        at("first_click_us").map(t => Seq[Any](u, 2L, t)) ++
        at("first_purchase_us").map(t => Seq[Any](u, 3L, t))
    }
    // sink columns sorted by name: at_us, stage, user_id
    val batchSorted = batch.map(x => Seq(x(2), x(1), x(0)))
      .sortBy(_.mkString("|")).toSeq
    assert(streamed == batchSorted,
      "restarted funnel emissions must equal the batch transition unpivot")
    // true cross-restart dependence: some user advanced PAST a stage
    // reached before the restart — only possible if run 2 rehydrated
    // run 1's stage state
    val all = spark.read.parquet(sink).collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")), r.getLong(r.fieldIndex("stage"))))
    val run1Set = run1.toSet
    // (user, stage) is unique per emission, so set-diff isolates run 2
    val run2 = all.toSet -- run1Set
    val continued = run2.exists { case (u, st) =>
      st > 1 && run1Set.contains((u, st - 1))
    }
    assert(continued, "no conversion built on pre-restart stage state")
  }

  test("lang_confusion cells sum to the scored corpus") {
    val scored = TextOps.langId(spark, Sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val expected = scored.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = TextOps.langConfusion(spark, Sf).collect()
    val got = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected, "confusion cells differ from a lang_id recompute")
    for (r <- rows) {
      val labelCount = scored.count(_._1 == r.getString(0)).toLong
      assert(r.getLong(3) == labelCount, s"label_total for ${r.getString(0)}")
    }
  }

  test("dup_degree is the exact degree of the verified pair graph") {
    import org.apache.spark.sql.functions._
    val pairs = TextOps.ngramJaccard(spark, Sf)
      .filter(col("jacc") >= TextOps.JaccT)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = graft.sources.Tables.documents(spark, Sf).count()
    val got = TextOps.dupDegree(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
    assert(got.length == n, "every doc keeps a degree row")
    for ((id, (d, flag)) <- got) {
      assert(d == deg.getOrElse(id, 0L), s"doc $id degree")
      assert(flag == (d > 0))
    }
  }

  test("interval_join banding equals the naive range formulation") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, Sf)
    val us = EventOps.tsUs(ev.schema("ts").dataType)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"), us.as("c_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"), us.as("p_us"))
    val naive = c.join(p, col("cu") === col("pu") &&
        col("p_us") >= col("c_us") &&
        col("p_us") <= col("c_us") + EventOps.AttributionUs)
      .select(col("click_id"), col("purchase_id"), col("cu").as("user_id"))
    val banded = EventOps.intervalJoin(spark, Sf)
    assert(sortedRows(banded) == sortedRows(naive),
      "banded interval join must equal the range formulation")
    // each pair must match exactly once (no dedup in the plan)
    val n = banded.count()
    assert(banded.distinct().count() == n, "banding produced duplicate pairs")
  }

  test("saltedJoin equals the plain equi-join row-for-row") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("source"), col("lang"))
    val srcStats = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("src_docs"))
    val plain = docs.join(srcStats, Seq("source"))
    val salted = graft.operators.Joins.saltedJoin(
      docs, srcStats, "source", col("doc_id"), salts = 5)
    assert(sortedRows(salted) == sortedRows(plain),
      "salted join must be row-identical to the plain join")
  }

  test("semantic_clusters equals a union-find over the thresholded kNN graph") {
    import org.apache.spark.sql.functions._
    val edges = AnnOps.annKnnGraph(spark, Sf)
      .filter(col("cosine") >= AnnOps.SemClusterCosT)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = graft.sources.Tables.embeddings(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    for ((a, b) <- edges) { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    val byRoot = ids.groupBy(find)
    val expected = byRoot.values.flatMap(c => { val m = c.min; c.map(_ -> m) }).toMap
    val got = AnnOps.semanticClusters(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "cluster labels differ from the union-find recompute")
    assert(got.values.groupBy(identity).values.exists(_.size > 1),
      "threshold produced only singletons — no clustering exercised")
    // The 100 TB distributed path (forced past the driver-tail
    // threshold) must produce identical labels.
    val distributed = AnnOps.semanticClusters(spark, Sf, tailMax = -1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == expected,
      "distributed propagation labels differ from the union-find tail")
  }

  test("kmeans_step moves centroids toward their assigned mass") {
    import org.apache.spark.sql.functions._
    val updated = AnnOps.kmeansStep(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(updated.nonEmpty)
    // every populated cell carries a full 64-dim centroid with one
    // consistent count, and the fixed-point mean is within quantization
    // of the true float mean of its members
    val cells = updated.keys.map(_._1).toSet
    for (c <- cells) {
      val dims = updated.keys.filter(_._1 == c).map(_._2)
      assert(dims == (0L until 64L).toSet, s"cell $c dims incomplete")
      assert(updated.filter(_._1._1 == c).values.map(_._1).toSet.size == 1,
        s"cell $c inconsistent counts")
    }
    val eps = 1.0 / AnnOps.CentScale.toDouble
    val members = graft.sources.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cellOf(v: Array[Double]): Int =
      (0 until AnnOps.NCells).maxBy { c =>
        ((0 until AnnOps.Dim).map(i => v(i) * AnnOps.centroidCoef(c, i).toDouble).sum, -c)
      }
    val byCell = members.groupBy(m => cellOf(m._2))
    for ((c, ms) <- byCell; i <- 0 until AnnOps.Dim) {
      val mean = ms.map(_._2(i)).sum / ms.length
      val got = updated((c, i.toLong))._2
      assert(math.abs(got - mean) <= eps, s"cell $c dim $i mean off by ${got - mean}")
      assert(updated((c, i.toLong))._1 == ms.length.toLong, s"cell $c count")
    }
  }

  test("vocab_coverage is consistent with vocab_topk membership") {
    import org.apache.spark.sql.functions._
    val vocab = TextOps.vocabTopk(spark, Sf).collect().map(_.getString(1)).toSet
    val toks = graft.sources.Tables.documents(spark, Sf)
      .select(col("source"), col("text")).collect()
      .flatMap(r => if (r.isNullAt(1)) Nil
        else r.getString(1).split(" ", -1).toSeq.map(t => (r.getString(0), t)))
    val expected = toks.groupBy(_._1).map { case (src, xs) =>
      src -> (xs.length.toLong, xs.count(x => vocab(x._2)).toLong)
    }
    val got = TextOps.vocabCoverage(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected, "coverage counts differ from vocab-membership recompute")
  }

  test("epoch_plan allocation is an exact integer recompute") {
    import org.apache.spark.sql.functions._
    val rows = MixOps.epochPlan(spark, Sf).collect()
    val tokens = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    val weights = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    val total = tokens.values.sum
    val wsum = weights.values.sum
    for (r <- rows) {
      val (src, tk, w) = (r.getString(0), r.getLong(2), r.getLong(3))
      val desired = (total * MixOps.EpochBudgetMul) * w / wsum
      assert(r.getLong(4) == desired, s"$src desired")
      val epochs = if (tk > 0) math.min(MixOps.MaxEpochs, (desired + tk - 1) / tk) else 0L
      assert(r.getLong(5) == epochs, s"$src epochs")
      val served = if (epochs > 0) math.min(desired, epochs * tk) else 0L
      assert(r.getLong(6) == served, s"$src served")
      assert(epochs >= 0 && epochs <= MixOps.MaxEpochs)
      assert(served <= desired)
    }
    // the plan must actually exercise the multi-epoch regime
    assert(rows.exists(_.getLong(5) > 1), "no source repeats — budget too small to test epochs")
  }

  test("session_window_agg equals a sequential >= gap-rule recompute") {
    import org.apache.spark.sql.functions._
    val ev = EventOps.queries("sessionize")(spark, Sf) // event_id, user_id, ts_us, session_idx
      .select(col("user_id"), col("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byUser = ev.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val expected = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    for ((u, ts) <- byUser) {
      var start = ts.head; var last = ts.head; var n = 0L
      for (t <- ts) {
        if (t - last >= EventOps.GapUs) {
          expected += ((u, start, last + EventOps.GapUs, n))
          start = t; n = 0L
        }
        last = t; n += 1
      }
      expected += ((u, start, last + EventOps.GapUs, n))
    }
    val got = EventOps.sessionWindowAgg(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected.toSet, "session_window sessions differ from >= recompute")
  }

  test("sliding_window_counts replicates each event into exactly window/slide windows") {
    val rows = EventOps.slidingWindowCounts(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nEvents = graft.sources.Tables.events(spark, Sf).count()
    assert(rows.map(_._3).sum == (EventOps.WinUs / EventOps.SlideUs) * nEvents,
      "window memberships must total windows-per-event x events")
    for ((st, en, _) <- rows) {
      assert(en - st == EventOps.WinUs, "window length")
      assert(st % EventOps.SlideUs == 0, "window aligned to the slide grid")
    }
  }

  test("streaming sliding counts equal the batch sliding windows") {
    val batch = sortedRows(EventOps.slidingWindowCounts(spark, Sf))
    val stream = sortedRows(graft.streaming.StreamingSlidingCounts.run(spark, Sf))
    assert(stream == batch, "streaming sliding windows differ from batch")
  }

  test("streaming db_upsert equals the batch keep-last table") {
    val batch = MergeOps.dbUpsert(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    val got = graft.streaming.StreamingUpsert.run(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got == batch, "streaming latest-view differs from batch keep-last")
    // one row per key — the single-batch changelog is the snapshot
    assert(got.size == got.map(_._1).size, "duplicate keys in the changelog")
  }

  test("im_melt round-trips the pivot losslessly on defined cells") {
    import org.apache.spark.sql.functions._
    val melted = MergeOps.imMelt(spark, Sf).collect()
      .map(r => ((r.getLong(0), r.get(1), r.getString(2)), r.getDouble(3))).toMap
    val wide = MergeOps.imPivot(spark, Sf).collect()
    var cells = 0
    for (r <- wide; (chan, idx) <- Seq(("HN", 2), ("BN", 3)) if !r.isNullAt(idx)) {
      cells += 1
      val k = (r.getLong(0), r.get(1), chan)
      assert(melted.get(k).contains(r.getDouble(idx)), s"cell $k lost or changed")
    }
    assert(melted.size == cells, "melt emitted extra rows")
  }

  test("dedup_normalized collapses case/punct/space variants onto one canonical doc") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_norm").toString
    val base = graft.sources.Tables.documents(spark, Sf).limit(10)
    // three trivially-variant re-hosts of one text + a NULL doc
    val t = "The quick  Brown FOX, jumps!"
    val variants = Seq(
      (3000000L, t), (3000001L, "the quick brown fox jumps"),
      (3000002L, "THE QUICK BROWN: fox jumps?"), (3000003L, null))
    val extra = spark.createDataFrame(
        spark.sparkContext.parallelize(variants.map {
          case (id, tx) => org.apache.spark.sql.Row(id, tx) }),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType))))
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("synthetic").as("source"), lit(0L).as("n_chars"))
    base.unionByName(extra).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.dedupNormalized(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val variantRows = Seq(3000000L, 3000001L, 3000002L).map(rows)
    assert(variantRows.map(_.getString(1)).distinct.length == 1,
      "variants must share one normalized hash")
    assert(variantRows.count(_.getBoolean(3)) == 1,
      "exactly one canonical per normalized class")
    assert(variantRows.find(_.getBoolean(3)).get.getLong(0) == 3000000L,
      "lowest doc_id wins")
    assert(rows(3000003L).isNullAt(1), "NULL text keeps NULL hash")
  }

  test("multimodal_dedup canonical flags match a byte-level recompute") {
    import org.apache.spark.sql.functions._
    val texts = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getString(1))))
    val canonical = texts.groupBy(_._2).view.mapValues(_.map(_._1).min).values.toSet
    val got = MultiModalOps.multimodalDedup(spark, Sf).collect()
    assert(got.length == texts.length, "every doc keeps a row")
    for (r <- got) {
      val (id, isC) = (r.getLong(0), r.getBoolean(r.fieldIndex("is_canonical")))
      assert(isC == canonical.contains(id), s"doc $id canonical flag")
      val t = texts.toMap.apply(id)
      val nb = r.getLong(r.fieldIndex("n_bytes"))
      t match {
        case Some(s) => assert(nb == s.getBytes("UTF-8").length.toLong, s"doc $id n_bytes")
        case None => assert(r.isNullAt(r.fieldIndex("bhash")), s"doc $id NULL blob hash")
      }
    }
  }

  test("BucketedSink co-located join plans with zero exchanges") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("source"), col("lang"))
    val toks = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok"))
    graft.sources.BucketedSink.writeBucketed(docs, "b_docs", "doc_id", 4)
    graft.sources.BucketedSink.writeBucketed(toks, "b_toks", "doc_id", 4)
    val broadcastOff = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = graft.sources.BucketedSink.coLocatedJoin(spark, "b_docs", "b_toks", "doc_id")
      assert(j.count() == docs.count(), "co-located join lost rows")
      val plan = j.queryExecution.executedPlan.toString
      // the headline win: NO Exchange — the shuffle was paid once at
      // write time. (A per-partition Sort remains: since Spark 3 the
      // bucketed scan does not advertise in-bucket order by default —
      // spark.sql.legacy.bucketedTableScan.outputOrdering — and the
      // in-memory partition sort is cheap and network-free next to the
      // exchange it replaces.)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan must recognize the bucketed layout:\n$plan")
      // same result as the plain (shuffling) join
      val plain = docs.join(toks, Seq("doc_id"))
      assert(sortedRows(j) == sortedRows(plain), "bucketed join result differs")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastOff)
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_toks")
    }
  }

  test("token_histogram buckets partition the corpus") {
    import org.apache.spark.sql.functions._
    val rows = TextOps.tokenHistogram(spark, Sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, Sf).count()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_docs"))).sum == nDocs,
      "bucket doc counts must sum to the corpus size")
    for (r <- rows if !r.isNullAt(r.fieldIndex("bucket"))) {
      val (b, lo) = (r.getLong(r.fieldIndex("bucket")), r.getLong(r.fieldIndex("bucket_lo")))
      assert(lo == (1L << b), s"bucket_lo mismatch at $b")
      val sum = r.getLong(r.fieldIndex("sum_tokens"))
      val n = r.getLong(r.fieldIndex("n_docs"))
      assert(sum >= n * lo && sum < n * lo * 2, s"bucket $b sum out of [n*lo, n*2lo)")
    }
  }

  test("dedup_cross_source totals equal the verified pair count") {
    import org.apache.spark.sql.functions._
    val verified = TextOps.ngramJaccard(spark, Sf)
      .filter(col("jacc") >= TextOps.JaccT).count()
    val rows = TextOps.dedupCrossSource(spark, Sf).collect()
    assert(rows.map(_.getLong(rows.head.fieldIndex("n_pairs"))).sum == verified,
      "per-source-pair counts must sum to the verified near-dup pair count")
    for (r <- rows) {
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a <= b, s"source pair not canonically ordered: $a / $b")
      assert(r.getBoolean(r.fieldIndex("cross_source")) == (a != b))
    }
  }

  test("dup_cluster_sizes is the exact size distribution of dup_clusters") {
    val labels = TextOps.dupClusters(spark, Sf).collect()
      .map(r => r.getLong(1))
    val expected = labels.groupBy(identity).values.map(_.length.toLong)
      .groupBy(identity).map { case (sz, xs) => sz -> xs.size.toLong }
    val got = TextOps.dupClusterSizes(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "size histogram differs from label recompute")
  }

  test("event_cube margins are mutually consistent") {
    val rows = EventOps.eventCube(spark, Sf).collect().map { r =>
      (if (r.isNullAt(0)) null else r.getString(0),
        if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)),
        r.getLong(2), r.getLong(3), r.getLong(4))
    }
    val detail = rows.filter(_._3 == 0L)
    val byType = rows.filter(_._3 == 1L) // hod rolled up
    val byHod  = rows.filter(_._3 == 2L) // type rolled up
    val total  = rows.filter(_._3 == 3L)
    assert(total.length == 1)
    assert(detail.map(_._4).sum == total.head._4, "detail counts vs grand total")
    assert(byType.map(_._4).sum == total.head._4, "type margin vs grand total")
    assert(byHod.map(_._4).sum == total.head._4, "hod margin vs grand total")
    for ((t, _, _, n, c) <- byType) {
      val d = detail.filter(_._1 == t)
      assert(d.map(_._4).sum == n && d.map(_._5).sum == c, s"type $t margin")
    }
  }

  test("bm25_topk equals a plain-Scala BM25 recompute") {
    import org.apache.spark.sql.functions._
    val texts = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => if (r.isNullAt(1)) None else Some(r.getLong(0) -> r.getString(1)))
    val toks = texts.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = toks.size.toLong
    val avgdl = toks.values.map(_.length.toLong).sum.toDouble / n.toDouble
    val q = TextOps.BmQTerms
    val df = q.map(t => t -> toks.values.count(_.contains(t)).toLong).toMap
    def score(id: Long): Seq[Double] = q.map { t =>
      val tf = toks(id).count(_ == t).toLong
      if (tf == 0 || df(t) == 0) 0.0
      else (n.toDouble / df(t).toDouble) * (tf.toDouble * (TextOps.BmK1 + 1.0)) /
        (tf.toDouble + TextOps.BmK1 *
          (1.0 - TextOps.BmB + TextOps.BmB * toks(id).length.toDouble / avgdl))
    }
    val expected = toks.keys.toSeq
      .map(id => (id, score(id))).filter(_._2.sum > 0.0)
      .sortBy { case (id, s) => (-s.sum, id) }.take(TextOps.BmTopK)
    val got = TextOps.bm25Topk(spark, Sf).collect().sortBy(_.getLong(0))
    assert(got.length == math.min(TextOps.BmTopK, expected.length))
    for ((r, (id, s)) <- got.zip(expected)) {
      assert(r.getLong(1) == id, s"rank ${r.getLong(0)} doc mismatch")
      assert(math.abs(r.getDouble(2) - s.sum) < 1e-12, s"doc $id score")
    }
  }

  test("streaming funnel transitions equal the batch funnel unpivot") {
    import org.apache.spark.sql.functions._
    val batch = EventOps.eventFunnel(spark, Sf).collect().flatMap { r =>
      val u = r.getLong(r.fieldIndex("user_id"))
      def at(c: String): Option[Long] =
        if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getLong(r.fieldIndex(c)))
      at("first_view_us").map(t => (u, 1L, t)) ++
        at("first_click_us").map(t => (u, 2L, t)) ++
        at("first_purchase_us").map(t => (u, 3L, t))
    }.toSet
    val got = graft.streaming.StreamingFunnel.run(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch, "streaming transitions differ from batch funnel unpivot")
    // stage times are monotone per user
    for ((u, rs) <- got.groupBy(_._1)) {
      val byStage = rs.map(x => x._2 -> x._3).toMap
      for (s <- 2L to 3L if byStage.contains(s))
        assert(byStage(s - 1) <= byStage(s), s"user $u stage $s out of order")
    }
  }

  test("ann_pq_topk scores against the argmax-dot codebook reconstruction") {
    import org.apache.spark.sql.functions._
    val embs = graft.sources.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def recon(v: Array[Double]): Array[Double] =
      (0 until AnnOps.PqM).flatMap { m =>
        val sub = v.slice(m * AnnOps.PqDsub, (m + 1) * AnnOps.PqDsub)
        val best = (0 until AnnOps.PqK).maxBy { c =>
          val cent = (0 until AnnOps.PqDsub).map(i => AnnOps.pqCoef(m, c, i).toDouble)
          // (dot, -c): ties prefer the lowest code index
          (sub.zip(cent).map { case (a, b) => a * b }.sum, -c)
        }
        (0 until AnnOps.PqDsub).map(i => AnnOps.pqCoef(m, best, i).toDouble)
      }.toArray
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x * x))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x * x))
      d / (na * nb)
    }
    val out = AnnOps.annPqTopk(spark, Sf).collect()
    assert(out.nonEmpty)
    for (r <- out.take(50)) {
      val (q, v, sc) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      val expect = cos(embs(q), recon(embs(v)))
      assert(math.abs(sc - expect) < 1e-9, s"q=$q v=$v ADC score mismatch")
    }
    for ((q, rs) <- out.groupBy(_.getLong(0)))
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length).toSeq, s"q=$q ranks")
  }

  test("ann_ivf_pq_topk equals the plain-Scala IVF-pruned ADC recompute") {
    import org.apache.spark.sql.functions._
    val embs = graft.sources.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))
    def cent(c: Int): Array[Double] =
      (0 until AnnOps.Dim).map(i => AnnOps.centroidCoef(c, i).toDouble).toArray
    // argmax-dot cell, tie lowest cell
    def cellOf(v: Array[Double]): Int =
      (0 until AnnOps.NCells).maxBy(c => (dot(v, cent(c)), -c))
    // probed cells: top NProbe by (dot desc, c desc)
    def probed(q: Array[Double]): Set[Int] =
      (0 until AnnOps.NCells).sortBy(c => (-dot(q, cent(c)), -c))
        .take(AnnOps.NProbe).toSet
    def recon(v: Array[Double]): Array[Double] =
      (0 until AnnOps.PqM).flatMap { m =>
        val sub = v.slice(m * AnnOps.PqDsub, (m + 1) * AnnOps.PqDsub)
        val best = (0 until AnnOps.PqK).maxBy { c =>
          (dot(sub, (0 until AnnOps.PqDsub).map(i => AnnOps.pqCoef(m, c, i).toDouble).toArray), -c)
        }
        (0 until AnnOps.PqDsub).map(i => AnnOps.pqCoef(m, best, i).toDouble)
      }.toArray
    val cells = embs.map { case (id, v) => id -> cellOf(v) }
    val recons = embs.map { case (id, v) => id -> recon(v) }
    val expected = embs.keys.filter(_ % AnnOps.QMod == 0).flatMap { q =>
      val pc = probed(embs(q))
      val qn = nrm(embs(q))
      embs.keys.toSeq
        .filter(v => v != q && pc.contains(cells(v)) && nrm(recons(v)) > 0)
        .map(v => (v, dot(embs(q), recons(v)) / (qn * nrm(recons(v)))))
        .sortBy { case (v, sc) => (-sc, v) }
        .take(AnnOps.TopK).zipWithIndex
        .map { case ((v, sc), i) => (q, v, i + 1, sc) }
    }.toSet
    val got = AnnOps.annIvfPqTopk(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val gotKeys = got.map(t => (t._1, t._2, t._3)).toSet
    val expKeys = expected.map(t => (t._1, t._2, t._3))
    assert(gotKeys == expKeys, "IVF-pruned ADC (q, vec, rnk) set differs from recompute")
    val expScore = expected.map(t => (t._1, t._2) -> t._4).toMap
    for ((q, v, _, sc) <- got)
      assert(math.abs(sc - expScore((q, v))) < 1e-9, s"q=$q v=$v ADC score mismatch")
  }

  test("ann_sq_topk quantization is within the SQ8 half-step bound") {
    import org.apache.spark.sql.functions._
    // recompute the per-dim scales and check every reconstructed
    // element is within s_i / (2*127) of the original (the max error a
    // round-to-nearest int8 code can introduce), plus rank contiguity
    val embs = graft.sources.Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val dim = embs.head._2.length
    val scales = (0 until dim).map(i => embs.map(e => math.abs(e._2(i))).max)
    def recon(x: Array[Double]): Array[Double] =
      x.indices.map { i =>
        if (scales(i) > 0) math.round(x(i) / scales(i) * 127).toDouble * scales(i) / 127.0
        else 0.0
      }.toArray
    for ((_, v) <- embs.take(20); i <- 0 until dim) {
      val err = math.abs(recon(v)(i) - v(i))
      assert(err <= scales(i) / 254.0 + 1e-12, s"dim $i error $err exceeds half-step")
    }
    val out = AnnOps.annSqTopk(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    for ((q, rs) <- out.groupBy(_._1))
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq, s"q=$q ranks not contiguous")
  }

  test("ann_recall_report equals the overlap of the top-k operator outputs") {
    def keyset(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = keyset(AnnOps.annCosineTopk(spark, Sf))
    val l = keyset(AnnOps.annLshTopk(spark, Sf))
    val i = keyset(AnnOps.annIvfTopk(spark, Sf))
    val p = keyset(AnnOps.annPqTopk(spark, Sf))
    val ip = keyset(AnnOps.annIvfPqTopk(spark, Sf))
    val gw = keyset(AnnOps.annGraphSearch(spark, Sf))
    val gwr = keyset(AnnOps.annGraphSearchRefined(spark, Sf))
    val rep = AnnOps.annRecallReport(spark, Sf).collect()
    assert(rep.nonEmpty)
    for (r <- rep) {
      val q = r.getLong(r.fieldIndex("q_id"))
      val nTrue = r.getLong(r.fieldIndex("n_true"))
      val bq = b.filter(_._1 == q)
      assert(nTrue == bq.size, s"q=$q n_true")
      assert(r.getLong(r.fieldIndex("lsh_hits")) == (bq & l).size, s"q=$q lsh_hits")
      assert(r.getLong(r.fieldIndex("ivf_hits")) == (bq & i).size, s"q=$q ivf_hits")
      assert(r.getLong(r.fieldIndex("pq_hits")) == (bq & p).size, s"q=$q pq_hits")
      assert(r.getLong(r.fieldIndex("ivfpq_hits")) == (bq & ip).size, s"q=$q ivfpq_hits")
      assert(r.getLong(r.fieldIndex("gw_hits")) == (bq & gw).size, s"q=$q gw_hits")
      assert(r.getLong(r.fieldIndex("gwr_hits")) == (bq & gwr).size, s"q=$q gwr_hits")
      for (c <- Seq("lsh_recall", "ivf_recall", "pq_recall", "ivfpq_recall",
          "gw_recall", "gwr_recall")) {
        val v = r.getDouble(r.fieldIndex(c))
        assert(v >= 0.0 && v <= 1.0, s"q=$q $c bounds")
      }
    }
    // the point of the NN-descent round: the SAME walk over the
    // refined graph must not lose recall in aggregate (deterministic
    // fixed data — this is an invariant here, not a statistical hope)
    val gwHits = rep.map(_.getLong(rep.head.fieldIndex("gw_hits"))).sum
    val gwrHits = rep.map(_.getLong(rep.head.fieldIndex("gwr_hits"))).sum
    assert(gwrHits >= gwHits,
      s"refined-graph walk lost aggregate recall: $gwrHits < $gwHits")
  }

  test("graph_walk_sweep: monotone in beam, consistent with the recall report's gwr row") {
    // deterministic fixed data, so the curve is an invariant: a wider
    // beam explores a superset-shaped frontier — visited volume and
    // recall must be non-decreasing — and the beam = GraphBeam leg is
    // EXACTLY the gate walk, so its hits must equal the recall
    // report's refined-graph (gwr) total
    val sw = SparkEntry.queries("graph_walk_sweep")(spark, Sf).collect()
      .sortBy(_.getLong(0))
    assert(sw.map(_.getLong(0)).toSeq == AnnOps.WalkBeamGrid.map(_.toLong))
    val vols = sw.map(_.getLong(sw.head.fieldIndex("visited_rows")))
    val hits = sw.map(_.getLong(sw.head.fieldIndex("hits")))
    assert(vols.zip(vols.tail).forall { case (a, b) => b >= a },
      s"visited volume not non-decreasing in beam: ${vols.toSeq}")
    assert(hits.zip(hits.tail).forall { case (a, b) => b >= a },
      s"recall not non-decreasing in beam: ${hits.toSeq}")
    for (r <- sw) {
      assert(r.getLong(r.fieldIndex("hits")) <= r.getLong(r.fieldIndex("n_true_total")))
      assert(r.getLong(r.fieldIndex("recall_ppm")) ==
        r.getLong(r.fieldIndex("hits")) * 1000000L / r.getLong(r.fieldIndex("n_true_total")))
    }
    val gwrTotal = SparkEntry.queries("ann_recall_report")(spark, Sf).collect()
      .map(r => r.getLong(r.fieldIndex("gwr_hits"))).sum
    val gateLeg = sw.find(_.getLong(0) == AnnOps.GraphBeam.toLong).get
    assert(gateLeg.getLong(gateLeg.fieldIndex("hits")) == gwrTotal,
      "sweep's gate-beam leg hits != recall report gwr total")
  }

  test("knn_refine keeps per-vertex degree <= RefineK and never loses a better neighbor") {
    // each NN-descent round can only improve each vertex's neighbor
    // list: every round's candidates are a SUPERSET of its current
    // edges, so by induction over the NNDescentRounds rounds, per
    // src, rank for rank, the refined cosine must be >= the ORIGINAL
    // graph's cosine at the same rank, the list never shrinks, and
    // every (src, rnk) stays unique in 1..RefineK
    val g = AnnOps.annKnnGraph(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val rg = AnnOps.knnRefine(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rg.nonEmpty)
    assert(rg.forall(e => e._3 >= 1 && e._3 <= AnnOps.RefineK))
    assert(rg.map(e => (e._1, e._3)).distinct.length == rg.length, "duplicate (src, rnk)")
    val origBy = g.groupBy(_._1).map { case (s0, xs) =>
      s0 -> xs.sortBy(_._3).map(_._4) }
    val refBy = rg.groupBy(_._1).map { case (s0, xs) =>
      s0 -> xs.sortBy(_._3).map(_._4) }
    for ((s0, orig) <- origBy) {
      val ref = refBy.getOrElse(s0, Array.empty[Double])
      assert(ref.length >= orig.length, s"src=$s0 refined list shrank")
      for (k <- orig.indices)
        assert(ref(k) >= orig(k),
          s"src=$s0 rank ${k + 1}: refined cosine ${ref(k)} < original ${orig(k)}")
    }
  }

  test("graph-walk recall rises with seeds/beam/depth and the default variant is the gate query") {
    // deterministic on this fixed dataset (no randomness anywhere in
    // the walk), so the measured ordering is a stable invariant, not
    // a statistical one. Pins annGraphSearchWith as the tuning
    // surface SURVEY §5's curve was measured from.
    def keyset(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = keyset(AnnOps.annCosineTopk(spark, Sf))
    val narrow = keyset(AnnOps.annGraphSearchWith(spark, Sf,
      AnnOps.GraphSeeds, AnnOps.GraphBeam, AnnOps.WalkRounds))
    val wide = keyset(AnnOps.annGraphSearchWith(spark, Sf, 8, 16, 5))
    assert(narrow == keyset(AnnOps.annGraphSearch(spark, Sf)),
      "default-parameter walk must equal the gate query")
    assert((wide & brute).size >= (narrow & brute).size,
      "wider/deeper walk lost recall vs the default on fixed data")
  }

  test("ann_graph_search equals a plain-Scala beam-walk recompute") {
    // independent sequential re-walk: same entry points (r17 IVF
    // seeding — per query, the GraphSeeds hash-rank-smallest members
    // of its nearest coarse cell ∪ the global hash-rank seeds), same
    // per-round beam ranking / edge expansion / exact-cosine
    // scoring, over the operator's OWN persisted edge table (the graph
    // build has its own oracle + specs) — pins the walk semantics:
    // entry rule, frontier selection, visited-set growth, final top-K.
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val nrm = emb.map { case (k, v) => k -> math.sqrt(dot(v, v)) }
    val adj = AnnOps.annKnnGraph(spark, Sf).select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (s0, xs) => s0 -> xs.map(_._2).toSeq }
    val gseeds = emb.keys.toSeq
      .sortBy(id => (scalaH60(s"$id:${AnnOps.GraphSeedSalt}"), id)).take(AnnOps.GraphSeeds)
    // coarse-quantizer routing for the cell seeds: vector assignment
    // ties break to the LOWEST cell (assignCells), query probe ties
    // to the HIGHEST (probeCellsTable) — both pinned here
    val cents = (0 until AnnOps.NCells).map(c =>
      c -> (0 until 64).map(i => AnnOps.centroidCoef(c, i).toDouble).toArray).toMap
    def dotC(e: Array[Float], c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < e.length) { acc += e(i).toDouble * c(i); i += 1 }
      acc
    }
    val vcell = emb.map { case (id, e) =>
      id -> (0 until AnnOps.NCells).maxBy(c => (dotC(e, cents(c)), -c)) }
    val cellSeeds = vcell.groupBy(_._2).map { case (c, xs) =>
      c -> xs.keys.toSeq
        .sortBy(id => (scalaH60(s"$id:${AnnOps.GraphSeedSalt}"), id))
        .take(AnnOps.GraphSeeds) }
    val expected = scala.collection.mutable.Map[(Long, Long), (Int, Double)]()
    for (q <- emb.keys.toSeq.filter(_ % AnnOps.QMod == 0)) {
      val qe = emb(q); val qn = nrm(q)
      val qc = (0 until AnnOps.NCells).maxBy(c => (dotC(qe, cents(c)), c))
      val seeds = (cellSeeds.getOrElse(qc, Seq.empty) ++ gseeds).distinct
      val visited = scala.collection.mutable.Map[Long, Double]()
      for (s0 <- seeds) visited(s0) = dot(qe, emb(s0)) / (qn * nrm(s0))
      for (_ <- 1 to AnnOps.WalkRounds) {
        val frontier = visited.toSeq.sortBy { case (id, c) => (-c, id) }
          .take(AnnOps.GraphBeam).map(_._1)
        val cands = frontier.flatMap(f => adj.getOrElse(f, Seq.empty))
          .distinct.filterNot(visited.contains)
        for (c <- cands) visited(c) = dot(qe, emb(c)) / (qn * nrm(c))
      }
      for (((id, c), k) <- visited.toSeq.filter(_._1 != q)
             .sortBy { case (id, c) => (-c, id) }.take(AnnOps.TopK).zipWithIndex)
        expected((q, id)) = (k + 1, c)
    }
    val got = AnnOps.annGraphSearch(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getDouble(3))).toMap
    assert(got.nonEmpty)
    assert(got.keySet == expected.keySet, "result (q_id, vec_id) set mismatch")
    for ((k, (rnk, cos)) <- expected) {
      assert(got(k)._1 == rnk, s"$k rank mismatch")
      assert(got(k)._2 == cos, s"$k cosine mismatch")
    }
  }

  test("unigram_lm_train and unigram_fertility equal a sequential Viterbi-EM recompute") {
    // independent sequential recompute of the WHOLE fit — seed
    // substring counts, UniRounds of Viterbi-EM (identical float op
    // order and tie rules: max by (score, piece-length)), the
    // char-preserving prune — plus the BPE merge recompute to check
    // the fertility comparison. This spec IS the exactness gate for
    // the family (float-EM keeps it rows-only at the driver oracle).
    val docRows = spark.read.parquet(s"$Sf/documents.parquet").select("text").collect()
    val words = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for (r <- docRows; if !r.isNullAt(0); w <- r.getString(0).split(" ", -1); if w.nonEmpty)
      words(w) += 1
    val sub = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 1 to math.min(TextOps.UniMaxPiece, w.length - i))
      sub(w.substring(i, i + l)) += c
    val chars = sub.keys.filter(_.length == 1).toSet
    // the whole fit as a function of the size knobs, so the SAME
    // recompute pins both the gate-default fit and the parameterized
    // (uniVocabFor-derived) path at a non-default size
    def fitRecompute(seedK: Int, vocabK: Int): (Seq[(String, Long)], Map[String, Seq[String]]) = {
      val seedTop = sub.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedK)
      var vocab: Seq[(String, Long)] =
        (seedTop ++ sub.toSeq.filter(x => chars(x._1))).distinct
      var lastSeg: Map[String, Seq[String]] = Map.empty
      for (_ <- 1 to TextOps.UniRounds) {
        val tot = vocab.map(_._2 + 1).sum.toDouble
        val logp = vocab.map { case (p, c) => p -> math.log((c + 1).toDouble / tot) }.toMap
        def viterbi(w: String): Seq[String] = {
          val n = w.length
          val sc = Array.fill(n + 1)(0.0)
          val bp = Array.fill(n + 1)(0)
          for (i <- 1 to n) {
            val cands = for (l <- 1 to math.min(TextOps.UniMaxPiece, i)) yield
              (sc(i - l) + logp.getOrElse(w.substring(i - l, i), -1e18), l)
            val mx = cands.max // lexicographic: best score, then LONGER piece
            sc(i) = mx._1; bp(i) = mx._2
          }
          val ps = scala.collection.mutable.ListBuffer[String]()
          var pos = n
          while (pos > 0) { val l = bp(pos); ps.prepend(w.substring(pos - l, pos)); pos -= l }
          ps.toSeq
        }
        val segs = words.keys.map(w => w -> viterbi(w)).toMap
        val counts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
        for ((w, ps) <- segs; p <- ps) counts(p) += words(w)
        val top = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabK)
        val keptChars = chars.toSeq.sorted.map(c => c -> counts.getOrElse(c, 0L))
          .filterNot { case (c, _) => top.exists(_._1 == c) }
        vocab = (top ++ keptChars).sortBy { case (p, c) => (-c, p) }
        lastSeg = segs
      }
      (vocab, lastSeg)
    }
    val (vocab, lastSeg) = fitRecompute(TextOps.UniSeedK, TextOps.UniVocabK)
    val got = TextOps.unigramLmTrain(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.length == got.toSet.size)
    val expVocab = vocab.map { case (p, c) => (p, c, p.length.toLong) }
    assert(got.toSet == expVocab.toSet, "final unigram vocab mismatch vs recompute")
    // the parameterized fit at a NON-DEFAULT size (derived from the
    // corpus type count via the documented uniVocabFor rule, floor
    // lowered so the fixture actually exercises a different size)
    val nTypes = words.size.toLong
    val vk = math.max(40, math.min(TextOps.uniVocabFor(nTypes, mul = 1), 100))
    val sk = vk * 5 / 2
    assert(vk != TextOps.UniVocabK, "fixture-derived size accidentally equals the default")
    val (expSized, _) = fitRecompute(sk, vk)
    val gotSized = TextOps.uniFitSized(spark, Sf, sk, vk)._1
    assert(gotSized == expSized, s"parameterized fit ($sk, $vk) mismatch vs recompute")
    // BPE n_syms per word (same sequential recompute as the bpe spec)
    var seqs: Map[String, String] =
      words.keys.map(w => w -> w.map(c => s"$c~").mkString).toMap
    for (_ <- 1 to TextOps.BpeMerges) {
      val pc = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((w, sq) <- seqs) {
        val syms = sq.split("~", -1).dropRight(1)
        for (i <- 0 until syms.length - 1) pc(syms(i) + " " + syms(i + 1)) += words(w)
      }
      if (pc.nonEmpty) {
        val (pair, _) = pc.toSeq.sortBy { case (p, c) => (-c, p) }.head
        val Array(a, b) = pair.split(" ", 2)
        val (pat, rep) = (s"~$a~$b~", s"~$a$b~")
        seqs = seqs.map { case (w, sq) =>
          w -> ("~" + sq).replace(pat, rep).replace(pat, rep).substring(1)
        }
      }
    }
    val nWords = words.values.sum
    val uniPieces = words.map { case (w, c) => c * lastSeg(w).length }.sum
    val bpeSyms = words.map { case (w, c) =>
      c * (seqs(w).split("~", -1).length - 1) }.sum
    val fr = TextOps.unigramFertility(spark, Sf).collect()
    assert(fr.length == 1)
    val r = fr(0)
    assert(r.getLong(r.fieldIndex("n_words")) == nWords)
    assert(r.getLong(r.fieldIndex("uni_pieces")) == uniPieces, "uni_pieces mismatch")
    assert(r.getLong(r.fieldIndex("bpe_syms")) == bpeSyms, "bpe_syms mismatch")
    assert(r.getLong(r.fieldIndex("uni_fertility_ppm")) == uniPieces * 1000000L / nWords)
    assert(r.getLong(r.fieldIndex("bpe_fertility_ppm")) == bpeSyms * 1000000L / nWords)
  }

  test("bpe_pair_counts equals a plain-Scala adjacent-pair recompute") {
    import org.apache.spark.sql.functions._
    val texts = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap(r => if (r.isNullAt(1)) None else Some(r.getLong(0) -> r.getString(1)))
    val pairRows = texts.flatMap { case (id, t) =>
      val tk = t.split(" ", -1)
      tk.sliding(2).filter(_.length == 2).map(p => (id, p.mkString(" ")))
    }
    val cnt = pairRows.groupBy(_._2).map { case (p, xs) =>
      (p, xs.length.toLong, xs.map(_._1).distinct.length.toLong) }.toSeq
    val expected = cnt.sortBy { case (p, c, _) => (-c, p) }.take(TextOps.BpeK)
    val got = TextOps.bpePairCounts(spark, Sf).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq, "top-K pair statistics differ from recompute")
  }

  test("sample_reservoir keeps exactly the K hash-smallest docs per source") {
    import org.apache.spark.sql.functions._
    val all = graft.sources.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("source"),
        graft.functions.Portable.h60(
          concat(col("doc_id").cast("string"), lit(":" + TextOps.ReservoirSalt))).as("u"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = all.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      xs.sortBy(x => (x._3, x._1)).take(TextOps.ReservoirK).toSeq
    }.map(x => (x._1, x._2)).toSet
    val got = TextOps.sampleReservoir(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expected, "reservoir membership differs from hash-rank recompute")
    // every stratum is exactly min(K, n) — a fixed-SIZE sample
    val bySrc = got.groupBy(_._2).view.mapValues(_.size).toMap
    for ((src, xs) <- all.groupBy(_._2))
      assert(bySrc.getOrElse(src, 0) == math.min(TextOps.ReservoirK, xs.length), s"$src size")
  }

  test("rare_token_ratio bounds and NULL-text behavior") {
    import org.apache.spark.sql.functions._
    // fixture with a NULL-text doc: the report must keep it as NULLs
    val dir = java.nio.file.Files.createTempDirectory("graft_rare").toString
    val base = graft.sources.Tables.documents(spark, Sf).limit(30)
    val extra = spark.range(1).select(
      lit(2000000L).as("doc_id"), lit(null).cast("string").as("text"),
      lit("en").as("lang"), lit("synthetic").as("source"), lit(0L).as("n_chars"))
    base.unionByName(extra).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.rareTokenRatio(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 31, "every doc must keep a row")
    val nd = rows(2000000L)
    assert(nd.getLong(nd.fieldIndex("n_tokens")) == 0L)
    assert(nd.isNullAt(nd.fieldIndex("rare_ratio")), "NULL-text doc must carry NULL ratio")
    for ((_, r) <- rows if !r.isNullAt(r.fieldIndex("rare_ratio"))) {
      val (n, k) = (r.getLong(r.fieldIndex("n_tokens")), r.getLong(r.fieldIndex("n_rare")))
      assert(k >= 0 && k <= n, s"n_rare out of bounds: $k / $n")
    }
  }

  /** Shared plain-Scala replica of the events projection the four
    * round-11 event reports run on. */
  private def plainEvents(): Array[(Long, Long, String, Long, Long)] = {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, Sf)
    ev.select(col("event_id"), col("user_id"), col("event_type"),
        EventOps.tsUs(ev.schema("ts").dataType).as("ts_us"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
  }

  test("retention_cohorts matches a plain-Scala first-day recomputation") {
    val evs = plainEvents()
    val days = evs.map(e => (e._2, e._4 / EventOps.DayUs)).distinct
    val first = days.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val expected = days.groupBy { case (u, d) => (first(u), d - first(u)) }
      .map { case (k, vs) => k -> vs.length.toLong }
    val got = EventOps.retentionCohorts(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected, "cohort matrix differs from recompute")
    // every user shows up at offset 0 of their own cohort
    assert(expected.keys.forall(_._2 >= 0), "negative day offset")
  }

  test("markov_transitions matches a plain-Scala recomputation, ppm sums near 1e6") {
    val evs = plainEvents()
    val pairs = evs.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val o = es.sortBy(e => (e._4, e._1)).map(_._3)
      o.zip(o.drop(1))
    }
    val n = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val totals = n.groupBy(_._1._1).map { case (src, m) => src -> m.values.sum }
    val expected = n.map { case ((a, b), c) => (a, b) -> (c, c * 1000000L / totals(a)) }
    val got = EventOps.markovTransitions(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == expected, "transition matrix differs from recompute")
    // integer-floor ppm shares must sum to within n_dst of 1e6 per source
    for ((src, m) <- got.groupBy(_._1._1)) {
      val s = m.values.map(_._2).sum
      assert(s <= 1000000L && s > 1000000L - m.size, s"$src ppm sum $s out of range")
    }
  }

  test("session_paths matches a plain-Scala gap-rule path recomputation") {
    val evs = plainEvents()
    val paths = evs.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val o = es.sortBy(e => (e._4, e._1))
      val sess = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.empty[String]; var last = Long.MinValue
      for ((_, _, t, ts, _) <- o) {
        if (last != Long.MinValue && ts - last > EventOps.GapUs) { sess += cur.reverse; cur = Nil }
        cur = t :: cur; last = ts
      }
      if (cur.nonEmpty) sess += cur.reverse
      sess.map(_.mkString(">"))
    }
    val expected = paths.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = EventOps.sessionPaths(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected, "path histogram differs from recompute")
  }

  test("scd2_build versions partition each user timeline half-open") {
    val got = EventOps.scd2Build(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getBoolean(6)))
    val evs = plainEvents()
    assert(got.length == evs.length, "one version row per changelog event")
    for ((_, vs) <- got.groupBy(_._1)) {
      val o = vs.sortBy(_._3)
      assert(o.map(_._3).toSeq == (1L to o.length).toSeq, "version_idx not contiguous from 1")
      for (Array(a, b) <- o.sliding(2).map(_.toArray) if o.length > 1) {
        assert(a._6.contains(b._5), "valid_to must equal the next version's valid_from")
        assert(!a._7, "only the last version may be current")
      }
      assert(o.last._6.isEmpty && o.last._7, "last version must be open and current")
    }
    // exact values: each version row carries its own event's cents
    val cents = evs.map(e => e._1 -> e._5).toMap
    assert(got.forall(v => cents(v._2) == v._4), "cents mismatch vs changelog")
  }

  test("triangle_count matches a plain-Scala wedge-closure recomputation") {
    import org.apache.spark.sql.functions.col
    val edges = AnnOps.annKnnGraph(spark, Sf)
      .filter(col("cosine") >= AnnOps.SemClusterCosT)
      .select("src", "dst").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .distinct
    val eset = edges.toSet
    val byU = edges.groupBy(_._1)
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- edges; (_, c) <- byU.getOrElse(b, Array.empty[(Long, Long)])
         if eset((a, c))) {
      triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
    }
    val ids = graft.sources.Tables.embeddings(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0))
    val expected = ids.map(v => v -> triCount(v)).toMap
    val got = graft.operators.GraphOps.triangleCount(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, "per-vertex triangle counts differ from recompute")
    assert(got.values.sum > 0, "graph produced no triangles — nothing exercised")
  }

  test("pagerank_knn matches a plain-Scala fixed-point recomputation") {
    import org.apache.spark.sql.functions.col
    val dir = AnnOps.annKnnGraph(spark, Sf)
      .filter(col("cosine") >= AnnOps.SemClusterCosT)
      .select("src", "dst").collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .distinct
    val se = (dir ++ dir.map(e => (e._2, e._1))).toSeq
    val deg = se.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val ids = graft.sources.Tables.embeddings(spark, Sf)
      .select("vec_id").collect().map(_.getLong(0))
    def iter(r: Map[Long, Long]): Map[Long, Long] = {
      val in = se.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      ids.map(v => v -> (150000L + 85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    val r1 = iter(ids.map(_ -> 1000000L).toMap)
    val r2 = iter(r1)
    val got = graft.operators.GraphOps.pagerankKnn(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == ids.map(v => v -> (r1(v), r2(v))).toMap,
      "fixed-point pagerank differs from recompute")
    assert(got.values.map(_._2).toSet.size > 1, "all ranks equal — no structure exercised")
  }

  test("distinct_kmv: exact path below K, sketch kth-min exact, estimate sane") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, Sf)
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // recompute the k-th smallest distinct hash with the engine's own
    // portable hash column (the spec pins selection, the oracle pins
    // the hash function itself)
    val hashes = ev.select(col("event_type"),
        graft.functions.Portable.h60(concat(lit("kmv:"), col("user_id").cast("string"))).as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val got = graft.operators.SketchOps.distinctKmv(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == exact.keySet)
    for ((t, nKept, kth, est) <- got) {
      val hs = hashes.filter(_._1 == t).map(_._2).sorted
      val k = math.min(graft.operators.SketchOps.KmvK, hs.length).toLong
      assert(nKept == k, s"$t kept $nKept of expected $k")
      assert(kth == hs(k.toInt - 1), s"$t kth-min hash mismatch")
      if (exact(t) < graft.operators.SketchOps.KmvK)
        assert(est == exact(t).toDouble, s"$t small-group path must be exact")
      else
        assert(est > exact(t) * 0.5 && est < exact(t) * 2.0,
          s"$t estimate $est implausible vs exact ${exact(t)}")
    }
  }

  test("power_iteration matches a plain-Scala fixed-point Gram product") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    def rnd(x: Double, s: Long): Long =
      new JBD(x).multiply(new JBD(s)).setScale(0, RoundingMode.HALF_UP).longValueExact()
    val vecs = graft.sources.Tables.embeddings(spark, Sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val S = AnnOps.PowScale
    val exp = Array.fill(64)(0L)
    for (x <- vecs) {
      val d = rnd(x.foldLeft(0.0)(_ + _), S) // dot with all-ones = sequential sum
      for (i <- x.indices) exp(i) += rnd(x(i), S) * d
    }
    val got = AnnOps.powerIteration(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(got.length == 64)
    for ((i, n, w, wm) <- got) {
      assert(n == vecs.length.toLong)
      assert(w == exp(i.toInt), s"dim $i scaled sum mismatch")
      assert(wm == (w.toDouble / (S * S).toDouble) / n.toDouble)
    }
  }

  test("quantile_bins matches a plain-Scala ntile recomputation") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.toSeq.groupBy(_._2).flatMap { case (_, ds) =>
      val o = ds.sortBy(d => (d._3, d._1))
      val n = o.length; val q = n / 10; val r = n % 10
      // SQL ntile: first r buckets get q+1 rows, the rest q
      o.zipWithIndex.map { case (d, i) =>
        val bucket =
          if (i < r * (q + 1)) i / (q + 1) + 1
          else r + (i - r * (q + 1)) / math.max(q, 1) + 1
        d._1 -> bucket.toLong
      }
    }.toMap
    val got = TextOps.quantileBins(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == expected, "decile assignment differs from ntile recompute")
  }

  test("anomaly_zscore matches recompute and flags a planted outlier") {
    import org.apache.spark.sql.functions._
    // synthetic events dir with a planted fat-finger value
    val dir = java.nio.file.Files.createTempDirectory("graft_anom").toString
    val base = graft.sources.Tables.events(spark, Sf)
    val spike = base.limit(1).select(lit(999999L).as("event_id"), col("ts"),
      col("user_id"), lit("purchase").as("event_type"),
      lit(1.0e6).as("value"), col("props"))
    base.unionByName(spike).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.anomalyZscore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    // exact recompute with integer stats + identical double comparison
    val stats = out.groupBy(_._2).map { case (t, es) =>
      t -> (es.length.toLong, es.map(_._3).sum, es.map(e => e._3 * e._3).sum)
    }
    for ((_, t, x, flag) <- out) {
      val (n, sc, sq) = stats(t)
      val lhs = (n.toDouble * x.toDouble - sc.toDouble) * (n.toDouble * x.toDouble - sc.toDouble)
      val rhs = 9.0 * (n.toDouble * sq.toDouble - sc.toDouble * sc.toDouble)
      assert(flag == (lhs > rhs), s"flag mismatch for event type $t value $x")
    }
    assert(out.exists(e => e._1 == 999999L && e._4), "planted outlier not flagged")
    assert(out.count(_._4) < out.length / 10, "outliers must be rare")
  }

  test("vocab_oov_rate ties out against vocab_topk membership") {
    val vocab = TextOps.vocabTopk(spark, Sf).collect().map(_.getString(1)).toSet
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("source", "text").collect()
      .flatMap(r => Option(r.getString(1)).map(t => r.getString(0) -> t))
    val exp = docs.groupBy(_._1).map { case (src, ds) =>
      val toks = ds.flatMap(_._2.split(" ", -1))
      src -> ((toks.length.toLong, toks.count(t => !vocab.contains(t)).toLong))
    }
    val got = TextOps.vocabOovRate(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == exp.keySet)
    for ((src, (n, oov)) <- exp) {
      val (gn, goov, gppm) = got(src)
      assert(gn == n && goov == oov, s"$src counts")
      assert(gppm == oov * 1000000L / n, s"$src ppm")
    }
  }

  test("lsh_band_sweep precision rises with rows per band; r=2 verified ties to dup pairs") {
    val rows = TextOps.lshBandSweep(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows.keySet == TextOps.LshSweepRs.map(_.toLong).toSet)
    for ((r, (b, cand, ver, ppm)) <- rows) {
      assert(b == TextOps.MinhashK / r, s"r=$r band count")
      assert(ver <= cand, s"r=$r verified bounded by candidates")
      assert(ppm == (if (cand > 0) ver * 1000000L / cand else 0L), s"r=$r ppm")
    }
    // monotonicity of the S-curve: more rows per band -> fewer (or
    // equal) candidates; precision must not degrade going 1 -> 4
    assert(rows(1L)._2 >= rows(2L)._2 && rows(2L)._2 >= rows(4L)._2,
      "candidate volume must shrink as rows-per-band grows")
    assert(rows(4L)._4 >= rows(1L)._4, "precision must not drop from r=1 to r=4")
  }

  test("quantile_hist_sketch brackets the exact quantiles from below within 2x") {
    import org.apache.spark.sql.functions.{col, expr}
    val cents = graft.sources.Tables.events(spark, Sf)
      .select(col("event_type"), expr("cast(round(value * 100) as bigint)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = cents.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    val got = graft.operators.SketchOps.quantileHistSketch(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), Seq(r.getLong(2), r.getLong(3), r.getLong(4)))))
      .toMap
    assert(got.keySet == byType.keySet)
    for ((t, vals) <- byType; ((q, lo)) <- graft.operators.SketchOps.HistQs.zip(got(t)._2)) {
      val n = vals.length
      assert(got(t)._1 == n.toLong, s"$t n")
      val exact = vals((n * q + 99) / 100 - 1) // ceil-rank order statistic
      if (exact <= 0) assert(lo == 0L, s"$t p$q non-positive bucket")
      else {
        assert(lo <= exact, s"$t p$q lower bound ($lo > $exact)")
        assert(exact < 2L * lo || lo == 0L, s"$t p$q within 2x ($lo vs $exact)")
      }
    }
  }

  test("minhash_recall_sample ties out against exact sample pairs and the banded verify") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
    def shset(t: String): Set[String] =
      if (t == null) Set.empty
      else {
        val tk = t.split(" ", -1)
        if (tk.length < TextOps.ShingleN) Set.empty
        else tk.sliding(TextOps.ShingleN).map(_.mkString(" ")).toSet
      }
    // fixed-SIZE hash-rank selection: the K smallest (h60, doc_id)
    val sample = docs.map { case (id, t) => (scalaH60(s"$id:${TextOps.RecallSalt}"), id, t) }
      .sortBy(x => (x._1, x._2)).take(TextOps.RecallSampleK)
      .map { case (_, id, t) => id -> shset(t) }
    assert(sample.length == math.min(TextOps.RecallSampleK, docs.length),
      "sample must be exactly K (or the whole corpus when smaller)")
    def jacc(a: Set[String], b: Set[String]): Double =
      (a & b).size.toDouble / (a | b).size.toDouble
    val truePairs = (for {
      (ia, sa) <- sample; (ib, sb) <- sample
      if ia < ib && jacc(sa, sb) >= TextOps.JaccT
    } yield (ia, ib)).toSet
    val sampleIds = sample.map(_._1).toSet
    // the banded-candidate verify, via the registered ngram_jaccard op
    val found = TextOps.ngramJaccard(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(t => t._3 >= TextOps.JaccT &&
        sampleIds.contains(t._1) && sampleIds.contains(t._2))
      .map(t => (t._1, t._2)).toSet
    assert(found.subsetOf(truePairs), "banding can only miss, never invent pairs")
    val r = TextOps.minhashRecallSample(spark, Sf).collect()
    assert(r.length == 1)
    val (gn, gt, gf, gp) = (r.head.getLong(0), r.head.getLong(1), r.head.getLong(2), r.head.getLong(3))
    assert(gn == sample.length.toLong, "sample size")
    assert(gt == truePairs.size.toLong, "true pair count")
    assert(gf == found.size.toLong, "found pair count")
    assert(gp == (if (gt > 0) gf * 1000000L / gt else 1000000L), "recall ppm")
  }

  test("lm_doc_score matches a plain-Scala Kneser-Ney per-doc recompute") {
    val rows = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
    def bigrams(t: String): Seq[(String, String)] =
      if (t == null) Seq.empty
      else { val tk = t.split(" ", -1)
        if (tk.length < 2) Seq.empty else tk.sliding(2).map(w => (w(0), w(1))).toSeq }
    val all = rows.flatMap { case (_, t) => bigrams(t) }
    val big = all.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cLeft = big.toSeq.groupBy(_._1._1).map { case (w, m) => w -> m.map(_._2).sum }
    val fanout = big.keys.toSeq.groupBy(_._1).map { case (w, ks) => w -> ks.length.toLong }
    val cont = big.keys.toSeq.groupBy(_._2).map { case (w, ks) => w -> ks.length.toLong }
    val nTypes = big.size.toLong
    val d = TextOps.KnDiscountPpm
    def pkn(w1: String, w2: String): Long = {
      val t1 = (big((w1, w2)) * 1000000L - d) / cLeft(w1)
      val lam = (d * fanout(w1)) / cLeft(w1)
      val pc = (cont(w2) * 1000000L) / nTypes
      t1 + (lam * pc) / 1000000L
    }
    val exp = rows.map { case (id, t) =>
      val bs = bigrams(t)
      if (bs.isEmpty) id -> ((0L, None: Option[Long], None: Option[Long]))
      else {
        val ps = bs.map { case (a, b) => pkn(a, b) }
        id -> ((bs.length.toLong, Some(ps.sum / bs.length), Some(ps.min)))
      }
    }.toMap
    val got = TextOps.lmDocScore(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got.keySet == exp.keySet, "one row per document, zero-bigram docs included")
    assert(got == exp, "per-doc KN scores differ from recompute")
    // the signal discriminates: not all docs share one score
    assert(got.values.flatMap(_._2).toSet.size > 1, "avg score is constant — vacuous signal")
  }

  test("bigram_lift matches a plain-Scala lift recompute over the bigram space") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("text").collect()
      .flatMap(r => Option(r.getString(0)))
    val bigrams = docs.flatMap { t =>
      val tk = t.split(" ", -1)
      if (tk.length < 2) Seq.empty else tk.sliding(2).map(w => (w(0), w(1))).toSeq
    }
    val big = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val left = big.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val right = big.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val n = big.values.sum
    val top = big.toSeq.sortBy { case ((w1, w2), c) => (-c, w1, w2) }.take(TextOps.LmK)
    val exp = top.zipWithIndex.map { case (((w1, w2), c), i) =>
      val lift = (BigInt(c) * n * 1000000 / (BigInt(left(w1)) * right(w2))).toLong
      (i + 1, w1, w2, c, left(w1), right(w2), lift)
    }.toSet
    val got = TextOps.bigramLift(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == exp, "bigram lift table differs from recompute")
  }

  test("data_split is a frozen pure function of doc_id with the advertised fractions") {
    val got = MixOps.dataSplit(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got.nonEmpty)
    for ((id, bucket, split) <- got) {
      val eb = scalaH60(s"$id:${MixOps.SplitSalt}") % MixOps.SplitMod
      assert(bucket == eb, s"doc $id bucket")
      val es = if (eb < MixOps.TestPct) "test" else if (eb < MixOps.ValPct) "val" else "train"
      assert(split == es, s"doc $id split")
    }
    // all three splits materialize and train dominates (loose bound:
    // binomial noise at the sf0.001 doc count stays well inside it)
    val bySplit = got.groupBy(_._3).map { case (k, v) => k -> v.length }
    assert(bySplit.keySet == Set("train", "val", "test"), s"splits seen: ${bySplit.keySet}")
    assert(bySplit("train") > got.length / 2, "train must dominate")
    // FROZEN: membership is per-doc, so a corpus subset changes nothing
    val half = got.filter(_._1 % 2 == 0).map(t => t._1 -> t._3).toMap
    for ((id, s2) <- half) {
      val eb = scalaH60(s"$id:${MixOps.SplitSalt}") % MixOps.SplitMod
      val es = if (eb < MixOps.TestPct) "test" else if (eb < MixOps.ValPct) "val" else "train"
      assert(s2 == es)
    }
  }

  test("split_balance_report ppm arithmetic ties out against data_split") {
    val sp = MixOps.dataSplit(spark, Sf).collect()
      .map(r => (r.getString(3), r.getString(1))) // (split, source)
    val cells = sp.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val bySplit = sp.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val bySrc = sp.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val total = sp.length.toLong
    val got = MixOps.splitBalanceReport(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == cells.keySet, "one row per observed (split, source) cell")
    for (((split, src), n) <- cells) {
      val (gn, share, global, skew) = got((split, src))
      assert(gn == n, s"($split,$src) count")
      assert(share == n * 1000000L / bySplit(split), s"($split,$src) share")
      assert(global == bySrc(src) * 1000000L / total, s"($split,$src) global")
      assert(skew == share - global, s"($split,$src) skew")
    }
  }

  test("robust_spend_stats matches a plain-Scala winsorized recompute") {
    val ev = graft.sources.Tables.events(spark, Sf)
      .selectExpr("event_type", "event_id", "cast(round(value * 100) as bigint) as cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = EventOps.robustSpendStats(spark, Sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val byType = ev.groupBy(_._1)
    assert(got.keySet == byType.keySet)
    for ((t, rows) <- byType) {
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val n = sorted.length
      def pick(pct: Int): Long = sorted((n * pct + 99) / 100 - 1)
      val (p01, p99) = (pick(1), pick(99))
      val wsum = rows.map(r => math.min(math.max(r._3, p01), p99)).sum
      val (gn, gp01, gp99, gsum, gmean) = got(t)
      assert(gn == n.toLong && gp01 == p01 && gp99 == p99 && gsum == wsum, s"$t stats")
      assert(gmean == wsum.toDouble / n.toDouble, s"$t mean")
      assert(gp01 <= gp99, s"$t bound order")
    }
  }

  test("streaming_quantile_hist equals the batch sketch and survives a forced multi-batch split") {
    import org.apache.spark.sql.functions.col
    val batch = sortedRows(graft.operators.SketchOps.quantileHistSketch(spark, Sf))
    val stream = sortedRows(graft.streaming.StreamingQuantileHist.run(spark, Sf))
    assert(stream == batch, "single-batch streaming histogram differs from batch sketch")
    // the merge is plain per-bucket addition (associative+commutative),
    // so the FINAL emission per key — the one with the maximal n, which
    // grows monotonically — must equal the batch report under any split
    val dir = java.nio.file.Files.createTempDirectory("graft_qhist").toString
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    ev.filter(col("event_id") % 2 === 0).write.parquet(s"$dir/src/a.parquet")
    ev.filter(col("event_id") % 2 =!= 0).write.parquet(s"$dir/src/b.parquet")
    val q = graft.streaming.StreamingQuantileHist
      .histStream(spark, s"$dir/src/*.parquet", ev.schema)
      .writeStream.format("memory").queryName("qhist_multi")
      .option("maxFilesPerTrigger", 1)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val fin = spark.table("qhist_multi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSet
    val expect = graft.operators.SketchOps.quantileHistSketch(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(fin == expect, "final multi-batch histogram differs from batch sketch")
  }

  test("tokenizer_fertility sums tie out against token_count; ratios are exact div") {
    val per = TextOps.tokenCount(spark, Sf).collect()
    val expWs = per.map(r => if (r.isNullAt(1)) 0L else r.getLong(1)).sum
    val expRe = per.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).sum
    val got = TextOps.tokenizerFertility(spark, Sf).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getLong(3)).sum == expWs, "ws token totals")
    assert(got.map(_.getLong(4)).sum == expRe, "re token totals")
    for (r <- got) {
      val (ws, re, ch) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(r.getLong(6) == (if (ws > 0) re * 1000000L / ws else 0L))
      assert(r.getLong(7) == (if (re > 0) ch * 1000000L / re else 0L))
    }
  }

  test("ngram_lm_counts matches a plain-Scala bigram recompute") {
    val texts = graft.sources.Tables.documents(spark, Sf)
      .select("text").collect().flatMap(r => Option(r.getString(0)))
    val toks = texts.map(_.split(" ", -1).toSeq)
    val bigrams = toks.flatMap(t => t.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
    val cBig = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cUni = toks.flatten.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val fan = cBig.keys.groupBy(_._1).map { case (w, ks) => w -> ks.size.toLong }
    val cont = cBig.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val got = TextOps.ngramLmCounts(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.length == math.min(TextOps.LmK, cBig.size))
    val expOrder = cBig.toSeq.sortBy { case ((w1, w2), c) => (-c, w1, w2) }
      .take(TextOps.LmK)
    for (((r, ((w1, w2), c)), i) <- got.sortBy(_._1).zip(expOrder).zipWithIndex) {
      assert(r._1 == i + 1 && r._2 == w1 && r._3 == w2 && r._4 == c,
        s"rank ${i + 1} bigram")
      assert(r._5 == cUni(w1) && r._6 == fan(w1) && r._7 == cont(w2),
        s"rank ${i + 1} context stats")
    }
  }

  test("mix_deficit_report is consistent with token_budget_mix arithmetic") {
    val mix = graft.operators.MixOps.tokenBudgetMix(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    val totTokens = mix.values.map(_._1).sum
    val wsum = mix.values.map(_._2).sum
    val got = graft.operators.MixOps.mixDeficitReport(spark, Sf).collect()
    assert(got.map(_.getString(0)).toSet == mix.keySet)
    for (r <- got) {
      val (tokens, weight, achieved) = mix(r.getString(0))
      val target = totTokens / graft.operators.MixOps.BudgetDiv * weight / wsum
      assert(r.getLong(3) == target, s"${r.getString(0)} target")
      assert(r.getLong(4) == achieved, s"${r.getString(0)} achieved")
      assert(r.getLong(5) == math.max(0L, target - achieved))
      assert(r.getLong(6) == (if (target > 0) r.getLong(5) * 1000000L / target else 0L))
    }
    assert(got.exists(_.getLong(5) > 0L),
      "fixture exercises no capped source — deficit path untested")
  }

  test("rfm_segments quartiles partition users; code packs digits") {
    val rows = EventOps.rfmSegments(spark, Sf).collect()
    val n = rows.length
    assert(n > 4)
    for (q <- Seq(4, 5, 6)) { // r/f/m quartile columns
      val by = rows.groupBy(_.getLong(q)).view.mapValues(_.length).toMap
      assert(by.keySet.subsetOf(Set(1L, 2L, 3L, 4L)), s"col $q quartile range")
      // rank-formula quartiles: every quartile holds floor/ceil(n/4)
      assert(by.values.forall(c => c >= n / 4 && c <= n / 4 + 1), s"col $q balance $by")
    }
    for (r <- rows)
      assert(r.getLong(7) == r.getLong(4) * 100 + r.getLong(5) * 10 + r.getLong(6))
  }

  test("zorder_key interleave is invertible and bounded") {
    val rows = EventOps.zorderKey(spark, Sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    def unspread(z: Long): Long = {
      var x = z & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
      x
    }
    for ((ub, tb, z) <- rows) {
      assert(z >= 0L && z < (1L << 32), "z_key fits 32 bits")
      assert(unspread(z) == ub, "even bits recover the user bucket")
      assert(unspread(z >> 1) == tb, "odd bits recover the time bucket")
    }
  }

  test("streaming_hot_keys equals batch hot_keys and survives a forced multi-batch split") {
    import org.apache.spark.sql.functions.col
    val batch = sortedRows(EventOps.hotKeys(spark, Sf))
    assert(sortedRows(graft.streaming.StreamingHotKeys.run(spark, Sf)) == batch)
    val dir = java.nio.file.Files.createTempDirectory("graft_hot").toString
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    ev.filter(col("event_id") % 2 === 0).write.parquet(s"$dir/src/a.parquet")
    ev.filter(col("event_id") % 2 =!= 0).write.parquet(s"$dir/src/b.parquet")
    val q = graft.streaming.StreamingHotKeys
      .countStream(spark, s"$dir/src/*.parquet", ev.schema)
      .writeStream.format("memory").queryName("hot_multi")
      .option("maxFilesPerTrigger", 1)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val multi = sortedRows(graft.streaming.StreamingHotKeys.select(spark.table("hot_multi")))
    assert(multi == batch, "multi-batch counter merge differs from batch hot_keys")
  }

  test("kmv_intersect matches a plain-Scala sketch-algebra recompute") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val K = graft.operators.SketchOps.KmvK
    // exact per-type distinct hash sets, recomputed with the same h60
    val hs = graft.sources.Tables.events(spark, Sf)
      .select(col("event_type"),
        graft.functions.Portable.h60(concat(lit("kmv:"), col("user_id").cast("string"))).as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = hs.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val got = graft.operators.SketchOps.kmvIntersect(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val types = byType.keys.toSeq.sorted
    val expPairs = for (a <- types; b <- types if a < b) yield (a, b)
    assert(got.keySet == expPairs.toSet, "one row per unordered type pair")
    for ((a, b) <- expPairs) {
      val ka = byType(a).toSeq.sorted.take(K).toSet
      val kb = byType(b).toSeq.sorted.take(K).toSet
      val mergedAll = (ka ++ kb).toSeq.sorted
      val merged = mergedAll.take(K)
      val theta = merged.last
      val nCommon = (ka & kb).count(_ <= theta).toLong
      val (kUnion, gTheta, gCommon, gJacc) = got((a, b))
      assert(kUnion == merged.size.toLong, s"($a,$b) k_union")
      assert(gTheta == theta, s"($a,$b) theta")
      assert(gCommon == nCommon, s"($a,$b) n_common")
      assert(gJacc == nCommon * 1000000L / merged.size, s"($a,$b) jacc_ppm")
    }
  }

  test("ivf_balance_report and knn_degree_stats tie out against their index tables") {
    import org.apache.spark.sql.functions.col
    val bal = AnnOps.ivfBalanceReport(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nVec = graft.sources.Tables.embeddings(spark, Sf).count()
    assert(bal.length == AnnOps.NCells, "one row per cell, empty cells included")
    assert(bal.map(_._2).sum == nVec, "cell occupancies partition the vectors")
    val shareSum = bal.map(_._3).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - AnnOps.NCells,
      s"share ppm sums to ~1e6, got $shareSum")
    for ((c, n, share, load) <- bal)
      assert(load == n * AnnOps.NCells * 1000000L / nVec, s"cell $c load_ppm arithmetic")
    val deg = AnnOps.knnDegreeStats(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(deg.map(_._2).sum == nVec, "degree histogram partitions the vectors")
    val edges = AnnOps.annKnnGraph(spark, Sf).count()
    assert(deg.map { case (d, n) => d * n }.sum == edges,
      "sum of in-degrees equals the kNN edge count")
  }

  test("distinct_kmv plans as a partial-aggregable sketch (no Window rank, no pre-distinct)") {
    val qe = graft.operators.SketchOps.distinctKmv(spark, Sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("partial_kmv_sketch"),
      "map-side partial kmv_sketch missing — the sketch is not partial-aggregable")
    assert(!plan.contains("Window"),
      "sketch must not rank through a Window sort over the whole group")
    // the TreeSet state dedups, so the old distinct's extra
    // aggregate must be gone: exactly one grouping key pair of
    // hash aggregates (the sketch partial+final)
    assert(!qe.optimizedPlan.toString.contains("Deduplicate"),
      "sketch state dedups; a pre-distinct is a wasted shuffle")
  }

  test("streaming_distinct_kmv equals the batch sketch and survives a forced multi-batch split") {
    import org.apache.spark.sql.functions.col
    val batch = sortedRows(graft.operators.SketchOps.distinctKmv(spark, Sf))
    val stream = sortedRows(graft.streaming.StreamingDistinctKmv.run(spark, Sf))
    assert(stream == batch, "single-batch streaming sketch differs from batch")
    // force >1 micro-batch: two source files + maxFilesPerTrigger=1;
    // the FINAL emission per key must still equal the batch sketch,
    // which is the associative-merge property the operator claims.
    // "Final" = max n_kept, then min kth_min: kth_min only tightens
    // monotonically AFTER n_kept saturates at K, so a key unsaturated
    // in its first micro-batch can emit a smaller kth_min there — the
    // old minBy(kth_min) would pick that non-final row on a smaller
    // fixture.
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv").toString
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    ev.filter(col("event_id") % 2 === 0).write.parquet(s"$dir/src/a.parquet")
    ev.filter(col("event_id") % 2 =!= 0).write.parquet(s"$dir/src/b.parquet")
    val q = graft.streaming.StreamingDistinctKmv
      .sketchStream(spark, s"$dir/src/*.parquet", ev.schema,
        Map("maxFilesPerTrigger" -> "1"))
      .writeStream.format("memory").queryName("kmv_multi")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val finAll = spark.table("kmv_multi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(finAll.length > finAll.map(_._1).distinct.length,
      "fixture must actually produce multiple emissions for some key")
    val fin = finAll
      .groupBy(_._1).map { case (_, rows) => rows.maxBy(r => (r._2, -r._3)) }
    val expect = graft.operators.SketchOps.distinctKmv(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(fin.toSet == expect, "final multi-batch sketch differs from batch sketch")
  }

  test("dup_ngram_coverage matches a plain-Scala cross-doc shingle recomputation") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
    def shingles(t: String): Set[String] =
      if (t == null) Set.empty
      else {
        val tk = t.split(" ", -1)
        if (tk.length < TextOps.ShingleN) Set.empty
        else tk.sliding(TextOps.ShingleN).map(_.mkString(" ")).toSet
      }
    val sets = docs.map { case (id, t) => id -> shingles(t) }
    val ndocs = sets.flatMap(_._2).groupBy(identity).map { case (k, v) => k -> v.length }
    val got = TextOps.dupNgramCoverage(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got.size == docs.length)
    for ((id, sh) <- sets) {
      val (n, dup, ratio) = got(id)
      assert(n == sh.size.toLong, s"doc $id shingle count")
      val expDup = sh.count(x => ndocs(x) >= 2).toLong
      assert(dup == expDup, s"doc $id dup count")
      if (sh.isEmpty) assert(ratio.isEmpty, s"doc $id must carry NULL ratio")
      else assert(ratio.contains(expDup.toDouble / sh.size.toDouble), s"doc $id ratio")
    }
    assert(got.values.exists(_._2 > 0), "no cross-doc duplicated shingles exercised")
  }

  test("attribution_linear: per-purchase credits sum to exactly 1e6, count matches interval_join") {
    val rows = EventOps.attributionLinear(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val ij = EventOps.intervalJoin(spark, Sf).count()
    assert(rows.length.toLong == ij, "one credit row per interval-join pair")
    for ((pid, g) <- rows.groupBy(_._1)) {
      assert(g.map(_._4).sum == 1000000L, s"purchase $pid credits must sum to 1e6")
      assert(g.head._3 == g.length.toLong, s"purchase $pid n_clicks mismatch")
      assert(g.map(_._4).toSet.size <= 2, s"purchase $pid more than base+remainder credit values")
    }
  }

  test("asof_nearest matches a plain-Scala nearest-click recomputation") {
    val evs = plainEvents().filter(e => e._3 == "click" || e._3 == "purchase")
    val byUser = evs.groupBy(_._2)
    val got = EventOps.asofNearest(spark, Sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4), r.getLong(5)))))
      .toMap
    var matchedSome = false
    for ((u, es) <- byUser; (pid, _, t, pts, _) <- es if t == "purchase") {
      val clicks = es.filter(_._3 == "click")
        .filter(c => math.abs(c._4 - pts) <= EventOps.NearestUs)
      val best =
        if (clicks.isEmpty) None
        else Some(clicks.minBy(c => (math.abs(c._4 - pts),
          if (c._4 <= pts) 0 else 1,
          if (c._4 <= pts) -c._1 else c._1)))
      val exp = best.map(c => (c._1, c._4, math.abs(c._4 - pts)))
      assert(got(pid) == exp, s"purchase $pid nearest-click mismatch")
      if (exp.nonEmpty) matchedSome = true
    }
    assert(matchedSome, "no purchase matched any click — nothing exercised")
  }

  test("PartitionedSink: partition filters prune directories at planning time") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = graft.sources.Tables.documents(spark, Sf)
    graft.sources.PartitionedSink.writePartitioned(docs, s"$dir/docs", "source")
    val back = graft.sources.PartitionedSink.readPartitioned(spark, s"$dir/docs")
    val sources = docs.select("source").distinct().collect().map(_.getString(0))
    assert(sources.length > 1, "fixture needs multiple partitions")
    val one = sources.min
    val pruned = back.filter(col("source") === one)
    // row-for-row identical to the unpartitioned filter
    assert(pruned.count() == docs.filter(col("source") === one).count())
    // the scan must carry a PartitionFilters entry on `source` and
    // list ONLY the selected partition's files
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("source"),
      s"partition filter not pushed to the scan:\n$scan")
    // file-count evidence from the executed scan's own metric: the
    // pruned query must have LISTED fewer files than a full scan
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // execute THIS plan so its scan metrics populate
      df.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    }
    val allFiles = scannedFiles(back.filter(col("n_chars") >= 0L))
    val prunedFiles = scannedFiles(pruned)
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruned scan read $prunedFiles of $allFiles files — no pruning happened")
    // partition column survives the directory round-trip
    assert(sortedRows(back.select(docs.columns.map(col): _*)) ==
      sortedRows(docs), "partitioned round-trip lost or changed rows")
  }

  test("timeseries_fill: dense grid, zero-filled gaps, correct LOCF") {
    val evs = plainEvents()
    val hours = evs.map(e => (e._3, e._4 / EventOps.HourUs, e._5))
    val mn = hours.map(_._2).min; val mx = hours.map(_._2).max
    val types = hours.map(_._1).distinct
    val agg = hours.groupBy(h => (h._1, h._2))
      .map { case (k, v) => k -> (v.length.toLong, v.map(_._3).sum) }
    val got = EventOps.timeseriesFill(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1) / EventOps.HourUs) ->
        ((r.getLong(2), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(got.size == types.length * (mx - mn + 1).toInt, "grid not dense")
    for (t <- types) {
      var locf: Option[Long] = None
      for (hr <- mn to mx) {
        val (n, sc) = agg.getOrElse((t, hr), (0L, 0L))
        if (agg.contains((t, hr))) locf = Some(sc)
        assert(got((t, hr)) == ((n, sc, locf)), s"cell ($t, $hr) mismatch")
      }
    }
    assert(got.values.exists(_._1 == 0L), "no gap hours — fill not exercised")
  }

  test("integrity_audit classifies planted orphans on both sides") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_integ").toString
    val docs = graft.sources.Tables.documents(spark, Sf)
    val vecs = graft.sources.Tables.embeddings(spark, Sf)
    // plant one doc without a vector and one vector without a doc
    docs.unionByName(docs.limit(1).withColumn("doc_id", lit(77000001L)))
      .write.parquet(s"$dir/documents.parquet")
    vecs.unionByName(vecs.limit(1).withColumn("vec_id", lit(88000001L)))
      .write.parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.MergeOps.integrityAudit(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nBoth = docs.join(vecs, col("doc_id") === col("vec_id")).count()
    assert(got == Map("both" -> nBoth, "doc_only" -> (docs.count() - nBoth + 1),
      "vec_only" -> (vecs.count() - nBoth + 1)), s"audit wrong: $got")
  }

  test("sample_weighted: keep rule replayable, certainty above pivot, zero-token never kept") {
    val rows = TextOps.sampleWeighted(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    for ((id, n, u, kept) <- rows) {
      assert(kept == (u * TextOps.WTargetLen < n * 1000000L), s"doc $id keep rule mismatch")
      if (n >= TextOps.WTargetLen) assert(kept, s"doc $id at/above pivot must be certain")
      if (n == 0) assert(!kept, s"zero-token doc $id must never be kept")
    }
    assert(rows.exists(_._4) && rows.exists(!_._4), "sampling not exercised both ways")
    // replay: second run identical (hash draw, no RNG state)
    val again = TextOps.sampleWeighted(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("cdc_apply equals db_upsert minus the delete-marked keys") {
    import org.apache.spark.sql.functions.col
    val deleted = graft.model.Catalog.records(spark, Sf)
      .filter(col("lnum") === 4).select("record_id").collect()
      .map(_.getString(0)).toSet
    assert(deleted.nonEmpty, "fixture must exercise deletes")
    val upsert = MergeOps.dbUpsert(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val applied = MergeOps.cdcApply(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(applied.keySet == upsert.keySet -- deleted,
      "cdc_apply must drop exactly the delete-marked keys")
    for ((k, v) <- applied) assert(upsert(k) == v,
      s"surviving key $k differs from keep-last upsert")
  }

  test("hot_keys matches a plain-Scala top-K recomputation") {
    val evs = plainEvents()
    val cnt = evs.groupBy(_._2).map { case (u, es) => u -> es.length.toLong }
    val top = cnt.toSeq.sortBy { case (u, n) => (-n, u) }.take(EventOps.HotK)
    val total = evs.length.toLong
    val expected = top.map { case (u, n) => (u, n, n * 1000000L / total) }
    val got = EventOps.hotKeys(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy { case (u, n, _) => (-n, u) }
    assert(got == expected, "hot-key report differs from recompute")
  }

  test("bloom_semi_filter: zero false negatives, sane false-positive rate") {
    import org.apache.spark.sql.functions.col
    // fixture: strip purchases from a third of users so non-members exist
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    graft.sources.Tables.events(spark, Sf)
      .filter(!(col("user_id") % 3 === 0 && col("event_type") === "purchase"))
      .write.parquet(s"$dir/events.parquet")
    val rows = graft.operators.SketchOps.bloomSemiFilter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    for ((u, might, is) <- rows if is)
      assert(might, s"user $u is a member but the filter said no — Bloom guarantee broken")
    val nonMembers = rows.filter(!_._3)
    assert(nonMembers.nonEmpty, "fixture needs non-members to measure fp")
    val fp = nonMembers.count(_._2).toDouble / nonMembers.length
    // m=1024, k=3: even at hundreds of members fp stays well under 0.5
    assert(fp < 0.5, s"false-positive rate $fp implausibly high")
  }

  test("hll_distinct matches a plain-Scala register recompute; estimate within HLL error") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, Sf)
    val hs = ev.select(col("event_type"),
        graft.functions.Portable.h60(concat(lit("hll:"), col("user_id").cast("string"))).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val m = SketchOps.HllM
    val wb = SketchOps.HllWBits
    def rho(w: Long): Long = if (w == 0) wb + 1 else wb - (63 - java.lang.Long.numberOfLeadingZeros(w))
    val regs = hs.groupBy(_._1).map { case (t, rows) =>
      val mx = rows.map { case (_, h) => ((h % m).toInt, rho(h / m)) }
        .groupBy(_._1).map { case (r, v) => r -> v.map(_._2).max }
      t -> mx
    }
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = SketchOps.hllDistinct(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == regs.keySet)
    for ((t, nZero, harm, est) <- got) {
      val mx = regs(t)
      assert(nZero == m - mx.size, s"$t n_zero mismatch")
      val expHarm = mx.values.map(r => 1L << (wb + 1 - r)).sum +
        (m - mx.size).toLong * (1L << (wb + 1))
      assert(harm == expHarm, s"$t harmonic sum mismatch: $harm vs $expHarm")
      assert(est == SketchOps.HllEstNum / expHarm.toDouble)
      // raw HLL (no linear-counting correction — ln() is not portable
      // cross-engine): in the small-range regime (n << m) the raw
      // estimate is known-biased HIGH toward ~m, so the sanity band is
      // anchored at max(exact, m); in-range groups sit within ~3 sigma
      // (sigma = 1.04/sqrt(64) = 13%) of exact.
      val anchor = math.max(exact(t).toDouble, m.toDouble)
      assert(est > anchor * 0.4 && est < anchor * 4.0,
        s"$t estimate $est implausible vs exact ${exact(t)} (anchor $anchor)")
    }
  }

  test("cms: estimates never underestimate, heavy-hitter candidates are a superset") {
    val er = SketchOps.cmsErrorReport(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(er.nonEmpty && er.length <= SketchOps.CmsTopK)
    for ((_, t, cnt, est, over) <- er) {
      assert(est >= cnt, s"CM underestimated '$t': $est < $cnt — guarantee broken")
      assert(over == (est - cnt) * 1000000L / cnt, s"'$t' over_ppm arithmetic")
    }
    // exact term counts straight off the table (plain Scala)
    val counts = graft.sources.Tables.documents(spark, Sf)
      .select("text").collect().iterator
      .flatMap(_.getString(0).split(" ", -1)).toSeq
      .groupBy(identity).map { case (t, v) => (t, v.size.toLong) }
    val thresh = counts.values.sum / SketchOps.HhDen
    val hh = SketchOps.cmsHeavyHitters(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val candidates = hh.map(_._1).toSet
    for ((t, c) <- counts if c >= thresh)
      assert(candidates.contains(t),
        s"true heavy hitter '$t' ($c >= $thresh) missing from candidates — superset broken")
    for ((t, est, cnt, isHeavy) <- hh) {
      assert(cnt == counts(t), s"'$t' exact recount mismatch")
      assert(est >= cnt, s"'$t' CM underestimated")
      assert(isHeavy == (cnt >= thresh), s"'$t' is_heavy flag wrong")
    }
  }

  test("dwell_times matches a plain-Scala nearest-rank recomputation") {
    val evs = plainEvents()
    val deltas = evs.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val o = es.sortBy(e => (e._4, e._1))
      o.zip(o.drop(1)).map { case (a, b) => (a._3, a._1, b._4 - a._4) }
    }
    def rank(sorted: Seq[Long], pct: Int): Long =
      sorted((sorted.length * pct + 99) / 100 - 1)
    val expected = deltas.groupBy(_._1).map { case (t, ds) =>
      val sorted = ds.sortBy(d => (d._3, d._2)).map(_._3)
      t -> ((ds.length.toLong, sorted.min, rank(sorted, 50), rank(sorted, 90), sorted.max))
    }
    val got = EventOps.dwellTimes(spark, Sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, "dwell distribution differs from recompute")
  }

  test("running_distinct_types: monotone per user, ends at the user's distinct type count") {
    val evs = plainEvents()
    val got = EventOps.runningDistinctTypes(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for ((u, es) <- got.groupBy(_._2)) {
      val o = es.sortBy(e => (e._3, e._1))
      val seen = scala.collection.mutable.Set.empty[String]
      val types = evs.filter(_._2 == u).map(e => e._1 -> e._3).toMap
      for (((id, _, _, n), i) <- o.zipWithIndex) {
        seen += types(id)
        assert(n == seen.size.toLong, s"user $u event $id running distinct mismatch")
        if (i > 0) assert(n >= o(i - 1)._4, s"user $u non-monotone")
      }
    }
  }

  test("minhash_est_error: estimator exact on identical pairs, n_match bounded by K") {
    val rows = TextOps.minhashEstError(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty, "no candidate pairs — nothing exercised")
    for ((a, b, m, est, jacc) <- rows) {
      assert(m >= 0 && m <= TextOps.MinhashK, s"pair ($a,$b) match count out of range")
      assert(est == m.toDouble / TextOps.MinhashK, s"pair ($a,$b) estimate arithmetic")
      if (jacc == 1.0) assert(m == TextOps.MinhashK.toLong,
        s"identical shingle sets ($a,$b) must agree on every permutation")
    }
  }

  test("pack_efficiency is consistent with pack_sequences' window consumption") {
    import org.apache.spark.sql.functions.col
    val packed = graft.operators.MixOps.packSequences(spark, Sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6)))
    // windows a (source, shard) consumes = max(seq_id + n_seqs) over its docs
    val consumed = packed.groupBy(p => (p._1, p._2)).map { case (k, ds) =>
      k -> ds.map(d => d._4 + d._5).max
    }
    val got = graft.operators.MixOps.packEfficiency(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for ((src, (nDocs, nToks, nWin, fill)) <- got) {
      val expWin = consumed.filter(_._1._1 == src).values.sum
      assert(nWin == expWin, s"$src window count differs from the packer's consumption")
      assert(fill == nToks * 1000000L / (nWin * graft.operators.MixOps.CtxTokens),
        s"$src fill arithmetic")
      assert(fill > 0 && fill <= 1000000L, s"$src fill out of range")
      assert(nDocs == packed.count(_._1 == src).toLong, s"$src doc count")
    }
  }

  test("embedding_norm_stats matches a plain-Scala rank selection") {
    val vs = graft.sources.Tables.embeddings(spark, Sf)
      .select("label", "vec_id", "embedding").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1),
        math.sqrt(r.getSeq[Float](2).map(_.toDouble).foldLeft(0.0)((a, x) => a + x * x))))
    def rank(sorted: Seq[Double], pct: Int): Double =
      sorted((sorted.length * pct + 99) / 100 - 1)
    val expected = vs.groupBy(_._1).map { case (l, xs) =>
      val sorted = xs.sortBy(v => (v._3, v._2)).map(_._3).toSeq
      l -> ((xs.length.toLong, sorted.min, rank(sorted, 50), rank(sorted, 99), sorted.max))
    }
    val got = AnnOps.embeddingNormStats(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got == expected, "norm stats differ from recompute")
  }

  test("corpus_drift: slice counts partition the corpus, shares sum near 1e6") {
    val rows = TextOps.corpusDrift(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val nDocs = graft.sources.Tables.documents(spark, Sf).count()
    assert(rows.map(r => r._2 + r._3).sum == nDocs, "slices must partition the corpus")
    val sa = rows.map(_._4).sum; val sb = rows.map(_._5).sum
    assert(sa <= 1000000L && sa > 1000000L - rows.length, s"slice-a shares sum $sa")
    assert(sb <= 1000000L && sb > 1000000L - rows.length, s"slice-b shares sum $sb")
    for (r <- rows) assert(r._6 == r._4 - r._5, s"${r._1} delta arithmetic")
  }

  test("dup_clusters: driver union-find tail equals the distributed propagation loop") {
    val tail = TextOps.dupClusters(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = TextOps.dupClusters(spark, Sf, tailMax = -1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tail == distributed, "tail and distributed cluster labels differ")
    assert(tail.exists { case (k, v) => k != v }, "no non-trivial clusters exercised")
  }

  test("union-find tail survives a 100k-edge path graph (no driver stack overflow)") {
    import org.apache.spark.sql.functions.{col, lit}
    // One single chain 0-1-2-...-100000: the worst case for a recursive
    // find (depth = chain length). The iterative, union-by-size
    // UnionFind must label every vertex 0 without recursing.
    val edges = spark.range(100000L)
      .select(col("id").as("src"), (col("id") + 1L).as("dst"))
    val labels = UnionFind.minLabels(edges)
    assert(labels.length == 100001, "every chain vertex gets a label row")
    assert(labels.forall(_._2 == 0L), "whole chain must collapse to min id 0")
    // and in reversed insertion order (root chains grow the other way)
    val rev = spark.range(100000L)
      .select((lit(100000L) - col("id")).as("src"), (lit(99999L) - col("id")).as("dst"))
    val labels2 = UnionFind.minLabels(rev)
    assert(labels2.length == 100001 && labels2.forall(_._2 == 0L))
  }

  test("diversity_sample keeps the K lowest ids of every semantic cluster") {
    val labels = AnnOps.semanticClusters(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = labels.toSeq.groupBy(_._2).flatMap { case (c, ms) =>
      ms.map(_._1).sorted.take(AnnOps.DivPerCluster)
        .zipWithIndex.map { case (v, i) => (v, c, i.toLong + 1) }
    }.toSet
    val got = AnnOps.diversitySample(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, "diversity sample differs from per-cluster id-rank recompute")
    assert(labels.groupBy(_._2).values.exists(_.size > AnnOps.DivPerCluster),
      "no cluster exceeds the cap — the cap was not exercised")
  }

  test("filter_funnel: chained stages, final survivors equal corpus_clean") {
    val rows = TextOps.filterFunnel(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq("min_words", "mean_word_len", "stop_ratio", "near_dup"))
    val nDocs = graft.sources.Tables.documents(spark, Sf).count()
    assert(rows.head._3 == nDocs, "stage 1 must start from the whole corpus")
    for (w <- rows.sliding(2); Array(a, b) = w)
      assert(a._4 == b._3, s"stage ${b._1} n_in must chain from stage ${a._1} n_out")
    for (r <- rows) {
      assert(r._4 <= r._3, s"stage ${r._1} gained rows")
      assert(r._5 == r._3 - r._4, s"stage ${r._1} drop arithmetic")
    }
    assert(rows.last._4 == TextOps.corpusClean(spark, Sf).count(),
      "funnel survivors must equal corpus_clean's output")
  }

  test("knn_predict matches a plain-Scala majority vote over the kNN graph") {
    val edges = AnnOps.annKnnGraph(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = graft.sources.Tables.embeddings(spark, Sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val expected = edges.toSeq.groupBy(_._1).map { case (src, es) =>
      val votes = es.map(e => labels(e._2)).groupBy(identity)
        .map { case (l, v) => (l, v.length.toLong) }
      val (pl, nv) = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head
      src -> ((pl, nv))
    }
    val got = AnnOps.knnPredict(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getBoolean(4))))).toMap
    assert(got.size == labels.size, "every vector must keep a row")
    for ((v, (tl, pl, nv, correct)) <- got) {
      assert(tl == labels(v), s"vec $v true label")
      expected.get(v) match {
        case Some((epl, env)) =>
          assert(pl.contains(epl) && nv.contains(env), s"vec $v vote mismatch")
          assert(correct.contains(epl == tl), s"vec $v correct flag")
        case None =>
          assert(pl.isEmpty && correct.isEmpty, s"isolated vec $v must carry NULLs")
      }
    }
    assert(got.values.exists(_._4.contains(true)), "no correct prediction — suspicious")
  }

  test("fuzzy_source_pairs matches a plain-Scala blocked edit-distance recompute") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = graft.sources.Tables.documents(spark, Sf)
      .select("source").distinct().collect().map(_.getString(0))
    val expected = (for {
      a <- names; b <- names
      if a < b && a.take(MergeOps.FuzzyBlockLen) == b.take(MergeOps.FuzzyBlockLen)
      l = lev(a, b) if l <= MergeOps.FuzzyMaxLev
    } yield (a, b, l.toLong)).toSet
    val got = MergeOps.fuzzySourcePairs(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected, "fuzzy pairs differ from recompute")
    assert(got.nonEmpty, "no fuzzy matches — nothing exercised")
  }

  test("spend_percentile: value-determined ranks, bounds, tie symmetry") {
    val rows = EventOps.spendPercentile(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    for ((t, es) <- rows.groupBy(_._2)) {
      val n = es.length
      val byCents = es.groupBy(_._3)
      for ((c, g) <- byCents) {
        // ties must share identical pr and cd (value-determined)
        assert(g.map(_._4).toSet.size == 1 && g.map(_._5).toSet.size == 1,
          s"$t cents=$c ties disagree")
        val below = es.count(_._3 < c); val atOrBelow = es.count(_._3 <= c)
        assert(g.head._4 == below.toDouble / (n - 1).toDouble, s"$t cents=$c pr formula")
        assert(g.head._5 == atOrBelow.toDouble / n.toDouble, s"$t cents=$c cd formula")
      }
      assert(es.map(_._4).min == 0.0 && es.map(_._5).max == 1.0)
    }
  }

  test("session_cooccurrence matches a plain-Scala basket recompute, lift arithmetic exact") {
    val evs = plainEvents()
    val sessions = evs.groupBy(_._2).toSeq.flatMap { case (u, es) =>
      val o = es.sortBy(e => (e._4, e._1))
      var sid = 0L; var last = Long.MinValue
      o.map { e =>
        if (last == Long.MinValue || e._4 - last > EventOps.GapUs) sid += 1
        last = e._4
        ((u, sid), e._3)
      }
    }
    val types = sessions.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nS = types.size.toLong
    val nX = types.values.toSeq.flatten.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val allT = nX.keys.toSeq.sorted
    val expected = (for {
      i <- allT.indices; j <- (i + 1) until allT.length
      a = allT(i); b = allT(j)
      nab = types.values.count(st => st(a) && st(b)).toLong if nab > 0
    } yield (a, b) -> ((nab, nX(a), nX(b), nS, nab * nS * 1000000L / (nX(a) * nX(b))))).toMap
    val got = EventOps.sessionCooccurrence(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expected, "co-occurrence differs from basket recompute")
    assert(got.nonEmpty, "no co-occurring pairs — nothing exercised")
  }

  test("churn_flags matches a plain-Scala watermark recompute") {
    val evs = plainEvents()
    val last = evs.groupBy(_._2).map { case (u, es) => u -> ((es.map(_._4).max, es.length.toLong)) }
    val wm = last.values.map(_._1).max
    val got = EventOps.churnFlags(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.keySet == last.keySet)
    for ((u, (lu, n)) <- last) {
      val di = (wm - lu) / EventOps.DayUs
      assert(got(u) == ((lu, n, di, di > EventOps.ChurnDays)), s"user $u churn row mismatch")
    }
  }

  test("asof_first_touch picks the earliest preceding click (vs asof_join's latest)") {
    val evs = plainEvents().filter(e => e._3 == "click" || e._3 == "purchase")
    val got = EventOps.asofFirstTouch(spark, Sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4)))))
      .toMap
    val lastTouch = EventOps.asofJoin(spark, Sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(4)))).toMap
    for ((u, es) <- evs.groupBy(_._2); (pid, _, t, pts, _) <- es if t == "purchase") {
      val clicks = es.filter(c => c._3 == "click" && c._4 <= pts)
      val exp =
        if (clicks.isEmpty) None
        else Some(clicks.minBy(c => (c._4, c._1))).map(c => (c._1, c._4))
      assert(got(pid) == exp, s"purchase $pid first-touch mismatch")
      // first-touch time <= last-touch time whenever both exist
      for (ft <- got(pid); lt <- lastTouch(pid)) assert(ft._2 <= lt)
    }
  }

  test("vocab_growth: running vocabulary is the distinct-term prefix count") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2)))
    val got = TextOps.vocabGrowth(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == docs.length)
    for ((src, ds) <- docs.toSeq.groupBy(_._1)) {
      val o = ds.sortBy(_._2)
      val seen = scala.collection.mutable.Set.empty[String]
      for ((_, id, text) <- o) {
        val toks = if (text == null) Array.empty[String] else text.split(" ", -1)
        val fresh = toks.distinct.count(t => !seen(t))
        seen ++= toks
        assert(got((src, id)) == ((fresh.toLong, seen.size.toLong)),
          s"doc ($src, $id) growth mismatch")
      }
    }
  }

  test("quantize_error matches a plain-Scala SQ8 reconstruction recompute") {
    val vs = graft.sources.Tables.embeddings(spark, Sf)
      .select("label", "vec_id", "embedding").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    val dim = vs.head._3.length
    val scales = (0 until dim).map(i => vs.map(_._3(i).abs).max)
    def rnd(x: Double): Double = { // Spark round(): HALF_UP via BigDecimal
      new java.math.BigDecimal(x).setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val maxerr = vs.map { case (l, id, x) =>
      val errs = (0 until dim).map { i =>
        val sc = scales(i)
        val rec = if (sc > 0) rnd(x(i) / sc * AnnOps.SqLevels) * sc / AnnOps.SqLevels.toDouble else 0.0
        math.abs(x(i) - rec)
      }
      (l, id, errs.max)
    }
    def rank(sorted: Seq[Double], pct: Int): Double =
      sorted((sorted.length * pct + 99) / 100 - 1)
    val expected = maxerr.groupBy(_._1).map { case (l, xs) =>
      val sorted = xs.sortBy(v => (v._3, v._2)).map(_._3).toSeq
      l -> ((xs.length.toLong, rank(sorted, 50), rank(sorted, 99), sorted.max))
    }
    val got = AnnOps.quantizeError(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == expected, "quantization-error stats differ from recompute")
    assert(got.values.exists(_._4 > 0.0), "zero error everywhere — quantization not exercised")
  }

  test("lang_diversity: Simpson index exact and bounded") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("source", "lang").collect().map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val n = ds.length.toLong
      val ssq = ds.groupBy(_._2).values.map(v => v.length.toLong * v.length).sum
      src -> ((n, ds.map(_._2).distinct.length.toLong, (n * n - ssq) * 1000000L / (n * n)))
    }
    val got = TextOps.langDiversity(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected, "diversity index differs from recompute")
    for ((src, (_, nl, sp)) <- got) {
      assert(sp >= 0 && sp < 1000000L, s"$src index out of range")
      if (nl == 1) assert(sp == 0L, s"$src single-language source must score 0")
    }
  }

  test("spend_gini matches a plain-Scala sorted-weights recompute, tie-invariant") {
    val evs = plainEvents()
    val expected = evs.groupBy(_._3).map { case (t, es) =>
      val xs = es.sortBy(e => (e._5, e._1)).map(_._5)
      val n = xs.length.toLong; val sum = xs.sum
      val num = xs.zipWithIndex.map { case (x, i) => (2L * (i + 1) - n - 1) * x }.sum
      t -> ((n, sum, if (sum > 0) Some(num * 1000000L / (n * sum)) else None))
    }
    val got = EventOps.spendGini(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got == expected, "gini differs from recompute")
    // tie-invariance: recompute with the OPPOSITE tie order must agree
    for ((t, es) <- evs.groupBy(_._3)) {
      val xs2 = es.sortBy(e => (e._5, -e._1)).map(_._5)
      val n = xs2.length.toLong; val sum = xs2.sum
      val num2 = xs2.zipWithIndex.map { case (x, i) => (2L * (i + 1) - n - 1) * x }.sum
      if (sum > 0) assert(got(t)._3.contains(num2 * 1000000L / (n * sum)),
        s"$t gini depends on tie order — formula broken")
    }
    assert(got.values.flatMap(_._3).forall(g => g >= 0 && g < 1000000L))
  }

  test("user_activity_histogram buckets partition the user base") {
    val evs = plainEvents()
    val perUser = evs.groupBy(_._2).map { case (_, es) => es.length.toLong }
    val got = EventOps.userActivityHistogram(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._3).sum == perUser.size.toLong, "bucket users must sum to the user base")
    assert(got.map(_._4).sum == evs.length.toLong, "bucket events must sum to the corpus")
    for ((b, lo, _, _) <- got) {
      assert(lo == (1L << b), s"bucket_lo mismatch at $b")
      val inBucket = perUser.filter(c => c >= lo && c < (lo << 1))
      assert(got.find(_._1 == b).get._3 == inBucket.size.toLong, s"bucket $b count")
    }
  }

  /** Scala-side twin of Portable.h60 for recompute specs. */
  private def scalaH60(sx: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(sx.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("hll_intersect matches a plain-Scala register-algebra recompute") {
    val evs = plainEvents()
    val m = SketchOps.HllM
    val wb = SketchOps.HllWBits
    def rho(w: Long): Long = if (w == 0) wb + 1 else wb - (63 - java.lang.Long.numberOfLeadingZeros(w))
    // per-type register maxima off the raw rows
    val regs = evs.map { case (_, uid, t, _, _) => (t, scalaH60(s"hll:$uid")) }
      .groupBy(_._1).map { case (t, rows) =>
        t -> rows.map { case (_, h) => ((h % m).toInt, rho(h / m)) }
          .groupBy(_._1).map { case (r, v) => r -> v.map(_._2).max }
      }
    def est(mx: Map[Int, Long]): Double = {
      val harm = mx.values.map(r => 1L << (wb + 1 - r)).sum +
        (m - mx.size).toLong * (1L << (wb + 1))
      SketchOps.HllEstNum / harm.toDouble
    }
    val got = SketchOps.hllIntersect(spark, Sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    val types = regs.keys.toSeq.sorted
    val pairs = for (a <- types; b <- types if a < b) yield (a, b)
    assert(got.keySet == pairs.toSet, "one row per unordered type pair")
    for ((a, b) <- pairs) {
      val union = (regs(a).keySet ++ regs(b).keySet).map { r =>
        r -> math.max(regs(a).getOrElse(r, 0L), regs(b).getOrElse(r, 0L))
      }.toMap
      val (ea, eb, eu, ei) = got((a, b))
      assert(ea == est(regs(a)) && eb == est(regs(b)), s"($a,$b) per-type estimates")
      assert(eu == est(union), s"($a,$b) union estimate")
      assert(ei == ea + eb - eu, s"($a,$b) inclusion-exclusion arithmetic")
      // per-register max union can only tighten vs either input
      assert(eu >= math.max(ea, eb) - 1e-9, s"($a,$b) union below an input")
    }
  }

  test("streaming_hll equals batch hll_distinct and survives a forced multi-batch split") {
    import org.apache.spark.sql.functions.col
    val batch = sortedRows(SketchOps.hllDistinct(spark, Sf))
    val stream = sortedRows(graft.streaming.StreamingHll.run(spark, Sf))
    assert(stream == batch, "single-batch streaming HLL differs from batch")
    // force >1 micro-batch; registers only grow, so harm_sum is
    // non-increasing per key and the FINAL emission is min harm_sum.
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    ev.filter(col("event_id") % 2 === 0).write.parquet(s"$dir/src/a.parquet")
    ev.filter(col("event_id") % 2 =!= 0).write.parquet(s"$dir/src/b.parquet")
    val q = graft.streaming.StreamingHll
      .sketchStream(spark, s"$dir/src/*.parquet", ev.schema,
        Map("maxFilesPerTrigger" -> "1"))
      .writeStream.format("memory").queryName("hll_multi")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val fin = spark.table("hll_multi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fin.length > fin.map(_._1).distinct.length,
      "fixture must actually produce multiple emissions for some key")
    val last = fin.groupBy(_._1).map { case (_, rows) => rows.minBy(_._3) }.toSeq
    val batchRows = SketchOps.hllDistinct(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(last.toSet == batchRows,
      "multi-batch final HLL state differs from the batch sketch — merge not associative")
  }

  test("lm_coverage matches a plain-Scala top-K bigram recompute") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getString(1), if (r.isNullAt(2)) null else r.getString(2)))
    val bgs = docs.flatMap { case (src, t) =>
      if (t == null) Seq.empty
      else {
        val tk = t.split(" ", -1)
        if (tk.length < 2) Seq.empty
        else tk.sliding(2).map(p => (src, p.mkString(" "))).toSeq
      }
    }
    val top = bgs.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(TextOps.LmK).map(_._1).toSet
    val exp = bgs.groupBy(_._1).map { case (src, rows) =>
      val n = rows.length.toLong
      val in = rows.count(r => top(r._2)).toLong
      (src, n, in, in * 1000000L / n)
    }.toSet
    val got = TextOps.lmCoverage(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == exp)
  }

  test("split_leakage_report matches a plain-Scala shingle-overlap recompute") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    def split(id: Long): String = {
      val b = scalaH60(s"$id:${MixOps.SplitSalt}") % MixOps.SplitMod
      if (b < MixOps.TestPct) "test" else if (b < MixOps.ValPct) "val" else "train"
    }
    def hset(t: String): Set[Long] =
      if (t == null) Set.empty
      else {
        val tk = t.split(" ", -1)
        if (tk.length < TextOps.ShingleN) Set.empty
        else tk.sliding(TextOps.ShingleN)
          .map(s => scalaH60(s.mkString(" ")) % graft.functions.Portable.P).toSet
      }
    val byDoc = docs.map { case (id, t) => (id, split(id), hset(t)) }
    val train = byDoc.filter(_._2 == "train").flatMap(_._3).toSet
    val exp = byDoc.filter(_._2 != "train").groupBy(_._2).map { case (sp, ds) =>
      val nDocs = ds.length.toLong
      val leakedDocs = ds.count(d => d._3.exists(train)).toLong
      val nSh = ds.map(_._3.size.toLong).sum
      val nLeak = ds.map(_._3.count(train).toLong).sum
      (sp, nDocs, leakedDocs, nSh, nLeak,
        leakedDocs * 1000000L / nDocs,
        if (nSh > 0) nLeak * 1000000L / nSh else 0L)
    }.toSet
    val got = TextOps.splitLeakageReport(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == exp)
    // both holdout splits must exist at this sf, else the test is vacuous
    assert(got.map(_._1) == Set("val", "test"))
  }

  test("shuffle_skew_report partitions the corpus exactly; skew arithmetic exact") {
    val evs = plainEvents()
    val got = EventOps.shuffleSkewReport(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = evs.length.toLong
    assert(got.map(_._2).sum == total, "partition rows must sum to the corpus")
    assert(got.map(_._3).sum == evs.map(_._2).distinct.length.toLong,
      "each key lives in exactly one partition")
    for ((p, n, _, share, skew) <- got) {
      assert(p >= 0 && p < EventOps.SkewP)
      assert(share == n * 1000000L / total)
      assert(skew == n * EventOps.SkewP * 1000000L / total)
    }
  }

  test("kmv_difference matches a plain-Scala sketch-algebra recompute") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val K = SketchOps.KmvK
    val hs = graft.sources.Tables.events(spark, Sf)
      .select(col("event_type"),
        graft.functions.Portable.h60(concat(lit("kmv:"), col("user_id").cast("string"))).as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = hs.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val got = SketchOps.kmvDifference(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
    val types = byType.keys.toSeq.sorted
    val expPairs = for (a <- types; b <- types if a < b) yield (a, b)
    assert(got.keySet == expPairs.toSet)
    for ((a, b) <- expPairs) {
      val ka = byType(a).toSeq.sorted.take(K).toSet
      val kb = byType(b).toSeq.sorted.take(K).toSet
      val merged = (ka ++ kb).toSeq.sorted.take(K)
      val theta = merged.last
      val aOnly = merged.count(h => ka(h) && !kb(h)).toLong
      val bOnly = merged.count(h => kb(h) && !ka(h)).toLong
      val (kUnion, gTheta, gaOnly, gbOnly, estU, estAB, estBA) = got((a, b))
      assert(kUnion == merged.size.toLong && gTheta == theta, s"($a,$b) union sketch")
      assert(gaOnly == aOnly && gbOnly == bOnly, s"($a,$b) membership counts")
      // membership below theta is exact: a sketch hash <= theta is in
      // the set iff it is in the sketch (theta <= both input thetas)
      val exactAOnly = merged.count(h => byType(a)(h) && !byType(b)(h)).toLong
      assert(aOnly == exactAOnly, s"($a,$b) sketch membership not exact below theta")
      val expU = if (merged.size < K) merged.size.toDouble
        else (K - 1).toDouble * SketchOps.KmvDomain / theta.toDouble
      assert(estU == expU && estAB == aOnly.toDouble / merged.size * expU &&
        estBA == bOnly.toDouble / merged.size * expU, s"($a,$b) estimates")
    }
  }

  test("cms_join_estimate never underestimates; exact join audit ties out") {
    val evs = plainEvents()
    val uc = evs.groupBy(e => (e._3, e._2)).map { case ((t, u), es) => (t, u, es.length.toLong) }
    val types = uc.map(_._1).toSeq.distinct.sorted
    val exact = (for (a <- types; b <- types if a < b) yield {
      val ca = uc.filter(_._1 == a).map(e => e._2 -> e._3).toMap
      val cb = uc.filter(_._1 == b).map(e => e._2 -> e._3).toMap
      (a, b) -> ca.keySet.intersect(cb.keySet).toSeq.map(u => ca(u) * cb(u)).sum
    }).toMap
    val got = SketchOps.cmsJoinEstimate(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(got.keySet == exact.keySet, "one row per unordered type pair")
    for (((a, b), (est, tru, over)) <- got) {
      assert(tru == exact((a, b)), s"($a,$b) exact join size")
      assert(est >= tru, s"($a,$b) CM inner product underestimated: $est < $tru")
      if (tru > 0) assert(over.contains((est - tru) * 1000000L / tru))
      // recompute the estimate: d x w counters over the same salt
      val ests = (0 until SketchOps.CmsD).map { i =>
        def ctr(t: String): Map[Long, Long] =
          uc.filter(_._1 == t).groupBy(e => scalaH60(s"cj$i:${e._2}") % SketchOps.CmsW)
            .map { case (p, es) => p -> es.map(_._3).sum }
        val (ca, cb) = (ctr(a), ctr(b))
        ca.keySet.intersect(cb.keySet).toSeq.map(p => ca(p) * cb(p)).sum
      }
      assert(est == ests.min, s"($a,$b) estimate arithmetic")
    }
  }

  test("embedding_anisotropy matches a quantized recompute; ratio bounded by 1") {
    val vecs = graft.sources.Tables.embeddings(spark, Sf)
      .select("label", "vec_id", "embedding").collect()
      .map(r => (r.getInt(0).toLong, r.getSeq[Float](2).map(_.toDouble).toArray))
    val S = AnnOps.CentScale.toDouble
    val exp = vecs.groupBy(_._1).map { case (l, vs) =>
      val n = vs.length.toLong
      val sqn = vs.map { case (_, v) =>
        math.round(math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x)) * S)
      }.sum
      // Spark/DuckDB round() is HALF-AWAY-FROM-ZERO; Scala math.round
      // is half-toward-+inf, which differs on negative components
      def roundAz(y: Double): Long = if (y < 0) -math.round(-y) else math.round(y)
      val dim = vs.head._2.length
      val sx = Array.tabulate(dim)(i => vs.map(v => roundAz(v._2(i) * S)).sum)
      val avgNorm = sqn.toDouble / (n.toDouble * S)
      val centNorm = math.sqrt(sx.foldLeft(0.0) { (acc, sq) =>
        val m = sq.toDouble / (n.toDouble * S); acc + m * m
      })
      l -> ((n, avgNorm, centNorm, centNorm / avgNorm))
    }
    val got = AnnOps.embeddingAnisotropy(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == exp.keySet)
    for ((l, (n, an, cn, ratio)) <- exp) {
      val (gn, gan, gcn, gratio) = got(l)
      assert(gn == n, s"label $l count")
      assert(math.abs(gan - an) < 1e-12 && math.abs(gcn - cn) < 1e-12,
        s"label $l norms: got ($gan, $gcn) vs ($an, $cn)")
      assert(math.abs(gratio - ratio) < 1e-12, s"label $l ratio")
      assert(gratio <= 1.0 + 1e-9, s"label $l anisotropy above 1 — triangle inequality broken")
    }
  }

  test("streaming_cms equals the batch counter table and survives a forced multi-batch split") {
    import org.apache.spark.sql.functions.col
    // exact counters recomputed in plain Scala off the raw corpus
    val toks = graft.sources.Tables.documents(spark, Sf)
      .select("text").collect().iterator
      .flatMap(r => if (r.isNullAt(0)) Iterator.empty else r.getString(0).split(" ", -1).iterator)
      .toSeq
    val exp = (for (i <- 0 until SketchOps.CmsD; t <- toks)
      yield (i.toLong, scalaH60(s"cm$i:$t") % SketchOps.CmsW))
      .groupBy(identity).map { case ((i, p), xs) => (i, p, xs.length.toLong) }.toSet
    val single = graft.streaming.StreamingCms.run(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(single == exp, "single-batch streaming counters differ from exact")
    // forced multi-batch: counters are monotone, final = max per (i, pos)
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$dir/src/a.parquet")
    docs.filter(col("doc_id") % 2 =!= 0).write.parquet(s"$dir/src/b.parquet")
    val q = graft.streaming.StreamingCms
      .sketchStream(spark, s"$dir/src/*.parquet", docs.schema,
        Map("maxFilesPerTrigger" -> "1"))
      .writeStream.format("memory").queryName("cms_multi")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val finAll = spark.table("cms_multi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(finAll.length > finAll.map(t => (t._1, t._2)).distinct.length,
      "fixture must actually produce multiple emissions for some counter")
    val fin = finAll.groupBy(t => (t._1, t._2))
      .map { case ((i, p), xs) => (i, p, xs.map(_._3).max) }.toSet
    assert(fin == exp, "multi-batch final counters differ — additive merge broken")
  }

  test("bbit_minhash_est matches a plain-Scala signature recompute; bbit matches dominate full") {
    val P = graft.functions.Portable.P
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
    def hmods(t: String): Seq[Long] =
      if (t == null) Seq.empty
      else {
        val tk = t.split(" ", -1)
        if (tk.length < TextOps.ShingleN) Seq.empty
        else tk.sliding(TextOps.ShingleN).map(s => scalaH60(s.mkString(" ")) % P).toSeq
      }
    val sigOf = docs.map { case (id, t) =>
      val hs = hmods(t)
      id -> (0 until TextOps.MinhashK).map { j =>
        if (hs.isEmpty) P
        else hs.map(h => (h * graft.functions.Portable.permA(j) +
          graft.functions.Portable.permB(j)) % P).min
      }
    }.toMap
    val shsetOf = docs.map { case (id, t) => id -> hmods(t).toSet }.toMap
    val w = 1 << TextOps.BbitB
    val got = TextOps.bbitMinhashEst(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.nonEmpty, "fixture must produce candidate pairs")
    for ((ida, idb, nm, nmb, jp, efp, ebp) <- got) {
      val (sa, sb) = (sigOf(ida), sigOf(idb))
      assert(nm == sa.zip(sb).count { case (x, y) => x == y }, s"($ida,$idb) n_match")
      assert(nmb == sa.zip(sb).count { case (x, y) => x % w == y % w }, s"($ida,$idb) bbit")
      assert(nm <= nmb, s"($ida,$idb) a full match must also match in its low bits")
      val (ha, hb) = (shsetOf(ida), shsetOf(idb))
      assert(jp == (ha & hb).size.toLong * 1000000L / (ha | hb).size, s"($ida,$idb) jacc_ppm")
      assert(efp == nm * 1000000L / TextOps.MinhashK)
      assert(ebp == math.max(0L,
        (w * nmb - TextOps.MinhashK) * 1000000L / ((w - 1) * TextOps.MinhashK)))
    }
  }

  test("edit_ratio_pairs matches a plain-Scala Levenshtein over the capped prefix") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) "" else r.getString(1)).take(TextOps.EditPrefix)).toMap
    def lev(a: String, b: String): Long = {
      val prev = Array.tabulate(b.length + 1)(_.toLong)
      val cur = new Array[Long](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i.toLong
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val got = TextOps.editRatioPairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.nonEmpty, "fixture must produce candidate pairs")
    for ((ida, idb, dist, maxLen, sim, near) <- got) {
      val (a, b) = (docs(ida), docs(idb))
      assert(dist == lev(a, b), s"($ida,$idb) levenshtein")
      assert(maxLen == math.max(a.length, b.length).toLong)
      val expSim = if (maxLen > 0) (maxLen - dist) * 1000000L / maxLen else 1000000L
      assert(sim == expSim && near == (expSim >= 800000L), s"($ida,$idb) similarity")
    }
  }

  test("streaming_bloom equals the batch filter words and survives a forced multi-batch split") {
    import org.apache.spark.sql.functions.col
    val purchasers = plainEvents().filter(_._3 == "purchase").map(_._2).distinct
    val exp = (for (u <- purchasers; j <- 0 until SketchOps.BloomK)
      yield scalaH60(s"bf$j:$u") % SketchOps.BloomBits)
      .groupBy(_ / SketchOps.BloomWords)
      .map { case (w, ps) =>
        (w, ps.map(p => 1L << (p % SketchOps.BloomWords).toInt).reduce(_ | _))
      }.toSet
    val single = graft.streaming.StreamingBloom.run(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single == exp, "single-batch streaming filter differs from exact recompute")
    // forced multi-batch: bits only accrete (OR), final = max-popcount
    // emission per word (later emissions are supersets)
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    ev.filter(col("event_id") % 2 === 0).write.parquet(s"$dir/src/a.parquet")
    ev.filter(col("event_id") % 2 =!= 0).write.parquet(s"$dir/src/b.parquet")
    val q = graft.streaming.StreamingBloom
      .filterStream(spark, s"$dir/src/*.parquet", ev.schema,
        Map("maxFilesPerTrigger" -> "1"))
      .writeStream.format("memory").queryName("bloom_multi")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val finAll = spark.table("bloom_multi").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(finAll.length > finAll.map(_._1).distinct.length,
      "fixture must actually produce multiple emissions for some word")
    // monotonicity: every earlier emission is a bit-subset of the final
    val fin = finAll.groupBy(_._1).map { case (w, xs) =>
      val last = xs.map(_._2).maxBy(java.lang.Long.bitCount)
      for ((_, bw) <- xs) assert((bw & ~last) == 0L, s"word $w emission not a subset of final")
      (w, last)
    }.toSet
    assert(fin == exp, "multi-batch final filter differs — OR merge broken")
  }

  test("kmeanspp_init matches an exact-integer recompute; seed never kept") {
    val vecs = graft.sources.Tables.embeddings(spark, Sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val se = vecs.head._2
    val S = AnnOps.CentScale.toDouble
    def roundAz(y: Double): Long = if (y < 0) -math.round(-y) else math.round(y)
    val qd2s = vecs.map { case (id, v) =>
      val d2 = v.indices.foldLeft(0.0)((acc, i) => acc + (v(i) - se(i)) * (v(i) - se(i)))
      id -> roundAz(d2 * S)
    }
    val tot = BigInt(qd2s.map(_._2).sum)
    val exp = qd2s.map { case (id, qd2) =>
      val u = scalaH60(s"$id:${AnnOps.KppSalt}") % 1000000L
      (id, qd2, u, BigInt(u) * tot < BigInt(AnnOps.KppL * 1000000L) * BigInt(qd2))
    }.toSet
    val got = AnnOps.kmeansppInit(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(got == exp)
    val bySeed = got.find(_._1 == vecs.head._1).get
    assert(bySeed._2 == 0L && !bySeed._4, "seed has d2=0 and must never self-select")
    val kept = got.count(_._4)
    assert(kept > 0, "fixture must keep some candidates or the round is vacuous")
  }

  test("source_overlap matches a plain-Scala per-source shingle-set recompute") {
    val P = graft.functions.Portable.P
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
    val bySrc = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap { case (_, t) =>
        if (t == null) Seq.empty
        else {
          val tk = t.split(" ", -1)
          if (tk.length < TextOps.ShingleN) Seq.empty
          else tk.sliding(TextOps.ShingleN).map(s => scalaH60(s.mkString(" ")) % P).toSeq
        }
      }.toSet
    }
    val srcs = bySrc.keys.toSeq.sorted
    val exp = (for (a <- srcs; b <- srcs if a < b) yield {
      val (ha, hb) = (bySrc(a), bySrc(b))
      val c = (ha & hb).size.toLong
      (a, b, ha.size.toLong, hb.size.toLong, c,
        c * 1000000L / (ha.size + hb.size - c))
    }).toSet
    val got = TextOps.sourceOverlap(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == exp)
  }

  test("event_seasonality: hour buckets partition each type; shares exact") {
    val evs = plainEvents()
    val exp = evs.groupBy(e => (e._3, (e._4 / EventOps.HourUsL) % 24))
      .map { case ((t, h), es) => (t, h, es.length.toLong) }
    val byType = evs.groupBy(_._3).map { case (t, es) => t -> es.length.toLong }
    val got = EventOps.eventSeasonality(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(x => (x._1, x._2, x._3)).toSet == exp.toSet)
    for ((t, _, n, share) <- got) {
      assert(share == n * 1000000L / byType(t))
      assert(got.filter(_._1 == t).map(_._3).sum == byType(t),
        s"$t hour buckets must partition the type's events")
    }
  }

  test("conversion_lag matches a plain-Scala first-touch recompute") {
    val evs = plainEvents()
    val lags = evs.groupBy(_._2).flatMap { case (u, es) =>
      val fv = es.filter(_._3 == "view").map(_._4).minOption
      fv.flatMap { v =>
        es.filter(e => e._3 == "purchase" && e._4 >= v).map(_._4).minOption
          .map(p => (u, p - v))
      }
    }.toSeq
    assert(lags.nonEmpty, "fixture must contain converting users")
    val sorted = lags.sortBy(l => (l._2, l._1))
    val n = sorted.length
    def pick(p: Int) = sorted((n * p + 99) / 100 - 1)._2
    val got = EventOps.conversionLag(spark, Sf).collect().head
    assert(got.getLong(0) == n.toLong)
    assert(got.getLong(1) == sorted.head._2 && got.getLong(4) == sorted.map(_._2).max)
    assert(got.getLong(2) == pick(50) && got.getLong(3) == pick(90))
  }

  test("session_duration_histogram: buckets partition the session count") {
    val evs = plainEvents()
    val durs = evs.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._1))
      val bounds = sorted.indices.filter(i =>
        i == 0 || sorted(i)._4 - sorted(i - 1)._4 > EventOps.GapUs)
      (bounds :+ sorted.length).sliding(2).map { w =>
        sorted(w(1) - 1)._4 - sorted(w(0))._4
      }.toSeq
    }
    def bucket(d: Long): Long =
      if (d <= 0) -1L else (63 - java.lang.Long.numberOfLeadingZeros(d)).toLong
    val exp = durs.groupBy(bucket).map { case (b, xs) => (b, xs.length.toLong) }
    val got = EventOps.sessionDurationHistogram(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(x => (x._1, x._3)).toMap == exp)
    assert(got.map(_._3).sum == durs.length.toLong, "buckets must partition sessions")
    for ((b, lo, n, share) <- got) {
      assert(lo == (if (b < 0) 0L else 1L << b.toInt))
      assert(share == n * 1000000L / durs.length)
    }
  }

  test("ngram_kn_probs matches a plain-Scala Kneser-Ney recompute; probabilities bounded") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("text").collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    val bigrams = docs.flatMap { t =>
      if (t == null) Seq.empty
      else {
        val tk = t.split(" ", -1)
        if (tk.length < 2) Seq.empty else tk.sliding(2).map(p => (p(0), p(1))).toSeq
      }
    }
    val big = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cLeft = big.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val fan = big.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val cont = big.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val nTypes = big.size.toLong
    val d = TextOps.KnDiscountPpm
    val got = TextOps.ngramKnProbs(spark, Sf).collect()
      .map(r => (r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got.nonEmpty && got.size <= TextOps.LmK)
    for (((w1, w2), (c, cl, fo, cw2, pkn)) <- got) {
      assert(c == big((w1, w2)) && cl == cLeft(w1) && fo == fan(w1) && cw2 == cont(w2))
      val term1 = (c * 1000000L - d) / cl
      val lambda = (d * fo) / cl
      val pcont = (cw2 * 1000000L) / nTypes
      assert(pkn == term1 + lambda * pcont / 1000000L, s"($w1,$w2) KN arithmetic")
      assert(pkn > 0 && pkn <= 1000000L, s"($w1,$w2) probability out of (0,1]")
    }
  }

  test("tfidf_cosine_pairs matches a BigInt recompute; cosine within [0,1]") {
    val docs = graft.sources.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
    val tf = docs.collect { case (id, t) if t != null =>
      id -> t.split(" ", -1).groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    }.toMap
    val dfq = tf.values.flatMap(_.keys).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val n = docs.length.toLong
    val wOf = tf.map { case (id, m) =>
      id -> m.map { case (t, f) => t -> BigInt(f * (n * 1000L / dfq(t))) }
    }
    def nrm(id: Long): Double =
      math.sqrt(wOf(id).values.map(w => w * w).sum.toDouble)
    val got = TextOps.tfidfCosinePairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    for ((ida, idb, ns, dotW, cos) <- got) {
      val (wa, wb) = (wOf(ida), wOf(idb))
      val shared = wa.keySet & wb.keySet
      assert(ns == shared.size.toLong, s"($ida,$idb) shared-term count")
      val dot = shared.toSeq.map(t => wa(t) * wb(t)).sum
      assert(dotW == dot.toDouble, s"($ida,$idb) integer dot product")
      assert(cos == dot.toDouble / (nrm(ida) * nrm(idb)), s"($ida,$idb) cosine")
      assert(cos >= 0.0 && cos <= 1.0 + 1e-9, s"($ida,$idb) cosine out of range: $cos")
    }
  }

  test("salt_plan: exact ceil arithmetic, post-salt buckets within target") {
    val evs = plainEvents()
    val counts = evs.groupBy(_._2).map { case (u, es) => (u, es.length.toLong) }
    val total = evs.length.toLong
    val target = math.max(1L, total / EventOps.SaltTasks)
    val exp = counts.collect { case (u, n) if (n + target - 1) / target > 1 =>
      val salt = (n + target - 1) / target
      (u, n, target, salt, (n + salt - 1) / salt)
    }.toSet
    assert(exp.nonEmpty, "fixture must contain skewed keys or the test is vacuous")
    val got = EventOps.saltPlan(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == exp)
    // the plan's whole point: every salted bucket fits the balanced share
    for ((_, _, tgt, _, post) <- got) assert(post <= tgt)
  }

  test("RangeRank equals the single-partition window, grouped and ungrouped") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val sp = spark
    import sp.implicits._
    // skewed groups, heavy value ties, out-of-order input, and more
    // rows than range partitions — every regime the primitive must
    // survive (parts=4 forces real cross-partition offsets)
    val rows = (1L to 500L).map(i => ((i * 7919) % 3, (i * 31) % 11, i)) ++
      (501L to 600L).map(i => (0L, 5L, i)) // one hot (group, value) block
    val df = rows.toDF("g", "v", "pk")
    def rows3(d: DataFrame): Set[(Long, Long, Long)] =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // grouped row_number
    val a1 = rows3(RangeRank.rowNumber(df, Seq("g"), Seq(col("v"), col("pk")), "rn",
      parts = 4).select("g", "pk", "rn"))
    val e1 = rows3(df.withColumn("rn",
        row_number().over(Window.partitionBy(col("g")).orderBy(col("v"), col("pk"))).cast("long"))
      .select("g", "pk", "rn"))
    assert(a1 == e1, "grouped rowNumber diverges from the window")
    // ungrouped running sum of a value column
    val a2 = RangeRank.runningSum(df, Nil, Seq(col("v"), col("pk")), col("v"), "cum", parts = 4)
      .select("pk", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e2 = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy(col("v"), col("pk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("pk", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a2 == e2, "ungrouped runningSum diverges from the window")
    // and the primitive's whole point: its OWN plan has no
    // single-partition window over the data path
    val plan = RangeRank.rowNumber(df, Nil, Seq(col("v"), col("pk")), "rn", parts = 4)
      .queryExecution.sparkPlan
    val wins = plan.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(wins.nonEmpty)
    for (w <- wins) assert(w.partitionSpec.nonEmpty,
      "RangeRank emitted a single-partition WindowExec")
  }

  test("looped solves extend their checked steps: pagerank_full(2)==pagerank_knn.r2, kmeans_fit(1)==kmeans_step") {
    // the loop at depth 2 must reproduce the unrolled 2-step
    // recurrence row for row — integer states make this exact
    val loop2 = GraphOps.pagerankFull(spark, Sf, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val step2 = GraphOps.pagerankKnn(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(loop2 == step2, "pagerank_full depth 2 diverges from the unrolled recurrence")
    // one Lloyd round of the fit is exactly the checked single step
    def rows(df: DataFrame): Set[(Int, Long, Long, Double)] = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(AnnOps.kmeansFit(spark, Sf, iters = 1)) == rows(AnnOps.kmeansStep(spark, Sf)),
      "kmeans_fit depth 1 diverges from kmeans_step")
    // and the solves actually move: depth 8 differs from depth 2
    // (a loop that silently no-ops would pass the equalities above)
    val loop8 = GraphOps.pagerankFull(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loop8 != loop2, "8 iterations changed nothing — loop is vacuous")
  }

  test("rank/quantile operators run no data-sized single-partition window") {
    // The r12 scale-killer class: a global Window (empty partition
    // spec = ALL rows through one task) or a Window partitioned only
    // by the low-cardinality event_type/source keys (~N/|types| rows
    // through one unsplittable task — AQE cannot split a window
    // partition). Every window these operators run must partition on
    // something data-scaled: the RangeRank __pid, a user key, or the
    // K-bounded offset table's group/constant key ordered by __pid.
    val names = Seq("conversion_lag", "rfm_segments", "spend_gini",
      "spend_percentile", "robust_spend_stats", "dwell_times",
      "corpus_quantiles", "corpus_quantiles_lang", "sample_reservoir",
      "quantile_bins", "vocab_growth",
      "pack_sequences", "pack_mix_sequences", "embedding_norm_stats")
    val lowCard = Set("event_type", "source", "shard", "label", "lang", "split")
    for (name <- names) {
      val plan = SparkEntry.queries(name)(spark, Sf).queryExecution.sparkPlan
      val wins = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      for (w <- wins) {
        assert(w.partitionSpec.nonEmpty,
          s"$name runs a single-partition Window over ${w.child.simpleStringWithNodeId()}")
        val refs = w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).toSet
        // RangeRank's offset-cumulation window partitions by the
        // group key alone but ORDERS by __pid over the ≤ parts-row
        // per-partition totals table — K-bounded, not data-sized
        val ordRefs = w.orderSpec.flatMap(_.references.toSeq.map(_.name)).toSet
        assert(!refs.subsetOf(lowCard) || ordRefs.contains("__pid"),
          s"$name windows only on low-cardinality key(s) $refs — unsplittable data-sized partition")
      }
    }
  }
}
