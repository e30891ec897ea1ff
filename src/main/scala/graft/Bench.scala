package graft
/** Benchmark main: a warmup pass absorbs codegen/executor spin-up,
  * then each query is timed three times and the MEDIAN reported —
  * per-query jitter on a shared box is 2-4x (adjudicated in round 3:
  * a 43 s outlier was machine contention), and the median of three
  * makes a single contended run unable to corrupt the headline.
  *
  * Stdout contract: several ≤1 kB JSON detail lines (the per-query
  * median map, chunked 30 entries per line, keyed `queries_part` with
  * `part`/`of` for reassembly) followed by ONE compact headline line
  * (`"metric":"total"`, carrying unit + sf once for all lines) LAST.
  * The driver keeps a fixed (~3 kB) tail of stdout and parses the
  * final line for the headline; the WHOLE payload must fit that tail
  * or the front detail lines are cut (rounds 1-7 lost the first ~7
  * queries to a single 2.5 kB line; round 8's 5.6 kB payload lost all
  * of part 1). Budget: 90 entries × ~23 B at 2 decimals + 3 × 54 B
  * line overhead + ~110 B headline ≈ 2.4 kB. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    def time(fn: QueryFn): Double = {
      val t0 = System.nanoTime()
      // toRdd materializes every output column: a bare count() would
      // let the optimizer prune expensive projections (hash RNG, pSA
      // folds) and under-report queries whose cost lives in the
      // SELECT list rather than the joins.
      try {
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          // a broken query must NOT shrink the headline as a ~0s entry
          System.err.println(s"BENCH FAILURE: ${e.getClass.getSimpleName}: ${e.getMessage}")
          -1.0
      }
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(n => time(SparkEntry.queries(n))) // warmup pass
    // A query that fails ANY of its 3 runs is reported as null and
    // excluded from the total — a -1 sentinel must not participate in
    // the median (an intermittent failure would still yield a "real"
    // median) nor be summed into the headline.
    val results = names.map { n => n -> (1 to 3).map(_ => time(SparkEntry.queries(n))) }
    val medians = results.map { case (n, runs) =>
      n -> (if (runs.forall(_ >= 0)) Some(runs.sorted.apply(1)) else None)
    }
    val failed = medians.collect { case (n, None) => n }
    // 2-decimal precision: full-precision doubles double the line
    // length for noise digits, and the driver's tail is the scarce
    // resource (round 8 lost part 1 of 5 — ~5.6 kB total exceeded the
    // ~3 kB tail). 90 names avg 14.5 bytes → ~2.1 kB of entries; the
    // whole payload must stay ≤ ~2.5 kB.
    val entries = medians.map { case (k, v) =>
      "\"" + k + "\":" + v.fold("null")(x =>
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(x)))
    }
    val total = medians.flatMap(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Detail lines first, headline LAST: the driver keeps a fixed tail
    // of stdout and parses its final line. A single ~2.5 kB detail
    // line got its FRONT truncated off by that tail (rounds 1-7 lost
    // the first ~7 queries), so the per-query map is chunked into
    // ≤1 kB lines (~18 entries ≈ 550 bytes each); `part`/`of` let a
    // reader reassemble and detect a lost chunk. The compact headline
    // (a few hundred bytes, always intact inside any reasonable tail)
    // closes the stream.
    // Detail lines carry ONLY part/of + the entry map — unit ("sec")
    // and the sf path live once in the headline; repeating them per
    // line cost ~200 bytes of the tail budget in round 8.
    val chunks = entries.grouped(30).toSeq
    val detailLines = chunks.zipWithIndex.map { case (chunk, i) =>
      val qs = chunk.mkString("{", ",", "}")
      s"""{"metric":"queries_part","part":${i + 1},"of":${chunks.size},"queries":$qs}"""
    }
    val totalStr = String.format(java.util.Locale.ROOT, "%.2f", Double.box(total))
    val headline = s"""{"metric":"total","value":$totalStr,"unit":"sec","queries":{},"failed":$failedJson,"sf":"$sfDir"}"""
    // Stop Spark BEFORE printing so executor-shutdown log lines can't
    // land after the JSON — the driver parses the final stdout line.
    spark.stop()
    detailLines.foreach(println)
    println(headline)
    System.out.flush()
  }
}
