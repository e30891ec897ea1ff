package graft
/** Benchmark main: a warmup pass absorbs codegen/executor spin-up,
  * then each query is timed three times and the MEDIAN reported —
  * per-query jitter on a shared box is 2-4x (adjudicated in round 3:
  * a 43 s outlier was machine contention), and the median of three
  * makes a single contended run unable to corrupt the headline.
  * Prints ONE JSON line for the driver. */
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
    // ms precision: full-precision doubles double the line length for
    // noise digits, and the driver's tail is the scarce resource.
    val qs = medians.map { case (k, v) =>
      "\"" + k + "\":" + v.fold("null")(x =>
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(x)))
    }.mkString("{", ",", "}")
    val total = medians.flatMap(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Two stdout lines, headline LAST: the driver keeps a fixed tail
    // of stdout and parses its final line, so a single ~2.5 kB line
    // carrying the full per-query map gets its FRONT truncated off →
    // `parsed: null` (rounds 1-6). The detail map goes on its own
    // line first; the compact headline (a few hundred bytes, always
    // intact inside any reasonable tail) closes the stream.
    val detailLine = s"""{"metric":"queries","unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    val headline = s"""{"metric":"total","value":$total,"unit":"sec","queries":{},"failed":$failedJson,"sf":"$sfDir"}"""
    // Stop Spark BEFORE printing so executor-shutdown log lines can't
    // land after the JSON — the driver parses the final stdout line.
    spark.stop()
    println(detailLine)
    println(headline)
    System.out.flush()
  }
}
