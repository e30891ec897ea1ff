package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Benchmark main: a warmup pass absorbs codegen/executor spin-up,
  * then each query is timed three times and the MEDIAN reported —
  * per-query jitter on a shared box is 2-4x (adjudicated in round 3:
  * a 43 s outlier was machine contention), and the median of three
  * makes a single contended run unable to corrupt the headline.
  *
  * Stdout contract, ordered so that a fixed-size TAIL of stdout (the
  * driver keeps ~2 kB and parses the FINAL line for the headline)
  * always contains every per-query number:
  *   1. named `queries_part` detail chunks (~2.4 kB total) — human
  *      friendly, may be front-truncated by the tail, that's fine;
  *   2. one `prop_diag` line — driver-side evidence for the
  *      propagation_table wall-time anomaly (3 rounds of 32-35 s on
  *      the driver vs 13-16 s local): all three timed runs, an extra
  *      run BEFORE and AFTER the suite (suite-ordering probe), and
  *      stage-metric totals (disk/mem spill, shuffle bytes, executor
  *      time) for the timed runs;
  *   3. one compact `medians` line: values-only array in ascending
  *      query-name order (the SAME sorted order as the named chunks /
  *      CORRECTNESS entries / SparkEntry.queries.keys.sorted) — ~0.6 kB
  *      carries all 92 numbers even when every named chunk is cut;
  *   4. the `total` headline LAST (driver parses the final line).
  * Lines 2-4 total ~1 kB, inside any plausible tail. */
object Bench {

  /** Accumulates task metrics across completed stages. Listener events
    * are posted asynchronously; reads are taken after a short drain
    * sleep, which is fine for whole-run diagnostic totals. */
  private final class StageAgg extends SparkListener {
    val spillDisk = new AtomicLong
    val spillMem = new AtomicLong
    val shuffle = new AtomicLong
    val execMs = new AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        spillDisk.addAndGet(m.diskBytesSpilled)
        spillMem.addAndGet(m.memoryBytesSpilled)
        shuffle.addAndGet(m.shuffleWriteMetrics.bytesWritten + m.shuffleReadMetrics.totalBytesRead)
        execMs.addAndGet(m.executorRunTime)
      }
    }
    def snapshot: Seq[Long] = Seq(spillDisk.get, spillMem.get, shuffle.get, execMs.get)
  }

  private def fmt(x: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val agg = new StageAgg
    spark.sparkContext.addSparkListener(agg)
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
    val Prop = "propagation_table"
    // Adaptive warmup: with map stages now running 32-wide, a cold
    // query's first executions burn interpreted codegen on EVERY core
    // until the C2 compile queue drains (measured 205 core-s cold vs 9
    // hot on quality_gopher) — one fixed warmup pass is not always
    // enough to reach steady state when the whole suite is queued.
    // Re-run each query while it is still speeding up >1.4x (max 4
    // runs) so the timed medians measure the hot engine, not the JIT.
    names.foreach { n =>
      var prev = time(SparkEntry.queries(n))
      var i = 1
      var cur = prev
      do { prev = cur; cur = time(SparkEntry.queries(n)); i += 1 }
      while (i < 4 && cur >= 0 && prev >= 0 && prev / math.max(cur, 1e-9) > 1.4)
    }
    // ordering probe: propagation_table right after warmup, before the
    // suite touches anything else (cold-position measurement)
    val propFirst = time(SparkEntry.queries(Prop))
    // A query that fails ANY of its 3 runs is reported as null and
    // excluded from the total — a -1 sentinel must not participate in
    // the median (an intermittent failure would still yield a "real"
    // median) nor be summed into the headline.
    var propRuns: Seq[Double] = Nil
    var propMetrics: Seq[Long] = Nil
    val results = names.map { n =>
      if (n == Prop) {
        val before = agg.snapshot
        val runs = (1 to 3).map(_ => time(SparkEntry.queries(n)))
        Thread.sleep(500) // drain the async listener bus
        propMetrics = agg.snapshot.zip(before).map { case (a, b) => a - b }
        propRuns = runs
        n -> runs
      } else n -> (1 to 3).map(_ => time(SparkEntry.queries(n)))
    }
    // ordering probe: once more after the whole suite (hot position)
    val propLast = time(SparkEntry.queries(Prop))
    val medians = results.map { case (n, runs) =>
      n -> (if (runs.forall(_ >= 0)) Some(runs.sorted.apply(1)) else None)
    }
    val failed = medians.collect { case (n, None) => n }
    // 2-decimal precision: full-precision doubles double the line
    // length for noise digits, and the driver's tail is the scarce
    // resource.
    val entries = medians.map { case (k, v) =>
      "\"" + k + "\":" + v.fold("null")(fmt)
    }
    val total = medians.flatMap(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val chunks = entries.grouped(30).toSeq
    val detailLines = chunks.zipWithIndex.map { case (chunk, i) =>
      val qs = chunk.mkString("{", ",", "}")
      s"""{"metric":"queries_part","part":${i + 1},"of":${chunks.size},"queries":$qs}"""
    }
    val Seq(spillD, spillM, shufB, execMs) =
      if (propMetrics.nonEmpty) propMetrics else Seq(0L, 0L, 0L, 0L)
    val propDiag =
      s"""{"metric":"prop_diag","first":${fmt(propFirst)},"runs":[${propRuns.map(fmt).mkString(",")}],""" +
      s""""last":${fmt(propLast)},"spill_disk_mb":${spillD / 1048576},"spill_mem_mb":${spillM / 1048576},""" +
      s""""shuffle_mb":${shufB / 1048576},"exec_core_s":${execMs / 1000}}"""
    // the tail-proof line: all medians, values only, name-ascending
    val compact =
      s"""{"metric":"medians","order":"name_asc","n":${names.size},"sec":[""" +
      medians.map(_._2.fold("null")(fmt)).mkString(",") + "]}"
    val headline = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":{},"failed":$failedJson,"sf":"$sfDir"}"""
    // Stop Spark BEFORE printing so executor-shutdown log lines can't
    // land after the JSON — the driver parses the final stdout line.
    spark.stop()
    detailLines.foreach(println)
    println(propDiag)
    println(compact)
    println(headline)
    System.out.flush()
  }
}
