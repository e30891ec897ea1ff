package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev utility: time the named queries (3 runs each after a warmup)
  * on SPARK_GRAFT_SF_DIR — the single-query complement of [[Bench]]
  * for plan iteration. `run-main graft.TimeOne q1 q2 ...`
  *
  * Each run also prints per-run stage-metric deltas (executor-core
  * seconds, task GC seconds, disk+mem spill MB, shuffle MB) so a slow
  * outlier can be attributed: CPU-bound (interpreted codegen), GC,
  * spill, or pure wall-wait (disk/scheduler contention). */
object TimeOne {

  private final class Agg extends SparkListener {
    val exec = new AtomicLong; val gc = new AtomicLong
    val spill = new AtomicLong; val shuf = new AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        exec.addAndGet(m.executorRunTime); gc.addAndGet(m.jvmGCTime)
        spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
        shuf.addAndGet(m.shuffleWriteMetrics.bytesWritten + m.shuffleReadMetrics.totalBytesRead)
      }
    }
    def snap: Seq[Long] = Seq(exec.get, gc.get, spill.get, shuf.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = Sessions.local()
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    for (n <- args) {
      val fn = SparkEntry.queries(n)
      def one(): (Double, Seq[Long]) = {
        val before = agg.snap
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // drain async listener bus
        (wall, agg.snap.zip(before).map { case (a, b) => a - b })
      }
      one() // warmup
      val ts = (1 to runsPer).map(_ => one())
      val med = ts.map(_._1).sorted.apply(runsPer / 2)
      println(f"TIME $n%-28s median=$med%7.2f  runs=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
      for (((w, Seq(e, g, sp, sh)), i) <- ts.zipWithIndex)
        println(f"  run${i + 1}: wall=$w%6.2f  exec_core_s=${e / 1000.0}%7.1f  gc_s=${g / 1000.0}%5.1f" +
          f"  spill_mb=${sp / 1048576}%5d  shuffle_mb=${sh / 1048576}%5d")
    }
    spark.stop()
  }
}
