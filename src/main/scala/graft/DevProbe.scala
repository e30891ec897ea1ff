package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev scratch: run one query and print per-stage core-time so a hot
  * query's cost can be attributed to a specific stage. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val stages = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        stages += ((sc.stageInfo.stageId,
          sc.stageInfo.name.split("\n").head.take(90),
          if (m != null) m.executorRunTime else -1L,
          sc.stageInfo.numTasks))
      }
    })
    val n = args(0)
    val fn = SparkEntry.queries(n)
    fn(spark, sfDir).queryExecution.toRdd.count() // warm (fills caches)
    Thread.sleep(500)
    stages.clear()
    fn(spark, sfDir).queryExecution.toRdd.count()
    Thread.sleep(800)
    stages.sortBy(-_._3).foreach { case (id, nm, ms, nt) =>
      println(f"stage=$id%4d core_ms=$ms%8d tasks=$nt%4d  $nm")
    }
    spark.stop()
  }
}
