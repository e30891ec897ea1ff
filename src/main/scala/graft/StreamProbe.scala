package graft

/** Dev scratch: run one streaming query twice and print the second
  * run's wall time plus the per-phase duration breakdown Spark records
  * in every StreamingQueryProgress (addBatch / getBatch / walCommit /
  * queryPlanning / commitOffsets / triggerExecution) — attributes a
  * streaming operator's cost to batch execution vs stream machinery.
  * Usage: graft.StreamProbe <name>[,<name>...] [sfDir] */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val progress = scala.collection.mutable.ArrayBuffer[String]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        progress += s"batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}"
      }
    })
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).queryExecution.toRdd.count() // warm
      progress.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"$n wall=$wall%.2f")
      progress.foreach(p => println(s"  $p"))
    }
    spark.stop()
  }
}
