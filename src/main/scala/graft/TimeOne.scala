package graft

/** Dev utility: time the named queries (3 runs each after a warmup)
  * on SPARK_GRAFT_SF_DIR — the single-query complement of [[Bench]]
  * for plan iteration. `run-main graft.TimeOne q1 q2 ...` */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    for (n <- args) {
      val fn = SparkEntry.queries(n)
      def one(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      one() // warmup
      val ts = (1 to 3).map(_ => one())
      println(f"TIME $n%-28s median=${ts.sorted.apply(1)}%7.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
