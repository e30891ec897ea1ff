package graft

import org.apache.spark.sql.DataFrame

/** Audit tool: exact-top-k recall of each ANN configuration against
  * the brute-force cosine baseline (the SURVEY §5 recall/cost table).
  *
  *   java ... graft.AnnRecall [sfDir]
  *
  * Recall = |approx ∩ exact| / |exact| over all queries' top-10. */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = Sessions.local()
    import graft.operators.AnnOps

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = pairs(AnnOps.annCosineTopk(spark, sfDir))
    def report(name: String, df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val got = pairs(df)
      val secs = (System.nanoTime() - t0) / 1e9
      val rec = got.intersect(exact).size.toDouble / exact.size
      println(f"RECALL $name%-34s recall=$rec%5.3f candidates_kept=${got.size}%6d time=$secs%6.2fs")
    }

    for (p <- Seq(6, 8, 10)) {
      report(s"lsh k=$p", AnnOps.annLshTopkWith(spark, sfDir, p))
      report(s"lsh k=$p multiprobe r=1", AnnOps.annLshMultiprobeWith(spark, sfDir, p))
      report(s"lsh k=$p multiprobe r=2", AnnOps.annLshMultiprobeWith(spark, sfDir, p, radius = 2))
    }
    report("lsh k=8 multiprobe r=3", AnnOps.annLshMultiprobeWith(spark, sfDir, 8, radius = 3))
    for ((cells, probe) <- Seq((8, 1), (8, 2), (16, 4), (64, 8), (64, 16), (256, 32)))
      report(s"ivf cells=$cells probe=$probe", AnnOps.annIvfTopkWith(spark, sfDir, cells, probe))
    spark.stop()
  }
}
