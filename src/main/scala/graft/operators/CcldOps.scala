package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryFn
import graft.functions.Portable
import graft.model.Catalog

/** Seeded Monte-Carlo focal-mechanism sampling — the verifiable core
  * of the reference's CCLD nodal-plane simulation
  * (`/root/reference/CCLD/ccldpy.py`: per-event stochastic draws of
  * strike/dip/rake, aggregated to a preferred mechanism).
  *
  * The reference samples with numpy RNG; a distributed engine needs
  * draws that are (a) independent of partitioning, (b) reproducible
  * across retries, (c) auditable. Counter-based hashing gives all
  * three: draw k of event e uses uniform u = h60("e_k") scaled to the
  * parameter range — no RNG state, so the explode parallelizes
  * embarrassingly and the DuckDB oracle replays the identical stream.
  * Aggregates are exact (integer hash sums, one final division).
  */
object CcldOps {

  val NSamples = 32
  val UScale   = 1000000L // hash reduced to [0, UScale) before scaling

  def ccldSample(s: SparkSession, d: String): DataFrame = {
    val draws = Catalog.events(s, d)
      .select(col("evid"), explode(sequence(lit(0), lit(NSamples - 1))).as("k"))
      .select(col("evid"), col("k"),
        (Portable.h60(concat(col("evid").cast("string"), lit("_s"), col("k").cast("string"))) % UScale).as("u1"),
        (Portable.h60(concat(col("evid").cast("string"), lit("_d"), col("k").cast("string"))) % UScale).as("u2"),
        (Portable.h60(concat(col("evid").cast("string"), lit("_r"), col("k").cast("string"))) % UScale).as("u3"))
    draws.groupBy(col("evid"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("u1")).as("su1"), sum(col("u2")).as("su2"), sum(col("u3")).as("su3"),
        min(col("u1")).as("mn1"), max(col("u1")).as("mx1"))
      .select(col("evid"), col("n_samples"),
        (col("su1").cast("double") * 360.0 / (UScale * NSamples).toDouble).as("strike_mean"),
        (col("su2").cast("double") * 90.0 / (UScale * NSamples).toDouble).as("dip_mean"),
        (col("su3").cast("double") * 360.0 / (UScale * NSamples).toDouble - 180.0).as("rake_mean"),
        (col("mn1").cast("double") * 360.0 / UScale.toDouble).as("strike_min"),
        (col("mx1").cast("double") * 360.0 / UScale.toDouble).as("strike_max"))
  }

  val queries: Map[String, QueryFn] = Map("ccld_sample" -> (ccldSample _))

  private def uSql(tag: String): String =
    s"(${Portable.h60Sql(s"CAST(evid AS VARCHAR) || '_$tag' || CAST(t.k AS VARCHAR)")} % $UScale)"

  val oracles: Map[String, String] = Map(
    "ccld_sample" -> Catalog.oracle(
      s"""SELECT evid, count(*) AS n_samples,
         |  CAST(sum(u1) AS DOUBLE) * 360e0 / ${UScale * NSamples}e0 AS strike_mean,
         |  CAST(sum(u2) AS DOUBLE) * 90e0 / ${UScale * NSamples}e0 AS dip_mean,
         |  CAST(sum(u3) AS DOUBLE) * 360e0 / ${UScale * NSamples}e0 - 180e0 AS rake_mean,
         |  CAST(min(u1) AS DOUBLE) * 360e0 / ${UScale}e0 AS strike_min,
         |  CAST(max(u1) AS DOUBLE) * 360e0 / ${UScale}e0 AS strike_max
         |FROM (
         |  SELECT evid, ${uSql("s")} AS u1, ${uSql("d")} AS u2, ${uSql("r")} AS u3
         |  FROM gm_events, range(0, $NSamples) t(k)
         |) GROUP BY evid""".stripMargin)
  )
}
