package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table sink — the storage-side half of the 100 TB join
  * strategy. Writing both sides of a recurring equi-join bucketed (and
  * sorted) on the join key lets Spark plan a sort-merge join with ZERO
  * exchanges and ZERO per-query sorts: the shuffle is paid ONCE at
  * write time and amortized over every subsequent join, which is how a
  * production pipeline hosts its persisted signature/label/centroid
  * tables (the ones the dedup and ANN families re-join every ingest).
  *
  * Bucket pruning also applies: a point lookup on the bucket key scans
  * 1/nBuckets of the data. Bucket count is a layout decision — size so
  * each bucket file lands in the 128 MB - 1 GB range at the target
  * corpus scale (buckets = corpus_bytes / target_file_size), NOT at
  * the cores of any one job: bucket count caps usable join
  * parallelism, so it is chosen for the largest consumer.
  *
  * Spark only recognizes co-located buckets through the catalog, so
  * the sink writes managed tables (`saveAsTable`); the parquet files
  * underneath remain plain parquet readable by any engine.
  */
object BucketedSink {

  /** Write `df` as a bucketed + in-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — with both
    * sides bucketed and sorted on `key` with equal bucket counts, the
    * planned sort-merge join has no Exchange and no Sort (asserted by
    * the plan-shape spec). */
  def coLocatedJoin(s: SparkSession, left: String, right: String, key: String): DataFrame =
    s.table(left).join(s.table(right), Seq(key))
}
