package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned-directory sink — the storage-side half of
  * PARTITION PRUNING, the single biggest scan-cost lever at 100 TB:
  * a corpus laid out as `path/source=X/lang=Y/...parquet` lets any
  * query with a predicate on the partition columns skip whole
  * directories at PLANNING time (the files are never listed into the
  * scan, visible as `PartitionFilters` in the plan — distinct from
  * row-group predicate pushdown, which still reads footers).
  *
  * Partition-column choice is a layout decision with two hard rules:
  * (1) partition ONLY on low-cardinality columns every consumer
  * filters on (source, language, date) — a high-cardinality partition
  * key creates millions of small files and kills the driver's listing;
  * (2) expect skew — a `source=common_crawl` directory will dwarf
  * `source=wikipedia`, which is fine for pruning (the skew is handled
  * by split planning WITHIN the directory, `maxPartitionBytes`), but
  * means partition dirs are NOT units of parallelism.
  *
  * The files are plain parquet readable by any engine; the layout is
  * the interface. */
object PartitionedSink {

  /** Write `df` partitioned by `cols` (directory-encoded). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Read a partitioned layout back; predicates on the partition
    * columns prune directories at planning time (spec-pinned via
    * `PartitionFilters` + the pruned scan's file count). */
  def readPartitioned(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)
}
