package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Generic sources/sinks beyond the driver's parquet star schema —
  * the reference pipeline ingests and publishes CSV flatfiles
  * (`nzgmdb/data_processing/merge_flatfiles.py` readers/writers), so a
  * user switching engines needs the same edges.
  *
  * Scale rules encoded here:
  *  - CSV reads take an explicit schema — `inferSchema` is a full
  *    extra pass over the data and type-drifts between runs.
  *  - Writes partition by the query key (e.g. event year) so
  *    downstream reads prune partitions, and optionally sort within
  *    partitions so parquet min/max row-group stats are selective.
  */
object Io {

  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** JSON-lines source with explicit schema (same rule as CSV: never
    * pay the inference pass, never let types drift). */
  def readJsonLines(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Partitioned (and optionally sorted-within-partition) parquet sink:
    * the layout that makes 100 TB outputs re-readable with partition
    * pruning + row-group skipping rather than full scans. */
  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String],
                              sortCols: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortCols.nonEmpty)
        df.sortWithinPartitions(sortCols.map(df.col): _*)
      else df
    sorted.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
