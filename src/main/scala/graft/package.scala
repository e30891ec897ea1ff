import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** Shape of every SparkEntry.queries entry: (session, sf dir) => result. */
  type QueryFn = (SparkSession, String) => DataFrame
}
