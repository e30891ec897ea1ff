package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}
import graft.QueryFn
import graft.sources.Tables

/** Clickstream-style operators over the `events` table: gap-rule
  * sessionization and per-user running aggregates — the batch halves
  * of a training-data pipeline's behavioral features.
  *
  * Scale notes: both operators are a single scan + a single window
  * shuffle keyed by `user_id` (the natural partition key; skewed power
  * users are handled by AQE skew-split since the window partition is
  * hash-distributed). Monetary running sums run over scaled-integer
  * cents: windowed sums over raw doubles are NOT reproducible across
  * engines (segment-tree accumulation order — see dev/PORTABILITY.md)
  * and at cluster scale not even across retries.
  */
object EventOps {

  val GapUs: Long = 30L * 60 * 1000000 // 30-minute session gap

  /** Epoch-microseconds from whatever vintage of `events.ts` the data
    * was written with. The testdata has shipped BOTH encodings across
    * rounds: TIMESTAMP(NANOS) parquet (Spark reads it as a raw
    * nanos-since-epoch long under the session's nanosAsLong setting)
    * and TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
    * TIMESTAMP_NTZ). Branching on the type Spark actually read — not a
    * hardcoded assumption — is what keeps a regeneration from turning
    * into a silent 1000x misscale (round-9 postmortem). The NTZ cast
    * goes through the session timezone, which Sessions.scala pins to
    * UTC, matching DuckDB's epoch_ns(ts). */
  def tsUs(dt: DataType): Column = dt match {
    case LongType                        => expr("ts div 1000").cast("long")
    case TimestampNTZType | TimestampType => unix_micros(col("ts").cast("timestamp"))
    case other =>
      throw new IllegalArgumentException(
        s"events.ts read as unsupported type $other; expected nanos LongType or TIMESTAMP/_NTZ")
  }

  /** Same vintage branch, but producing an event-time TIMESTAMP column
    * (for streaming watermarks / time windows). */
  def tsEventTime(dt: DataType): Column = dt match {
    case LongType                        => timestamp_micros(expr("ts div 1000").cast("long"))
    case TimestampNTZType | TimestampType => col("ts").cast("timestamp")
    case other =>
      throw new IllegalArgumentException(
        s"events.ts read as unsupported type $other; expected nanos LongType or TIMESTAMP/_NTZ")
  }

  /** events with portable microsecond timestamps and integer cents. */
  private def events(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.select(
      col("event_id"), col("user_id"), col("event_type"),
      tsUs(ev.schema("ts").dataType).as("ts_us"),
      expr("cast(round(value * 100) as bigint)").as("cents"))
  }

  private val userW = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
  private val userRunW = userW.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Session assignment: a new session starts when the gap from the
    * previous event of the same user exceeds GapUs. lag + cumulative
    * boundary-sum — one window shuffle, no self-join. */
  def sessionize(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(userW))
      .withColumn("boundary",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > GapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("boundary")).over(userRunW))
      .select("event_id", "user_id", "ts_us", "session_idx")

  /** Per-user running aggregates: event count, cumulative spend
    * (integer cents → exact), running max, plus the final value as
    * dollars (single exact division). */
  def userRunningAggs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("r_count", count(lit(1)).over(userRunW))
      .withColumn("r_cents", sum(col("cents")).over(userRunW))
      .withColumn("r_max_cents", max(col("cents")).over(userRunW))
      .select(col("event_id"), col("user_id"), col("r_count"), col("r_cents"),
        col("r_max_cents"), (col("r_cents").cast("double") / 100.0).as("r_dollars"))

  /** Semi-structured property extraction: `props` is a JSON string
    * column (the usual shape of event payloads); `get_json_object`
    * runs codegen'd per row, no UDF. */
  def eventPropsExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("prop_k"))

  /** Session-level rollup — the product sessionization exists for:
    * per (user, session) event count, duration, exact cent spend.
    * Window pass to assign sessions, then one partial-aggregable
    * groupBy on the same key prefix (no extra repartitioning: the
    * session assignment already clustered rows by user). */
  def sessionStats(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(userW))
      .withColumn("boundary",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > GapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("boundary")).over(userRunW))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
        sum(col("cents")).as("sum_cents"))

  val queries: Map[String, QueryFn] = Map(
    "sessionize"          -> (sessionize _),
    "session_stats"       -> (sessionStats _),
    "user_running_aggs"   -> (userRunningAggs _),
    "event_props_extract" -> (eventPropsExtract _)
  )

  private val evCte =
    """ev AS (
      |  SELECT event_id, user_id, event_type,
      |         epoch_ns(ts) // 1000 AS ts_us,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "event_props_extract" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        |FROM events""".stripMargin,
    "sessionize" ->
      s"""WITH $evCte,
         |lagd AS (
         |  SELECT event_id, user_id, ts_us,
         |         lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
         |  FROM ev),
         |b AS (
         |  SELECT event_id, user_id, ts_us,
         |         CASE WHEN prev_us IS NULL OR ts_us - prev_us > $GapUs THEN 1 ELSE 0 END AS boundary
         |  FROM lagd)
         |SELECT event_id, user_id, ts_us,
         |       CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         |FROM b""".stripMargin,
    "session_stats" ->
      s"""WITH $evCte,
         |lagd AS (
         |  SELECT event_id, user_id, ts_us, cents,
         |         lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
         |  FROM ev),
         |b AS (
         |  SELECT user_id, ts_us, cents,
         |         CASE WHEN prev_us IS NULL OR ts_us - prev_us > $GapUs THEN 1 ELSE 0 END AS boundary,
         |         event_id
         |  FROM lagd),
         |sess AS (
         |  SELECT user_id, ts_us, cents,
         |         CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
         |  FROM b)
         |SELECT user_id, session_idx, count(*) AS n_events,
         |       max(ts_us) - min(ts_us) AS duration_us,
         |       CAST(sum(cents) AS BIGINT) AS sum_cents
         |FROM sess GROUP BY user_id, session_idx""".stripMargin,
    "user_running_aggs" ->
      s"""WITH $evCte
         |SELECT event_id, user_id,
         |  count(*) OVER w AS r_count,
         |  CAST(sum(cents) OVER w AS BIGINT) AS r_cents,
         |  max(cents) OVER w AS r_max_cents,
         |  CAST(sum(cents) OVER w AS DOUBLE) / 100e0 AS r_dollars
         |FROM ev
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
  )
}
