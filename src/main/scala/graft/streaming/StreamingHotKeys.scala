package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import graft.operators.EventOps

/** Streaming hot-key detector — the continuously-maintained twin of
  * [[graft.operators.EventOps.hotKeys]]: per user a MONOTONE COUNTER
  * survives across micro-batches (one long per key, bounded by key
  * cardinality like the latest-value store), each batch emitting the
  * key's refreshed running count. The seventh stateful pattern in the
  * streaming family, and the one that shows where state machines END:
  * the top-K + share selection needs CROSS-key information no per-key
  * state can see, so it runs as a bounded BATCH query over the final
  * emissions (counts only grow, so a key's final state is its max
  * emission) — per-key state for the unbounded part, post-selection
  * for the K-row part. Under `Trigger.AvailableNow` the final counts
  * are the full-corpus counts, so the batch `hot_keys` DuckDB oracle
  * checks the result verbatim; the count fold is associative, so the
  * outcome is micro-batch-split-proof (pinned by the spec's forced
  * 2-batch run). */
object StreamingHotKeys {

  final case class Ev(user_id: Long)
  /** Pre-combined per-user count — what actually crosses the state
    * shuffle since the r17 map-side combine. */
  final case class UserCnt(user_id: Long, n: Long)
  final case class CountState(n: Long)
  final case class Out(user_id: Long, n: Long)

  /** Map-side combine (r17 optimization round, guide §2.3): counts
    * ADD, so each scan partition collapses its event rows to one
    * (user, n) partial per key before the state shuffle. */
  def combine(rows: Iterator[Ev]): Iterator[UserCnt] = {
    val acc = scala.collection.mutable.HashMap.empty[Long, Long]
    rows.foreach(r => acc(r.user_id) = acc.getOrElse(r.user_id, 0L) + 1L)
    acc.iterator.map { case (u, n) => UserCnt(u, n) }
  }

  def fold(key: Long, rows: Iterator[UserCnt],
           state: GroupState[CountState]): Iterator[Out] = {
    val n = state.getOption.map(_.n).getOrElse(0L) + rows.map(_.n).sum
    state.update(CountState(n))
    Iterator.single(Out(key, n))
  }

  private val runSeq = new AtomicInteger(0)

  def countStream(s: SparkSession, srcGlob: String,
                  schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import s.implicits._
    s.readStream.schema(schema).parquet(srcGlob)
      .select(col("user_id")).as[Ev]
      .mapPartitions(combine)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
      .toDF()
  }

  /** Final counts (max emission per key — counters are monotone) →
    * the same top-K + one-row-total share arithmetic as the batch
    * operator. */
  def select(emissions: DataFrame): DataFrame = {
    val cnt = emissions.groupBy(col("user_id")).agg(max(col("n")).as("n"))
    val tot = cnt.agg(sum(col("n")).as("total"))
    cnt.orderBy(col("n").desc, col("user_id")).limit(EventOps.HotK)
      .crossJoin(broadcast(tot))
      .select(col("user_id"), col("n"),
        expr("(n * 1000000) div total").cast("long").as("share_ppm"))
  }

  def run(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    select(MemorySinks.runAvailableNow(s,
      countStream(s, s"$dir/[e]vents.parquet", schema), "stream_hot", runSeq)._2)
  }
}
