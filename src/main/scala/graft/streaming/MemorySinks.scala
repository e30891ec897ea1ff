package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession

/** Per-run memory-sink naming with garbage collection: every streaming
  * operator registers its AvailableNow result as `<prefix>_N` (a fresh
  * name per run — a memory sink cannot be re-opened), and through r16
  * the previous runs' tables were never dropped, so repeated
  * invocations in a long-lived session accumulated unbounded driver
  * memory across the whole streaming family. [[next]] drops run N−1's
  * temp view before handing out run N's name: callers consume the
  * returned table eagerly (collect/compare within the call), so the
  * only state worth keeping is the CURRENT run's — the gate's replay
  * semantics read the fresh run, never a stale sink. */
object MemorySinks {
  def next(s: SparkSession, prefix: String, seq: AtomicInteger): String = {
    val n = seq.incrementAndGet()
    if (n > 1) s.catalog.dropTempView(s"${prefix}_${n - 1}")
    s"${prefix}_$n"
  }
}
