package graft.operators

/** Single release switch for every per-data-dir session cache the
  * operator families keep (signature/segment/dup-label tables, the
  * token projection, HLL register tables, the ABWD pair table). The
  * caches are intentionally session-long for the gate and bench runs —
  * a long-lived service calls this between corpus versions, and the
  * test/verify mains call it at teardown so no path leaks persisted
  * or checkpointed blocks for the life of the JVM. */
object Caches {

  /** Release a cache entry that is an EAGER LOCAL CHECKPOINT:
    * Dataset.unpersist does not reach a local checkpoint's RDD-level
    * blocks, so release goes through the LogicalRDD handle (the
    * abwdPairCache rule, shared here for every checkpointed cache). */
  def releaseCheckpointed(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false); ()
      case _ => ()
    }

  def clearAll(): Unit = {
    TextOps.clearSignatureCache()
    MixOps.clearTokenCache()
    SketchOps.clearHllRegCache()
    GeoOps.clearAbwdPairCache()
    // the ANN index tables (kNN edges + cluster labels + the
    // NN-descent-refined edges + the persisted walk results) and the
    // graph family's canonical edge projection derived from them —
    // these were the one per-dir cache family missing from the
    // release switch, so a corpus swap in a long-lived session served
    // stale neighbor lists to the eight graph-consuming operators
    AnnOps.clearKnnCache()
    // the streaming family's retained run outputs (per-prefix
    // checkpointed batches) hold persisted blocks like any cache
    graft.streaming.MemorySinks.clearAll()
    // the streaming scorer's fitted-model artifact is per-dir state
    graft.streaming.StreamingMarkovScore.clearModelCache()
    // the streaming span probe's persisted shingle-hash store
    graft.streaming.StreamingSpanDedup.clearIndexCache()
    // the parquet reader metadata cache (plans only, no data blocks)
    graft.sources.Tables.clearTableCache()
  }

  /** Count of per-dir ConcurrentHashMap-keyed-by-String session
    * caches declared across the operator sources. The cache-wiring
    * spec greps the source tree (any qualification of the class name,
    * so an import-shortened declaration can't dodge it) and fails
    * when a NEW cache appears without this constant being bumped —
    * which forces the author to visit this file and wire the cache's
    * release into [[clearAll]] (the defect has now shipped twice: the
    * r15 unigram fit cache and the ANN kNN/cluster/edge family were
    * both missing from the switch, serving stale per-dir tables after
    * a corpus swap). */
  val WiredCaches = 22
}
