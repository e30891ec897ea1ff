package graft.operators

/** Single release switch for every per-data-dir session cache the
  * operator families keep (signature/segment/dup-label tables, the
  * token projection, HLL register tables, the ABWD pair table). The
  * caches are intentionally session-long for the gate and bench runs —
  * a long-lived service calls this between corpus versions, and the
  * test/verify mains call it at teardown so no path leaks persisted
  * or checkpointed blocks for the life of the JVM. */
object Caches {
  def clearAll(): Unit = {
    TextOps.clearSignatureCache()
    MixOps.clearTokenCache()
    SketchOps.clearHllRegCache()
    GeoOps.clearAbwdPairCache()
  }
}
