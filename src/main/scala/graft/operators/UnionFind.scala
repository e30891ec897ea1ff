package graft.operators

import org.apache.spark.sql.DataFrame

/** Driver-tail union-find shared by the connected-component operators
  * (`dup_clusters` in TextOps, `semantic_clusters` in AnnOps — the
  * ABWD-tail pattern: below the edge-count gate the component
  * structure is driver-sized, and a single union-find beats per-round
  * distributed job latency).
  *
  * Two hazards of the previous per-call-site implementation are closed
  * here, once, for both callers:
  *
  *  1. `find` is ITERATIVE (walk the parent chain to the root, then a
  *     second pass re-pointing every visited node at the root) and
  *     unions are BY SIZE, so tree depth is O(log n) even before
  *     compression. The old recursive find compressed only on the
  *     unwind and unioned by arbitrary root, so a long near-dup chain
  *     — exactly the case the tail gate admits at its 4M-edge limit —
  *     could recurse millions of frames deep and kill the driver with
  *     a StackOverflowError.
  *  2. Edges are collected via `toLocalIterator` into PRIMITIVE long
  *     arrays: each Row is released as soon as its two longs are
  *     copied out, so the steady driver footprint is 16 bytes/edge
  *     (64 MB at the 4M gate) rather than a retained array of boxed
  *     GenericRows (~100+ bytes each, several hundred MB transient).
  *     The vertex index (open-addressed long->int table, load <= 0.5)
  *     adds <= 24 bytes/slot over <= 2*edges vertices — ~400 MB worst
  *     case all-in at the gate, sized for the driver heap.
  */
private[graft] object UnionFind {

  /** Collect a two-long-column edge DataFrame (column order: src, dst)
    * and return one (vertexId, minVertexIdOfComponent) row per DISTINCT
    * vertex that appears in an edge — the non-singleton label rows the
    * tail ships back (singletons never enter the edge list and keep
    * their own id via the caller's left join). */
  def minLabels(edges: DataFrame): Seq[(Long, Long)] = {
    // 1. stream the edges into primitive arrays
    var cap = 1 << 16
    var ea = new Array[Long](cap)
    var eb = new Array[Long](cap)
    var n = 0
    val it = edges.toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      if (n == cap) {
        cap <<= 1
        ea = java.util.Arrays.copyOf(ea, cap)
        eb = java.util.Arrays.copyOf(eb, cap)
      }
      ea(n) = r.getLong(0)
      eb(n) = r.getLong(1)
      n += 1
    }

    // 2. index vertices: open-addressed long->int, power-of-two
    //    capacity, load factor <= 0.5 (vertices <= 2n)
    var tcap = 64
    while (tcap < 4L * math.max(n, 1)) tcap <<= 1
    val mask = tcap - 1
    val keys = new Array[Long](tcap)
    val slotUsed = new Array[Boolean](tcap)
    val slotIdx = new Array[Int](tcap)
    val ids = new Array[Long](2 * math.max(n, 1))
    var nv = 0
    def indexOf(id: Long): Int = {
      var h = (java.lang.Long.hashCode(id * 0x9e3779b97f4a7c15L)) & mask
      while (slotUsed(h) && keys(h) != id) h = (h + 1) & mask
      if (slotUsed(h)) slotIdx(h)
      else {
        keys(h) = id; slotUsed(h) = true; slotIdx(h) = nv
        ids(nv) = id; nv += 1; nv - 1
      }
    }

    val parent = new Array[Int](2 * math.max(n, 1))
    val size = new Array[Int](2 * math.max(n, 1))

    // 3. iterative find: walk to the root, then compress the path
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }

    var i = 0
    while (i < n) {
      val a = indexOf(ea(i)); val b = indexOf(eb(i))
      // lazy-init union-find cells as vertices appear
      if (size(a) == 0) { parent(a) = a; size(a) = 1 }
      if (size(b) == 0) { parent(b) = b; size(b) = 1 }
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (size(ra) < size(rb)) { parent(ra) = rb; size(rb) += size(ra) }
        else { parent(rb) = ra; size(ra) += size(rb) }
      }
      i += 1
    }

    // 4. min vertex id per component root, then one label row/vertex
    val minLbl = new Array[Long](nv)
    java.util.Arrays.fill(minLbl, Long.MaxValue)
    i = 0
    while (i < nv) {
      val r = find(i)
      if (ids(i) < minLbl(r)) minLbl(r) = ids(i)
      i += 1
    }
    val out = new Array[(Long, Long)](nv)
    i = 0
    while (i < nv) { out(i) = (ids(i), minLbl(find(i))); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }
}
