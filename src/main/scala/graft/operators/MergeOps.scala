package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryFn
import graft.model.Catalog
import graft.sources.Tables

/** Flatfile assembly: the reference's main product
  * (`nzgmdb/data_processing/merge_flatfiles.py`).
  *
  * - `merge_flatfile` (`merge_flatfiles.py:14,154`): record x event x
  *   station x provenance-dimension join. Fact-to-fact on evid; every
  *   dimension side is broadcast (station/customer/nation at 100 TB
  *   remain dimension-sized), so the only shuffle is the fact join.
  * - `ground_level_argmin` (`merge_flatfiles.py:384 custom_idxmin`):
  *   per-(evid, sta) pick the record whose elevation is closest to
  *   ground level, nulls last — a window argmin, not a groupby+rejoin.
  * - `im_pivot` (`merge_flatfiles.py:58 groupby.unstack`): channel
  *   components to columns via groupBy().pivot() with explicit values
  *   (explicit pivot values keep the plan a single pass — no extra
  *   distinct-scan to discover them).
  * - `db_upsert` (`merge_flatfiles.py:696 merge_dbs`): keep-last merge
  *   of two DB versions by record_id — union + window, no driver loop.
  * - `flatfile_semi_filter` (`quality_db.py:15`): catalogue-membership
  *   filtering as a left-semi join (EXISTS), which Spark executes
  *   broadcast-side when the filtered catalogue is small.
  * - `site_table_dedup` (`data_retrieval/sites.py:18,122`): unique
  *   site row per station, keep lowest location code.
  */
object MergeOps {

  val SemiMagMin = 5.0

  def mergeFlatfile(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Sdof
    // pSA columns (the reference flatfile's dominant payload) computed
    // on the fact side BEFORE the joins: 4 doubles cross the shuffle
    // instead of the 16-element series they reduce.
    // fmin_max / HPF (`merge_flatfiles.py:507-510`: the published
    // high-pass corner is the max component fmin / 1.25) — computed
    // on the fact side over the record's channel siblings; the window
    // keys a (evid, sta) shuffle the downstream evid join reuses
    // partially (1.25 = 2^-2·5 is binary-exact, division identical
    // cross-engine).
    val chanW = Window.partitionBy(col("evid"), col("sta"))
    val r = Catalog.records(s, dir)
      .withColumn("ps", expr(Sdof.psSpark))
      .withColumns(Sdof.Periods.map(t =>
        Sdof.colName(t) -> Sdof.psaCol(t, col("ps"))).toMap)
      .drop("ps")
      .withColumn("fmin_max", max(col("fmin")).over(chanW))
      .withColumn("hpf", col("fmin_max") / 1.25)
    val st = Catalog.stations(s, dir)
    // Single orders scan: carry the provenance key (o_custkey) alongside
    // the event-catalogue derivation instead of re-scanning orders.
    val ev = Tables.orders(s, dir).select(
      col("o_orderkey").cast("long").as("evid"),
      (lit(3.0) + (col("o_orderkey") % 30) / lit(10.0)).as("mag"),
      (lit(-47.0) + (col("o_orderkey") % 1200) / lit(100.0)).as("ev_lat"),
      (lit(166.0) + (col("o_orderkey") % 1300) / lit(100.0)).as("ev_lon"),
      (col("o_orderkey") % 100).cast("double").as("ev_depth"),
      col("o_custkey"))
    // customer grows with the dataset (unlike nation/stations), so no
    // explicit broadcast hint — AQE picks broadcast only while it fits.
    val c  = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val n  = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name").as("network"))
    r.join(ev, Seq("evid"))
      // station count is physically bounded (a few thousand instruments
      // nationwide, cf. sites.py), so the broadcast hint is safe at scale.
      .join(broadcast(st), Seq("sta"), "left")
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(Seq(col("record_id"), col("evid"), col("sta"), col("chan"),
        col("mag"), col("ev_lat"), col("ev_lon"), col("ev_depth"),
        col("sta_lat"), col("sta_lon"), col("sta_vs30"),
        col("score_x"), col("fmin"), col("fmin_max"), col("hpf"), col("network")) ++
        graft.functions.Sdof.Periods.map(t => col(graft.functions.Sdof.colName(t))): _*)
  }

  private val argminWin =
    Window.partitionBy(col("evid"), col("sta"))
      .orderBy(col("loc_elev").isNull.cast("int"), abs(col("loc_elev")), col("lnum"), col("pk"))

  def groundLevelArgmin(s: SparkSession, dir: String): DataFrame =
    Catalog.records(s, dir)
      .withColumn("rn", row_number().over(argminWin))
      .filter(col("rn") === 1)
      .select("evid", "sta", "record_id", "loc_elev")

  def imPivot(s: SparkSession, dir: String): DataFrame =
    Catalog.records(s, dir)
      .groupBy(col("evid"), col("sta"))
      .pivot("chan", Seq("HN", "BN"))
      .agg(max(col("im_val")))
      .select(col("evid"), col("sta"), col("HN").as("im_hn"), col("BN").as("im_bn"))

  /** The UNPIVOT (melt) inverse of [[imPivot]]: wide per-channel
    * columns back to long (evid, sta, chan, im_val) rows — the
    * publication direction runs wide (flatfiles), the processing
    * direction runs long (per-channel kernels), and a real pipeline
    * round-trips between them constantly. Spark's `stack(n, k1, v1,
    * ...)` expression is the codegen'd melt (one Generate node, no
    * shuffle, row growth = channel count); rows whose channel value is
    * NULL after the pivot (the channel never existed for that station)
    * are dropped, so pivot→melt is lossless on the defined cells. */
  def imMelt(s: SparkSession, dir: String): DataFrame =
    imPivot(s, dir)
      .select(col("evid"), col("sta"),
        expr("stack(2, 'HN', im_hn, 'BN', im_bn) AS (chan, im_val)"))
      .filter(col("im_val").isNotNull)

  /** Horizontal-component combination on top of the pivot (the
    * reference publishes rotd/geom combinations of the two horizontal
    * components, `merge_flatfiles.py` component columns): SRSS-mean
    * and geometric mean, null when either component is missing.
    * sqrt/multiply only — bit-exact cross-engine. */
  def imComponentCombo(s: SparkSession, dir: String): DataFrame =
    imPivot(s, dir).select(col("evid"), col("sta"), col("im_hn"), col("im_bn"),
      sqrt((col("im_hn") * col("im_hn") + col("im_bn") * col("im_bn")) / 2).as("im_srss"),
      sqrt(col("im_hn") * col("im_bn")).as("im_geom"))

  /** Two synthetic DB versions with overlapping keys; later version
    * wins per record_id. */
  def dbUpsert(s: SparkSession, dir: String): DataFrame = {
    val r = Catalog.records(s, dir)
    val v1 = r.filter(col("lnum") <= 4)
      .select(col("record_id"), lit(1L).as("version"), col("im_val").as("im"))
    val v2 = r.filter(col("lnum") >= 3)
      .select(col("record_id"), lit(2L).as("version"), (col("im_val") * 2).as("im"))
    val w = Window.partitionBy(col("record_id")).orderBy(col("version").desc)
    v1.unionByName(v2)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("record_id", "version", "im")
  }

  def flatfileSemiFilter(s: SparkSession, dir: String): DataFrame = {
    val bigEvents = Catalog.events(s, dir).filter(col("mag") >= SemiMagMin).select("evid")
    Catalog.records(s, dir)
      .join(bigEvents, Seq("evid"), "left_semi")
      .select("record_id", "evid", "sta", "chan")
  }

  def siteTableDedup(s: SparkSession, dir: String): DataFrame = {
    val sites = Catalog.records(s, dir)
      .groupBy(col("sta"), col("loc"))
      .agg(min(col("loc_elev")).as("elev"))
    val w = Window.partitionBy(col("sta")).orderBy(col("loc"))
    sites.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("sta", "loc", "elev")
  }

  def phaseArrivalSemi(s: SparkSession, dir: String): DataFrame = {
    // Phase-arrival table (`phase_arrival/gen_phase_arrival_table.py:71`):
    // records with an R-flagged trace carry a pick; membership check is
    // a semi-join (`quality_db.py:55`). The join runs on the fixed-width
    // numeric composite key (evid, sta, lnum, pk) — which determines
    // record_id — so the shuffle never moves high-cardinality strings;
    // record_id stays an output column only.
    val r = Catalog.records(s, dir)
    val phases = r.filter(col("rflag") === "R").select("evid", "sta", "lnum", "pk")
    r.filter(col("chan") === "HN")
      .join(phases, Seq("evid", "sta", "lnum", "pk"), "left_semi")
      .select("record_id", "evid", "sta", "lnum")
  }

  /** Referential-integrity audit across the text/embedding modality
    * pair: every corpus id classified as carried by both tables, text
    * only, or embedding only — the reconcile report run before any
    * join-dependent stage (a silent id drift between modalities
    * otherwise surfaces as quietly shrunken inner joins). One
    * FULL OUTER equi-join projected to a 3-row report; both sides
    * shuffle-partition on the id, counts partial-aggregate. */
  def integrityAudit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"))
      .join(Tables.embeddings(s, d).select(col("vec_id")),
        col("doc_id") === col("vec_id"), "full_outer")
      .select(
        when(col("doc_id").isNotNull && col("vec_id").isNotNull, "both")
          .when(col("doc_id").isNotNull, "doc_only")
          .otherwise("vec_only").as("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** CDC APPLY with deletes — the missing half of `db_upsert`'s
    * keep-last story: a changelog of upserts AND delete markers
    * applied to produce the live snapshot. Keep-last picks each key's
    * final operation; keys whose final op is a DELETE leave the
    * snapshot entirely (a delete is position-sensitive: an earlier
    * delete is overridden by a later upsert, which the keep-last
    * window gets right for free). Same single window shuffle on the
    * key as `db_upsert`; the op column costs nothing extra. */
  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    val r = Catalog.records(s, dir)
    val v1 = r.filter(col("lnum") <= 4)
      .select(col("record_id"), lit(1L).as("version"), lit("U").as("op"),
        col("im_val").as("im"))
    val v2 = r.filter(col("lnum") >= 3)
      .select(col("record_id"), lit(2L).as("version"), lit("U").as("op"),
        (col("im_val") * 2).as("im"))
    val v3 = r.filter(col("lnum") === 4)
      .select(col("record_id"), lit(3L).as("version"), lit("D").as("op"),
        lit(null).cast("double").as("im"))
    val w = Window.partitionBy(col("record_id")).orderBy(col("version").desc)
    v1.unionByName(v2).unionByName(v3)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("op") =!= "D")
      .select("record_id", "version", "im")
  }

  val FuzzyBlockLen = 3 // blocking prefix for the fuzzy self-join
  val FuzzyMaxLev   = 1 // edit-distance match threshold

  /** Fuzzy RECORD LINKAGE over source names: every pair of distinct
    * source labels within edit distance [[FuzzyMaxLev]] — the
    * catalog-reconciliation shape (two ingests of the same registry
    * with typos/renames) that exact joins miss entirely. The scale
    * rule is BLOCKING: candidates come from an equi-join on a cheap
    * block key (here the length-[[FuzzyBlockLen]] prefix), so the
    * quadratic edit-distance verify runs only inside blocks — the
    * same never-all-pairs discipline as the LSH dedup family, with
    * the block key playing the band bucket. `levenshtein` is the
    * classic DP metric, integer-identical on both engines. */
  def fuzzySourcePairs(s: SparkSession, d: String): DataFrame = {
    val names = Tables.documents(s, d).select(col("source")).distinct()
      .withColumn("blk", substring(col("source"), 1, FuzzyBlockLen))
    names.select(col("blk"), col("source").as("a"))
      .join(names.select(col("blk"), col("source").as("b")), Seq("blk"))
      .filter(col("a") < col("b"))
      .withColumn("lev", levenshtein(col("a"), col("b")))
      .filter(col("lev") <= FuzzyMaxLev)
      .select(col("a"), col("b"), col("lev").cast("long").as("lev"))
  }

  val queries: Map[String, QueryFn] = Map(
    "fuzzy_source_pairs" -> (fuzzySourcePairs _),
    "cdc_apply" -> (cdcApply _),
    "integrity_audit" -> (integrityAudit _),
    "merge_flatfile"      -> (mergeFlatfile _),
    "ground_level_argmin" -> (groundLevelArgmin _),
    "im_pivot"            -> (imPivot _),
    "im_melt"             -> (imMelt _),
    "im_component_combo"  -> (imComponentCombo _),
    "db_upsert"           -> (dbUpsert _),
    "flatfile_semi_filter"-> (flatfileSemiFilter _),
    "site_table_dedup"    -> (siteTableDedup _),
    "phase_arrival_semi"  -> (phaseArrivalSemi _)
  )

  val oracles: Map[String, String] = Map(
    "fuzzy_source_pairs" ->
      s"""WITH n AS (
         |  SELECT DISTINCT source, substring(source, 1, $FuzzyBlockLen) AS blk
         |  FROM documents)
         |SELECT a.source AS a, b.source AS b,
         |       CAST(levenshtein(a.source, b.source) AS BIGINT) AS lev
         |FROM n a JOIN n b ON a.blk = b.blk AND a.source < b.source
         |WHERE levenshtein(a.source, b.source) <= $FuzzyMaxLev""".stripMargin,
    "cdc_apply" -> Catalog.oracle(
      """SELECT record_id, version, im FROM (
        |  SELECT record_id, version, op, im,
        |         row_number() OVER (PARTITION BY record_id ORDER BY version DESC) AS rn
        |  FROM (
        |    SELECT record_id, CAST(1 AS BIGINT) AS version, 'U' AS op, im_val AS im
        |    FROM gm_records WHERE lnum <= 4
        |    UNION ALL
        |    SELECT record_id, CAST(2 AS BIGINT) AS version, 'U' AS op, im_val * 2 AS im
        |    FROM gm_records WHERE lnum >= 3
        |    UNION ALL
        |    SELECT record_id, CAST(3 AS BIGINT) AS version, 'D' AS op, NULL AS im
        |    FROM gm_records WHERE lnum = 4
        |  )
        |) WHERE rn = 1 AND op <> 'D'""".stripMargin),
    "integrity_audit" ->
      """SELECT status, count(*) AS n FROM (
        |  SELECT CASE WHEN d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL THEN 'both'
        |              WHEN d.doc_id IS NOT NULL THEN 'doc_only'
        |              ELSE 'vec_only' END AS status
        |  FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id)
        |GROUP BY status""".stripMargin,
    "merge_flatfile" -> Catalog.oracle {
      import graft.functions.Sdof
      s"""SELECT r.record_id, r.evid, r.sta, r.chan,
         |       e.mag, e.ev_lat, e.ev_lon, e.ev_depth,
         |       s.sta_lat, s.sta_lon, s.sta_vs30,
         |       r.score_x, r.fmin, r.fmin_max, r.fmin_max / 1.25e0 AS hpf,
         |       n.n_name AS network,
         |       ${Sdof.Periods.map(t => s"r.${Sdof.colName(t)}").mkString(", ")}
         |FROM (SELECT *, max(fmin) OVER (PARTITION BY evid, sta) AS fmin_max,
         |             ${Sdof.Periods.map(t => s"${Sdof.psaSql(t, "ps")} AS ${Sdof.colName(t)}").mkString(", ")}
         |      FROM (SELECT *, ${Sdof.psSql} AS ps FROM gm_records)) r
         |JOIN gm_events e ON r.evid = e.evid
         |LEFT JOIN gm_stations s ON r.sta = s.sta
         |JOIN orders o ON r.evid = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin
    },
    "ground_level_argmin" -> Catalog.oracle(
      """SELECT evid, sta, record_id, loc_elev FROM (
        |  SELECT evid, sta, record_id, loc_elev,
        |         row_number() OVER (PARTITION BY evid, sta
        |           ORDER BY CAST(loc_elev IS NULL AS INT), abs(loc_elev), lnum, pk) AS rn
        |  FROM gm_records
        |) WHERE rn = 1""".stripMargin),
    "im_pivot" -> Catalog.oracle(
      """SELECT evid, sta,
        |       max(CASE WHEN chan = 'HN' THEN im_val END) AS im_hn,
        |       max(CASE WHEN chan = 'BN' THEN im_val END) AS im_bn
        |FROM gm_records GROUP BY evid, sta""".stripMargin),
    "im_melt" -> Catalog.oracle(
      """SELECT evid, sta, chan, im_val FROM (
        |  SELECT evid, sta, 'HN' AS chan,
        |         max(CASE WHEN chan = 'HN' THEN im_val END) AS im_val
        |  FROM gm_records GROUP BY evid, sta
        |  UNION ALL
        |  SELECT evid, sta, 'BN' AS chan,
        |         max(CASE WHEN chan = 'BN' THEN im_val END) AS im_val
        |  FROM gm_records GROUP BY evid, sta)
        |WHERE im_val IS NOT NULL""".stripMargin),
    "im_component_combo" -> Catalog.oracle(
      """SELECT evid, sta, im_hn, im_bn,
        |       sqrt((im_hn * im_hn + im_bn * im_bn) / 2) AS im_srss,
        |       sqrt(im_hn * im_bn) AS im_geom
        |FROM (
        |  SELECT evid, sta,
        |         max(CASE WHEN chan = 'HN' THEN im_val END) AS im_hn,
        |         max(CASE WHEN chan = 'BN' THEN im_val END) AS im_bn
        |  FROM gm_records GROUP BY evid, sta
        |)""".stripMargin),
    "db_upsert" -> Catalog.oracle(
      """SELECT record_id, version, im FROM (
        |  SELECT record_id, version, im,
        |         row_number() OVER (PARTITION BY record_id ORDER BY version DESC) AS rn
        |  FROM (
        |    SELECT record_id, CAST(1 AS BIGINT) AS version, im_val AS im
        |    FROM gm_records WHERE lnum <= 4
        |    UNION ALL
        |    SELECT record_id, CAST(2 AS BIGINT) AS version, im_val * 2 AS im
        |    FROM gm_records WHERE lnum >= 3
        |  )
        |) WHERE rn = 1""".stripMargin),
    "flatfile_semi_filter" -> Catalog.oracle(
      s"""SELECT record_id, evid, sta, chan FROM gm_records
         |WHERE evid IN (SELECT evid FROM gm_events WHERE mag >= ${SemiMagMin}e0)""".stripMargin),
    "site_table_dedup" -> Catalog.oracle(
      """SELECT sta, loc, elev FROM (
        |  SELECT sta, loc, min(loc_elev) AS elev,
        |         row_number() OVER (PARTITION BY sta ORDER BY loc) AS rn
        |  FROM gm_records GROUP BY sta, loc
        |) WHERE rn = 1""".stripMargin),
    "phase_arrival_semi" -> Catalog.oracle(
      """SELECT record_id, evid, sta, lnum FROM gm_records
        |WHERE chan = 'HN'
        |  AND record_id IN (SELECT record_id FROM gm_records WHERE rflag = 'R')""".stripMargin)
  )
}
