package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryFn
import graft.model.Catalog

/** Quality-filter suite: the gatekeeper every record passes through in
  * the reference (`nzgmdb/data_processing/quality_db.py:91–434,566`).
  *
  * Reference semantics, Spark-first shape: each filter is a pure
  * predicate over one scan of the record catalog (so Catalyst pushes
  * the surviving-column projection into the parquet read); the
  * missing-site-info rule is a broadcast join against the station
  * table; the full chain (`quality_all`, cf. `quality_db.py:566`) is
  * ONE scan + ONE window shuffle — not the reference's nine passes.
  * A bypass ledger (records manually approved upstream) overrides
  * every filter, as in `quality_db.py:91`.
  *
  * Thresholds live here so the SQL oracles interpolate the same
  * constants — no drift between engines.
  */
object Quality {

  val ScoreMin  = 0.5
  val MultiMax  = 0.5
  val FmaxMin   = 4.0
  val FminMax   = 0.3
  val ElevAbsMax = 10.0

  /** Channel preference for dedup: HN (strong-motion) over BN, then
    * location code, then trace number (`quality_db.py:486`). */
  private def chanPref: Column =
    when(col("chan") === "HN", 0).otherwise(1)

  private def dedupWin =
    Window.partitionBy(col("evid"), col("sta"))
      .orderBy(chanPref, col("loc"), col("lnum"), col("pk"))

  // Individual predicates (bypass handled by callers).
  private def hasScore: Column = col("score_x").isNotNull && col("score_y").isNotNull
  private def scoreOk: Column  = col("score_x") >= ScoreMin && col("score_y") >= ScoreMin
  private def multiOk: Column  = col("multi_x") <= MultiMax && col("multi_y") <= MultiMax
  private def fmaxOk: Column   = least(col("fmax_x"), col("fmax_y"), col("fmax_z")) >= FmaxMin
  private def fminOk: Column   = col("fmin") <= FminMax
  private def groundOk: Column = col("loc_elev").isNotNull && abs(col("loc_elev")) <= ElevAbsMax

  private def keep(c: Column): Column = Catalog.bypass || c

  /** Records joined (broadcast) with their station row; `sta_ok` is
    * the missing-site-info predicate (`quality_db.py:348`). */
  private def withSta(s: SparkSession, dir: String): DataFrame =
    Catalog.records(s, dir).join(
      broadcast(Catalog.stations(s, dir)), Seq("sta"), "left")
      .withColumn("sta_ok", col("sta_vs30").isNotNull)

  private val idCols = Seq("record_id", "evid", "sta", "chan")
  private def sel(df: DataFrame, extra: String*): DataFrame =
    df.select((idCols ++ extra).map(col): _*)

  def qualityAll(s: SparkSession, dir: String): DataFrame = {
    val kept = withSta(s, dir).filter(keep(
      hasScore && scoreOk && multiOk && fmaxOk && fminOk && col("sta_ok") && groundOk))
    sel(kept.withColumn("rn", row_number().over(dedupWin)).filter(col("rn") === 1))
  }

  def qualitySkipped(s: SparkSession, dir: String): DataFrame = {
    // One scan; reasons unpivoted via explode instead of 7 re-scans.
    val r = withSta(s, dir).filter(!Catalog.bypass)
    r.select(col("record_id"), explode(array(
        struct(lit("no_score").as("reason"), (!hasScore).as("bad")),
        struct(lit("low_score").as("reason"), (hasScore && !scoreOk).as("bad")),
        struct(lit("high_multi").as("reason"), (!multiOk).as("bad")),
        struct(lit("low_fmax").as("reason"), (!fmaxOk).as("bad")),
        struct(lit("high_fmin").as("reason"), (!fminOk).as("bad")),
        struct(lit("missing_sta").as("reason"), (!col("sta_ok")).as("bad")),
        struct(lit("not_ground").as("reason"), (!groundOk).as("bad"))
      )).as("f"))
      .filter(col("f.bad"))
      .select(col("record_id"), col("f.reason").as("reason"))
  }

  val queries: Map[String, QueryFn] = Map(
    "q_catalog" -> ((s, d) => Catalog.records(s, d).drop("snr_val", "im_val")),
    "quality_has_score" -> ((s, d) =>
      sel(Catalog.records(s, d).filter(keep(hasScore)), "score_x", "score_y")),
    "quality_score_min" -> ((s, d) =>
      sel(Catalog.records(s, d).filter(keep(hasScore && scoreOk)), "score_x", "score_y")),
    "quality_multi_max" -> ((s, d) =>
      sel(Catalog.records(s, d).filter(keep(multiOk)), "multi_x", "multi_y")),
    "quality_fmax_min" -> ((s, d) =>
      Catalog.records(s, d).filter(keep(fmaxOk))
        .select((idCols.map(col) :+
          least(col("fmax_x"), col("fmax_y"), col("fmax_z")).as("fmax_min")): _*)),
    "quality_fmin_max" -> ((s, d) =>
      sel(Catalog.records(s, d).filter(keep(fminOk)), "fmin")),
    "quality_missing_sta" -> ((s, d) =>
      sel(withSta(s, d).filter(keep(col("sta_ok"))), "sta_vs30")),
    "quality_ground_level" -> ((s, d) =>
      sel(Catalog.records(s, d).filter(keep(groundOk)), "loc_elev")),
    "quality_all" -> (qualityAll _),
    "quality_skipped" -> (qualitySkipped _),
    "dedup_channels" -> ((s, d) =>
      sel(Catalog.records(s, d)
        .withColumn("rn", row_number().over(dedupWin)).filter(col("rn") === 1),
        "loc", "lnum"))
  )

  // ---- SQL twins -------------------------------------------------

  private val byp = Catalog.bypassSql
  private val scoreOkSql = s"(score_x >= ${ScoreMin}e0 AND score_y >= ${ScoreMin}e0)"
  private val hasScoreSql = "(score_x IS NOT NULL AND score_y IS NOT NULL)"
  private val multiOkSql = s"(multi_x <= ${MultiMax}e0 AND multi_y <= ${MultiMax}e0)"
  private val fmaxOkSql = s"(least(fmax_x, fmax_y, fmax_z) >= ${FmaxMin}e0)"
  private val fminOkSql = s"(fmin <= ${FminMax}e0)"
  private val groundOkSql = s"(loc_elev IS NOT NULL AND abs(loc_elev) <= ${ElevAbsMax}e0)"
  private val prefSql = "CASE WHEN chan = 'HN' THEN 0 ELSE 1 END, loc, lnum, pk"

  val oracles: Map[String, String] = Map(
    "q_catalog" -> Catalog.oracle(
      """SELECT record_id, evid, sta, lnum, pk, chan, loc, score_x, score_y, multi_x,
        | multi_y, fmin, fmax_x, fmax_y, fmax_z, loc_elev, rflag FROM gm_records""".stripMargin),
    "quality_has_score" -> Catalog.oracle(
      s"SELECT record_id, evid, sta, chan, score_x, score_y FROM gm_records WHERE $byp OR $hasScoreSql"),
    "quality_score_min" -> Catalog.oracle(
      s"SELECT record_id, evid, sta, chan, score_x, score_y FROM gm_records WHERE $byp OR ($hasScoreSql AND $scoreOkSql)"),
    "quality_multi_max" -> Catalog.oracle(
      s"SELECT record_id, evid, sta, chan, multi_x, multi_y FROM gm_records WHERE $byp OR $multiOkSql"),
    "quality_fmax_min" -> Catalog.oracle(
      s"SELECT record_id, evid, sta, chan, least(fmax_x, fmax_y, fmax_z) AS fmax_min FROM gm_records WHERE $byp OR $fmaxOkSql"),
    "quality_fmin_max" -> Catalog.oracle(
      s"SELECT record_id, evid, sta, chan, fmin FROM gm_records WHERE $byp OR $fminOkSql"),
    "quality_missing_sta" -> Catalog.oracle(
      s"""SELECT r.record_id, r.evid, r.sta, r.chan, s.sta_vs30
         | FROM gm_records r LEFT JOIN gm_stations s ON r.sta = s.sta
         | WHERE $byp OR s.sta_vs30 IS NOT NULL""".stripMargin),
    "quality_ground_level" -> Catalog.oracle(
      s"SELECT record_id, evid, sta, chan, loc_elev FROM gm_records WHERE $byp OR $groundOkSql"),
    "quality_all" -> Catalog.oracle(
      s"""SELECT record_id, evid, sta, chan FROM (
         |  SELECT r.record_id, r.evid, r.sta, r.chan,
         |         row_number() OVER (PARTITION BY r.evid, r.sta ORDER BY $prefSql, r.loc, r.lnum) AS rn
         |  FROM gm_records r LEFT JOIN gm_stations s ON r.sta = s.sta
         |  WHERE $byp OR ($hasScoreSql AND $scoreOkSql AND $multiOkSql AND $fmaxOkSql
         |                 AND $fminOkSql AND s.sta_vs30 IS NOT NULL AND $groundOkSql)
         |) WHERE rn = 1""".stripMargin),
    "quality_skipped" -> Catalog.oracle(
      s"""SELECT record_id, 'no_score' AS reason FROM flagged WHERE NOT $hasScoreSql
         |UNION ALL SELECT record_id, 'low_score' FROM flagged WHERE $hasScoreSql AND NOT $scoreOkSql
         |UNION ALL SELECT record_id, 'high_multi' FROM flagged WHERE NOT $multiOkSql
         |UNION ALL SELECT record_id, 'low_fmax' FROM flagged WHERE NOT $fmaxOkSql
         |UNION ALL SELECT record_id, 'high_fmin' FROM flagged WHERE NOT $fminOkSql
         |UNION ALL SELECT record_id, 'missing_sta' FROM flagged WHERE NOT sta_ok
         |UNION ALL SELECT record_id, 'not_ground' FROM flagged WHERE NOT $groundOkSql""".stripMargin,
      s"""flagged AS (
         |  SELECT r.*, s.sta_vs30 IS NOT NULL AS sta_ok
         |  FROM gm_records r LEFT JOIN gm_stations s ON r.sta = s.sta
         |  WHERE NOT $byp
         |)""".stripMargin),
    "dedup_channels" -> Catalog.oracle(
      s"""SELECT record_id, evid, sta, chan, loc, lnum FROM (
         |  SELECT record_id, evid, sta, chan, loc, lnum,
         |         row_number() OVER (PARTITION BY evid, sta ORDER BY $prefSql, loc, lnum) AS rn
         |  FROM gm_records
         |) WHERE rn = 1""".stripMargin)
  )
}
