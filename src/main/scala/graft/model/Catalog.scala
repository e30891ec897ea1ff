package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic GM-catalog derivation over the driver's star schema.
  *
  * The reference pipeline (nzgmdb) operates on three core entities:
  * ground-motion *records* (one per event x station x channel trace,
  * cf. `nzgmdb/data_retrieval/geonet.py:455`), the *event* catalogue
  * (`geonet.py:832`), and the *station/site* table
  * (`nzgmdb/data_retrieval/sites.py:18`). The driver ships TPC-H-ish
  * parquet instead of miniSEED + FDSN feeds, so we derive those three
  * entities arithmetically from `lineitem` / `orders` / `supplier`:
  * every quality / merge / distance operator downstream then runs the
  * real reference semantics on them.
  *
  * Every derivation below exists twice, once as Spark `Column`
  * expressions and once as a DuckDB SQL CTE (`recordsCte` etc.,
  * assembled into each oracle by [[Catalog.oracle]]). The pairs
  * are kept line-for-line parallel and use only arithmetic that is
  * bit-identical across engines: integer modulo, IEEE double
  * division by exact constants, and epoch-microsecond integers.
  * Doubles that flow into checked outputs are never produced by
  * accumulation-order-dependent operations.
  */
object Catalog {

  /** One ground-motion record per lineitem row.
    * record_id = evid_sta_lnum_pk is unique ((l_orderkey,
    * l_linenumber, l_partkey, l_suppkey) is a key of the generated
    * lineitem; verified at sf0.01). `chan` mimics the HN/BN
    * channel-code split the dedup rules care about
    * (`quality_db.py:486`). `pk` is carried as the final tiebreaker
    * for every window ordering so plans are deterministic.
    */
  def records(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.select(
      concat(col("l_orderkey").cast("string"), lit("_"),
             col("l_suppkey").cast("string"), lit("_"),
             col("l_linenumber").cast("string"), lit("_"),
             col("l_partkey").cast("string")).as("record_id"),
      col("l_orderkey").cast("long").as("evid"),
      col("l_suppkey").cast("long").as("sta"),
      col("l_linenumber").cast("long").as("lnum"),
      col("l_partkey").cast("long").as("pk"),
      when(col("l_linenumber") % 2 === 0, lit("HN")).otherwise(lit("BN")).as("chan"),
      (col("l_linenumber") % 3).cast("long").as("loc"),
      when(col("l_partkey") % 17 === 0, lit(null).cast("double"))
        .otherwise((col("l_partkey") % 101) / lit(100.0)).as("score_x"),
      when(col("l_suppkey") % 19 === 0, lit(null).cast("double"))
        .otherwise(((col("l_partkey") + col("l_suppkey")) % 101) / lit(100.0)).as("score_y"),
      ((col("l_orderkey") % 11) / lit(10.0)).as("multi_x"),
      (((col("l_orderkey") + col("l_linenumber")) % 11) / lit(10.0)).as("multi_y"),
      (lit(0.05) + (col("l_partkey") % 40) / lit(100.0)).as("fmin"),
      (lit(1.0) + (col("l_orderkey") % 25)).as("fmax_x"),
      (lit(1.0) + (col("l_suppkey") % 25)).as("fmax_y"),
      (lit(1.0) + (col("l_partkey") % 25)).as("fmax_z"),
      when(col("l_partkey") % 13 === 0, lit(null).cast("double"))
        .otherwise((col("l_partkey") % 200 - 100).cast("double")).as("loc_elev"),
      (lit(1.0) + (col("l_partkey") % 50) / lit(10.0)).as("snr_val"),
      ((col("l_partkey") % 1000) / lit(10.0)).as("im_val"),
      col("l_returnflag").as("rflag"))
  }

  /** Event catalogue: one row per order (evid = o_orderkey). Origin
    * time as epoch-microseconds (exact integer on both engines),
    * magnitude / hypocentre derived on a 0.01-degree grid.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.select(
      col("o_orderkey").cast("long").as("evid"),
      // parquet ts is NTZ; cast via session tz (UTC) to match epoch_us
      unix_micros(col("o_orderdate").cast("timestamp")).as("ev_us"),
      (lit(3.0) + (col("o_orderkey") % 30) / lit(10.0)).as("mag"),
      (lit(-47.0) + (col("o_orderkey") % 1200) / lit(100.0)).as("ev_lat"),
      (lit(166.0) + (col("o_orderkey") % 1300) / lit(100.0)).as("ev_lon"),
      (col("o_orderkey") % 100).cast("double").as("ev_depth"))
  }

  /** Station table: one row per supplier, with Vs30 nulls the
    * missing-site-info filter keys on (`quality_db.py:348`). */
  def stations(s: SparkSession, dir: String): DataFrame = {
    val su = Tables.supplier(s, dir)
    su.select(
      col("s_suppkey").cast("long").as("sta"),
      (lit(-47.0) + ((col("s_suppkey") * 7) % 1200) / lit(100.0)).as("sta_lat"),
      (lit(166.0) + ((col("s_suppkey") * 13) % 1300) / lit(100.0)).as("sta_lon"),
      when(col("s_suppkey") % 23 === 0, lit(null).cast("double"))
        .otherwise(lit(100.0) + (col("s_suppkey") % 900)).as("sta_vs30"))
  }

  /** Records "manually approved" upstream bypass every quality filter
    * (the reference keeps such a ledger, `quality_db.py:91`). */
  def bypass: Column = col("evid") % 1000 === 7
  val bypassSql = "(evid % 1000 = 7)"

  // ---- SQL twins (DuckDB dialect; double literals in e-notation so
  // ---- they parse as DOUBLE, not DECIMAL) -------------------------

  val recordsCte: String =
    """gm_records AS (
      |  SELECT
      |    CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_suppkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) || '_' || CAST(l_partkey AS VARCHAR) AS record_id,
      |    CAST(l_orderkey AS BIGINT) AS evid,
      |    CAST(l_suppkey AS BIGINT) AS sta,
      |    CAST(l_linenumber AS BIGINT) AS lnum,
      |    CAST(l_partkey AS BIGINT) AS pk,
      |    CASE WHEN l_linenumber % 2 = 0 THEN 'HN' ELSE 'BN' END AS chan,
      |    CAST(l_linenumber % 3 AS BIGINT) AS loc,
      |    CASE WHEN l_partkey % 17 = 0 THEN NULL ELSE (l_partkey % 101) / 100e0 END AS score_x,
      |    CASE WHEN l_suppkey % 19 = 0 THEN NULL ELSE ((l_partkey + l_suppkey) % 101) / 100e0 END AS score_y,
      |    (l_orderkey % 11) / 10e0 AS multi_x,
      |    ((l_orderkey + l_linenumber) % 11) / 10e0 AS multi_y,
      |    5e-2 + (l_partkey % 40) / 100e0 AS fmin,
      |    1e0 + (l_orderkey % 25) AS fmax_x,
      |    1e0 + (l_suppkey % 25) AS fmax_y,
      |    1e0 + (l_partkey % 25) AS fmax_z,
      |    CASE WHEN l_partkey % 13 = 0 THEN NULL ELSE CAST(l_partkey % 200 - 100 AS DOUBLE) END AS loc_elev,
      |    1e0 + (l_partkey % 50) / 10e0 AS snr_val,
      |    (l_partkey % 1000) / 10e0 AS im_val,
      |    l_returnflag AS rflag
      |  FROM lineitem
      |)""".stripMargin

  val eventsCte: String =
    """gm_events AS (
      |  SELECT
      |    CAST(o_orderkey AS BIGINT) AS evid,
      |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS ev_us,
      |    3e0 + (o_orderkey % 30) / 10e0 AS mag,
      |    -47e0 + (o_orderkey % 1200) / 100e0 AS ev_lat,
      |    166e0 + (o_orderkey % 1300) / 100e0 AS ev_lon,
      |    CAST(o_orderkey % 100 AS DOUBLE) AS ev_depth
      |  FROM orders
      |)""".stripMargin

  val stationsCte: String =
    """gm_stations AS (
      |  SELECT
      |    CAST(s_suppkey AS BIGINT) AS sta,
      |    -47e0 + ((s_suppkey * 7) % 1200) / 100e0 AS sta_lat,
      |    166e0 + ((s_suppkey * 13) % 1300) / 100e0 AS sta_lon,
      |    CASE WHEN s_suppkey % 23 = 0 THEN NULL ELSE 100e0 + (s_suppkey % 900) END AS sta_vs30
      |  FROM supplier
      |)""".stripMargin

  /** Prefix every oracle query with the three CTEs (DuckDB inlines and
    * drops unused CTEs, so including all three is free). Callers may
    * append query-specific CTEs that reference the core three. */
  def oracle(body: String, extraCtes: String*): String = {
    val extras = extraCtes.map(c => s", $c").mkString
    s"WITH $recordsCte, $eventsCte, $stationsCte$extras $body"
  }
}
