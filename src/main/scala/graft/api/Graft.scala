package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.SparkEntry
import graft.model.Catalog
import graft.sources.Tables

/** Typed rows for the catalogue entities — `Dataset[T]` handles for
  * user code that wants compile-checked field access on top of the
  * same Catalyst plans (the encoders add no execution cost: typed
  * filters/maps on case-class fields still resolve to column
  * references and stay inside codegen until a closure forces
  * deserialization). Nullable columns are `Option`s. */
case class GmEvent(evid: Long, ev_us: Long, mag: Double,
                   ev_lat: Double, ev_lon: Double, ev_depth: Double)

case class GmStation(sta: Long, sta_lat: Double, sta_lon: Double,
                     sta_vs30: Option[Double])

case class GmRecord(record_id: String, evid: Long, sta: Long, lnum: Long,
                    pk: Long, chan: String, loc: Long,
                    score_x: Option[Double], score_y: Option[Double],
                    multi_x: Double, multi_y: Double,
                    fmin: Double, fmax_x: Double, fmax_y: Double, fmax_z: Double,
                    loc_elev: Option[Double], snr_val: Double, im_val: Double,
                    rflag: String)

case class Document(doc_id: Long, text: Option[String], lang: String,
                    source: String, n_chars: Long)

/** The user-facing entry point: one object per (session, data dir)
  * exposing every catalogue entity as a typed `Dataset` and every
  * registered operator by name — the surface a reference user
  * programs against when switching to this library.
  *
  * {{{
  * val g = Graft(spark, "/data/sf1")
  * val big = g.events.filter(_.mag >= 6.0)          // typed
  * val clean = g.query("corpus_clean")              // any registered operator
  * }}}
  */
final class Graft(val spark: SparkSession, val dir: String) {
  import spark.implicits._

  def events: Dataset[GmEvent]     = Catalog.events(spark, dir).as[GmEvent]
  def stations: Dataset[GmStation] = Catalog.stations(spark, dir).as[GmStation]
  def records: Dataset[GmRecord]   = Catalog.records(spark, dir).as[GmRecord]
  def documents: Dataset[Document] = Tables.documents(spark, dir).as[Document]

  /** All registered operator names (SURVEY §2 keys). */
  def queryNames: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  /** Run a registered operator by its SURVEY §2 key. */
  def query(name: String): DataFrame =
    SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name'; known: ${queryNames.mkString(", ")}"))(spark, dir)
}

object Graft {
  def apply(spark: SparkSession, dir: String): Graft = new Graft(spark, dir)
}
