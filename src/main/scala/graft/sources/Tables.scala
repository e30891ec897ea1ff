package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet readers for the driver-provided star schema (TESTDATA.md).
  *
  * All engine inputs flow through here so every operator reads the same
  * way and Catalyst can prune columns / push filters into the scan
  * (visible as ReadSchema / PushedFilters in `.explain("formatted")`).
  * At cluster scale these would be catalog tables; the parquet-dir
  * indirection keeps the operators storage-agnostic.
  */
object Tables {
  private def rd(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame     = rd(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame     = rd(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame   = rd(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = rd(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = rd(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame     = rd(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame   = rd(s, dir, "lineitem")
  def events(s: SparkSession, dir: String): DataFrame     = rd(s, dir, "events")
  def documents(s: SparkSession, dir: String): DataFrame  = rd(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = rd(s, dir, "embeddings")
}
