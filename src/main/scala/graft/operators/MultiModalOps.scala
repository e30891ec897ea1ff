package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryFn
import graft.sources.Tables

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed, per-partition batch decoding.
  *
  * The driver testdata has no real image/audio bytes, so the payload is
  * the UTF-8 encoding of `documents.text` and the decoder is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing is
  * the real thing a media pipeline needs: a `binary` column flowing
  * through a typed `Dataset`, decoded batch-wise inside
  * `mapPartitions` (one decoder instantiation per partition, the same
  * shape a JNI codec or ONNX session wants), with a fixed output
  * schema. Swapping `decodeStub` for a real codec changes no plan.
  */
object MultiModalOps {

  /** Typed rows entering the decode kernel. */
  final case class MediaIn(doc_id: Long, blob: Array[Byte])

  /** Typed decode output: byte stats + (stubbed) media dimensions. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, header0: Int, header1: Int,
                             width: Int, height: Int, n_frames: Int)

  /** STUB decoder — a real implementation would hand `blob` to an
    * image/audio codec; the container has none, so dimensions are a
    * deterministic function of the payload so the oracle can verify
    * the plumbing end-to-end. */
  def decodeStub(blob: Array[Byte]): (Int, Int, Int) = {
    val n = blob.length
    (16 + (n % 64) * 4, 16 + ((n / 64) % 64) * 4, 1 + n % 7)
  }

  def multimodalMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val in = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[MediaIn]
    in.mapPartitions { it =>
      // Per-partition decoder lifecycle: init once, decode batch-wise.
      it.map { m =>
        val (w, h, f) = decodeStub(m.blob)
        // short payloads yield 0-valued header bytes, not an exception
        val h0 = if (m.blob.length >= 1) m.blob(0) & 0xff else 0
        val h1 = if (m.blob.length >= 2) m.blob(1) & 0xff else 0
        MediaMeta(m.doc_id, m.blob.length.toLong, h0, h1, w, h, f)
      }
    }.toDF()
  }

  /** Frame sampling: every decoded payload fans out to one row per
    * sampled frame with a per-frame feature vector slot — the
    * explode-shaped plumbing a video/audio pipeline needs between
    * decode and per-frame featurization. Frame count and the (stub)
    * frame feature are deterministic functions of the payload so the
    * oracle verifies the fan-out exactly. */
  def multimodalFrameSample(s: SparkSession, d: String): DataFrame =
    multimodalMeta(s, d)
      .select(col("doc_id"), col("n_bytes"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        // stub per-frame feature: offset of the frame's first byte
        expr("(n_bytes * frame_idx) div n_frames").as("frame_offset"))

  val queries: Map[String, QueryFn] = Map(
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_frame_sample" -> (multimodalFrameSample _)
  )

  val oracles: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CASE WHEN octet_length(encode(text)) >= 1
        |       THEN CAST('0x' || substring(hex(encode(text)), 1, 2) AS INT) ELSE 0 END AS header0,
        |  CASE WHEN octet_length(encode(text)) >= 2
        |       THEN CAST('0x' || substring(hex(encode(text)), 3, 2) AS INT) ELSE 0 END AS header1,
        |  CAST(16 + (octet_length(encode(text)) % 64) * 4 AS INT) AS width,
        |  CAST(16 + ((octet_length(encode(text)) // 64) % 64) * 4 AS INT) AS height,
        |  CAST(1 + octet_length(encode(text)) % 7 AS INT) AS n_frames
        |FROM documents""".stripMargin,
    "multimodal_frame_sample" ->
      """SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |       (n_bytes * f) // n_frames AS frame_offset
        |FROM (
        |  SELECT doc_id, n_bytes, n_frames, unnest(range(0, n_frames)) AS f
        |  FROM (
        |    SELECT doc_id,
        |      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |      CAST(1 + octet_length(encode(text)) % 7 AS INT) AS n_frames
        |    FROM documents))""".stripMargin
  )
}
