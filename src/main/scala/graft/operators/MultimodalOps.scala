package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed per-partition in batch — the schema/partitioning
  * pattern a 100 TB image/audio pipeline uses.
  *
  * The decode itself is a STUB (no image/audio codecs in this
  * environment): [[StubDecoders.decodeImageMeta]] derives deterministic
  * fake dimensions from payload bytes. Everything around it — binary
  * column handling, case-class Encoders, `mapPartitions` batching,
  * partition-parallel execution — is real and tested. Swap the stub for a
  * JNI/codec call and the plan is unchanged.
  */
object MultimodalOps {

  case class PayloadRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
                       n_frames: Int, checksum_first: Int)

  object StubDecoders {
    /** STUB decode: deterministic fake metadata from payload shape. A real
      * deployment replaces this body with an actual codec; the signature
      * (bytes in, typed meta out) and the surrounding Spark plumbing stay.
      */
    def decodeImageMeta(doc_id: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      MediaMeta(
        doc_id = doc_id,
        n_bytes = n,
        width = ((n * 7) % 640 + 16).toInt,
        height = ((n * 13) % 480 + 16).toInt,
        n_frames = (n % 24 + 1).toInt,
        checksum_first = if (payload.nonEmpty) payload(0) & 0xff else 0
      )
    }
  }

  /** Binary payload table: text re-encoded as UTF-8 bytes stands in for
    * image/audio blobs. In production this column comes straight from the
    * source parquet.
    */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Partition-parallel decode → typed metadata. `mapPartitions` (not
    * per-row map) so a real codec can amortize init cost per partition —
    * the Scala analog of `mapInPandas` batch shape.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    val session = spark
    import session.implicits._
    payloads(spark, dir)
      .as[PayloadRow]
      .mapPartitions { rows =>
        // per-partition init would happen here (codec handles, buffers)
        rows.map(r => StubDecoders.decodeImageMeta(r.doc_id, r.payload))
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame-sampling plan stub: expand each "video" into its sampled frame
    * index rows (every 8th frame) — the explode-side of a frame-extract
    * pipeline, with deterministic fan-out bounded by metadata.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    mediaMeta(spark, dir)
      .withColumn("frame_idx",
                  explode(sequence(lit(0), col("n_frames") - 1, lit(8))))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
              col("width"), col("height"))
      .orderBy(col("doc_id"), col("frame_idx"))

  // ---- DuckDB oracles ----------------------------------------------------
  // The stub decode is pure arithmetic on byte length, so the oracle can
  // reproduce it exactly in SQL.

  val oracles: Map[String, String] = Map(
    "media_meta" ->
      // texts are all-ASCII (verified), so the first UTF-8 byte equals the
      // first codepoint: ascii() is a safe byte accessor here.
      """WITH p AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |m AS (
        |  SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
        |         CAST((n * 7) % 640 + 16 AS INT) AS width,
        |         CAST((n * 13) % 480 + 16 AS INT) AS height,
        |         CAST(n % 24 + 1 AS INT) AS n_frames,
        |         CAST(CASE WHEN n > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END AS INT) AS checksum_first
        |  FROM p
        |)
        |SELECT * FROM m ORDER BY doc_id""".stripMargin,
    "frame_sample" ->
      """WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
        |m AS (SELECT doc_id, CAST(n % 24 + 1 AS INT) AS n_frames,
        |             CAST((n * 7) % 640 + 16 AS INT) AS width,
        |             CAST((n * 13) % 480 + 16 AS INT) AS height FROM p)
        |SELECT doc_id, CAST(f.frame_idx AS BIGINT) AS frame_idx, width, height
        |FROM m, UNNEST(range(0, n_frames, 8)) f(frame_idx)
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
