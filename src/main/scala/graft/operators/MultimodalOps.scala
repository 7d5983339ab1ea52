package graft.operators

import graft.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded batch-wise per partition.
  *
  * The container has no image/audio codecs, so `fakeDecode` is a
  * clearly-marked deterministic stand-in for a real decoder (it derives
  * "dimensions" from the byte length alone). Everything around it —
  * binary column handling, the Dataset[T] encoder schema, the
  * partition-wise batch shape, zero driver materialization — is the
  * real 100 TB plumbing: swap `fakeDecode` for an actual codec and the
  * pipeline is unchanged.
  */
object MultimodalOps {

  /** Decoded-media metadata row. */
  case class MediaMeta(doc_id: Long, byte_len: Int, width: Int,
      height: Int, n_frames: Int)

  /** STUB decoder — deterministic fake standing in for e.g. libjpeg:
    * real implementation would parse the container header here. */
  private def fakeDecode(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    MediaMeta(docId, n, 320 + n % 320, 240 + (n * 7) % 240, 1 + n % 30)
  }

  /** Treat each document's text bytes as an opaque media blob and run
    * the partition-wise decode. mapPartitions keeps the decoder's
    * (potentially expensive) per-batch setup amortized across rows —
    * the pattern a real codec needs. */
  def mediaDecode(sp: SparkSession, dir: String): DataFrame = {
    import sp.implicits._
    Engine.table(sp, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (real codec handle)
        it.map { case (id, blob) => fakeDecode(id, blob) }
      }
      .toDF()
  }

  val mediaDecodeOracle: String = """
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS INT) AS byte_len,
      CAST(320 + octet_length(encode(text)) % 320 AS INT) AS width,
      CAST(240 + (octet_length(encode(text)) * 7) % 240 AS INT) AS height,
      CAST(1 + octet_length(encode(text)) % 30 AS INT) AS n_frames
    FROM documents"""

  /** Frame-sampling shape: explode a decoded clip into every 10th
    * "frame" row — the schema/partitioning pattern for video pipelines
    * (frame index domain derived deterministically from the blob). */
  def frameSample(sp: SparkSession, dir: String): DataFrame = {
    import sp.implicits._
    Engine.table(sp, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          val meta = fakeDecode(id, blob)
          (0 until meta.n_frames by 10).map(f => (id, f, meta.width, meta.height))
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height")
  }

  val frameSampleOracle: String = """
    WITH m AS (
      SELECT doc_id,
        CAST(320 + octet_length(encode(text)) % 320 AS INT) AS width,
        CAST(240 + (octet_length(encode(text)) * 7) % 240 AS INT) AS height,
        CAST(1 + octet_length(encode(text)) % 30 AS INT) AS n_frames
      FROM documents)
    SELECT doc_id, CAST(unnest(range(0, n_frames, 10)) AS INT) AS frame_idx,
      width, height
    FROM m"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_decode" -> (mediaDecode _),
    "media_frame_sample" -> (frameSample _))

  val oracles: Map[String, String] = Map(
    "media_decode" -> mediaDecodeOracle,
    "media_frame_sample" -> frameSampleOracle)
}
