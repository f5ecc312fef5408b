package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side
  * machinery — schema, encoders, partition-wise batch iteration — is
  * real; the decode step is a clearly-marked deterministic STUB (no
  * image/audio codecs in this container). A production build swaps
  * `decodeOne` / `embedOne` for a real codec; everything else stands.
  */
final case class MediaMeta(
    media_id: Long, byte_len: Long, width: Long, height: Long,
    duration_ms: Long)

final case class MediaEmbedding(media_id: Long, embedding: Array[Float])

final case class MediaFrame(
    media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

object MediaOps {

  /** STUB decode: deterministic fake metadata from the byte length. A
    * real implementation parses the container header here.
    */
  private def decodeOne(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    MediaMeta(id, n, n % 640, (n * 7) % 480, n * 3)
  }

  /** STUB feature extraction: 8-dim rolling-hash embedding. A real
    * implementation runs a vision/audio encoder over the decoded frames.
    */
  private def embedOne(id: Long, bytes: Array[Byte]): MediaEmbedding = {
    val dim = 8
    val acc = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i)
      acc(i % dim) += (h % 1000) / 1000.0f
      i += 1
    }
    MediaEmbedding(id, acc)
  }

  /** Partition-wise batch decode: binary column in, typed metadata out.
    * `mapPartitions` keeps per-partition codec state (a real decoder is
    * expensive to construct) — the Scala analog of `mapInPandas`.
    */
  def decodeMetadata(
      df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }

  /** STUB frame sampling: every Nth fixed-size chunk of the blob stands
    * in for a decoded video frame — the row-expanding (1 -> many) decode
    * shape. A real implementation seeks keyframes in the container.
    */
  def sampleFrames(
      df: DataFrame, idCol: String, binCol: String, everyN: Int,
      frameSize: Int = 32): Dataset[MediaFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(frameSize).zipWithIndex
          .filter { case (_, i) => i % everyN == 0 }
          .map { case (chunk, i) => MediaFrame(id, i, chunk) }
      }
  }

  /** Partition-wise embedding extraction with the same batching shape. */
  def extractEmbeddings(
      df: DataFrame, idCol: String, binCol: String): Dataset[MediaEmbedding] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, b) => embedOne(id, b) })
  }
}
