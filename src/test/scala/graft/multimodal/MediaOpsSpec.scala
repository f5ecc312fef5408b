package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MediaOpsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  val docs = Seq((1L, "hello"), (2L, "a" * 700)).toDF("id", "txt")
    .select(col("id"), col("txt").cast("binary").as("media"), col("txt"))

  test("opaque-blob decode falls back to deterministic typed metadata") {
    val got = MediaOps.decodeMetadata(docs, "id", "media").collect()
      .map(m => m.media_id -> m).toMap
    assert(got(1L) == MediaMeta(1L, 5, 5, 35, 15))
    assert(got(2L) == MediaMeta(2L, 700, 60, 100, 2100)) // 700%640, 4900%480
  }

  test("frame sampling expands each blob to every-Nth fixed-size chunks") {
    val frames = MediaOps.sampleFrames(docs, "id", "media", everyN = 2,
      frameSize = 100).collect()
    val byId = frames.groupBy(_.media_id)
    // 700-byte blob -> 7 chunks of 100 -> indices 0,2,4,6 kept
    assert(byId(2L).map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4, 6))
    assert(byId(2L).forall(f => f.frame_bytes.length == 100))
    assert(byId(1L).map(_.frame_idx).toSeq == Seq(0)) // 5-byte blob
  }

  test("real image decode recovers exact dimensions and pixels (PNG+BMP)") {
    // Expected md5s computed INDEPENDENTLY (python hashlib over the raw
    // arithmetic buffer at spec-authoring time) — a cross-implementation
    // pin, not a call back into the code under test.
    // id=3:  11x11 bmp; id=32: 23x14 png.
    val got = MediaOps.imageRoundTrip(
        Seq(3L, 32L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got(3L) ==
      (("bmp", 11L, 11L, "238ca6601ab8bcfa0b4134a0e9311cf7")))
    assert(got(32L) ==
      (("png", 23L, 14L, "e58f40e34cd43cc5b871cdfccd41f093")))
  }

  test("image decode reads header dimensions from the blob alone") {
    // decode a blob whose encode-side dims differ from the generator's
    // defaults — the decoder must report what the CONTAINER says
    val bytes = MediaOps.syntheticImageBytes(7L, 5, 9, "png")
    val meta = MediaOps.decodeImage(7L, "png", bytes)
    assert(meta.width == 5L && meta.height == 9L)
    // and the pixel buffer round-trips losslessly through the codec
    val viaBmp = MediaOps.decodeImage(
      7L, "bmp", MediaOps.syntheticImageBytes(7L, 5, 9, "bmp"))
    assert(viaBmp.pixel_md5 == meta.pixel_md5)
  }

  test("real audio decode recovers header fields and exact PCM (WAV)") {
    // Expected md5s computed INDEPENDENTLY (python hashlib over the raw
    // arithmetic byte stream at spec-authoring time) — a
    // cross-implementation pin, not a call back into the code under
    // test. id=4: 8 kHz, 68 samples; id=7: 16 kHz, 71 samples.
    val got = MediaOps.audioRoundTrip(Seq(4L, 7L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6))).toMap
    assert(got(4L) ==
      ((8000L, 1L, 16L, 68L, 8L, "79979eab4a73439b2dde0de914b44960")))
    assert(got(7L) ==
      ((16000L, 1L, 16L, 71L, 4L, "bd2a1b8673a4c2a2dae39d88b2465f00")))
  }

  test("audio decode reads format fields from the RIFF header alone") {
    // decode a blob whose encode-side rate/length differ from the
    // round-trip defaults — the decoder must report what the HEADER says
    val meta = MediaOps.decodeWav(
      9L, MediaOps.syntheticWavBytes(9L, 50, 44100))
    assert(meta.sample_rate == 44100L && meta.n_samples == 50L &&
      meta.channels == 1L && meta.bits == 16L && meta.duration_ms == 1L)
  }

  test("real video decode recovers headers and exact frame pixels (AVI)") {
    // Expected md5s computed INDEPENDENTLY (python hashlib over the raw
    // arithmetic stream at spec-authoring time) — a cross-implementation
    // pin, not a call back into the code under test.
    // id=5:  13x11, 3 frames @30fps; id=42: 17x6, 5 frames @25fps.
    val got = MediaOps.videoRoundTrip(Seq(5L, 42L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6))).toMap
    assert(got(5L) ==
      ((13L, 11L, 3L, 33333L, 99L, "ddfef332a732cbdefdb889fcc30b1651")))
    assert(got(42L) ==
      ((17L, 6L, 5L, 40000L, 200L, "f0b735686581bfe6a885e9becde77b3b")))
  }

  test("video frame sampling hashes exact per-frame pixels") {
    val got = MediaOps.videoFramesReal(
        Seq(42L).toDF("doc_id"), "doc_id", everyN = 2)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(got == Map(
      0L -> "e3917694bdbee111c3cce9aaf9fd9702",
      2L -> "a804256f307c5b0aafdb4682755c9c94",
      4L -> "d614cd180a8715b358d58cc1168aacc0"))
  }

  test("AVI wire layout genuinely differs from the logical stream") {
    // the writer emits bottom-up BGR padded rows; if the parser (or a
    // future refactor) ever short-circuited by hashing raw chunk bytes,
    // it could not reproduce the logical hash — pin that the raw blob
    // does NOT contain frame 0's logical top-down RGB buffer verbatim
    val id = 5L
    val (w, h, n) = (13, 11, 3)
    val bytes = MediaOps.syntheticAviBytes(id, w, h, n, 33333L)
    val logical0 = Array.tabulate(w * h * 3)(i =>
      MediaOps.syntheticPixel(id, i.toLong).toByte)
    assert(!bytes.containsSlice(logical0))
    // and the parser reports what the HEADERS say, not encode-side args
    val (meta, frames) = MediaOps.decodeAvi(id, bytes)
    assert(meta.width == w && meta.height == h && meta.n_frames == n)
    assert(frames.head.toSeq == logical0.toSeq)
  }

  test("embedding kernel is deterministic and fixed-dim on opaque blobs") {
    val a = MediaOps.extractEmbeddings(docs, "id", "media").collect()
      .map(e => e.media_id -> e.embedding.toSeq).toMap
    val b = MediaOps.extractEmbeddings(docs, "id", "media").collect()
      .map(e => e.media_id -> e.embedding.toSeq).toMap
    assert(a == b)
    assert(a(1L).length == 12 && a(2L).length == 12)
    assert(a(1L) != a(2L))
  }

  test("decode-derived embedding pins known vectors (image path)") {
    // Expected vectors computed INDEPENDENTLY (python over the raw
    // arithmetic pixel stream + the 2x2-block integer geometry at
    // spec-authoring time) — a cross-implementation pin: the kernel
    // must really decode the blob and really walk the block grid to
    // reproduce them. id=3: 11x11 bmp; id=6: 14x14 png.
    val blobs = Seq(3L, 6L).toDS()
      .map { id =>
        val w = (8 + id % 17).toInt
        val h = (8 + id % 13).toInt
        val fmt = if (id % 2 == 0) "png" else "bmp"
        (id, MediaOps.syntheticImageBytes(id, w, h, fmt))
      }
      .toDF("id", "media")
    val got = MediaOps.extractEmbeddings(blobs, "id", "media").collect()
      .map(e => e.media_id -> e.embedding.toSeq).toMap
    assert(got(3L) == Seq[Float](69888, 61000, 66222, 60100, 66733, 64900,
      53933, 73266, 54500, 76600, 53600, 71240))
    assert(got(6L) == Seq[Float](61591, 61918, 64836, 65857, 63591, 63918,
      64285, 64612, 59755, 63367, 66285, 66612))
    // and the flattened oracle-facing form agrees with the kernel
    val flat = MediaOps.imageEmbeddingReal(Seq(3L).toDF("doc_id"), "doc_id")
      .orderBy("blk", "ch").collect()
      .map(r => r.getLong(5).toFloat).toSeq
    assert(flat == got(3L))
  }

  test("metadata decode dispatches real readers on container magic") {
    val png = MediaOps.syntheticImageBytes(7L, 5, 9, "png")
    val wav = MediaOps.syntheticWavBytes(9L, 50, 44100)
    val avi = MediaOps.syntheticAviBytes(5L, 13, 11, 3, 33333L)
    val blobs = Seq((1L, png), (2L, wav), (3L, avi)).toDF("id", "media")
    val got = MediaOps.decodeMetadata(blobs, "id", "media").collect()
      .map(m => m.media_id -> m).toMap
    assert(got(1L).width == 5L && got(1L).height == 9L)  // container header
    assert(got(2L).duration_ms == 1L)                    // 50/44100 floor
    assert(got(3L).width == 13L && got(3L).height == 11L &&
      got(3L).duration_ms == 99L)
  }

  test("frame sampling dispatches the real AVI parser on video blobs") {
    val avi = MediaOps.syntheticAviBytes(42L, 17, 6, 5, 40000L)
    val frames = MediaOps.sampleFrames(
        Seq((42L, avi)).toDF("id", "media"), "id", "media", everyN = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    // frame payloads are the DECODED logical RGB buffers, not raw chunks
    assert(frames.forall(_.frame_bytes.length == 17 * 6 * 3))
    val logical0 = Array.tabulate(17 * 6 * 3)(i =>
      MediaOps.syntheticPixel(42L, i.toLong).toByte)
    assert(frames.head.frame_bytes.toSeq == logical0.toSeq)
  }

  test("AVI parser rejects malformed chunk sizes instead of zero-padding") {
    val bytes = MediaOps.syntheticAviBytes(5L, 13, 11, 3, 33333L)
    // corrupt the first frame chunk's size field to overrun the buffer
    val idx = {
      val pat = "00db".getBytes("US-ASCII")
      bytes.indexOfSlice(pat)
    }
    assert(idx > 0)
    val bad = bytes.clone()
    bad(idx + 4) = 0xff.toByte; bad(idx + 5) = 0xff.toByte
    bad(idx + 6) = 0xff.toByte; bad(idx + 7) = 0x7f.toByte
    val e = intercept[IllegalArgumentException](MediaOps.decodeAvi(5L, bad))
    assert(e.getMessage.contains("overruns"))
  }
}
