package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MediaOpsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  val docs = Seq((1L, "hello"), (2L, "a" * 700)).toDF("id", "txt")
    .select(col("id"), col("txt").cast("binary").as("media"), col("txt"))

  test("stub decode emits deterministic typed metadata per blob") {
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

  test("embedding stub is deterministic and fixed-dim") {
    val a = MediaOps.extractEmbeddings(docs, "id", "media").collect()
      .map(e => e.media_id -> e.embedding.toSeq).toMap
    val b = MediaOps.extractEmbeddings(docs, "id", "media").collect()
      .map(e => e.media_id -> e.embedding.toSeq).toMap
    assert(a == b)
    assert(a(1L).length == 8 && a(2L).length == 8)
    assert(a(1L) != a(2L))
  }
}
