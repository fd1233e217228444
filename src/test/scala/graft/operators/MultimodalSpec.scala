package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The multimodal decode path: PNG headers parse for real; anything
  * else goes through the documented deterministic stub.
  */
class MultimodalSpec extends AnyFunSuite {

  private def pngHeader(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(Array[Byte](0, 0, 0, 13)) // IHDR length
    out.write("IHDR".getBytes("US-ASCII"))
    def be(i: Int) = Array((i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
    out.write(be(width)); out.write(be(height))
    out.write(Array[Byte](8, 6, 0, 0, 0)) // bit depth etc.
    out.toByteArray
  }

  test("PNG payloads parse IHDR width/height; declared kind passes through") {
    // declared kind deliberately differs from the bytes: decode must
    // keep it so (doc_id, media_kind) joins with mmMeta stay consistent
    val blob = MultimodalOps.MediaBlob(1L, pngHeader(640, 480), "audio")
    val f = MultimodalOps.decodeOne(blob)
    assert(f.width === 640 && f.height === 480)
    assert(f.media_kind === "audio")
    assert(f.n_bytes === blob.payload.length.toLong)
  }

  test("malformed PNG-magic payloads fall back to the stub (no garbage dims)") {
    // PNG signature but bogus IHDR dims (high bit set -> negative int)
    val bad = pngHeader(-1, 480)
    val f = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(4L, bad, "image"))
    assert(f.width > 0 && f.height > 0, s"garbage dims leaked: $f")
    // PNG signature but wrong first chunk type
    val wrongChunk = pngHeader(10, 10)
    wrongChunk(12) = 'X'.toByte
    val g = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(5L, wrongChunk, "image"))
    assert(g.width === (wrongChunk.length % 640) + 1)
  }

  private def jpegHeader(width: Int, height: Int, sofMarker: Int = 0xc0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    // APP0/JFIF segment first — the parser must walk past it
    out.write(Array(0xff, 0xe0, 0x00, 0x10).map(_.toByte))
    out.write("JFIF".getBytes("US-ASCII")); out.write(new Array[Byte](10))
    // SOF: len 17, precision 8, height, width, 3 components
    out.write(Array(0xff, sofMarker, 0x00, 0x11, 0x08).map(_.toByte))
    out.write(Array((height >>> 8).toByte, height.toByte, (width >>> 8).toByte, width.toByte))
    out.write(new Array[Byte](10))
    out.toByteArray
  }

  test("JPEG payloads parse SOF height/width (baseline and progressive)") {
    val f = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(6L, jpegHeader(1024, 768), "image"))
    assert(f.width === 1024 && f.height === 768)
    val g = MultimodalOps.decodeOne(
      MultimodalOps.MediaBlob(7L, jpegHeader(320, 200, sofMarker = 0xc2), "image"))
    assert(g.width === 320 && g.height === 200)
  }

  test("truncated/malformed JPEG falls back to the stub") {
    val truncated = jpegHeader(1024, 768).take(6) // segment length runs past the end
    val f = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(8L, truncated, "image"))
    assert(f.width === (truncated.length % 640) + 1, s"garbage dims leaked: $f")
    val lostSync = jpegHeader(1024, 768)
    lostSync(2) = 0x00 // APP0's FF overwritten: marker sync lost before any SOF
    val g = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(9L, lostSync, "image"))
    assert(g.width === (lostSync.length % 640) + 1, s"garbage dims leaked: $g")
  }

  private def wavHeader(rate: Int, channels: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(100))
    out.write("WAVE".getBytes("US-ASCII"))
    // a junk chunk before fmt — the walker must skip it word-aligned
    out.write("LIST".getBytes("US-ASCII")); out.write(le32(3)); out.write(new Array[Byte](3 + 1))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)); out.write(le16(channels)); out.write(le32(rate))
    out.write(le32(rate * channels * 2)); out.write(le16(channels * 2)); out.write(le16(16))
    out.toByteArray
  }

  test("WAV payloads parse fmt sample-rate/channels as (width, height)") {
    val f = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(10L, wavHeader(44100, 2), "audio"))
    assert(f.width === 44100 && f.height === 2)
  }

  test("RIFF without a sane fmt chunk falls back to the stub") {
    val zeroChan = wavHeader(44100, 0)
    val f = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(11L, zeroChan, "audio"))
    assert(f.width === (zeroChan.length % 640) + 1, s"garbage dims leaked: $f")
  }

  test("non-media payloads fall through to the deterministic stub") {
    val blob = MultimodalOps.MediaBlob(2L, "hello world".getBytes, "audio")
    val f = MultimodalOps.decodeOne(blob)
    assert(f.media_kind === "audio")
    assert(f.width === (11 % 640) + 1 && f.height === ((11 * 7) % 480) + 1)
    // stub is deterministic
    assert(f === MultimodalOps.decodeOne(blob))
  }

  test("empty payload is safe") {
    val f = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(3L, Array.empty, "video"))
    assert(f.n_bytes === 0L && f.mean_byte === 0.0)
  }

  test("test corpus has no media-signature payloads (oracle covers stub path only)") {
    // mm_decode_features' DuckDB oracle replicates ONLY the stub
    // branch of decodeOne; this pins the precondition for every real
    // parser (PNG, JPEG, RIFF/WAV). If a future corpus plants real
    // media bytes, this fails loudly instead of the gate mismatching
    // mysteriously.
    val spark = graft.GraftSession.build("mm-spec", "4")
    import org.apache.spark.sql.functions._
    val sigs = Seq(
      Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte), // PNG
      Array(0xff, 0xd8).map(_.toByte),             // JPEG SOI
      "RIFF".getBytes("US-ASCII"))                 // WAV container
    val mediaLike = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(sigs.map(s =>
        substring(col("text").cast("binary"), 1, s.length) === lit(s)).reduce(_ || _))
      .count()
    assert(mediaLike === 0L)
  }
}
