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

  test("test corpus has no PNG-signature payloads (oracle covers stub path only)") {
    // mm_decode_features' DuckDB oracle replicates ONLY the stub
    // (non-PNG) branch of decodeOne; this pins the precondition. If a
    // future corpus plants real PNG bytes, this fails loudly instead
    // of the gate mismatching mysteriously.
    val spark = graft.GraftSession.build("mm-spec", "4")
    import org.apache.spark.sql.functions._
    val pngLike = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(substring(col("text").cast("binary"), 1, 4) ===
        lit(Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)))
      .count()
    assert(pngLike === 0L)
  }
}
