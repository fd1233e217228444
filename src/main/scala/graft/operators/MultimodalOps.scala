package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing: opaque binary payloads + typed
  * metadata, with decode/feature-extraction as partition-batched
  * typed transforms (SURVEY.md §7.4).
  *
  * The test corpus has no real image/audio bytes, so the text column
  * stands in as the binary payload and the DECODE STEP IS A STUB —
  * a deterministic fake (clearly marked below) standing where a real
  * codec (JPEG decode, audio resample, frame sampling) would run.
  * Everything around the stub — binary schema, batch shape,
  * partition-level processing, metadata projection — is real and
  * oracle-tested where SQL-expressible.
  */
object MultimodalOps {

  /** Typed row for the decode stage. */
  final case class MediaBlob(doc_id: Long, payload: Array[Byte], media_kind: String)
  final case class MediaFeatures(doc_id: Long, media_kind: String,
    n_bytes: Long, width: Int, height: Int, mean_byte: Double)

  /** Binary metadata projection: byte length, content hash, media kind
    * — pure column expressions over the binary payload.
    */
  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_hash"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_kind"))
      .orderBy("doc_id")

  /** Partition-batched "decode": the real-world shape is
    * `mapPartitions` over a typed Dataset so a native codec is
    * initialized once per partition (not per row) and rows stream
    * through in batches. ==== STUB ====: the per-blob work below
    * fabricates deterministic pseudo-features from the payload bytes
    * instead of decoding actual media (no codec libs in this
    * environment); swap the body of `decodeOne` for a real decoder.
    */
  def mmDecodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_kind"))
      .as[MediaBlob]
    blobs.mapPartitions { it =>
      // per-partition init of a (stub) codec would go here
      it.map(decodeOne)
    }.toDF()
      .select(col("doc_id"), col("media_kind"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        round(col("mean_byte"), 4).as("mean_byte"))
      .orderBy("doc_id")
  }

  private val PngMagic: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG: signature + well-formed IHDR chunk → big-endian width/height
    * at offsets 16/20.
    */
  private def pngDims(p: Array[Byte]): Option[(Int, Int)] = {
    def beInt(off: Int): Int =
      ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
        ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
    if (p.length >= 24 && p.startsWith(PngMagic) &&
        new String(p, 12, 4, "US-ASCII") == "IHDR") {
      val (w, h) = (beInt(16), beInt(20))
      if (w > 0 && h > 0) Some((w, h)) else None // reject crafted/overflowed fields
    } else None
  }

  /** JPEG: SOI marker, then walk the marker segments (each FF xx +
    * big-endian length including the length bytes; standalone markers
    * 01/D0–D9 carry no length) until a start-of-frame (SOF0 baseline /
    * SOF1 extended / SOF2 progressive), whose payload is
    * precision(1) + height(2) + width(2). Any structural violation
    * bails to None — malformed bytes must land in the stub, never
    * throw on an executor.
    */
  private def jpegDims(p: Array[Byte]): Option[(Int, Int)] = {
    val n = p.length
    var res: Option[(Int, Int)] = None
    var done = n < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8
    var i = 2
    while (!done && i + 3 < n) {
      if ((p(i) & 0xff) != 0xff) done = true // lost marker sync
      else {
        val marker = p(i + 1) & 0xff
        if (marker == 0xff) i += 1 // fill byte
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
        else {
          val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
          if (len < 2 || i + 2 + len > n) done = true
          else if (marker >= 0xc0 && marker <= 0xc2 && len >= 7) {
            val h = ((p(i + 5) & 0xff) << 8) | (p(i + 6) & 0xff)
            val w = ((p(i + 7) & 0xff) << 8) | (p(i + 8) & 0xff)
            if (w > 0 && h > 0) res = Some((w, h))
            done = true
          } else i += 2 + len
        }
      }
    }
    res
  }

  /** WAV: RIFF/WAVE container, chunks walked word-aligned to the
    * `fmt ` chunk → (sample_rate, channels) as the (width, height)
    * stand-ins — the honest audio analog of image dimensions.
    */
  private def wavDims(p: Array[Byte]): Option[(Int, Int)] = {
    def ascii(off: Int) = new String(p, off, 4, "US-ASCII")
    def leShort(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    def leInt(off: Int): Int =
      (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
        ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)
    var res: Option[(Int, Int)] = None
    if (p.length >= 36 && ascii(0) == "RIFF" && ascii(8) == "WAVE") {
      var i = 12
      var done = false
      while (!done && i + 8 <= p.length) {
        val sz = leInt(i + 4)
        if (sz < 0 || i.toLong + 8 + sz > p.length) done = true
        else if (ascii(i) == "fmt " && sz >= 16) {
          val channels = leShort(i + 10)
          val rate = leInt(i + 12)
          if (channels > 0 && rate > 0) res = Some((rate, channels))
          done = true
        } else i += 8 + sz + (sz & 1) // chunks are word-aligned
      }
    }
    res
  }

  /** Real container parsing where the bytes allow it — PNG IHDR, JPEG
    * SOF0/1/2, WAV fmt — all dependency-free header reads, no codec
    * library. Malformed or non-media payloads fall through to the
    * ==== STUB ==== deterministic fake (the test corpus carries text
    * bytes, not media); a real deployment would swap the stub for a
    * full decoder, the surrounding partition-batched plumbing
    * unchanged. The declared media_kind is passed through untouched
    * either way so this output always joins cleanly with mmMeta on
    * (doc_id, media_kind).
    */
  private[operators] def decodeOne(b: MediaBlob): MediaFeatures = {
    val n = b.payload.length.toLong
    val dims = pngDims(b.payload)
      .orElse(jpegDims(b.payload))
      .orElse(wavDims(b.payload))
    val mean =
      if (n == 0) 0.0
      else b.payload.foldLeft(0L)((acc, x) => acc + (x & 0xff)).toDouble / n
    dims match {
      case Some((w, h)) =>
        MediaFeatures(b.doc_id, b.media_kind, n, width = w, height = h, mean_byte = mean)
      case None => // ==== STUB ==== pseudo-dimensions for non-media payloads
        MediaFeatures(b.doc_id, b.media_kind, n,
          width = (n % 640).toInt + 1, height = ((n * 7) % 480).toInt + 1, mean_byte = mean)
    }
  }
}
