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

  /** Real container parsing where the bytes allow it: a payload that
    * starts with the PNG signature AND a well-formed IHDR chunk has
    * its width/height read from the big-endian fields at offsets
    * 16/20 — no codec library needed. Malformed or non-media payloads
    * fall through to the ==== STUB ==== deterministic fake (the test
    * corpus carries text bytes, not media); a real deployment would
    * extend `decodeOne` with the next formats, the surrounding
    * partition-batched plumbing unchanged. The declared media_kind is
    * passed through untouched either way so this output always joins
    * cleanly with mmMeta on (doc_id, media_kind).
    */
  private[operators] def decodeOne(b: MediaBlob): MediaFeatures = {
    val n = b.payload.length.toLong
    def beInt(off: Int): Int =
      ((b.payload(off) & 0xff) << 24) | ((b.payload(off + 1) & 0xff) << 16) |
        ((b.payload(off + 2) & 0xff) << 8) | (b.payload(off + 3) & 0xff)
    val pngDims: Option[(Int, Int)] =
      if (n >= 24 && b.payload.startsWith(PngMagic) &&
          new String(b.payload, 12, 4, "US-ASCII") == "IHDR") {
        val (w, h) = (beInt(16), beInt(20))
        if (w > 0 && h > 0) Some((w, h)) else None // reject crafted/overflowed fields
      } else None
    val mean =
      if (n == 0) 0.0
      else b.payload.foldLeft(0L)((acc, x) => acc + (x & 0xff)).toDouble / n
    pngDims match {
      case Some((w, h)) =>
        MediaFeatures(b.doc_id, b.media_kind, n, width = w, height = h, mean_byte = mean)
      case None => // ==== STUB ==== pseudo-dimensions for non-media payloads
        MediaFeatures(b.doc_id, b.media_kind, n,
          width = (n % 640).toInt + 1, height = ((n * 7) % 480).toInt + 1, mean_byte = mean)
    }
  }
}
