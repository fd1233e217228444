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

  test("real JPEG pixels decode via the JDK ImageIO codec") {
    import java.awt.image.BufferedImage
    def jpegOf(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos), "JDK jpg writer missing")
      bos.toByteArray
    }
    // uniform mid-gray: JPEG is lossy but a flat field survives almost
    // exactly (no high-frequency content to quantize away)
    val gray = MultimodalOps.decodeOne(
      MultimodalOps.MediaBlob(40L, jpegOf(16, 12, 0x808080), "image"))
    assert(gray.width === 16 && gray.height === 12)
    assert(gray.mean_signal.isDefined, "JPEG pixel decode did not run")
    assert(math.abs(gray.mean_signal.get - 128.0) <= 2.0, s"mean: $gray")
    // the signal tracks the actual pixels — a dark field decodes dark
    val dark = MultimodalOps.decodeOne(
      MultimodalOps.MediaBlob(41L, jpegOf(8, 8, 0x101010), "image"))
    assert(dark.mean_signal.isDefined && dark.mean_signal.get < 32.0, s"$dark")
  }

  private def mp4Header(timescale: Int, duration: Long, version: Int = 0): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(((v >>> 24) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val a = "US-ASCII"
    val body = new java.io.ByteArrayOutputStream()
    body.write(Array[Byte](version.toByte, 0, 0, 0)) // version + flags
    if (version == 1) {
      body.write(be64(0)); body.write(be64(0))            // ctime, mtime
      body.write(be32(timescale)); body.write(be64(duration))
    } else {
      body.write(be32(0)); body.write(be32(0))
      body.write(be32(timescale)); body.write(be32(duration))
    }
    val mvhd = be32(8L + body.size()) ++ "mvhd".getBytes(a) ++ body.toByteArray
    // a junk child before mvhd — the box walk must skip it by size
    val junk = be32(12) ++ "udta".getBytes(a) ++ Array[Byte](0, 0, 0, 0)
    val kids = junk ++ mvhd
    be32(16) ++ "ftyp".getBytes(a) ++ "isom".getBytes(a) ++ be32(0) ++
      be32(8L + kids.length) ++ "moov".getBytes(a) ++ kids
  }

  test("MP4 payloads parse mvhd timescale/duration as (width, height)") {
    val v0 = MultimodalOps.decodeOne(
      MultimodalOps.MediaBlob(50L, mp4Header(600, 3000), "video"))
    assert(v0.width === 600 && v0.height === 5, s"$v0")
    val v1 = MultimodalOps.decodeOne(
      MultimodalOps.MediaBlob(51L, mp4Header(1000, 90061000L, version = 1), "video"))
    assert(v1.width === 1000 && v1.height === 90061, s"$v1")
  }

  test("truncated/boxless MP4 falls back to the stub") {
    val cut = mp4Header(600, 3000).dropRight(6) // mvhd duration truncated
    val f = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(52L, cut, "video"))
    assert(f.width === (cut.length % 640) + 1, s"garbage dims leaked: $f")
  }

  test("hostile MP4 box sizes and unknown durations never throw or leak") {
    def be32(v: Long): Array[Byte] = Array(((v >>> 24) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val a = "US-ASCII"
    // 64-bit extended size near Long.MaxValue: a naive `i + sz` bound
    // wraps negative and walks the cursor off the array
    val bomb = be32(16) ++ "ftyp".getBytes(a) ++ "isom".getBytes(a) ++ be32(0) ++
      be32(1) ++ "free".getBytes(a) ++
      Array[Byte](0x7f, -1, -1, -1, -1, -1, -1, -1)
    val f = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(53L, bomb, "video"))
    assert(f.width === (bomb.length % 640) + 1, s"hostile size leaked: $f")
    // all-ones duration = ISO-14496-12 "unknown": must not be reported
    // as a real multi-million-second duration
    val unk = MultimodalOps.decodeOne(
      MultimodalOps.MediaBlob(54L, mp4Header(600, 0xffffffffL), "video"))
    assert(unk.width === (unk.n_bytes % 640) + 1,
      s"unknown-duration sentinel decoded as a real value: $unk")
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

  /** A complete, valid PNG built from raw pixels: zlib-deflated
    * scanlines with a chosen per-row filter type, correct CRCs. This
    * is a REAL png (checked decodable by construction), so it
    * exercises the full inflate + unfilter pixel path.
    */
  private def realPng(pixels: Array[Array[Int]], channels: Int,
                      filters: Array[Int]): Array[Byte] = {
    val h = pixels.length
    val w = pixels(0).length / channels
    val colorType = channels match { case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6 }
    def be(i: Int) = Array((i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val tb = typ.getBytes("US-ASCII")
      crc.update(tb); crc.update(data)
      be(data.length) ++ tb ++ data ++ be(crc.getValue.toInt)
    }
    // filter each row per the requested type (encoder side of the
    // decoder's unfilter — exercises the exact inverse path)
    val bpp = channels
    val raw = new java.io.ByteArrayOutputStream()
    for (r <- 0 until h) {
      val ft = filters(r % filters.length)
      raw.write(ft)
      for (x <- 0 until w * channels) {
        val cur = pixels(r)(x)
        val a = if (x >= bpp) pixels(r)(x - bpp) else 0
        val b = if (r > 0) pixels(r - 1)(x) else 0
        val c = if (r > 0 && x >= bpp) pixels(r - 1)(x - bpp) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val pp = a + b - c
            val (pa, pb, pc) = (math.abs(pp - a), math.abs(pp - b), math.abs(pp - c))
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw.write((cur - pred) & 0xff)
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = be(w) ++ be(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zout.toByteArray) ++
      chunk("IEND", Array.empty)
  }

  test("real PNG pixels decode exactly (all five filter types, gray and RGBA)") {
    // 4x4 grayscale with every filter type across rows
    val gray = Array(
      Array(10, 20, 30, 40), Array(50, 60, 70, 80),
      Array(90, 100, 110, 120), Array(250, 0, 128, 255))
    val g = realPng(gray, channels = 1, filters = Array(0, 1, 2, 4))
    val fg = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(20L, g, "image"))
    assert(fg.width === 4 && fg.height === 4)
    val expectGray = gray.flatten.map(_.toLong).sum.toDouble / 16
    assert(fg.mean_signal === Some(expectGray),
      s"decoded pixel mean ${fg.mean_signal} != $expectGray")
    // 2x3 RGBA including the Average filter
    val rgba = Array(
      Array(255, 0, 0, 255, 0, 255, 0, 255, 0, 0, 255, 255),
      Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
    val r = realPng(rgba, channels = 4, filters = Array(3, 4))
    val fr = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(21L, r, "image"))
    assert(fr.width === 3 && fr.height === 2)
    val expectRgba = rgba.flatten.map(_.toLong).sum.toDouble / 24
    assert(fr.mean_signal === Some(expectRgba))
  }

  test("truncated IDAT and unsupported formats yield header dims but no pixel mean") {
    val gray = Array(Array(10, 20), Array(30, 40))
    val ok = realPng(gray, channels = 1, filters = Array(0))
    // chop the stream mid-IDAT: header still parses, pixels must not
    val cut = ok.take(ok.length - 16)
    val f = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(22L, cut, "image"))
    assert(f.width === 2 && f.height === 2)
    assert(f.mean_signal === None, s"truncated stream produced pixels: $f")
    // header-only fixture (no IDAT at all): same contract
    val h = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(23L, pngHeader(8, 8), "image"))
    assert(h.mean_signal === None)
  }

  private def realWav(samples: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    val dataLen = samples.length * 2
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(36 + dataLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)); out.write(le16(1)); out.write(le32(8000))
    out.write(le32(16000)); out.write(le16(2)); out.write(le16(16))
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataLen))
    samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  test("real PCM WAV samples decode exactly (16-bit signed)") {
    val samples = Array(0, 16384, -16384, 32767, -32768, 100)
    val f = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(24L, realWav(samples), "audio"))
    assert(f.width === 8000 && f.height === 1)
    val expect = samples.map(s => math.abs(s) / 32768.0).sum / samples.length
    assert(f.mean_signal === Some(expect),
      s"decoded sample mean ${f.mean_signal} != $expect")
  }

  test("resize: PNG nearest-neighbor thumbnail mean is exact") {
    // 3x3 gray: NN index map ty*3/8 gives row/col weights (3,3,2) over
    // the 8x8 thumb; sum = 3*150*... hand-derived mean = 2880/64 = 45
    val g3 = Array(Array(10, 20, 30), Array(40, 50, 60), Array(70, 80, 90))
    val f3 = MultimodalOps.decodeOne(
      MultimodalOps.MediaBlob(60L, realPng(g3, 1, Array(0)), "image"))
    assert(f3.thumb_mean === Some(45.0), s"$f3")
    // 2x2: every source pixel replicates 4x4 with equal weight, so the
    // thumbnail mean equals the full-raster mean exactly
    val g2 = Array(Array(0, 100), Array(200, 50))
    val f2 = MultimodalOps.decodeOne(
      MultimodalOps.MediaBlob(61L, realPng(g2, 1, Array(0)), "image"))
    assert(f2.thumb_mean === f2.mean_signal && f2.thumb_mean === Some(87.5))
  }

  test("resize: JPEG thumbnail agrees with the flat-field mean; WAV downsamples") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val j = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(62L, bos.toByteArray, "image"))
    assert(j.thumb_mean.isDefined, "JPEG resize did not run")
    assert(math.abs(j.thumb_mean.get - 128.0) <= 2.0, s"$j")
    // 64 samples: the 64-point uniform downsample visits each exactly once
    val sam = (0 until 64).map(_ * 512).toArray
    val w = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(63L, realWav(sam), "audio"))
    assert(w.thumb_mean === w.mean_signal, s"$w")
    // 128 samples alternating 0 / max: stride-2 sampling sees only the
    // zeros — downsample is positional, not an average
    val alt = (0 until 128).map(i => if (i % 2 == 0) 0 else 32767).toArray
    val wa = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(64L, realWav(alt), "audio"))
    assert(wa.thumb_mean === Some(0.0), s"$wa")
    assert(wa.mean_signal.exists(_ > 0.4), s"$wa")
  }

  test("frame-sample: uniform timestamps from the mvhd duration") {
    val v0 = MultimodalOps.decodeOne(
      MultimodalOps.MediaBlob(65L, mp4Header(600, 3000), "video"))
    assert(v0.frame_ts === Some("0,750,1500,2250"), s"$v0")
    val v1 = MultimodalOps.decodeOne(
      MultimodalOps.MediaBlob(66L, mp4Header(1000, 90061000L, version = 1), "video"))
    assert(v1.frame_ts === Some("0,22515250,45030500,67545750"), s"$v1")
    // images/audio carry no frame plan; truncated mp4 falls to stub
    val p = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(67L,
      realPng(Array(Array(1, 2), Array(3, 4)), 1, Array(0)), "image"))
    assert(p.frame_ts === None)
  }

  private def mp4WithStts(timescale: Int, duration: Long,
      entries: Seq[(Int, Int)], stszCount: Option[Int] = None,
      mediaTs: Option[Int] = None, withMdhd: Boolean = true): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(((v >>> 24) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val a = "US-ASCII"
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ name.getBytes(a) ++ payload
    val mvhdBody = be32(0) ++ be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) // v0: ver+flags, ctime, mtime
    // mdhd v0: ver+flags, ctime, mtime, media timescale, duration
    val mdhd =
      if (withMdhd) box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++
        be32(mediaTs.getOrElse(timescale).toLong) ++ be32(0))
      else Array.empty[Byte]
    val stts = box("stts", be32(0) ++ be32(entries.size) ++
      entries.toArray.flatMap { case (c, d) => be32(c) ++ be32(d) })
    val stsz = stszCount.map(n => box("stsz", be32(0) ++ be32(0) ++ be32(n)))
      .getOrElse(Array.empty[Byte])
    val trak = box("trak", box("mdia", mdhd ++ box("minf",
      box("stbl", stts ++ stsz))))
    val moov = box("moov", box("mvhd", mvhdBody) ++ trak)
    be32(16) ++ "ftyp".getBytes(a) ++ "isom".getBytes(a) ++ be32(0) ++ moov
  }

  test("frame-sample: stts sample table yields REAL sample timestamps") {
    // 4 samples with non-uniform deltas: DTS 0, 100, 200, 250 — a
    // uniform mvhd split could never produce these stamps
    val f = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(70L,
      mp4WithStts(600, 3000, Seq((2, 100), (2, 50))), "video"))
    assert(f.frame_ts === Some("0,100,200,250"), s"$f")
    // heavily skewed timing (one long lead sample then rapid frames)
    val g = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(71L,
      mp4WithStts(600, 3000, Seq((1, 1000), (3, 10))), "video"))
    assert(g.frame_ts === Some("0,1000,1010,1020"), s"$g")
    // more samples than FrameSamples: evenly-spaced sample INDICES
    // (0,2,4,6 of 8), timestamps from the run-length table
    val h = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(72L,
      mp4WithStts(600, 3000, Seq((8, 10))), "video"))
    assert(h.frame_ts === Some("0,20,40,60"), s"$h")
    // stsz agreeing with stts keeps the sample plan
    val ok = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(73L,
      mp4WithStts(600, 3000, Seq((2, 100), (2, 50)), stszCount = Some(4)), "video"))
    assert(ok.frame_ts === Some("0,100,200,250"), s"$ok")
    // media timescale ≠ movie timescale: stamps convert to MOVIE units
    // (mdhd 1200 ticks/s vs mvhd 600 ⇒ every DTS halves) — one unit
    // contract with the uniform fallback
    val cv = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(77L,
      mp4WithStts(600, 3000, Seq((2, 100), (2, 50)), mediaTs = Some(1200)), "video"))
    assert(cv.frame_ts === Some("0,50,100,125"), s"$cv")
  }

  test("frame-sample: structural stts violations fall back to the uniform plan") {
    // stsz sample_count disagreeing with stts: violation → uniform
    val bad = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(74L,
      mp4WithStts(600, 3000, Seq((2, 100), (2, 50)), stszCount = Some(5)), "video"))
    assert(bad.frame_ts === Some("0,750,1500,2250"), s"$bad")
    // empty stts (zero entries) → uniform
    val empty = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(75L,
      mp4WithStts(600, 3000, Seq.empty), "video"))
    assert(empty.frame_ts === Some("0,750,1500,2250"), s"$empty")
    // mvhd-only files (no trak at all) keep the uniform plan
    val plain = MultimodalOps.decodeOne(
      MultimodalOps.MediaBlob(76L, mp4Header(600, 3000), "video"))
    assert(plain.frame_ts === Some("0,750,1500,2250"), s"$plain")
    // stts without mdhd: the media timescale is unknowable, so the
    // stamps would be unit-less — must fall back, not guess
    val noMdhd = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(78L,
      mp4WithStts(600, 3000, Seq((2, 100), (2, 50)), withMdhd = false), "video"))
    assert(noMdhd.frame_ts === Some("0,750,1500,2250"), s"$noMdhd")
  }

  test("hostile stts tables never throw, hang, or leak garbage timestamps") {
    def be32(v: Long): Array[Byte] = Array(((v >>> 24) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val a = "US-ASCII"
    def box(name: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ name.getBytes(a) ++ payload
    val mvhdBody = be32(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(3000)
    val mdhd = box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(0))
    def mp4With(stblKids: Array[Byte]): Array[Byte] = {
      val moov = box("moov", box("mvhd", mvhdBody) ++
        box("trak", box("mdia", mdhd ++ box("minf", box("stbl", stblKids)))))
      be32(16) ++ "ftyp".getBytes(a) ++ "isom".getBytes(a) ++ be32(0) ++ moov
    }
    val uniform = Some("0,750,1500,2250")
    // entry_count far beyond the box payload: the count guard must
    // reject it before any walk, not index off the array
    val bombCount = mp4With(box("stts", be32(0) ++ be32(0x7fffffffL) ++ be32(1) ++ be32(1)))
    val f1 = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(80L, bombCount, "video"))
    assert(f1.frame_ts === uniform, s"entry-count bomb leaked: $f1")
    // 2^32-scale counts x deltas: cumulative DTS must overflow-guard
    // to fallback, never wrap negative into "real" stamps
    val bombMul = mp4With(box("stts",
      be32(0) ++ be32(2) ++
        be32(0xffffffffL) ++ be32(0xffffffffL) ++
        be32(0xffffffffL) ++ be32(0xffffffffL)))
    val f2 = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(81L, bombMul, "video"))
    assert(f2.frame_ts === uniform, s"overflow wrapped into stamps: $f2")
    // stts child box whose size runs past its parent stbl: the child
    // walk must stop at the boundary and fall back
    val overrun = mp4With(be32(4096) ++ "stts".getBytes(a) ++ be32(0) ++ be32(1))
    val f3 = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(82L, overrun, "video"))
    assert(f3.frame_ts === uniform, s"overrun child leaked: $f3")
    // zero-delta table (all samples at DTS 0) is structurally valid:
    // stamps are real (all zero), not garbage
    val zeroDelta = mp4With(box("stts", be32(0) ++ be32(1) ++ be32(4) ++ be32(0)))
    val f4 = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(83L, zeroDelta, "video"))
    assert(f4.frame_ts === Some("0,0,0,0"), s"zero-delta mishandled: $f4")
    // the MATCHING branch's own product: entry 1 accumulates a huge
    // dts under the cumulative guard, then a frame index lands inside
    // entry 2 where (idx-seen)*delta alone wraps Long — must fall
    // back, not emit the wrapped value recomputed against entry 3
    val bombMatch = mp4With(box("stts",
      be32(0) ++ be32(3) ++
        be32(0x40000000L) ++ be32(4) ++            // dts -> 2^32, seen 2^30
        be32(0xffffffffL) ++ be32(0xffffffffL) ++  // idx lands here: product wraps
        be32(0x40000000L) ++ be32(0)))             // a delta-0 decoy tail
    val f5 = MultimodalOps.decodeOne(MultimodalOps.MediaBlob(84L, bombMatch, "video"))
    assert(f5.frame_ts === uniform, s"matching-branch overflow leaked: $f5")
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
      (1, Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)), // PNG
      (1, Array(0xff, 0xd8).map(_.toByte)),             // JPEG SOI
      (1, "RIFF".getBytes("US-ASCII")),                 // WAV container
      (5, "ftyp".getBytes("US-ASCII")))                 // MP4 (bytes 4-7)
    val mediaLike = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(sigs.map { case (off, s) =>
        substring(col("text").cast("binary"), off, s.length) === lit(s)
      }.reduce(_ || _))
      .count()
    assert(mediaLike === 0L)
  }
}
