package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Multimodal

class MultimodalSpec extends GraftSparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Seq((1L, "hello world"), (2L, "a"), (3L, "")).toDF("doc_id", "text"))

  test("fromText produces the canonical media schema (binary payload + type)") {
    assert(media.schema.fieldNames.toSeq == Seq("doc_id", "media", "media_type"))
    assert(media.schema("media").dataType == BinaryType)
    val r = media.orderBy($"doc_id").head()
    assert(new String(r.getAs[Array[Byte]]("media"), "UTF-8") == "hello world")
  }

  test("decode appends typed metadata + an 8-dim feature vector per row") {
    val out = Multimodal.decode(media).orderBy($"doc_id").collect()
    assert(out.length == 3)
    val first = out.head
    // stub decode is deterministic: dims from leading bytes ('h'=104,'e'=101)
    def feats(r: org.apache.spark.sql.Row): Seq[Float] =
      r.getSeq[Float](r.fieldIndex("features"))
    assert(first.getAs[Int]("width") == 1 + ('h' & 0x7f))
    assert(first.getAs[Int]("height") == 1 + ('e' & 0x7f))
    assert(feats(first).length == 8)
    // empty payload decodes to zeros, not a crash
    assert(out(2).getAs[Int]("width") == 0)
    assert(feats(out(2)).forall(_ == 0f))
    // decode twice = identical (pure function of bytes)
    val again = Multimodal.decode(media).orderBy($"doc_id").collect()
    assert(out.map(feats).toSeq == again.map(feats).toSeq)
  }

  test("resize bounds the longer side, preserving integer dims >= 1") {
    val decoded = Multimodal.decode(media)
    val resized = Multimodal.resize(decoded, 16).collect()
    resized.filter(_.getAs[Int]("width") > 0).foreach { r =>
      assert(r.getAs[Int]("width") <= 16 && r.getAs[Int]("height") <= 16)
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("height") >= 1)
    }
  }

  test("frameSample slices real bytes: fixed frames, every Nth kept") {
    val df = Seq((1L, "abcdefghij".getBytes("UTF-8"))).toDF("id", "payload")
    val frames = df.select(
      Multimodal.frameSample($"payload", 4, 2).as("f")).head().getSeq[Array[Byte]](0)
    // frames of 4 bytes: [abcd][efgh][ij] -> keep index 0 and 2
    assert(frames.length == 2)
    assert(new String(frames(0), "UTF-8") == "abcd")
    assert(new String(frames(1), "UTF-8") == "ij")
  }

  // ---- REAL codecs (JDK javax.imageio / javax.sound.sampled) ----

  private def gradientPng(w: Int, h: Int, seed: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 31 + y * 17 + seed) % 256
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  test("decodeImage reads back exact dims and mean through the real PNG codec") {
    val bytes = Multimodal.encodePng(13, 7, (200 << 16) | (200 << 8) | 200)
    val m = Multimodal.decodeImage(bytes).get
    assert(m.width == 13 && m.height == 7 && m.channels == 3)
    assert(m.grayMean == 200.0 / 255.0) // lossless: exact, not approximate
    assert(m.thumb.length == 64 && m.thumb.forall(v => math.abs(v - 200f / 255f) < 1e-6))
    // gradient content: thumbnail cells differ (it is not a constant hash)
    val g = Multimodal.decodeImage(gradientPng(32, 32, 0)).get
    assert(g.thumb.distinct.length > 8)
  }

  test("decodeImage handles JPEG too, and never throws on garbage") {
    val im = new java.awt.image.BufferedImage(
      20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    val m = Multimodal.decodeImage(bos.toByteArray).get
    assert(m.width == 20 && m.height == 10)
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
  }

  test("decodeAudio reads back exact format facts through the real WAV codec") {
    val samples = Array.tabulate(400)(i => (if (i < 200) 1000 else -2000).toShort)
    val bytes = Multimodal.encodeWavPcm16(samples, 8000)
    val m = Multimodal.decodeAudio(bytes).get
    assert(m.sampleRate == 8000 && m.channels == 1 && m.frames == 400)
    assert(m.durationSec == 400 / 8000.0)
    // rms = sqrt((200*1000^2 + 200*2000^2)/400)/32768
    assert(math.abs(m.rms - math.sqrt((200 * 1000.0 * 1000 + 200 * 2000.0 * 2000) / 400) / 32768.0) < 1e-12)
    // 8-window envelope tracks the amplitude step
    assert(m.envelope.length == 8)
    assert(m.envelope.take(4).forall(v => math.abs(v - 1000f / 32768f) < 1e-5))
    assert(m.envelope.drop(4).forall(v => math.abs(v - 2000f / 32768f) < 1e-5))
    assert(Multimodal.decodeAudio("not audio".getBytes).isEmpty)
  }

  test("decodeY4m reads back exact dims, frames, duration, mean luma") {
    val bytes = Multimodal.encodeY4m(6, 4, Array(100, 200, 50))
    val m = Multimodal.decodeY4m(bytes).get
    assert(m.width == 6 && m.height == 4 && m.frames == 3)
    assert(m.fps.contains(25.0) && m.durationSec.contains(3 / 25.0))
    // exact: (100+200+50)/3/255 via one integer-exact division chain
    assert(m.grayMean == (100.0 + 200 + 50) * 24 / (24 * 3) / 255.0)
    assert(m.thumb.length == 64 &&
      m.thumb.forall(v => math.abs(v - 100f / 255f) < 1e-6)) // first frame
    // mono colorspace (no chroma planes) parses too
    val mono = ("YUV4MPEG2 W4 H2 F30:1 Cmono\nFRAME\n".getBytes("US-ASCII")
      ++ Array.fill(8)(64.toByte))
    val mm = Multimodal.decodeY4m(mono).get
    assert(mm.frames == 1 && mm.grayMean == 64.0 / 255.0)
    assert(Multimodal.decodeY4m("garbage".getBytes).isEmpty)
    assert(Multimodal.decodeY4m(null).isEmpty)
    // truncated frame -> reject, not a bogus partial decode
    assert(Multimodal.decodeY4m(bytes.dropRight(5)).map(_.frames).contains(2) ||
      Multimodal.decodeY4m(bytes.dropRight(5)).isEmpty)
  }

  private def mjpegAvi(frames: Seq[Array[Byte]],
      microSecPerFrame: Option[Int] = None): Array[Byte] = {
    // minimal RIFF/AVI: optional hdrl LIST with an avih chunk, then a movi
    // LIST of 00dc JPEG chunks (word-aligned, as the format requires)
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
    }
    val hdrl = microSecPerFrame.toSeq.flatMap { us =>
      chunk("LIST", "hdrl".getBytes("US-ASCII") ++
        chunk("avih", le32(us) ++ Array.fill(52)(0.toByte)))
    }.toArray
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(payload.length))
    bos.write(payload)
    bos.toByteArray
  }

  test("decodeAviMjpeg walks the RIFF tree and decodes JPEG frames") {
    def jpeg(gray: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 16)
        im.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
    val avi = mjpegAvi(Seq(jpeg(100), jpeg(150), jpeg(200)),
      microSecPerFrame = Some(40000)) // 25 fps
    val m = Multimodal.decodeAviMjpeg(avi).get
    assert(m.width == 16 && m.height == 8 && m.frames == 3)
    assert(m.fps.exists(f => math.abs(f - 25.0) < 1e-9))
    assert(m.durationSec.exists(d => math.abs(d - 0.12) < 1e-9))
    // JPEG is lossy but a solid mid-gray survives within a few levels
    assert(math.abs(m.grayMean - 150.0 / 255.0) < 0.03)
    // without an avih header: frames still decode, timing unknown
    val bare = Multimodal.decodeAviMjpeg(mjpegAvi(Seq(jpeg(80)))).get
    assert(bare.frames == 1 && bare.fps.isEmpty && bare.durationSec.isEmpty)
    assert(Multimodal.decodeAviMjpeg("RIFFjunk".getBytes).isEmpty)
    assert(Multimodal.decodeVideo(avi).get.frames == 3) // sniffer: AVI
    assert(Multimodal.decodeVideo(
      Multimodal.encodeY4m(2, 2, Array(9))).get.frames == 1) // sniffer: Y4M
  }

  test("decodeAviMjpeg maxFrames: even-stride sampling caps JPEG decodes " +
      "on a many-frame clip; uncapped arm keeps exact accumulation") {
    def jpeg(gray: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 16)
        im.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
    // 64 frames; the strided sample (cap 8 -> stride 8 -> indices 0,8,..,56)
    // is all luma-200 while every other frame is luma-60, so grayMean
    // proves WHICH frames were JPEG-decoded, not just how many
    val lumas = (0 until 64).map(i => if (i % 8 == 0) 200 else 60)
    val avi = mjpegAvi(lumas.map(jpeg), microSecPerFrame = Some(40000))
    val full = Multimodal.decodeAviMjpeg(avi).get
    val capped = Multimodal.decodeAviMjpeg(avi, maxFrames = 8).get
    // both arms report the clip's container length and timing
    assert(full.frames == 64 && capped.frames == 64)
    assert(capped.durationSec == full.durationSec)
    // thumbnail comes from frame 0 in both arms
    assert(capped.thumb.toSeq == full.thumb.toSeq)
    // sampled mean = the 8 luma-200 frames only; full mean = all 64
    assert(math.abs(capped.grayMean - 200.0 / 255.0) < 0.03)
    assert(math.abs(full.grayMean - (8 * 200 + 56 * 60) / 64.0 / 255.0) < 0.03)
    // cap above the chunk count: exact arm, bit-identical to the default
    val uncapped = Multimodal.decodeAviMjpeg(avi, maxFrames = 1000).get
    assert(uncapped.grayMean == full.grayMean && uncapped.frames == 64)
  }

  test("videoFingerprints: frame-sampled aHash feeds the Hamming miner; " +
      "same-first-frame clips pair, different material does not") {
    def gradJpeg(invert: Boolean): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 16) {
        val g = if (invert) 255 - x * 16 else x * 16
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
    def flat(gray: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 16)
        im.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "jpg", bos)
      bos.toByteArray
    }
    // A and B share frame 0 (the fingerprint surface) but differ in their
    // 40-frame tails; C is different material; D is not video at all
    val clipA = mjpegAvi(gradJpeg(invert = false) +: Seq.fill(40)(flat(60)))
    val clipB = mjpegAvi(gradJpeg(invert = false) +: Seq.fill(40)(flat(200)))
    val clipC = mjpegAvi(gradJpeg(invert = true) +: Seq.fill(40)(flat(60)))
    val media = Seq(
      (1L, clipA, "video/avi"), (2L, clipB, "video/avi"),
      (3L, clipC, "video/avi"), (4L, "not a clip".getBytes, "text/plain"))
      .toDF("doc_id", "media", "media_type")
    val fps = Multimodal.videoFingerprints(media, maxFrames = 4)
    val rows = fps.orderBy($"doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L)) // text row excluded
    val Seq(sa, sb, sc) = rows.map(_.getString(1)).toSeq
    assert(sa == sb) // identical first frame -> identical fingerprint
    assert(sa.zip(sc).count { case (x, y) => x != y } > 8) // different material
    val pairs = graft.ops.Dedup.simHashNearDupPairsFromFingerprints(
      fps, "doc_id", maxHamming = 3, bands = 4)
      .select($"a", $"b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("decodeMedia video arm: real metadata, channels stays NULL, " +
      "unsupported codecs quarantine") {
    val rows = Seq(
      org.apache.spark.sql.Row(1L, Multimodal.encodeY4m(4, 2, Array(10, 20)),
        "video/y4m"),
      org.apache.spark.sql.Row(2L, "not a container".getBytes("UTF-8"),
        "video/mp4"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val out = Multimodal.decodeMedia(df).orderBy($"doc_id").collect()
    val v = out(0)
    assert(v.getAs[Boolean]("decode_ok") && v.getAs[Int]("width") == 4 &&
      v.getAs[Long]("n_frames") == 2L &&
      v.isNullAt(v.fieldIndex("channels")) && // image-only marker stays null
      v.getSeq[Float](v.fieldIndex("features")).length == 64)
    assert(!out(1).getAs[Boolean]("decode_ok"))
    // the image fingerprint path must NOT pick up video thumbnails
    val fps = Multimodal.imageFingerprints(df)
    assert(fps.count() == 0)
  }

  test("decodeMedia dispatches by declared type; corrupt payloads quarantine, not crash") {
    val rows = Seq(
      (1L, Multimodal.encodePng(4, 4, 0x808080), "image/png"),
      (2L, Multimodal.encodeWavPcm16(Array.fill(100)(640.toShort), 8000), "audio/wav"),
      (3L, "plain old text".getBytes("UTF-8"), "text/plain"),
      (4L, "garbage".getBytes("UTF-8"), "image/png"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => org.apache.spark.sql.Row(r._1, r._2, r._3))),
      Multimodal.mediaSchema)
    val out = Multimodal.decodeMedia(df).orderBy($"doc_id").collect()
    val img = out(0)
    assert(img.getAs[Int]("width") == 4 && img.getAs[Int]("channels") == 3 &&
      img.isNullAt(img.fieldIndex("sample_rate")) &&
      img.getSeq[Float](img.fieldIndex("features")).length == 64)
    val aud = out(1)
    assert(aud.getAs[Int]("sample_rate") == 8000 && aud.getAs[Long]("n_frames") == 100 &&
      aud.isNullAt(aud.fieldIndex("width")) &&
      aud.getSeq[Float](aud.fieldIndex("features")).length == 8)
    val txt = out(2) // stub arm: pipeline shape preserved for codec-less types
    assert(txt.getAs[Boolean]("decode_ok") &&
      txt.getSeq[Float](txt.fieldIndex("features")).length == 8)
    val bad = out(3) // declared image, garbage bytes -> quarantined row
    assert(!bad.getAs[Boolean]("decode_ok") && bad.isNullAt(bad.fieldIndex("width")))
  }

  test("decodeMedia stub arm quarantines null/empty payloads (decode_ok=false)") {
    val rows = Seq(
      org.apache.spark.sql.Row(1L, Array.empty[Byte], "text/plain"),
      org.apache.spark.sql.Row(2L, null, "video/mp4"),
      org.apache.spark.sql.Row(3L, "bytes".getBytes("UTF-8"), "text/plain"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val out = Multimodal.decodeMedia(df).orderBy($"doc_id").collect()
    // a missing stub-type payload must be distinguishable from a decoded one
    assert(!out(0).getAs[Boolean]("decode_ok") && out(0).isNullAt(out(0).fieldIndex("width")))
    assert(!out(1).getAs[Boolean]("decode_ok") && out(1).isNullAt(out(1).fieldIndex("features")))
    assert(out(2).getAs[Boolean]("decode_ok") &&
      out(2).getSeq[Float](out(2).fieldIndex("features")).length == 8)
  }

  test("decodeAudio accepts 8-bit WAV (PCM_UNSIGNED per the WAV spec)") {
    // hand-build an 8-bit unsigned mono WAV: constant sample 128+50
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val raw = Array.fill(100)((128 + 50).toByte)
    val ain = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, raw.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ain, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val m = Multimodal.decodeAudio(bos.toByteArray).get
    assert(m.sampleRate == 8000 && m.channels == 1 && m.frames == 100)
    assert(m.rms == 50.0 / 128.0) // recentered by -128, exact for a constant
    val grid = Multimodal.audioSpectralGrid(bos.toByteArray)
    assert(grid.exists(_.length == 64)) // spectral path accepts it too
  }

  test("imageFingerprints excludes stub-decoded rows on a mixed-type table") {
    // text/video payloads stub-decode with decode_ok=true and a width, but
    // have no perceptual identity: 8-dim features would make degenerate
    // 8-bit hashes that all collide into the same Hamming buckets
    val rows = Seq(
      org.apache.spark.sql.Row(1L, gradientPng(24, 24, 0), "image/png"),
      org.apache.spark.sql.Row(2L, "some text".getBytes("UTF-8"), "text/plain"),
      org.apache.spark.sql.Row(3L, "fake video bytes".getBytes("UTF-8"), "video/mp4"),
      org.apache.spark.sql.Row(4L, gradientPng(24, 24, 64), "image/png"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val fps = Multimodal.imageFingerprints(df).localCheckpoint()
    assert(fps.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    assert(fps.head().getString(1).length == 64)
  }

  test("imageFingerprints: perceptual near-dup via the existing Hamming machinery") {
    val base = gradientPng(32, 32, 0)
    // near-dup: same gradient, one pixel nudged
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    im.setRGB(5, 5, 0x828282)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val nearDup = bos.toByteArray
    val different = gradientPng(32, 32, 131) // different gradient phase
    val rows = Seq((1L, base), (2L, nearDup), (3L, different))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => org.apache.spark.sql.Row(r._1, r._2, "image/png"))),
      Multimodal.mediaSchema)
    val fps = Multimodal.imageFingerprints(df).localCheckpoint()
    assert(fps.count() == 3)
    assert(fps.head().getString(1).length == 64) // packed SimHash format
    val pairs = graft.ops.Dedup.simHashNearDupPairsFromFingerprints(fps, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // the perturbed copy is found
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  private def toneWav(freqs: Seq[Double], n: Int, sr: Int,
      noise: Double, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val samples = Array.tabulate(n) { i =>
      val t = i.toDouble / sr
      val v = freqs.map(f => math.sin(2 * math.Pi * f * t)).sum / freqs.size
      ((v * 0.5 + noise * (rnd.nextDouble() * 2 - 1)) * 20000).toShort
    }
    Multimodal.encodeWavPcm16(samples, sr)
  }

  test("audioSpectralGrid: tones light up their bands; near-dup clips hash close") {
    // bands for sr=8000: Nyquist/2^(8-k) = 15.6, 31.25, 62.5, 125, 250,
    // 500, 1000, 2000 Hz
    val a = toneWav(Seq(250.0, 1000.0), 8000, 8000, 0.0, 1)
    val grid = Multimodal.audioSpectralGrid(a).get
    assert(grid.length == 64)
    // in every window, the 250 Hz (k=4) and 1000 Hz (k=6) bands dominate
    for (w <- 0 until 8) {
      val win = grid.slice(w * 8, w * 8 + 8)
      val top2 = win.zipWithIndex.sortBy(-_._1).take(2).map(_._2).toSet
      assert(top2 == Set(4, 6), s"window $w top bands $top2")
    }
    assert(Multimodal.audioSpectralGrid("junk".getBytes).isEmpty)

    // fingerprints: a noised copy is a near-dup, different material is not
    val rows = Seq(
      (1L, a),
      (2L, toneWav(Seq(250.0, 1000.0), 8000, 8000, 0.02, 99)),
      (3L, toneWav(Seq(62.5, 2000.0), 8000, 8000, 0.0, 1)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, "audio/wav"))),
      Multimodal.mediaSchema)
    val fps = Multimodal.audioFingerprints(df).localCheckpoint()
    val pairs = graft.ops.Dedup.simHashNearDupPairsFromFingerprints(fps, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("property: PNG and WAV round-trips are exact for random shapes") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40); val c = rnd.nextInt(256)
      val m = Multimodal.decodeImage(Multimodal.encodePng(w, h, (c << 16) | (c << 8) | c)).get
      assert(m.width == w && m.height == h && m.channels == 3)
      assert(m.grayMean == c / 255.0) // lossless codec: EXACT equality
      assert(m.thumb.forall(v => math.abs(v - c / 255f) < 1e-6))
    }
    for (_ <- 1 to 25) {
      val n = 1 + rnd.nextInt(500); val amp = (rnd.nextInt(4001) - 2000).toShort
      val m = Multimodal.decodeAudio(Multimodal.encodeWavPcm16(Array.fill(n)(amp), 16000)).get
      assert(m.frames == n && m.sampleRate == 16000 && m.channels == 1)
      assert(m.durationSec == n / 16000.0)
      assert(m.rms == math.abs(amp.toDouble) / 32768.0) // EXACT for a constant tone
    }
  }

  test("decodeMedia runs on a streaming source (media ingest -> features)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Array[Byte], String)]
    val df = stream.toDF().toDF("doc_id", "media", "media_type")
    val q = Multimodal.decodeMedia(df).writeStream
      .format("memory").queryName("mm_decoded").outputMode("append").start()
    try {
      stream.addData(
        (1L, Multimodal.encodePng(6, 4, 0x404040), "image/png"),
        (2L, Multimodal.encodeWavPcm16(Array.fill(80)(512.toShort), 8000), "audio/wav"))
      q.processAllAvailable()
      val rows = spark.table("mm_decoded").orderBy($"doc_id").collect()
      assert(rows(0).getAs[Int]("width") == 6 && rows(0).getAs[Int]("height") == 4)
      assert(rows(1).getAs[Long]("n_frames") == 80L &&
        rows(1).getAs[Int]("sample_rate") == 8000)
    } finally q.stop()
  }

  test("decoded thumbnails feed the ANN index path (image similarity end-to-end)") {
    // 12 gradient images in 2 visual families; top-k by thumbnail distance
    // must rank same-family images first — the multimodal -> vector-engine
    // composition, through the REAL codec
    val rows = (0 until 12).map { i =>
      org.apache.spark.sql.Row(i.toLong, gradientPng(24, 24, (i % 2) * 128 + i / 2), "image/png")
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val feats = Multimodal.decodeMedia(df)
      .select($"doc_id", $"features").localCheckpoint()
    val probe = feats.where($"doc_id" === 0).head().getSeq[Float](1).toArray
    val top = graft.Graft.topK(feats, "features", probe, 6, "l2sq", Seq("doc_id"))
      .select($"doc_id").as[Long].collect()
    // family of doc 0 = even ids (seed phase 0): all 6 nearest are even
    assert(top.head == 0L && top.forall(_ % 2 == 0))
  }

  test("decoded features feed the vector kernels (multimodal -> ANN pipeline)") {
    val feats = Multimodal.decode(media).filter($"doc_id" < 3)
      .select($"doc_id", $"features")
    val paired = feats.as("a").crossJoin(feats.as("b"))
      .select(graft.functions.vector.array_distance_sq(
        col("a.features"), col("b.features")).as("d"))
    val ds = paired.as[Double].collect()
    assert(ds.length == 4 && ds.count(_ == 0.0) >= 2) // self-pairs at 0
  }
}
