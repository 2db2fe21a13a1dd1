package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for large-scale training-data
  * pipelines: media payloads travel as opaque `binary` columns with typed
  * metadata, and all media-touching transforms are partition-parallel,
  * narrow (no shuffle), and batch-shaped.
  *
  * Decode is REAL for all three modalities: `javax.imageio`
  * (PNG/JPEG/BMP/GIF/TIFF — [[decodeImage]]), `javax.sound.sampled`
  * (WAV/AIFF/AU PCM — [[decodeAudio]]), and pure-JVM video container
  * parsing (Y4M raw video + MJPEG-in-AVI through the JPEG codec —
  * [[decodeVideo]]), dispatched by declared media type in [[decodeMedia]].
  * Only payload types with no JVM decode path at all (e.g. `text/plain`
  * treated as opaque bytes, compressed video codecs like H.264) fall back
  * to the clearly-marked [[decodeStub]] / quarantine; a production
  * deployment swaps only that arm.
  *
  * Every media-touching pass is a mapPartitions over the payload's own
  * partition — at 100 TB the bytes never shuffle; only the typed metadata
  * and fixed-width feature vectors (64-dim image thumbnails, 8-dim audio
  * envelopes) flow into downstream joins, ANN indexes, and dedup. */
object Multimodal {

  /** Canonical media-table schema: id + opaque payload + declared type. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false)))

  /** Build a media table from a text table by treating UTF-8 bytes as the
    * opaque payload (test fixture / fallback modality). */
  def fromText(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      lit("text/plain").as("media_type"))

  // ============================================= decode (STUB — fallback)

  /** STUB decode — the fallback arm of [[decodeMedia]] for formats with no
    * JVM codec (video containers, opaque text payloads). Images and audio
    * use the REAL decoders below; this one derives deterministic
    * pseudo-metadata from the payload bytes so the pipeline shape (schema,
    * batching, downstream feature use) stays exercised for codec-less
    * types: width/height from the leading bytes, an 8-dim float "feature
    * vector" from the payload's md5. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) =
    if (bytes == null || bytes.isEmpty) (0, 0, Array.fill(8)(0f))
    else {
      val w = 1 + (bytes(0) & 0x7f)
      val h = 1 + (bytes(if (bytes.length > 1) 1 else 0) & 0x7f)
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val feats = Array.tabulate(8)(i => (md(i) & 0xff) / 255.0f)
      (w, h, feats)
    }

  /** Decode pass: one batch-shaped partition iteration appending typed
    * metadata + a feature vector usable with the engine's distance kernels
    * and HNSW index. Narrow (partitioning preserved, no shuffle); at 100TB
    * this is the mapInPandas/mapPartitions shape — payload bytes never leave
    * their partition. */
  def decode(df: DataFrame, binCol: String = "media"): DataFrame = {
    val outSchema = df.schema
      .add("width", IntegerType, nullable = false)
      .add("height", IntegerType, nullable = false)
      .add("features", ArrayType(FloatType, containsNull = false), nullable = false)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val (w, h, f) = decodeStub(bytes)
        Row.fromSeq(r.toSeq :+ w :+ h :+ f.toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** "Resize" on the stub representation: rescale the declared dimensions,
    * keep features (a real impl re-encodes pixels). Pure column algebra. */
  def resize(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height"), lit(1)))
    df.withColumn("width", greatest(lit(1), floor(col("width") * scale).cast(IntegerType)))
      .withColumn("height", greatest(lit(1), floor(col("height") * scale).cast(IntegerType)))
  }

  // ============================================== image decode (REAL, JDK)

  /** Decoded image: true pixel dimensions, channel count, exact mean
    * intensity in [0,1], and an 8x8 area-averaged grayscale thumbnail
    * (row-major, 64 floats in [0,1]) — the classic perceptual-feature grid
    * that feeds [[imageFingerprints]] and the engine's distance kernels. */
  final case class ImageMeta(width: Int, height: Int, channels: Int,
      grayMean: Double, thumb: Array[Float])

  /** Real image decode via the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF/
    * TIFF). None for null/empty/undecodable payloads — callers choose the
    * degradation, the codec never throws on garbage bytes.
    *
    * `grayMean` is computed exactly as `sum(r+g+b) / (3*n) / 255` with an
    * integer accumulator, so for synthetic fixtures it is bit-reproducible
    * by SQL arithmetic (the q83 oracle relies on this). One O(pixels) pass
    * fills both the mean and the 8x8 thumbnail bins. */
  /** PNG reader/writer SPIs resolved ONCE per JVM — `ImageIO.read`/`write`
    * scan the synchronized IIORegistry on EVERY call, and under 32 codec
    * threads that lock convoy collapses throughput super-linearly in row
    * count (measured: q83 at sf1 ran 50k tiny PNGs in 36 s — ~60× the
    * per-row cost of the sf0.1 run — with both scans on the per-row path;
    * the round-9 audio-side SPI cache fixed the same disease for WAV).
    * Reader/writer INSTANCES are not thread-safe, so each call creates one
    * from the cached SPI (cheap, no lock) and disposes it. */
  /** Reader SPIs cached per FORMAT, resolved from the registry once per
    * (JVM, format) and dispatched by container magic — the same shape as
    * the audio-side fix: every JPEG frame of an MJPEG clip used to fall
    * through to `ImageIO.read`'s synchronized registry scan (the PNG-only
    * fast path covered q83's fixtures but not the video frame path). All
    * five JDK formats carry public magic bytes. */
  private val readerSpiCache =
    new java.util.concurrent.ConcurrentHashMap[
      String, Option[javax.imageio.spi.ImageReaderSpi]]()
  private def readerSpiFor(format: String): Option[javax.imageio.spi.ImageReaderSpi] =
    readerSpiCache.computeIfAbsent(format, f => {
      val it = javax.imageio.spi.IIORegistry.getDefaultInstance
        .getServiceProviders(classOf[javax.imageio.spi.ImageReaderSpi], true)
      var found: Option[javax.imageio.spi.ImageReaderSpi] = None
      while (it.hasNext && found.isEmpty) {
        val spi = it.next()
        if (spi.getFormatNames.exists(_.equalsIgnoreCase(f))) found = Some(spi)
      }
      found
    })
  private def sniffImageFormat(bytes: Array[Byte]): Option[String] = {
    if (bytes.length < 8) return None
    def b(i: Int): Int = bytes(i) & 0xff
    if (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') Some("png")
    else if (b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) Some("jpeg")
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') Some("gif")
    else if (b(0) == 'B' && b(1) == 'M') Some("bmp")
    else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)) Some("tiff")
    else None
  }
  private lazy val pngWriterSpi: Option[javax.imageio.spi.ImageWriterSpi] = {
    val it = javax.imageio.spi.IIORegistry.getDefaultInstance
      .getServiceProviders(classOf[javax.imageio.spi.ImageWriterSpi], true)
    var found: Option[javax.imageio.spi.ImageWriterSpi] = None
    while (it.hasNext && found.isEmpty) {
      val spi = it.next()
      if (spi.getFormatNames.exists(_.equalsIgnoreCase("png"))) found = Some(spi)
    }
    found
  }
  def decodeImage(bytes: Array[Byte]): Option[ImageMeta] = {
    if (bytes == null || bytes.length == 0) return None
    val img =
      try {
        // magic-dispatched fast path through the per-format cached SPI
        // (no registry scan); any failure or unrecognized magic falls
        // through to ImageIO's full dispatch, so behavior is unchanged
        // for every other format
        val fast = sniffImageFormat(bytes)
          .flatMap(readerSpiFor)
          .flatMap { spi =>
            val reader = spi.createReaderInstance()
            val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try { reader.setInput(iis, true, true); Option(reader.read(0)) }
            catch { case _: Exception => None }
            finally { reader.dispose(); iis.close() }
          }
        fast.orElse(Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))))
      } catch { case _: Exception => None }
    img.map { im =>
      val w = im.getWidth; val h = im.getHeight
      val n = w.toLong * h
      var sumRgb = 0L
      val cellSum = new Array[Double](64)
      val cellCnt = new Array[Long](64)
      // row-strip getRGB into a reused buffer: per-pixel getRGB pays a
      // color-model conversion call per pixel (ruinous on megapixel
      // images), while a full-frame fetch allocates 4 bytes/px twice;
      // one row at a time is the constant-memory middle
      val rowBuf = new Array[Int](w)
      var y = 0
      while (y < h) {
        im.getRGB(0, y, w, 1, rowBuf, 0, w)
        val cy = (y * 8 / h) * 8
        var x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sumRgb += r + g + b
          val cell = cy + (x * 8 / w)
          cellSum(cell) += (r + g + b) / 3.0
          cellCnt(cell) += 1
          x += 1
        }
        y += 1
      }
      val thumb = Array.tabulate(64) { i =>
        if (cellCnt(i) > 0) (cellSum(i) / cellCnt(i) / 255.0).toFloat
        else {
          // image smaller than the 8x8 grid: no pixel binned into this
          // cell — sample the cell-center pixel (nearest-neighbor upscale)
          val px = math.min(w - 1, (i % 8 * 2 + 1) * w / 16)
          val py = math.min(h - 1, (i / 8 * 2 + 1) * h / 16)
          val rgb = im.getRGB(px, py)
          ((((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0 / 255.0).toFloat
        }
      }
      ImageMeta(w, h, im.getColorModel.getNumComponents,
        sumRgb.toDouble / (3.0 * n) / 255.0, thumb)
    }
  }

  /** Encode a solid-color RGB PNG through the JDK codec — the synthesis
    * side of the lossless round-trip the q83 oracle checks. Executor-side
    * (used inside mapPartitions); tiny images, in-memory stream only. */
  def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { im.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    pngWriterSpi match {
      case Some(spi) => // cached SPI: no per-call registry scan (see above)
        val writer = spi.createWriterInstance()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        try { writer.setOutput(ios); writer.write(im) }
        finally { writer.dispose(); ios.close() }
      case None => javax.imageio.ImageIO.write(im, "png", bos)
    }
    bos.toByteArray
  }

  // ============================================== audio decode (REAL, JDK)

  /** Decoded audio: format facts, exact RMS amplitude in [0,1], and an
    * 8-window RMS energy envelope (the fixed-width audio feature vector). */
  final case class AudioMeta(sampleRate: Int, channels: Int, frames: Long,
      durationSec: Double, rms: Double, envelope: Array[Float])

  /** The JDK's audio SPI providers, resolved ONCE per JVM: every
    * `AudioSystem.getAudioInputStream`/`write` call routes through a
    * SYNCHRONIZED provider lookup (`JDK13Services.getProviders`), which
    * serializes a 32-thread decode pass — measured ~2.5x slower than
    * single-threaded on a per-row codec stage. Calling the cached
    * stateless providers directly restores linear scaling. */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }
  private lazy val audioWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Readers bucketed by the container magic they can possibly accept.
    * Dispatch order matters at 32 threads: the JDK's
    * SoftMidiAudioFileReader internally calls `MidiSystem.getProviders` —
    * the SAME synchronized JDK13Services registry scan the cached-SPI fix
    * exists to avoid — so letting every WAV payload reach it re-serializes
    * the whole decode pass through that lock (measured: 32-thread decode at
    * 0.5× the SINGLE-thread rate; stack samples all parked in
    * JSSecurityManager.getProviders). Each format's magic is public spec:
    * RIFF→WAVE, FORM→AIFF, .snd→AU, MThd→MIDI — a payload without MThd is
    * not a MIDI file, so the MIDI reader is only ever tried on MThd.
    * Readers whose class name matches none of the known families are
    * "unknown" and stay in every fallback list (exotic-JVM safety). */
  private lazy val readersByFamily: Map[String, Seq[javax.sound.sampled.spi.AudioFileReader]] = {
    audioReaders.groupBy(audioReaderFamily).withDefaultValue(Seq.empty)
  }

  /** "Midi" must be tested before "Au": the JDK's MIDI reader is
    * `SoftMidiAudioFileReader`, whose "Audio" substring would otherwise
    * match "Au" and bucket it with the AU-format reader — emptying the
    * midi family (MThd payloads stop decoding) AND letting .snd/garbage
    * payloads reach the MIDI reader's synchronized provider scan. */
  private[graft] def audioReaderFamily(
      r: javax.sound.sampled.spi.AudioFileReader): String = {
    val n = r.getClass.getSimpleName
    if (n.contains("Midi")) "midi"
    else if (n.contains("Wave")) "wave"
    else if (n.contains("Aiff")) "aiff"
    else if (n.contains("Au")) "au"
    else "unknown"
  }

  /** Reader families tried for a payload with the given leading bytes —
    * exposed for the dispatch spec (MThd must reach "midi"; .snd and
    * garbage must never include it). */
  private[graft] def audioDispatchFamilies(bytes: Array[Byte]): Seq[String] = {
    val magic =
      if (bytes != null && bytes.length >= 4) new String(bytes, 0, 4, "US-ASCII")
      else ""
    magic match {
      case "RIFF" => Seq("wave", "unknown")
      case "FORM" => Seq("aiff", "unknown")
      case ".snd" => Seq("au", "unknown")
      case "MThd" => Seq("midi", "unknown")
      case _ => Seq("wave", "aiff", "au", "unknown")
    }
  }

  private def openAudioStream(
      bytes: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] = {
    val candidates = audioDispatchFamilies(bytes).flatMap(readersByFamily)
    var i = 0
    while (i < candidates.length) {
      try return Some(candidates(i).getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => }
      i += 1
    }
    // empty provider list (exotic JVM): fall back to the locked dispatch
    if (audioReaders.isEmpty)
      scala.util.Try(javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))).toOption
    else None
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU,
    * 8- or 16-bit PCM). None for null/empty/undecodable payloads.
    *
    * `rms` is `sqrt(sum(s^2)/frames) / fullScale` with integer-valued
    * accumulation over per-frame channel-mean samples, so constant-tone
    * fixtures reproduce exactly in SQL (the q84 oracle relies on this). */
  def decodeAudio(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val in = openAudioStream(bytes).getOrElse(return None)
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        // 8-bit WAV is PCM_UNSIGNED per the WAV spec (signed 8-bit only
        // exists in AIFF/AU) — accept it and recenter by -128 below
        val unsigned8 =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED &&
            bits == 8
        if (!unsigned8 &&
            (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
             (bits != 8 && bits != 16))) return None
        val ch = fmt.getChannels
        val bytesPerSample = bits / 8
        val data = in.readAllBytes()
        val frames = data.length.toLong / (bytesPerSample * ch)
        if (frames == 0) return None
        val fullScale = if (bits == 16) 32768.0 else 128.0
        // per-frame sample = mean over channels, kept integer-exact via the
        // channel sum (divide once at the end)
        var sumSqNum = 0.0 // sum over frames of (channel-sum)^2
        val winSqNum = new Array[Double](8)
        val winCnt = new Array[Long](8)
        var f = 0L
        var off = 0
        while (f < frames) {
          var chSum = 0L
          var c = 0
          while (c < ch) {
            val s =
              if (bits == 16) {
                val lo = data(off) & 0xff; val hi = data(off + 1)
                if (fmt.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
                else (hi << 8) | lo
              } else if (unsigned8) (data(off) & 0xff) - 128
              else data(off).toInt
            chSum += s
            off += bytesPerSample
            c += 1
          }
          val sq = chSum.toDouble * chSum
          sumSqNum += sq
          val win = ((f * 8) / frames).toInt
          winSqNum(win) += sq
          winCnt(win) += 1
          f += 1
        }
        val chScale = ch.toDouble * fullScale
        val envelope = Array.tabulate(8) { i =>
          if (winCnt(i) == 0) 0f
          else (math.sqrt(winSqNum(i) / winCnt(i)) / chScale).toFloat
        }
        Some(AudioMeta(fmt.getSampleRate.toInt, ch, frames,
          frames / fmt.getSampleRate.toDouble,
          math.sqrt(sumSqNum / frames) / chScale, envelope))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Encode 16-bit little-endian mono PCM as a WAV container through the
    * JDK codec — the synthesis side of the q84 round-trip. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(i * 2) = (samples(i) & 0xff).toByte
      pcm(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
      true, false)
    val ain = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    // cached provider, not AudioSystem.write: see audioReaders note
    audioWriters.find(_.isFileTypeSupported(wave, ain)) match {
      case Some(w) => w.write(ain, wave, bos)
      case None => javax.sound.sampled.AudioSystem.write(ain, wave, bos)
    }
    bos.toByteArray
  }

  // ============================================== video decode (REAL, JVM)

  /** Decoded video: pixel dimensions, frame count, frames-per-second (None
    * when the container carries no timing), duration, exact mean luma in
    * [0,1] over ALL frames, and the 8x8 grayscale thumbnail of the FIRST
    * frame (the clip's perceptual anchor, same grid as [[ImageMeta]]). */
  final case class VideoMeta(width: Int, height: Int, frames: Int,
      fps: Option[Double], durationSec: Option[Double], grayMean: Double,
      thumb: Array[Float])

  /** Real Y4M (YUV4MPEG2) decode — a public, header-simple raw-video
    * format: one ASCII parameter line (`YUV4MPEG2 W.. H.. F<num>:<den>
    * C<colorspace>`), then per frame an ASCII `FRAME` line followed by raw
    * planar YUV. Pure byte parsing, no codec dependency. Supported
    * colorspaces: 420 (default, any variant tag), 422, 444, mono.
    *
    * `grayMean` is the exact integer-accumulated mean of the LUMA plane
    * across all frames (`sum(Y) / (w*h*frames) / 255`) — for synthetic
    * constant-luma fixtures it is bit-reproducible by SQL arithmetic (the
    * q85 oracle relies on this, like q83/q84 for image/audio). None for
    * null/empty/undecodable payloads; never throws on garbage. */
  def decodeY4m(bytes: Array[Byte]): Option[VideoMeta] = {
    if (bytes == null || bytes.length < 10) return None
    try {
      val magic = "YUV4MPEG2"
      var i = 0
      while (i < magic.length) {
        if (bytes(i) != magic.charAt(i)) return None
        i += 1
      }
      var hdrEnd = i
      while (hdrEnd < bytes.length && bytes(hdrEnd) != '\n') hdrEnd += 1
      if (hdrEnd >= bytes.length) return None
      val params = new String(bytes, i, hdrEnd - i, "US-ASCII")
        .trim.split("\\s+").filter(_.nonEmpty)
      var w = -1; var h = -1
      var fpsNum = 0L; var fpsDen = 0L
      var cs = "420"
      params.foreach { p =>
        p.charAt(0) match {
          case 'W' => w = p.drop(1).toInt
          case 'H' => h = p.drop(1).toInt
          case 'F' =>
            val nd = p.drop(1).split(":")
            if (nd.length == 2) { fpsNum = nd(0).toLong; fpsDen = nd(1).toLong }
          case 'C' => cs = p.drop(1)
          case _ => // I (interlace), A (aspect), X (extension): irrelevant here
        }
      }
      if (w <= 0 || h <= 0) return None
      val lumaLen = w * h
      val chromaLen =
        if (cs.startsWith("mono")) 0
        else if (cs.startsWith("422")) (w / 2) * h * 2
        else if (cs.startsWith("444")) w * h * 2
        else (w / 2) * (h / 2) * 2 // 420 and its jpeg/mpeg2/paldv variants
      var pos = hdrEnd + 1
      var frames = 0
      var sumLuma = 0L
      val cellSum = new Array[Double](64)
      val cellCnt = new Array[Long](64)
      var thumb: Array[Float] = null
      while (pos < bytes.length) {
        // FRAME line (may carry parameters; consume through '\n')
        if (pos + 5 > bytes.length) return if (frames > 0) finish() else None
        val fm = "FRAME"
        var j = 0
        while (j < 5) {
          if (bytes(pos + j) != fm.charAt(j)) return None
          j += 1
        }
        pos += 5
        while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        pos += 1
        // truncated frame (luma OR chroma cut short): reject the clip —
        // corrupt payloads quarantine, they do not half-decode
        if (pos + lumaLen + chromaLen > bytes.length) return None
        if (frames == 0) {
          // first-frame 8x8 thumbnail, same area-average grid as decodeImage
          var y = 0
          while (y < h) {
            val cy = (y * 8 / h) * 8
            val rowOff = pos + y * w
            var x = 0
            while (x < w) {
              val v = bytes(rowOff + x) & 0xff
              sumLuma += v
              val cell = cy + (x * 8 / w)
              cellSum(cell) += v
              cellCnt(cell) += 1
              x += 1
            }
            y += 1
          }
          thumb = Array.tabulate(64) { c =>
            if (cellCnt(c) > 0) (cellSum(c) / cellCnt(c) / 255.0).toFloat
            else {
              val px = math.min(w - 1, (c % 8 * 2 + 1) * w / 16)
              val py = math.min(h - 1, (c / 8 * 2 + 1) * h / 16)
              ((bytes(pos + py * w + px) & 0xff) / 255.0).toFloat
            }
          }
        } else {
          var k = 0
          while (k < lumaLen) { sumLuma += bytes(pos + k) & 0xff; k += 1 }
        }
        pos += lumaLen + chromaLen
        frames += 1
      }
      def finish(): Option[VideoMeta] = {
        val fps = if (fpsNum > 0 && fpsDen > 0) Some(fpsNum.toDouble / fpsDen) else None
        Some(VideoMeta(w, h, frames, fps,
          fps.map(_ => frames.toDouble * fpsDen / fpsNum),
          sumLuma.toDouble / (lumaLen.toLong * frames) / 255.0, thumb))
      }
      if (frames == 0) None else finish()
    } catch { case _: Exception => None }
  }

  /** Real MJPEG-in-AVI decode: walks the RIFF chunk tree (a public,
    * header-simple container), decodes every `00dc`/`00db` video chunk
    * whose payload is a JPEG through the JDK's javax.imageio, and reads
    * fps from the `avih` header's micro-seconds-per-frame when present.
    * `grayMean` averages the per-frame exact means (all frames share one
    * geometry in MJPEG). None for undecodable payloads; never throws.
    *
    * `maxFrames` caps the number of JPEG-decoded frames via even-stride
    * sampling — the knob for the perceptual-fingerprint/thumbnail surface,
    * where a pathological long clip must not cost O(frames) imageio calls
    * per row. At the default (uncapped) the behavior is exact full
    * accumulation — the arm the q85 oracle's bit-parity relies on. When
    * sampling kicks in, `frames` reports the CONTAINER's video-chunk count
    * (the clip length the sample represents) and `grayMean` is the mean
    * over the sampled frames only. */
  def decodeAviMjpeg(bytes: Array[Byte],
      maxFrames: Int = Int.MaxValue): Option[VideoMeta] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
      def le32(off: Int): Long =
        (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
          ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      var microSecPerFrame = 0L
      val frameChunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def walk(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end) {
          val id = fourcc(p)
          val sz = le32(p + 4).toInt
          val body = p + 8
          if (body + math.max(sz, 0) > end || sz < 0) return // corrupt: stop
          if (id == "LIST") walk(body + 4, body + sz)
          else {
            if (id.endsWith("dc") || id.endsWith("db")) frameChunks += ((body, sz))
            else if (id == "avih" && sz >= 4) microSecPerFrame = le32(body)
          }
          p = body + sz + (sz & 1) // chunks are word-aligned
        }
      }
      walk(12, math.min(bytes.length, 8 + le32(4).toInt))
      if (frameChunks.isEmpty) return None
      val total = frameChunks.size
      val stride =
        if (maxFrames >= total) 1
        else (total + math.max(1, maxFrames) - 1) / math.max(1, maxFrames)
      val sampled =
        if (stride == 1) frameChunks
        else frameChunks.indices.collect {
          case i if i % stride == 0 => frameChunks(i)
        }
      var w = -1; var h = -1
      var graySum = 0.0
      var decoded = 0
      var thumb: Array[Float] = null
      sampled.foreach { case (off, len) =>
        val frame = java.util.Arrays.copyOfRange(bytes, off, off + len)
        decodeImage(frame).foreach { m =>
          if (decoded == 0) { w = m.width; h = m.height; thumb = m.thumb }
          graySum += m.grayMean
          decoded += 1
        }
      }
      if (decoded == 0) return None
      // sampled: frames = container chunk count; exact arm: decode count
      // (the pre-cap semantics every existing pin relies on)
      val reportFrames = if (stride == 1) decoded else total
      val fps = if (microSecPerFrame > 0) Some(1e6 / microSecPerFrame) else None
      Some(VideoMeta(w, h, reportFrames, fps,
        fps.map(reportFrames / _), graySum / decoded, thumb))
    } catch { case _: Exception => None }
  }

  /** Container-sniffing video decode: Y4M by its ASCII magic, AVI by its
    * RIFF header. Formats beyond these two (no pure-JVM codec exists)
    * return None and [[decodeMedia]] quarantines the row. `maxFrames`
    * caps the JPEG decodes of the AVI arm (see [[decodeAviMjpeg]]); Y4M's
    * full accumulation is codec-free byte summing and stays uncapped. */
  def decodeVideo(bytes: Array[Byte],
      maxFrames: Int = Int.MaxValue): Option[VideoMeta] =
    if (bytes == null || bytes.length < 12) None
    else if (bytes(0) == 'Y') decodeY4m(bytes)
    else if (bytes(0) == 'R') decodeAviMjpeg(bytes, maxFrames)
    else None

  /** Encode a constant-luma-per-frame Y4M clip (C420, chroma neutral at
    * 128) — the synthesis side of the q85 round-trip. Even dims required
    * by 4:2:0 subsampling. */
  def encodeY4m(width: Int, height: Int, lumas: Array[Int],
      fpsNum: Int = 25, fpsDen: Int = 1): Array[Byte] = {
    require(width % 2 == 0 && height % 2 == 0, "C420 needs even dimensions")
    val header = s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n"
      .getBytes("US-ASCII")
    val lumaLen = width * height
    val chromaLen = (width / 2) * (height / 2)
    val out = new java.io.ByteArrayOutputStream(
      header.length + lumas.length * (6 + lumaLen + 2 * chromaLen))
    out.write(header)
    lumas.foreach { l =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      val y = new Array[Byte](lumaLen)
      java.util.Arrays.fill(y, l.toByte)
      out.write(y)
      val c = new Array[Byte](chromaLen)
      java.util.Arrays.fill(c, 128.toByte)
      out.write(c); out.write(c)
    }
    out.toByteArray
  }

  // =========================================== typed decode dispatch (REAL)

  private val decodedFields = Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("gray_mean", DoubleType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("duration_sec", DoubleType, nullable = true),
    StructField("rms", DoubleType, nullable = true),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = true))

  /** Typed decode pass: dispatch on the declared media type — `image/...`
    * through the real JDK image codecs, `audio/...` through the real JDK
    * audio codecs, `video/...` through the pure-JVM Y4M/MJPEG-AVI parsers,
    * anything else (e.g. `text/plain`) through
    * [[decodeStub]]'s pseudo-metadata. Appends a uniform nullable metadata
    * block (image rows leave audio fields NULL and vice versa) plus a
    * `features` vector: 64-dim thumbnail for images, 8-dim envelope for
    * audio, the 8-dim stub digest otherwise. Undecodable payloads of a
    * declared real type yield all-NULL metadata rather than a crash — at
    * 100 TB some corrupt payloads are a certainty, and a narrow
    * `decode_ok` filter is the right quarantine, not a failed stage.
    * Narrow (no shuffle), partition-parallel; payload bytes never move. */
  def decodeMedia(df: DataFrame, binCol: String = "media",
      typeCol: String = "media_type",
      maxVideoFrames: Int = Int.MaxValue): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ decodedFields :+
      StructField("decode_ok", BooleanType, nullable = false))
    val binIdx = df.schema.fieldIndex(binCol)
    val typeIdx = df.schema.fieldIndex(typeCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no tmp-file IO per decode
      rows.map { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        val mt = if (r.isNullAt(typeIdx)) "" else r.getString(typeIdx)
        val meta: Seq[Any] =
          if (mt.startsWith("image/")) decodeImage(bytes) match {
            case Some(m) => Seq(m.width, m.height, m.channels, m.grayMean,
              null, null, null, null, m.thumb.toSeq, true)
            case None => Seq(null, null, null, null, null, null, null, null, null, false)
          }
          else if (mt.startsWith("audio/")) decodeAudio(bytes) match {
            case Some(m) => Seq(null, null, null, null, m.sampleRate, m.frames,
              m.durationSec, m.rms, m.envelope.toSeq, true)
            case None => Seq(null, null, null, null, null, null, null, null, null, false)
          }
          // REAL video arm: Y4M + MJPEG-AVI via pure-JVM parsing/codecs.
          // channels stays NULL by design — it is the image-only marker
          // imageFingerprints gates on, and a video thumbnail must not be
          // mined as a still image by default. n_frames/duration_sec carry
          // the clip timing (duration NULL when the container has none).
          else if (mt.startsWith("video/")) decodeVideo(bytes, maxVideoFrames) match {
            case Some(m) => Seq(m.width, m.height, null, m.grayMean,
              null, m.frames.toLong, m.durationSec.orNull,
              null, m.thumb.toSeq, true)
            case None => Seq(null, null, null, null, null, null, null, null, null, false)
          }
          else if (bytes == null || bytes.isEmpty)
            // stub arm quarantines missing payloads like the real arms do:
            // decode_ok must distinguish "decoded" from "nothing to decode"
            Seq(null, null, null, null, null, null, null, null, null, false)
          else {
            val (w, h, f) = decodeStub(bytes)
            Seq(w, h, null, null, null, null, null, null, f.toSeq, true)
          }
        Row.fromSeq(r.toSeq ++ meta)
      }
    }(Encoders.row(outSchema))
  }

  // =============================== image perceptual fingerprints (aHash64)

  /** Threshold a 64-dim feature column against its own mean into the
    * engine's PACKED SimHash fingerprint format (`simhash` 64-char bit
    * string + `__h0`/`__h1` long halves) — the average-hash (aHash) step,
    * shared by the image and audio fingerprint ops. Pure codegen'd column
    * algebra; the mean is materialized as its own column first (referencing
    * the aggregate inside the per-element lambda would duplicate the 64-way
    * sum into every one of the 64 comparisons). */
  private def aHashPacked(df: DataFrame, idCol: String): DataFrame = {
    val m = aggregate(col("features"), lit(0.0d), (a, x) => a + x) / size(col("features"))
    val bits = transform(col("features"),
      x => when(x > col("__m"), lit("1")).otherwise(lit("0")))
    df.select(col(idCol), col("features"), m.as("__m"))
      .select(col(idCol), concat_ws("", bits).as("simhash"))
      .select(col(idCol), col("simhash"),
        conv(substring(col("simhash"), 1, 32), 2, 10).cast(LongType).as("__h0"),
        conv(substring(col("simhash"), 33, 32), 2, 10).cast(LongType).as("__h1"))
  }

  /** Per-image 64-bit average-hash fingerprints in the engine's PACKED
    * SimHash format (`simhash` 64-char bit string + `__h0`/`__h1` halves),
    * so the existing Hamming machinery applies verbatim: near-dup pairs via
    * `Dedup.simHashNearDupPairsFromFingerprints` (banded blocking, never
    * all-pairs) and lookup via `simHashTopKFromFingerprints`. The only
    * imperative step is the codec ([[decodeMedia]]); thresholding the
    * thumbnail against its own mean is codegen'd column algebra.
    * Undecodable images are dropped (they have no perceptual identity).
    * The gate is `channels IS NOT NULL` — set ONLY by the real image-decode
    * arm — not `width`: stub-decoded rows (text/plain, video) also carry a
    * width and decode_ok=true, and their 8-dim features would otherwise
    * produce degenerate 8-bit "fingerprints" that all collide into the same
    * Hamming buckets and emit spurious pairs on a mixed-type media table. */
  def imageFingerprints(media: DataFrame, idCol: String = "doc_id",
      binCol: String = "media", typeCol: String = "media_type"): DataFrame =
    aHashPacked(
      decodeMedia(media, binCol, typeCol)
        .where(col("decode_ok") && col("features").isNotNull && col("channels").isNotNull),
      idCol)

  /** Per-clip 64-bit perceptual fingerprints (the video analog of
    * [[imageFingerprints]]): the first frame's 8×8 luma thumbnail from the
    * frame-SAMPLED decode — `maxFrames` caps the per-row JPEG decodes an
    * MJPEG clip costs, the knob [[decodeAviMjpeg]] exposes, so a
    * pathological long clip cannot make the fingerprint pass O(frames) —
    * thresholded into the PACKED SimHash format, so banded Hamming
    * near-dup mining (`Dedup.simHashNearDupPairsFromFingerprints`) and
    * top-k lookup apply to video verbatim. Rows are pre-filtered to
    * video-typed media (non-video payloads are never decoded here) and
    * undecodable clips are dropped (no perceptual identity). */
  def videoFingerprints(media: DataFrame, idCol: String = "doc_id",
      binCol: String = "media", typeCol: String = "media_type",
      maxFrames: Int = 16): DataFrame =
    aHashPacked(
      decodeMedia(media.where(col(typeCol).startsWith("video/")),
          binCol, typeCol, maxVideoFrames = maxFrames)
        .where(col("decode_ok") && col("features").isNotNull &&
          col("n_frames").isNotNull),
      idCol)

  /** 8x8 time-frequency energy grid for a PCM payload: 8 equal time
    * windows x 8 log-spaced frequency bands (Nyquist/256 ... Nyquist/2),
    * each band's magnitude via the Goertzel recurrence — O(8·samples),
    * no FFT dependency. Row-major [window][band], normalized per window.
    * The audio analog of the image thumbnail: the input to [[
    * audioFingerprints]] and usable directly with the distance kernels. */
  def audioSpectralGrid(bytes: Array[Byte]): Option[Array[Float]] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val in = openAudioStream(bytes).getOrElse(return None)
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        // same 8-bit-WAV PCM_UNSIGNED acceptance as decodeAudio
        val unsigned8 =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED &&
            bits == 8
        if (!unsigned8 &&
            (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
             (bits != 8 && bits != 16))) return None
        val ch = fmt.getChannels
        val bps = bits / 8
        val data = in.readAllBytes()
        val frames = data.length / (bps * ch)
        if (frames < 8) return None
        val fullScale = if (bits == 16) 32768.0 else 128.0
        // channel-mean mono samples normalized to [-1, 1]
        val mono = new Array[Double](frames)
        var f = 0; var off = 0
        while (f < frames) {
          var chSum = 0L; var c = 0
          while (c < ch) {
            val s =
              if (bits == 16) {
                if (fmt.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
                else (data(off + 1) << 8) | (data(off) & 0xff)
              } else if (unsigned8) (data(off) & 0xff) - 128
              else data(off).toInt
            chSum += s; off += bps; c += 1
          }
          mono(f) = chSum / (ch * fullScale)
          f += 1
        }
        // 8 bands at Nyquist/2^(8-k): k=0 -> Nyquist/256 ... k=7 -> Nyquist/2
        val sr = fmt.getSampleRate.toDouble
        val coeffs = Array.tabulate(8) { k =>
          val freq = (sr / 2.0) / (1 << (8 - k))
          2.0 * math.cos(2.0 * math.Pi * freq / sr)
        }
        val grid = new Array[Float](64)
        var w = 0
        while (w < 8) {
          val lo = (w.toLong * frames / 8).toInt
          val hi = ((w + 1).toLong * frames / 8).toInt
          var k = 0
          while (k < 8) {
            val coeff = coeffs(k)
            var s1 = 0.0; var s2 = 0.0
            var i = lo
            while (i < hi) {
              val s0 = mono(i) + coeff * s1 - s2
              s2 = s1; s1 = s0
              i += 1
            }
            val power = s1 * s1 + s2 * s2 - coeff * s1 * s2
            grid(w * 8 + k) = (math.sqrt(math.max(0.0, power)) / (hi - lo)).toFloat
            k += 1
          }
          w += 1
        }
        Some(grid)
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Per-clip 64-bit spectral fingerprints (the audio analog of
    * [[imageFingerprints]]): the 8x8 Goertzel time-frequency grid,
    * thresholded against its own mean into the PACKED SimHash format, so
    * banded Hamming near-dup mining and top-k lookup apply to audio
    * verbatim. A re-encoded or lightly-noised copy of a clip lands within
    * a few bit flips; different material does not. Undecodable or
    * sub-8-frame payloads are dropped. */
  def audioFingerprints(media: DataFrame, idCol: String = "doc_id",
      binCol: String = "media"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("__fp_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val idIdx = media.schema.fieldIndex(idCol)
    val binIdx = media.schema.fieldIndex(binCol)
    val grids = media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = if (r.isNullAt(binIdx)) null else r.getAs[Array[Byte]](binIdx)
        audioSpectralGrid(bytes).map(g =>
          Row(r.getLong(idIdx), g.toSeq))
      }
    }(Encoders.row(outSchema))
    aHashPacked(grids.withColumnRenamed("__fp_id", idCol), idCol)
  }

  // ================================ deterministic media synthesis (fixture)

  /** Deterministic synthetic image table over a documents-like frame: one
    * REAL PNG per row (encoded through the JDK codec) whose dimensions and
    * solid fill color are exact integer functions of (`doc_id`,
    * `n_chars`) — `w = 1 + n_chars % 13`, `h = 1 + doc_id % 11`,
    * `gray = (doc_id*37 + n_chars) % 256`. The q83 oracle recomputes those
    * functions in SQL and checks them against what the DECODER read back,
    * making the encode→decode round-trip hash-verifiable. */
  def synthPngTable(docs: DataFrame): DataFrame = {
    // spread the codec work: the upstream table is often a single parquet
    // file (1 input split), which would serialize every encode+decode on
    // one core — shuffling the 16-byte (id, seed) rows is free next to
    // 32x codec parallelism. Real media tables arrive as many files and
    // decodeMedia itself stays narrow; this is synthesis-side only.
    // Range partitioning (its sampling pass touches only this 16-byte
    // projection) so an id-ordered consumer needs only a per-partition
    // sort after decode, never a second exchange whose sampling pass
    // would re-run the codecs (the q39 sort-first finding).
    val in = docs.select(col("doc_id").cast(LongType), col("n_chars").cast(LongType))
      .repartitionByRange(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
    val outSchema = mediaSchema
    in.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0); val nc = r.getLong(1)
        val w = (1 + nc % 13).toInt
        val h = (1 + id % 11).toInt
        val c = ((id * 37 + nc) % 256).toInt
        Row(id, encodePng(w, h, (c << 16) | (c << 8) | c), "image/png")
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic synthetic audio table: one REAL 8 kHz mono WAV per row,
    * a constant-amplitude tone with `frames = 50 + n_chars % 101` samples
    * at amplitude `(doc_id % 1000) * 16` — both exact integer functions the
    * q84 oracle recomputes in SQL against the decoded frame count,
    * duration, and RMS. */
  def synthWavTable(docs: DataFrame): DataFrame = {
    // same single-input-split spread (and range keying) as synthPngTable
    val in = docs.select(col("doc_id").cast(LongType), col("n_chars").cast(LongType))
      .repartitionByRange(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
    val outSchema = mediaSchema
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0); val nc = r.getLong(1)
        val n = (50 + nc % 101).toInt
        val amp = ((id % 1000) * 16).toShort
        Row(id, encodeWavPcm16(Array.fill(n)(amp), 8000), "audio/wav")
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic synthetic video table: one REAL Y4M clip per row
    * (C420, constant luma per frame) with `frames = 1 + doc_id % 5`,
    * `width = 2*(1 + n_chars % 7)`, `height = 2*(1 + doc_id % 5)`, and
    * per-frame luma `(doc_id*31 + f*7) % 256` at 25 fps — all exact
    * integer functions the q85 oracle recomputes in SQL against the
    * decoded dimensions, frame count, duration, and mean luma. */
  def synthY4mTable(docs: DataFrame): DataFrame = {
    // same single-input-split spread (and range keying) as synthPngTable
    val in = docs.select(col("doc_id").cast(LongType), col("n_chars").cast(LongType))
      .repartitionByRange(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
    val outSchema = mediaSchema
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0); val nc = r.getLong(1)
        val w = (2 * (1 + nc % 7)).toInt
        val h = (2 * (1 + id % 5)).toInt
        val frames = (1 + id % 5).toInt
        val lumas = Array.tabulate(frames)(f => ((id * 31 + f * 7) % 256).toInt)
        Row(id, encodeY4m(w, h, lumas), "video/y4m")
      }
    }(Encoders.row(outSchema))
  }

  // =================================================== frame ops (REAL)

  /** Split a binary payload into fixed-size frames and keep every Nth —
    * the video frame-sampling shape. Real byte slicing via codegen'd column
    * algebra (substr on binary), no UDF, no shuffle. */
  def frameSample(bin: Column, frameBytes: Int, everyN: Int): Column = {
    require(frameBytes > 0 && everyN > 0)
    val nFrames = ceil(length(bin).cast(DoubleType) / frameBytes).cast(IntegerType)
    val idxs = filter(
      sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => i % everyN === 0)
    when(length(bin) > 0,
      transform(idxs, i => bin.substr(i * frameBytes + 1, lit(frameBytes))))
      .otherwise(array().cast(ArrayType(BinaryType)))
  }

  /** Byte-level metadata (exact, oracle-friendly): payload size and content
    * hash straight off the binary column. */
  def withByteStats(df: DataFrame, binCol: String = "media"): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast(LongType))
      .withColumn("content_md5", md5(col(binCol)))
}
