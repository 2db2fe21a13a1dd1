package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Opt-in (GRAFT_SLOW=1) MEDIA envelope: 200,000 real PNG images and
  * 200,000 real WAV clips synthesized ON EXECUTORS, decoded through the
  * actual JDK codecs, fingerprinted, and mined for near-dup pairs with the
  * banded Hamming machinery — the full multimodal dedup pipeline at a
  * scale where per-payload codec overheads and bucket skew would show.
  * Every 1000th payload is a perturbed copy of its predecessor (one pixel
  * nudged / low-amplitude noise added), so the run measures PLANTED-PAIR
  * RECALL, not just wall-clock: the miner must find the copies without
  * drowning in false pairs. Results land in MEDIA_SCALE.json with
  * hypervisor-steal context per measured region (this host steals in
  * bursts; a throughput number without its steal% is unusable).
  * Complements ANN_1M.json / RECLAIM_1M.json as the codec-path envelope.
  *
  * [[MediaScaleGen]] holds the executor-side payload generators: a
  * top-level object so the Spark closures capture nothing but static
  * functions (the spec instance holds a non-serializable scalatest
  * engine). */
object MediaScaleGen {
  def splitmix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // deterministic per-seed noise image (24x16): every image distinct,
  // aHash bits effectively random across the corpus, so banded buckets
  // stay thin; a planted copy differs by ONE nudged pixel
  def pngFor(id: Long): Array[Byte] = {
    val planted = id % 1000 == 1
    val seed = if (planted) id - 1 else id
    val w = 24; val h = 16
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (splitmix(seed ^ (x * 2654435761L + y * 40503L)) & 0xff).toInt
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    if (planted) {
      val v = math.min(255, (im.getRGB(3, 3) & 0xff) + 4)
      im.setRGB(3, 3, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  // per-seed tone clip: TWO distinct dominant bands per time window,
  // drawn from the six bands a 200-sample window can actually RESOLVE
  // (Goertzel over a 25 ms window cannot separate the 15.6/31.2 Hz
  // bands — a first cut with one 8-way band per 50-sample window left
  // only ~3 effective bits/window and 2.4M clip pairs within 3 bit
  // flips, caught by the pairs_total bound). C(6,2)=15 patterns per
  // window, 15^8 per clip; residual Hamming<=3 pairs are clips that
  // genuinely share 7 of 8 window-spectra — true near-neighbors under
  // the contract, counted in the record. A planted copy adds
  // deterministic low-amplitude noise.
  def wavFor(id: Long): Array[Byte] = {
    val planted = id % 1000 == 1
    val seed = if (planted) id - 1 else id
    val sr = 8000; val nSamp = 1600
    val samples = new Array[Short](nSamp)
    var w = 0
    while (w < 8) {
      val r = splitmix(seed * 8 + w)
      val b1 = 2 + ((r & 0xffff) % 6).toInt
      var b2 = 2 + (((r >> 16) & 0xffff) % 6).toInt
      if (b2 == b1) b2 = 2 + ((b1 - 2 + 1 + (((r >> 32) & 0x3) % 5).toInt) % 6)
      val f1 = (sr / 2.0) / (1 << (8 - b1))
      val f2 = (sr / 2.0) / (1 << (8 - b2))
      var i = w * nSamp / 8
      val hi = (w + 1) * nSamp / 8
      while (i < hi) {
        var v = (math.sin(2 * math.Pi * f1 * i / sr) +
          math.sin(2 * math.Pi * f2 * i / sr)) * 9000
        if (planted) v += (i * 2654435761L % 7) - 3
        samples(i) = v.toShort
        i += 1
      }
      w += 1
    }
    graft.ops.Multimodal.encodeWavPcm16(samples, sr)
  }
}

class MediaScaleSpec extends AnyFunSuite {

  private def stealTicks(): Option[(Long, Long)] = graft.ProcStat.stealTotalTicks()

  test("200k-payload media envelope: codec throughput + planted near-dup " +
      "recall through banded Hamming mining (writes MEDIA_SCALE.json)", SlowTest) {
    assume(sys.env.get("GRAFT_SLOW").exists(_.nonEmpty),
      "set GRAFT_SLOW=1 to run the 200k media envelope (~2+ min)")
    val spark = TestSpark.spark
    val n = 200000
    val mediaSchema = Multimodal.mediaSchema


    def synth(gen: Long => Array[Byte],
        mime: String): org.apache.spark.sql.DataFrame =
      spark.range(n).toDF("id").repartition(32)
        .mapPartitions(rows => rows.map { r =>
          val id = r.getLong(0)
          Row(id, gen(id), mime)
        })(org.apache.spark.sql.Encoders.row(mediaSchema))
        .localCheckpoint() // materialize: encode cost not billed to decode

    def timed[T](f: => T): (T, Double, Double) = {
      val k0 = stealTicks()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      val steal = (for { (s0, c0) <- k0; (s1, c1) <- stealTicks(); if c1 > c0 }
        yield 100.0 * (s1 - s0) / (c1 - c0)).getOrElse(-1.0)
      (r, dt, steal)
    }

    def minePlanted(fps: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val pairs = graft.ops.Dedup
        .simHashNearDupPairsFromFingerprints(fps, "doc_id", maxHamming = 3)
        .select(col("a"), col("b"))
      val total = pairs.count()
      val planted = pairs
        .where(col("b") === col("a") + 1 && col("b") % 1000 === 1).count()
      (total, planted, n / 1000L)
    }

    // ---- images ----
    val (imgMedia, imgSynthSec, imgSynthSteal) = timed {
      val df = synth(MediaScaleGen.pngFor _, "image/png"); df.count(); df
    }
    val (imgDecoded, imgDecodeSec, imgDecodeSteal) = timed {
      Multimodal.decodeMedia(imgMedia)
        .agg(sum(col("width")).as("sw"), sum(when(col("decode_ok"), 1).otherwise(0)).as("ok"))
        .head()
    }
    assert(imgDecoded.getAs[Long]("ok") == n, "every PNG decodes")
    val (imgFps, imgFpSec, imgFpSteal) = timed {
      val f = Multimodal.imageFingerprints(imgMedia).localCheckpoint(); f.count(); f
    }
    val ((imgPairs, imgPlantedFound, imgPlantedTotal), imgMineSec, imgMineSteal) =
      timed(minePlanted(imgFps))
    assert(imgPlantedFound >= (imgPlantedTotal * 9) / 10,
      s"image miner finds >=90% of planted copies ($imgPlantedFound/$imgPlantedTotal)")
    assert(imgPairs <= imgPlantedTotal * 3,
      s"image miner does not drown in false pairs ($imgPairs total)")

    // ---- audio ----
    val (wavMedia, wavSynthSec, wavSynthSteal) = timed {
      val df = synth(MediaScaleGen.wavFor _, "audio/wav"); df.count(); df
    }
    val (wavDecoded, wavDecodeSec, wavDecodeSteal) = timed {
      Multimodal.decodeMedia(wavMedia)
        .agg(sum(col("n_frames")).as("sf"), sum(when(col("decode_ok"), 1).otherwise(0)).as("ok"))
        .head()
    }
    assert(wavDecoded.getAs[Long]("ok") == n, "every WAV decodes")
    val (wavFps, wavFpSec, wavFpSteal) = timed {
      val f = Multimodal.audioFingerprints(wavMedia).localCheckpoint(); f.count(); f
    }
    val ((wavPairs, wavPlantedFound, wavPlantedTotal), wavMineSec, wavMineSteal) =
      timed(minePlanted(wavFps))
    assert(wavPlantedFound >= (wavPlantedTotal * 9) / 10,
      s"audio miner finds >=90% of planted copies ($wavPlantedFound/$wavPlantedTotal)")
    // bound guards QUADRATIC BLOW-UP, not semantic falseness: non-planted
    // Hamming<=3 pairs are clips genuinely sharing 7 of 8 window-spectra
    assert(wavPairs <= n / 50,
      s"audio miner output stays linear-bounded ($wavPairs total)")

    def r1(v: Double): String = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    def r0(v: Double): String = "%.0f".formatLocal(java.util.Locale.ROOT, v)
    val json =
      s"""{
         |  "_provenance": "written by MediaScaleSpec (GRAFT_SLOW=1): 200,000 real PNG images (24x16, per-seed noise) and 200,000 real WAV clips (1600 samples, two distinct resolvable-band tones per 200-sample window) synthesized on executors, decoded through the JDK codecs via decodeMedia, aHash-fingerprinted, and mined for near-dup pairs with 4-band Hamming blocking. Every 1000th payload is a perturbed copy of its predecessor; planted-pair recall is asserted >=90%; image pairs are chance-collision-free (random 64-bit hashes), audio non-planted pairs are clips genuinely sharing 7 of 8 window-spectra (true Hamming-near neighbors), and the output is asserted linear-bounded. steal = hypervisor-steal CPU% over the region (this host steals in bursts; throughput without steal context is unusable).",
         |  "n_payloads": $n,
         |  "image": {
         |    "synth_sec": ${r1(imgSynthSec)}, "synth_steal_pct": ${r1(imgSynthSteal)},
         |    "decode_sec": ${r1(imgDecodeSec)}, "decode_per_sec": ${r0(n / imgDecodeSec)}, "decode_steal_pct": ${r1(imgDecodeSteal)},
         |    "fingerprint_sec": ${r1(imgFpSec)}, "fingerprint_steal_pct": ${r1(imgFpSteal)},
         |    "mine_sec": ${r1(imgMineSec)}, "mine_steal_pct": ${r1(imgMineSteal)},
         |    "pairs_total": $imgPairs, "planted_found": $imgPlantedFound, "planted_total": $imgPlantedTotal
         |  },
         |  "audio": {
         |    "synth_sec": ${r1(wavSynthSec)}, "synth_steal_pct": ${r1(wavSynthSteal)},
         |    "decode_sec": ${r1(wavDecodeSec)}, "decode_per_sec": ${r0(n / wavDecodeSec)}, "decode_steal_pct": ${r1(wavDecodeSteal)},
         |    "fingerprint_sec": ${r1(wavFpSec)}, "fingerprint_steal_pct": ${r1(wavFpSteal)},
         |    "mine_sec": ${r1(wavMineSec)}, "mine_steal_pct": ${r1(wavMineSteal)},
         |    "pairs_total": $wavPairs, "planted_found": $wavPlantedFound, "planted_total": $wavPlantedTotal
         |  }
         |}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get("MEDIA_SCALE.json"),
      (json + "\n").getBytes("UTF-8"))
    info(json)
  }
}
