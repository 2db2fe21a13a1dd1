package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off q84 scaling profile: separates the audio round-trip's two arms —
  * WAV ENCODE (synthWavTable: per-row PCM synth + RIFF write through the
  * cached SPI writer) and ENCODE+DECODE (decodeMedia on top: SPI reader,
  * sample loop, envelope) — at sf0.1 and the sf1 replica, so the sf1
  * record's q84 ratio (13.4 s, 7.2x for 10x rows in round 10) decomposes
  * into per-arm, per-row costs. Per-row cost flat across the decade =
  * volume-linear (codec work dominates, fixed overhead amortized — the
  * honest reading); a growing per-row cost = a real super-linear term
  * worth hunting. Two warm runs per arm, min kept, steal sampled around
  * each timed run.
  *
  * Usage: `runMain graft.ProfileAudio [sfDirSmall] [sfDirLarge]`
  * (defaults /root/testdata/sf0.1 and scale_sf1). */
object ProfileAudio {
  def main(args: Array[String]): Unit = {
    val small = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val large = if (args.length > 1) args(1) else "scale_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label: String, rows: Long)(df: => org.apache.spark.sql.DataFrame): Double = {
      var best = Double.MaxValue
      var bestSteal = -1.0
      (1 to 3).foreach { i => // run 1 = warm (JIT), runs 2-3 timed
        val k0 = ProcStat.stealTotalTicks()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val steal = ProcStat.stealPct(k0, ProcStat.stealTotalTicks()).getOrElse(-1.0)
        if (i > 1 && dt < best) { best = dt; bestSteal = steal }
      }
      println(f"[q84-profile] $label%-28s rows=$rows%8d  ${best}%7.3f s  " +
        f"${best / rows * 1e6}%8.2f us/row  steal=${bestSteal}%.1f%%")
      best
    }

    for ((tag, dir) <- Seq(("sf0.1", small), ("sf1", large))) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val enc = timed(s"$tag encode (synthWavTable)", n) {
        graft.ops.Multimodal.synthWavTable(docs)
      }
      val both = timed(s"$tag encode+decode (q84 body)", n) {
        graft.ops.Multimodal.decodeMedia(graft.ops.Multimodal.synthWavTable(docs))
          .select(col("doc_id"), col("sample_rate"), col("n_frames"),
            col("duration_sec"), col("rms"))
      }
      println(f"[q84-profile] $tag decode-only share: ${both - enc}%7.3f s " +
        f"(${(both - enc) / n * 1e6}%8.2f us/row)")
    }
    spark.stop()
  }
}
