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

    // driver-side micro: the same decode over identical payloads, single
    // thread vs 32 — if 32-thread throughput is not ~32x the single-thread
    // rate, a lock (not per-row codec cost) owns the wall clock
    {
      val payloads = (0 until 20000).map { i =>
        graft.ops.Multimodal.encodeWavPcm16(
          Array.fill(50 + i % 101)(((i % 1000) * 16).toShort), 8000)
      }.toArray
      def decodeAll(slice: Array[Array[Byte]]): Int =
        slice.count(b => graft.ops.Multimodal.decodeAudio(b).isDefined)
      decodeAll(payloads.take(2000)) // JIT warm
      val t1 = System.nanoTime()
      val ok1 = decodeAll(payloads)
      val single = (System.nanoTime() - t1) / 1e9
      val threads = 32
      val chunks = payloads.grouped(payloads.length / threads + 1).toArray
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t2 = System.nanoTime()
      val futures = chunks.map(c => pool.submit(
        new java.util.concurrent.Callable[Int] { def call(): Int = decodeAll(c) }))
      // stack sampler: where are the pool threads actually spending time?
      val frameCounts = scala.collection.mutable.Map.empty[String, Int]
      val sampler = new Thread(() => {
        while (!futures.forall(_.isDone)) {
          Thread.sleep(50)
          import scala.jdk.CollectionConverters._
          for ((t, st) <- Thread.getAllStackTraces.asScala
               if t.getName.startsWith("pool"); if st.nonEmpty) {
            val top = st.take(3).mkString(" <- ")
            frameCounts(top) = frameCounts.getOrElse(top, 0) + 1
          }
        }
      })
      sampler.setDaemon(true); sampler.start()
      val okN = futures.map(_.get()).sum
      val multi = (System.nanoTime() - t2) / 1e9
      pool.shutdown()
      frameCounts.toSeq.sortBy(-_._2).take(5).foreach { case (f, c) =>
        println(s"[q84-profile] hot frame ($c samples): $f")
      }
      println(f"[q84-profile] micro decode 20k payloads: single-thread " +
        f"$single%.3f s (${single / 20000 * 1e6}%.2f us/row, ok=$ok1), " +
        f"32-thread $multi%.3f s (speedup ${single / multi}%.1f x, ok=$okN)")
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
