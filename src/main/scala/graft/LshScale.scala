package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the embedding-LSH pair miner: times the fixed-geometry
  * form (q32's oracle-pinned 16 planes / 8-bit bands) against the
  * geometry-from-n [[graft.ops.Dedup.embeddingLshPairsAuto]] variant at
  * three scales — sf0.1 (2k rows), the sf1 replica (20k), and a 50-copy
  * in-memory replica (100k, embeddings only, built with ScaleGen's OWN
  * signed-permutation transform so all three points use the same fixture
  * math). 100k is where the fixed geometry's structural term bites: 2 bands
  * of 2^8 buckets put ~n^2/2^8 candidate pairs through the join while the
  * auto geometry (4 bands of 2^12 at this n) stays ~O(n·target).
  *
  * Beyond wall time, the probe MEASURES the mechanism (round 10 asserted
  * it): per-geometry candidate volume Σ c·(c−1)/2 over band-bucket sizes —
  * computed with one groupBy over [[graft.ops.Dedup.lshBandKeys]], no join
  * — and the bucket-size histogram (p50/p90/p99/max), which shows whether
  * the cost is uniform occupancy or bucket skew. On sign-projection LSH
  * the buckets are NOT uniform (correlated vectors pile into few sign
  * patterns), so the n²/2^r expectation understates the fixed geometry's
  * true candidate volume — the histogram is the evidence.
  *
  * maxDist = 0.5 keeps the probe in near-dup mining's realistic regime:
  * output stays ~linear in n on this distribution, which isolates
  * candidate volume. The probe also computes the EXACT pair count (brute
  * all-pairs, un-timed) where the n² scan is itself probe-able (n <= 20k)
  * and emits each variant's tail recall. Every emitted pair is
  * exact-verified — geometry moves recall only, never precision. The
  * near-identical regime the miner exists for gets its own measured
  * column at EVERY scale: 200 planted twins (seeded 1e-4 perturbations)
  * are injected per scale and `planted_recall` reports the fraction each
  * geometry emits — at 100k, where brute force stops being probe-able,
  * this is the probe's only recall signal.
  *
  * Hypervisor steal is sampled around ONLY the timed count (the warm pass
  * sits outside the window), so a burst dilutes nothing.
  *
  * Writes LSH_SCALE.json. Usage:
  * `runMain graft.LshScale <sfDirSmall> <sfDirLarge>` (defaults
  * /root/testdata/sf0.1 and scale_sf1). */
object LshScale {
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
    graft.functions.vector.registerAll(spark)

    // timed pair-mining run; tick snapshots wrap ONLY the measured count(),
    // not the warm pass (a burst landing in the warm half used to dilute
    // the reported steal%). The mined output is checkpointed INSIDE the
    // timed region (it is ~thousands of rows — the full mining work happens
    // exactly once) and returned, so the planted-recall probe below reads
    // it instead of re-running a multi-minute join.
    def run(df: DataFrame, variant: String, warm: Boolean)
        : (Double, Long, Double, DataFrame) = {
      val op = variant match {
        case "fixed" => graft.ops.Dedup.embeddingLshPairs(
          df, "vec_id", "embedding", maxDist = 0.5)
        case "auto" => graft.ops.Dedup.embeddingLshPairsAuto(
          df, "vec_id", "embedding", maxDist = 0.5)
      }
      // warm once (JIT + codegen) at the small scales, then time the
      // measured run; at the big scale the code paths are already JITted
      // and a warm pass would double a multi-minute join for nothing
      if (warm) op.write.format("noop").mode("overwrite").save()
      val k0 = ProcStat.stealTotalTicks()
      val t0 = System.nanoTime()
      val out = op.localCheckpoint()
      val pairs = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val steal = ProcStat.stealPct(k0, ProcStat.stealTotalTicks()).getOrElse(-1.0)
      (sec, pairs, steal, out)
    }

    // 200 planted near-identical twins per scale (seeded 1e-4 Gaussian
    // perturbation of evenly-sampled base rows, twin ids offset into a
    // disjoint 9e11 key space): the recall regime with SIGNAL at every
    // scale. The dist<=0.5 tail recall (0.00-0.09 for BOTH geometries) is
    // the documented marginal-boundary sampling regime; planted recall is
    // the near-dup regime the miner exists for, and at 100k it is the
    // probe's only recall column (brute-force ground truth stops being
    // probe-able past 20k).
    def withPlanted(df: DataFrame): (DataFrame, Set[(Long, Long)]) = {
      // stride derived from the ACTUAL row count so every scale plants the
      // full 200 (a fixed every-25th-of-5000 stride planted only 80 at the
      // 2k-row scale while the provenance claimed 200)
      val nRows = df.where(col("embedding").isNotNull).count()
      val sampleN = math.min(nRows, 5000L).toInt
      val stride = math.max(1, sampleN / 200)
      val bases = df.where(col("embedding").isNotNull)
        .orderBy(col("vec_id")).limit(sampleN)
        .collect().grouped(stride).map(_.head).take(200).toSeq
      val twins = bases.map { r =>
        val id = r.getLong(0)
        val v = r.getSeq[Float](1).toArray
        val rnd = new java.util.Random(id * 2654435761L + 17)
        val tv = v.map(x => x + (rnd.nextGaussian() * 1e-4).toFloat)
        (900_000_000_000L + id, tv)
      }
      import spark.implicits._
      val twinDf = twins.toDF("vec_id", "embedding")
      val planted = bases.map(r => {
        val id = r.getLong(0); (id, 900_000_000_000L + id)
      }).toSet
      (df.select(col("vec_id"), col("embedding")) unionAll twinDf, planted)
    }
    def plantedRecall(out: DataFrame, planted: Set[(Long, Long)]): Double = {
      val found = out.select(col("a").cast("long"), col("b").cast("long"))
        .where(col("b") >= 900_000_000_000L || col("a") >= 900_000_000_000L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      planted.count(p => found.contains(p) || found.contains(p.swap)).toDouble /
        planted.size
    }

    // candidate volume + bucket histogram for a geometry — one groupBy over
    // the band keys, untimed: this measures the join VOLUME the timed run
    // pays for, and the skew that concentrates it
    def bucketStats(df: DataFrame, nPlanes: Int, rowsPerBand: Int)
        : (Long, Long, Long, Long, Long, Long) = {
      val counts = graft.ops.Dedup
        .lshBandKeys(df, "vec_id", "embedding", nPlanes, rowsPerBand)
        .groupBy(col("band_id"), col("band_val"))
        .agg(count(lit(1)).as("c"))
        .select(col("c")).collect().map(_.getLong(0)).sorted
      val candidates = counts.map(c => c * (c - 1) / 2).sum
      def pct(p: Double): Long =
        if (counts.isEmpty) 0L
        else counts(math.min(counts.length - 1, (p * (counts.length - 1)).round.toInt))
      (candidates, counts.length.toLong, pct(0.5), pct(0.9), pct(0.99),
        if (counts.isEmpty) 0L else counts.last)
    }

    // exact ground truth (brute all-pairs, one-off, NOT part of the timed
    // runs; skipped past ~20k rows where the n^2 scan stops being a probe)
    def exactPairs(df: DataFrame, n: Long): Long =
      if (n > 20500) -1L
      else {
        val v = df.where(col("embedding").isNotNull)
          .select(col("vec_id"), col("embedding"))
        val a = v.toDF("a", "va"); val b = v.toDF("b", "vb")
        a.hint("shuffle_replicate_nl").crossJoin(b).where(col("a") < col("b"))
          .where(expr("array_cosine_distance(va, vb)") <= 0.5)
          .count()
      }

    val base = spark.read.parquet(s"$small/embeddings.parquet")
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    val replica100k = (0 until 50).map { k =>
      base.withColumn("vec_id", col("vec_id") + lit(k * 10_000_000_000L))
        .withColumn("embedding",
          ScaleGen.signedPermutation(col("embedding"), dim, k))
    }.reduce(_ unionAll _).localCheckpoint()

    val scales = Seq(
      ("sf0.1", spark.read.parquet(s"$small/embeddings.parquet")),
      ("sf1", spark.read.parquet(s"$large/embeddings.parquet")),
      ("50x", replica100k))
    val out = new StringBuilder(
      "{\"_provenance\":\"graft.LshScale: fixed (16-plane/8-bit, q32's " +
        "oracle pin) vs geometry-from-n LSH at 2k/20k/100k rows (+200 " +
        "planted near-identical twins per scale, ids in the 9e11 space); " +
        "candidates = sum of c*(c-1)/2 over band-bucket sizes (one " +
        "groupBy over Dedup.lshBandKeys, untimed); bucket percentiles " +
        "over all band buckets; recall = emitted/exact over the dist<=0.5 " +
        "tail where brute force is probe-able (a marginal-boundary " +
        "sampling regime for ANY banded geometry); planted_recall = " +
        "fraction of the planted twins emitted (sampling stride derived " +
        "from the actual row count so every scale plants the full 200; " +
        "each scale's `planted` field records the actual count), the " +
        "near-dup regime with signal at every scale; steal sampled " +
        "around only the timed count\",")
    for ((tag, df0) <- scales) {
      val (df, planted) = withPlanted(df0)
      val n = df.count()
      val exact = exactPairs(df, n)
      val rAuto = graft.ops.Dedup.lshGeometry(n)
      for (v <- Seq("fixed", "auto")) {
        val (nPlanes, rpb) = if (v == "fixed") (16, 8) else (4 * rAuto, rAuto)
        val (cand, buckets, p50, p90, p99, cmax) = bucketStats(df, nPlanes, rpb)
        val (sec, pairs, steal, mined) = run(df, v, warm = n <= 20500)
        val pr = plantedRecall(mined, planted)
        val recall =
          if (exact < 0) "null"
          else if (exact == 0) "1.000"
          else f"${pairs.toDouble / exact}%.3f"
        out.append(
          f""""${tag}_$v":{"rows":$n,"geometry":"${nPlanes / rpb}x$rpb","sec":$sec%.3f,"pairs":$pairs,"exact_pairs":$exact,"recall":$recall,"planted":${planted.size},"planted_recall":$pr%.3f,"steal_pct":$steal%.2f,"candidates":$cand,"buckets":$buckets,"bucket_p50":$p50,"bucket_p90":$p90,"bucket_p99":$p99,"bucket_max":$cmax},""")
        println(f"[lsh-scale] $tag%-5s $v%-5s rows=$n geom=${nPlanes / rpb}x$rpb " +
          f"sec=$sec%.3f pairs=$pairs/$exact recall=$recall planted=$pr%.3f " +
          f"cand=$cand buckets=$buckets p50=$p50 p99=$p99 max=$cmax steal=$steal%.1f%%")
      }
    }
    val json = out.dropRight(1).append("}").toString
    java.nio.file.Files.write(java.nio.file.Paths.get("LSH_SCALE.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
