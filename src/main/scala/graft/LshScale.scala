package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale probe for the embedding-LSH pair miner: times the
  * fixed-geometry form (q32's oracle-pinned 16 planes / 8-bit bands) against
  * the geometry-from-n [[graft.ops.Dedup.embeddingLshPairsAuto]] variant at
  * three scales — sf0.1 (2k rows), the sf1 replica (20k), and a 50-copy
  * in-memory replica (100k, embeddings only, built with ScaleGen's OWN
  * signed-permutation transform so all three points use the same fixture
  * math). 100k is where the fixed geometry's structural term bites: 2 bands
  * of 2^8 buckets put ~n^2/2^8 = ~39M pairs through the candidate join
  * while the auto geometry (4 bands of 2^12 at this n) stays ~5M — the
  * wall-time gap IS the n^2/2^r term the auto variant removes.
  *
  * maxDist = 0.5 keeps the probe in near-dup mining's realistic regime:
  * output stays ~linear in n on this distribution (cross-copy cosine
  * similarity tops out at ~0.56, so dist <= 0.5 pairs are the marginal
  * tail just under the boundary), which isolates candidate volume — at the
  * loose q32 threshold (0.8, base pair density 5.5%) the verified output
  * itself is quadratic and both variants are output-bound, measuring the
  * answer size rather than the plan. At the marginal boundary (sim
  * ~0.5-0.56) the per-pair candidate probability of ANY banded
  * sign-projection geometry is a few percent, so which marginal pairs
  * surface is sampling; the probe therefore also computes the EXACT pair
  * count (brute all-pairs, un-timed, n <= 20k scales) and emits each
  * variant's recall so the differing pair counts are legible. Every
  * emitted pair is exact-verified — geometry moves recall only, never
  * precision; the near-identical regime both geometries catch fully is
  * pinned by EmbeddingLshSpec's planted clusters.
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

    def run(df: DataFrame, variant: String, warm: Boolean): (Double, Long) = {
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
      val t0 = System.nanoTime()
      val pairs = op.count()
      ((System.nanoTime() - t0) / 1e9, pairs)
    }

    // exact ground truth (brute all-pairs, one-off, NOT part of the timed
    // runs; skipped past 20k rows where the n^2 scan stops being a probe)
    def exactPairs(df: DataFrame, n: Long): Long =
      if (n > 20000) -1L
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
    val out = new StringBuilder("{")
    for ((tag, df) <- scales) {
      val n = df.count()
      val exact = exactPairs(df, n)
      for (v <- Seq("fixed", "auto")) {
        val s0 = ProcStat.stealTotalTicks()
        val (sec, pairs) = run(df, v, warm = n <= 20000)
        val steal = (for { (a, c0) <- s0; (b, c1) <- ProcStat.stealTotalTicks()
                           if c1 > c0 } yield 100.0 * (b - a) / (c1 - c0)).getOrElse(-1.0)
        val recall =
          if (exact < 0) "null"
          else if (exact == 0) "1.000"
          else f"${pairs.toDouble / exact}%.3f"
        out.append(f""""${tag}_$v":{"rows":$n,"sec":$sec%.3f,"pairs":$pairs,"exact_pairs":$exact,"recall":$recall,"steal_pct":$steal%.2f},""")
        println(f"[lsh-scale] $tag%-5s $v%-5s rows=$n sec=$sec%.3f pairs=$pairs/$exact recall=$recall steal=$steal%.1f%%")
      }
    }
    val json = out.dropRight(1).append("}").toString
    java.nio.file.Files.write(java.nio.file.Paths.get("LSH_SCALE.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
