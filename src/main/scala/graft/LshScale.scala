package graft

import org.apache.spark.sql.SparkSession

/** One-off scale probe for the embedding-LSH pair miner: times the
  * fixed-geometry form (q32's oracle-pinned 16 planes / 8-bit bands) against
  * the geometry-from-n [[graft.ops.Dedup.embeddingLshPairsAuto]] variant on
  * the same table at two scales, and counts the verified pairs each returns.
  * Writes LSH_SCALE.json — the measured evidence that the fixed geometry's
  * candidate volume is the quadratic term (n^2 / 2^bits once n >> 2^bits)
  * and the auto geometry removes it without losing verified pairs.
  *
  * Usage: `runMain graft.LshScale <sfDirSmall> <sfDirLarge>` (defaults
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

    def run(dir: String, variant: String): (Double, Long, Long) = {
      val df = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = df.count()
      val op = variant match {
        case "fixed" => graft.ops.Dedup.embeddingLshPairs(
          df, "vec_id", "embedding", maxDist = 0.8)
        case "auto" => graft.ops.Dedup.embeddingLshPairsAuto(
          df, "vec_id", "embedding", maxDist = 0.8)
      }
      // warm once (JIT + codegen), then time the measured run
      op.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      val pairs = op.count()
      ((System.nanoTime() - t0) / 1e9, pairs, n)
    }

    val out = new StringBuilder("{")
    for ((dir, tag) <- Seq((small, "sf0.1"), (large, "sf1"));
         v <- Seq("fixed", "auto")) {
      val s0 = ProcStat.stealTotalTicks()
      val (sec, pairs, n) = run(dir, v)
      val steal = (for { (a, c0) <- s0; (b, c1) <- ProcStat.stealTotalTicks()
                         if c1 > c0 } yield 100.0 * (b - a) / (c1 - c0)).getOrElse(-1.0)
      out.append(f""""${tag}_$v":{"rows":$n,"sec":$sec%.3f,"pairs":$pairs,"steal_pct":$steal%.2f},""")
      println(f"[lsh-scale] $tag $v%-5s rows=$n sec=$sec%.3f pairs=$pairs steal=$steal%.1f%%")
    }
    val json = out.dropRight(1).append("}").toString
    java.nio.file.Files.write(java.nio.file.Paths.get("LSH_SCALE.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
