package graft

import org.apache.spark.sql.SparkSession

/** Recall-vs-ef curve for the graph-mode HNSW index at a given data scale:
  * `runMain graft.ProfileRecall [sfDir] [nProbes]` builds q86's COSINE
  * graph index over the dir's embeddings table and prints, for a grid of
  * ef values, mean recall@10 against the index's own exhaustive path plus
  * per-probe p50 latency.
  *
  * Motivation (round 14): the per-run recall gate that passes at 1.000 on
  * sf0.1 (2k vectors) and sf1 (20k) read topk recall@10 = 0.8 at sf10
  * (200k) — fixed `ef_search` does not hold recall across scale decades.
  * This tool measures the curve so the ef-vs-n policy is chosen from data,
  * not folklore. Same hit test as SparkEntry.recallGate: a neighbor counts
  * if its distance is within the exact k-th distance (+ float slack), so
  * ties cannot fail spuriously. */
object ProfileRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nProbes = if (args.length > 1) args(1).toInt else 50
    val efC = if (args.length > 2) args(2) else "128"
    val m = if (args.length > 3) args(3) else "16"
    // 5th arg: shard count (0 = single driver-built graph). The sharded
    // curve answers a different question — how per-shard ef compounds
    // through the fan-out merge (union recall ~ avg per-shard recall).
    val nShards = if (args.length > 4) args(4).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Graft.registerTable(spark, "pr_emb",
      spark.read.parquet(s"$sfDir/embeddings.parquet"))
    val t0 = System.nanoTime()
    graft.index.IndexCatalog.createIndex(spark, "pr_idx", "pr_emb",
      "embedding",
      Map("metric" -> "cosine", "ef_construction" -> efC, "m" -> m),
      sharded = nShards > 0, numShards = nShards)
    println(f"[recall] build ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      f"(efC=$efC M=$m shards=$nShards)")
    val idx = graft.index.IndexCatalog.get("pr_idx").get.index
    val n = idx.size
    val exhaustiveEf = n + 1
    val k = 10

    // probe vectors: every (n/nProbes)-th row — spread across the id space
    // (copies in a ScaleGen fixture differ by a signed permutation, so
    // clustered-low ids would probe only copy 0). Columns selected by NAME
    // and ordered by vec_id: positional getSeq broke on any column reorder,
    // and an unordered limit() made re-runs measure different probe sets.
    val stride = math.max(1L, n.toLong / nProbes)
    val probes = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(org.apache.spark.sql.functions.col("vec_id") % stride === 0)
      .where(org.apache.spark.sql.functions.col("embedding").isNotNull)
      .select("vec_id", "embedding")
      .orderBy("vec_id")
      .limit(nProbes).collect()
      .map(_.getSeq[Float](1).toArray)
    val exactKth = probes.map(q => idx.search(q, k, exhaustiveEf).last._2)

    for (ef <- Seq(32, 64, 96, 128, 192, 256, 384, 512)) {
      val lat = new Array[Double](probes.length)
      var hits = 0
      for (i <- probes.indices) {
        val p0 = System.nanoTime()
        val res = idx.search(probes(i), k, ef)
        lat(i) = (System.nanoTime() - p0) / 1e6
        hits += res.count(_._2 <= exactKth(i) * (1 + 1e-9) + 1e-12)
      }
      val recall = hits.toDouble / (probes.length * k)
      val p50 = lat.sorted.apply(lat.length / 2)
      println(f"[recall] n=$n ef=$ef%4d recall@10=$recall%.4f p50=$p50%.2f ms")
    }
    spark.stop()
  }
}
