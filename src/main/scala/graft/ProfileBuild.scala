package graft

import graft.index.HnswIndex

/** Thread-scaling micro-benchmark of the HNSW construct phase (iteration
  * tool).
  *
  * Modes:
  *   - `ProfileBuild [n]` — synthetic thread-scaling sweep (original).
  *   - `ProfileBuild q28 <sfDir>` — decompose the build_q28 metric on the
  *     real table: Spark fetch, single-graph construct, and the near-dup
  *     query, each timed separately (the bench's build metric is their sum).
  */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("q28")) {
      args.lift(1) match {
        case Some(sfDir) => profileQ28(sfDir)
        case None => println("usage: ProfileBuild q28 <sfDir>")
      }
      return
    }
    if (args.headOption.contains("reclaim")) {
      // the reclaim fixture's shape: 1M collinear [i,i,i] float vectors —
      // the adversarial input for a parallel HNSW build
      val n = args.lift(1).map(_.toInt).getOrElse(1000000)
      val threads = args.lift(2).map(_.toInt).getOrElse(32)
      val items = (0 until n).iterator.map(i =>
        (i.toLong, Array(i.toFloat, i.toFloat, i.toFloat)))
      val t0 = System.nanoTime()
      val idx = new HnswIndex(3, "l2sq", 16, 32, 128, 64)
      idx.add(0L, Array(0f, 0f, 0f))
      val mon = new Thread(() => {
        val rt0 = Runtime.getRuntime
        while (true) {
          Thread.sleep(2000)
          println(f"[mon] nodes=${idx.totalNodes} " +
            f"heap=${(rt0.totalMemory - rt0.freeMemory) >> 20}M " +
            f"t=${(System.nanoTime() - t0) / 1e9}%.0f s")
        }
      })
      mon.setDaemon(true); mon.start()
      idx.addAll(items.drop(1), threads)
      val dt = (System.nanoTime() - t0) / 1e9
      val rt = Runtime.getRuntime
      println(f"[reclaim] n=$n threads=$threads ${dt}%.1f s (${n / dt}%.0f vec/s) " +
        f"heapUsed=${(rt.totalMemory - rt.freeMemory) >> 20}M")
      return
    }
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val dim = 64
    val rnd = new scala.util.Random(42)
    val items = Array.tabulate(n)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat())))
    Seq(1, 8, 16, 32).foreach { threads =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val idx = new HnswIndex(dim, "l2sq", 16, 32, 128, 64)
        idx.addAll(items.iterator, threads)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[build] n=$n threads=$threads rep=$rep ${dt}%.3f s " +
          f"(${n / dt}%.0f vec/s)")
        val ph = idx.buildPhaseNanos
        def s(i: Int): Double = ph.get(i) / 1e9
        println(f"[build]   phases (thread-sec): allocW=${s(0)}%.2f allocH=${s(1)}%.2f " +
          f"searchW=${s(2)}%.2f searchH=${s(3)}%.2f linkW=${s(4)}%.2f linkH=${s(5)}%.2f")
      }
    }
  }

  private def profileQ28(sfDir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9
    (1 to 3).foreach { rep =>
      graft.index.IndexCatalog.dropIndex("pb_q28_idx")
      val t0 = System.nanoTime()
      Graft.registerTable(spark, "pb_q28_emb",
        spark.read.parquet(s"$sfDir/embeddings.parquet"))
      val tReg = sec(t0)
      val t1 = System.nanoTime()
      graft.index.IndexCatalog.createIndex(spark, "pb_q28_idx", "pb_q28_emb",
        "embedding", Map("metric" -> "cosine", "ef_search" -> "100000"))
      val tBuild = sec(t1)
      val t2 = System.nanoTime()
      graft.ops.Dedup.embeddingNearDupViaIndex(spark, "pb_q28_emb", "vec_id",
        "pb_q28_idx", maxDist = 0.65)
        .write.format("noop").mode("overwrite").save()
      val tQuery = sec(t2)
      println(f"[q28] rep=$rep register=$tReg%.2f s build=$tBuild%.2f s " +
        f"query=$tQuery%.2f s total=${tReg + tBuild + tQuery}%.2f s")
    }
    spark.stop()
  }
}
