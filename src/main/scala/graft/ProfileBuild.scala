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
    if (args.headOption.contains("kernel")) {
      // microbench: double-accum (oracle-exact) vs float-accum (build-only)
      val dim = args.lift(1).map(_.toInt).getOrElse(64)
      val n = 4096
      val rnd = new scala.util.Random(7)
      val vs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat()))
      def floatL2(a: Array[Float], b: Array[Float]): Float = {
        var acc = 0f; var i = 0
        while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
        acc
      }
      def floatL2u4(a: Array[Float], b: Array[Float]): Float = {
        var a0 = 0f; var a1 = 0f; var a2 = 0f; var a3 = 0f
        var i = 0
        val lim = a.length - 3
        while (i < lim) {
          val d0 = a(i) - b(i); val d1 = a(i + 1) - b(i + 1)
          val d2 = a(i + 2) - b(i + 2); val d3 = a(i + 3) - b(i + 3)
          a0 += d0 * d0; a1 += d1 * d1; a2 += d2 * d2; a3 += d3 * d3
          i += 4
        }
        while (i < a.length) { val d = a(i) - b(i); a0 += d * d; i += 1 }
        a0 + a1 + a2 + a3
      }
      var sinkD = 0.0; var sinkF = 0f; var sinkU = 0f
      (1 to 3).foreach { rep =>
        var t0 = System.nanoTime()
        var i = 0
        while (i < n) {
          var j = 0
          while (j < n) { sinkD += graft.index.DistanceKernels.l2sq(vs(i), vs(j)); j += 1 }
          i += 1
        }
        val td = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        i = 0
        while (i < n) {
          var j = 0
          while (j < n) { sinkF += floatL2(vs(i), vs(j)); j += 1 }
          i += 1
        }
        val tf = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        i = 0
        while (i < n) {
          var j = 0
          while (j < n) { sinkU += floatL2u4(vs(i), vs(j)); j += 1 }
          i += 1
        }
        val tu = (System.nanoTime() - t0) / 1e9
        // the shipped build-kernel seam (SIMD when the module is present)
        t0 = System.nanoTime()
        i = 0
        while (i < n) {
          var j = 0
          while (j < n) { sinkD += graft.index.DistanceKernels.l2sqF(vs(i), vs(j)); j += 1 }
          i += 1
        }
        val ts = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        i = 0
        while (i < n) {
          var j = 0
          while (j < n) { sinkD += graft.index.DistanceKernels.cosineDistanceF(vs(i), vs(j)); j += 1 }
          i += 1
        }
        val tc = (System.nanoTime() - t0) / 1e9
        val evals = n.toLong * n
        println(f"[kernel] rep=$rep dim=$dim double=${evals / td / 1e6}%.0f " +
          f"float=${evals / tf / 1e6}%.0f floatU4=${evals / tu / 1e6}%.0f " +
          f"distB=${evals / ts / 1e6}%.0f cosB=${evals / tc / 1e6}%.0f Mevals/s " +
          f"(U4 ${td / tu}%.2fx, distB ${td / ts}%.2fx over double; " +
          s"simd=${graft.index.DistanceKernels.simdEnabled})")
      }
      println(s"[kernel] sinks $sinkD $sinkF $sinkU")
      return
    }
    // sweep args: [n] [dim] [m] [efC] [threadList] — defaults match the
    // original 2000-row dim-64 reference-knob sweep
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val m = args.lift(2).map(_.toInt).getOrElse(16)
    val efC = args.lift(3).map(_.toInt).getOrElse(128)
    val threadList = args.lift(4).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 8, 16, 32))
    val rnd = new scala.util.Random(42)
    val items = Array.tabulate(n)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat())))
    threadList.foreach { threads =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val idx = new HnswIndex(dim, "l2sq", m, 2 * m, efC, 64)
        idx.addAll(items.iterator, threads)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[build] n=$n dim=$dim m=$m efC=$efC threads=$threads rep=$rep ${dt}%.3f s " +
          f"(${n / dt}%.0f vec/s)")
        val ph = idx.buildPhaseNanos
        def s(i: Int): Double = ph.get(i) / 1e9
        println(f"[build]   phases: sweep=${s(0)}%.2f tail=${s(1)}%.2f (wall) | " +
          f"searchW=${s(2)}%.2f searchH=${s(3)}%.2f linkW=${s(4)}%.2f linkH=${s(5)}%.2f (thread-sec)")
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
