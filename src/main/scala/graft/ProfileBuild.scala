package graft

import graft.index.HnswIndex

/** Thread-scaling micro-benchmark of the HNSW construct phase (iteration
  * tool). */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
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
      }
    }
  }
}
