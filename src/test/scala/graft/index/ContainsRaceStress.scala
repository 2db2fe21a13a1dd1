package graft.index

/** Standalone stress probe (main, not a spec): does `HnswIndex.contains`
  * torn-read against racing `add`? `contains` walks the keyToId
  * mutable.HashMap while an inserter resizes it — the same
  * reader-racing-append class as the linearScan bound. Run directly:
  * prints misses of ACKNOWLEDGED keys and exceptions over N rounds. */
object ContainsRaceStress {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(20)
    var totalMisses = 0L
    var totalErrs = 0L
    var totalChecks = 0L
    (1 to rounds).foreach { r =>
      val idx = new HnswIndex(8, "l2sq", 8, 16, 16, 64)
      @volatile var maxKey = -1L
      @volatile var stop = false
      var misses = 0L
      var errs = 0L
      var checks = 0L
      val reader = new Thread(() => {
        val rnd = new java.util.Random(r)
        while (!stop) {
          val hi = maxKey
          if (hi >= 0) {
            val k = rnd.nextLong(hi + 1)
            try {
              if (!idx.contains(k)) misses += 1
              checks += 1
            } catch { case _: Throwable => errs += 1 }
          }
        }
      })
      reader.start()
      (0L until 200000L).foreach { k =>
        idx.add(k, Array.tabulate(8)(j => ((k >> (3 * j)) & 7).toFloat))
        maxKey = k
      }
      stop = true
      reader.join()
      totalMisses += misses; totalErrs += errs; totalChecks += checks
      println(s"round $r: checks=$checks misses=$misses errs=$errs")
    }
    println(s"TOTAL: checks=$totalChecks misses=$totalMisses errs=$totalErrs")
  }
}
