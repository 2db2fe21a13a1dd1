package graft.index

import java.io._
import scala.collection.mutable

/** Per-level graph statistics, mirroring the reference's
  * `pragma_hnsw_index_info` output row
  * (reference src/hnsw/hnsw_index_pragmas.cpp:54-58). */
case class LevelStats(nodes: Long, edges: Long, maxEdges: Long, allocatedBytes: Long)

/** A clean-room JVM implementation of the HNSW approximate-nearest-neighbor
  * graph (Malkov & Yashunin 2016, "Efficient and robust approximate nearest
  * neighbor search using Hierarchical Navigable Small World graphs").
  *
  * API mirrors the reference index surface (duckdb_vss `HNSWIndex`,
  * reference src/hnsw/hnsw_index.cpp:121-578): construct, search (ef_search),
  * insert, tombstone delete, compact, save/load, stats. Parameter names and
  * defaults follow the reference: M=16, M0=2·M, ef_construction=128,
  * ef_search=64 (reference src/include/usearch/index.hpp:1097-1125).
  *
  * Keys are engine rowids (Long). Level assignment uses a seeded RNG so a
  * build over the same insertion order is deterministic. The structure is
  * single-writer / multi-reader: searches are safe concurrently with each
  * other but not with add/remove (callers — the engine's IndexCatalog —
  * serialize mutation, as the reference does with its rwlock,
  * reference src/hnsw/hnsw_index.cpp:302,440).
  */
class HnswIndex(
    val dim: Int,
    val metric: String,
    val m: Int = 16,
    val m0: Int = 32,
    val efConstruction: Int = 128,
    var efSearch: Int = 64,
    seed: Long = 42L
) extends Serializable {
  require(dim > 0, "dimension must be positive")
  require(m >= 2 && m0 >= 2, "M and M0 must be at least 2")
  require(efConstruction >= 1 && efSearch >= 1, "ef parameters must be at least 1")
  require(DistanceKernels.forMetric(metric) != null)

  @transient private lazy val dist: (Array[Float], Array[Float]) => Double =
    DistanceKernels.forMetric(metric)

  private val mL: Double = 1.0 / math.log(m.toDouble)
  private val rng = new java.util.Random(seed)

  // node storage: internal id -> payload
  private val keys = mutable.ArrayBuffer.empty[Long]
  private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
  private val nodeLevel = mutable.ArrayBuffer.empty[Int]
  // neighbors(id)(level) = ArrayBuffer[internal id]
  private val neighbors = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private val keyToId = mutable.HashMap.empty[Long, Int]
  private val tombstones = mutable.BitSet.empty
  private var entryPoint: Int = -1
  private var topLevel: Int = -1

  def size: Int = keys.size - tombstones.size
  def totalNodes: Int = keys.size
  def deletedCount: Int = tombstones.size
  def contains(key: Long): Boolean =
    keyToId.get(key).exists(id => !tombstones.contains(id))

  private def maxNeighbors(level: Int): Int = if (level == 0) m0 else m

  // Guards concurrent build (addAll): searches run under the read lock,
  // graph mutation under the write lock — the JVM analog of the reference's
  // per-thread concurrent construct tasks + rwlock
  // (reference src/hnsw/hnsw_index_physical_create.cpp:231-306,
  // src/hnsw/hnsw_index.cpp:391-449).
  @transient private lazy val rwLock =
    new java.util.concurrent.locks.ReentrantReadWriteLock()

  /** Insert one vector. NULL-skipping is the caller's job (the reference
    * skips NULL vectors on insert, reference src/hnsw/hnsw_index.cpp:437-439). */
  def add(key: Long, vec: Array[Float]): Unit = {
    require(vec.length == dim, s"vector dimension ${vec.length} != index dimension $dim")
    if (keyToId.contains(key)) {
      throw new IllegalArgumentException(s"duplicate key $key")
    }
    val id = keys.size
    val level = math.min(math.floor(-math.log(math.max(rng.nextDouble(), 1e-12)) * mL).toInt, 63)
    keys += key
    vecs += vec
    nodeLevel += level
    neighbors += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
    keyToId(key) = id

    if (entryPoint < 0) {
      entryPoint = id
      topLevel = level
      return
    }

    var ep = entryPoint
    var epDist = dist(vec, vecs(ep))
    // greedy descent through levels above the node's level
    var l = topLevel
    while (l > level) {
      var changed = true
      while (changed) {
        changed = false
        val nbrs = neighborsAt(ep, l)
        var i = 0
        while (i < nbrs.length) {
          val cand = nbrs(i)
          val d = dist(vec, vecs(cand))
          if (d < epDist) { ep = cand; epDist = d; changed = true }
          i += 1
        }
      }
      l -= 1
    }

    // connect on each level from min(level, topLevel) down to 0
    var lev = math.min(level, topLevel)
    var eps = List((epDist, ep))
    while (lev >= 0) {
      val found = searchLayer(vec, eps, efConstruction, lev, includeTombstones = true)
      val selected = selectNeighborsHeuristic(vec, found, m)
      val nbrs = neighbors(id)(lev)
      selected.foreach { case (_, nid) => nbrs += nid }
      // bidirectional links + shrink
      selected.foreach { case (_, nid) =>
        val theirNbrs = neighbors(nid)(lev)
        theirNbrs += id
        val cap = maxNeighbors(lev)
        if (theirNbrs.length > cap) {
          val pruned = selectNeighborsHeuristic(
            vecs(nid), theirNbrs.map(x => (dist(vecs(nid), vecs(x)), x)).toList, cap)
          theirNbrs.clear()
          pruned.foreach { case (_, x) => theirNbrs += x }
        }
      }
      eps = found
      lev -= 1
    }

    if (level > topLevel) {
      topLevel = level
      entryPoint = id
    }
  }

  /** Parallel bulk build: N threads pull from `items` and insert
    * concurrently. Each insert splits into three phases — node allocation
    * (write lock), beam search for neighbors (read lock, the dominant cost,
    * runs in parallel), and graph linking (write lock). A node allocated but
    * not yet linked is unreachable, so concurrent searches never see a
    * half-inserted node. Graph shape depends on thread interleaving (level
    * draws and insertion order), but search contracts are unaffected:
    * exact-search (ef >= N) results are identical, ANN recall statistically
    * equivalent. Mirrors the reference's one-construct-task-per-scheduler-
    * thread bulk build (reference src/hnsw/hnsw_index_physical_create.cpp:283-306). */
  def addAll(items: Iterator[(Long, Array[Float])], numThreads: Int): Unit = {
    if (numThreads <= 1) { items.foreach { case (k, v) => add(k, v) }; return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(numThreads)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val lockObj = new Object
    def nextItem(): (Long, Array[Float]) = lockObj.synchronized {
      if (items.hasNext) items.next() else null
    }
    (0 until numThreads).foreach { _ =>
      pool.execute(new Runnable {
        def run(): Unit = try {
          var item = nextItem()
          while (item != null && err.get() == null) {
            addConcurrent(item._1, item._2)
            item = nextItem()
          }
        } catch { case t: Throwable => err.compareAndSet(null, t) }
      })
    }
    pool.shutdown()
    // wait for ACTUAL termination — returning with builder threads alive
    // would let unlocked readers race in-flight inserts
    while (!pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS)) ()
    if (err.get() != null) throw err.get()
  }

  private def addConcurrent(key: Long, vec: Array[Float]): Unit = {
    require(vec.length == dim, s"vector dimension ${vec.length} != index dimension $dim")
    val w = rwLock.writeLock(); val r = rwLock.readLock()

    // phase 1: allocate the node (invisible until linked)
    var id = -1
    var level = 0
    w.lock()
    try {
      if (keyToId.contains(key)) {
        throw new IllegalArgumentException(s"duplicate key $key")
      }
      id = keys.size
      level = math.min(
        math.floor(-math.log(math.max(rng.nextDouble(), 1e-12)) * mL).toInt, 63)
      keys += key
      vecs += vec
      nodeLevel += level
      neighbors += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
      keyToId(key) = id
      if (entryPoint < 0) {
        entryPoint = id
        topLevel = level
        return
      }
    } finally w.unlock()

    // phase 2: beam-search candidate neighbors per level (parallel)
    val perLevel = mutable.ArrayBuffer.empty[(Int, List[(Double, Int)])]
    r.lock()
    try {
      var ep = entryPoint
      var epDist = dist(vec, vecs(ep))
      var l = topLevel
      while (l > level) {
        var changed = true
        while (changed) {
          changed = false
          val nbrs = neighborsAt(ep, l)
          var i = 0
          while (i < nbrs.length) {
            val cand = nbrs(i)
            val d = dist(vec, vecs(cand))
            if (d < epDist) { ep = cand; epDist = d; changed = true }
            i += 1
          }
        }
        l -= 1
      }
      var lev = math.min(level, topLevel)
      var eps = List((epDist, ep))
      while (lev >= 0) {
        val found = searchLayer(vec, eps, efConstruction, lev, includeTombstones = true)
        perLevel += ((lev, found))
        eps = found
        lev -= 1
      }
    } finally r.unlock()

    // phase 3: link (serial, but much cheaper than the search)
    w.lock()
    try {
      perLevel.foreach { case (lev, found0) =>
        val found = found0.filterNot(_._2 == id)
        val selected = selectNeighborsHeuristic(vec, found, m)
        val nbrs = neighbors(id)(lev)
        selected.foreach { case (_, nid) => if (!nbrs.contains(nid)) nbrs += nid }
        selected.foreach { case (_, nid) =>
          val theirNbrs = neighbors(nid)(lev)
          if (!theirNbrs.contains(id)) theirNbrs += id
          val cap = maxNeighbors(lev)
          if (theirNbrs.length > cap) {
            val pruned = selectNeighborsHeuristic(
              vecs(nid), theirNbrs.map(x => (dist(vecs(nid), vecs(x)), x)).toList, cap)
            theirNbrs.clear()
            pruned.foreach { case (_, x) => theirNbrs += x }
          }
        }
      }
      if (level > topLevel) {
        topLevel = level
        entryPoint = id
      }
    } finally w.unlock()
  }

  private def neighborsAt(id: Int, level: Int): Array[Int] = {
    val arr = neighbors(id)
    if (level < arr.length) arr(level).toArray else Array.emptyIntArray
  }

  /** Best-first beam search on one layer (Algorithm 2 of the paper). Returns
    * up to ef (distance, id) pairs, ascending by distance. */
  private def searchLayer(q: Array[Float], entryPoints: List[(Double, Int)], ef: Int,
      level: Int, includeTombstones: Boolean): List[(Double, Int)] = {
    val visited = mutable.BitSet.empty
    // candidates: min-heap by distance; results: max-heap by distance, capped at ef
    val candidates = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by[(Double, Int), Double](_._1).reverse)
    val results = mutable.PriorityQueue.empty[(Double, Int)](Ordering.by[(Double, Int), Double](_._1))
    entryPoints.foreach { case (d, id) =>
      if (!visited.contains(id)) {
        visited += id
        candidates.enqueue((d, id))
        results.enqueue((d, id))
      }
    }
    while (results.size > ef) results.dequeue()
    while (candidates.nonEmpty) {
      val (cd, c) = candidates.dequeue()
      if (results.size >= ef && cd > results.head._1) {
        candidates.clear()
      } else {
        val nbrs = neighborsAt(c, level)
        var i = 0
        while (i < nbrs.length) {
          val nid = nbrs(i)
          if (!visited.contains(nid)) {
            visited += nid
            val d = dist(q, vecs(nid))
            if (results.size < ef || d < results.head._1) {
              candidates.enqueue((d, nid))
              results.enqueue((d, nid))
              if (results.size > ef) results.dequeue()
            }
          }
          i += 1
        }
      }
    }
    results.toList.sortBy(_._1)
  }

  /** Neighbor selection with the paper's diversity heuristic (Algorithm 4):
    * keep a candidate only if it is closer to the query than to every
    * already-kept neighbor. */
  private def selectNeighborsHeuristic(q: Array[Float], candidates: List[(Double, Int)],
      k: Int): List[(Double, Int)] = {
    val sorted = candidates.sortBy(_._1)
    val kept = mutable.ArrayBuffer.empty[(Double, Int)]
    val it = sorted.iterator
    while (it.hasNext && kept.length < k) {
      val (d, id) = it.next()
      var diverse = true
      var i = 0
      while (diverse && i < kept.length) {
        if (dist(vecs(id), vecs(kept(i)._2)) < d) diverse = false
        i += 1
      }
      if (diverse) kept += ((d, id))
    }
    // backfill with closest discarded if under-full (paper's keepPruned variant)
    if (kept.length < k) {
      val have = kept.map(_._2).toSet
      sorted.iterator.filterNot(c => have.contains(c._2)).take(k - kept.length)
        .foreach(kept += _)
      kept.sortInPlaceBy(_._1)
    }
    kept.toList
  }

  /** Top-k ANN search. Tombstoned entries are filtered from results (search
    * visits them as routing nodes — same behavior as tombstoned deletes in
    * the reference, reference README.md:67). */
  def search(q: Array[Float], k: Int, ef: Int = -1): Array[(Long, Double)] = {
    require(q.length == dim, s"query dimension ${q.length} != index dimension $dim")
    if (entryPoint < 0) return Array.empty
    val effEf = math.max(if (ef > 0) ef else efSearch, k) + tombstones.size.min(64)
    // Exhaustive ef (>= node count) degenerates the beam search into an
    // O(n log n) priority-queue crawl; a linear scan with a bounded top-k
    // heap answers the same (exact) result in O(n log k). This is the path
    // every ef>=N oracle query takes.
    if (effEf >= keys.size) return linearScan(q, k)
    var ep = entryPoint
    var epDist = dist(q, vecs(ep))
    var l = topLevel
    while (l > 0) {
      var changed = true
      while (changed) {
        changed = false
        val nbrs = neighborsAt(ep, l)
        var i = 0
        while (i < nbrs.length) {
          val cand = nbrs(i)
          val d = dist(q, vecs(cand))
          if (d < epDist) { ep = cand; epDist = d; changed = true }
          i += 1
        }
      }
      l -= 1
    }
    val found = searchLayer(q, List((epDist, ep)), effEf, 0, includeTombstones = true)
    found.iterator
      .filterNot { case (_, id) => tombstones.contains(id) }
      .take(k)
      .map { case (d, id) => (keys(id), d) }
      .toArray
  }

  /** Exact brute-force top-k over all live nodes (bounded max-heap),
    * deterministic ties by (distance, key). */
  private def linearScan(q: Array[Float], k: Int): Array[(Long, Double)] = {
    implicit val worstFirst: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
    val heap = mutable.PriorityQueue.empty[(Double, Long)] // max-heap: worst on top
    var id = 0
    while (id < keys.size) {
      if (!tombstones.contains(id)) {
        val d = dist(q, vecs(id))
        val cand = (d, keys(id))
        if (heap.size < k) heap.enqueue(cand)
        else if (worstFirst.compare(cand, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(cand)
        }
      }
      id += 1
    }
    heap.toArray.sorted.map { case (d, key) => (key, d) }
  }

  /** Tombstone delete by key (reference src/hnsw/hnsw_index.cpp:466-482).
    * Returns true if the key was present. */
  def remove(key: Long): Boolean = keyToId.get(key) match {
    case Some(id) if !tombstones.contains(id) =>
      tombstones += id
      keyToId.remove(key)
      true
    case _ => false
  }

  /** Visit every live (key, vector) pair — tombstoned nodes skipped. */
  def forEachLive(f: (Long, Array[Float]) => Unit): Unit = {
    var id = 0
    while (id < keys.size) {
      if (!tombstones.contains(id)) f(keys(id), vecs(id))
      id += 1
    }
  }

  /** Rebuild without tombstoned entries (the reference's
    * `PRAGMA hnsw_compact_index`, reference src/hnsw/hnsw_index_pragmas.cpp:154-197).
    * The rebuild reuses the parallel construct phase (numThreads > 1). */
  def compact(numThreads: Int = 1): HnswIndex = {
    val fresh = new HnswIndex(dim, metric, m, m0, efConstruction, efSearch, seed)
    val live = mutable.ArrayBuffer.empty[(Long, Array[Float])]
    forEachLive((key, vec) => live += ((key, vec)))
    fresh.addAll(live.iterator, numThreads)
    fresh
  }

  def levels: Int = topLevel + 1

  def levelStats: Seq[LevelStats] = {
    (0 to topLevel).map { l =>
      var nodes = 0L; var edges = 0L
      var id = 0
      while (id < keys.size) {
        if (nodeLevel(id) >= l) {
          nodes += 1
          edges += neighbors(id)(l).length
        }
        id += 1
      }
      val bytes = nodes * (8L + 4L * dim + 4L * maxNeighbors(l))
      LevelStats(nodes, edges, nodes * maxNeighbors(l), bytes)
    }
  }

  def approxMemoryBytes: Long = levelStats.map(_.allocatedBytes).sum

  def capacity: Long = {
    // next power of two >= size, matching the reference's growth policy
    // (reference src/hnsw/hnsw_index.cpp:422-431)
    var c = 1L
    while (c < keys.size.max(1)) c <<= 1
    c
  }

  // --- persistence (reference PersistToDisk, src/hnsw/hnsw_index.cpp:510-532;
  // here: one artifact file per index instead of block-manager blocks) ---

  def save(path: String): Unit = {
    // Hadoop FS (not java.nio): artifacts live wherever graft.indexes.dir
    // points — file:, hdfs://, s3a:// — and parents are created by create()
    val out = new DataOutputStream(new BufferedOutputStream(ArtifactIO.create(path)))
    try {
      out.writeInt(0x484E5357) // "HNSW"
      out.writeInt(1) // version
      out.writeInt(dim); out.writeUTF(metric)
      out.writeInt(m); out.writeInt(m0); out.writeInt(efConstruction); out.writeInt(efSearch)
      out.writeInt(keys.size); out.writeInt(entryPoint); out.writeInt(topLevel)
      var id = 0
      while (id < keys.size) {
        out.writeLong(keys(id))
        out.writeInt(nodeLevel(id))
        val v = vecs(id); var i = 0
        while (i < dim) { out.writeFloat(v(i)); i += 1 }
        val nb = neighbors(id)
        var l = 0
        while (l < nb.length) {
          out.writeInt(nb(l).length)
          nb(l).foreach(out.writeInt)
          l += 1
        }
        id += 1
      }
      out.writeInt(tombstones.size)
      tombstones.foreach(out.writeInt)
    } finally out.close()
  }
}

object HnswIndex {
  def load(path: String): HnswIndex = {
    val in = new DataInputStream(new BufferedInputStream(ArtifactIO.open(path)))
    try {
      require(in.readInt() == 0x484E5357, s"$path is not an HNSW index artifact")
      require(in.readInt() == 1, "unsupported index version")
      val dim = in.readInt(); val metric = in.readUTF()
      val m = in.readInt(); val m0 = in.readInt()
      val efc = in.readInt(); val efs = in.readInt()
      val idx = new HnswIndex(dim, metric, m, m0, efc, efs)
      val n = in.readInt(); val ep = in.readInt(); val tl = in.readInt()
      var id = 0
      while (id < n) {
        val key = in.readLong()
        val level = in.readInt()
        val v = new Array[Float](dim)
        var i = 0
        while (i < dim) { v(i) = in.readFloat(); i += 1 }
        idx.keys += key
        idx.vecs += v
        idx.nodeLevel += level
        val nb = Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
        var l = 0
        while (l <= level) {
          val cnt = in.readInt()
          var j = 0
          while (j < cnt) { nb(l) += in.readInt(); j += 1 }
          l += 1
        }
        idx.neighbors += nb
        idx.keyToId(key) = id
        id += 1
      }
      idx.entryPoint = ep
      idx.topLevel = tl
      val nTomb = in.readInt()
      var t = 0
      while (t < nTomb) {
        val tid = in.readInt()
        idx.tombstones += tid
        // A key deleted then re-added before save stores two nodes with the
        // same key (one tombstoned). Only drop the mapping when it still
        // points at the tombstoned node — otherwise the live newer node would
        // lose its mapping and the key could be added a third time.
        if (idx.keyToId.get(idx.keys(tid)).contains(tid)) {
          idx.keyToId.remove(idx.keys(tid))
        }
        t += 1
      }
      idx
    } finally in.close()
  }
}
