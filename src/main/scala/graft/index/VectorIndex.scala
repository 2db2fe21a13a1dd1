package graft.index

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.collection.concurrent.TrieMap

/** Common surface of the engine's ANN indexes — the reference's
  * `HNSWIndex` API (reference src/hnsw/hnsw_index.hpp:24-119) expressed
  * engine-side: search, DML (insert / tombstone delete), compact, persist,
  * introspection. */
trait VectorIndex extends Serializable {
  def dim: Int
  def metric: String
  def size: Int
  def deletedCount: Int
  def contains(key: Long): Boolean
  def search(q: Array[Float], k: Int, ef: Int = -1): Array[(Long, Double)]
  def insert(key: Long, vec: Array[Float]): Unit
  def delete(key: Long): Boolean
  def compacted(): VectorIndex
  def save(path: String): Unit
  def levels: Int
  def levelStats: Seq[LevelStats]
  def approxMemoryBytes: Long
  def capacity: Long
}

/** Single-graph index (driver-resident, broadcast for query) — the faithful
  * analog of the reference's single-node RAM-resident index
  * (reference README.md:74). */
class SingleHnswIndex(val underlying: HnswIndex) extends VectorIndex {
  def dim: Int = underlying.dim
  def metric: String = underlying.metric
  def size: Int = underlying.size
  def deletedCount: Int = underlying.deletedCount
  def contains(key: Long): Boolean = underlying.contains(key)
  def search(q: Array[Float], k: Int, ef: Int = -1): Array[(Long, Double)] =
    underlying.search(q, k, ef)
  def insert(key: Long, vec: Array[Float]): Unit = underlying.add(key, vec)
  def delete(key: Long): Boolean = underlying.remove(key)
  def compacted(): VectorIndex = new SingleHnswIndex(
    underlying.compact(math.min(16, Runtime.getRuntime.availableProcessors())))
  def save(path: String): Unit = underlying.save(path)
  def levels: Int = underlying.levels
  def levelStats: Seq[LevelStats] = underlying.levelStats
  def approxMemoryBytes: Long = underlying.approxMemoryBytes
  def capacity: Long = underlying.capacity
}

/** Build-time statistics of one shard, carried instead of the shard itself:
  * the driver never holds shard graphs, only this metadata. */
case class ShardMeta(
    path: String,
    dim: Int,
    metric: String,
    count: Int,
    levels: Int,
    levelStats: Seq[LevelStats],
    approxMemoryBytes: Long,
    capacity: Long)

/** Per-JVM cache of loaded shard graphs. On an executor, a shard is read
  * from shared storage once and reused across tasks; artifact paths are
  * immutable (every build/compaction writes NEW files), so entries never go
  * stale. */
object ShardCache {
  private val cache = TrieMap.empty[String, HnswIndex]
  def get(path: String): HnswIndex = cache.getOrElseUpdate(path, HnswIndex.load(path))
  def evict(path: String): Unit = cache.remove(path)
  def clear(): Unit = cache.clear()
}

/** Executor-resident sharded index — the 100TB-scale path.
  *
  * Build: one HNSW sub-graph per input partition, constructed ON the
  * executors and persisted to shared storage there (ShardedHnswIndex.build);
  * the driver only ever holds `ShardMeta` (paths + stats). Queries fan out
  * over the shard artifacts — `searchDistributed` runs one task per shard
  * and k-way-merges k hits per shard on the driver (driver memory =
  * O(shards × k), never the vectors). Broadcasting this object ships only
  * paths + the DML delta, so the KNN-join exec's broadcast stays tiny;
  * executors pull shards through the per-JVM [[ShardCache]].
  *
  * DML is LSM-ish: inserts land in a driver-side delta graph, deletes in a
  * tombstone key set; both are merged into every search. `compacted()`
  * rewrites shard artifacts without tombstoned keys and folds the delta into
  * a new shard (new files — caches can't go stale).
  *
  * Trade vs the single-graph index (same as the reference's RAM-bound
  * design note, reference README.md:74): a query costs shards × search(k)
  * work, in exchange for build and storage that scale horizontally with
  * partitions and per-executor memory bounded by one shard. */
class ShardedHnswIndex(
    val shards: Array[ShardMeta],
    @volatile private var delta: HnswIndex,
    private val deletedKeys: java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Boolean])
  extends VectorIndex {
  require(shards.nonEmpty, "sharded index needs at least one shard")

  def this(shards: Array[ShardMeta]) =
    this(shards, null, new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Boolean]())

  def dim: Int = shards.head.dim
  def metric: String = shards.head.metric

  private def deltaSize: Int = if (delta == null) 0 else delta.size
  def size: Int = shards.map(_.count).sum + deltaSize - deletedKeys.size()
  def deletedCount: Int = deletedKeys.size()

  def contains(key: Long): Boolean =
    (delta != null && delta.contains(key)) ||
      (!deletedKeys.containsKey(key) &&
        shards.exists(s => ShardCache.get(s.path).contains(key)))

  /** Tombstones apply to SHARD hits only — the delta is newer data and a
    * delta key is removed from the delta directly on delete. */
  private def mergeHits(shardHits: Iterator[(Long, Double)],
      q: Array[Float], k: Int, ef: Int): Array[(Long, Double)] = {
    val live = shardHits.filterNot { case (id, _) => deletedKeys.containsKey(id) }
    val fromDelta =
      if (delta == null) Iterator.empty else delta.search(q, k, ef).iterator
    (live ++ fromDelta).toArray.sortBy(r => (r._2, r._1)).take(k)
  }

  /** Per-shard fetch size: tombstones are filtered AFTER the shard search,
    * so over-fetch by the tombstone count or k live hits could be lost. */
  private def fetchK(k: Int): Int = k + deletedKeys.size()

  /** Local fan-out: shards stream through the per-JVM cache. On an executor
    * (KNN join) this is the intended path; on the driver prefer
    * [[searchDistributed]] for one-off queries so shards stay remote. */
  def search(q: Array[Float], k: Int, ef: Int = -1): Array[(Long, Double)] = {
    val kk = fetchK(k)
    mergeHits(
      shards.iterator.flatMap(s => ShardCache.get(s.path).search(q, kk, ef).iterator),
      q, k, ef)
  }

  /** Cluster fan-out: one task per shard, k hits back per shard, exact k-way
    * merge on the driver. Driver memory O(shards × k). */
  def searchDistributed(sc: org.apache.spark.SparkContext, q: Array[Float], k: Int,
      ef: Int = -1): Array[(Long, Double)] = {
    val paths = shards.map(_.path).toSeq
    val qb = q
    val kk = fetchK(k)
    val hits = sc
      .parallelize(paths, paths.length)
      .flatMap(p => ShardCache.get(p).search(qb, kk, ef))
      .collect()
    mergeHits(hits.iterator, q, k, ef)
  }

  /** Inserts land in the driver-side delta graph (merged into every search);
    * shard artifacts stay immutable until compaction. Keys follow the
    * engine's rowid contract: fresh, never reused — re-inserting a key that
    * a shard already holds would leave two live copies (same as re-using a
    * DuckDB row_t), so tombstones are deliberately NOT cleared here. */
  def insert(key: Long, vec: Array[Float]): Unit = synchronized {
    if (delta == null) {
      delta = new HnswIndex(dim, metric)
    }
    delta.add(key, vec)
  }

  /** Delta keys are removed in place; anything else is tombstoned against
    * the shard artifacts. (A never-indexed key thus still lands a tombstone:
    * callers — Graft.deleteFrom — only pass rowids whose vector was indexed.) */
  def delete(key: Long): Boolean = synchronized {
    if (delta != null && delta.contains(key)) delta.remove(key)
    else { deletedKeys.put(key, java.lang.Boolean.TRUE); true }
  }

  /** Rewrite shards without tombstoned keys, folding the delta into an extra
    * shard. New artifact files — per-JVM caches stay valid by construction.
    * (At cluster scale the per-shard rewrite runs as one task per shard; the
    * local loop is the same operation executed driver-side.) */
  def compacted(): VectorIndex = synchronized {
    val dir = Files.createTempDirectory("graft-compact").toString
    val newShards = shards.zipWithIndex.flatMap { case (s, i) =>
      val idx = ShardCache.get(s.path)
      val keep = new HnswIndex(idx.dim, idx.metric, idx.m, idx.m0, idx.efConstruction, idx.efSearch)
      idx.forEachLive { (key, vec) =>
        if (!deletedKeys.containsKey(key)) keep.add(key, vec)
      }
      if (keep.size == 0) None
      else {
        val p = s"$dir/shard-$i.hnsw"
        keep.save(p)
        Some(ShardMeta(p, keep.dim, keep.metric, keep.size, keep.levels,
          keep.levelStats, keep.approxMemoryBytes, keep.capacity))
      }
    }
    val deltaShard = if (delta == null || delta.size == 0) None else {
      val keep = delta.compact()
      val p = s"$dir/shard-delta.hnsw"
      keep.save(p)
      Some(ShardMeta(p, keep.dim, keep.metric, keep.size, keep.levels,
        keep.levelStats, keep.approxMemoryBytes, keep.capacity))
    }
    val all = newShards ++ deltaShard
    if (all.isEmpty) throw new IllegalStateException("compaction removed every vector")
    new ShardedHnswIndex(all)
  }

  /** Cluster compaction: one Spark task per shard rewrites its artifact
    * without tombstoned keys (new files under `destDir`); the delta folds in
    * driver-side. This is `compacted()` at scale — executor memory bounds
    * one shard, the driver never loads any. */
  def compactedDistributed(sc: org.apache.spark.SparkContext,
      destDir: String): ShardedHnswIndex = synchronized {
    java.nio.file.Files.createDirectories(Paths.get(destDir))
    val del: Set[Long] = {
      val it = deletedKeys.keySet().iterator()
      val b = Set.newBuilder[Long]
      while (it.hasNext) b += it.next()
      b.result()
    }
    val newShards = sc.parallelize(shards.zipWithIndex.toSeq, shards.length)
      .flatMap { case (s, i) =>
        val idx = ShardCache.get(s.path)
        val keep = new HnswIndex(idx.dim, idx.metric, idx.m, idx.m0,
          idx.efConstruction, idx.efSearch)
        idx.forEachLive((key, vec) => if (!del.contains(key)) keep.add(key, vec))
        if (keep.size == 0) None
        else {
          val p = s"$destDir/shard-$i.hnsw"
          keep.save(p)
          Some(ShardMeta(p, keep.dim, keep.metric, keep.size, keep.levels,
            keep.levelStats, keep.approxMemoryBytes, keep.capacity))
        }
      }.collect()
    val deltaShard = if (delta == null || delta.size == 0) None else {
      val keep = delta.compact()
      val p = s"$destDir/shard-delta.hnsw"
      keep.save(p)
      Some(ShardMeta(p, keep.dim, keep.metric, keep.size, keep.levels,
        keep.levelStats, keep.approxMemoryBytes, keep.capacity))
    }
    val all = newShards ++ deltaShard
    if (all.isEmpty) throw new IllegalStateException("compaction removed every vector")
    new ShardedHnswIndex(all)
  }

  /** Persist = copy shard artifacts + a manifest (delta, tombstones, stats)
    * under `path`. */
  def save(path: String): Unit = synchronized {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val copied = shards.zipWithIndex.map { case (s, i) =>
      val dest = dir.resolve(s"shard-$i.hnsw")
      Files.copy(Paths.get(s.path), dest, StandardCopyOption.REPLACE_EXISTING)
      s.copy(path = dest.toString)
    }
    val out = new ObjectOutputStream(Files.newOutputStream(dir.resolve("manifest.bin")))
    try {
      out.writeObject(copied)
      out.writeObject(delta)
      out.writeObject(deletedKeys)
    } finally out.close()
  }

  def levels: Int = (shards.map(_.levels) ++ Option(delta).map(_.levels)).max
  def levelStats: Seq[LevelStats] = {
    val all = shards.map(_.levelStats) ++ Option(delta).map(_.levelStats)
    (0 until levels).map { l =>
      val at = all.flatMap(_.lift(l))
      LevelStats(at.map(_.nodes).sum, at.map(_.edges).sum,
        at.map(_.maxEdges).sum, at.map(_.allocatedBytes).sum)
    }
  }
  def approxMemoryBytes: Long =
    shards.map(_.approxMemoryBytes).sum + Option(delta).map(_.approxMemoryBytes).getOrElse(0L)
  def capacity: Long =
    shards.map(_.capacity).sum + Option(delta).map(_.capacity).getOrElse(0L)
}

/** Deferred-load proxy over a persisted index artifact: the artifact is
  * deserialized on FIRST access, not at catalog-restore time — the
  * reference's lazy reload after restart (reference README.md:76,
  * src/hnsw/hnsw_index.cpp:193-206). A directory artifact is a sharded
  * index (manifest + shard files), a flat file a single graph. */
class LazyLoadedIndex(val artifactPath: String) extends VectorIndex {
  @transient private lazy val underlying: VectorIndex =
    if (Files.isDirectory(Paths.get(artifactPath))) ShardedHnswIndex.load(artifactPath)
    else new SingleHnswIndex(HnswIndex.load(artifactPath))

  /** Force the deferred load and expose the real index (e.g. so compaction
    * can pick the distributed path for a sharded artifact). */
  def resolved: VectorIndex = underlying

  def dim: Int = underlying.dim
  def metric: String = underlying.metric
  def size: Int = underlying.size
  def deletedCount: Int = underlying.deletedCount
  def contains(key: Long): Boolean = underlying.contains(key)
  def search(q: Array[Float], k: Int, ef: Int = -1): Array[(Long, Double)] =
    underlying.search(q, k, ef)
  def insert(key: Long, vec: Array[Float]): Unit = underlying.insert(key, vec)
  def delete(key: Long): Boolean = underlying.delete(key)
  def compacted(): VectorIndex = underlying.compacted()
  def save(path: String): Unit = underlying.save(path)
  def levels: Int = underlying.levels
  def levelStats: Seq[LevelStats] = underlying.levelStats
  def approxMemoryBytes: Long = underlying.approxMemoryBytes
  def capacity: Long = underlying.capacity
}

object ShardedHnswIndex {
  @SuppressWarnings(Array("unchecked"))
  def load(path: String): ShardedHnswIndex = {
    val manifest = Paths.get(path).resolve("manifest.bin")
    val in = new ObjectInputStream(Files.newInputStream(manifest))
    try {
      val shards = in.readObject().asInstanceOf[Array[ShardMeta]]
      val delta = in.readObject().asInstanceOf[HnswIndex]
      val deleted = in.readObject()
        .asInstanceOf[java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Boolean]]
      new ShardedHnswIndex(shards, delta, deleted)
    } finally in.close()
  }
}
