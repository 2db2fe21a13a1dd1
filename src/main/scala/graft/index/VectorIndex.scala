package graft.index

import java.nio.file.{Files, Paths}

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
  def compacted(): VectorIndex = new SingleHnswIndex(underlying.compact())
  def save(path: String): Unit = underlying.save(path)
  def levels: Int = underlying.levels
  def levelStats: Seq[LevelStats] = underlying.levelStats
  def approxMemoryBytes: Long = underlying.approxMemoryBytes
  def capacity: Long = underlying.capacity
}

/** Sharded index: one HNSW sub-graph per input partition, searched fan-out
  * with a k-way merge. This is the 100TB-scale path — each executor builds
  * its shard independently (no shared state, no shuffle), and a query costs
  * `shards × search(k)` with an exact merge, trading single-graph recall for
  * unbounded horizontal scale. */
class ShardedHnswIndex(val shards: Array[HnswIndex]) extends VectorIndex {
  require(shards.nonEmpty, "sharded index needs at least one shard")
  def dim: Int = shards.head.dim
  def metric: String = shards.head.metric
  def size: Int = shards.map(_.size).sum
  def deletedCount: Int = shards.map(_.deletedCount).sum
  def contains(key: Long): Boolean = shards.exists(_.contains(key))
  def search(q: Array[Float], k: Int, ef: Int = -1): Array[(Long, Double)] =
    shards.flatMap(_.search(q, k, ef)).sortBy(r => (r._2, r._1)).take(k)
  def insert(key: Long, vec: Array[Float]): Unit =
    shards.minBy(_.size).add(key, vec)
  def delete(key: Long): Boolean = shards.exists(_.remove(key))
  def compacted(): VectorIndex = new ShardedHnswIndex(shards.map(_.compact()))
  def save(path: String): Unit = {
    Files.createDirectories(Paths.get(path))
    shards.zipWithIndex.foreach { case (s, i) => s.save(s"$path/shard-$i.hnsw") }
  }
  def levels: Int = shards.map(_.levels).max
  def levelStats: Seq[LevelStats] = {
    val all = shards.map(_.levelStats)
    (0 until levels).map { l =>
      val at = all.flatMap(_.lift(l))
      LevelStats(at.map(_.nodes).sum, at.map(_.edges).sum,
        at.map(_.maxEdges).sum, at.map(_.allocatedBytes).sum)
    }
  }
  def approxMemoryBytes: Long = shards.map(_.approxMemoryBytes).sum
  def capacity: Long = shards.map(_.capacity).sum
}

object ShardedHnswIndex {
  def load(path: String): ShardedHnswIndex = {
    val dir = Paths.get(path)
    val files = Files.list(dir).toArray.map(_.toString).filter(_.endsWith(".hnsw")).sorted
    new ShardedHnswIndex(files.map(HnswIndex.load))
  }
}
