package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.index.{IndexCatalog, ShardCache, ShardedHnswIndex, VectorIndex}

/** Shard-lifecycle contract of compaction (round-16 verdict #1: the delta
  * spill sealed a 16k-row shard per flush, but both compaction paths rewrote
  * shards strictly 1:1, so shard count — and every fan-out search's
  * shards × flooredEf cost — grew monotonically with ingest history).
  * Compaction must MERGE under-filled shards back into
  * ~`graft.hnsw.autoShardRows`-sized output shards, without changing any
  * search answer; and ShardMeta must carry the build knobs so metadata-only
  * consumers (the first DML insert after a cold restore) never load a shard
  * graph to read four ints (verdict #2). */
class CompactionMergeSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val SpillKey = IndexCatalog.DeltaSpillRowsConfKey
  private val TargetKey = IndexCatalog.AutoShardRowsConfKey

  private def vec(id: Long): Array[Float] =
    Array.tabulate(8)(j => ((id >> (3 * j)) & 7).toFloat)

  private def vecsDf(ids: org.apache.spark.sql.DataFrame) = ids.select(
    $"id".as("vec_id"),
    array((0 until 8).map(j =>
      (shiftright($"id", 3 * j) % 8).cast("float")): _*).as("embedding"))

  private def freshIndex(name: String, rows: Long,
      numShards: Int = 2): ShardedHnswIndex = {
    Graft.registerTable(spark, s"${name}_t", vecsDf(spark.range(rows).toDF("id")))
    IndexCatalog.dropIndex(name)
    // ef_search >> any size this spec reaches ⇒ every search is exhaustive,
    // so pre/post-compaction answers must be IDENTICAL, not just close
    IndexCatalog.createIndex(spark, name, s"${name}_t", "embedding",
      Map("ef_search" -> "1000000", "ef_construction" -> "16", "m" -> "8"),
      sharded = true, numShards = numShards)
    IndexCatalog.get(name).get.index.asInstanceOf[ShardedHnswIndex]
  }

  override def afterAll(): Unit = {
    spark.conf.unset(SpillKey)
    spark.conf.unset(TargetKey)
  }

  test("compaction greedy-packs spill-fragmented shards back to ~liveRows/target") {
    val idx = freshIndex("cm_a", 80) // two ~40-row original shards
    spark.conf.set(SpillKey, "20")
    spark.conf.set(TargetKey, "80")
    try {
      (80L until 190L).foreach(id => idx.insert(id, vec(id)))
      // 110 inserts at threshold 20 ⇒ 5 spill-sealed 20-row shards + 10 pending
      assert(idx.shards.length == 2 + 5, "expected 5 spill-sealed shards")
      assert(idx.pendingDeltaSize == 10)
      val queries = Array(3L, 95L, 185L) // original / spilled / pending rows
      val before = queries.map(id => idx.search(vec(id), 5).toSeq)
      val merged = idx.compacted().asInstanceOf[ShardedHnswIndex]
      // greedy in-order at target 80: [40+40], [20×4], [20 + 10 delta] ⇒ 3
      assert(merged.shards.length == 3,
        s"greedy-pack must merge 7 shards + delta into 3, got ${merged.shards.length}")
      assert(merged.size == idx.size && merged.pendingDeltaSize == 0)
      val after = queries.map(id => merged.search(vec(id), 5).toSeq)
      assert(after.toSeq == before.toSeq,
        "exhaustive searches must be identical across the merge")
    } finally { spark.conf.unset(SpillKey); spark.conf.unset(TargetKey) }
  }

  test("distributed compaction merges identically (one task per OUTPUT shard)") {
    val idx = freshIndex("cm_b", 80)
    spark.conf.set(SpillKey, "20")
    spark.conf.set(TargetKey, "80")
    try {
      (80L until 190L).foreach(id => idx.insert(id, vec(id)))
      // empty one spilled shard entirely: deletes must not resurrect, and
      // LIVE counts (not raw counts) must drive the packing
      (120L until 140L).foreach(id => assert(idx.delete(id)))
      val probe = idx.search(vec(150L), 5).toSeq
      val dir = java.nio.file.Files.createTempDirectory("cm-dist").toString
      val merged = idx.compactedDistributed(spark.sparkContext, s"$dir/out")
      // live: [40+40]=80, spills [20,20,0,20,20]=80 (one fully deleted),
      // delta 10 ⇒ greedy groups [80],[80],[10] = 3 output shards
      assert(merged.shards.length == 3,
        s"expected 3 merged shards, got ${merged.shards.length}")
      assert(merged.size == idx.size && merged.deletedCount == 0)
      (120L until 140L).foreach(id => assert(!merged.contains(id)))
      assert(merged.search(vec(150L), 5).toSeq == probe)
      assert(merged.shards.forall(_.path.startsWith(s"$dir/out")))
    } finally { spark.conf.unset(SpillKey); spark.conf.unset(TargetKey) }
  }

  test("shards already at the target are never split and never lose rows") {
    val idx = freshIndex("cm_c", 200, numShards = 2) // two ~100-row shards
    spark.conf.set(TargetKey, "100")
    try {
      val merged = idx.compacted().asInstanceOf[ShardedHnswIndex]
      assert(merged.shards.length == 2, "two full shards must stay two")
      assert(merged.shards.map(_.count.toLong).sum == 200L)
      assert(merged.size == 200)
    } finally spark.conf.unset(TargetKey)
  }

  test("re-compacting an already-clean index copies artifacts instead of rebuilding") {
    val idx = freshIndex("cm_r", 120)
    spark.conf.set(TargetKey, "80")
    try {
      (120L until 160L).foreach(id => idx.insert(id, vec(id)))
      val once = idx.compacted().asInstanceOf[ShardedHnswIndex]
      val twice = once.compacted().asInstanceOf[ShardedHnswIndex]
      // every output group is a clean singleton (no tombstones, no delta):
      // the LSM skip-clean-segments rule must COPY the artifact byte-for-byte
      assert(twice.shards.length == once.shards.length)
      once.shards.zip(twice.shards).foreach { case (a, b) =>
        assert(a.path != b.path, "copy must still land under a fresh compact dir")
        val ba = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(a.path))
        val bb = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(b.path))
        assert(java.util.Arrays.equals(ba, bb),
          s"clean shard ${a.path} must be copied, not rebuilt")
      }
      assert(twice.size == idx.size)
      assert(twice.search(vec(130L), 1).head._1 == 130L)
    } finally spark.conf.unset(TargetKey)
  }

  test("ShardMeta carries build knobs; the first post-restore insert loads no graph") {
    val idx = freshIndex("cm_k", 60)
    idx.shards.foreach { s =>
      assert(s.knobs != null && s.knobs.m == 8 && s.knobs.efConstruction == 16 &&
        s.knobs.efSearch == 1000000, s"knobs must ride the meta: ${s.knobs}")
    }
    // knobs survive the save/load manifest round-trip
    val dir = java.nio.file.Files.createTempDirectory("cm-knobs").toString
    idx.save(s"$dir/idx")
    val loaded = ShardedHnswIndex.load(s"$dir/idx")
    loaded.shards.foreach(s => assert(s.knobs != null && s.knobs.m == 8))
    // cold cache (the restart state): inheriting knobs for the delta must
    // not deserialize a shard graph driver-side
    ShardCache.clear()
    loaded.insert(1000L, vec(1000L))
    assert(ShardCache.residentCount == 0,
      "first post-restore insert must be metadata-only (no ShardCache load)")
    // the inherited-knob delta still answers searches with the new row
    assert(loaded.search(vec(1000L), 1).head._1 == 1000L)
    // legacy manifests (knobs == null) fall back to the bounded graph load
    val legacy = new ShardedHnswIndex(idx.shards.map(_.copy(knobs = null)))
    ShardCache.clear()
    legacy.insert(2000L, vec(2000L))
    assert(ShardCache.residentCount == 1,
      "legacy meta must fall back to loading the head shard for its knobs")
    assert(legacy.search(vec(2000L), 1).head._1 == 2000L)
  }

  test("pragma_hnsw_shard_info reads the whole lifecycle metadata-only") {
    val idx = freshIndex("cm_i", 80)
    spark.conf.set(SpillKey, "20")
    try {
      (80L until 130L).foreach(id => idx.insert(id, vec(id))) // 2 spills + 10 pending
      assert(idx.delete(85L)) // tombstone in a spilled shard
      def info() = GraftSql.sql(spark,
        "SELECT * FROM pragma_hnsw_shard_info('cm_i')").collect()
      // metadata-only: a cold cache must stay cold through the introspection
      graft.index.ShardCache.clear()
      val rows = info()
      assert(graft.index.ShardCache.residentCount == 0,
        "shard info must not load any shard graph")
      assert(rows.length == 4 + 1, s"4 shards + delta row, got ${rows.length}")
      val delta = rows.find(_.getString(1) == "(delta)").get
      assert(delta.getLong(2) == 10 && delta.getLong(4) == 10)
      val tombstoned = rows.filter(r => r.getString(1) != "(delta)" && r.getLong(3) > 0)
      assert(tombstoned.length == 1 && tombstoned.head.getLong(4) ==
        tombstoned.head.getLong(2) - 1, "one spilled shard carries the tombstone")
      rows.filter(_.getString(1) != "(delta)").foreach { r =>
        assert(r.getLong(7) == 8 && r.getLong(8) == 16, s"knob columns: $r")
      }
      // post-compact: fragmentation and tombstones folded away
      graft.index.IndexCatalog.compactIndex("cm_i")
      val after = info()
      assert(after.forall(_.getLong(3) == 0))
      assert(after.map(_.getLong(4)).sum == idx.size) // idx.size already nets the delete
      assert(!after.exists(_.getString(1) == "(delta)"))
    } finally spark.conf.unset(SpillKey)
  }

  test("a spilled delta's sealed shard inherits knobs through the meta") {
    val idx = freshIndex("cm_s", 40)
    spark.conf.set(SpillKey, "15")
    try {
      (40L until 55L).foreach(id => idx.insert(id, vec(id)))
      assert(idx.pendingDeltaSize == 0, "spill must have fired")
      val spillShard = idx.shards.last
      assert(spillShard.knobs != null && spillShard.knobs.m == 8 &&
        spillShard.knobs.efConstruction == 16,
        s"sealed spill shard must carry the inherited knobs: ${spillShard.knobs}")
    } finally spark.conf.unset(SpillKey)
  }
}
