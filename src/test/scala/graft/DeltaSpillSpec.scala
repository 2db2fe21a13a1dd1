package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.index.{IndexCatalog, ShardedHnswIndex}

/** Delta-spill contract of the sharded index (round-15 verdict #1: the
  * driver-side DML delta graph was the one remaining driver-resident growth
  * path between compactions). Sustained per-row ingest must keep the delta
  * bounded by `graft.hnsw.deltaSpillRows` — rows past the threshold seal
  * into immutable shard artifacts (the LSM memtable flush) — while every
  * search/DML/persist behavior stays exactly what it was. */
class DeltaSpillSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val SpillKey = IndexCatalog.DeltaSpillRowsConfKey

  /** Deterministic unique dim-8 vector: coord j = bits 3j..3j+2 of the id. */
  private def vec(id: Long): Array[Float] =
    Array.tabulate(8)(j => ((id >> (3 * j)) & 7).toFloat)

  private def vecsDf(ids: org.apache.spark.sql.DataFrame) = ids.select(
    $"id".as("vec_id"),
    array((0 until 8).map(j =>
      (shiftright($"id", 3 * j) % 8).cast("float")): _*).as("embedding"))

  private def freshIndex(name: String, rows: Long): ShardedHnswIndex = {
    Graft.registerTable(spark, s"${name}_t", vecsDf(spark.range(rows).toDF("id")))
    IndexCatalog.dropIndex(name)
    // ef_search >> any size this spec reaches ⇒ every search is exhaustive
    IndexCatalog.createIndex(spark, name, s"${name}_t", "embedding",
      Map("ef_search" -> "1000000", "ef_construction" -> "16", "m" -> "8"),
      sharded = true, numShards = 2)
    IndexCatalog.get(name).get.index.asInstanceOf[ShardedHnswIndex]
  }

  override def afterAll(): Unit = spark.conf.unset(SpillKey)

  test("sustained inserts keep the delta bounded and seal full deltas into shards") {
    val idx = freshIndex("spill_a", 100)
    val shardsBefore = idx.shards.length
    spark.conf.set(SpillKey, "50")
    try {
      var maxDelta = 0
      (100L until 330L).foreach { id =>
        idx.insert(id, vec(id))
        maxDelta = math.max(maxDelta, idx.pendingDeltaSize)
      }
      // 230 inserts at threshold 50 ⇒ 4 spills of 50, 30 left pending
      assert(maxDelta <= 50, s"delta grew past the spill threshold: $maxDelta")
      assert(idx.pendingDeltaSize == 30)
      assert(idx.shards.length == shardsBefore + 4)
      assert(idx.size == 330)
      // spilled shards are real artifacts under the shared dir
      idx.shards.drop(shardsBefore).foreach { s =>
        assert(s.path.startsWith(IndexCatalog.indexArtifactDir))
        assert(s.count == 50)
      }
    } finally spark.conf.unset(SpillKey)
  }

  test("searches see spilled, pending, and original rows exactly") {
    val idx = IndexCatalog.get("spill_a").get.index.asInstanceOf[ShardedHnswIndex]
    // one probe per residency class: spilled shard / delta (the original
    // shards hold table ROWIDS, which the direct-keyed inserts never touch)
    Seq(160L, 320L).foreach { id =>
      val hits = idx.search(vec(id), 1)
      assert(hits.head._1 == id && hits.head._2 == 0.0,
        s"row $id (expected exact self-hit) got ${hits.head}")
    }
    // batched (KNN-join execution) path agrees with per-query search
    val batch = idx.searchBatch(Array(vec(160L), vec(320L)), 1)
    assert(batch(0).head._1 == 160L && batch(1).head._1 == 320L)
  }

  test("deletes work on both sides of the spill boundary") {
    val idx = IndexCatalog.get("spill_a").get.index.asInstanceOf[ShardedHnswIndex]
    val sizeBefore = idx.size
    // spilled row ⇒ tombstone attributed to its (spilled) shard
    assert(idx.delete(150L))
    val spilled = idx.shards.find(s =>
      s.count == 50 && s.keyFilter != null && s.keyFilter.maybeContains(150L) &&
        idx.tombstonesForShard(s.path) > 0)
    assert(spilled.nonEmpty, "tombstone must attribute to the spilled shard")
    // still-pending row ⇒ removed from the delta in place, no tombstone
    val tombsBefore = idx.deletedCount
    assert(idx.delete(320L))
    assert(idx.deletedCount == tombsBefore)
    assert(idx.size == sizeBefore - 2)
    Seq(150L, 320L).foreach(id => assert(!idx.contains(id)))
  }

  test("save/load and compaction round-trip across a spill") {
    val idx = IndexCatalog.get("spill_a").get.index.asInstanceOf[ShardedHnswIndex]
    val dir = java.nio.file.Files.createTempDirectory("spill-save").toString
    idx.save(s"$dir/idx")
    val loaded = ShardedHnswIndex.load(s"$dir/idx")
    assert(loaded.size == idx.size)
    assert(loaded.search(vec(160L), 1).head._1 == 160L)
    assert(!loaded.contains(150L))
    val compacted = idx.compacted().asInstanceOf[ShardedHnswIndex]
    assert(compacted.size == idx.size && compacted.deletedCount == 0)
    assert(compacted.search(vec(170L), 1).head._1 == 170L)
  }

  /** The two round-16 race findings, exercised by genuinely racing spills:
    * (a) advisor high — a search that captured the shard list pre-spill and
    * the delta post-spill saw spilled rows in NEITHER arm (fixed by the
    * delta-first spillCoherentSnapshot); (b) a row briefly visible in both
    * arms occupied two of searchBatch's k heap slots, evicting a genuine
    * k-th hit, so the post-heap dedup returned k−1 rows (fixed by skipping
    * already-in-heap keys). Every search here is exhaustive (huge ef ⇒
    * exact linear scans), so any miss or short result is a real race, not
    * recall. */
  test("searches racing spills never lose acknowledged rows; batch returns exactly k") {
    val idx = freshIndex("spill_race", 100)
    val shardsBefore = idx.shards.length
    spark.conf.set(SpillKey, "64")
    try {
      val k = 5
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val maxId = new java.util.concurrent.atomic.AtomicLong(-1L)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val searcher = new Thread(() => {
        val rnd = new java.util.Random(7)
        try while (!stop.get()) {
          val hi = maxId.get()
          if (hi >= 1100L) { // enough acknowledged rows for k live hits
            val id = 1000L + rnd.nextInt((hi - 1000L).toInt + 1)
            val hit = idx.search(vec(id), 1)
            if (hit.isEmpty || hit.head._1 != id || hit.head._2 != 0.0)
              errs.add(s"search lost acknowledged row $id: ${hit.toSeq}")
            val batch = idx.searchBatch(Array(vec(id), vec(hi)), k)
            batch.zip(Seq(id, hi)).foreach { case (rows, qid) =>
              if (rows.length != k)
                errs.add(s"searchBatch returned ${rows.length} != $k rows for $qid")
              else if (rows.head._1 != qid)
                errs.add(s"searchBatch lost acknowledged row $qid: ${rows.toSeq}")
            }
          }
        } catch { case t: Throwable => errs.add(s"searcher died: $t") }
      })
      searcher.start()
      (1000L until 5000L).foreach { id => idx.insert(id, vec(id)); maxId.set(id) }
      stop.set(true)
      searcher.join(60000)
      assert(!searcher.isAlive, "searcher thread wedged")
      assert(errs.isEmpty, s"${errs.size} race failures, first: ${errs.peek()}")
      assert(idx.shards.length >= shardsBefore + 60, "spills must actually have raced")
      assert(idx.size == 100 + 4000)
    } finally spark.conf.unset(SpillKey)
  }

  /** The broadcast half of the same advisor finding: default field-at-a-time
    * serialization racing a spill could write the PRE-spill shard array and
    * the POST-spill null delta, baking the lost rows into an executor
    * broadcast for the epoch's lifetime. writeObject now snapshots both
    * fields under the spill's own monitor — every serialized copy must see
    * every row acknowledged before the snapshot started. */
  test("serialized snapshots racing spills never lose acknowledged rows") {
    val idx = freshIndex("spill_ser", 100)
    spark.conf.set(SpillKey, "64")
    try {
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val maxId = new java.util.concurrent.atomic.AtomicLong(-1L)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      var snapshots = 0
      val writer = new Thread(() => {
        try while (!stop.get()) {
          val hi = maxId.get() // acknowledged BEFORE the snapshot starts
          if (hi >= 1000L) {
            val bos = new java.io.ByteArrayOutputStream()
            val out = new java.io.ObjectOutputStream(bos)
            out.writeObject(idx); out.close()
            val in = new java.io.ObjectInputStream(
              new java.io.ByteArrayInputStream(bos.toByteArray))
            val copy = in.readObject().asInstanceOf[ShardedHnswIndex]
            if (!copy.contains(hi))
              errs.add(s"serialized snapshot lost acknowledged row $hi")
            snapshots += 1
          }
        } catch { case t: Throwable => errs.add(s"writer died: $t") }
      })
      writer.start()
      (1000L until 4000L).foreach { id => idx.insert(id, vec(id)); maxId.set(id) }
      stop.set(true)
      writer.join(60000)
      assert(!writer.isAlive, "writer thread wedged")
      assert(errs.isEmpty, s"${errs.size} failures, first: ${errs.peek()}")
      assert(snapshots > 10, s"too few racing snapshots to mean anything: $snapshots")
    } finally spark.conf.unset(SpillKey)
  }

  test("a delta holding delete-removed rows spills only its live rows") {
    val idx = freshIndex("spill_b", 10)
    spark.conf.set(SpillKey, "40")
    try {
      (10L until 45L).foreach(id => idx.insert(id, vec(id)))
      // remove 5 pending rows, then push past the threshold
      (10L until 15L).foreach(id => assert(idx.delete(id)))
      assert(idx.pendingDeltaSize == 30)
      (45L until 55L).foreach(id => idx.insert(id, vec(id)))
      assert(idx.pendingDeltaSize == 0, "spill must have fired")
      val spilledShard = idx.shards.last
      assert(spilledShard.count == 40, "only live delta rows may spill")
      assert(idx.size == 50)
      (10L until 15L).foreach(id => assert(!idx.contains(id)))
      assert(idx.search(vec(44L), 1).head._1 == 44L)
    } finally spark.conf.unset(SpillKey)
  }
}
