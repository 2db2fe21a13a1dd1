package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in (GRAFT_SLOW=1) ANN envelope at reference scale THROUGH THE
  * 100 TB PATH: 1,000,000 vectors built as a 32-shard index on executors
  * (one serial sub-graph per task, only ShardMeta returning to the
  * driver — the exact shape a 1000-executor cluster runs), then measured
  * for graph-mode recall@10 and per-probe latency at the default
  * ef_search=64 against exact exhaustive-path baselines. Complements
  * RECLAIM_1M.json (storage semantics at 1M) with the SEARCH-quality
  * envelope at 1M; results land in ANN_1M.json. The sf0.1-scale
  * counterparts are q81/q82's per-run recall gate and RecallSpec's ef
  * curve. */
class AnnScaleSpec extends AnyFunSuite {

  test("1M-row 32-shard ANN envelope: build throughput, recall@10 at " +
      "ef=64, probe latency (writes ANN_1M.json)", SlowTest) {
    assume(sys.env.get("GRAFT_SLOW").exists(_.nonEmpty),
      "set GRAFT_SLOW=1 to run the 1M-row ANN envelope (~5+ min)")
    val spark = TestSpark.spark
    val n = 1000000
    val dim = 32
    val shards = 32
    val table = "ann1m"
    val index = "ann1m_idx"
    // Deterministic synthetic corpus: coordinates derived from
    // xxhash64(id, dim) — no RNG state, so the spec is replayable and the
    // artifact sizes comparable across runs. Values land in (-1, 1).
    val vecCols = array((0 until dim).map(d =>
      ((xxhash64(col("id"), lit(d)) % 100000L) / 100000.0).cast("float")): _*)
    val df = spark.range(n).select(col("id").as("vec_id"),
      vecCols.as("embedding"))
    Graft.registerTable(spark, table, df)
    try {
      val t0 = System.nanoTime()
      graft.index.IndexCatalog.createIndex(spark, index, table, "embedding",
        Map.empty, sharded = true, numShards = shards)
      val buildSec = (System.nanoTime() - t0) / 1e9
      val idx = graft.index.IndexCatalog.get(index).get.index
      assert(idx.size == n, s"index holds ${idx.size} of $n vectors")

      // 100 probes spread across the corpus
      val probes = spark.table(table)
        .where(col("vec_id") % 10000 === 0)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getSeq[Float](1).toArray)
      assert(probes.length == 100)

      // exact k-th distance per probe via the exhaustive path (ef >= N
      // degenerates every shard's beam into a bounded-heap linear scan)
      val exhaustiveEf = idx.size + 1
      var exactNanos = 0L
      val exactKth = probes.map { q =>
        val s0 = System.nanoTime()
        val r = idx.search(q, 10, ef = exhaustiveEf)
        exactNanos += System.nanoTime() - s0
        r.last._2
      }

      // graph-mode probes at the default ef, warmed then timed one by one
      probes.take(5).foreach(q => idx.search(q, 10, ef = 64))
      val latMs = new Array[Double](probes.length)
      val recalls = probes.indices.map { i =>
        val s0 = System.nanoTime()
        val res = idx.search(probes(i), 10, ef = 64)
        latMs(i) = (System.nanoTime() - s0) / 1e6
        // tie-robust hit test, same as the q79-q82 gate
        res.count(_._2 <= exactKth(i) * (1 + 1e-9) + 1e-12) / 10.0
      }
      val recall = recalls.sum / recalls.length
      java.util.Arrays.sort(latMs)
      def pct(p: Double): Double =
        latMs(math.min(latMs.length - 1, (p * latMs.length).toInt))
      def r2(v: Double) = math.rint(v * 100) / 100
      def r3(v: Double) = math.rint(v * 1000) / 1000
      val json =
        s"""{
           |  "_provenance": "written by AnnScaleSpec (GRAFT_SLOW=1): 1,000,000 deterministic dim-32 vectors built as a 32-shard HNSW on executors (serial sub-graph per task, ShardMeta-only driver traffic — the 100 TB build shape), then 100 graph-mode probes at default ef_search=64 measured driver-side through the sharded fan-out against exact exhaustive-path baselines.",
           |  "rows": $n,
           |  "dim": $dim,
           |  "shards": $shards,
           |  "build_sec": ${r2(buildSec)},
           |  "build_vectors_per_sec": ${math.rint(n / buildSec)},
           |  "recall_at_10_ef64": ${r3(recall)},
           |  "probe_ms_p50": ${r2(pct(0.50))},
           |  "probe_ms_p95": ${r2(pct(0.95))},
           |  "probe_ms_max": ${r2(latMs.last)},
           |  "exact_scan_ms_mean": ${r2(exactNanos / 1e6 / probes.length)}
           |}
           |""".stripMargin
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("ANN_1M.json"), json)
      info(f"build ${r2(buildSec)}s (${math.rint(n / buildSec)}%.0f vec/s), " +
        f"recall@10(ef=64)=$recall%.3f, probe p50=${pct(0.5)}%.2f ms " +
        f"(exact-scan mean ${exactNanos / 1e6 / probes.length}%.0f ms)")
      assert(recall >= 0.9 - 1e-9,
        f"1M sharded graph-mode recall@10 at ef=64 was $recall%.3f")
    } finally {
      graft.index.IndexCatalog.dropIndex(index)
      Graft.dropTable(spark, table)
      ()
    }
  }
}
