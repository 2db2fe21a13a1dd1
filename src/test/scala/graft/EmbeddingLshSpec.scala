package graft

import org.apache.spark.sql.functions._

/** Embedding-LSH pair mining: the fixed-geometry miner (q32's oracle-pinned
  * form) and the geometry-from-n auto variant that keeps candidate volume
  * linear at scale. */
class EmbeddingLshSpec extends GraftSparkSpec {
  import spark.implicits._

  test("lshGeometry: occupancy bound n/2^r <= target, floor of 8 bits, " +
      "monotonic in n") {
    val target = 32
    var last = 0
    for (exp <- 0 to 40) {
      val n = 1L << exp
      val r = graft.ops.Dedup.lshGeometry(n, target)
      assert(r >= 8, s"n=$n: r=$r below the 8-bit floor")
      assert(n.toDouble / math.pow(2.0, r) <= target,
        s"n=$n: expected occupancy ${n.toDouble / math.pow(2.0, r)} > $target")
      assert(r >= last, s"n=$n: r=$r regressed from $last")
      last = r
    }
    // the regime that motivated the variant: 1e9 rows need ~25-bit bands,
    // not the 8 a fixed small-n geometry would keep
    assert(graft.ops.Dedup.lshGeometry(1_000_000_000L, target) >= 24)
  }

  private def plantedVectors(): (Seq[(Long, Array[Float])], Set[(Long, Long)]) = {
    val rnd = new scala.util.Random(271828)
    val dim = 16
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val rows = Seq.newBuilder[(Long, Array[Float])]
    val planted = Set.newBuilder[(Long, Long)]
    var id = 0L
    for (_ <- 0 until 40) { // 40 clusters of 3 near-identical members
      val base = unit()
      val members = (0 until 3).map { _ =>
        val m = base.map(x => x + (rnd.nextGaussian() * 1e-4).toFloat)
        val i = id; id += 1; rows += ((i, m)); i
      }
      for (a <- members; b <- members if a < b) planted += ((a, b))
    }
    for (_ <- 0 until 200) { rows += ((id, unit())); id += 1 } // background
    (rows.result(), planted.result())
  }

  test("auto variant: all planted near-dup pairs found, every emitted pair " +
      "exact-verified, pair set matches the fixed-geometry miner's") {
    val (rows, planted) = plantedVectors()
    val df = rows.toDF("vec_id", "embedding")
    def pairs(out: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      out.select(col("a").cast("long"), col("b").cast("long"), col("dist"))
        .collect()
        .map { r => assert(r.getDouble(2) <= 0.1 + 1e-12,
          s"pair (${r.getLong(0)},${r.getLong(1)}) above maxDist"); // precision is exact by construction
          (r.getLong(0), r.getLong(1)) }
        .toSet
    val fixed = pairs(graft.ops.Dedup.embeddingLshPairs(
      df, "vec_id", "embedding", maxDist = 0.1))
    val auto = pairs(graft.ops.Dedup.embeddingLshPairsAuto(
      df, "vec_id", "embedding", maxDist = 0.1))
    assert(planted.subsetOf(fixed), s"fixed missed ${planted -- fixed}")
    assert(planted.subsetOf(auto), s"auto missed ${planted -- auto}")
    // random unit vectors in 16-dim essentially never land within 0.1 cosine
    // distance, so both miners should return exactly the planted structure
    assert(fixed == planted && auto == planted,
      s"spurious pairs: fixed ${fixed -- planted}, auto ${auto -- planted}")
  }

  test("auto output is a SUPERSET of fixed at the small-n geometry (r=8): " +
      "auto's 4 bands extend fixed's 2 over identical planes — the q32b/q32 " +
      "graded relation") {
    val (rows, _) = plantedVectors()
    val df = rows.toDF("vec_id", "embedding")
    // n=320 -> lshGeometry gives r=8, so auto = 4x8 bits over the same
    // seeded plane sequence whose first 16 bits are exactly fixed's 2x8
    assert(graft.ops.Dedup.lshGeometry(rows.size.toLong) === 8)
    def pairSet(out: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      out.select(col("a").cast("long"), col("b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = pairSet(graft.ops.Dedup.embeddingLshPairs(
      df, "vec_id", "embedding", maxDist = 0.8))
    val auto = pairSet(graft.ops.Dedup.embeddingLshPairsAuto(
      df, "vec_id", "embedding", maxDist = 0.8))
    assert(fixed.subsetOf(auto),
      s"auto lost fixed-geometry pairs: ${fixed -- auto}")
  }

  test("lshBandKeys: sum of c*(c-1)/2 over bucket sizes equals the " +
      "pre-distinct candidate join volume (the probe's accounting)") {
    val (rows, _) = plantedVectors()
    val df = rows.toDF("vec_id", "embedding")
    val bk = graft.ops.Dedup.lshBandKeys(df, "vec_id", "embedding",
      nPlanes = 16, rowsPerBand = 8)
    val fromBuckets = bk.groupBy(col("band_id"), col("band_val"))
      .agg(count(lit(1)).as("c"))
      .select(sum(expr("(c * (c - 1)) DIV 2"))).head().getLong(0)
    val l = bk.toDF("a", "band_id", "band_val")
    val r = bk.toDF("b", "band_id", "band_val")
    val joinVolume = l.join(r, Seq("band_id", "band_val"))
      .where(col("a") < col("b")).count()
    assert(fromBuckets === joinVolume)
    assert(joinVolume > 0L) // the planted clusters guarantee collisions
  }

  test("auto variant: empty and all-null inputs yield empty output, not a crash") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.ops.Dedup.embeddingLshPairsAuto(
      empty, "vec_id", "embedding").count() === 0L)
    val nulls = Seq((1L, null: Array[Float]), (2L, null: Array[Float]))
      .toDF("vec_id", "embedding")
    assert(graft.ops.Dedup.embeddingLshPairsAuto(
      nulls, "vec_id", "embedding").count() === 0L)
  }
}
