package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.index.IvfIndex

class IvfIndexSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  override def beforeAll(): Unit = {
    IvfIndex.clear()
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .createOrReplaceTempView("ivf_emb")
    IvfIndex.create(spark, "ivf1", "ivf_emb", "embedding", nLists = 8)
  }

  private def queryVec(id: Int): Array[Float] =
    spark.table("ivf_emb").filter($"vec_id" === id)
      .select($"embedding").head().getSeq[Float](0).toArray

  test("nProbe = nLists is exact (matches brute force)") {
    val q = queryVec(3)
    val brute = spark.table("ivf_emb")
      .withColumn("dist", graft.functions.vector.array_distance_sq($"embedding", lit(q)))
      .orderBy($"dist", $"vec_id").limit(10).select($"vec_id").as[Long].collect()
    val viaIvf = IvfIndex.search(spark, "ivf1", q, 10, nProbe = 8)
      .orderBy($"dist", $"vec_id").select($"vec_id").as[Long].collect()
    assert(viaIvf.toSeq == brute.toSeq)
  }

  test("probing fewer lists prunes partitions at the scan (PartitionFilters)") {
    val q = queryVec(7)
    val df = IvfIndex.search(spark, "ivf1", q, 5, nProbe = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains(IvfIndex.ListCol), plan)
    // the probed scan reads a strict subset of the lists
    val scanned = spark.read.parquet(IvfIndex.get("ivf1").get.path)
      .where(col(IvfIndex.ListCol).isin(
        IvfIndex.probeLists(IvfIndex.get("ivf1").get, q, 2): _*)).count()
    val total = spark.read.parquet(IvfIndex.get("ivf1").get.path).count()
    assert(scanned < total && scanned > 0)
  }

  test("radiusSearch == brute force; covering-radius pruning is lossless") {
    val q = queryVec(3)
    // r at roughly the 15th neighbor: small enough that some covering
    // balls must miss the query ball
    val r = spark.table("ivf_emb")
      .withColumn("dist", graft.functions.vector.array_distance_sq($"embedding", lit(q)))
      .orderBy($"dist").limit(15).agg(max($"dist")).head().getDouble(0)
    val got = IvfIndex.radiusSearch(spark, "ivf1", q, r)
      .select($"vec_id", $"dist").orderBy($"vec_id").as[(Long, Double)].collect().toSeq
    val want = spark.table("ivf_emb")
      .withColumn("dist", graft.functions.vector.array_distance_sq($"embedding", lit(q)))
      .where($"dist" <= r)
      .select($"vec_id", $"dist").orderBy($"vec_id").as[(Long, Double)].collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("radiusSearch prunes lists whose covering ball misses the query ball") {
    // two well-separated clusters: the far cluster's covering ball cannot
    // intersect a small query ball around the near cluster (uniform
    // high-dim fixtures concentrate distances, so separation must be
    // constructed to observe pruning deterministically)
    val near = (0 until 20).map(i => (i.toLong, Array.fill(8)(0f).updated(0, i / 100f)))
    val far = (20 until 40).map(i => (i.toLong, Array.fill(8)(100f).updated(0, 100f + i / 100f)))
    (near ++ far).toDF("vec_id", "embedding")
      .createOrReplaceTempView("ivf_two_clusters")
    IvfIndex.drop("ivf_sep")
    IvfIndex.create(spark, "ivf_sep", "ivf_two_clusters", "embedding", nLists = 2)
    val entry = IvfIndex.get("ivf_sep").get
    assert(entry.listRadii.size == 2)
    val q = Array.fill(8)(0f)
    val d = graft.index.DistanceKernels.forMetric(entry.metric)
    val pruned = entry.centroids.indices.count { i =>
      val cover = entry.listRadii.getOrElse(i, 0.0)
      math.sqrt(d(q, entry.centroids(i))) > math.sqrt(1.0) + math.sqrt(cover)
    }
    assert(pruned == 1, s"expected exactly 1 of 2 lists pruned, got $pruned")
    // pruning is lossless: the near cluster's 20 points, nothing else
    val got = IvfIndex.radiusSearch(spark, "ivf_sep", q, 1.0)
      .select($"vec_id").as[Long].collect().toSet
    assert(got == (0L until 20L).toSet)
  }

  test("append: search and radius search equal a fresh build over the union") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.where($"vec_id" % 2 === 0).createOrReplaceTempView("ivf_app_seed")
    IvfIndex.drop("ivf_app")
    IvfIndex.create(spark, "ivf_app", "ivf_app_seed", "embedding", nLists = 4)
    IvfIndex.append(spark, "ivf_app", emb.where($"vec_id" % 2 === 1))
    val q = queryVec(3)
    val brute = emb
      .withColumn("dist", graft.functions.vector.array_distance_sq($"embedding", lit(q)))
    val wantTop = brute.orderBy($"dist", $"vec_id").limit(10)
      .select($"vec_id").as[Long].collect().toSeq
    val gotTop = IvfIndex.search(spark, "ivf_app", q, 10, nProbe = 4,
        tieBreak = Seq("vec_id"))
      .orderBy($"dist", $"vec_id").select($"vec_id").as[Long].collect().toSeq
    assert(gotTop == wantTop)
    // appended rows participate in radius pruning losslessly (radii merged)
    val r = brute.orderBy($"dist").limit(12).agg(max($"dist")).head().getDouble(0)
    val gotR = IvfIndex.radiusSearch(spark, "ivf_app", q, r)
      .select($"vec_id").as[Long].collect().toSet
    val wantR = brute.where($"dist" <= r).select($"vec_id").as[Long].collect().toSet
    assert(gotR == wantR && gotR.exists(_ % 2 == 1))
  }

  test("radiusSearch with an impossible radius returns empty") {
    assert(IvfIndex.radiusSearch(spark, "ivf1", queryVec(3), 1e-9).count() <= 1)
  }

  test("nProbe = 2 recall@10 is reasonable; top-1 in-probe hit is exact") {
    var hits = 0
    (0 until 20).foreach { qi =>
      val q = queryVec(qi * 7 % 100)
      val brute = spark.table("ivf_emb")
        .withColumn("dist", graft.functions.vector.array_distance_sq($"embedding", lit(q)))
        .orderBy($"dist", $"vec_id").limit(10).select($"vec_id").as[Long].collect().toSet
      val approx = IvfIndex.search(spark, "ivf1", q, 10, nProbe = 2)
        .select($"vec_id").as[Long].collect().toSet
      hits += brute.intersect(approx).size
    }
    // synthetic embeddings are unclustered, so 2/8 probes ≈ probability mass
    // of the probed lists; assert clearly-better-than-random, not clustered-
    // data recall
    assert(hits >= 80, s"recall@10 over 20 queries was $hits/200")
  }

  test("training is deterministic for a fixed seed") {
    val c1 = IvfIndex.train(spark.table("ivf_emb"), "embedding", 4, "l2sq", seed = 7L)
    val c2 = IvfIndex.train(spark.table("ivf_emb"), "embedding", 4, "l2sq", seed = 7L)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("duplicate name errors; drop clears") {
    val e = intercept[IllegalArgumentException] {
      IvfIndex.create(spark, "ivf1", "ivf_emb", "embedding", nLists = 4)
    }
    assert(e.getMessage.contains("already exists"))
    assert(IvfIndex.drop("ivf1"))
    assert(IvfIndex.get("ivf1").isEmpty)
    IvfIndex.create(spark, "ivf1", "ivf_emb", "embedding", nLists = 8)
  }
}
