package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.functions.vector
import graft.index.IndexCatalog
import graft.plans.GraftExtensions

/** Randomized differential testing of the optimizer rewrites — the
  * reference's with/without-index oracle strategy
  * (test/sql/hnsw/hnsw_lateral_join.test:36-43) under seeded random
  * parameters: for every (metric, k, filter) combination the index-rewritten
  * plan must return exactly the brute-force rows (ef exhaustive). */
class RuleDifferentialSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val dim = 12
  private val n = 400

  private def vecOf(i: Int): Array[Float] = {
    val a = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      val h = (i * 2654435761L + j * 40503L + 7L) * 1103515245L
      a(j) = ((h >>> 17) % 1000L).toFloat / 50f - 10f
      j += 1
    }
    a
  }

  override def beforeAll(): Unit = {
    GraftExtensions.install(spark)
    IndexCatalog.clear()
    val rows = (0 until n).map { i =>
      // sprinkle NULL vectors: every 17th row
      val v = if (i % 17 == 0) None else Some(vecOf(i).toSeq)
      (i.toLong, v, i % 5)
    }
    val df = rows.toDF("id", "vec", "label")
      .select($"id", $"vec".cast("array<float>"), $"label")
    Graft.registerTable(spark, "diff_t", df)
    Seq("l2sq", "cosine", "ip").foreach { m =>
      IndexCatalog.createIndex(spark, s"diff_$m", "diff_t", "vec",
        Map("metric" -> m, "ef_search" -> "5000"))
    }
  }

  private def distCol(metric: String) = metric match {
    case "l2sq" => vector.array_distance_sq _
    case "cosine" => vector.array_cosine_distance _
    case "ip" => vector.array_negative_inner_product _
  }

  test("TopN rewrite: random metric/k/filter trials match brute force exactly") {
    val rnd = new scala.util.Random(1234)
    (0 until 12).foreach { trial =>
      val metric = Seq("l2sq", "cosine", "ip")(rnd.nextInt(3))
      val k = 1 + rnd.nextInt(25)
      val q = vecOf(100000 + trial)
      val withLabelFilter = rnd.nextBoolean()
      def base: DataFrame = {
        val t = spark.table("diff_t")
        val f = if (withLabelFilter) t.filter($"label" < 3) else t
        f.withColumn("dist", distCol(metric)($"vec", lit(q)))
          .orderBy($"dist".asc_nulls_last, $"id").limit(k)
      }
      // index present → the single-key variant rewrites; verify against the
      // two-key deterministic ordering which never rewrites
      val viaIndex = spark.table("diff_t")
        .filter(if (withLabelFilter) $"label" < 3 else lit(true))
        .withColumn("dist", distCol(metric)($"vec", lit(q)))
        .orderBy($"dist".asc_nulls_last).limit(k)
        .select($"id", $"dist").collect().map(r => (r.getLong(0), r.getDouble(1)))
      val brute = base.select($"id", $"dist").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      if (withLabelFilter) {
        // reference filter-pull-up semantics: k candidates first, THEN the
        // filter — possibly short, but always a subset of the brute top-k
        // (reference src/hnsw/hnsw_optimize_scan.cpp:161-187)
        assert(viaIndex.toSet.subsetOf(brute.toSet),
          s"trial $trial metric=$metric k=$k filtered")
      } else {
        assert(viaIndex.toSet == brute.toSet,
          s"trial $trial metric=$metric k=$k unfiltered")
      }
    }
  }

  test("correlated-ORDER-BY lateral (the sort-below-window decorrelation " +
      "shape, outer column projected inside): with/without-index " +
      "differential, NULL probes included") {
    // the reference's own lateral spelling (hnsw_lateral_join.test:19):
    // raw correlated distance in ORDER BY + an outer column projected in
    // the subquery — Spark lowers this to a no-order row_number window
    // over a global Sort, the second matcher in KnnJoinToIndexJoin. The
    // outer slice includes NULL-vector probes (every 17th id), exercising
    // the IS NULL scan branch the rewrite unions in.
    val sql =
      """SELECT t.id AS qid, l.id AS nid, l.d AS d
        |FROM diff_t t, LATERAL (
        |  SELECT d2.id AS id, array_distance_sq(t.vec, d2.vec) AS d,
        |         t.label AS lbl_dup
        |  FROM diff_t d2
        |  ORDER BY array_distance_sq(t.vec, d2.vec) LIMIT 3
        |) l
        |WHERE t.id < 40""".stripMargin
    def rows() = GraftSql.sql(spark, sql).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    def grouped(rs: Array[(Long, Option[Double])]) =
      rs.groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_.getOrElse(-1.0))
        .toSeq).toMap
    val viaIdxDf = GraftSql.sql(spark, sql)
    assert(viaIdxDf.queryExecution.executedPlan.toString.contains("HnswKnnJoin"),
      "the differential must actually be differential: index path not taken\n" +
        viaIdxDf.queryExecution.executedPlan.toString.take(2000))
    val viaIdx = rows()
    IndexCatalog.dropIndex("diff_l2sq")
    try {
      val brute = rows()
      // every probe (NULL-vector ones included) keeps its k rows; per-qid
      // distance multisets agree (tie ids may differ)
      assert(grouped(viaIdx) == grouped(brute))
      val nullQids = viaIdx.filter(_._2.isEmpty).map(_._1).toSet
      assert(nullQids == (0L until 40L).filter(_ % 17 == 0).toSet,
        "NULL probes must survive the index rewrite with all-NULL distances")
    } finally {
      IndexCatalog.createIndex(spark, "diff_l2sq", "diff_t", "vec",
        Map("metric" -> "l2sq", "ef_search" -> "5000"))
    }
  }

  test("lateral decorrelation shapes: randomized with/without-index " +
      "differential over (shape, metric, k, NULL probes, projected outer " +
      "columns, sort direction)") {
    // Both decorrelation forms Spark produces for the reference's lateral
    // kNN spelling (hnsw_lateral_join.test:32-67), generated randomly:
    //  - projecting outer columns inside the subquery yields the
    //    sort-below-window shape (Sort below a no-order row_number Window),
    //  - projecting none yields the window-order shape (row_number Window
    //    ordered by the correlated distance).
    // Each trial runs the SAME SQL with the index present and absent and
    // compares per-probe distance multisets; DESC trials must NOT rewrite
    // (farthest-k is not a kNN scan) but must still agree with brute force.
    val rnd = new scala.util.Random(20260814)
    val metrics = Seq(
      ("l2sq", "array_distance_sq"),
      ("cosine", "array_cosine_distance"))
    (0 until 10).foreach { trial =>
      val (metric, fn) = metrics(rnd.nextInt(metrics.size))
      val k = 1 + rnd.nextInt(8)
      val m = 20 + rnd.nextInt(40) // outer slice size
      val desc = trial % 3 == 2 // every third trial: DESC, must not match
      val nOuterCols = rnd.nextInt(3) // 0 → window-order shape
      val includeNullProbes = rnd.nextBoolean()
      val outerProj = Seq("t.label AS lbl_dup", "t.id AS id_dup")
        .take(nOuterCols)
      val innerCols =
        (Seq(s"d2.id AS id", s"$fn(t.vec, d2.vec) AS d") ++ outerProj)
          .mkString(", ")
      val dir = if (desc) " DESC" else ""
      val nullPred = if (includeNullProbes) "" else " AND t.vec IS NOT NULL"
      val sql =
        s"""SELECT t.id AS qid, l.d AS d
           |FROM diff_t t, LATERAL (
           |  SELECT $innerCols FROM diff_t d2
           |  ORDER BY $fn(t.vec, d2.vec)$dir LIMIT $k
           |) l
           |WHERE t.id < $m$nullPred""".stripMargin
      val ctx = s"trial $trial shape=${if (nOuterCols == 0) "window-order"
        else "sort-below-window"} metric=$metric k=$k m=$m desc=$desc " +
        s"nullProbes=$includeNullProbes"
      def rows() = GraftSql.sql(spark, sql).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      def grouped(rs: Array[(Long, Option[Double])]) =
        rs.groupBy(_._1).view
          .mapValues(_.map(_._2).sortBy(_.getOrElse(-1.0)).toSeq).toMap
      val plan = GraftSql.sql(spark, sql)
        .queryExecution.executedPlan.toString
      if (desc)
        assert(!plan.contains("HnswKnnJoin"),
          s"$ctx: DESC (farthest-k) must NOT take the index join\n" +
            plan.take(2000))
      else
        assert(plan.contains("HnswKnnJoin"),
          s"$ctx: index join not taken\n" + plan.take(2000))
      val viaIdx = rows()
      IndexCatalog.dropIndex(s"diff_$metric")
      try {
        val brute = rows()
        assert(grouped(viaIdx) == grouped(brute), ctx)
        if (includeNullProbes && !desc) {
          val nullQids = viaIdx.filter(_._2.isEmpty).map(_._1).toSet
          assert(nullQids == (0L until m.toLong).filter(_ % 17 == 0).toSet,
            s"$ctx: NULL probes must survive the rewrite with all-NULL " +
              "distances")
        }
      } finally {
        IndexCatalog.createIndex(spark, s"diff_$metric", "diff_t", "vec",
          Map("metric" -> metric, "ef_search" -> "5000"))
      }
    }
  }

  test("KNN-join rewrite: random k trials match the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(99)
    (0 until 4).foreach { trial =>
      val k = 1 + rnd.nextInt(6)
      val outer = spark.table("diff_t")
        .filter($"id" < 12 && $"vec".isNotNull)
        .select($"id".as("qid"), $"vec".as("qvec"))
      // NULLS LAST: NULL inner vectors must not occupy top ranks (the rule
      // refuses to rewrite the NULLS FIRST form for exactly that reason)
      def windowed: DataFrame = outer.crossJoin(spark.table("diff_t"))
        .withColumn("d", vector.array_distance_sq($"qvec", $"vec"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"qid").orderBy($"d".asc_nulls_last)))
        .filter($"rn" <= k)
        .select($"qid", $"id", $"d")
      val withIdx = windowed.collect().map(r => (r.getLong(0), r.getDouble(2)))
      IndexCatalog.dropIndex("diff_l2sq")
      try {
        val brute = windowed.collect().map(r => (r.getLong(0), r.getDouble(2)))
        // per-qid distance multisets must agree (tie ids may differ)
        assert(withIdx.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap ==
          brute.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap,
          s"trial $trial k=$k")
      } finally {
        IndexCatalog.createIndex(spark, "diff_l2sq", "diff_t", "vec",
          Map("metric" -> "l2sq", "ef_search" -> "5000"))
      }
    }
  }
}
