package graft

import org.apache.spark.sql.Row

/** DuckDB-dialect functions and statement forms the reference's test files
  * use: `len` (string AND list), `list_sum`, `setseed`, empty `OVER ()`
  * window specs, `PRAGMA disable_optimizer`/`enable_optimizer`, and
  * `pragma_hnsw_index_info()` as a FROM source inside arbitrary queries. */
class DuckDialectSpec extends GraftSparkSpec {

  graft.plans.GraftExtensions.install(spark)

  private def one(sql: String): Row = GraftSql.sql(spark, sql).head()

  test("len: strings, lists, NULL (reference hnsw_join_macro.test:29)") {
    val r = one("SELECT len('abc'), len(array(1,2,3)), len(NULL), " +
      "len(array())")
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(r.isNullAt(2))
    assert(r.getLong(3) == 0)
  }

  test("list_sum: int→BIGINT, float/double/decimal→DOUBLE, NULL elements " +
      "skipped, empty/all-NULL → NULL (reference hnsw_topk.test:21)") {
    val r = one("SELECT list_sum(array(1,2,3)), " +
      "list_sum(array(1.5D, NULL, 2.5D)), " +
      "list_sum(array(1.0, 2.0)), " +
      "list_sum(cast(array() AS array<int>)), " +
      "list_sum(cast(array(NULL) AS array<double>)), " +
      "list_sum(flatten(array(array(1f,2f), array(3f))))")
    assert(r.getLong(0) == 6L)
    assert(r.getDouble(1) == 4.0)
    assert(r.getDouble(2) == 3.0)
    assert(r.isNullAt(3) && r.isNullAt(4))
    assert(r.getDouble(5) == 6.0)
  }

  test("the reference hnsw_topk.test aggregate shape: " +
      "list_sum(flatten(min_by(vec, dist, k)))") {
    GraftSql.sql(spark, "DROP TABLE IF EXISTS dia_t1")
    try {
      GraftSql.sql(spark, "CREATE TABLE dia_t1 (vec FLOAT[3])")
      GraftSql.sql(spark, "INSERT INTO dia_t1 SELECT array_value(a,b,c) " +
        "FROM range(1,10) ra(a), range(1,10) rb(b), range(1,10) rc(c)")
      // the reference probes [5,5,5], whose top-3 has six tied candidates
      // at distance 1 — its 45..50 band encodes ITS engine's tie pick. An
      // off-grid probe makes the top-3 unique: nearest to [1.4,2.3,3.1]
      // are (1,2,3), (2,2,3), (1,3,3) → sum 20, engine-independent.
      val r = one("SELECT list_sum(flatten(min_by(vec, " +
        "array_distance(vec, [1.4,2.3,3.1]::FLOAT[3]), 3))) AS s FROM dia_t1")
      assert(r.getDouble(0) == 20.0)
    } finally {
      GraftSql.sql(spark, "DROP TABLE IF EXISTS dia_t1")
      ()
    }
  }

  test("setseed is an accepted no-op (returns NULL, like DuckDB's void)") {
    assert(one("SELECT setseed(0.1337)").isNullAt(0))
  }

  test("empty OVER () gets an arbitrary-order key; aggregates over () " +
      "still span the whole partition") {
    val rns = GraftSql.sql(spark,
      "SELECT row_number() OVER () AS rn FROM range(5)")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(rns == (1 to 5))
    val sums = GraftSql.sql(spark,
      "SELECT sum(id) OVER () AS s FROM range(5)")
      .collect().map(_.getLong(0)).toSeq
    assert(sums == Seq.fill(5)(10L))
    // string literals are never rewritten
    assert(one("SELECT 'over ()'").getString(0) == "over ()")
  }

  test("PRAGMA disable_optimizer gates the cosine rewrite off; " +
      "enable_optimizer restores it (reference hnsw_rewrite.test)") {
    GraftSql.sql(spark, "DROP TABLE IF EXISTS dia_t2")
    try {
      GraftSql.sql(spark, "CREATE TABLE dia_t2 (v FLOAT[3])")
      GraftSql.sql(spark, "INSERT INTO dia_t2 VALUES ([0.8, 0.8, 0.8])")
      def plan(): String = GraftSql.sql(spark,
        "SELECT 1.0 - array_cosine_similarity(v, [0.2,0.2,0.2]::FLOAT[3]) " +
          "FROM dia_t2").queryExecution.executedPlan.toString
      assert(plan().contains("array_cosine_distance"), plan())
      GraftSql.sql(spark, "PRAGMA disable_optimizer")
      assert(plan().contains("array_cosine_similarity"), plan())
      // the answer is identical either way (the reference's labeled
      // rowsort RES differential)
      GraftSql.sql(spark, "PRAGMA enable_optimizer")
      assert(plan().contains("array_cosine_distance"), plan())
    } finally {
      GraftSql.sql(spark, "PRAGMA enable_optimizer")
      GraftSql.sql(spark, "DROP TABLE IF EXISTS dia_t2")
      ()
    }
  }

  test("the reference's correlated-ORDER-BY lateral spelling analyzes " +
      "(PushCorrelatedSortKeys) AND index-accelerates (sort-below-window " +
      "decorrelation shape → HnswKnnJoin), reference hnsw_lateral_join.test:19") {
    import graft.index.IndexCatalog
    spark.sql("DROP TABLE IF EXISTS dia_a"); spark.sql("DROP TABLE IF EXISTS dia_b")
    try {
      GraftSql.sql(spark, "CREATE TABLE dia_a (a_vec FLOAT[3], a_id INT)")
      GraftSql.sql(spark, "CREATE TABLE dia_b (b_vec FLOAT[3], b_str VARCHAR)")
      GraftSql.sql(spark,
        "INSERT INTO dia_a VALUES (ARRAY[1.0, 2.0, 3.0], 1), (ARRAY[4.0, 5.0, 6.0], 2)")
      GraftSql.sql(spark,
        "INSERT INTO dia_b VALUES (ARRAY[4.0, 5.0, 6.0], 'b'), (ARRAY[1.0, 2.0, 3.0], 'a')")
      val sql = "select * from dia_a, lateral (select *, a_id as id_dup " +
        "from dia_b order by array_distance(dia_a.a_vec, b_vec) limit 1)"
      def rows() = GraftSql.sql(spark, sql).collect()
        .map(r => (r.getInt(1), r.getString(3))).sorted.toSeq
      val brute = rows()
      assert(brute == Seq((1, "a"), (2, "b")))
      GraftSql.sql(spark, "CREATE INDEX dia_b_idx ON dia_b USING HNSW (b_vec)")
      val viaIdx = GraftSql.sql(spark, sql)
      assert(viaIdx.queryExecution.executedPlan.toString.contains("HnswKnnJoin"),
        viaIdx.queryExecution.executedPlan.toString.take(3000))
      assert(viaIdx.collect().map(r => (r.getInt(1), r.getString(3))).sorted.toSeq
        == brute)
    } finally {
      graft.index.IndexCatalog.dropIndex("dia_b_idx")
      Graft.dropTable(spark, "dia_b")
      spark.sql("DROP TABLE IF EXISTS dia_a"); spark.sql("DROP TABLE IF EXISTS dia_b")
      ()
    }
  }

  test("list() keeps NULL elements (DuckDB semantics; collect_list would " +
      "drop them) and DISTINCT treats NULLs as equal") {
    val r = one("SELECT list(x) AS l FROM " +
      "(SELECT * FROM VALUES (1),(NULL),(2) AS v(x) ORDER BY x NULLS FIRST)")
    val l = r.getSeq[Any](0)
    assert(l.size == 3, s"NULL element must survive: $l")
    assert(l.count(_ == null) == 1)
    assert(l.filter(_ != null).toSet == Set(1, 2))
    val d = one("SELECT list(DISTINCT x) AS l FROM " +
      "VALUES (1),(NULL),(1),(NULL) AS v(x)").getSeq[Any](0)
    assert(d.size == 2 && d.count(_ == null) == 1, s"DISTINCT over NULLs: $d")
  }

  test("list(x ORDER BY k): NULL keys sort LAST (DuckDB default_null_order), " +
      "not first as Spark's struct compare would") {
    val l = one("SELECT list(x ORDER BY k) AS l FROM VALUES " +
      "(10, 2), (20, CAST(NULL AS INT)), (30, 1) AS v(x, k)").getSeq[Int](0)
    assert(l == Seq(30, 10, 20), s"NULL-key element must come last: $l")
  }

  test("pragma_hnsw_index_info() as a FROM source in an arbitrary query " +
      "(reference hnsw_insert.test:19)") {
    // no HNSW index registered under this name → projecting count over the
    // info table yields the live index rows (possibly none); the statement
    // must parse and run through the temp-view splice
    val n = GraftSql.sql(spark,
      "SELECT count FROM pragma_hnsw_index_info()").count()
    assert(n >= 0)
  }
}
