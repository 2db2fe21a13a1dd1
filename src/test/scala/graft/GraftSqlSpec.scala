package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import graft.index.IndexCatalog
import graft.plans.GraftExtensions

/** The string-DDL surface the reference registers through DuckDB's parser
  * (CREATE INDEX ... USING HNSW, DROP INDEX, pragmas — reference
  * src/hnsw/hnsw_index.cpp:667-691, test/sql/hnsw/hnsw_options.test). */
class GraftSqlSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  override def beforeAll(): Unit = {
    GraftExtensions.install(spark)
    IndexCatalog.clear()
    Graft.registerTable(spark, "sql_emb",
      spark.read.parquet(s"$sfDir/embeddings.parquet"))
  }

  test("CREATE INDEX ... USING HNSW with options, then index-accelerated SQL") {
    GraftSql.sql(spark,
      "CREATE INDEX sql_idx ON sql_emb USING HNSW (embedding) WITH (metric = 'l2sq', ef_search = 600)")
    val e = IndexCatalog.get("sql_idx").get
    assert(e.table == "sql_emb" && e.options.efSearch == 600)

    val q = spark.table("sql_emb").filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0)
    val vecLit = q.mkString("array(", "F,", "F)")
    val df = GraftSql.sql(spark,
      s"SELECT vec_id FROM sql_emb ORDER BY array_distance_sq(embedding, $vecLit) NULLS LAST LIMIT 5")
    assert(df.queryExecution.executedPlan.toString.contains("HnswIndexScan"))
    assert(df.collect().head.getLong(0) == 0L)
  }

  test("WITH option validation keeps the reference error wording") {
    val err = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "CREATE INDEX bad ON sql_emb USING HNSW (embedding) WITH (metric = 'taxicab')")
    }
    assert(err.getMessage.contains("Unknown metric kind: taxicab"))
  }

  test("pragma_hnsw_index_info and PRAGMA hnsw_compact_index") {
    val info = GraftSql.sql(spark, "SELECT * FROM pragma_hnsw_index_info()")
    assert(info.filter($"index_name" === "sql_idx").count() == 1)
    GraftSql.sql(spark, "PRAGMA hnsw_compact_index('sql_idx')")
    assert(IndexCatalog.get("sql_idx").get.index.deletedCount == 0)
  }

  test("vss_join table-macro invocation form (hnsw_join_macro.test shape)") {
    spark.table("sql_emb").filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      .createOrReplaceTempView("sql_q")
    val out = GraftSql.sql(spark,
      "SELECT * FROM vss_join('sql_q', 'sql_emb', qvec, embedding, 2)")
    assert(out.columns.toSeq == Seq("score", "left_tbl", "right_tbl", "rank"))
    val rows = out.orderBy($"left_tbl.qid", $"rank").collect()
    assert(rows.length == 6)
    assert(rows.head.getDouble(0) == 0.0) // self-match, l2 distance 0
    val cos = GraftSql.sql(spark,
      "SELECT * FROM vss_join('sql_q', 'sql_emb', qvec, embedding, 1, metric := 'cosine')")
    assert(cos.count() == 3)
    // general FROM form with a projection; alias AS-prefixed or bare
    // (reference hnsw_join_macro.test:24 uses `as res` — SQL allows bare)
    val asAlias = GraftSql.sql(spark,
      "SELECT bool_and(score >= 0.0) FROM vss_join(sql_q, sql_emb, qvec, embedding, 3) AS res")
    assert(asAlias.head().getBoolean(0)) // l2sq is non-negative
    val bareAlias = GraftSql.sql(spark,
      "SELECT count(*) AS n FROM vss_join(sql_q, sql_emb, qvec, embedding, 3) res")
    assert(bareAlias.head().getLong(0) == 9)
    // a clause keyword after the call is NOT an alias
    val noAlias = GraftSql.sql(spark,
      "SELECT count(*) AS n FROM vss_join(sql_q, sql_emb, qvec, embedding, 3) WHERE rank = 1")
    assert(noAlias.head().getLong(0) == 3)
  }

  test("vss_match correlated macro invocation form (hnsw_join_macro.test:27)") {
    spark.table("sql_emb").filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("s_vec"))
      .createOrReplaceTempView("sql_s")
    // the reference's own invocation: SELECT len(matches) = 3 FROM s,
    // vss_match(t1, s_vec, vec, 3) as res — size() is Spark's len()
    val lens = GraftSql.sql(spark,
      "SELECT size(matches) = 3 FROM sql_s, vss_match(sql_emb, s_vec, embedding, 3) as res")
      .collect()
    assert(lens.length == 3 && lens.forall(_.getBoolean(0)))
    // outer columns survive beside `matches`; best match of each row is itself
    val out = GraftSql.sql(spark,
      "SELECT qid, matches[0].row.vec_id AS best, matches[0].score AS s " +
        "FROM sql_s, vss_match('sql_emb', s_vec, embedding, 2) ORDER BY qid")
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 0L), (1L, 1L), (2L, 2L)))
    assert(out.forall(_.getDouble(2) == 0.0)) // l2 self-distance
    // cosine metric keeps the k LARGEST scores (reference macro contract)
    val cos = GraftSql.sql(spark,
      "SELECT qid, matches[0].score AS s FROM sql_s, " +
        "vss_match(sql_emb, s_vec, embedding, 1, metric := 'cosine') ORDER BY qid")
      .collect()
    assert(cos.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-6)) // self-similarity
  }

  test("SET / RESET hnsw_ef_search maps onto the session ef knob " +
      "(reference hnsw_index.cpp:285-299)") {
    GraftSql.sql(spark, "SET hnsw_ef_search = 123")
    assert(spark.conf.get(IndexCatalog.EfSearchConfKey) == "123")
    val entry = IndexCatalog.list.headOption
    entry.foreach(e => assert(IndexCatalog.effectiveEf(spark, e) == 123))
    GraftSql.sql(spark, "RESET hnsw_ef_search")
    assert(spark.conf.getOption(IndexCatalog.EfSearchConfKey).isEmpty)
  }

  test("every SparkEntry query has a matching oracle entry") {
    // q79-q82 are the true-ANN graph-mode bench entries (single-graph and
    // 16-shard fan-out) and q86/q87 the graph-ef scale twins of q28/q65:
    // approximate by design, so deliberately oracle-less (driver rows-only
    // check; per-run recall gates instead)
    val oracleLess = Set("q79_graph_topk", "q80_graph_knn_join",
      "q81_sharded_graph_topk", "q82_sharded_graph_knn_join",
      "q86_neardup_ann", "q87_outliers_ann")
    assert(SparkEntry.queries.keySet -- oracleLess == SparkEntry.oracleSql.keySet)
    assert(oracleLess.subsetOf(SparkEntry.queries.keySet))
  }

  test("DROP INDEX removes the entry; dropping twice errors") {
    GraftSql.sql(spark, "DROP INDEX sql_idx")
    assert(IndexCatalog.get("sql_idx").isEmpty)
    intercept[IllegalArgumentException](GraftSql.sql(spark, "DROP INDEX sql_idx"))
  }

  test("CHECKPOINT 'dir' goes through the persistence gate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlckpt").toString
    // empty catalog: DuckDB's core CHECKPOINT succeeds, no vss gate involved
    spark.conf.unset(IndexCatalog.PersistenceConfKey)
    GraftSql.sql(spark, s"CHECKPOINT '$dir'")
    // with an HNSW index present, persistence is gated
    GraftSql.sql(spark, "CREATE INDEX sql_idx2 ON sql_emb USING HNSW (embedding)")
    intercept[IllegalStateException](GraftSql.sql(spark, s"CHECKPOINT '$dir'"))
    spark.conf.set(IndexCatalog.PersistenceConfKey, "true")
    try {
      GraftSql.sql(spark, s"CHECKPOINT '$dir'")
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/catalog.manifest")))
      // DuckDB's bare CHECKPOINT form works too (default artifact dir);
      // point the artifact dir at a FRESH temp dir so a stale manifest from
      // an earlier run can't satisfy the assertion
      val freshRoot = java.nio.file.Files.createTempDirectory("graft-bareckpt").toString
      sys.props("graft.indexes.dir") = freshRoot
      try {
        GraftSql.sql(spark, "CHECKPOINT")
        assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
          s"$freshRoot/checkpoint/catalog.manifest")))
      } finally sys.props.remove("graft.indexes.dir")
    } finally spark.conf.unset(IndexCatalog.PersistenceConfKey)
  }

  test("the reference's own SET hnsw_enable_experimental_persistence " +
      "spelling opens and closes the gate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-refgate").toString
    GraftSql.sql(spark, "CREATE INDEX sql_idx3 ON sql_emb USING HNSW (embedding)")
    try {
      spark.conf.unset(IndexCatalog.PersistenceConfKey)
      intercept[IllegalStateException](GraftSql.sql(spark, s"CHECKPOINT '$dir'"))
      // reference test files open with exactly this statement
      GraftSql.sql(spark, "SET hnsw_enable_experimental_persistence = true;")
      GraftSql.sql(spark, s"CHECKPOINT '$dir'")
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/catalog.manifest")))
      GraftSql.sql(spark, "RESET hnsw_enable_experimental_persistence")
      intercept[IllegalStateException](GraftSql.sql(spark, s"CHECKPOINT '$dir'"))
    } finally {
      spark.conf.unset(IndexCatalog.PersistenceConfKey)
      GraftSql.sql(spark, "DROP INDEX sql_idx3")
      ()
    }
  }

  test("reference hnsw_crud.test statement flow runs verbatim " +
      "(CREATE TABLE / INSERT / CREATE INDEX / CHECKPOINT / INSERT / DELETE)") {
    val freshRoot = java.nio.file.Files.createTempDirectory("graft-crud").toString
    sys.props("graft.indexes.dir") = freshRoot
    try {
      spark.sql("DROP TABLE IF EXISTS t1")
      // reference test/sql/hnsw/hnsw_crud.test, statement for statement
      GraftSql.sql(spark, "SET hnsw_enable_experimental_persistence = true;")
      GraftSql.sql(spark, "CREATE TABLE t1 (vec FLOAT[3]);")
      GraftSql.sql(spark, "INSERT INTO t1 VALUES (array[1.0, 2.0, 3.0]);")
      GraftSql.sql(spark, "CREATE INDEX my_idx ON t1 USING HNSW (vec);")
      GraftSql.sql(spark, "CHECKPOINT;")
      GraftSql.sql(spark, "INSERT INTO t1 VALUES (array[5.0, 5.0, 5.0]);")
      GraftSql.sql(spark, "DELETE FROM t1 WHERE vec = array[1.0, 2.0, 3.0];")
      val rows = GraftSql.sql(spark, "SELECT * FROM t1;").collect()
      assert(rows.map(_.getSeq[Float](0)).toSeq == Seq(Seq(5f, 5f, 5f)),
        "post-DML table must hold exactly the surviving row")
      assert(rows.head.length == 1,
        "star expansion must hide the engine's materialized rowid")
      val knn = GraftSql.sql(spark,
        "SELECT * FROM t1 ORDER BY array_distance(vec, [1,2,3]::FLOAT[3]) LIMIT 3;")
        .collect()
      assert(knn.map(_.getSeq[Float](0)).toSeq == Seq(Seq(5f, 5f, 5f)),
        "KNN over the index must see the insert and not the deleted row")
      GraftSql.sql(spark, "PRAGMA hnsw_compact_index('my_idx');")
      val after = GraftSql.sql(spark,
        "SELECT * FROM t1 ORDER BY array_distance(vec, [1,2,3]::FLOAT[3]) LIMIT 3;")
        .collect()
      assert(after.map(_.getSeq[Float](0)).toSeq == Seq(Seq(5f, 5f, 5f)))
    } finally {
      sys.props.remove("graft.indexes.dir")
      spark.conf.unset(IndexCatalog.PersistenceConfKey)
      IndexCatalog.dropIndex("my_idx")
      Graft.dropTable(spark, "t1")
      spark.sql("DROP TABLE IF EXISTS t1")
      ()
    }
  }

  test("reference hnsw_lateral_join_group.test flow: scan and grouped " +
      "list(nbr ORDER BY dist, nbr) lateral KNN — identical without and " +
      "with the index (labeled differential)") {
    val freshRoot = java.nio.file.Files.createTempDirectory("graft-latg").toString
    sys.props("graft.indexes.dir") = freshRoot
    try {
      spark.sql("DROP TABLE IF EXISTS queries")
      spark.sql("DROP TABLE IF EXISTS items")
      // reference test/sql/hnsw/hnsw_lateral_join_group.test, statement
      // for statement — except items data: the reference seeds random();
      // here items' x-coordinate is i/1000 (strictly increasing), so both
      // query vectors' top-3 distances are distinct and the scan form's
      // ORDER BY dist LIMIT 3 is deterministic (item 499 nearest to both)
      GraftSql.sql(spark, "CREATE TABLE queries (id INT, embedding FLOAT[3]);")
      GraftSql.sql(spark, "INSERT INTO queries VALUES " +
        "(1, [5, 5, 5]::FLOAT[3]), (2, [42, 42, 42]::FLOAT[3]);")
      GraftSql.sql(spark, "CREATE TABLE items (id INT, embedding FLOAT[3]);")
      GraftSql.sql(spark, "INSERT INTO items SELECT i, " +
        "[cast(i AS FLOAT) / 1000.0, 0, 0]::FLOAT[3] " +
        "FROM range(1, 500) AS r(i);")
      val scanSql =
        """SELECT queries.id as id, nbr
          |FROM queries, LATERAL (
          |  SELECT items.id as nbr, array_distance(items.embedding, queries.embedding) as dist
          |  FROM items
          |  ORDER BY dist
          |  LIMIT 3
          |)""".stripMargin
      val groupSql =
        """SELECT queries.id as id, list(nbr ORDER BY dist, nbr)
          |FROM queries, LATERAL (
          |  SELECT items.id as nbr, array_distance(queries.embedding, items.embedding) as dist
          |  FROM items
          |  ORDER BY dist
          |  LIMIT 3
          |) GROUP BY id""".stripMargin
      def scanRows() = GraftSql.sql(spark, scanSql).collect()
        .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
      def groupRows() = GraftSql.sql(spark, groupSql).collect()
        .map(r => (r.getInt(0), r.getSeq[Int](1).toList)).sortBy(_._1).toSeq
      val expectScan =
        Seq((1, 497), (1, 498), (1, 499), (2, 497), (2, 498), (2, 499))
      val expectGroup =
        Seq((1, List(499, 498, 497)), (2, List(499, 498, 497)))
      assert(scanRows() == expectScan)
      assert(groupRows() == expectGroup)
      // "Now create an index on the items table" (reference line 47) —
      // the same two statements must return the same answers, with the
      // scan form's lateral now through the index join
      GraftSql.sql(spark,
        "CREATE INDEX items_embedding_idx ON items USING hnsw(embedding);")
      val viaIdx = GraftSql.sql(spark, scanSql)
      assert(viaIdx.queryExecution.executedPlan.toString
        .contains("HnswKnnJoin"),
        viaIdx.queryExecution.executedPlan.toString.take(4000))
      assert(viaIdx.collect()
        .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq == expectScan)
      assert(groupRows() == expectGroup)
    } finally {
      sys.props.remove("graft.indexes.dir")
      IndexCatalog.dropIndex("items_embedding_idx")
      Graft.dropTable(spark, "queries")
      Graft.dropTable(spark, "items")
      spark.sql("DROP TABLE IF EXISTS queries")
      spark.sql("DROP TABLE IF EXISTS items")
      ()
    }
  }

  test("reference hnsw_projection.test flow: every projection shape over " +
      "the index-backed TopN answers correctly") {
    val freshRoot = java.nio.file.Files.createTempDirectory("graft-proj").toString
    sys.props("graft.indexes.dir") = freshRoot
    try {
      spark.sql("DROP TABLE IF EXISTS embeddings")
      // reference test/sql/hnsw/hnsw_projection.test, statement for
      // statement (the reference asserts only `statement ok`; row content
      // checked here too — id=1 is exactly nearest to [1,2,3])
      GraftSql.sql(spark, "CREATE TABLE embeddings (id INT, vec FLOAT[3]);")
      GraftSql.sql(spark, "INSERT INTO embeddings SELECT 1, array_value(1,2,3);")
      GraftSql.sql(spark, "INSERT INTO embeddings SELECT 2, array_value(4,5,6);")
      GraftSql.sql(spark, "CREATE INDEX idx ON embeddings USING HNSW (vec);")
      val variants = Seq(
        "SELECT * FROM embeddings ORDER BY array_distance(vec, [1.0, 2.0, 3.0]::FLOAT[3]) LIMIT 1;"
          -> Seq("id", "vec"),
        "SELECT vec, id FROM embeddings ORDER BY array_distance(vec, [1.0, 2.0, 3.0]::FLOAT[3]) LIMIT 1;"
          -> Seq("vec", "id"),
        "SELECT id FROM embeddings ORDER BY array_distance(vec, [1.0, 2.0, 3.0]::FLOAT[3]) LIMIT 1;"
          -> Seq("id"),
        "SELECT id, vec FROM embeddings ORDER BY array_distance(vec, [1.0, 2.0, 3.0]::FLOAT[3]) LIMIT 1;"
          -> Seq("id", "vec"),
        "SELECT id, vec, array_distance(vec, [1.0, 2.0, 3.0]::FLOAT[3]) as dist FROM embeddings ORDER BY dist LIMIT 1;"
          -> Seq("id", "vec", "dist"),
        "SELECT array_distance(vec, [1.0, 2.0, 3.0]::FLOAT[3]) as dist, id FROM embeddings ORDER BY dist LIMIT 1;"
          -> Seq("dist", "id"))
      variants.foreach { case (stmt, cols) =>
        val df = GraftSql.sql(spark, stmt)
        assert(df.columns.toSeq == cols, stmt)
        val row = df.collect() match { case Array(r) => r }
        assert(row.getInt(row.fieldIndex("id")) == 1, stmt)
        if (cols.contains("dist"))
          assert(row.getDouble(row.fieldIndex("dist")) == 0.0, stmt)
      }
      // the projection shapes must not defeat the TopN rewrite: each runs
      // through the index scan
      variants.foreach { case (stmt, _) =>
        val plan = GraftSql.sql(spark, stmt).queryExecution.executedPlan.toString
        assert(plan.contains("HnswIndexScan"), stmt + "\n" + plan.take(4000))
      }
    } finally {
      sys.props.remove("graft.indexes.dir")
      IndexCatalog.dropIndex("idx")
      Graft.dropTable(spark, "embeddings")
      spark.sql("DROP TABLE IF EXISTS embeddings")
      ()
    }
  }

  test("DML routing: case-insensitive names, qualified DELETE predicates, " +
      "INSERT SELECT * over the hidden rowid") {
    val freshRoot = java.nio.file.Files.createTempDirectory("graft-crud2").toString
    sys.props("graft.indexes.dir") = freshRoot
    try {
      spark.sql("DROP TABLE IF EXISTS t2")
      GraftSql.sql(spark, "CREATE TABLE t2 (vec FLOAT[3]);")
      GraftSql.sql(spark, "INSERT INTO t2 VALUES (array[1.0, 2.0, 3.0]);")
      GraftSql.sql(spark, "CREATE INDEX t2_idx ON t2 USING HNSW (vec);")
      // INSERT ... SELECT * from the registered table itself: star
      // expansion includes the hidden rowid, which must be stripped before
      // positional assignment — and T2 routes case-insensitively
      GraftSql.sql(spark, "INSERT INTO T2 SELECT * FROM t2;")
      assert(GraftSql.sql(spark, "SELECT * FROM t2").count() == 2)
      // table-qualified predicate, case-insensitive target
      GraftSql.sql(spark, "DELETE FROM T2 WHERE t2.vec = array[1.0, 2.0, 3.0];")
      assert(GraftSql.sql(spark, "SELECT * FROM t2").count() == 0)
      // a '__rowid' string LITERAL is not an address — rowid stays hidden;
      // addressing it by name still works
      val lit = GraftSql.sql(spark, "SELECT * FROM t2 WHERE 'x' <> '__rowid'")
      assert(!lit.columns.contains(Graft.RowIdCol))
      assert(GraftSql.sql(spark, s"SELECT ${Graft.RowIdCol} FROM t2")
        .columns.contains(Graft.RowIdCol))
    } finally {
      sys.props.remove("graft.indexes.dir")
      IndexCatalog.dropIndex("t2_idx")
      Graft.dropTable(spark, "t2")
      spark.sql("DROP TABLE IF EXISTS t2")
      ()
    }
  }

  test("vss_match rewrite keeps the statement's alias and left-table qualifiers resolvable") {
    spark.table("sql_emb").filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("s_vec"))
      .createOrReplaceTempView("sql_s2")
    // alias-qualified column reference through the AS alias
    val viaAlias = GraftSql.sql(spark,
      "SELECT res.qid, size(res.matches) AS n " +
        "FROM sql_s2, vss_match(sql_emb, s_vec, embedding, 2) AS res ORDER BY res.qid")
      .collect()
    assert(viaAlias.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((0L, 2), (1L, 2), (2L, 2)))
    // left-table-qualified reference without an explicit alias
    val viaLeft = GraftSql.sql(spark,
      "SELECT sql_s2.qid FROM sql_s2, vss_match(sql_emb, s_vec, embedding, 1) " +
        "ORDER BY sql_s2.qid")
      .collect()
    assert(viaLeft.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
  }

  test("bm25_topk('t', ...) string form: brute force without an index, " +
      "term-index routed (and bit-identical) with one") {
    import graft.index.TermIndex
    spark.read.parquet(s"$sfDir/documents.parquet")
      .createOrReplaceTempView("sql_docs")
    val stmt = "SELECT * FROM bm25_topk('sql_docs', 'doc_id', 'text', 'spark join query', 15)"
    val brute = GraftSql.sql(spark, stmt).collect().toSeq
    assert(brute.size == 15)
    TermIndex.create(spark, "sql_docs_term", "sql_docs", "doc_id", "text", nBuckets = 8)
    try {
      val viaIdx = GraftSql.sql(spark, stmt)
      // routed through the index: posting buckets prune at the scan
      val plan = viaIdx.queryExecution.executedPlan.toString
      assert(plan.contains(TermIndex.BucketCol), plan)
      assert(viaIdx.collect().toSeq == brute)
    } finally TermIndex.drop("sql_docs_term")
  }

  test("Graft.indexInfo lists every index family with its metadata") {
    import graft.index.{SqIndex, TermIndex}
    spark.read.parquet(s"$sfDir/documents.parquet")
      .createOrReplaceTempView("info_docs")
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .createOrReplaceTempView("info_emb")
    TermIndex.create(spark, "info_term", "info_docs", "doc_id", "text", nBuckets = 2)
    SqIndex.create(spark, "info_sq", "info_emb", "vec_id", "embedding")
    try {
      val info = Graft.indexInfo(spark).collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getString(3), r.getLong(4)))
        .toMap
      assert(info.contains("info_term") && info.contains("info_sq"))
      val (tFam, tCol, tItems) = info("info_term")
      assert(tFam == "term" && tCol == "text" && tItems == 500L)
      val (sFam, sCol, sItems) = info("info_sq")
      assert(sFam == "sq" && sCol == "embedding" && sItems == 500L)
    } finally { TermIndex.drop("info_term"); SqIndex.drop("info_sq") }
  }

  test("vacuumTable reclaims superseded registrations; current stays readable") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(10)
    Graft.registerTable(spark, "vac_t", emb)
    Graft.registerTable(spark, "vac_t", emb) // supersedes the first
    val reclaimed = Graft.vacuumTable("vac_t")
    assert(reclaimed >= 1, "re-registration must retire the old path")
    assert(spark.table("vac_t").count() == 10, "current registration survives")
    assert(Graft.vacuumTable("vac_t") == 0, "vacuum is idempotent")
    Graft.dropTable(spark, "vac_t")
    intercept[Exception](spark.table("vac_t").count())
  }

  test("a stale FLOAT[n] declaration is forgotten when the table is " +
      "re-registered or dropped — never injected into a later index build") {
    import org.apache.spark.sql.types._
    GraftSql.sql(spark, "DROP TABLE IF EXISTS stale_t")
    try {
      GraftSql.sql(spark, "CREATE TABLE stale_t (v FLOAT[3])")
      // replace via DataFrame registration: 5-dim column, still empty —
      // the old dims=3 declaration must NOT leak into the build
      val empty5 = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("v", ArrayType(FloatType, true)))))
      Graft.registerTable(spark, "stale_t", empty5)
      val e = intercept[IllegalArgumentException] {
        GraftSql.sql(spark, "CREATE INDEX stale_idx ON stale_t USING HNSW (v)")
      }
      assert(e.getMessage.contains("no non-NULL vectors to index"),
        s"stale dims=3 was injected: ${e.getMessage}")
      // but the legit flow still works: CREATE TABLE then index-on-empty
      GraftSql.sql(spark, "DROP TABLE IF EXISTS fresh_t")
      GraftSql.sql(spark, "CREATE TABLE fresh_t (v FLOAT[4])")
      GraftSql.sql(spark, "CREATE INDEX fresh_idx ON fresh_t USING HNSW (v)")
      assert(IndexCatalog.get("fresh_idx").get.index.size == 0)
    } finally {
      IndexCatalog.dropIndex("stale_idx"); IndexCatalog.dropIndex("fresh_idx")
      if (Graft.isRegisteredTable("stale_t")) Graft.dropTable(spark, "stale_t")
      if (Graft.isRegisteredTable("fresh_t")) Graft.dropTable(spark, "fresh_t")
      GraftSql.sql(spark, "DROP TABLE IF EXISTS stale_t")
      GraftSql.sql(spark, "DROP TABLE IF EXISTS fresh_t")
      ()
    }
  }
}
