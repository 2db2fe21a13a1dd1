package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** The reference dialect's SQL spellings through GraftSql: infix distance
  * operators `<->`/`<=>`/`<#>` (reference src/hnsw/hnsw_index.cpp:636-642),
  * `FLOAT[n]` types, bracket array literals, and `array_value` — including
  * the reference README's own queries VERBATIM. */
class SqlRewriteSpec extends GraftSparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  override def beforeAll(): Unit = {
    Graft.registerFunctions(spark)
  }

  // ---- pure-text rewrites ------------------------------------------------

  test("infix operators rewrite onto the registered distance functions") {
    assert(SqlRewrite.preprocess("SELECT a <-> b FROM t") ==
      "SELECT array_distance(a, b) FROM t")
    assert(SqlRewrite.preprocess("SELECT t.a <=> u.b FROM t, u") ==
      "SELECT array_cosine_distance(t.a, u.b) FROM t, u")
    assert(SqlRewrite.preprocess("SELECT a <#> b FROM t") ==
      "SELECT array_negative_inner_product(a, b) FROM t")
  }

  test("operands: function calls, subqueries, literals, casts") {
    assert(SqlRewrite.preprocess(
      "ORDER BY l2_normalize(vec) <=> [0.6, 0.8]::FLOAT[2] LIMIT 3") ==
      "ORDER BY array_cosine_distance(l2_normalize(vec), array(0.6, 0.8)::ARRAY<FLOAT>) NULLS LAST LIMIT 3")
    assert(SqlRewrite.preprocess(
      "WHERE vec <-> (SELECT v FROM q WHERE id = 1) < 0.5") ==
      "WHERE array_distance(vec, (SELECT v FROM q WHERE id = 1)) < 0.5")
    // two independent occurrences in one statement
    assert(SqlRewrite.preprocess("SELECT a <-> b, c <#> d FROM t") ==
      "SELECT array_distance(a, b), array_negative_inner_product(c, d) FROM t")
  }

  test("element access and quoted strings are untouched") {
    assert(SqlRewrite.preprocess("SELECT arr[0] FROM t") ==
      "SELECT arr[0] FROM t")
    assert(SqlRewrite.preprocess("SELECT '<->' AS op, '[1,2]' AS s FROM t") ==
      "SELECT '<->' AS op, '[1,2]' AS s FROM t")
    // FLOAT[2] inside a string literal survives
    assert(SqlRewrite.preprocess("SELECT 'FLOAT[2]' FROM t") ==
      "SELECT 'FLOAT[2]' FROM t")
  }

  test("comments are non-code: no rewrites inside, apostrophes don't " +
      "desync the quote tracker") {
    // a commented-out operator/literal/type is untouched
    assert(SqlRewrite.preprocess("SELECT a FROM t -- was: a <-> b [1,2]") ==
      "SELECT a FROM t -- was: a <-> b [1,2]")
    assert(SqlRewrite.preprocess(
      "SELECT /* FLOAT[2] <=> [0,1] */ a FROM t") ==
      "SELECT /* FLOAT[2] <=> [0,1] */ a FROM t")
    // an apostrophe in a comment must not flip quote state for the rest
    // of the statement
    assert(SqlRewrite.preprocess(
      "SELECT a <-> b -- don't touch state\n, c <#> d FROM t") ==
      "SELECT array_distance(a, b) -- don't touch state\n, " +
        "array_negative_inner_product(c, d) FROM t")
    assert(SqlRewrite.preprocess(
      "SELECT /* it's fine */ a <-> b FROM t") ==
      "SELECT /* it's fine */ array_distance(a, b) FROM t")
    // a literal after a line comment still rewrites (the classifying token
    // is the keyword BEFORE the comment, not the comment's last word)
    assert(SqlRewrite.preprocess("SELECT -- ids\n[1, 2] AS xs") ==
      "SELECT -- ids\narray(1, 2) AS xs")
    // access across a block comment stays access
    assert(SqlRewrite.preprocess("SELECT arr /* c */ [0] FROM t") ==
      "SELECT arr /* c */ [0] FROM t")
    // a comment BETWEEN operand and infix operator cannot be delimited —
    // the statement is left whole (Spark reports the original text), never
    // spliced into a call with a comment swallowing the argument list
    assert(SqlRewrite.preprocess("SELECT a -- c\n<-> b FROM t") ==
      "SELECT a -- c\n<-> b FROM t")
    assert(SqlRewrite.preprocess("SELECT a <-> -- c\nb FROM t") ==
      "SELECT a <-> -- c\nb FROM t")
    // an unbalanced bracket INSIDE a block comment must not confuse the
    // backward operand scan — the comment embeds whole in the call
    assert(SqlRewrite.preprocess("SELECT fn(a /* (x */) <-> b FROM t") ==
      "SELECT array_distance(fn(a /* (x */), b) FROM t")
    // a unary sign followed by a comment is not an operand: leave whole
    assert(SqlRewrite.preprocess("SELECT a <-> -/*c*/2 FROM t") ==
      "SELECT a <-> -/*c*/2 FROM t")
    // a function name separated from its argument list by whitespace or a
    // comment still glues into the operand (Spark parses both as the call)
    assert(SqlRewrite.preprocess("SELECT fn (a) <-> b FROM t") ==
      "SELECT array_distance(fn (a), b) FROM t")
    assert(SqlRewrite.preprocess("SELECT fn /* c */ (a) <-> b FROM t") ==
      "SELECT array_distance(fn /* c */ (a), b) FROM t")
    // ...but a KEYWORD before the paren group is not a call name
    assert(SqlRewrite.preprocess("SELECT x FROM t WHERE (a) <-> b < 1") ==
      "SELECT x FROM t WHERE array_distance((a), b) < 1")
    // the right-side twin: a spaced call on the RIGHT of the operator
    assert(SqlRewrite.preprocess("SELECT a <-> fn (b) FROM t") ==
      "SELECT array_distance(a, fn (b)) FROM t")
    // subscripted operands glue whole on BOTH sides (property harness
    // found the left scanner never bound `ident[...]`)
    assert(SqlRewrite.preprocess("SELECT arr[0] <-> b FROM t") ==
      "SELECT array_distance(arr[0], b) FROM t")
    assert(SqlRewrite.preprocess("SELECT t.order[0] <=> t.order[1] FROM t") ==
      "SELECT array_cosine_distance(t.order[0], t.order[1]) FROM t")
    assert(SqlRewrite.preprocess("SELECT a <#> vecs [2] FROM t") ==
      "SELECT array_negative_inner_product(a, vecs [2]) FROM t")
    // a subscript on a CALL RESULT binds too, both sides
    assert(SqlRewrite.preprocess("SELECT fn(a)[0] <-> b FROM t") ==
      "SELECT array_distance(fn(a)[0], b) FROM t")
    assert(SqlRewrite.preprocess("SELECT a <-> fn(b) [0] FROM t") ==
      "SELECT array_distance(a, fn(b) [0]) FROM t")
  }

  test("backtick-quoted identifiers: protected as text, usable as operands") {
    // a column literally NAMED like an operator/literal is never rewritten
    assert(SqlRewrite.preprocess("SELECT `a<->b` FROM t") ==
      "SELECT `a<->b` FROM t")
    assert(SqlRewrite.preprocess("SELECT `arr[0]`, `FLOAT[2]` FROM t") ==
      "SELECT `arr[0]`, `FLOAT[2]` FROM t")
    // ...while backtick-quoted operands still participate in the rewrite
    assert(SqlRewrite.preprocess("SELECT `my vec` <-> q FROM t") ==
      "SELECT array_distance(`my vec`, q) FROM t")
    assert(SqlRewrite.preprocess("SELECT q <#> t.`my vec` FROM t") ==
      "SELECT array_negative_inner_product(q, t.`my vec`) FROM t")
    // a bracket INSIDE a quoted name is not a bracket (backward scan)
    assert(SqlRewrite.preprocess("SELECT m[`a[b`] <-> q FROM t") ==
      "SELECT array_distance(m[`a[b`], q) FROM t")
    // an UNTERMINATED backtick cannot be delimited: statement left whole
    assert(SqlRewrite.preprocess("SELECT q <-> `oops FROM t") ==
      "SELECT q <-> `oops FROM t")
    // identifier-mention routing sees the quoted spelling (GraftSql keeps
    // an explicitly selected `__rowid` on this test)
    assert(SqlRewrite.mentionsIdentifier("select `__rowid`, v from t", "__rowid"))
    assert(!SqlRewrite.mentionsIdentifier("select `x__rowid`, v from t", "__rowid"))
    assert(!SqlRewrite.mentionsIdentifier("select '__rowid' from t", "__rowid"))
  }

  test("a keyword is never swallowed into an operand, even when an " +
      "unbalanced bracket disabled the literal pass") {
    // the unbalanced first '[' makes the literal rewriter bail, leaving
    // 'IN [0]' unrewritten; the operand glue must still refuse to bind
    // the keyword to the bracket
    val in = "SELECT [1, , x IN [0] <-> b FROM t"
    val out = SqlRewrite.preprocess(in)
    assert(out.contains("IN array_distance([0], b)") || out == in, out)
  }

  test("keyword-named columns still subscript: adjacency wins, " +
      "qualification wins") {
    // a column legally named like a keyword subscripts as any other when
    // the bracket is adjacent...
    assert(SqlRewrite.preprocess("SELECT t.order[0] FROM t") ==
      "SELECT t.order[0] FROM t")
    assert(SqlRewrite.preprocess("SELECT order[0] FROM t") ==
      "SELECT order[0] FROM t")
    // ...and a QUALIFIED keyword-named column stays access even spaced
    assert(SqlRewrite.preprocess("SELECT t.group [1] FROM t") ==
      "SELECT t.group [1] FROM t")
    // while the bare keyword + spaced bracket stays a literal opener
    assert(SqlRewrite.preprocess("SELECT x FROM t WHERE y IN [1, 2]") ==
      "SELECT x FROM t WHERE y IN array(1, 2)")
  }

  test("whitespace before a subscript stays element access; keywords " +
      "still open literals") {
    assert(SqlRewrite.preprocess("SELECT arr [0] FROM t") ==
      "SELECT arr [0] FROM t")
    assert(SqlRewrite.preprocess("SELECT map_col ['k'] FROM t") ==
      "SELECT map_col ['k'] FROM t")
    // keywords a literal can follow still rewrite across whitespace
    assert(SqlRewrite.preprocess("SELECT [1, 2] AS xs") ==
      "SELECT array(1, 2) AS xs")
    assert(SqlRewrite.preprocess("WHERE x IN [1, 2]") ==
      "WHERE x IN array(1, 2)")
    // after ) or ] it is access even with whitespace
    assert(SqlRewrite.preprocess("SELECT f(x) [0] FROM t") ==
      "SELECT f(x) [0] FROM t")
  }

  test("DuckDB list aggregate: bare form, ORDER BY form, guards") {
    // bare list: struct-wrapped collect_list (NULL elements survive the
    // aggregate, as DuckDB's list() keeps them); call-head only
    assert(SqlRewrite.preprocess("SELECT list(x) FROM t GROUP BY g") ==
      "SELECT transform(collect_list(named_struct('__ov', x)), " +
        "__ls -> __ls.__ov) FROM t GROUP BY g")
    assert(SqlRewrite.preprocess("SELECT list(DISTINCT x) FROM t") ==
      "SELECT transform(collect_list(DISTINCT named_struct('__ov', x)), " +
        "__ls -> __ls.__ov) FROM t")
    assert(SqlRewrite.preprocess("SELECT collect_list(x) FROM t") ==
      "SELECT collect_list(x) FROM t")
    assert(SqlRewrite.preprocess("SELECT t.list(x) FROM t") ==
      "SELECT t.list(x) FROM t")
    assert(SqlRewrite.preprocess("SELECT 'list(x)' FROM t") ==
      "SELECT 'list(x)' FROM t")
    // the reference's grouped-lateral spelling
    // (hnsw_lateral_join_group.test:35): keys become leading struct
    // fields, sort_array's struct order is the requested sort, and each
    // key's (k) IS NULL prefix field puts NULL keys LAST (DuckDB default)
    assert(SqlRewrite.preprocess("SELECT list(nbr ORDER BY dist, nbr)") ==
      "SELECT transform(sort_array(collect_list(named_struct(" +
        "'__n1', (dist) IS NULL, '__o1', dist, " +
        "'__n2', (nbr) IS NULL, '__o2', nbr, '__ov', nbr))), __ls -> __ls.__ov)")
    // trailing ASC is the default — dropped; case-insensitive heads
    assert(SqlRewrite.preprocess("SELECT LIST(x ORDER BY k ASC) FROM t") ==
      "SELECT transform(sort_array(collect_list(named_struct(" +
        "'__n1', (k) IS NULL, '__o1', k, '__ov', x))), __ls -> __ls.__ov) FROM t")
    // nested call commas don't split keys
    assert(SqlRewrite.preprocess(
      "SELECT list(x ORDER BY coalesce(a, b), c)") ==
      "SELECT transform(sort_array(collect_list(named_struct(" +
        "'__n1', (coalesce(a, b)) IS NULL, '__o1', coalesce(a, b), " +
        "'__n2', (c) IS NULL, '__o2', c, '__ov', x))), __ls -> __ls.__ov)")
    // DESC / NULLS modifiers: not expressible via sort_array — the call
    // is left verbatim for Spark's parser to report
    assert(SqlRewrite.preprocess("SELECT list(x ORDER BY k DESC) FROM t") ==
      "SELECT list(x ORDER BY k DESC) FROM t")
    assert(SqlRewrite.preprocess(
      "SELECT list(x ORDER BY k NULLS FIRST) FROM t") ==
      "SELECT list(x ORDER BY k NULLS FIRST) FROM t")
    // an infix key still rewrites (listAgg runs before the infix pass)
    assert(SqlRewrite.preprocess("SELECT list(id ORDER BY v <-> q)") ==
      "SELECT transform(sort_array(collect_list(named_struct(" +
        "'__n1', (array_distance(v, q)) IS NULL, " +
        "'__o1', array_distance(v, q), '__ov', id))), __ls -> __ls.__ov)")
  }

  test("DuckDB default null ordering: sort keys get NULLS LAST; call " +
      "arguments and explicit modifiers don't") {
    assert(SqlRewrite.preprocess("SELECT * FROM t ORDER BY a, b DESC LIMIT 3") ==
      "SELECT * FROM t ORDER BY a NULLS LAST, b DESC NULLS LAST LIMIT 3")
    // explicit modifiers are the user's choice
    assert(SqlRewrite.preprocess("SELECT * FROM t ORDER BY a NULLS FIRST, b") ==
      "SELECT * FROM t ORDER BY a NULLS FIRST, b NULLS LAST")
    // subquery and lateral ORDER BY rewrite; a window's OVER (...) too
    assert(SqlRewrite.preprocess(
      "SELECT * FROM q, LATERAL (SELECT id FROM t ORDER BY d LIMIT 3)") ==
      "SELECT * FROM q, LATERAL (SELECT id FROM t ORDER BY d NULLS LAST LIMIT 3)")
    assert(SqlRewrite.preprocess(
      "SELECT row_number() OVER (PARTITION BY g ORDER BY d) rn FROM t") ==
      "SELECT row_number() OVER (PARTITION BY g ORDER BY d NULLS LAST) rn FROM t")
    // inside a call's argument list: left alone (the unsupported-aggregate
    // guard's territory, not the sort pass's)
    assert(SqlRewrite.preprocess("SELECT list(x ORDER BY k DESC) FROM t") ==
      "SELECT list(x ORDER BY k DESC) FROM t")
    // GROUP BY / PARTITION BY are not ORDER BY; quoted text untouched
    assert(SqlRewrite.preprocess("SELECT g FROM t GROUP BY g") ==
      "SELECT g FROM t GROUP BY g")
    assert(SqlRewrite.preprocess("SELECT 'ORDER BY x' FROM t ORDER BY g") ==
      "SELECT 'ORDER BY x' FROM t ORDER BY g NULLS LAST")
    // window frames end the key list before the frame clause
    assert(SqlRewrite.preprocess(
      "SELECT sum(x) OVER (ORDER BY d ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t") ==
      "SELECT sum(x) OVER (ORDER BY d NULLS LAST ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t")
    // opt-out restores Spark's defaults
    assert(SqlRewrite.preprocess("SELECT * FROM t ORDER BY a LIMIT 3",
      cosineInfix = true, duckdbNullOrder = false) ==
      "SELECT * FROM t ORDER BY a LIMIT 3")
  }

  test("cosineInfix=false leaves Spark's null-safe <=> alone") {
    assert(SqlRewrite.preprocess("SELECT a <=> b FROM t", cosineInfix = false) ==
      "SELECT a <=> b FROM t")
    // the unambiguous spellings still rewrite
    assert(SqlRewrite.preprocess("SELECT a <-> b FROM t", cosineInfix = false) ==
      "SELECT array_distance(a, b) FROM t")
    // and through GraftSql via the session conf
    Seq((1L, 5), (2L, 7)).toDF("id", "v").createOrReplaceTempView("nse_t")
    spark.conf.set(GraftSql.CosineInfixConfKey, "false")
    try {
      val got = GraftSql.sql(spark,
        "SELECT id FROM nse_t WHERE v <=> 7 ORDER BY id")
        .as[Long].collect().toSeq
      assert(got == Seq(2L))
    } finally spark.conf.unset(GraftSql.CosineInfixConfKey)
  }

  test("nested bracket literals and DDL types") {
    assert(SqlRewrite.preprocess("SELECT [[1,2],[3,4]] AS m") ==
      "SELECT array(array(1,2),array(3,4)) AS m")
    assert(SqlRewrite.preprocess("CREATE TABLE v (vec FLOAT[3])") ==
      "CREATE TABLE v (vec ARRAY<FLOAT>)")
    assert(SqlRewrite.preprocess("CREATE TABLE v (vec FLOAT[ANY])") ==
      "CREATE TABLE v (vec ARRAY<FLOAT>)")
  }

  test("an operand the scanner cannot delimit leaves the statement whole") {
    val odd = "SELECT * <-> FROM t" // nothing resembling a left operand
    assert(SqlRewrite.preprocess(odd) == odd)
  }

  test("DuckDB's array[...] prefix constructor rewrites; access forms stay") {
    assert(SqlRewrite.preprocess("INSERT INTO t1 VALUES (array[1.0, 2.0, 3.0])") ==
      "INSERT INTO t1 VALUES (array(1.0, 2.0, 3.0))")
    assert(SqlRewrite.preprocess("SELECT ARRAY [1, 2] AS a") ==
      "SELECT array(1, 2) AS a") // whitespace form, same constructor
    assert(SqlRewrite.preprocess("SELECT t.array[0] FROM t") ==
      "SELECT t.array[0] FROM t") // qualified column named array: access
    assert(SqlRewrite.preprocess("SELECT myarray[0] FROM t") ==
      "SELECT myarray[0] FROM t")
  }

  test("generic cast on the LEFT operand is delimited whole") {
    assert(SqlRewrite.preprocess(
      "SELECT vec::FLOAT[2] <-> [1.0,0.0]::FLOAT[2] AS d FROM t") ==
      "SELECT array_distance(vec::ARRAY<FLOAT>, array(1.0,0.0)::ARRAY<FLOAT>) AS d FROM t")
    assert(SqlRewrite.preprocess(
      "SELECT t.vec::ARRAY<FLOAT> <=> q FROM t") ==
      "SELECT array_cosine_distance(t.vec::ARRAY<FLOAT>, q) FROM t")
  }

  test("a quoted FLOAT[n] earlier in the statement does not mask later real ones") {
    assert(SqlRewrite.preprocess(
      "SELECT 'FLOAT[2]' AS tag, CAST(v AS FLOAT[2]) FROM t") ==
      "SELECT 'FLOAT[2]' AS tag, CAST(v AS ARRAY<FLOAT>) FROM t")
  }

  // ---- end-to-end through GraftSql ----------------------------------------

  test("reference README flow verbatim: CREATE TABLE, INSERT, query, infix") {
    spark.sql("DROP TABLE IF EXISTS my_vector_table")
    // reference README.md creation + load, verbatim (FLOAT[3] type,
    // array_value constructor, comma-joined range() sources)
    GraftSql.sql(spark, "CREATE TABLE my_vector_table (vec FLOAT[3])")
    GraftSql.sql(spark,
      "INSERT INTO my_vector_table SELECT array_value(a, b, c) FROM range(1, 10) ra(a), range(1, 10) rb(b), range(1, 10) rc(c)")
    // reference README.md:19 search query, verbatim
    val top = GraftSql.sql(spark,
      "SELECT * FROM my_vector_table ORDER BY array_distance(vec, [1,2,3]::FLOAT[3]) LIMIT 3")
      .collect()
    assert(top.length == 3)
    assert(top.head.getSeq[Float](0) == Seq(1f, 2f, 3f))
    // same query through the infix spelling gives the same answer
    val infix = GraftSql.sql(spark,
      "SELECT * FROM my_vector_table ORDER BY vec <-> [1,2,3]::FLOAT[3] LIMIT 3")
      .collect()
    assert(infix.map(_.getSeq[Float](0)).toSeq ==
      top.map(_.getSeq[Float](0)).toSeq)
    spark.sql("DROP TABLE my_vector_table")
  }

  test("all three infix metrics agree with the DataFrame kernels") {
    val df = Seq((1L, Array(1f, 0f)), (2L, Array(0.6f, 0.8f)), (3L, Array(0f, 1f)))
      .toDF("id", "vec")
    df.createOrReplaceTempView("infix_vecs")
    def viaSql(op: String): Seq[(Long, Double)] =
      GraftSql.sql(spark,
        s"SELECT id, vec $op [1.0,0.0]::FLOAT[2] AS d FROM infix_vecs ORDER BY d, id")
        .as[(Long, Double)].collect().toSeq
    val q = lit(Array(1f, 0f))
    def viaDf(k: org.apache.spark.sql.Column): Seq[(Long, Double)] =
      df.select($"id", k.as("d")).orderBy($"d", $"id")
        .as[(Long, Double)].collect().toSeq
    assert(viaSql("<->") == viaDf(functions.vector.array_distance($"vec", q)))
    assert(viaSql("<=>") == viaDf(functions.vector.array_cosine_distance($"vec", q)))
    assert(viaSql("<#>") == viaDf(functions.vector.array_negative_inner_product($"vec", q)))
  }
}
