package graft

/** Textual SQL preprocessing for [[GraftSql]]: reference-dialect spellings
  * Spark's parser cannot express, rewritten onto the engine's registered
  * functions/types before `spark.sql`. All rewrites skip single-quoted
  * string literals.
  *
  *  - Infix distance operators (reference src/hnsw/hnsw_index.cpp:636-642,
  *    README.md §usage):
  *    {{{
  *      a <-> b   =>  array_distance(a, b)
  *      a <=> b   =>  array_cosine_distance(a, b)
  *      a <#> b   =>  array_negative_inner_product(a, b)
  *    }}}
  *    NOTE: in this dialect `<=>` is cosine distance (the reference's
  *    spelling), shadowing Spark SQL's null-safe equality — write
  *    `IS NOT DISTINCT FROM` through GraftSql for the latter, or turn the
  *    spelling off per session (`SET graft.sql.cosineInfix=false`, read by
  *    GraftSql) to keep Spark's operator.
  *
  * All rewrites also skip `--` line comments, `/* */` block comments and
  * backtick-quoted identifiers: a commented-out `<=>`, an apostrophe in
  * a comment (which would desynchronize a quotes-only tracker), or a
  * column literally named `` `a<->b` `` must not change the statement —
  * while a backtick-quoted column still works as an infix OPERAND
  * (`` `my vec` <-> q `` rewrites with the identifier intact).
  *
  *  - `FLOAT[n]` / `FLOAT[ANY]` array types (casts and DDL column types)
  *    => `ARRAY<FLOAT>`.
  *  - Bracket array literals `[1, 2, 3]` => `array(1, 2, 3)` — only where
  *    a literal can start; `expr[i]` element access (identifier, `)` or
  *    `]` immediately before the bracket) is left alone.
  *  - DuckDB's `list` aggregate (reference
  *    test/sql/hnsw/hnsw_lateral_join_group.test:35,62):
  *    {{{
  *      list(x)                 =>  transform(collect_list(named_struct(
  *                                    '__ov', x)), __ls -> __ls.__ov)
  *      list(x ORDER BY k1)     =>  transform(sort_array(collect_list(
  *                                    named_struct('__n1', (k1) IS NULL,
  *                                                 '__o1', k1,
  *                                                 '__ov', x))),
  *                                    __ls -> __ls.__ov)
  *    }}}
  *    The never-null struct wrapper preserves NULL elements (DuckDB's
  *    list() keeps them; bare collect_list drops them). The ORDER BY keys
  *    become leading struct fields so `sort_array`'s lexicographic struct
  *    order IS the requested sort — one aggregate, no window — with a
  *    `(k) IS NULL` boolean ahead of each key so NULL keys sort LAST
  *    (DuckDB's default_null_order; Spark's struct compare would put them
  *    first). Ascending keys only (a bare trailing `ASC` is dropped);
  *    `DESC`/`NULLS FIRST|LAST` keys leave the call unchanged for Spark's
  *    parser to report, per the cannot-delimit contract.
  *  - DuckDB's default null ordering: every `ORDER BY` sort key without an
  *    explicit `NULLS` modifier gets `NULLS LAST` appended. DuckDB sorts
  *    NULLs last by default (`default_null_order = 'nulls_last'`);
  *    Spark's ASC default is NULLS FIRST — so a ported
  *    `ORDER BY dist LIMIT 3` over NULL-bearing distances would RETURN
  *    DIFFERENT ROWS without this, and the index TopN/KNN rewrites (whose
  *    NULL-safety guard requires NULLS LAST ordering) could never fire on
  *    reference-dialect spellings (e.g. hnsw_lateral_join_group.test,
  *    hnsw_projection.test run verbatim through GraftSql). Applies to
  *    statement-level and subquery/lateral ORDER BY; an ORDER BY inside a
  *    function call's argument list is left alone (Spark will report the
  *    unsupported aggregate itself). `SET graft.sql.duckdbNullOrder=false`
  *    restores Spark's defaults.
  *
  * Operand extraction for the infix rewrite handles the expression shapes
  * the reference's docs/tests put around these operators: column refs
  * (qualified or not), function calls, parenthesized subqueries, bracket
  * literals, and `::type` casts (including generic `ARRAY<FLOAT>`). It is
  * deliberately NOT a full expression parser — an operand it cannot
  * delimit leaves the statement unchanged (and Spark's parser reports the
  * original text). */
object SqlRewrite {

  private val infixOps: Seq[(String, String)] = Seq(
    "<->" -> "array_distance",
    "<=>" -> "array_cosine_distance",
    "<#>" -> "array_negative_inner_product")

  def preprocess(stmt: String): String = preprocess(stmt, cosineInfix = true)

  def preprocess(stmt: String, cosineInfix: Boolean): String =
    preprocess(stmt, cosineInfix, duckdbNullOrder = true)

  /** `cosineInfix=false` leaves `<=>` alone (Spark's null-safe equality)
    * while keeping the unambiguous `<->`/`<#>` spellings;
    * `duckdbNullOrder=false` keeps Spark's default (NULLS FIRST on ASC). */
  def preprocess(stmt: String, cosineInfix: Boolean,
      duckdbNullOrder: Boolean): String =
    // listAgg before nullOrder: a supported list(x ORDER BY k) consumes its
    // ORDER BY into struct fields first (appending NULLS LAST there would
    // trip the aggregate's unsupported-modifier guard). Both before infix:
    // an ORDER BY key may itself contain an infix operator
    // (`list(id ORDER BY vec <-> q)`) — the infix pass rewrites inside the
    // spliced call on its own later iteration.
    try {
      val base = rewriteEmptyOver(
        rewriteListAgg(rewriteArrayLiterals(rewriteFloatArrayTypes(stmt))))
      val nulled = if (duckdbNullOrder) rewriteNullOrdering(base) else base
      rewriteInfix(nulled, cosineInfix)
    }
    // don't pin the last statement (and its span vector) past the call —
    // a one-off huge generated statement would otherwise stay reachable
    // (per-thread) until that thread's next preprocess
    finally spanMemo.remove()

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  /** DuckDB allows an EMPTY window spec for ranking functions
    * (`row_number() OVER ()`, reference hnsw_join_macro.test:8) meaning
    * "whole partition, arbitrary order"; Spark demands an ORDER BY for
    * ranking functions. `OVER ()` → `OVER (ORDER BY 1)`: a constant key
    * makes every row a peer, so ranking order stays arbitrary (DuckDB's
    * contract) and aggregate frames still span the whole partition
    * (RANGE over all-peers = unbounded). Quote/comment-aware like every
    * scanner here. */
  private def rewriteEmptyOver(stmt: String): String = {
    val sb = new StringBuilder(stmt.length + 16)
    var i = 0
    while (i < stmt.length) {
      val skip = nonCodeEnd(stmt, i)
      if (skip >= 0) { sb.append(stmt.substring(i, skip)); i = skip }
      else if ((stmt(i) == 'o' || stmt(i) == 'O') &&
          stmt.regionMatches(true, i, "over", 0, 4) &&
          (i == 0 || !isIdentChar(stmt(i - 1))) &&
          (i + 4 >= stmt.length || !isIdentChar(stmt(i + 4)))) {
        var j = i + 4
        while (j < stmt.length && stmt(j).isWhitespace) j += 1
        var k = if (j < stmt.length && stmt(j) == '(') j + 1 else -1
        while (k >= 0 && k < stmt.length && stmt(k).isWhitespace) k += 1
        if (k >= 0 && k < stmt.length && stmt(k) == ')') {
          sb.append(stmt.substring(i, i + 4)).append(" (ORDER BY 1)")
          i = k + 1
        } else { sb.append(stmt(i)); i += 1 }
      } else { sb.append(stmt(i)); i += 1 }
    }
    sb.toString
  }

  /** End index (exclusive) of the quoted span starting at `i` with quote
    * char `q` (doubling is the embedded-quote escape — `''` in strings,
    * ` `` ` in backtick identifiers), or -1 when unterminated. One
    * implementation for both quote kinds so the escape handling cannot
    * drift. */
  private def skipQuoted(s: String, i: Int, q: Char): Int = {
    var j = i + 1
    while (j < s.length) {
      if (s(j) == q) {
        if (j + 1 < s.length && s(j + 1) == q) j += 2 else return j + 1
      } else j += 1
    }
    -1
  }

  /** End index (exclusive) of the single-quoted literal starting at `i`;
    * an unterminated literal spans to end-of-string. */
  private def skipString(s: String, i: Int): Int = {
    val e = skipQuoted(s, i, '\'')
    if (e < 0) s.length else e
  }

  /** End index (exclusive) of the backtick-quoted identifier starting at
    * `i`; an unterminated one spans to end-of-string. */
  private def skipBacktick(s: String, i: Int): Int = {
    val e = skipQuoted(s, i, '`')
    if (e < 0) s.length else e
  }

  /** End index (exclusive) of the NON-CODE span starting at `i` — a
    * single-quoted literal, a backtick-quoted IDENTIFIER (Spark quoting:
    * a column named `` `a<->b` `` must never be rewritten), a `--` line
    * comment, or a `/∗ ∗/` block comment — or -1 when `i` doesn't start
    * one. Every scanner routes through this: an apostrophe inside a
    * comment must not flip the quote tracker, and no rewrite may touch
    * commented-out or quoted text. */
  private def nonCodeEnd(s: String, i: Int): Int =
    if (s(i) == '\'') skipString(s, i)
    else if (s(i) == '`') skipBacktick(s, i)
    else if (s(i) == '-' && i + 1 < s.length && s(i + 1) == '-') {
      val nl = s.indexOf('\n', i + 2)
      if (nl < 0) s.length else nl + 1
    } else if (s(i) == '/' && i + 1 < s.length && s(i + 1) == '*') {
      val end = s.indexOf("*/", i + 2)
      if (end < 0) s.length else end + 2
    } else -1

  /** Index of the close matching the open bracket/paren at `i` (quote- and
    * comment-aware), or -1 if unbalanced. */
  private def matchForward(s: String, i: Int): Int = {
    val (open, close) = (s(i), if (s(i) == '(') ')' else ']')
    var depth = 0
    var j = i
    while (j < s.length) {
      val skip = if (j > i) nonCodeEnd(s, j) else -1
      if (skip >= 0) j = skip
      else {
        val c = s(j)
        if (c == open) depth += 1
        else if (c == close) {
          depth -= 1
          if (depth == 0) return j
        }
        j += 1
      }
    }
    -1
  }

  /** Index of the open matching the close bracket/paren at `i`. Every
    * non-code span (comment, string literal, backtick identifier) is
    * skipped wholesale — an unbalanced bracket inside any of them
    * (`fn(a /* (x */`…`)`, a column named `` `a[b` ``) must not be
    * counted, or the infix rewrite splices from the wrong start
    * (symmetric with matchForward); -1 when unbalanced. */
  private def matchBackward(s: String, i: Int): Int = {
    val spans = nonCodeSpans(s)
    val (close, open) = (s(i), if (s(i) == ')') '(' else '[')
    var depth = 0
    var j = i
    while (j >= 0) {
      // skip EVERY non-code span — a bracket inside a comment, a string,
      // or a backtick-quoted identifier must not be counted (symmetric
      // with matchForward)
      spanAt(spans, j) match {
        case Some((start, _, _)) => j = start - 1
        case None =>
          val c = s(j)
          if (c == close) depth += 1
          else if (c == open) { depth -= 1; if (depth == 0) return j }
          j -= 1
      }
    }
    -1
  }

  /** First occurrence of `tok` at or after `from` that is outside any
    * single-quoted literal or comment, or -1. */
  private def findOutsideQuotes(s: String, tok: String, from: Int): Int = {
    var j = 0
    var next = s.indexOf(tok, from)
    while (next >= 0 && j < s.length) {
      val end = nonCodeEnd(s, j)
      if (end >= 0) {
        if (next >= j && next < end) next = s.indexOf(tok, end)
        j = end
      } else j += 1
      if (next >= 0 && j > next) return next
    }
    next
  }

  // ---- FLOAT[n] types ------------------------------------------------

  private val FloatArrayType =
    """(?i)\bFLOAT\s*\[\s*(?:\d+|ANY)?\s*\]""".r

  /** Does `tok` occur in `stmt` outside single-quoted literals? */
  private[graft] def containsOutsideQuotes(stmt: String, tok: String): Boolean =
    findOutsideQuotes(stmt, tok, 0) >= 0

  /** Does `ident` occur in `stmt` as a whole identifier — bare, or in
    * Spark's backtick-quoted spelling (`` `ident` ``)? Not a substring of
    * a longer identifier, not inside a string literal or comment. The
    * backtick clause matters: GraftSql routes on mentions of the hidden
    * rowid column, and `` SELECT `__rowid`, v `` is the standard quoted
    * way to address it. */
  private[graft] def mentionsIdentifier(stmt: String, ident: String): Boolean = {
    var i = findOutsideQuotes(stmt, ident, 0)
    while (i >= 0) {
      val freeBefore = i == 0 || !isIdentChar(stmt(i - 1))
      val end = i + ident.length
      val freeAfter = end >= stmt.length || !isIdentChar(stmt(end))
      if (freeBefore && freeAfter) return true
      i = findOutsideQuotes(stmt, ident, i + 1)
    }
    nonCodeSpans(stmt).exists { case (a, b, isComment) =>
      !isComment && stmt(a) == '`' && {
        val close = b - 1 >= a + 1 && stmt(b - 1) == '`'
        val content = stmt.substring(a + 1, if (close) b - 1 else b)
        content.replace("``", "`") == ident
      }
    }
  }

  /** All non-code spans of `s` as (start, endExclusive, isComment) in
    * order — every positional is-it-code query below derives from this
    * list instead of re-scanning per character. Memoized on the STRING
    * INSTANCE (the rewrite loops splice a fresh string per change, so
    * identity is the correct invalidation): one forward walk per
    * statement version, however many helper calls follow. THREAD-local:
    * concurrent GraftSql.sql calls from multiple driver threads would
    * thrash one shared slot (each call's splice invalidating the other's
    * memo — correct, since identity forces recompute, but every lookup
    * repays the full scan). */
  private val spanMemo =
    new ThreadLocal[(String, Vector[(Int, Int, Boolean)])]

  private def nonCodeSpans(s: String): Vector[(Int, Int, Boolean)] = {
    val m = spanMemo.get()
    if (m != null && (m._1 eq s)) m._2
    else {
      val b = Vector.newBuilder[(Int, Int, Boolean)]
      var j = 0
      while (j < s.length) {
        val end = nonCodeEnd(s, j)
        // third member: is this span a COMMENT — quoted strings and
        // backtick identifiers are code-adjacent text (expression
        // material), comments are skippable air
        if (end >= 0) {
          b += ((j, end, s(j) != '\'' && s(j) != '`')); j = end
        } else j += 1
      }
      val v = b.result()
      spanMemo.set((s, v))
      v
    }
  }

  /** The span containing `pos`, by binary search over the sorted,
    * non-overlapping span starts — the per-character backward walks
    * (matchBackward, skipBackNonCode) call this O(n) times per statement,
    * so a linear find would make them O(n × spans). */
  private def spanAt(spans: Vector[(Int, Int, Boolean)],
      pos: Int): Option[(Int, Int, Boolean)] = {
    var lo = 0
    var hi = spans.length - 1
    var best = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (spans(mid)._1 <= pos) { best = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (best >= 0 && pos < spans(best)._2) Some(spans(best)) else None
  }

  private def spanContaining(s: String, pos: Int): Option[(Int, Int, Boolean)] =
    spanAt(nonCodeSpans(s), pos)

  /** Is `pos` inside a comment span (not a string literal)? */
  private def insideComment(s: String, pos: Int): Boolean =
    spanContaining(s, pos).exists(_._3)

  /** Walking forwards from `i0`, the index of the next CODE char —
    * whitespace and whole comment spans are skipped; returns s.length
    * when only whitespace/comments remain. */
  private def skipForwardNonCode(s: String, i0: Int): Int = {
    var i = i0
    var moved = true
    while (moved) {
      moved = false
      while (i < s.length && s(i).isWhitespace) { i += 1; moved = true }
      // skip COMMENTS only: quoted strings and backtick identifiers are
      // expression material, not air (the backward twin stops at them too)
      if (i < s.length && s(i) != '\'' && s(i) != '`') {
        val e = nonCodeEnd(s, i)
        if (e >= 0) { i = e; moved = true }
      }
    }
    i
  }

  /** Does a non-keyword identifier end at `end0` (exclusive)? The "can
    * this token be a function name before a spaced `(`" test shared by
    * both operand scanners — keywords (`WHERE (a)`, `a <-> b AND (c)`)
    * open a plain paren group, not a call. */
  private def callNameEndingAt(s: String, end0: Int): Boolean =
    end0 > 0 && isIdentChar(s(end0 - 1)) && {
      var j = end0
      while (j > 0 && isIdentChar(s(j - 1))) j -= 1
      !literalCanFollowKw(s.substring(j, end0).toLowerCase)
    }

  /** Can this character END an expression (identifier char, close
    * paren/bracket, or a backtick-quoted identifier's closing tick)? The
    * ADJACENCY contract shared by the bracket classifier and both operand
    * scanners — keep these call sites on one definition. */
  private def canEndExpr(c: Char): Boolean =
    isIdentChar(c) || c == ')' || c == ']' || c == '`'

  /** Can an expression end just before `end0` (exclusive), judged at a
    * whitespace/comment boundary? `)`/`]`/backtick idents always can; a
    * bare identifier can unless it is a keyword a literal or paren group
    * follows (`SELECT`, `IN`, `AND` …) — with '.'-qualification rescuing
    * keyword-NAMED columns (`t.order`). The SPACED-boundary contract
    * shared by the bracket classifier and the operand scanners' glue. */
  private def exprEndsAt(s: String, end0: Int): Boolean =
    end0 > 0 && {
      val c = s(end0 - 1)
      if (c == ')' || c == ']' || c == '`') true
      else if (isIdentChar(c)) {
        var j = end0
        while (j > 0 && isIdentChar(s(j - 1))) j -= 1
        val qualified = j > 0 && (s(j - 1) == '.' || s(j - 1) == ':')
        qualified || !literalCanFollowKw(s.substring(j, end0).toLowerCase)
      } else false
    }

  /** Walking backwards from `i0`, the index just past the last CODE char —
    * whitespace and whole comment spans are skipped; returns 0 when only
    * whitespace/comments precede. */
  private def skipBackNonCode(s: String, i0: Int): Int = {
    val spans = nonCodeSpans(s)
    var i = i0
    var moved = true
    while (moved) {
      moved = false
      while (i > 0 && s(i - 1).isWhitespace) { i -= 1; moved = true }
      if (i > 0) spanAt(spans, i - 1) match {
        case Some((start, _, true)) => i = start; moved = true
        case _ =>
      }
    }
    i
  }

  /** Is `pos` inside a single-quoted literal or a comment? */
  private def insideQuotes(s: String, pos: Int): Boolean =
    spanContaining(s, pos).isDefined

  private def rewriteFloatArrayTypes(stmt: String): String = {
    var s = stmt
    var changed = true
    while (changed) {
      changed = false
      // first match OUTSIDE quotes — a quoted 'FLOAT[2]' earlier in the
      // statement must be skipped, not terminate the rewrite
      FloatArrayType.findAllMatchIn(s).find(m => !insideQuotes(s, m.start))
        .foreach { m =>
          s = s.substring(0, m.start) + "ARRAY<FLOAT>" + s.substring(m.end)
          changed = true
        }
    }
    // DuckDB's bare VARCHAR (unbounded, reference hnsw_lateral_join.test:6)
    // → STRING: Spark's VARCHAR demands a length parameter
    var changed2 = true
    while (changed2) {
      changed2 = false
      BareVarchar.findAllMatchIn(s)
        .find(m => !insideQuotes(s, m.start(1)))
        .foreach { m =>
          s = s.substring(0, m.start(1)) + "STRING" + s.substring(m.end(1))
          changed2 = true
        }
    }
    s
  }

  /** `VARCHAR` as a whole word NOT followed by a length parameter. */
  private val BareVarchar = """(?i)(?<![\w`])(VARCHAR)(?!\s*\(|[\w`])""".r

  // ---- bracket array literals -----------------------------------------

  /** SQL keywords after which a `[...]` can only be a literal, never
    * element access on the keyword itself. Anything NOT here that parses
    * as an identifier is assumed to be an expression (column/alias), so
    * `arr [0]` stays element access. */
  private val literalCanFollowKw: Set[String] = Set(
    "select", "where", "and", "or", "not", "when", "then", "else", "in",
    "values", "on", "having", "by", "all", "distinct", "union", "except",
    "intersect", "between", "like", "is", "returning", "set", "case",
    "limit", "offset", "as", "from", "join", "group", "order")

  private def rewriteArrayLiterals(stmt: String): String = {
    var s = stmt
    var from = 0
    var guard = 0
    while (guard < 10000) {
      guard += 1
      val i = findOutsideQuotes(s, "[", from)
      if (i < 0) return s
      // DuckDB's prefix-constructor spelling `array[1.0, 2.0]` (reference
      // hnsw_crud.test) — the bare keyword before `[`, whitespace allowed
      // (`ARRAY [1, 2]` is the same constructor in DuckDB/Postgres), is
      // the constructor, not element access on a column (a qualified
      // `t.array[i]` stays access)
      // ... where "whitespace" includes whole comment spans: in
      // `SELECT -- ids\n[1, 2]` the token that classifies the bracket is
      // SELECT, not the comment's last word
      val kwEnd = skipBackNonCode(s, i)
      val identStart = {
        var j = kwEnd; while (j > 0 && isIdentChar(s(j - 1))) j -= 1; j
      }
      val isArrayKw = identStart < kwEnd &&
        s.substring(identStart, kwEnd).equalsIgnoreCase("array") &&
        (identStart == 0 || (s(identStart - 1) != '.' && s(identStart - 1) != ':'))
      // element access: anything IMMEDIATELY adjacent to `[` that can end
      // an expression (`expr[i]` — ident, `)`, `]`) is access, keyword
      // spelling or not (a column named `order`/`select` subscripts like
      // any other; only the bare ARRAY keyword above is a constructor).
      // With whitespace/comments before the bracket (`arr [0]`,
      // `map(...) ['k']`), classify by the last CODE token: `)`/`]` or a
      // non-keyword identifier is access; a keyword a literal can follow
      // (`SELECT [1,2]`, `WHEN [..] THEN`) or a qualified keyword-named
      // column (`t.order [0]` — qualification makes it a column) decides
      // the other way respectively. A literal is otherwise preceded by
      // start-of-text, an operator, `(` or `,`
      val isAccess = !isArrayKw && {
        val adjacent = i > 0 && canEndExpr(s(i - 1))
        adjacent || (kwEnd > 0 && kwEnd < i && exprEndsAt(s, kwEnd))
      }
      // `ARRAY<FLOAT>`-style type suffix `[n]` never reaches here (the type
      // rewrite above ran first), so anything non-access is a literal
      if (isAccess) from = i + 1
      else if (isArrayKw) {
        val close = matchForward(s, i)
        if (close < 0) return s
        s = s.substring(0, identStart) + "array(" +
          s.substring(i + 1, close) + ")" + s.substring(close + 1)
        from = identStart + 6
      }
      else {
        val close = matchForward(s, i)
        if (close < 0) return s // unbalanced: leave for Spark's parser
        s = s.substring(0, i) + "array(" + s.substring(i + 1, close) + ")" +
          s.substring(close + 1)
        from = i + 6 // just past "array(" — inner literals rewrite next
      }
    }
    s
  }

  // ---- DuckDB list(...) aggregate --------------------------------------

  /** Position of the first top-level (paren/bracket depth 0, non-code
    * spans skipped) match of `pat` within s[start,end), or -1. */
  private def topLevelIndexOf(s: String, start: Int, end: Int,
      pat: scala.util.matching.Regex): Int = {
    var j = start
    var depth = 0
    while (j < end) {
      val skip = nonCodeEnd(s, j)
      if (skip >= 0) j = skip
      else {
        val c = s(j)
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (depth == 0 &&
            pat.findPrefixMatchOf(s.subSequence(j, end)).isDefined) return j
        j += 1
      }
    }
    -1
  }

  /** s[start,end) split on top-level commas → trimmed pieces (in order). */
  private def splitTopLevel(s: String, start: Int, end: Int): Seq[String] = {
    val cuts = Seq.newBuilder[Int]
    var j = start
    var depth = 0
    while (j < end) {
      val skip = nonCodeEnd(s, j)
      if (skip >= 0) j = skip
      else {
        val c = s(j)
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (c == ',' && depth == 0) cuts += j
        j += 1
      }
    }
    val bounds = start +: cuts.result().flatMap(c => Seq(c, c + 1)) :+ end
    bounds.grouped(2).map { case Seq(a, b) => s.substring(a, b).trim }.toSeq
  }

  private val ListCall = """(?i)list\s*\(""".r
  private val OrderBy = """(?i)order\s+by\b""".r
  private val TrailingAsc = """(?i)\s+asc\s*$""".r
  private val UnsupportedSortMod = """(?i)\b(desc|nulls)\b""".r
  private val LeadingDistinct = """(?i)distinct\b""".r

  /** DuckDB `list(x [ORDER BY keys])` — see the object Scaladoc. The
    * `list` token must head a call (no identifier char, `.` or `:` before
    * it), so `collect_list(...)` and `t.list(...)` are untouched. */
  private def rewriteListAgg(stmt: String): String = {
    var s = stmt
    var from = 0
    var guard = 0
    while (guard < 10000) {
      guard += 1
      val m = ListCall.findAllMatchIn(s).find(m =>
        m.start >= from && !insideQuotes(s, m.start) &&
          (m.start == 0 || (!isIdentChar(s(m.start - 1)) &&
            s(m.start - 1) != '.' && s(m.start - 1) != ':')))
      m match {
        case None => return s
        case Some(mm) =>
          val open = mm.end - 1
          val close = matchForward(s, open)
          if (close < 0) return s // unbalanced: leave for Spark's parser
          val ob = topLevelIndexOf(s, open + 1, close, OrderBy)
          if (ob < 0) {
            // plain DuckDB list aggregate. NOT bare collect_list: DuckDB's
            // list() KEEPS NULL elements while collect_list drops them —
            // wrapping the element in a (never-null) struct preserves them.
            // A leading DISTINCT stays on the aggregate (struct equality
            // treats the null elements as equal, like DuckDB's DISTINCT).
            val inner = s.substring(open + 1, close).trim
            val dm = LeadingDistinct.findPrefixMatchOf(inner)
            val (distinct, expr) = dm match {
              case Some(d) => ("DISTINCT ", inner.substring(d.end).trim)
              case None => ("", inner)
            }
            if (expr.isEmpty) from = open + 1 // list() — Spark reports it
            else {
              val call = s"transform(collect_list(${distinct}named_struct(" +
                s"'__ov', $expr)), __ls -> __ls.__ov)"
              s = s.substring(0, mm.start) + call + s.substring(close + 1)
              from = mm.start + 1 // a nested list(...) inside expr rewrites
              // on a later iteration (spliced heads are underscore-preceded)
            }
          } else {
            val expr = s.substring(open + 1, ob).trim
            val keysEnd = ob + OrderBy.findPrefixMatchOf(
              s.subSequence(ob, close)).get.matched.length
            val keys = splitTopLevel(s, keysEnd, close)
              .map(k => TrailingAsc.replaceAllIn(k, ""))
            val unsupported = expr.isEmpty || keys.exists(k =>
              k.isEmpty || UnsupportedSortMod.findFirstIn(k).isDefined)
            if (unsupported) from = open + 1 // leave unchanged, keep going
            else {
              // each key gets a leading `(k) IS NULL` boolean field: struct
              // comparison sorts false (non-NULL key) before true, so NULL
              // keys land LAST — DuckDB's default_null_order, which plain
              // struct ordering would invert (Spark sorts null fields first)
              val fields = keys.zipWithIndex
                .map { case (k, i) => s"'__n${i + 1}', ($k) IS NULL, '__o${i + 1}', $k" }
                .mkString("", ", ", s", '__ov', $expr")
              val call = s"transform(sort_array(collect_list(named_struct(" +
                s"$fields))), __ls -> __ls.__ov)"
              s = s.substring(0, mm.start) + call + s.substring(close + 1)
              // expr/keys were spliced verbatim: resume just past the
              // rewrite's head so a NESTED list(...) inside them still
              // rewrites on a later iteration (the spliced collect_list/
              // named_struct heads can't re-match — underscore-preceded)
              from = mm.start + 1
            }
          }
      }
    }
    s
  }

  // ---- DuckDB default null ordering ------------------------------------

  /** Keywords that terminate an ORDER BY sort-key list at its own depth. */
  private val sortKeyEnders: Set[String] = Set(
    "limit", "offset", "fetch", "union", "except", "intersect", "window",
    "rows", "range", "groups", "having", "qualify", "for")

  /** Keywords before a `(` that open a subquery/group rather than a call —
    * the null-order pass rewrites ORDER BY inside these, but not inside a
    * function's argument list. Superset of [[literalCanFollowKw]] (those
    * double as "not a call" everywhere) plus the paren-introducing forms. */
  private val subqueryHeadKw: Set[String] =
    literalCanFollowKw ++ Set("lateral", "exists", "over", "filter", "using")

  /** Is the `(` at `openPos` a function call's argument list (identifier
    * head that is not a subquery-introducing keyword)? */
  private def parenIsCall(s: String, openPos: Int): Boolean = {
    val k = skipBackNonCode(s, openPos)
    k > 0 && isIdentChar(s(k - 1)) && {
      var j = k
      while (j > 0 && isIdentChar(s(j - 1))) j -= 1
      !subqueryHeadKw.contains(s.substring(j, k).toLowerCase)
    }
  }

  /** Append `NULLS LAST` to every ORDER BY sort key without an explicit
    * NULLS modifier — DuckDB's default null order (see the object
    * Scaladoc). One forward walk collects the insertion points (paren
    * stack distinguishes subquery ORDER BY, which rewrites, from ORDER BY
    * inside a call's argument list, which does not); inserts then apply
    * back-to-front. Limitation: an ORDER BY nested inside another ORDER
    * BY's key expression (a scalar subquery used as a sort key) is left
    * alone. */
  private def rewriteNullOrdering(stmt: String): String = {
    val inserts = List.newBuilder[Int]

    /** Walk the sort keys from `start` (just past BY); collect an insert
      * point per NULLS-less key; return the resume index (first char NOT
      * consumed — a closing paren or ender keyword stays for the caller). */
    def walkKeys(start: Int): Int = {
      var j = start
      var depth = 0
      var keyEnd = -1
      var keyHasNulls = false
      def endKey(): Unit = {
        if (keyEnd >= 0 && !keyHasNulls) inserts += keyEnd
        keyEnd = -1; keyHasNulls = false
      }
      while (j < stmt.length) {
        val skip = nonCodeEnd(stmt, j)
        if (skip >= 0) {
          // quoted strings / backtick identifiers are key material;
          // comments are air
          if (stmt(j) == '\'' || stmt(j) == '`') keyEnd = skip
          j = skip
        } else {
          val c = stmt(j)
          if (c == '(' || c == '[') { depth += 1; j += 1 }
          else if (c == ')' || c == ']') {
            if (depth == 0) { endKey(); return j }
            depth -= 1; keyEnd = j + 1; j += 1
          } else if (depth > 0) j += 1
          else if (c == ',') { endKey(); j += 1 }
          else if (c == ';') { endKey(); return j }
          else if (isIdentChar(c)) {
            var e = j
            while (e < stmt.length && isIdentChar(stmt(e))) e += 1
            val w = stmt.substring(j, e).toLowerCase
            if (sortKeyEnders.contains(w)) { endKey(); return j }
            if (w == "nulls") keyHasNulls = true
            keyEnd = e
            j = e
          } else {
            if (!c.isWhitespace) keyEnd = j + 1
            j += 1
          }
        }
      }
      endKey()
      stmt.length
    }

    var stack = List.empty[Boolean] // enclosing groups: true = call args
    var i = 0
    while (i < stmt.length) {
      val skip = nonCodeEnd(stmt, i)
      if (skip >= 0) i = skip
      else {
        val c = stmt(i)
        if (c == '(') { stack = parenIsCall(stmt, i) :: stack; i += 1 }
        else if (c == '[') { stack = true :: stack; i += 1 }
        else if (c == ')' || c == ']') {
          if (stack.nonEmpty) stack = stack.tail
          i += 1
        } else if (isIdentChar(c)) {
          var e = i
          while (e < stmt.length && isIdentChar(stmt(e))) e += 1
          val isOrder = stmt.substring(i, e).equalsIgnoreCase("order") &&
            (i == 0 || (!isIdentChar(stmt(i - 1)) && stmt(i - 1) != '.')) &&
            !stack.headOption.getOrElse(false)
          if (isOrder) {
            val byStart = skipForwardNonCode(stmt, e)
            var byEnd = byStart
            while (byEnd < stmt.length && isIdentChar(stmt(byEnd))) byEnd += 1
            if (byEnd > byStart &&
                stmt.substring(byStart, byEnd).equalsIgnoreCase("by"))
              i = walkKeys(byEnd)
            else i = e
          } else i = e
        } else i += 1
      }
    }
    val ins = inserts.result()
    if (ins.isEmpty) stmt
    else {
      val sb = new StringBuilder(stmt)
      ins.reverse.foreach(p => sb.insert(p, " NULLS LAST"))
      sb.toString
    }
  }

  // ---- infix operators -------------------------------------------------

  /** Start index of the operand ending just before `p0` (backwards scan),
    * or -1 when no operand could be delimited. A COMMENT between the
    * operand and the operator bails out (-1): the rewrite splices
    * `fn(left, right)` from the source text, and a line comment inside
    * the argument list would swallow the rest of the call — leaving the
    * statement unchanged (Spark reports the original text) is the
    * documented cannot-delimit behavior. */
  private def scanOperandLeft(s: String, p0: Int): Int = {
    var i = p0
    while (i > 0 && s(i - 1).isWhitespace) i -= 1
    if (i == 0) return -1
    if (insideComment(s, i - 1)) return -1
    val end = i
    var done = false
    while (!done && i > 0) {
      val c = s(i - 1)
      if (c == ')' || c == ']') {
        val open = matchBackward(s, i - 1)
        if (open < 0) return -1
        i = open
      } else if (c == '`') {
        // backtick-quoted identifier: one unit, back to its opening tick
        spanContaining(s, i - 1) match {
          case Some((start, _, false)) => i = start
          case _ => return -1
        }
      } else if (isIdentChar(c)) {
        while (i > 0 && isIdentChar(s(i - 1))) i -= 1
      } else if (c == '>') {
        // generic cast type, e.g. `::ARRAY<FLOAT>`: angle content is type
        // tokens only
        val lt = s.lastIndexOf('<', i - 2)
        val ok = lt > 0 && isIdentChar(s(lt - 1)) &&
          s.substring(lt + 1, i - 1).forall(ch =>
            isIdentChar(ch) || ch == ',' || ch == ' ' || ch == '<' || ch == '>')
        if (!ok) return if (i == end) -1 else i
        i = lt
        // glue the type identifier before the `<` (`ARRAY` in
        // `ARRAY<FLOAT>`) so the `::` binder check below sees the cast
        while (i > 0 && isIdentChar(s(i - 1))) i -= 1
      } else {
        done = true
      }
      if (!done) {
        // binders gluing this unit to the one before it
        if (i > 1 && s(i - 1) == ':' && s(i - 2) == ':') i -= 2
        else if (i > 0 && s(i - 1) == '.') i -= 1
        // fn name adjacent to its paren — keyword-guarded like the spaced
        // form below (`WHERE(a)` is a paren group, not a WHERE() call)
        else if (i > 0 && s(i) == '(' && callNameEndingAt(s, i)) ()
        // subscripted operand (`arr[0] <-> b`, keyword-named columns
        // `t.order[0]`, call results `fn(a)[0]`): normally every bracket
        // LITERAL has been rewritten to array(...) before infix time, so
        // a '[' after an expression terminator is element access
        else if (i > 0 && s(i) == '[' && canEndExpr(s(i - 1))) ()
        else {
          // fn name / array var separated from its paren/bracket by
          // whitespace or a comment (`fn (a)`, `fn /* c */ (a)`,
          // `arr [0]`) — Spark treats both as one expression, so
          // dropping the name would splice invalid SQL. A KEYWORD before
          // a paren (`WHERE (a) <-> b`) is not a call, and the bracket
          // glue uses the same keyword-aware boundary test as the
          // literal classifier (exprEndsAt) so a keyword is never
          // swallowed even when an earlier unbalanced bracket made the
          // literal pass bail.
          val glued =
            if (i > 0 && (s(i) == '(' || s(i) == '[')) {
              val k = skipBackNonCode(s, i)
              val names =
                k > 0 && k < i &&
                  (if (s(i) == '(') callNameEndingAt(s, k)
                   else exprEndsAt(s, k))
              if (names) k else -1
            } else -1
          if (glued >= 0) i = glued
          else done = true
        }
      }
    }
    if (i == end) -1 else i
  }

  /** End index (exclusive) of the operand starting at/after `q0` (forward
    * scan), or -1 when no operand could be delimited. Bails out (-1) on a
    * comment before the operand, like [[scanOperandLeft]]. */
  private def scanOperandRight(s: String, q0: Int): Int = {
    var i = q0
    while (i < s.length && s(i).isWhitespace) i += 1
    if (i >= s.length) return -1
    if (s(i) != '\'' && s(i) != '`' && nonCodeEnd(s, i) >= 0) return -1
    val start = i
    val signed = s(i) == '-' || s(i) == '+'
    if (signed) i += 1 // unary sign on a literal
    var done = false
    while (!done && i < s.length) {
      val c = s(i)
      if (c == '(' || c == '[') {
        val close = matchForward(s, i)
        if (close < 0) return -1
        i = close + 1
      } else if (c == '`') {
        // backtick-quoted identifier: one unit; unterminated bails (the
        // cannot-delimit contract — never splice the rest of the
        // statement into the call)
        val e = skipQuoted(s, i, '`')
        if (e < 0) return -1
        i = e
      } else if (isIdentChar(c)) {
        while (i < s.length && isIdentChar(s(i))) i += 1
      } else {
        done = true
      }
      if (!done) {
        if (i + 1 < s.length && s(i) == ':' && s(i + 1) == ':') {
          i += 2 // cast: consume the type — ident, optional <...>, both glued
          while (i < s.length && isIdentChar(s(i))) i += 1
          if (i < s.length && s(i) == '<') {
            var depth = 0
            var ok = false
            while (i < s.length && !ok) {
              if (s(i) == '<') depth += 1
              else if (s(i) == '>') { depth -= 1; ok = depth == 0 }
              i += 1
            }
            if (!ok) return -1
          }
          done = true // a cast ends the operand (no postfix after a type)
        }
        else if (i < s.length && s(i) == '.') i += 1
        else if (i < s.length && (s(i) == '(' || s(i) == '[')) () // call/index
        else {
          // the right-side twin of scanOperandLeft's spaced glue:
          // `a <-> fn (b)` takes `fn (b)` whole, `a <-> arr [0]` takes
          // `arr [0]` (ident+'[' is access — literals already rewrote)
          val k = skipForwardNonCode(s, i)
          val names = k < s.length && k > i &&
            (if (s(k) == '(') callNameEndingAt(s, i)
             else s(k) == '[' && exprEndsAt(s, i))
          if (names) i = k
          else done = true
        }
      }
    }
    // a bare sign with nothing consumed after it (`<-> -/*c*/2` stops the
    // scan at the comment) is not an operand — bail, don't splice "-"
    if (i == start || (signed && i == start + 1)) -1 else i
  }

  private def rewriteInfix(stmt: String, cosineInfix: Boolean): String = {
    var s = stmt
    var from = 0
    var guard = 0
    val ops = if (cosineInfix) infixOps else infixOps.filterNot(_._1 == "<=>")
    while (guard < 10000) {
      guard += 1
      val hits = ops
        .map { case (op, fn) => (findOutsideQuotes(s, op, from), op, fn) }
        .filter(_._1 >= 0)
      if (hits.isEmpty) return s
      val (pos, op, fn) = hits.minBy(_._1)
      val li = scanOperandLeft(s, pos)
      val ri = scanOperandRight(s, pos + op.length)
      if (li < 0 || ri < 0) from = pos + op.length // can't delimit: skip it
      else {
        val left = s.substring(li, pos).trim
        val right = s.substring(pos + op.length, ri).trim
        val call = s"$fn($left, $right)"
        s = s.substring(0, li) + call + s.substring(ri)
        from = li + call.length
      }
    }
    s
  }
}
