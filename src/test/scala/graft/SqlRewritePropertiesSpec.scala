package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property harness for the SQL dialect preprocessor: whatever shape a
  * statement takes — operand forms, infix metrics, interleaved comments
  * and string literals — (1) `preprocess` is IDEMPOTENT (a rewritten
  * statement passes through unchanged, so double-preprocessing in a
  * layered caller can never corrupt), (2) single-quoted string literals
  * survive byte-for-byte, and (3) comment spans are never rewritten.
  * Randomized composition catches scanner interactions the example-based
  * SqlRewriteSpec can't enumerate. */
class SqlRewritePropertiesSpec extends AnyFunSuite {

  /** scalacheck driver (scalatestplus isn't in the offline cache). */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genIdent: Gen[String] =
    Gen.oneOf("a", "vec", "t.col", "emb2", "u.embedding",
      "`my vec`", "t.`odd name`")

  /** Operand shapes the infix scanner documents support for — including
    * whitespace-separated calls and subscripts, the round-7 hardening. */
  private val genOperand: Gen[String] = Gen.oneOf(
    genIdent,
    genIdent.map(i => s"l2_normalize($i)"),
    genIdent.map(i => s"fn($i, 2)"),
    genIdent.map(i => s"fn ($i)"),
    genIdent.map(i => s"$i[0]"),
    genIdent.map(i => s"$i [1]"),
    Gen.const("t.order[0]"),
    genIdent.map(i => s"fn($i)[0]"),
    Gen.const("[0.25, 0.5]"),
    Gen.const("[1, 2]::FLOAT[2]"),
    Gen.const("(SELECT v FROM q WHERE id = 1)"))

  private val genOp: Gen[String] = Gen.oneOf("<->", "<=>", "<#>")

  /** Noise that must never be rewritten: string literals and comments
    * whose CONTENT is full of trigger tokens. */
  private val genString: Gen[String] = Gen.oneOf(
    "'plain'", "'it''s'", "'<-> [1,2] FLOAT[2]'", "'-- not a comment'",
    "'over () VARCHAR'")
  private val genComment: Gen[String] = Gen.oneOf(
    "/* c */", "/* a <-> b */", "/* don't */", "-- tail <=> [1] FLOAT[4]\n")

  /** A SELECT item: a distance expression, an operand alone, a string, or
    * a bracket literal — including operators nested inside calls, chained
    * comparisons, and casts on subscripted operands. */
  private val genItem: Gen[String] = Gen.frequency(
    4 -> (for { l <- genOperand; op <- genOp; r <- genOperand }
      yield s"$l $op $r"),
    1 -> (for { l <- genOperand; op <- genOp; r <- genOperand }
      yield s"least($l $op $r, 1.0)"),
    1 -> (for { l <- genOperand; op <- genOp; r <- genOperand }
      yield s"$l $op $r < 0.5"),
    1 -> Gen.const("arr[0]::FLOAT[2] <-> vec"),
    2 -> genOperand,
    1 -> genString,
    1 -> Gen.const("[1, 2, 3]"),
    // the empty-OVER and bare-VARCHAR dialect passes
    1 -> Gen.oneOf("row_number() over ()", "sum(a) OVER (  )",
      "rank() over (ORDER BY a)", "cast(a AS VARCHAR)",
      "cast(a AS VARCHAR(10))", "varchar_col"))

  private val genStatement: Gen[String] = for {
    items <- Gen.nonEmptyListOf(genItem).map(_.take(4))
    lead <- Gen.option(genComment)
    trail <- Gen.option(genString.map(s => s" WHERE name = $s"))
  } yield {
    val leadStr = lead.fold("")(c => if (c.endsWith("\n")) c else c + " ")
    s"SELECT ${leadStr}${items.mkString(", ")} FROM t${trail.getOrElse("")}"
  }

  test("preprocess is idempotent over randomized statements") {
    check(Prop.forAll(genStatement) { s =>
      val once = SqlRewrite.preprocess(s)
      val twice = SqlRewrite.preprocess(once)
      if (twice != once) {
        println(s"NOT IDEMPOTENT:\n  in:    $s\n  once:  $once\n  twice: $twice")
      }
      twice == once
    })
  }

  /** The string literals of `x` in order, via an independent tiny scanner
    * (comment-aware — a bare regex would misread an apostrophe inside a
    * comment as opening a literal). */
  private def literals(x: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < x.length) {
      if (x.startsWith("--", i)) {
        val nl = x.indexOf('\n', i); i = if (nl < 0) x.length else nl + 1
      } else if (x.startsWith("/*", i)) {
        val e = x.indexOf("*/", i + 2); i = if (e < 0) x.length else e + 2
      } else if (x(i) == '\'') {
        var j = i + 1
        var open = true
        while (open && j < x.length) {
          if (x(j) == '\'') {
            if (j + 1 < x.length && x(j + 1) == '\'') j += 2
            else { open = false; j += 1 }
          } else j += 1
        }
        out += x.substring(i, j); i = j
      } else i += 1
    }
    out.result()
  }

  test("string-literal content survives preprocessing byte-for-byte") {
    check(Prop.forAll(genStatement) { s =>
      val (in, out) = (literals(s), literals(SqlRewrite.preprocess(s)))
      if (in != out) {
        println(s"LITERALS CHANGED:\n  in:   $s\n  out:  ${SqlRewrite.preprocess(s)}\n  lin:  $in\n  lout: $out")
      }
      in == out
    })
  }

  test("comment spans are never rewritten") {
    // wrap trigger-heavy content in comments at random whitespace points:
    // the comment text must come through verbatim
    val genWithComments: Gen[String] = for {
      stmt <- genStatement
      c <- genComment
    } yield stmt.replaceFirst(" FROM ", s" ${c.stripSuffix("\n")} FROM ")
    check(Prop.forAll(genWithComments) { s =>
      def comments(x: String): Seq[String] =
        ("""/\*.*?\*/""".r.findAllIn(x).toSeq)
      comments(SqlRewrite.preprocess(s)) == comments(s)
    })
  }
}
