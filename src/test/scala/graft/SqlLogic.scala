package graft

/** Minimal sqllogictest parser for the reference's `.test` files
  * (duckdb-flavored dialect: row-per-line expected blocks with
  * tab-separated columns, `<REGEX>:` cells, rowsort + result labels,
  * `statement ok|error`, `require`, `load`, `restart`).
  *
  * Parsed structurally — the replayer decides semantics. */
object SqlLogic {

  sealed trait Rec { def line: Int }
  case class Require(what: String, line: Int) extends Rec
  case class Load(path: String, line: Int) extends Rec
  case class Restart(line: Int) extends Rec
  /** `expectError`: None for `statement ok`; Some(messageSubstring —
    * possibly empty) for `statement error`. */
  case class Statement(sql: String, expectError: Option[String], line: Int) extends Rec
  /** `expected`: None when the record carries no value block (label-only
    * differential) or an EMPTY block under a label (the duckdb runner's
    * "compare via label" spelling); Some(lines) otherwise — Some(Nil)
    * means "expect zero rows" (unlabeled empty block). */
  case class Query(sql: String, nCols: Int, rowsort: Boolean,
      label: Option[String], expected: Option[Seq[String]], line: Int) extends Rec

  def parseFile(path: String): Seq[Rec] =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  def parse(text: String): Seq[Rec] = {
    val lines = text.split("\n", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Rec]
    var i = 0
    def blankOrComment(l: String): Boolean =
      l.trim.isEmpty || l.trim.startsWith("#")
    def readBlock(stopAtSeparator: Boolean): Seq[String] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (i < lines.length && lines(i).trim.nonEmpty &&
          !(stopAtSeparator && lines(i).trim == "----")) {
        buf += lines(i); i += 1
      }
      buf.toSeq
    }
    while (i < lines.length) {
      if (blankOrComment(lines(i))) { i += 1 }
      else {
        val hline = i + 1
        val header = lines(i).trim
        val words = header.split("\\s+").toSeq
        i += 1
        words.head match {
          case "loop" =>
            // `loop i 0 4` … `endloop`: replay the body (end-start) times
            // with ${i} substituted (duckdb's runner; reference
            // test/sql/slow/hnsw_reclaim_storage.test_slow:61). Nested
            // loops tracked by depth.
            val (v, lo, hi) = (words(1), words(2).toInt, words(3).toInt)
            val body = scala.collection.mutable.ArrayBuffer.empty[String]
            var depth = 1
            while (i < lines.length && depth > 0) {
              val w = lines(i).trim.split("\\s+").head
              if (w == "loop") depth += 1
              else if (w == "endloop") depth -= 1
              if (depth > 0) { body += lines(i); i += 1 }
            }
            if (depth > 0) throw new IllegalArgumentException(
              s"sqllogictest: unterminated loop at line $hline")
            i += 1 // consume endloop
            val text = body.mkString("\n")
            (lo until hi).foreach { it =>
              out ++= parse(text.replace("${" + v + "}", it.toString))
            }
          case "endloop" =>
            throw new IllegalArgumentException(
              s"sqllogictest: endloop without loop at line $hline")
          case "require" =>
            out += Require(words.tail.mkString(" "), hline)
          case "load" =>
            out += Load(words(1), hline)
          case "restart" =>
            out += Restart(hline)
          case "statement" =>
            val expectErr = words(1) == "error"
            val sql = readBlock(stopAtSeparator = true).mkString("\n")
            var err: Option[String] = None
            if (i < lines.length && lines(i).trim == "----") {
              i += 1
              err = Some(readBlock(stopAtSeparator = false)
                .mkString("\n").trim)
            }
            out += Statement(sql,
              if (expectErr) Some(err.getOrElse("")) else None, hline)
          case "query" =>
            val nCols = words(1).length
            val rowsort = words.lift(2).contains("rowsort")
            val label =
              if (rowsort) words.lift(3)
              else words.lift(2) // e.g. `query I mylabel`
            val sql = readBlock(stopAtSeparator = true).mkString("\n")
            var expected: Option[Seq[String]] = None
            if (i < lines.length && lines(i).trim == "----") {
              i += 1
              val vals = readBlock(stopAtSeparator = false)
              // an empty block under a label = "compare via label"
              expected =
                if (vals.isEmpty && label.isDefined) None else Some(vals)
            }
            out += Query(sql, nCols, rowsort, label, expected, hline)
          case other =>
            throw new IllegalArgumentException(
              s"sqllogictest: unknown record '$other' at line $hline")
        }
      }
    }
    out.toSeq
  }
}
