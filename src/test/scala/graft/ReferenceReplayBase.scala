package graft

import graft.index.IndexCatalog

/** Shared machinery for replaying the reference's sqllogictest files
  * through [[GraftSql]]: statements execute (errors matched by message),
  * query results compare against the files' inline expected values,
  * `rowsort` and result LABELS (with/without-index differentials) are
  * honored, EXPLAIN expectations map the reference's plan markers onto
  * this engine's operators, and `load`/`restart` run the persistent-
  * database lifecycle (armed table durability + index checkpoint/WAL
  * restore). Subclasses choose WHICH files replay and under which
  * documented [[Deviation]]s ([[ReferenceSuiteSpec]] = the whole suite at
  * driver scale; [[ReclaimScaleSpec]] = the reclaim loop at the
  * reference's full 1M rows, opt-in). */
abstract class ReferenceReplayBase extends GraftSparkSpec {

  graft.plans.GraftExtensions.install(spark)

  protected case class Deviation(patches: Seq[(String, String)] = Nil,
      unorderedListCells: Boolean = false, sqliteBooleans: Boolean = false,
      reason: String = "")

  protected case class ReplayStats(records: Int, statements: Int,
      errorStatements: Int, valueCheckedQueries: Int, labelChecks: Int,
      deviationsApplied: Int)

  /** Per-statement hook (successful `statement ok` records only): lets a
    * subclass time specific statements — e.g. the 1M replay records each
    * CREATE INDEX build's wall-clock for the throughput envelope. */
  protected def onStatement(sql: String, seconds: Double): Unit = ()

  // the reference's EXPLAIN markers → this engine's operator spellings
  private val planMarkers: Seq[(String, String)] = Seq(
    "HNSW_INDEX_SCAN" -> "HnswIndexScan",
    "HNSW_INDEX_JOIN" -> "HnswKnnJoin")

  private val CreateTableName =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\b.*""".r

  private def render(v: Any): String = v match {
    case null => "NULL"
    case b: Boolean => if (b) "true" else "false"
    case s: scala.collection.Seq[_] =>
      "[" + s.map(render).mkString(", ") + "]"
    case a: Array[_] => render(a.toSeq)
    case other => other.toString
  }

  private def canonLine(line: String, unorderedLists: Boolean,
      sqliteBooleans: Boolean): String = {
    val cells = line.split("\t", -1).map {
      // duckdb's runner accepts sqlite-style 1/0 for booleans (the reclaim
      // suite's block-count comparisons expect `1`); canonicalize both
      // spellings so rendered `true` matches an expected `1` — but ONLY
      // where the file's Deviation opts in, so a type regression rendering
      // booleans where ints are expected still fails everywhere else
      case "true" if sqliteBooleans => "1"
      case "false" if sqliteBooleans => "0"
      case cell if unorderedLists && cell.length >= 2 &&
          cell.head == '[' && cell.last == ']' =>
        "[" + cell.substring(1, cell.length - 1).split(", ", -1).sorted
          .mkString(", ") + "]"
      case cell => cell
    }
    cells.mkString("\t")
  }

  /** duckdb's runner prefixes errors with their exception class
    * ("Binder Error: ") — content match, not class-rendering match. */
  private def normalizeExpectedError(s: String): String =
    s.replaceAll("""(?m)^[A-Za-z]+ Error:\s*""", "").trim

  private def messageChain(e: Throwable): String = {
    val sb = new StringBuilder
    var t: Throwable = e
    while (t != null) { sb.append(t.toString).append("\n"); t = t.getCause }
    sb.toString
  }

  private def translateMarkers(regex: String): String =
    planMarkers.foldLeft(regex) { case (acc, (ref, ours)) =>
      acc.replace(ref, ours)
    }

  private def compareBlock(ctx: String, expected: Seq[String],
      actual: Seq[String], unorderedLists: Boolean,
      sqliteBooleans: Boolean): Unit = {
    assert(expected.size == actual.size,
      s"$ctx row count ${actual.size} != expected ${expected.size}\n" +
        s"expected:\n${expected.mkString("\n")}\nactual:\n${actual.mkString("\n")}")
    expected.zip(actual).foreach { case (e, a) =>
      val (ec, ac) = (e.split("\t", -1), a.split("\t", -1))
      assert(ec.length == ac.length, s"$ctx cell count: '$e' vs '$a'")
      ec.zip(ac).foreach { case (cellE, cellA) =>
        if (cellE.startsWith("<REGEX>:")) {
          val p = java.util.regex.Pattern.compile(
            translateMarkers(cellE.stripPrefix("<REGEX>:")),
            java.util.regex.Pattern.DOTALL)
          assert(p.matcher(cellA).matches(),
            s"$ctx regex '${cellE.stripPrefix("<REGEX>:")}' " +
              s"did not match:\n$cellA")
        } else assert(canonLine(cellE, unorderedLists, sqliteBooleans) ==
          canonLine(cellA, unorderedLists, sqliteBooleans),
          s"$ctx cell '$cellA' != '$cellE'")
      }
    }
  }

  protected def replay(dir: String, f: String, dev: Deviation): ReplayStats = {
    val recs = SqlLogic.parseFile(s"$dir/$f")
    def patch(s: String): String =
      dev.patches.foldLeft(s) { case (acc, (from, to)) => acc.replace(from, to) }
    // inline expected values downstream of an engine RNG draw can never
    // match cross-engine — for those, the files' own LABELS are the check
    val rngData = recs.exists {
      case SqlLogic.Statement(sql, _, _) => sql.contains("random()")
      case _ => false
    }
    val db = java.nio.file.Files.createTempDirectory("graft-slt").toString
    val prevIdxDir = sys.props.get("graft.indexes.dir")
    val prevTabDir = sys.props.get("graft.tables.dir")
    sys.props("graft.indexes.dir") = s"$db/indexes"
    sys.props("graft.tables.dir") = s"$db/tables"
    val tables = recs.collect {
      case SqlLogic.Statement(CreateTableName(t), _, _) => t
    }.distinct
    def dropAll(): Unit = tables.foreach { t =>
      scala.util.Try(if (Graft.isRegisteredTable(t)) Graft.dropTable(spark, t))
      scala.util.Try(spark.catalog.dropTempView(t))
      scala.util.Try(spark.sql(s"DROP TABLE IF EXISTS $t"))
      // an aborted earlier run can leave the warehouse location behind
      // with no catalog entry — CREATE TABLE then fails LOCATION_ALREADY_EXISTS
      scala.util.Try {
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        graft.index.ArtifactIO.deleteRecursive(s"$wh/$t")
      }
    }
    IndexCatalog.clear()
    TableCatalog.disarm()
    dropAll()
    spark.conf.unset(IndexCatalog.PersistenceConfKey)
    spark.conf.unset(IndexCatalog.PersistentDatabaseConfKey)
    spark.conf.unset(IndexCatalog.EfSearchConfKey)
    spark.conf.set(graft.plans.GraftOptimizerGate.ConfKey, "true")
    val labels = scala.collection.mutable.Map.empty[String, Seq[String]]
    var nStmt = 0; var nErrStmt = 0; var nValueChecked = 0
    var nLabelChecks = 0; var nDeviations = 0
    try {
      recs.foreach {
        case SqlLogic.Require(_, _) => () // vss is this engine; vector_size
          // and noforcestorage gate reference build modes with no analog
        case SqlLogic.Load(_, _) =>
          // a load-ed database is persistent: index persistence gated like
          // the reference, table durability armed (write-through manifest)
          // at the bare-CHECKPOINT target — the one dir that IS the
          // database (tables + indexes), which restart below restores from
          spark.conf.set(IndexCatalog.PersistentDatabaseConfKey, "true")
          TableCatalog.arm(s"${IndexCatalog.indexArtifactDir}/checkpoint")
        case SqlLogic.Restart(_) =>
          // what a process restart does: all driver state gone; ONE call
          // brings back tables (manifest + tombstone anti-joins), indexes
          // (artifacts + WAL replay), and storage-family registries
          IndexCatalog.clear()
          Graft.forgetAllTables(spark)
          IndexCatalog.restoreAll(spark,
            s"${IndexCatalog.indexArtifactDir}/checkpoint")
          ()
        case SqlLogic.Statement(sql0, None, line) =>
          val sql = patch(sql0)
          nStmt += 1
          if (sql != sql0) nDeviations += 1
          val t0 = System.nanoTime()
          try { GraftSql.sql(spark, sql).collect(); () }
          catch { case e: Throwable =>
            fail(s"$f:$line statement failed: $sql\n${messageChain(e)}")
          }
          onStatement(sql, (System.nanoTime() - t0) / 1e9)
        case SqlLogic.Statement(sql0, Some(expectErr), line) =>
          val sql = patch(sql0)
          nStmt += 1; nErrStmt += 1
          val e = intercept[Throwable] { GraftSql.sql(spark, sql).collect() }
          val want = normalizeExpectedError(expectErr)
          if (want.nonEmpty) {
            assert(messageChain(e).contains(want),
              s"$f:$line error mismatch:\nwanted: $want\ngot: ${messageChain(e)}")
          }
        case SqlLogic.Query(sql0, nCols, rowsort, label, expected, line) =>
          val sql = patch(sql0)
          val ctx = s"$f:$line"
          val rendered: Seq[String] =
            if (sql.trim.toLowerCase.startsWith("explain")) {
              val inner = sql.trim.substring("explain".length)
              val df = GraftSql.sql(spark, inner)
              Seq("physical_plan\t" +
                df.queryExecution.executedPlan.toString.replace("\n", " "))
            } else {
              val df = GraftSql.sql(spark, sql)
              val rows = df.collect()
              // type-string column counts are enforced only for records
              // that carry inline values (the duckdb runner materializes no
              // compare for label-only records either — and the reference's
              // own hnsw_lateral_join.test:36 declares six columns for a
              // five-column query under a label)
              if (expected.isDefined) {
                assert(df.columns.length == nCols,
                  s"$ctx column count ${df.columns.length} != declared $nCols " +
                    s"(${df.columns.mkString(", ")})")
              }
              rows.toSeq.map(r =>
                (0 until r.length).map(j => render(r.get(j))).mkString("\t"))
            }
          val actual = if (rowsort) rendered.sorted else rendered
          if (sql != sql0) nDeviations += 1
          expected.foreach { exp0 =>
            if (!(rngData && label.isDefined)) {
              // deviation patches apply to expected values too (a scale
              // patch changes both the SQL's constants and the rows they
              // produce — e.g. the reclaim test's probe row)
              val expP = exp0.map(patch)
              val exp = if (rowsort) expP.sorted else expP
              compareBlock(ctx, exp, actual, dev.unorderedListCells,
                dev.sqliteBooleans)
              nValueChecked += 1
            }
          }
          label.foreach { lb =>
            labels.get(lb) match {
              case Some(prev) =>
                val c = (s: Seq[String]) =>
                  s.map(canonLine(_, dev.unorderedListCells,
                    dev.sqliteBooleans))
                assert(c(actual) == c(prev),
                  s"$ctx label '$lb' differential mismatch:\nfirst:\n" +
                    s"${prev.mkString("\n")}\nnow:\n${actual.mkString("\n")}")
                nLabelChecks += 1
              case None => labels(lb) = actual
            }
          }
      }
      ReplayStats(recs.size, nStmt, nErrStmt, nValueChecked,
        nLabelChecks, nDeviations)
    } finally {
      IndexCatalog.clear()
      TableCatalog.disarm()
      dropAll()
      spark.conf.unset(IndexCatalog.PersistenceConfKey)
      spark.conf.unset(IndexCatalog.PersistentDatabaseConfKey)
      spark.conf.unset(IndexCatalog.EfSearchConfKey)
      spark.conf.set(graft.plans.GraftOptimizerGate.ConfKey, "true")
      prevIdxDir match {
        case Some(p) => sys.props("graft.indexes.dir") = p
        case None => sys.props.remove("graft.indexes.dir")
      }
      prevTabDir match {
        case Some(p) => sys.props("graft.tables.dir") = p
        case None => sys.props.remove("graft.tables.dir")
      }
    }
  }
}
