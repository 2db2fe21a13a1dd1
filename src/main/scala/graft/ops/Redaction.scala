package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PII scrubbing for training-data pipelines: detect + redact emails, phone
  * numbers, and IPv4 addresses with typed placeholder tokens.
  *
  * Pure column algebra over regexes drawn from the Java∩RE2 common subset
  * (character classes, bounded repetition, \d — no backrefs, no lookaround),
  * so every op replays exactly in DuckDB SQL (`regexp_replace(..., 'g')` —
  * DuckDB replaces first-match-only by default, Spark globally). Narrow,
  * shuffle-free, whole-stage-codegen'd; at 100 TB this is a map-only pass.
  */
object Redaction {

  /** (pattern, placeholder) in application order. Email before phone so the
    * digits inside a local-part are consumed as email, not phone. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}-\\d{3,4}\\b", "<PHONE>"))

  /** Matches of one PII kind — the count-only native form of
    * `size(regexp_extract_all(text, p, 0))` (same Matcher.find loop, no
    * per-match array; graft.functions.RegexpMatchCount). */
  def piiCount(text: Column, kind: String): Column = {
    val p = patterns.find(_._1 == kind)
      .getOrElse(sys.error(s"unknown PII kind: $kind"))._2
    graft.functions.RegexpMatchCount.column(text, p)
  }

  /** Text with every PII kind replaced by its placeholder token. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, p, token)) =>
      regexp_replace(c, p, token)
    }

  /** All three PII counts (over the ORIGINAL text) plus the chained
    * redaction in ONE native pass — struct(counts ARRAY<BIGINT> in
    * [[patterns]] order, red STRING). Bit-identical to [[piiCount]] ×3 +
    * [[redact]] (differential-spec pinned, RedactionSpec): same compiled
    * patterns, same find loops, same left-to-right replace fold — but one
    * UTF8String conversion and 5 regex passes per doc instead of six
    * independent expression evaluations. */
  def redactWithCounts(text: Column): Column =
    graft.functions.RedactWithCounts.column(text,
      patterns.map { case (_, p, token) => (p, token) })

  /** Index of `kind` in [[patterns]] — the counts-array slot
    * [[redactWithCounts]] put it in. */
  def kindIndex(kind: String): Int = {
    val i = patterns.indexWhere(_._1 == kind)
    require(i >= 0, s"unknown PII kind: $kind")
    i
  }
}
