package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, language ID, quality scoring, document fingerprinting.
  *
  * Every op is pure column algebra (whole-stage codegen, no UDFs) and is
  * deliberately built from cross-engine-deterministic primitives (replace
  * counts, integer/double arithmetic, md5) so each has an exact DuckDB
  * oracle. At scale these are narrow transformations: no shuffle at all
  * unless the caller aggregates. */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")).cast(LongType)

  /** BPE-ish pre-tokenizer shape: letter runs, digit runs, single
    * punctuation marks — the boundaries BPE vocabularies split on. Unicode
    * classes (\p{L}, \p{N}) behave identically in Java regex and RE2, so
    * the count is cross-engine exact. */
  val BpeTokenPattern = "\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]"

  def bpeTokenCount(text: Column): Column =
    // count-only native form of size(regexp_extract_all(text, p, 0)): same
    // Matcher.find loop, no per-match array materialization
    graft.functions.RegexpMatchCount.column(text, BpeTokenPattern)

  /** Fraction of characters that are punctuation/symbols (not whitespace,
    * letter, or number). Counting the complement class directly equals
    * deleting [\s\p{L}\p{N}] and measuring what remains (single-codepoint
    * class matches), without allocating the stripped copy. */
  def punctRatio(text: Column, nChars: Column): Column =
    graft.functions.RegexpMatchCount.column(text, "[^\\s\\p{L}\\p{N}]")
      .cast(DoubleType) / nChars.cast(DoubleType)

  /** Common-English-stopword density per whitespace token (reuses the
    * language-ID marker counts). */
  def stopwordRatio(text: Column): Column =
    langScore(text, "en").cast(DoubleType) / tokenCount(text).cast(DoubleType)

  /** Non-overlapping occurrences of `needle` — a native indexOf walk
    * (zero-allocation; the language-ID scan runs 20 of these per doc).
    * Counts exactly what the replace-length idiom consumes. */
  def occurrences(text: Column, needle: String): Column =
    graft.functions.SubstringCount.column(text, needle)

  /** The replace-length formulation of [[occurrences]] (exact, portable) —
    * kept as the differential-spec reference for the native count and as
    * the shape the SQL oracles replay. */
  private[graft] def occurrencesDeclarative(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) / needle.length)
      .cast(LongType)

  /** Distinctive stopword markers per language. Real pipelines plug in real
    * lexicons; the op contract is the heuristic shape: per-language marker
    * counts → argmax with deterministic tie-break, "und" when nothing hits. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " und ", " nicht ", " das "),
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "es" -> Seq(" el ", " que ", " los ", " una "),
    "fr" -> Seq(" le ", " les ", " est ", " une "),
    "zh" -> Seq("的", "是", "了", "在"))

  /** Marker-count score for one language over ' '+text+' '. */
  def langScore(text: Column, lang: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    langMarkers.toMap.apply(lang)
      .map(m => occurrences(padded, m))
      .reduce(_ + _)
  }

  /** Heuristic language ID: argmax of marker counts, ties broken by language
    * code order, "und" when all scores are zero.
    *
    * Shape matters: a naive max-fold nests `when(s2 > s1, ...)` and doubles
    * the expression tree per language (2^N growth — measured 5x slower at
    * sf0.1). `greatest` + a flat when-chain keeps every score expression at
    * O(1) occurrences, which codegen subexpression elimination then shares. */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, _) => (lang, langScore(text, lang)) }
    val m = greatest(scores.map(_._2): _*)
    // foldRight: the earliest language's `when` sits outermost, so it wins ties
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(m > 0 && s === m, lit(lang)).otherwise(acc)
    }
  }

  /** Quality signals + a linear score in [0,1]. Pure +,*,/ and min/max —
    * no transcendentals, so double results are bit-identical across engines. */
  def qualityScore(text: Column, nChars: Column): Column = {
    val nTokens = tokenCount(text)
    val charsPerToken = nChars.cast(DoubleType) / nTokens.cast(DoubleType)
    // digit count via the native class-match count (== stripping non-digits
    // and measuring the remainder, without allocating the stripped copy)
    val digits = graft.functions.RegexpMatchCount.column(text, "[0-9]")
      .cast(DoubleType)
    val digitRatio = digits / nChars.cast(DoubleType)
    // plausible-word-length band [3,12] scores high; digit soup scores low
    val lenScore = greatest(lit(0.0),
      lit(1.0) - abs(charsPerToken - lit(6.0)) / lit(6.0))
    val digitScore = greatest(lit(0.0), lit(1.0) - digitRatio * lit(4.0))
    least(lit(1.0), lenScore * lit(0.7) + digitScore * lit(0.3))
  }

  /** Canonical-content fingerprint: md5 of lowercased, whitespace-collapsed
    * text. Two documents with the same fingerprint are exact near-dupes up to
    * case/whitespace. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling-hash fingerprint (Rabin–Karp over char k-grams): hash every
    * k-char window with a polynomial hash mod a prime, keep the MINIMUM —
    * robust to local edits the way md5-of-whole-text is not (an edit
    * changes only the windows covering it; the min usually survives).
    * Evaluated by the native [[graft.functions.RollingMinHash]] expression;
    * the math replays exactly in DuckDB SQL (integer arithmetic only).
    * Texts shorter than k hash their whole content. */
  def rollingFingerprint(text: Column, k: Int = 8): Column =
    graft.functions.RollingMinHash.column(lower(trim(text)), k)

  /** Gopher-style repetition / diversity signals (Rae et al. 2021, app. A —
    * the published repetition filters adapted to word granularity):
    * type-token ratio, top-word mass fraction, duplicate-bigram fraction,
    * mean word length.
    *
    * Distributed shape: ALL stats are per-row array algebra over the split
    * word list — two narrow projections, ZERO shuffles. The original
    * formulation (posexplode → two word-keyed groupBys → a per-doc window
    * with `lead`) moved every token through two exchanges and a sort and
    * was the suite's worst honest scaler (6.5× for 10× data at sf1);
    * per-doc state here is O(words-in-doc), never cross-row, so the plan
    * is embarrassingly parallel at 100 TB. Top-word count is sort +
    * run-length (O(n log n) per doc, independent of distinctness — the
    * O(distinct·n) transform/filter shape would degrade on low-diversity
    * spam docs, the exact documents a repetition filter exists to catch).
    *
    * Output: (idCol, n_words BIGINT, distinct_word_ratio, top_word_frac,
    * dup_2gram_frac, mean_word_len — all DOUBLE). Ratios are single int/int
    * divisions (bit-exact cross-engine). */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // NULL-text docs produce NO output row (the contract of the original
    // explode→groupBy formulation; without the filter the per-row algebra
    // would emit an internally inconsistent row — NULL ratios but
    // dup_2gram_frac=0.0 from greatest(n-1, 0))
    val nonNull = docs.where(col(textCol).isNotNull)
    // all five counts in one native codegen'd loop per doc
    // (graft.functions.WordRepetitionStats; the interpreted-HOF formulation
    // below is kept as the differential-spec reference) — exact integers
    // either way, so the ratio math and the SQL oracle are unchanged
    val stage2 = nonNull
      .select(col(idCol), graft.functions.WordRepetitionStats.column(
        split(trim(col(textCol)), "\\s+")).as("__st"))
      .select(col(idCol),
        col("__st.n_words").as("n_words"),
        col("__st.n_distinct_words").as("n_distinct_words"),
        col("__st.top_word_cnt").as("top_word_cnt"),
        col("__st.sum_word_len").as("sum_word_len"),
        col("__st.n_distinct_bigrams").as("n_distinct_bigrams"),
        greatest(col("__st.n_words") - 1, lit(0L)).as("n_bigrams"))
    finishSignals(stage2, idCol)
  }

  /** The declarative (interpreted-HOF) formulation of
    * [[repetitionSignals]] — the differential-spec reference the native
    * expression is pinned against. Identical output contract. */
  private[graft] def repetitionSignalsDeclarative(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nonNull = docs.where(col(textCol).isNotNull)
    // stage 1: materialize the split ONCE behind an alias — six consumers
    // below; CollapseProject keeps a non-cheap multi-consumer producer in
    // its own Project, so the regex split runs once per row
    val stage1 = nonNull.select(col(idCol), split(trim(col(textCol)), "\\s+").as("ws"))
    val ws = col("ws")
    val n = size(ws)
    // longest run of equal words in sorted order == max per-word count
    val topWordCnt = aggregate(
      array_sort(ws),
      struct(lit(null).cast(StringType).as("prev"), lit(0).as("run"),
        lit(0).as("best")),
      (s, x) => {
        val run = when(s.getField("prev").isNotNull && x === s.getField("prev"),
          s.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(s.getField("best"), run).as("best"))
      },
      s => s.getField("best"))
    // adjacent word pairs: ws[i] || ' ' || ws[i+1] for i in [0, n-2]
    val bigrams = zip_with(slice(ws, lit(1), n - 1), slice(ws, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    val stage2 = stage1.select(
      col(idCol),
      n.cast(LongType).as("n_words"),
      size(array_distinct(ws)).as("n_distinct_words"),
      topWordCnt.as("top_word_cnt"),
      aggregate(ws, lit(0L), (acc, x) => acc + length(x)).as("sum_word_len"),
      when(n >= 2, size(array_distinct(bigrams))).otherwise(lit(0))
        .as("n_distinct_bigrams"),
      greatest(n - 1, lit(0)).as("n_bigrams"))
    finishSignals(stage2, idCol)
  }

  /** Shared ratio tail of both repetition-signal formulations. */
  private def finishSignals(stage2: DataFrame, idCol: String): DataFrame = {
    def ratio(a: Column, b: Column): Column =
      a.cast(DoubleType) / b.cast(DoubleType)
    stage2.select(
      col(idCol),
      col("n_words"),
      ratio(col("n_distinct_words"), col("n_words")).as("distinct_word_ratio"),
      ratio(col("top_word_cnt"), col("n_words")).as("top_word_frac"),
      when(col("n_bigrams") > 0,
        lit(1.0) - ratio(col("n_distinct_bigrams"), col("n_bigrams")))
        .otherwise(lit(0.0)).as("dup_2gram_frac"),
      ratio(col("sum_word_len"), col("n_words")).as("mean_word_len"))
  }

  /** Convenience: annotate a documents DataFrame with all signals. */
  def annotate(docs: DataFrame, textCol: String = "text",
      nCharsCol: String = "n_chars"): DataFrame =
    docs
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol), col(nCharsCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))
}
