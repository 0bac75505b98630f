package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines —
  * tokenization, token counting, shingling, hashing, quality scoring,
  * language ID. Extensions beyond the reference surface (SURVEY.md §7 step 6).
  *
  * Everything here is built from Spark SQL higher-order functions
  * (`transform` / `aggregate` / `filter`) so it stays inside whole-stage
  * codegen — no UDFs, no serialization boundary, and the identical arithmetic
  * can be replayed in DuckDB for the oracle comparison.
  *
  * The shared hash is a base-31 polynomial rolling hash over character
  * codepoints, mod 1e9+7. All intermediates fit i64: acc < 2^30, acc*31+c <
  * 2^35; the MinHash permutation product a*s < (2^30)^2 < 2^63.
  */
object TextFunctions {

  /** Modulus for all rolling hashes (fits products in i64). */
  val Prime = 1000000007L

  /** `(expr)` strings are used instead of the Scala lambda API so the exact
    * same text can be pasted into DuckDB oracle SQL (grammar is shared).
    */
  private def e(s: String): Column = expr(s)

  /** Whitespace tokens of a single-space-separated text column. */
  def tokensExpr(c: String): String = s"split($c, ' ')"
  def tokens(c: String): Column = e(tokensExpr(c))

  /** Whitespace token count. */
  def tokenCount(c: String): Column = size(tokens(c))

  /** BPE-ish subword count: runs of letters, digits, or single punctuation —
    * the standard pre-tokenizer shape (one regex, codegen'd, no UDF).
    */
  def bpeTokenCountExpr(c: String): String =
    s"size(regexp_extract_all($c, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', 0))"
  def bpeTokenCount(c: String): Column = e(bpeTokenCountExpr(c))

  /** Character codepoints as BIGINTs (ASCII ⇒ identical to UTF-8 bytes). */
  def charCodesExpr(c: String): String =
    s"transform(split($c, ''), ch -> CAST(ascii(ch) AS BIGINT))"

  /** Base-31 polynomial rolling hash of the whole string, mod 1e9+7 —
    * the document fingerprint. DuckDB replica:
    * `list_reduce(list_prepend(0, list_transform(string_split(c,''),
    *   ch -> ascii(ch))), (acc,ch) -> (acc*31+ch) % 1000000007)`.
    */
  def fingerprintExpr(c: String): String =
    s"aggregate(${charCodesExpr(c)}, CAST(0 AS BIGINT), (acc, ch) -> (acc * 31 + ch) % $Prime)"
  def fingerprint(c: String): Column = e(fingerprintExpr(c))

  /** Token n-gram shingles as strings (`n` consecutive tokens joined by a
    * space); empty array when the document has fewer than n tokens.
    */
  def tokenShinglesExpr(c: String, n: Int): String = {
    val toks = tokensExpr(c)
    val joined = (0 until n).map(k => s"element_at($toks, i + $k)").mkString("concat_ws(' ', ", ", ", ")")
    s"""CASE WHEN size($toks) >= $n
       |THEN transform(sequence(1, size($toks) - ${n - 1}), i -> $joined)
       |ELSE array() END""".stripMargin.replaceAll("\n", " ")
  }

  /** Character n-gram shingles (sliding substrings of length n). */
  def charNgramsExpr(c: String, n: Int): String =
    s"""CASE WHEN length($c) >= $n
       |THEN transform(sequence(1, length($c) - ${n - 1}), i -> substring($c, i, $n))
       |ELSE array() END""".stripMargin.replaceAll("\n", " ")

  /** Distinct hashed shingle set: each shingle string → polyhash i64. */
  def hashedShingleSetExpr(shingles: String): String =
    s"""array_distinct(transform($shingles,
       |sh -> aggregate(transform(split(sh, ''), ch -> CAST(ascii(ch) AS BIGINT)),
       |CAST(0 AS BIGINT), (acc, ch) -> (acc * 31 + ch) % $Prime)))""".stripMargin
      .replaceAll("\n", " ")

  /** Jaccard similarity of two pre-distinct i64 array columns. */
  def jaccard(a: Column, b: Column): Column = {
    // bind the intersection ONCE: Catalyst does not reliably CSE the two
    // size(array_intersect) calls, and the intersection is the expensive
    // half of every pairwise-similarity evaluation
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  // --- quality scoring -----------------------------------------------------

  /** Language-agnostic quality signals, one struct column:
    * n_chars, n_tokens, avg_token_len, type_token_ratio (distinct/total
    * tokens), stopword_ratio (English function words), alpha_ratio.
    * These are the standard cheap pre-filters of web-scale corpus cleaning.
    */
  def qualitySignals(c: String): Column = {
    val toks = tokensExpr(c)
    struct(
      length(col(c)).cast("long").as("n_chars"),
      e(s"CAST(size($toks) AS BIGINT)").as("n_tokens"),
      e(s"CAST(length($c) - size($toks) + 1 AS DOUBLE) / size($toks)").as("avg_token_len"),
      e(s"CAST(size(array_distinct($toks)) AS DOUBLE) / size($toks)").as("type_token_ratio"),
      e(s"CAST(size(filter($toks, t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / size($toks)")
        .as("stopword_ratio"),
      e(s"CAST(length(regexp_replace($c, '[^A-Za-z ]', '')) AS DOUBLE) / length($c)")
        .as("alpha_ratio"))
  }

  /** Composite quality score in [0,1]-ish: rewards mid-length docs with
    * diverse vocabulary and a natural stopword rate. Deterministic arithmetic
    * only (no randomness), so the DuckDB oracle reproduces it bit-for-bit.
    */
  def qualityScore(signals: Column): Column = {
    val lenScore = least(signals("n_tokens").cast("double") / 100.0, lit(1.0))
    val diversity = signals("type_token_ratio")
    val stop = signals("stopword_ratio")
    val stopScore = lit(1.0) - abs(stop - lit(0.08)) // natural text ≈ 8% function words
    (lenScore * 0.3 + diversity * 0.4 + stopScore * 0.3).as("quality_score")
  }

  // --- language identification --------------------------------------------

  /** Language-distinctive function words (the n-gram-heuristic approach:
    * count marker-word occurrences per language, argmax with fixed
    * tie-break order en > de > fr > es, 'und' for unknown → 'en' fallback
    * handled by the ordering itself).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "est"),
    "es" -> Seq("el", "los", "que", "es"))

  /** Occurrences of each marker as a whole token, summed per language. */
  def langScore(c: String, markers: Seq[String]): Column = {
    val set = markers.map(m => s"'$m'").mkString(", ")
    e(s"CAST(size(filter(${tokensExpr(c)}, t -> t IN ($set))) AS BIGINT)")
  }

  /** Predicted language code; every tie is broken by declaration order. */
  def langId(c: String): Column = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> langScore(c, ms) }
    // argmax with strict > against all later candidates, first-wins on ties
    val best = scores.zipWithIndex.foldRight(lit("und")) {
      case (((lang, score), i), elseCol) =>
        val laterBeats = scores.drop(i + 1).map(_._2)
        val isMax = laterBeats.foldLeft(score > 0) { (acc, other) => acc && score >= other }
        when(isMax, lit(lang)).otherwise(elseCol)
    }
    best
  }
}
