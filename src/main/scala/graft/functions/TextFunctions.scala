package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar ops for the LLM-pipeline extension operators
  * (SURVEY.md §2.9): tokenization, shingling, fingerprinting, quality
  * signals, language-ID profiles. All are pure column expressions
  * (codegen-friendly, no UDFs) so they stay inside whole-stage codegen.
  */
object TextFunctions {

  /** Whitespace tokens of lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** n-word shingles (order-sensitive token n-grams), empty when the doc
    * has fewer than n tokens. Built with transform+sequence — note
    * sequence(1, 0) in Spark yields a *descending* range, so the short-doc
    * case must be guarded explicitly.
    *
    * TEST-FIXTURE ONLY: higher-order functions are interpreted (no
    * codegen) and the outer-scope token array referenced inside the
    * lambda is re-evaluated per element — O(tokens²) per document. Hot
    * paths use the native expressions (shingleHashes, winnowFingerprints).
    */
  def shingles(text: Column, n: Int): Column = {
    val l = tokens(text)
    when(size(l) >= n,
      transform(sequence(lit(1), size(l) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(l, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  def distinctShingles(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** Distinct n-shingles as 64-bit FNV-1a hashes, via the native codegen
    * expression (org.apache.spark.sql.graft.ShingleHash64) — the hot-path
    * form: the expression-tree shingle builder above runs interpreted
    * higher-order lambdas (~36µs/shingle measured), and the earlier
    * Scala-UDF form paid String/Array converter boxing per row. Hash
    * identity stands in for string identity (collision odds ~n²/2^64).
    * Null text hashes to null (explode treats it like the empty set).
    */
  def shingleHashes(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.TextNative.shingleHash64(text, n)

  /** Bag-normalized document fingerprint: md5 of the space-joined sorted
    * distinct token set. Identical token bags → identical fingerprint,
    * robust to word order — the cheap first tier of near-dedup. Null
    * text → null fingerprint (concat_ws would silently turn the null
    * token array into '' and collide every null doc with every EMPTY
    * doc — and diverge from the oracle's null-propagating
    * array_to_string).
    */
  def fingerprint(text: Column): Column =
    when(text.isNull, lit(null).cast("string"))
      .otherwise(md5(concat_ws(" ", array_sort(array_distinct(tokens(text))))))

  /** BPE-ish subword-boundary tokenization: letter runs, digit runs, and
    * single punctuation marks — the regex shape BPE pre-tokenizers split
    * on before merges. Same pattern string is valid RE2 for the DuckDB
    * oracle.
    */
  val BpeTokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenRe), lit(0)))

  /** Winnowing fingerprint set (Schleimer, Wilkerson & Aiken, SIGMOD'03):
    * hash every order-sensitive 3-token shingle, slide a window of
    * `w` consecutive shingle hashes, keep each window's minimum — the
    * distinct kept set is the document's fingerprint. Guarantees any
    * shared run of w+2 tokens between two docs shares a fingerprint,
    * while storing ~2/(w+1) of the hashes. Hash = md5 hex (lexicographic
    * min), available bit-identically in the DuckDB oracle.
    *
    * Backed by the native one-pass expression (TextNative
    * .WinnowFingerprint): the expression-tree form (transform over
    * sequence + array_min(slice)) is an interpreted higher-order function
    * that re-evaluates the outer-scope shingle array PER WINDOW —
    * O(len²) per document, minutes per partition on real documents.
    * Null text → empty set (matches the SQL oracle's ELSE [] branch).
    */
  def winnowFingerprints(text: Column, w: Int): Column =
    coalesce(org.apache.spark.sql.graft.TextNative.winnowFingerprint(text, 3, w),
      array().cast("array<string>"))

  /** English-ish stopword count (fixed public profile). */
  val StopwordsRe = "\\b(the|a|and|of|to|in|is)\\b"
  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(StopwordsRe), lit(0)))

  /** Fraction of characters that are not alphanumeric-or-space. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))) /
      length(text).cast("double")

  /** Small fixed stopword profiles for language ID (public common-word
    * lists). Deliberately overlapping (la/de/que…) — scoring is by total
    * profile hits with lexicographic tie-break.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "los", "de", "que", "es", "y", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "dans", "une"),
    "it" -> Seq("il", "la", "di", "che", "e", "per", "un", "sono"))

  /** The same profiles as a SQL VALUES list for the DuckDB oracle. */
  def langProfilesValuesSql: String =
    LangProfiles.flatMap { case (l, ws) => ws.map(w => s"('$w','$l')") }.mkString(", ")
}
