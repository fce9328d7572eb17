package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Portable.{Dialect, Spark => SparkD, Duck => DuckD}

/** Text-analysis operators for the training-data-pipeline tier: language ID
  * (stopword n-gram heuristic), quality scoring, token counting, and document
  * fingerprinting. Every operator is a pure column expression (codegen-able,
  * shuffle-free, embarrassingly parallel over documents — the right shape for
  * a 100 TB corpus scan), and each has a DuckDB rendering of the identical
  * arithmetic for the oracle.
  */
object TextAnalysis {

  /** Stopword profiles for the rule-based language-ID heuristic. Deterministic
    * tie-break: priority order en > de > fr > es, 'und' (undetermined) when no
    * profile matches at all. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "una"))

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Per-language stopword hit count over a tokens-array column. */
  def langCount(d: Dialect, toksCol: String, lang: String): String = {
    val words = profiles.toMap.apply(lang)
    d.arraySize(d.filter(toksCol, "t", s"t IN ${inList(words)}"))
  }

  /** argmax over the 4 per-language count columns, priority-ordered ties. */
  def langPick(en: String, de: String, fr: String, es: String): String =
    s"""CASE WHEN greatest($en, $de, $fr, $es) = 0 THEN 'und'
       | WHEN $en >= greatest($de, $fr, $es) THEN 'en'
       | WHEN $de >= greatest($fr, $es) THEN 'de'
       | WHEN $fr >= $es THEN 'fr' ELSE 'es' END""".stripMargin

  /** Total characters across tokens (excludes whitespace). */
  def tokenChars(d: Dialect, toksCol: String): String =
    d.listSum(d.transform(toksCol, "t", "CAST(length(t) AS BIGINT)"))

  /** Quality score: logistic over log-length and stopword density. The raw
    * (unrounded) components feed the logistic; only the outputs are rounded. */
  def qualityScore(nToks: String, stopHits: String): String =
    s"round(1.0 / (1.0 + exp(-(0.2 * ln(1.0 + $nToks) + " +
      s"2.0 * ($stopHits / (1.0 * $nToks)) - 1.0))), 4)"

  /** Regex token count ("BPE-ish": runs of alnum, else single symbols). */
  def regexTokens(d: Dialect, textCol: String): String = d match {
    case SparkD => s"size(regexp_extract_all($textCol, '[a-z0-9]+|[^a-z0-9 ]', 0))"
    case DuckD  => s"length(regexp_extract_all($textCol, '[a-z0-9]+|[^a-z0-9 ]'))"
  }

  // ------------------------------------------------------ Spark DataFrames

  /** doc_id, per-language counts, lang_pred — via the one-pass [[LangStats]]
    * kernel (the declarative form runs six HOF array traversals per doc;
    * KernelParitySpec pins kernel ≡ declarative). */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        TextHashFunctions.langStats(col(textCol)).as("st"))
      .select(col("doc_id") +:
        profiles.zipWithIndex.map { case ((l, _), i) =>
          element_at(col("st"), i + 1).cast("int").as(s"${l}_hits") }: _*)
      .withColumn("lang_pred",
        expr(langPick("en_hits", "de_hits", "fr_hits", "es_hits")))

  /** doc_id, n_tokens, avg_token_len, stopword_ratio, quality — same
    * [[LangStats]] single pass feeding the unchanged formulas. */
  def quality(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        TextHashFunctions.langStats(col(textCol)).as("st"))
      .select(col("doc_id"),
        element_at(col("st"), profiles.length + 1).cast("int").as("n_tokens"),
        element_at(col("st"), profiles.length + 2).as("tok_chars"),
        element_at(col("st"), 1).cast("int").as("en_hits"))
      .where(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        round(col("tok_chars") / (lit(1.0) * col("n_tokens")), 4).as("avg_token_len"),
        round(col("en_hits") / (lit(1.0) * col("n_tokens")), 4).as("stopword_ratio"),
        expr(qualityScore("n_tokens", "en_hits")).as("quality"))

  /** doc_id, lang_pred, quality (token-bearing docs only) from ONE LangStats
    * pass — the curation composite's [[languageId]] ⋈ [[quality]] without
    * scanning the corpus twice, running the kernel twice, or paying a
    * doc-level shuffled join to recombine two projections of the same row. */
  def langQuality(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        TextHashFunctions.langStats(col(textCol)).as("st"))
      .select(col("doc_id") +:
        (profiles.zipWithIndex.map { case ((l, _), i) =>
          element_at(col("st"), i + 1).cast("int").as(s"${l}_hits") } :+
          element_at(col("st"), profiles.length + 1).cast("int").as("n_tokens")): _*)
      .where(col("n_tokens") > 0)
      .select(col("doc_id"),
        expr(langPick("en_hits", "de_hits", "fr_hits", "es_hits")).as("lang_pred"),
        expr(qualityScore("n_tokens", "en_hits")).as("quality"))

  /** doc_id, ws_tokens, re_tokens, n_chars. */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      expr(s"size(${Portable.tokens(SparkD, textCol)})").cast("bigint").as("ws_tokens"),
      expr(regexTokens(SparkD, textCol)).cast("bigint").as("re_tokens"),
      length(col(textCol)).cast("bigint").as("n_chars"))

  /** doc_id, fp — order-sensitive rolling-hash document fingerprint, via the
    * one-pass [[Fingerprint]] codegen expression. */
  def fingerprints(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), TextHashFunctions.fingerprint(col(textCol)).as("fp"))
}
