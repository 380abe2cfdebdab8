package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for the training-data pipeline: tokenization,
  * quality scoring, language ID, fingerprinting. All built from
  * codegen-friendly higher-order functions (`transform`/`filter`/`aggregate`)
  * — no UDFs — so the whole document pass stays in one WholeStageCodegen.
  */
object TextOps {

  /** Whitespace tokens (documents are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * punctuation — a crude proxy for tokenizer load. */
  val BpeRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeRe), lit(0)))

  /** Distinct n-token shingles. Empty when the document has < n tokens
    * (Spark's sequence() runs DESCENDING when start > stop — guard it). */
  def shingles(text: Column, n: Int): Column = {
    val tk = tokens(text)
    when(size(tk) >= n,
      array_distinct(transform(
        sequence(lit(1), size(tk) - (n - 1)),
        i => concat_ws(" ", slice(tk, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  val Stopwords = Seq("the", "a", "of", "to", "and", "in", "is")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(Stopwords)))

  /** Marker vocabularies for the n-gram language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "que"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(markers)))

  /** Predicted language: highest marker score, ties resolved by the fixed
    * priority order of LangMarkers (en > de > es > fr), 'und' (undetermined)
    * when no marker hits. CJK presence short-circuits to 'zh'.
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, m) => l -> langScore(text, m) }
    val best = scores.tail.foldLeft(scores.head._2)((acc, s) => greatest(acc, s._2))
    val pick = scores.foldRight(lit("und")) { case ((l, s), els) =>
      when(s === best && best > 0, l).otherwise(els)
    }
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh").otherwise(pick)
  }

  /** Document fingerprint: md5 of the normalized text (lowercase, collapsed
    * whitespace), truncated to 16 hex chars. */
  def fingerprint(text: Column): Column =
    substring(md5(regexp_replace(lower(text), "\\s+", " ")), 1, 16)
}
