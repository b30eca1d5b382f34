package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the `documents`
  * table. Everything here is either pure `org.apache.spark.sql.functions`
  * (codegen'd, pushdown-friendly) or a tight scala UDF where the logic is
  * genuinely custom (language ID, rolling-hash fingerprint).
  */
object TextOps {

  /** Whitespace token count, expressible identically in ANSI SQL (DuckDB
    * oracle: CASE WHEN trim(text)='' THEN 0 ELSE
    * length(regexp_split_to_array(trim(text),'\s+')) END).
    */
  def tokenCountCol(text: Column): Column =
    when(trim(text) === "", lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  def withTokenCount(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_tokens", tokenCountCol(col(textCol)))

  /** Quality-score columns: length, words, punctuation count, digit count,
    * uppercase ratio proxy, mean word length. Integer-valued where the
    * DuckDB oracle compares exactly.
    */
  def withQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_c", length(t))
      .withColumn("n_words", tokenCountCol(t))
      .withColumn("n_punct", length(t) - length(regexp_replace(t, "[!-/:-@\\[-`{-~]", "")))
      .withColumn("n_digits", length(t) - length(regexp_replace(t, "[0-9]", "")))
      .withColumn("n_upper", length(t) - length(regexp_replace(t, "[A-Z]", "")))
  }

  // ------------------------------------------------------------ language ID

  /** Tiny deterministic stopword tables for the n-gram/stopword heuristic.
    * Public-knowledge lists (most frequent function words).
    */
  val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "that", "it", "was",
      "for", "on", "are", "with", "as", "be", "this", "have", "not", "at"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine",
      "zu", "den", "von", "im", "auf", "für", "des", "sich", "dem", "als", "auch"),
    "fr" -> Set("le", "la", "les", "et", "de", "des", "un", "une", "est", "que",
      "pour", "dans", "qui", "sur", "pas", "au", "ce", "il", "avec", "son"),
    "es" -> Set("el", "la", "los", "las", "y", "de", "que", "en", "un", "una",
      "es", "por", "con", "para", "del", "se", "no", "su", "al", "lo"))

  /** Score a text against each language's stopword table; best count wins
    * ("und" for unknown/tie-at-zero). Deterministic.
    */
  def detectLang(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val toks = text.toLowerCase.split("[^\\p{L}]+").iterator.filter(_.nonEmpty).take(2000)
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    for (t <- toks; (lang, set) <- stopwords if set.contains(t))
      counts(lang) = counts.getOrElse(lang, 0) + 1
    if (counts.isEmpty) "und"
    else counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
  }

  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val f = udf((s: String) => detectLang(s))
    df.withColumn("lang_pred", f(col(textCol)))
  }

  // ---------------------------------------------------------- fingerprinting

  /** 64-bit polynomial rolling hash over the whitespace-normalized text
    * (document fingerprint for exact-after-normalization dedup).
    */
  def fingerprint64(text: String): Long = {
    if (text == null) return 0L
    var h = 1469598103934665603L // FNV offset basis
    var lastWs = true
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f'
      if (isWs) { lastWs = true }
      else {
        if (lastWs && h != 1469598103934665603L) { h ^= ' '.toLong; h *= 1099511628211L }
        h ^= c.toLong
        h *= 1099511628211L
        lastWs = false
      }
      i += 1
    }
    h
  }

  def withFingerprint(df: DataFrame, textCol: String = "text"): DataFrame = {
    val f = udf((s: String) => fingerprint64(s))
    df.withColumn("fp64", f(col(textCol)))
  }
}
