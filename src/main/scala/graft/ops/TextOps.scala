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

  /** BPE-style pre-tokenizer regex (GPT-2 shape, simplified to the subset
    * where Java regex and RE2 agree — no lookaheads): contractions, then
    * space-prefixed letter runs / digit runs / punctuation runs, then
    * whitespace runs. Counted via codegen'd regexp_extract_all (no UDF);
    * the DuckDB oracle runs the IDENTICAL pattern.
    */
  val BpeTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+|\\s+"

  def withBpeTokenCount(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_bpe_tokens",
      size(regexp_extract_all(lower(col(textCol)), lit(BpeTokenPattern), lit(0))))

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
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}]+").iterator.filter(_.nonEmpty).take(2000)
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

  /** FNV-1a 64-bit over the UTF codepoints of a string (unsigned arithmetic
    * in a signed Long — wrapping multiply is the same bits). This exact
    * recipe is mirrorable in ANSI SQL (DuckDB: list_reduce over unicode()
    * codepoints with HUGEINT mod-2^64 arithmetic), which is what makes the
    * fingerprint/simhash queries hard-oracle-checkable.
    */
  val FnvOffset: Long = -3750763034362895579L // 14695981039346656037 as signed
  val FnvPrime: Long = 1099511628211L

  def fnv1a64(s: String): Long = {
    var h = FnvOffset
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h ^= cp.toLong
      h *= FnvPrime
      i += Character.charCount(cp)
    }
    h
  }

  /** Whitespace-normalize: trim + collapse [ \t\r\n\x0B\f]+ runs to ' '. */
  def normalizeWs(text: String): String = {
    if (text == null) return ""
    val sb = new java.lang.StringBuilder(text.length)
    var lastWs = true
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\u000B' || c == '\f'
      if (isWs) lastWs = true
      else {
        if (lastWs && sb.length > 0) sb.append(' ')
        sb.append(c)
        lastWs = false
      }
      i += 1
    }
    sb.toString
  }

  /** Document fingerprint: FNV-1a 64 of the whitespace-normalized text
    * (exact-after-normalization dedup key; DuckDB-mirrorable, see fnv1a64).
    */
  def fingerprint64(text: String): Long = fnv1a64(normalizeWs(text))

  def withFingerprint(df: DataFrame, textCol: String = "text"): DataFrame = {
    val f = udf((s: String) => fingerprint64(s))
    df.withColumn("fp64", f(col(textCol)))
  }

  // ------------------------------------------------------------- winnowing

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * FNV-1a hashes of the k-char grams of the normalized lowercased text,
    * then the MINIMUM hash (signed compare) of each w-hash window; the
    * fingerprint set is the distinct selected values, sorted. Guarantees a
    * shared fingerprint for any shared substring of length >= k + w - 1 —
    * the standard partial-overlap dedup primitive. DuckDB-mirrorable
    * (substring FNV + list window mins), so oracle-checkable.
    */
  def winnowFingerprints(text: String, k: Int = 8, w: Int = 4): Array[Long] = {
    val norm = normalizeWs(if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT))
    if (norm.isEmpty) return Array.empty
    // Gram indexing is by CODEPOINT, not UTF-16 unit: the SQL mirror's
    // length()/substring() count codepoints, and slicing by Java chars
    // would split surrogate pairs on astral-plane text (emoji etc.).
    val cps = norm.codePoints().toArray
    if (cps.length < k) return Array(fnv1a64(norm))
    val n = cps.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = fnv1a64(new String(cps, i, k)); i += 1 }
    if (n <= w) return Array(hs.min)
    val sel = scala.collection.mutable.SortedSet.empty[Long]
    i = 0
    while (i + w <= n) {
      var m = hs(i)
      var j = i + 1
      while (j < i + w) { if (hs(j) < m) m = hs(j); j += 1 }
      sel += m
      i += 1
    }
    sel.toArray
  }

  /** (n_fps, fp_xor) summary columns — order-free integer aggregates of the
    * fingerprint set, comparable bit-for-bit against the SQL oracle.
    */
  def withWinnowing(df: DataFrame, textCol: String = "text",
                    k: Int = 8, w: Int = 4): DataFrame = {
    val f = udf((s: String) => {
      val fps = winnowFingerprints(s, k, w)
      (fps.length.toLong, fps.foldLeft(0L)(_ ^ _))
    })
    df.withColumn("__w", f(col(textCol)))
      .withColumn("n_fps", col("__w._1"))
      .withColumn("fp_xor", col("__w._2"))
      .drop("__w")
  }
}
