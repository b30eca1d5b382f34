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

  // ------------------------------------------------- merges-based BPE (real)

  /** Parse a GPT-2-format merges file ("a b" per line, '#'-comments
    * skipped); line order IS merge priority (rank). Lines without a space
    * (truncated downloads, stray artifacts in real merges.txt files) are
    * skipped rather than crashing the production token-budgeting path.
    */
  def parseMerges(txt: String): Vector[(String, String)] =
    txt.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        val sp = l.split(" ", 2)
        if (sp.length == 2 && sp(0).nonEmpty && sp(1).nonEmpty)
          Some((sp(0), sp(1)))
        else None
      }.toVector

  /** Real byte-pair-encoding of one pre-token against a merge-rank table:
    * start from single characters, repeatedly pick the adjacent pair with
    * the LOWEST rank and merge ALL its occurrences left-to-right (skip
    * after each merge, so "aaa" with (a,a) becomes [aa, a]) — the standard
    * Sennrich/GPT-2 merge loop (char-level rather than byte-level: no
    * byte<->unicode remapping table is needed for counting). Deterministic;
    * terminates (token count strictly decreases).
    */
  def bpeEncode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var toks: Vector[String] = word.map(_.toString).toVector
    var done = false
    while (!done && toks.length > 1) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        val a = toks(bi)
        val b = toks(bi + 1)
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == a && toks(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.result()
      }
    }
    toks
  }

  /** bpeEncode's merge loop is O(len^2) in the worst case (each round is
    * a full scan and a hostile rule chain can force ~len rounds); real
    * tokenizers bound it the same way — no natural-language pre-token is
    * this long, so chunking a pathological run only perturbs counts at
    * chunk seams.
    */
  val MaxBpeWordLen = 512

  /** Merges-based BPE token count over full text: lowercase, pre-tokenize
    * with the regex pre-tokenizer, encode each pre-token (whitespace runs
    * collapse to pre-tokens too and count like GPT-2's). Hostile
    * megabyte-long single runs (a 1 MB "aaaa..." doc would otherwise cost
    * ~len^2 work in the executor hot loop) are chunked at MaxBpeWordLen.
    * Production token budgeting against a real vocab: pass the tokenizer's
    * merges.txt.
    */
  def withBpeMergeCount(df: DataFrame, mergesTxt: String,
                        textCol: String = "text"): DataFrame = {
    val ranks = parseMerges(mergesTxt).zipWithIndex.map { case (p, i) => p -> i }.toMap
    val pat = java.util.regex.Pattern.compile(BpeTokenPattern)
    val f = udf((s: String) => {
      if (s == null) 0
      else {
        val m = pat.matcher(s.toLowerCase(java.util.Locale.ROOT))
        var n = 0
        while (m.find()) {
          val g = m.group()
          var off = 0
          while (off < g.length) {
            val end = math.min(off + MaxBpeWordLen, g.length)
            n += bpeEncode(g.substring(off, end), ranks).length
            off = end
          }
        }
        n
      }
    })
    df.withColumn("n_merge_tokens", f(col(textCol)))
  }

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

  /** Deterministic stopword tables for the stopword-vote heuristic —
    * public-knowledge lists of each language's most frequent function
    * words. 18 Latin-script + 2 Cyrillic-script languages; the vote is
    * restricted to the dominant script's candidates (see detectLang), so
    * e.g. a Russian page never scores against Swedish.
    */
  val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "that", "it", "was",
      "for", "on", "are", "with", "as", "be", "this", "have", "not", "at"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine",
      "zu", "den", "von", "im", "auf", "für", "des", "sich", "dem", "als", "auch"),
    "fr" -> Set("le", "la", "les", "et", "de", "des", "un", "une", "est", "que",
      "pour", "dans", "qui", "sur", "pas", "au", "ce", "il", "avec", "son"),
    "es" -> Set("el", "la", "los", "las", "y", "de", "que", "en", "un", "una",
      "es", "por", "con", "para", "del", "se", "no", "su", "al", "lo"),
    "pt" -> Set("o", "os", "uma", "do", "da", "em", "para", "com", "não", "por",
      "mais", "como", "mas", "foi", "ele", "das", "dos", "ao", "seu", "já"),
    "it" -> Set("il", "lo", "gli", "di", "che", "e", "per", "con", "non", "una",
      "del", "della", "nel", "sono", "ma", "si", "come", "più", "anche", "questo"),
    "nl" -> Set("de", "het", "een", "van", "en", "in", "is", "dat", "op", "te",
      "zijn", "met", "voor", "niet", "aan", "er", "ook", "als", "maar", "om"),
    "pl" -> Set("i", "w", "na", "z", "do", "się", "nie", "jest", "że", "to",
      "jak", "po", "co", "tak", "za", "od", "ale", "przez", "było", "przy"),
    "sv" -> Set("och", "att", "det", "som", "en", "på", "är", "av", "för", "med",
      "den", "till", "inte", "om", "har", "du", "jag", "ett", "men", "var"),
    "da" -> Set("og", "i", "det", "at", "en", "den", "til", "er", "som", "på",
      "de", "med", "han", "af", "for", "ikke", "der", "var", "jeg", "men"),
    "no" -> Set("og", "i", "det", "som", "er", "en", "til", "på", "av", "at",
      "han", "med", "for", "ikke", "den", "der", "så", "seg", "men", "om"),
    "fi" -> Set("ja", "on", "ei", "se", "että", "hän", "oli", "mutta", "joka",
      "kun", "niin", "ovat", "myös", "jos", "sen", "mukaan", "kuin", "vain", "nyt", "tämä"),
    "cs" -> Set("a", "se", "na", "je", "v", "že", "s", "z", "do", "to",
      "jako", "by", "ale", "i", "o", "k", "po", "pro", "za", "jsem"),
    "ro" -> Set("și", "de", "la", "a", "în", "cu", "pe", "este", "o", "că",
      "nu", "din", "se", "un", "pentru", "mai", "sau", "dar", "ca", "fi"),
    "hu" -> Set("a", "az", "és", "hogy", "nem", "is", "egy", "meg", "de", "ha",
      "már", "csak", "mint", "még", "el", "volt", "van", "lesz", "ki", "mert"),
    "tr" -> Set("bir", "ve", "bu", "da", "ne", "için", "ile", "olarak", "daha",
      "çok", "ama", "gibi", "en", "kadar", "sonra", "o", "ki", "mi", "değil", "her"),
    "ca" -> Set("el", "la", "els", "les", "i", "de", "que", "en", "un", "una",
      "és", "per", "amb", "no", "més", "dels", "als", "ho", "aquest", "també"),
    "id" -> Set("yang", "dan", "di", "ini", "itu", "dengan", "untuk", "tidak",
      "dari", "dalam", "akan", "pada", "juga", "ada", "adalah", "ke", "karena", "oleh", "saya", "kita"),
    "ru" -> Set("и", "в", "не", "на", "я", "что", "с", "он", "как", "это",
      "по", "но", "они", "мы", "из", "у", "за", "был", "для", "же"),
    "uk" -> Set("і", "в", "не", "на", "що", "з", "він", "як", "це", "по",
      "але", "вони", "ми", "із", "у", "за", "був", "для", "ж", "та"))

  /** Stopword-vote candidates per script. */
  val LatinLangs: Seq[String] =
    (stopwords.keySet -- Set("ru", "uk")).toSeq.sorted
  val CyrillicLangs: Seq[String] = Seq("ru", "uk")

  /** Languages resolved by dominant script alone (no stopword table):
    * zh/ja/ko/ar/fa/he/el/hi/th.
    */
  val ScriptLangs: Seq[String] =
    Seq("zh", "ja", "ko", "ar", "fa", "he", "el", "hi", "th")

  /** Every language the detector can emit (besides "und"), fixed order —
    * the x18 gate plants one doc per language from this list.
    */
  val AllLangs: Seq[String] = stopwords.keys.toSeq.sorted ++ ScriptLangs

  /** Deterministic sample phrases for the script-determined languages
    * (used by the x18 planting and unit tests; common words per language).
    */
  val ScriptSamples: Map[String, String] = Map(
    "zh" -> "的 一 是 在 不 了 有 和 人 这 中 大 为 上 个",
    "ja" -> "これ は 日本語 の 文章 です よ ね から まで",
    "ko" -> "이것 은 한국어 문장 입니다 그리고 우리 모두 좋다",
    "ar" -> "هذا نص عربي بسيط جدا من اجل الاختبار فقط",
    "fa" -> "این یک متن فارسی است با پژوهش و گچ چوب ژرف",
    "he" -> "זהו טקסט בעברית פשוט מאוד רק בשביל בדיקה",
    "el" -> "αυτό είναι ένα απλό ελληνικό κείμενο για δοκιμή",
    "hi" -> "यह एक सरल हिंदी वाक्य है जो केवल परीक्षण के लिए",
    "th" -> "นี่ คือ ข้อความ ภาษาไทย ง่าย มาก สำหรับ ทดสอบ")

  /** Stopword vote restricted to `langs`; best count wins, ties broken by
    * language code (deterministic); None when nothing matched.
    */
  private def stopwordVote(text: String, langs: Seq[String]): Option[String] = {
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}]+").iterator.filter(_.nonEmpty).take(2000)
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    for (t <- toks; l <- langs if stopwords(l).contains(t))
      counts(l) = counts.getOrElse(l, 0) + 1
    if (counts.isEmpty) None
    else Some(counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1)
  }

  /** Language ID: dominant-script pre-pass, then a stopword vote within the
    * script's candidates. Scripts that pin a language (Han w/o kana => zh,
    * kana => ja, Hangul => ko, Greek/Hebrew/Thai/Devanagari likewise,
    * Arabic => fa when Persian-only letters are present else ar) resolve
    * without stopwords — which is what makes space-free zh/ja/th text
    * detectable at all. Wholly deterministic (integer thresholds, fixed
    * tie-breaks); "und" when no script dominates or no stopword matches.
    */
  def detectLang(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    import Character.UnicodeScript
    var latin = 0; var cyr = 0; var han = 0; var kana = 0; var hangul = 0
    var greek = 0; var arab = 0; var heb = 0; var deva = 0; var thai = 0
    var other = 0
    var hasFa = false
    var i = 0
    var seen = 0
    while (i < text.length && seen < 4000) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp)) {
        seen += 1
        UnicodeScript.of(cp) match {
          case UnicodeScript.LATIN      => latin += 1
          case UnicodeScript.CYRILLIC   => cyr += 1
          case UnicodeScript.HAN        => han += 1
          case UnicodeScript.HIRAGANA | UnicodeScript.KATAKANA => kana += 1
          case UnicodeScript.HANGUL     => hangul += 1
          case UnicodeScript.GREEK      => greek += 1
          case UnicodeScript.ARABIC     =>
            arab += 1
            // Persian-only letters: pe, che, zhe, gaf
            if (cp == 'پ' || cp == 'چ' || cp == 'ژ' || cp == 'گ') hasFa = true
          case UnicodeScript.HEBREW     => heb += 1
          case UnicodeScript.DEVANAGARI => deva += 1
          case UnicodeScript.THAI       => thai += 1
          case _                        => other += 1
        }
      }
      i += Character.charCount(cp)
    }
    val total = latin + cyr + han + kana + hangul + greek + arab + heb +
      deva + thai + other
    if (total == 0) return "und"
    def dom(c: Int): Boolean = 2 * c >= total
    if (kana * 20 >= total && dom(han + kana)) "ja"
    else if (dom(han)) "zh"
    else if (dom(hangul)) "ko"
    else if (dom(greek)) "el"
    else if (dom(heb)) "he"
    else if (dom(deva)) "hi"
    else if (dom(thai)) "th"
    else if (dom(arab)) { if (hasFa) "fa" else "ar" }
    else if (dom(cyr)) stopwordVote(text, CyrillicLangs).getOrElse("ru")
    else if (dom(latin)) stopwordVote(text, LatinLangs).getOrElse("und")
    else "und"
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
