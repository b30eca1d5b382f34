package graft.pdf

import scala.collection.mutable

/** Adobe Font Metrics (.afm) parser — the data files the reference vendors
  * under model/fonts/afms/ (its static Go width tables are generated from
  * them). Parses the header key-value section and the StartCharMetrics
  * block ("C code ; WX width ; N name ; B llx lly urx ury ;"), exposing
  * per-glyph widths both by glyph NAME and — through the standard Adobe
  * glyph-name mapping for printable ASCII — by char. AfmSpec
  * cross-validates the hardcoded Creator tables against the reference's
  * own AFM files through this parser.
  */
object Afm {

  final case class AfmFont(fontName: String, isFixedPitch: Boolean,
                           capHeight: Int, ascender: Int, descender: Int,
                           widthsByGlyph: Map[String, Int],
                           codeToGlyph: Map[Int, String]) {
    /** Width by AFM character code (the file's own encoding column). */
    def widthByCode(code: Int): Option[Int] =
      codeToGlyph.get(code).flatMap(widthsByGlyph.get)
  }

  private def num(s: String, what: String): Int =
    try s.toDouble.toInt
    catch { case _: NumberFormatException =>
      throw new PdfError(s"malformed AFM number for $what: $s")
    }

  def parse(text: String): AfmFont = {
    var fontName = ""
    var fixed = false
    var cap = 0
    var asc = 0
    var desc = 0
    val widths = mutable.HashMap.empty[String, Int]
    val codes = mutable.HashMap.empty[Int, String]
    var inChars = false
    for (line0 <- text.linesIterator) {
      val line = line0.trim
      if (inChars) {
        if (line.startsWith("EndCharMetrics")) inChars = false
        else if (line.startsWith("C ")) {
          // "C 32 ; WX 278 ; N space ; B 0 0 0 0 ;" — key-token pairs
          var code = Int.MinValue
          var wx = Int.MinValue
          var name: String = null
          for (part <- line.split(";").map(_.trim) if part.nonEmpty) {
            val toks = part.split("\\s+")
            toks(0) match {
              case "C" if toks.length > 1  => code = num(toks(1), "C")
              case "WX" if toks.length > 1 => wx = num(toks(1), "WX")
              case "N" if toks.length > 1  => name = toks(1)
              case _                       => () // B bbox, L ligatures: ignored
            }
          }
          if (name != null && wx != Int.MinValue) {
            widths(name) = wx
            if (code >= 0) codes(code) = name
          }
        }
      } else if (line.startsWith("StartCharMetrics")) inChars = true
      else {
        val sp = line.indexOf(' ')
        if (sp > 0) {
          val key = line.substring(0, sp)
          val value = line.substring(sp + 1).trim
          key match {
            case "FontName"     => fontName = value
            case "IsFixedPitch" => fixed = value == "true"
            case "CapHeight"    => cap = num(value, "CapHeight")
            case "Ascender"     => asc = num(value, "Ascender")
            case "Descender"    => desc = num(value, "Descender")
            case _              => ()
          }
        }
      }
    }
    if (fontName.isEmpty || widths.isEmpty)
      throw new PdfError("not an AFM file (no FontName/CharMetrics)")
    AfmFont(fontName, fixed, cap, asc, desc, widths.toMap, codes.toMap)
  }

  def parseFile(path: String): AfmFont =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.ISO_8859_1))

  /** Standard Adobe glyph names for printable ASCII (the same mapping the
    * Creator tables were built through).
    */
  val AsciiGlyphNames: Map[Char, String] = {
    val named = Map(
      ' ' -> "space", '!' -> "exclam", '"' -> "quotedbl", '#' -> "numbersign",
      '$' -> "dollar", '%' -> "percent", '&' -> "ampersand", '\'' -> "quotesingle",
      '(' -> "parenleft", ')' -> "parenright", '*' -> "asterisk", '+' -> "plus",
      ',' -> "comma", '-' -> "hyphen", '.' -> "period", '/' -> "slash",
      '0' -> "zero", '1' -> "one", '2' -> "two", '3' -> "three", '4' -> "four",
      '5' -> "five", '6' -> "six", '7' -> "seven", '8' -> "eight", '9' -> "nine",
      ':' -> "colon", ';' -> "semicolon", '<' -> "less", '=' -> "equal",
      '>' -> "greater", '?' -> "question", '@' -> "at", '[' -> "bracketleft",
      '\\' -> "backslash", ']' -> "bracketright", '^' -> "asciicircum",
      '_' -> "underscore", '`' -> "grave", '{' -> "braceleft", '|' -> "bar",
      '}' -> "braceright", '~' -> "asciitilde")
    val letters = (('A' to 'Z') ++ ('a' to 'z')).map(c => c -> c.toString)
    named ++ letters
  }

  /** ASCII char -> width for a parsed AFM font (None where the font lacks
    * the glyph).
    */
  def asciiWidth(font: AfmFont, c: Char): Option[Int] =
    AsciiGlyphNames.get(c).flatMap(font.widthsByGlyph.get)

  /** WinAnsi (cp1252) rune -> Adobe glyph name beyond ASCII — the
    * textencoding/winansi.go mapping the Creator WinAnsi table was built
    * through (NBSP shares the space glyph).
    */
  val WinAnsiGlyphNames: Map[Char, String] = {
    val typographic = Map(
      '€' -> "Euro", '‚' -> "quotesinglbase", 'ƒ' -> "florin",
      '„' -> "quotedblbase", '…' -> "ellipsis", '†' -> "dagger",
      '‡' -> "daggerdbl", 'ˆ' -> "circumflex", '‰' -> "perthousand",
      'Š' -> "Scaron", '‹' -> "guilsinglleft", 'Œ' -> "OE", 'Ž' -> "Zcaron",
      '‘' -> "quoteleft", '’' -> "quoteright", '“' -> "quotedblleft",
      '”' -> "quotedblright", '•' -> "bullet", '–' -> "endash",
      '—' -> "emdash", '˜' -> "tilde", '™' -> "trademark", 'š' -> "scaron",
      '›' -> "guilsinglright", 'œ' -> "oe", 'ž' -> "zcaron", 'Ÿ' -> "Ydieresis")
    val latin1 = Map(
      '\u00a0' -> "space", '¡' -> "exclamdown", '¢' -> "cent", '£' -> "sterling",
      '¤' -> "currency", '¥' -> "yen", '¦' -> "brokenbar", '§' -> "section",
      '¨' -> "dieresis", '©' -> "copyright", 'ª' -> "ordfeminine",
      '«' -> "guillemotleft", '¬' -> "logicalnot", '\u00ad' -> "hyphen",
      '®' -> "registered", '¯' -> "macron", '°' -> "degree", '±' -> "plusminus",
      '²' -> "twosuperior", '³' -> "threesuperior", '´' -> "acute", 'µ' -> "mu",
      '¶' -> "paragraph", '·' -> "periodcentered", '¸' -> "cedilla",
      '¹' -> "onesuperior", 'º' -> "ordmasculine", '»' -> "guillemotright",
      '¼' -> "onequarter", '½' -> "onehalf", '¾' -> "threequarters",
      '¿' -> "questiondown", 'À' -> "Agrave", 'Á' -> "Aacute",
      'Â' -> "Acircumflex", 'Ã' -> "Atilde", 'Ä' -> "Adieresis",
      'Å' -> "Aring", 'Æ' -> "AE", 'Ç' -> "Ccedilla", 'È' -> "Egrave",
      'É' -> "Eacute", 'Ê' -> "Ecircumflex", 'Ë' -> "Edieresis",
      'Ì' -> "Igrave", 'Í' -> "Iacute", 'Î' -> "Icircumflex",
      'Ï' -> "Idieresis", 'Ð' -> "Eth", 'Ñ' -> "Ntilde", 'Ò' -> "Ograve",
      'Ó' -> "Oacute", 'Ô' -> "Ocircumflex", 'Õ' -> "Otilde",
      'Ö' -> "Odieresis", '×' -> "multiply", 'Ø' -> "Oslash",
      'Ù' -> "Ugrave", 'Ú' -> "Uacute", 'Û' -> "Ucircumflex",
      'Ü' -> "Udieresis", 'Ý' -> "Yacute", 'Þ' -> "Thorn",
      'ß' -> "germandbls", 'à' -> "agrave", 'á' -> "aacute",
      'â' -> "acircumflex", 'ã' -> "atilde", 'ä' -> "adieresis",
      'å' -> "aring", 'æ' -> "ae", 'ç' -> "ccedilla", 'è' -> "egrave",
      'é' -> "eacute", 'ê' -> "ecircumflex", 'ë' -> "edieresis",
      'ì' -> "igrave", 'í' -> "iacute", 'î' -> "icircumflex",
      'ï' -> "idieresis", 'ð' -> "eth", 'ñ' -> "ntilde", 'ò' -> "ograve",
      'ó' -> "oacute", 'ô' -> "ocircumflex", 'õ' -> "otilde",
      'ö' -> "odieresis", '÷' -> "divide", 'ø' -> "oslash", 'ù' -> "ugrave",
      'ú' -> "uacute", 'û' -> "ucircumflex", 'ü' -> "udieresis",
      'ý' -> "yacute", 'þ' -> "thorn", 'ÿ' -> "ydieresis")
    typographic ++ latin1
  }
}
