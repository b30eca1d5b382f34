package graft.pdf

import scala.collection.mutable

/** Creator-lite paragraph layout: the reference creator's text-wrapping
  * semantics (creator/paragraph.go wrapText) over the standard-14 AFM
  * metric tables (model/fonts/helvetica.go, courier.go — public Adobe AFM
  * data), authored through the PdfWriter scaffold.
  *
  * wrapText re-creates the reference loop exactly:
  *  - CHARACTER-greedy accumulation: overflow when lineWidth + w exceeds
  *    wrapWidth*1000, with w = fontSize * Wx;
  *  - on overflow, back up to the LAST SPACE of the line (strictly
  *    positive index): the emitted line KEEPS that trailing space and the
  *    consumed prefix of the overflowing word carries to the next line —
  *    so words wrap atomically; with no space, break on the character;
  *  - '\n' (controlLF) forces a line break;
  *  - a rune with no glyph metrics is an ERROR (reference returns
  *    "Glyph not found for rune").
  */
object Creator {

  /** Helvetica Wx per printable-ASCII char (model/fonts/helvetica.go —
    * Adobe AFM widths, glyph names mapped to their ASCII chars).
    */
  val HelveticaWidths: Map[Char, Int] = Map(
    ' ' -> 278, '!' -> 278, '"' -> 355, '#' -> 556, '$' -> 556,
    '%' -> 889, '&' -> 667, '\'' -> 191, '(' -> 333, ')' -> 333,
    '*' -> 389, '+' -> 584, ',' -> 278, '-' -> 333, '.' -> 278,
    '/' -> 278, '0' -> 556, '1' -> 556, '2' -> 556, '3' -> 556,
    '4' -> 556, '5' -> 556, '6' -> 556, '7' -> 556, '8' -> 556,
    '9' -> 556, ':' -> 278, ';' -> 278, '<' -> 584, '=' -> 584,
    '>' -> 584, '?' -> 556, '@' -> 1015, 'A' -> 667, 'B' -> 667,
    'C' -> 722, 'D' -> 722, 'E' -> 667, 'F' -> 611, 'G' -> 778,
    'H' -> 722, 'I' -> 278, 'J' -> 500, 'K' -> 667, 'L' -> 556,
    'M' -> 833, 'N' -> 722, 'O' -> 778, 'P' -> 667, 'Q' -> 778,
    'R' -> 722, 'S' -> 667, 'T' -> 611, 'U' -> 722, 'V' -> 667,
    'W' -> 944, 'X' -> 667, 'Y' -> 667, 'Z' -> 611, '[' -> 278,
    '\\' -> 278, ']' -> 278, '^' -> 469, '_' -> 556, '`' -> 333,
    'a' -> 556, 'b' -> 556, 'c' -> 500, 'd' -> 556, 'e' -> 556,
    'f' -> 278, 'g' -> 556, 'h' -> 556, 'i' -> 222, 'j' -> 222,
    'k' -> 500, 'l' -> 222, 'm' -> 833, 'n' -> 556, 'o' -> 556,
    'p' -> 556, 'q' -> 556, 'r' -> 333, 's' -> 500, 't' -> 278,
    'u' -> 556, 'v' -> 500, 'w' -> 722, 'x' -> 500, 'y' -> 500,
    'z' -> 500, '{' -> 334, '|' -> 260, '}' -> 334, '~' -> 584)

  /** WinAnsi (cp1252) rune coverage beyond ASCII: the Latin-1 supplement +
    * the 0x80-0x9F typographic runes, mapped through their Adobe glyph
    * names to the same helvetica.go AFM widths (the rune -> glyph mapping
    * of textencoding/winansi.go). NBSP takes the space width.
    */
  val HelveticaWinAnsiWidths: Map[Char, Int] = Map(
    '\u00a0' -> 278, '¡' -> 333, '¢' -> 556, '£' -> 556, '¤' -> 556,
    '¥' -> 556, '¦' -> 260, '§' -> 556, '¨' -> 333, '©' -> 737,
    'ª' -> 370, '«' -> 556, '¬' -> 584, '\u00ad' -> 333, '®' -> 737,
    '¯' -> 333, '°' -> 400, '±' -> 584, '²' -> 333, '³' -> 333,
    '´' -> 333, 'µ' -> 556, '¶' -> 537, '·' -> 278, '¸' -> 333,
    '¹' -> 333, 'º' -> 365, '»' -> 556, '¼' -> 834, '½' -> 834,
    '¾' -> 834, '¿' -> 611, 'À' -> 667, 'Á' -> 667, 'Â' -> 667,
    'Ã' -> 667, 'Ä' -> 667, 'Å' -> 667, 'Æ' -> 1000, 'Ç' -> 722,
    'È' -> 667, 'É' -> 667, 'Ê' -> 667, 'Ë' -> 667, 'Ì' -> 278,
    'Í' -> 278, 'Î' -> 278, 'Ï' -> 278, 'Ð' -> 722, 'Ñ' -> 722,
    'Ò' -> 778, 'Ó' -> 778, 'Ô' -> 778, 'Õ' -> 778, 'Ö' -> 778,
    '×' -> 584, 'Ø' -> 778, 'Ù' -> 722, 'Ú' -> 722, 'Û' -> 722,
    'Ü' -> 722, 'Ý' -> 667, 'Þ' -> 667, 'ß' -> 611, 'à' -> 556,
    'á' -> 556, 'â' -> 556, 'ã' -> 556, 'ä' -> 556, 'å' -> 556,
    'æ' -> 889, 'ç' -> 500, 'è' -> 556, 'é' -> 556, 'ê' -> 556,
    'ë' -> 556, 'ì' -> 278, 'í' -> 278, 'î' -> 278, 'ï' -> 278,
    'ð' -> 556, 'ñ' -> 556, 'ò' -> 556, 'ó' -> 556, 'ô' -> 556,
    'õ' -> 556, 'ö' -> 556, '÷' -> 584, 'ø' -> 611, 'ù' -> 556,
    'ú' -> 556, 'û' -> 556, 'ü' -> 556, 'ý' -> 500, 'þ' -> 556,
    'ÿ' -> 500, 'Œ' -> 1000, 'œ' -> 944, 'Š' -> 667, 'š' -> 500,
    'Ÿ' -> 667, 'Ž' -> 611, 'ž' -> 500, 'ƒ' -> 556, 'ˆ' -> 333,
    '˜' -> 333, '–' -> 556, '—' -> 1000, '‘' -> 222, '’' -> 222,
    '‚' -> 222, '“' -> 333, '”' -> 333, '„' -> 333, '†' -> 556,
    '‡' -> 556, '•' -> 350, '…' -> 1000, '‰' -> 1000, '‹' -> 333,
    '›' -> 333, '€' -> 556, '™' -> 1000)

  /** Compact ASCII width table: chars 32..126 in codepoint order. */
  private def asciiTable(widths: String): Map[Char, Int] =
    widths.split(",").zipWithIndex
      .map { case (w, i) => (i + 32).toChar -> w.toInt }.toMap

  /** The remaining non-symbolic standard-14 AFM tables (printable ASCII;
    * oblique/italic faces share their upright metrics only for Helvetica/
    * Courier — Times-Italic has its OWN table). Sources:
    * model/fonts/helvetica_bold.go, times_roman.go, times_bold.go,
    * times_italic.go, times_bold_italic.go.
    */
  val HelveticaBoldWidths: Map[Char, Int] = asciiTable(
    "278,333,474,556,556,889,722,238,333,333,389,584,278,333,278,278,556,556,556,556,556,556,556,556,556,556,333,333,584,584,584,611,975,722,722,722,722,667,611,778,722,278,556,722,611,833,722,778,667,778,722,667,611,722,667,944,667,667,611,333,278,333,584,556,333,556,611,556,611,556,333,611,611,278,278,556,278,889,611,611,611,611,389,556,333,611,556,778,556,556,500,389,280,389,584")
  val TimesRomanWidths: Map[Char, Int] = asciiTable(
    "250,333,408,500,500,833,778,180,333,333,500,564,250,333,250,278,500,500,500,500,500,500,500,500,500,500,278,278,564,564,564,444,921,722,667,667,722,611,556,722,722,333,389,722,611,889,722,722,556,722,667,556,611,722,722,944,722,722,611,333,278,333,469,500,333,444,500,444,500,444,333,500,500,278,278,500,278,778,500,500,500,500,333,389,278,500,500,722,500,500,444,480,200,480,541")
  val TimesBoldWidths: Map[Char, Int] = asciiTable(
    "250,333,555,500,500,1000,833,278,333,333,500,570,250,333,250,278,500,500,500,500,500,500,500,500,500,500,333,333,570,570,570,500,930,722,667,722,722,667,611,778,778,389,500,778,667,944,722,778,611,778,722,556,667,722,722,1000,722,722,667,333,278,333,581,500,333,500,556,444,556,444,333,500,556,278,333,556,278,833,556,500,556,556,444,389,333,556,500,722,500,500,444,394,220,394,520")
  val TimesItalicWidths: Map[Char, Int] = asciiTable(
    "250,333,420,500,500,833,778,214,333,333,500,675,250,333,250,278,500,500,500,500,500,500,500,500,500,500,333,333,675,675,675,500,920,611,611,667,722,611,611,722,722,333,444,667,556,833,667,722,611,722,611,500,556,722,611,833,611,556,556,389,278,389,422,500,333,500,500,444,500,444,278,500,500,278,278,444,278,722,500,500,500,500,389,389,278,500,444,667,444,444,389,400,275,400,541")
  val TimesBoldItalicWidths: Map[Char, Int] = asciiTable(
    "250,389,555,500,500,833,778,278,333,333,500,570,250,333,250,278,500,500,500,500,500,500,500,500,500,500,333,333,570,570,570,500,832,667,667,667,722,667,667,722,778,389,500,667,611,889,722,722,611,722,667,556,611,722,667,889,667,611,611,333,278,333,570,500,333,500,500,444,500,444,333,500,556,278,278,500,278,778,556,500,500,500,389,389,278,556,444,667,500,444,389,348,220,348,570")

  /** Glyph width for (font, char) across the non-symbolic standard 14:
    * Courier faces are monospaced at 600 (courier*.go), Helvetica-Oblique
    * shares Helvetica metrics (helvetica_oblique.go repeats the table),
    * the Times family has four distinct tables. WinAnsi extension only
    * for plain Helvetica so far.
    */
  def widthOf(font: String, c: Char): Option[Int] = font match {
    case f if f.startsWith("Courier") =>
      if (c >= ' ' && c <= '~') Some(600) else None
    case "Helvetica-Bold" | "Helvetica-BoldOblique" => HelveticaBoldWidths.get(c)
    case "Times-Roman"      => TimesRomanWidths.get(c)
    case "Times-Bold"       => TimesBoldWidths.get(c)
    case "Times-Italic"     => TimesItalicWidths.get(c)
    case "Times-BoldItalic" => TimesBoldItalicWidths.get(c)
    case _ => HelveticaWidths.get(c).orElse(HelveticaWinAnsiWidths.get(c))
  }

  final case class ParagraphStyle(font: String = "Helvetica",
                                  fontSize: Double = 10.0,
                                  wrapWidth: Double = 180.0,
                                  leading: Double = 12.0)

  /** creator/paragraph.go wrapText — see object doc for the semantics. */
  def wrapText(text: String, style: ParagraphStyle): Seq[String] = {
    val lines = mutable.ArrayBuffer.empty[String]
    val line = new java.lang.StringBuilder
    var widths = mutable.ArrayBuffer.empty[Double]
    var lineWidth = 0.0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      if (ch == '\n') { // controlLF: hard break
        lines += line.toString
        line.setLength(0)
        widths = mutable.ArrayBuffer.empty[Double]
        lineWidth = 0.0
      } else {
        val wx = widthOf(style.font, ch).getOrElse(
          throw new PdfError(s"Glyph not found for rune: $ch"))
        val w = style.fontSize * wx
        if (lineWidth + w > style.wrapWidth * 1000.0) {
          val idx = line.toString.lastIndexOf(' ')
          if (idx > 0) { // strictly positive, like the reference
            val s = line.toString
            lines += s.substring(0, idx + 1) // trailing space KEPT
            line.setLength(0)
            line.append(s.substring(idx + 1)).append(ch)
            widths = widths.drop(idx + 1) :+ w
            lineWidth = widths.sum
          } else {
            lines += line.toString
            line.setLength(0)
            line.append(ch)
            widths = mutable.ArrayBuffer(w)
            lineWidth = w
          }
        } else {
          line.append(ch)
          lineWidth += w
          widths += w
        }
      }
      i += 1
    }
    if (line.length > 0) lines += line.toString
    lines.toSeq
  }

  /** Content stream for a wrapped paragraph (built via ContentCreator —
    * the reference operand layout): the initial Tm positions the cursor
    * WITHOUT emitting glue (y ascends from the origin, x is unchanged —
    * Extractor.Tm emits only on y-descent / x-ascent), each following line
    * moves 0 -leading Td (ty<0 -> "\n" under the golden extractor).
    * Extraction therefore returns the wrapped lines joined by newlines,
    * byte-identically.
    */
  def paragraphContent(lines: Seq[String], style: ParagraphStyle): Array[Byte] = {
    val cc = new ContentCreator()
    cc.add_BT().add_Tf("F1", style.fontSize).add_Tm(1, 0, 0, 1, 0, 792)
    for ((ln, i) <- lines.zipWithIndex) {
      if (i > 0) cc.add_Td(0, -style.leading)
      cc.add_Tj(ln)
    }
    cc.add_ET().bytes
  }

  // -------------------------------------------------------------- tables

  final case class TableStyle(width: Double = 500.0, rowHeight: Double = 14.0,
                              font: String = "Helvetica", fontSize: Double = 10.0,
                              x: Double = 50.0, y: Double = 750.0)

  /** Equal fractional column widths — NewTable's default (creator/
    * table.go:49-72: colWidth = 1/cols; SetColumnWidths overrides).
    */
  def equalColWidths(cols: Int): Seq[Double] = Seq.fill(cols)(1.0 / cols)

  /** Truncate a cell to its column width using the real AFM metrics (the
    * creator-lite stand-in for per-cell paragraph wrapping: a cell is one
    * line; overflow clips at the glyph boundary).
    */
  def fitCell(text: String, maxWidth: Double, style: TableStyle): String = {
    val limit = maxWidth * 1000.0
    var used = 0.0
    val sb = new java.lang.StringBuilder
    var i = 0
    var stop = false
    while (i < text.length && !stop) {
      val ch = text.charAt(i)
      val w = style.fontSize * widthOf(style.font, ch).getOrElse(
        throw new PdfError(s"Glyph not found for rune: $ch"))
      if (used + w > limit) stop = true
      else { sb.append(ch); used += w }
      i += 1
    }
    sb.toString
  }

  /** Content stream for a cell grid (creator/table.go GeneratePageBlocks
    * shape): each cell is positioned by an absolute Tm at its column x
    * (cumulative fractional widths) and row y (descending by rowHeight).
    * Under the golden extractor this emits exactly cells-joined-by-TAB
    * within a row (x ascent) and rows-joined-by-NEWLINE (y descent) — the
    * s04 Tm semantics, which is what the x46 oracle states.
    */
  def tableContent(rows: Seq[Seq[String]], colWidths: Seq[Double],
                   style: TableStyle = TableStyle()): Array[Byte] = {
    require(rows.forall(_.length == colWidths.length),
      "every row must have one cell per column")
    val xs = colWidths.scanLeft(0.0)(_ + _).init.map(f => style.x + f * style.width)
    val cc = new ContentCreator()
    cc.add_BT().add_Tf("F1", style.fontSize)
    for ((row, i) <- rows.zipWithIndex; (cell, j) <- row.zipWithIndex) {
      cc.add_Tm(1, 0, 0, 1, xs(j), style.y - i * style.rowHeight)
      cc.add_Tj(fitCell(cell, colWidths(j) * style.width, style))
    }
    cc.add_ET().bytes
  }

  /** Author a one-page table document. */
  def authorTable(rows: Seq[Seq[String]], colWidths: Seq[Double] = Nil,
                  style: TableStyle = TableStyle()): Array[Byte] = {
    val cw = if (colWidths.nonEmpty) colWidths
    else equalColWidths(rows.headOption.map(_.length).getOrElse(1))
    PdfWriter.authorSimple(Seq(tableContent(rows, cw, style)), baseFont = style.font)
  }

  /** Author a document with one wrapped paragraph per page (the
    * NewPdfWriter scaffold via authorSimple; pages join with "\n" on
    * extraction).
    */
  def authorParagraphs(paragraphs: Seq[String],
                       style: ParagraphStyle = ParagraphStyle()): Array[Byte] =
    PdfWriter.authorSimple(
      paragraphs.map(p => paragraphContent(wrapText(p, style), style)),
      baseFont = style.font)
}
