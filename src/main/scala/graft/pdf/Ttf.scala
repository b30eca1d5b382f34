package graft.pdf

import scala.collection.mutable

/** TrueType font-file parser — re-creates the reference's ttfparser.go
  * (model/fonts/ttfparser.go:34-374, itself the public Plathey/Jung
  * parser): offset table -> head (unitsPerEm, bbox, magic 0x5F0F3CF5) ->
  * hhea (numberOfHMetrics) -> maxp (numGlyphs) -> hmtx (advance widths,
  * tail-padded with the last metric) -> cmap (platform 3 / encoding 1,
  * format 4 segment walk incl. the idRangeOffset sequential-read quirk)
  * -> name (PostScript name, nameID 6, delimiter bytes stripped) -> OS/2
  * (embeddable/bold flags, typo ascender/descender, CapHeight at
  * version >= 2) -> post (italic angle, underline, isFixedPitch).
  *
  * Deviations: reads from an in-memory byte array (the kernel is
  * byte-oriented), and like Go's binary.Read a read past the end yields
  * ZERO rather than erroring — truncated fonts parse as far as their
  * bytes allow, exactly as the reference behaves on short files.
  */
object TtfParser {

  final case class TtfFont(embeddable: Boolean, unitsPerEm: Int,
                           postScriptName: String, bold: Boolean,
                           italicAngle: Int, isFixedPitch: Boolean,
                           typoAscender: Int, typoDescender: Int,
                           underlinePosition: Int, underlineThickness: Int,
                           xMin: Int, yMin: Int, xMax: Int, yMax: Int,
                           capHeight: Int,
                           widths: Array[Int], chars: Map[Int, Int]) {
    /** Advance width of a rune in FONT units (hmtx via cmap). */
    def rawWidth(r: Int): Option[Int] =
      chars.get(r).flatMap(g => if (g < widths.length) Some(widths(g)) else None)
    /** Advance width scaled to the 1000-unit text space the AFM tables
      * use (how the model layer consumes ttf metrics).
      */
    def width1000(r: Int): Option[Int] =
      if (unitsPerEm <= 0) None
      else rawWidth(r).map(w => math.round(w * 1000.0 / unitsPerEm).toInt)
  }

  private final class Cursor(data: Array[Byte]) {
    var pos: Long = 0L
    def seek(p: Long): Unit = pos = p
    def skip(n: Int): Unit = pos += n
    private def byteAt(p: Long): Int =
      if (p < 0 || p >= data.length) 0 else data(p.toInt) & 0xff // Go zero-fill quirk
    def u8(): Int = { val v = byteAt(pos); pos += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def s16(): Int = { val v = u16(); if (v >= 0x8000) v - 0x10000 else v }
    def u32(): Long = ((u16().toLong << 16) | u16().toLong) & 0xffffffffL
    def str(n: Int): String = {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < n) { sb.append(byteAt(pos + i).toChar); i += 1 }
      pos += n
      sb.toString
    }
  }

  /** TtfParse (ttfparser.go:60-99). Throws PdfError with the reference's
    * error strings on unsupported/unrecognized containers.
    */
  def parse(data: Array[Byte]): TtfFont = {
    val c = new Cursor(data)
    val version = c.str(4)
    if (version == "OTTO")
      throw new PdfError("fonts based on PostScript outlines are not supported")
    if (version != "\u0000\u0001\u0000\u0000")
      throw new PdfError("unrecognized file format")
    val numTables = c.u16()
    c.skip(3 * 2)
    val tables = mutable.HashMap.empty[String, Long]
    var j = 0
    while (j < numTables) {
      val tag = c.str(4)
      c.skip(4)
      val offset = c.u32()
      c.skip(4)
      tables(tag) = offset
      j += 1
    }
    def seekTable(tag: String): Unit = tables.get(tag) match {
      case Some(off) => c.seek(off)
      case None      => throw new PdfError(s"table not found: $tag")
    }

    // head (ttfparser.go:126-143)
    seekTable("head")
    c.skip(3 * 4)
    if (c.u32() != 0x5F0F3CF5L) throw new PdfError("incorrect magic number")
    c.skip(2)
    val unitsPerEm = c.u16()
    c.skip(2 * 8)
    val xMin = c.s16(); val yMin = c.s16(); val xMax = c.s16(); val yMax = c.s16()

    // hhea (:145-152)
    seekTable("hhea")
    c.skip(4 + 15 * 2)
    val numberOfHMetrics = c.u16()

    // maxp (:154-161)
    seekTable("maxp")
    c.skip(4)
    val numGlyphs = c.u16()

    // hmtx (:163-180): advance widths, tail glyphs repeat the last metric
    seekTable("hmtx")
    val widths = new Array[Int](numGlyphs)
    j = 0
    while (j < math.min(numberOfHMetrics, numGlyphs)) {
      widths(j) = c.u16()
      c.skip(2) // lsb
      j += 1
    }
    if (numberOfHMetrics > 0 && numberOfHMetrics < numGlyphs) {
      val last = widths(numberOfHMetrics - 1)
      j = numberOfHMetrics
      while (j < numGlyphs) { widths(j) = last; j += 1 }
    }

    // cmap (:182-266): platform 3 / encoding 1, format 4
    seekTable("cmap")
    val cmapBase = tables("cmap")
    c.skip(2)
    val numSub = c.u16()
    var offset31 = 0L
    j = 0
    while (j < numSub) {
      val platformID = c.u16()
      val encodingID = c.u16()
      val off = c.u32()
      if (platformID == 3 && encodingID == 1) offset31 = off
      j += 1
    }
    if (offset31 == 0) throw new PdfError("no Unicode encoding found")
    c.seek(cmapBase + offset31)
    val format = c.u16()
    if (format != 4) throw new PdfError(s"unexpected subtable format: $format")
    c.skip(2 * 2)
    val segCount = c.u16() / 2
    c.skip(3 * 2)
    val endCount = Array.fill(segCount)(c.u16())
    c.skip(2)
    val startCount = Array.fill(segCount)(c.u16())
    val idDelta = Array.fill(segCount)(c.s16())
    val idRangeBase = c.pos
    val idRangeOffset = Array.fill(segCount)(c.u16())
    val chars = mutable.HashMap.empty[Int, Int]
    j = 0
    while (j < segCount) {
      val c1 = startCount(j)
      val c2 = endCount(j)
      val d = idDelta(j)
      val ro = idRangeOffset(j)
      if (ro > 0) c.seek(idRangeBase + 2L * j + ro)
      var ch = c1
      var break = false
      while (ch <= c2 && !break) {
        if (ch == 0xFFFF) break = true
        else {
          var gid =
            if (ro > 0) { val g = c.u16(); if (g > 0) g + d else g }
            else ch + d
          if (gid >= 65536) gid -= 65536
          if (gid > 0) chars(ch) = gid
          ch += 1
        }
      }
      j += 1
    }

    // name (:268-301): PostScript name = nameID 6, delimiters stripped
    seekTable("name")
    val nameBase = c.pos
    var psName = ""
    c.skip(2)
    val nameCount = c.u16()
    val stringOffset = c.u16()
    j = 0
    while (j < nameCount && psName.isEmpty) {
      c.seek(nameBase + 6 + 12L * j) // each record is 12 bytes
      c.skip(3 * 2)
      val nameID = c.u16()
      val length = c.u16()
      val off = c.u16()
      if (nameID == 6) {
        c.seek(nameBase + stringOffset + off)
        psName = c.str(length).replace("\u0000", "")
          .replaceAll("[(){}<> /%\\[\\]]", "")
      }
      j += 1
    }
    if (psName.isEmpty) throw new PdfError("the name PostScript was not found")

    // OS/2 (:303-324)
    seekTable("OS/2")
    val os2Version = c.u16()
    c.skip(3 * 2)
    val fsType = c.u16()
    val embeddable = fsType != 2 && (fsType & 0x200) == 0
    c.skip(11 * 2 + 10 + 4 * 4 + 4)
    val fsSelection = c.u16()
    val bold = (fsSelection & 32) != 0
    c.skip(2 * 2)
    val typoAscender = c.s16()
    val typoDescender = c.s16()
    val capHeight =
      if (os2Version >= 2) { c.skip(3 * 2 + 2 * 4 + 2); c.s16() } else 0

    // post (:326-337)
    seekTable("post")
    c.skip(4)
    val italicAngle = c.s16()
    c.skip(2)
    val underlinePosition = c.s16()
    val underlineThickness = c.s16()
    val isFixedPitch = c.u32() != 0

    TtfFont(embeddable, unitsPerEm, psName, bold, italicAngle, isFixedPitch,
      typoAscender, typoDescender, underlinePosition, underlineThickness,
      xMin, yMin, xMax, yMax, capHeight, widths, chars.toMap)
  }

  def parseFile(path: String): TtfFont =
    parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
}
