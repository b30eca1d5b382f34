package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

/** AFM parser over the reference's vendored Adobe metric files — and the
  * cross-validation that our hardcoded Creator width tables equal the
  * reference's own AFM data glyph-for-glyph.
  */
class AfmSpec extends AnyFunSuite {

  private val afms = "/root/reference/pdf/model/fonts/afms"

  test("Helvetica.afm parses: header + 315 char metrics") {
    val f = Afm.parseFile(s"$afms/Helvetica.afm")
    assert(f.fontName == "Helvetica")
    assert(!f.isFixedPitch)
    assert(f.capHeight == 718 && f.ascender == 718 && f.descender == -207)
    assert(f.widthsByGlyph.size == 315)
    assert(f.widthByCode(32).contains(278)) // space via the encoding column
    assert(f.widthsByGlyph("eacute") == 556)
  }

  test("Creator's hardcoded tables match the reference AFM data exactly") {
    // ASCII range of every face we carry a table for, glyph-for-glyph
    // against the vendored Adobe files. (Times AFMs are not vendored under
    // afms/, so those tables stay pinned by the CreatorSpec spot checks.)
    val pairs = Seq(
      "Helvetica.afm" -> Creator.HelveticaWidths,
      "Helvetica-Bold.afm" -> Creator.HelveticaBoldWidths)
    for ((file, table) <- pairs) {
      val f = Afm.parseFile(s"$afms/$file")
      for (c <- ' ' to '~')
        assert(Afm.asciiWidth(f, c) == table.get(c), s"$file char '$c'")
    }
    // the WinAnsi extension matches GLYPH-FOR-GLYPH: every rune maps
    // through its Adobe glyph name (Afm.WinAnsiGlyphNames) to the AFM
    // width our table carries
    val helv = Afm.parseFile(s"$afms/Helvetica.afm")
    for ((c, w) <- Creator.HelveticaWinAnsiWidths) {
      val glyph = Afm.WinAnsiGlyphNames(c)
      assert(helv.widthsByGlyph.get(glyph).contains(w),
        s"'$c' ($glyph): table $w vs afm ${helv.widthsByGlyph.get(glyph)}")
    }
    // Courier faces: every ASCII glyph 600 in the AFM, like widthOf says
    val cour = Afm.parseFile(s"$afms/Courier.afm")
    for (c <- ' ' to '~')
      assert(Afm.asciiWidth(cour, c).contains(600), s"Courier '$c'")
    assert(cour.isFixedPitch)
  }

  test("garbage input fails loudly") {
    intercept[PdfError] { Afm.parse("not an afm at all") }
  }
}
