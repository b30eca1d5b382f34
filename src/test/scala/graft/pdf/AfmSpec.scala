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
    // the WinAnsi extension matches too (glyph names via the cp1252 map)
    val helv = Afm.parseFile(s"$afms/Helvetica.afm")
    for ((c, w) <- Creator.HelveticaWinAnsiWidths if c >= 0xA1 && c <= 0xFF) {
      // Latin-1 supplement codes exist in the AFM name space
      val byName = helv.widthsByGlyph.filter(_._2 == w)
      assert(byName.nonEmpty, s"no glyph of width $w for '$c'")
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
