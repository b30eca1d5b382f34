package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

/** TTF parser driven over REAL fonts: the reference repo's own Roboto test
  * fonts and the system DejaVu family — plus the container error taxonomy.
  */
class TtfSpec extends AnyFunSuite {

  private val roboto = "/root/reference/testfiles/roboto"
  private val dejavu = "/usr/share/fonts/truetype/dejavu"

  test("Roboto-Regular: name/em/flags/metrics parse") {
    val f = TtfParser.parseFile(s"$roboto/Roboto-Regular.ttf")
    assert(f.postScriptName == "Roboto-Regular")
    assert(f.unitsPerEm == 2048)
    assert(!f.bold)
    assert(f.embeddable)
    assert(f.widths.nonEmpty && f.chars.nonEmpty)
    // cmap + hmtx coherent: 'A' maps to a glyph with a positive width
    assert(f.rawWidth('A').exists(_ > 0))
    // text-space scaling: width1000 = raw * 1000 / 2048
    assert(f.width1000('A').get ==
      math.round(f.rawWidth('A').get * 1000.0 / 2048).toInt)
    // ascender above zero, descender below
    assert(f.typoAscender > 0 && f.typoDescender < 0)
  }

  test("Roboto-Bold and the italic variants set their flags") {
    assert(TtfParser.parseFile(s"$roboto/Roboto-Bold.ttf").bold)
    val italic = TtfParser.parseFile(s"$roboto/Roboto-MediumItalic.ttf")
    assert(italic.italicAngle != 0)
    assert(!TtfParser.parseFile(s"$roboto/Roboto-Regular.ttf").isFixedPitch)
  }

  test("DejaVuSansMono is fixed-pitch with equal advances") {
    val mono = TtfParser.parseFile(s"$dejavu/DejaVuSansMono.ttf")
    assert(mono.isFixedPitch)
    assert(mono.rawWidth('i') == mono.rawWidth('m'))
    val sans = TtfParser.parseFile(s"$dejavu/DejaVuSans.ttf")
    assert(!sans.isFixedPitch)
    assert(sans.rawWidth('i').get < sans.rawWidth('m').get)
  }

  test("container error taxonomy matches the reference strings") {
    val otto = "OTTO".getBytes ++ new Array[Byte](64)
    assert(intercept[PdfError] { TtfParser.parse(otto) }
      .getMessage.contains("PostScript outlines"))
    val garbage = "NOPE".getBytes ++ new Array[Byte](64)
    assert(intercept[PdfError] { TtfParser.parse(garbage) }
      .getMessage.contains("unrecognized file format"))
    // truncated real font: zero-filled reads end in a clean PdfError, not
    // an index crash
    val real = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$roboto/Roboto-Regular.ttf"))
    intercept[PdfError] { TtfParser.parse(java.util.Arrays.copyOf(real, 256)) }
  }
}
