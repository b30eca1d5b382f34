package graft.pdf

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.scalatest.funsuite.AnyFunSuite

/** CMap goldens ported from /root/reference/pdf/internal/cmap/cmap_test.go. */
class CMapSpec extends AnyFunSuite {

  test("hostile 2^32-entry bfrange is capped cleanly (no OOM, no hang)") {
    val hostile = ("1 begincodespacerange\n<00000000> <ffffffff>\nendcodespacerange\n" +
      "1 beginbfrange\n<00000000> <ffffffff> <0041>\nendbfrange\n").getBytes(ISO_8859_1)
    Deadline.set(System.nanoTime() + 10000L * 1000000L)
    try {
      val t0 = System.nanoTime()
      val e = intercept[PdfError](CMapParser.load(hostile))
      val ms = (System.nanoTime() - t0) / 1000000
      assert(e.getMessage.contains("bfrange too large") ||
        e.isInstanceOf[PdfTimeout], e.getMessage)
      assert(ms < 30000, s"cap must fire promptly, took ${ms}ms")
    } finally Deadline.clear()
  }

  val cmap1Data: String =
    """
/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo
<<  /Registry (Adobe)
/Ordering (UCS)
/Supplement 0
>> def
/CMapName /Adobe-Identity-UCS def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
8 beginbfchar
<0003> <0020>
<0007> <0024>
<0033> <0050>
<0035> <0052>
<0037> <0054>
<005A> <0077>
<005C> <0079>
<005F> <007C>
endbfchar
7 beginbfrange
<000F> <0017> <002C>
<001B> <001D> <0038>
<0025> <0026> <0042>
<002F> <0031> <004C>
<0044> <004C> <0061>
<004F> <0053> <006C>
<0055> <0057> <0072>
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end
"""

  test("Adobe-Identity-UCS cmap goldens") {
    val cmap = CMapParser.load(cmap1Data.getBytes(ISO_8859_1))
    assert(cmap.name == "Adobe-Identity-UCS")
    assert(cmap.ctype == 2)
    assert(cmap.codespaces.length == 1)
    assert(cmap.codespaces(0)._2 == 0L)
    assert(cmap.codespaces(0)._3 == 0xffffL)

    val expectedMappings: Map[Long, Int] = Map(
      0x0003L -> 0x0020, 0x005fL -> 0x007c,
      0x000fL -> 0x002c, (0x000f + 5).toLong -> (0x002c + 5),
      0x001bL -> 0x0038, (0x001b + 2).toLong -> (0x0038 + 2),
      0x002fL -> 0x004c, 0x0044L -> 0x0061,
      0x004fL -> 0x006c, 0x0055L -> 0x0072)
    for ((code, rune) <- expectedMappings) {
      val got = new String(cmap.charcodeToUnicode(code), UTF_8)
      assert(got == new String(Character.toChars(rune)), f"code 0x$code%04X")
    }
    assert(new String(cmap.charcodeToUnicode(0x99), UTF_8) == "?")

    val s = cmap.charcodeBytesToUnicode(Array[Byte](0x00, 0x03, 0x00, 0x0f))
    assert(new String(s, UTF_8) == " ,")
  }

  test("charcode miss emits nothing for those bytes") {
    val cmap = CMapParser.load(cmap1Data.getBytes(ISO_8859_1))
    // An unmapped greedy run consumes up to 4 bytes and contributes NOTHING
    // (cmap.go:50-78); the following <0003> still maps to a space.
    val s = cmap.charcodeBytesToUnicode(
      Array[Byte](0x00, 0x99.toByte, 0x00, 0x03, 0x00, 0x03))
    assert(new String(s, UTF_8) == " ")
    // Fully-unmapped input yields empty output.
    val s2 = cmap.charcodeBytesToUnicode(Array[Byte](0xff.toByte, 0xff.toByte, 0x00, 0x03))
    assert(new String(s2, UTF_8) == "")
  }

  test("bfrange with out-of-range target encodes U+FFFD like Go") {
    val data =
      """1 begincodespacerange
<00000000> <FFFFFFFF>
endcodespacerange
1 beginbfrange
<00000001> <00000001> <FFFFFFFF>
endbfrange
""".getBytes(ISO_8859_1)
    val cmap = CMapParser.load(data)
    val got = cmap.codeMap(3)(1L)
    assert(got.sameElements(Array[Byte](0xef.toByte, 0xbf.toByte, 0xbd.toByte)))
  }

  test("cmap2: 2-byte codes with zero high byte (cmap_test.go:151-215)") {
    val data = """1 begincodespacerange
<0000> <FFFF>
endcodespacerange
7 beginbfrange
<0080> <00FF> <002C>
<802F> <902F> <0038>
endbfrange
""".getBytes(ISO_8859_1)
    val cmap = CMapParser.load(data)
    assert(new String(cmap.charcodeToUnicode(0x0080L), UTF_8) == ",")
    assert(new String(cmap.charcodeToUnicode(0x802fL), UTF_8) == "8")
    val s1 = cmap.charcodeBytesToUnicode(Array(0x80, 0x2F, 0x00, 0x80).map(_.toByte))
    assert(new String(s1, UTF_8) == "8,")
  }

  test("cmap3: mixed 1/2-byte codespaces (cmap_test.go:243-326)") {
    val data = """/CMapName /test-1 def
/CMapType 1 def
4 begincodespacerange
<00> <80>
<8100> <9fff>
<a0> <df>
<d040> <fbfc>
endcodespacerange
7 beginbfrange
<00> <80> <10>
<8100> <9f00> <1000>
<a0> <d0> <90>
<d140> <f000> <a000>
endbfrange
endcmap
""".getBytes(ISO_8859_1)
    val cmap = CMapParser.load(data)
    assert(cmap.name == "test-1")
    assert(cmap.ctype == 1)
    val expectedCodespaces = Seq((1, 0x00L, 0x80L), (2, 0x8100L, 0x9fffL),
      (1, 0xa0L, 0xdfL), (2, 0xd040L, 0xfbfcL))
    assert(cmap.codespaces.toSeq == expectedCodespaces)
    def one(code: Long, rune: Int): Unit =
      assert(new String(cmap.charcodeToUnicode(code), UTF_8) == new String(Character.toChars(rune)),
        f"code 0x$code%04X")
    one(0x0080L, 0x10 + 0x80)
    one(0x8100L, 0x1000)
    one(0x00a0L, 0x90)
    one(0xd140L, 0xa000)
    val seq = cmap.charcodeBytesToUnicode(
      Array(0x80, 0x81, 0x00, 0xa1, 0xd1, 0x80, 0x00).map(_.toByte))
    val expected = new String(Array(0x90, 0x1000, 0x91, 0xa000 + 0x40, 0x10).flatMap(Character.toChars(_)))
    assert(new String(seq, UTF_8) == expected)
  }
}
