package graft.spark

import org.scalatest.funsuite.AnyFunSuite

import graft.Extract

/** Every payload variant must round-trip ARBITRARY document text
  * byte-identically through the kernel — the local pin of what the driver's
  * x10 DuckDB oracle checks end-to-end (incl. crypt auth+decrypt, the CMap
  * greedy decode, the repair path, LZW/RLE, and inline-image skipping).
  */
class PagesGenSpec extends AnyFunSuite {

  private val texts = Seq(
    "Hello World",
    "", // empty document
    "parens (nested (deep)) and \\backslash\\ and )stray(",
    "unicode: café ☺ ß 中文 glyphs (BMP)",
    "key agg row scan slow fast table value part hash",
    "multi\nline\ntext with\ttabs", // control chars travel as-is in PDF strings
    "x" * 2000 // longer than one bfchar block budget
  )

  test("all PDF payload variants round-trip text byte-identically") {
    for (v <- 0 until PagesGen.PdfVariants; (t, ti) <- texts.zipWithIndex) {
      val payload = PagesGen.payloadFor(docId = 1000L + ti, text = t, variant = v)
      val r = Extract(payload)
      assert(r.status == "ok", s"variant $v text #$ti: status=${r.status} err=${r.error}")
      assert(r.text == t, s"variant $v text #$ti mismatch: [${r.text.take(80)}]")
    }
  }

  test("non-BMP text round-trips in every variant EXCEPT the CMap one") {
    val t = "non-BMP 𝄞 glyph" // U+1D11E musical G clef
    for (v <- 0 until PagesGen.PdfVariants if v != 4) {
      val r = Extract(PagesGen.payloadFor(2000L, t, v))
      assert(r.status == "ok" && r.text == t, s"variant $v")
    }
    // Reference quirk pin (cmap/utils.go:21-33 hexToString): every 2-byte
    // hex pair becomes ONE rune, so a UTF-16 surrogate pair in a bfchar dst
    // decodes as two invalid runes -> two U+FFFD. The kernel matches the
    // reference, NOT correct UTF-16BE.
    val r4 = Extract(PagesGen.payloadFor(2000L, t, 4))
    assert(r4.status == "ok")
    assert(r4.text == "non-BMP �� glyph")
  }

  test("html variant round-trips whitespace-normalized text") {
    val t = "a web page paragraph that is long enough to be kept by the scorer"
    val r = Extract(PagesGen.payloadFor(1L, t, PagesGen.PdfVariants))
    assert(r.status == "ok")
    assert(r.text == t)
  }

  test("crypt fixtures authenticate with the EMPTY user password only") {
    // A wrong non-empty password falls back to "" internally, so open must
    // still succeed — but the O/U values must be genuine: corrupting U must
    // fail auth and error the doc.
    val good = graft.fixtures.PdfFixtures.sEncrypted("secret text", 7L, aes = true)
    assert(Extract(good).text == "secret text")
    val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
    val uIdx = s.indexOf("/U <")
    val corrupted = good.clone()
    corrupted(uIdx + 4) = (if (corrupted(uIdx + 4) == '0') '1' else '0').toByte
    // Corrupt one hex digit of /U: with O also failing (different owner
    // password), authentication must reject and the doc errors.
    val r = Extract(corrupted)
    assert(r.status == "error", s"expected error, got ${r.status}")
  }
}
