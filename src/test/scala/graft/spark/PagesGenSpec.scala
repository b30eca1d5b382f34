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

  test("non-BMP text round-trips in EVERY variant (CMap fixture falls back)") {
    // The reference decodes bfchar dst pairs as single runes (cmap/
    // utils.go:21-33) — a supplementary-plane codepoint CANNOT round-trip
    // through a CMap (the kernel quirk stays pinned in CMapSpec). The
    // fixture builder therefore authors such docs with the classic-xref
    // container instead, so the byte-identity gate never constructs an
    // un-round-trippable payload.
    val t = "non-BMP 𝄞 glyph" // U+1D11E musical G clef
    for (v <- 0 until PagesGen.PdfVariants) {
      val r = Extract(PagesGen.payloadFor(2000L, t, v))
      assert(r.status == "ok" && r.text == t, s"variant $v")
    }
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
