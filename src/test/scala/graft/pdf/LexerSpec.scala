package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.scalatest.funsuite.AnyFunSuite

/** File-layer lexer goldens ported from /root/reference/pdf/core/parser_test.go. */
class LexerSpec extends AnyFunSuite {

  private def lexer(s: String): ObjLexer = new ObjLexer(new ByteCursor(s.getBytes(ISO_8859_1)))

  // parser_test.go:44-59
  val namePairs: Map[String, String] = Map(
    "/Name1" -> "Name1",
    "/ASomewhatLongerName" -> "ASomewhatLongerName",
    "/A;Name_With-Various***Characters?" -> "A;Name_With-Various***Characters?",
    "/1.2" -> "1.2",
    "/$$" -> "$$",
    "/@pattern" -> "@pattern",
    "/.notdef" -> ".notdef",
    "/Lime#20Green" -> "Lime Green",
    "/paired#28#29parentheses" -> "paired()parentheses",
    "/The_Key_of_F#23_Minor" -> "The_Key_of_F#_Minor",
    "/A#42" -> "AB",
    "/" -> "",
    "/ " -> "",
    "/#3CBC88#3E#3CC5ED#3E#3CD544#3E#3CC694#3E" -> "<BC88><C5ED><D544><C694>")

  test("name parsing goldens") {
    for ((raw, expected) <- namePairs) {
      assert(lexer(raw).parseName().name == expected, s"for input $raw")
    }
    // must start with '/'
    assertThrows[PdfError](lexer(" /Name").parseName())
  }

  // parser_test.go:113-126
  val stringPairs: Map[String, String] = Map(
    "(This is a string)" -> "This is a string",
    "(Strings may contain\n newlines and such)" -> "Strings may contain\n newlines and such",
    "(Strings may contain balanced parenthesis () and\nspecial characters (*!&}^% and so on).)" ->
      "Strings may contain balanced parenthesis () and\nspecial characters (*!&}^% and so on).",
    "(These \\\ntwo strings \\\nare the same.)" -> "These two strings are the same.",
    "(These two strings are the same.)" -> "These two strings are the same.",
    "(\\\\)" -> "\\",
    "(This string has an end-of-line at the end of it.\n)" ->
      "This string has an end-of-line at the end of it.\n",
    "(So does this one.\\n)" -> "So does this one.\n",
    "(\\0053)" -> "\u00053",
    "(\\53)" -> "+",
    "(\\053)" -> "+",
    "(\\53\\101)" -> "+A")

  test("string parsing goldens") {
    for ((raw, expected) <- stringPairs) {
      val got = new String(lexer(raw).parseString().bytes, ISO_8859_1)
      assert(got == expected, s"for input ${raw.replace("\n", "\\n")}")
    }
  }

  test("binary string: Encrypt /O-style string decodes to 32 bytes") {
    // parser_test.go:155-170
    val raw = "(\u00E6\u0000\u00EC\u00C2\u0002\u0088\u00AD\u008B\\r\u0064\u00A9" +
      "\\)\u00C6\u00A8\u003E\u00E2\u0051\u0076\u0079\u00AA\u0002\u0018\u00BE\u00CE\u00EA" +
      "\u008B\u0079\u0086\u0072\u006A\u008C\u00DB)"
    val got = lexer(raw).parseString()
    assert(got.bytes.length == 32)
  }

  test("octal boundary: \\278A parses as \\27 octal then '8A'") {
    // parser_test.go:173-187
    val raw = "[(\\227\\224`\\274\\31W\\216\\276\\23\\231\\246U\\33\\317\\6-)(\\210S\\377:\\322\\278A\\200$*/e]\\371|)]"
    val arr = lexer(raw).parseArray()
    assert(arr.length == 2)
  }

  test("numeric parsing 1: mixed int/float array") {
    // parser_test.go:225-267
    val arr = lexer("[34.5 -3.62 1 +123.6 4. -.002 0.0]").parseArray()
    assert(arr.length == 7)
    assert(arr(0) == PdfReal(34.5))
    assert(arr(1) == PdfReal(-3.62))
    assert(arr(2) == PdfInt(1))
    assert(arr(3) == PdfReal(123.6))
    assert(arr(4) == PdfReal(4.0))
    assert(arr(5) == PdfReal(-0.002))
    assert(arr(6) == PdfReal(0.0))
  }

  test("numeric parsing 2: glued signs [+4.-.002]") {
    val arr = lexer("[+4.-.002]").parseArray()
    assert(arr.length == 2)
    assert(arr(0) == PdfReal(4.0))
    assert(arr(1) == PdfReal(-0.002))
  }

  test("numeric parsing 3: exponentials [+4.-.002+3e-2-2e0]") {
    val arr = lexer("[+4.-.002+3e-2-2e0]").parseArray()
    assert(arr.length == 4)
    assert(arr(0) == PdfReal(4.0))
    assert(arr(1) == PdfReal(-0.002))
    assert(math.abs(arr(2).asInstanceOf[PdfReal].value - 0.03) < 1e-12)
    assert(arr(3) == PdfReal(-2.0))
  }

  test("dict parsing 1") {
    val d = lexer("<<\n\t/Name /Game /key/val/data\t[0 1 2 3.14 5]\t\n\n>>").parseDict()
    assert(d.keys.length == 3)
    assert(d.get("Name") == PdfName("Game"))
    assert(d.get("key") == PdfName("val"))
    val data = d.get("data").asInstanceOf[PdfArr]
    assert(data(2) == PdfInt(2))
    assert(data(3) == PdfReal(3.14))
  }

  test("dict parsing 2: nested") {
    val raw = "<< /Type /Example\n" +
      "/Subtype /DictionaryExample /Version 0.01\n" +
      "/IntegerItem 12 \n" +
      "/StringItem (a string) /Subdictionary << /Item1 0.4\n" +
      "/Item2 true /LastItem (not!) /VeryLastItem (OK)\n" +
      ">>\n >>"
    val d = lexer(raw).parseDict()
    assert(d.keys.length == 6)
    assert(d.get("Type") == PdfName("Example"))
    assert(d.get("StringItem") == PdfStr.ascii("a string"))
    val sub = d.get("Subdictionary").asInstanceOf[PdfDict]
    assert(sub.get("Item2") == PdfBool(true))
    assert(sub.get("Item1") == PdfReal(0.4))
  }

  test("dict parsing 3: empty dict") {
    assert(lexer("<<>>").parseDict().keys.isEmpty)
  }

  test("object dispatch: int vs reference vs bool") {
    // parser_test.go:597-682
    assert(lexer(" \t9 0 false").parseObject() == PdfInt(9))
    assert(lexer("9 0 false").parseObject() == PdfInt(9))
    assert(lexer("9 0 R false").parseObject() == PdfRef(9, 0))
    assert(lexer("909 0 R false").parseObject() == PdfRef(909, 0))
    assert(lexer("false 9 0 R").parseObject() == PdfBool(false))
  }

  test("indirect object: messy catalog with binary RightsID strings") {
    // parser_test.go:503-537 (trimmed binary content, same structure)
    val raw = "1 0 obj\n<<\n/Names 2 0 R\n/Pages 3 0 R\n/Metadata 4 0 R\n/ViewerPreferences\n<<\n/Rights\n<<\n" +
      "/Document [/FullSave]\n/TimeOfUbiquitization (D:20071210131309Z)\n" +
      "/RightsID [(x\\\\\u00C4-z\u0080\u0083\u00E3[W< b\u0099\\rhv\u00E8C) (#$\u00D0J\u0003) (kc2\u00B5)]\n" +
      "/Version 1\n/Msg (This form has rights applied to it.)\n" +
      "/Form [/Import /Export /SubmitStandalone /SpawnTemplate]\n>>\n>>\n/AcroForm 5 0 R\n/Type /Catalog\n>>\nendobj\n3 0 obj\n"
    val p = new PdfFileParser(raw.getBytes(ISO_8859_1))
    val obj = p.parseIndirectObject()
    assert(obj.isInstanceOf[PdfIndirect])
    val d = obj.asInstanceOf[PdfIndirect].obj.asInstanceOf[PdfDict]
    assert(d.get("Type") == PdfName("Catalog"))
  }

  test("xref stream: ASCIIHex /W [1 2 2] -> 4 entries, type-2 objstream refs") {
    // parser_test.go:542-595
    val raw = "99 0 obj\n<<  /Type /XRef\n    /Index [0 5]\n    /W [1 2 2]\n" +
      "    /Filter /ASCIIHexDecode\n    /Size 5\n    /Length 65\n>>\nstream\n" +
      "00 0000 FFFF\n02 000F 0000\n02 000F 0001\n02 000F 0002\n01 BA5E 0000>\nendstream\nendobj"
    val p = new PdfFileParser(raw.getBytes(ISO_8859_1))
    val dict = p.parseXrefStream(None)
    assert(dict.get("Type") == PdfName("XRef"))
    assert(p.xrefs.size == 4)
    assert(p.xrefs(3).xtype == XrefEntry.ObjectStream)
    assert(p.xrefs(3).osObjNumber == 15)
    assert(p.xrefs(3).osObjIndex == 2)
  }

  test("readTextLine keeps offset consistent") {
    val cur = new ByteCursor("abc\u00b0cde".getBytes(ISO_8859_1))
    val lx = new ObjLexer(cur)
    intercept[PdfError](lx.readTextLine()) // no EOL: reference returns io.EOF error
  }

  test("fuzz: trace of missing ref returns PdfNull without error") {
    val p = new PdfFileParser(" /Name".getBytes(ISO_8859_1))
    assert(p.trace(PdfRef(-1, 0)) == PdfNull)
  }

  test("fuzz: self-referential /Length errors instead of hanging") {
    val raw = "13 0 obj\n<< /Length 13 0 R >>\nstream\nxxx\nendstream\n"
    val p = new PdfFileParser(raw.getBytes(ISO_8859_1))
    p.xrefs(13) = XrefEntry.table(13, 0, 0)
    assertThrows[PdfError](p.parseIndirectObject())
  }

  test("fuzz: self-referential /Length with wrong number errors") {
    val raw = "13 0 obj\n<< /Length 12 0 R >>\nstream\nxxx\nendstream\n"
    val p = new PdfFileParser(raw.getBytes(ISO_8859_1))
    p.xrefs(12) = XrefEntry.table(12, 0, 0)
    assertThrows[PdfError](p.parseIndirectObject())
  }

  test("fuzz: invalid /Prev tolerated") {
    val raw = "\nxref\n0 1\n0000000000 65535 f\n0000000001 00000 n\ntrailer\n" +
      "<</Info 1 0 R/Root 2 0 R/Size 17/Prev /Invalid>>\nstartxref\n0\n%%EOF\n"
    val p = new PdfFileParser(raw.getBytes(ISO_8859_1))
    val trailer = p.loadXrefs() // must not throw
    assert(trailer.get("Size") == PdfInt(17))
  }

  test("bool parsing (7.3.2)") {
    assert(lexer("false").parseBool() == PdfBool(false))
    assert(lexer("true").parseBool() == PdfBool(true))
    // a "true" prefix parses as bool with the remainder left over (Go quirk)
    assert(lexer("trueX and trailing").parseObject() == PdfBool(true))
    assertThrows[PdfError](lexer("maybe").parseBool())
  }

  test("parseObject fast dispatch equals the reference-regex decision") {
    // The r06 window-scan dispatch must classify references exactly like
    // the anchored regex did on the 15-byte peek: same groups when it
    // matches, never a reference when the regex would not match (incl. the
    // NUL corner — NUL is PDF whitespace but NOT in the regex S class).
    val snippets = Seq(
      "12 0 R", "1 0 R /Next", "12 0 R\n", "007 008 R", "12  0   R",
      "12\t0\tR", "12 0 Rx", "12 0R", "1 2 3 R", "12 x", "12.5]",
      "123456789012345 0 R", "12 345678901234 R", "12 0 q",
      "12\u0000" + "0 R", "12 \u0000" + "0 R", "-12 ", "+12 ", ".5 ", "-.002 ",
      "3e2 ", "12", "0 R", "12 R")
    for (s <- snippets) {
      val window = s.take(15)
      val mRef = PdfPatterns.reference.matcher(window)
      val expectRef = mRef.find()
      val lex = lexer(s)
      val obj =
        try Right(lex.parseObject())
        catch { case e: PdfError => Left(e.getMessage) }
      if (expectRef)
        assert(obj == Right(PdfRef(mRef.group(1).toLong, mRef.group(2).toLong)),
          s"expected ref for '${s.replace("\u0000", "\\0")}', got $obj")
      else
        assert(!obj.exists(_.isInstanceOf[PdfRef]),
          s"unexpected ref for '${s.replace("\u0000", "\\0")}': $obj")
    }
    // exact values on the corners
    assert(lexer("12\u0000" + "0 R").parseObject() == PdfInt(12)) // NUL kills the ref
    assert(lexer("12.5]").parseObject() == PdfReal(12.5))
    assert(lexer("-12 ").parseObject() == PdfInt(-12))
    assert(lexer("null and more").parseObject() == PdfNull)
  }
}
