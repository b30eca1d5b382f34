package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

import graft.Extract
import graft.fixtures.PdfFixtures

/** PostScript calculator (graft.pdf.Ps) — goldens ported from the
  * reference's pdf/ps/parser_test.go (the DebugString render format is
  * reproduced so expected strings match verbatim), plus the PDF-function
  * family (Type 0/2/3/4) and the Separation/DeviceN scn end-to-end paths.
  */
class PsSpec extends AnyFunSuite {

  private def dbg(o: Ps.PsObj): String = o match {
    case Ps.PsInt(v)  => s"int:$v"
    case Ps.PsReal(v) => f"real:$v%.5f"
    case Ps.PsBool(v) => s"bool:$v"
    case _            => "other"
  }

  private def run(progText: String): String = {
    val out = Ps.execute(Ps.parse(progText.getBytes), Nil)
    if (out.isEmpty) "[ ]" else out.map(dbg).mkString("[ ", " ", " ]")
  }

  test("arithmetics (parser_test.go TestAdd/TestSub/TestArithmetics)") {
    assert(run("{ 1 1 add }") == "[ int:2 ]")
    assert(run("{ 1.1 1 add 3 4 add add }") == "[ real:9.10000 ]")
    assert(run("{ 8.3 6.6 sub }") == "[ real:1.70000 ]")
    assert(run("{ 8 6.3 sub }") == "[ real:1.70000 ]")
    assert(run("{ 8 6 sub }") == "[ int:2 ]")
    assert(run("{ 3 8 div 6 add }") == "[ real:6.37500 ]")
    assert(run("{ 6 3 8 div add }") == "[ real:6.37500 ]")
    assert(run("{ 8 7 3 mul sub }") == "[ int:-13 ]")
    assert(run("{ 7 3 mul 8 exch sub }") == "[ int:-13 ]")
  }

  test("stack ops (TestStackOperations)") {
    assert(run("{ 7 8 9 3 1 roll }") == "[ int:9 int:7 int:8 ]")
    assert(run("{ 7 8 9 3 -1 roll }") == "[ int:8 int:9 int:7 ]")
    assert(run("{ 9 7 8 3 -1 roll }") == "[ int:7 int:8 int:9 ]")
    assert(run("{ 1 1 0.2 7 8 9 3 1 roll }") == "[ int:1 int:1 real:0.20000 int:9 int:7 int:8 ]")
  }

  test("atan (TestFunctionOperations)") {
    assert(run("{ 0 1 atan }") == "[ real:0.00000 ]")
    assert(run("{ 1 0 atan }") == "[ real:90.00000 ]")
    assert(run("{ -100 0 atan }") == "[ real:270.00000 ]")
    assert(run("{ 4 4 atan }") == "[ real:45.00000 ]")
  }

  test("various cases (TestVariousCases, full table)") {
    val cases = Seq(
      "{ 99 dup }" -> "[ int:99 int:99 ]",
      "{ 3.2 ceiling }" -> "[ real:4.00000 ]",
      "{ -4.8 ceiling }" -> "[ real:-4.00000 ]",
      "{ 99 ceiling }" -> "[ int:99 ]",
      "{ 3.2 floor }" -> "[ real:3.00000 ]",
      "{ -4.8 floor }" -> "[ real:-5.00000 ]",
      "{ 99 floor }" -> "[ int:99 ]",
      "{ 9 0.5 exp }" -> "[ real:3.00000 ]",
      "{ -9 -1 exp }" -> "[ real:-0.11111 ]",
      "{ true true and }" -> "[ bool:true ]",
      "{ true false and }" -> "[ bool:false ]",
      "{ false true and }" -> "[ bool:false ]",
      "{ false false and }" -> "[ bool:false ]",
      "{ 99 1 and }" -> "[ int:1 ]",
      "{ 52 7 and }" -> "[ int:4 ]",
      "{ 7 3 bitshift }" -> "[ int:56 ]",
      "{ 142 -3 bitshift }" -> "[ int:17 ]",
      "{ 7 3 2 copy }" -> "[ int:7 int:3 int:7 int:3 ]",
      "{ 7 3 0 copy }" -> "[ int:7 int:3 ]",
      "{ 0 cos }" -> "[ real:1.00000 ]",
      "{ 90 cos }" -> "[ real:0.00000 ]",
      "{ 4.0 4 eq }" -> "[ bool:true ]",
      "{ 4 4.0 eq }" -> "[ bool:true ]",
      "{ 4.0 4.0 eq }" -> "[ bool:true ]",
      "{ 4 4 eq }" -> "[ bool:true ]",
      "{ -4 4 eq }" -> "[ bool:false ]",
      "{ false false eq }" -> "[ bool:true ]",
      "{ true false eq }" -> "[ bool:false ]",
      "{ true 4 eq }" -> "[ bool:false ]",
      "{ 4.2 4 ge }" -> "[ bool:true ]",
      "{ 4 4 ge }" -> "[ bool:true ]",
      "{ 3.9 4 ge }" -> "[ bool:false ]",
      "{ 4.2 4 gt }" -> "[ bool:true ]",
      "{ 4 4 gt }" -> "[ bool:false ]",
      "{ 3.9 4 gt }" -> "[ bool:false ]",
      "{ 4.2 4 gt {5} if }" -> "[ int:5 ]",
      "{ 4.2 4 gt {4.0 4.0 ge {3} if} if}" -> "[ int:3 ]",
      "{ 4.0 4.0 gt {5} if }" -> "[ ]",
      "{ 4.2 4 gt {5} {4} ifelse }" -> "[ int:5 ]",
      "{ 3 4 gt {5} {4} ifelse }" -> "[ int:4 ]",
      "{ 0 1 2 3 4 5 2 index }" -> "[ int:0 int:1 int:2 int:3 int:4 int:5 int:3 ]",
      "{ 9 8 7 2 index }" -> "[ int:9 int:8 int:7 int:9 ]",
      "{ 4.2 4 le }" -> "[ bool:false ]",
      "{ 4 4 le }" -> "[ bool:true ]",
      "{ 3.9 4 le }" -> "[ bool:true ]",
      "{ 10 ln }" -> "[ real:2.30259 ]",
      "{ 100 ln }" -> "[ real:4.60517 ]",
      "{ 10 log }" -> "[ real:1.00000 ]",
      "{ 100 log }" -> "[ real:2.00000 ]",
      "{ 4.2 4 lt }" -> "[ bool:false ]",
      "{ 4 4 lt }" -> "[ bool:false ]",
      "{ 3.9 4 lt }" -> "[ bool:true ]",
      "{ 4.0 4 ne }" -> "[ bool:false ]",
      "{ -4 4 ne }" -> "[ bool:true ]",
      "{ false false ne }" -> "[ bool:false ]",
      "{ true false ne }" -> "[ bool:true ]",
      "{ true 4 ne }" -> "[ bool:true ]",
      "{ true not }" -> "[ bool:false ]",
      "{ false not }" -> "[ bool:true ]",
      "{ 52 not }" -> "[ int:-53 ]",
      "{ 17 5 or }" -> "[ int:21 ]",
      "{ 1 2 3 pop }" -> "[ int:1 int:2 ]",
      "{ 3.2 round }" -> "[ real:3.00000 ]",
      "{ 6.5 round }" -> "[ real:7.00000 ]",
      "{ -4.8 round }" -> "[ real:-5.00000 ]",
      "{ -6.5 round }" -> "[ real:-6.00000 ]",
      "{ 99 round }" -> "[ int:99 ]",
      "{ 1 2 3 3 -1 roll }" -> "[ int:2 int:3 int:1 ]",
      "{ 1 2 3 3 1 roll }" -> "[ int:3 int:1 int:2 ]",
      "{ 1 2 3 3 0 roll }" -> "[ int:1 int:2 int:3 ]",
      "{ 0 sin }" -> "[ real:0.00000 ]",
      "{ 90 sin }" -> "[ real:1.00000 ]",
      "{ 4 sqrt }" -> "[ real:2.00000 ]",
      "{ 2 sqrt }" -> "[ real:1.41421 ]",
      "{ 3.2 truncate }" -> "[ real:3.00000 ]",
      "{ -4.8 truncate }" -> "[ real:-4.00000 ]",
      "{ 99 truncate }" -> "[ int:99 ]",
      "{ 7 3 xor }" -> "[ int:4 ]",
      "{ 12 3 xor }" -> "[ int:15 ]",
      "{ 0.0000 dup 0 mul exch dup 0 mul exch dup 0 mul exch 1 mul }" ->
        "[ real:0.00000 real:0.00000 real:0.00000 real:0.00000 ]")
    for ((prog, want) <- cases)
      assert(run(prog) == want, s"program: $prog")
  }

  test("hostile roll count hits the per-doc deadline instead of spinning") {
    Deadline.set(System.nanoTime() + 300L * 1000000L) // 300ms budget
    try {
      val t0 = System.nanoTime()
      intercept[PdfTimeout](run("{ 1 2 3 3 2000000000 roll }"))
      val ms = (System.nanoTime() - t0) / 1000000L
      assert(ms < 5000, s"roll should abort on deadline quickly, took ${ms}ms")
    } finally Deadline.clear()
  }

  test("errors: div by zero, exp undefined, sqrt range, unsupported operand, parse") {
    intercept[PdfError](run("{ 5 0 div }"))
    intercept[PdfError](run("{ -2 0.5 exp }"))
    intercept[PdfError](run("{ -1 sqrt }"))
    intercept[PdfError](run("{ 1 frobnicate }"))
    intercept[PdfError](Ps.parse("no brace".getBytes))
    // EOF before closing brace is TOLERATED (parser.go breaks on EOF)
    assert(run("{ 1 2 add ") == "[ int:3 ]")
  }

  test("Type 2 exponential function evaluates") {
    val d = PdfDict(
      "FunctionType" -> PdfInt(2), "Domain" -> PdfArr(PdfInt(0), PdfInt(1)),
      "C0" -> PdfArr(PdfReal(0.0), PdfReal(0.2)), "C1" -> PdfArr(PdfReal(1.0), PdfReal(0.8)),
      "N" -> PdfInt(1))
    val f = PdfFunction.fromObject(d, identity)
    val out = f.evaluate(Array(0.5))
    assert(math.abs(out(0) - 0.5) < 1e-9 && math.abs(out(1) - 0.5) < 1e-9)
  }

  test("Type 3 stitching: loads but Evaluate errors like the reference") {
    val sub = PdfDict("FunctionType" -> PdfInt(2), "Domain" -> PdfArr(PdfInt(0), PdfInt(1)),
      "C0" -> PdfArr(PdfInt(0)), "C1" -> PdfArr(PdfInt(1)), "N" -> PdfInt(1))
    val d = PdfDict(
      "FunctionType" -> PdfInt(3), "Domain" -> PdfArr(PdfInt(0), PdfInt(1)),
      "Functions" -> PdfArr(sub, sub), "Bounds" -> PdfArr(PdfReal(0.5)),
      "Encode" -> PdfArr(PdfInt(0), PdfInt(1), PdfInt(0), PdfInt(1)))
    val f = PdfFunction.fromObject(d, identity)
    val e = intercept[PdfError](f.evaluate(Array(0.3)))
    assert(e.getMessage == "Not implemented yet")
  }

  test("Type 0 sampled function: nearest-neighbour eval + resample quirk") {
    // 8-bit samples [0, 128, 255] over domain [0,1], range [0,1].
    val raw = Array[Byte](0, 0x80.toByte, 0xff.toByte)
    val st = new PdfStream(9, 0, PdfDict(
      "FunctionType" -> PdfInt(0), "Domain" -> PdfArr(PdfInt(0), PdfInt(1)),
      "Range" -> PdfArr(PdfInt(0), PdfInt(1)), "Size" -> PdfArr(PdfInt(3)),
      "BitsPerSample" -> PdfInt(8), "Length" -> PdfInt(raw.length)), raw)
    val f = PdfFunction.fromObject(st, identity)
    assert(f.evaluate(Array(0.0))(0) == 0.0)
    assert(math.abs(f.evaluate(Array(0.5))(0) - 128.0 / 256.0) < 1e-9)
    assert(math.abs(f.evaluate(Array(1.0))(0) - 255.0 / 256.0) < 1e-9)
    // resample quirk: trailing remainder bits are DROPPED (reference
    // resample.go loop exits once the last byte is consumed)
    assert(PdfFunction.resampleBytes(Array[Byte](0xAB.toByte), 4).toSeq == Seq(0xA))
    assert(PdfFunction.resampleBytes(Array[Byte](0xAB.toByte, 0xCD.toByte), 4).toSeq ==
      Seq(0xA, 0xB, 0xC))
  }

  test("Type 0 with TWO inputs: sample-table index arithmetic") {
    // 2x2 grid of 8-bit samples (row-major over the FIRST input fastest,
    // functions.go:333-340: m = i0 + i1*Size[0]):
    //   (0,0)->10, (1,0)->20, (0,1)->30, (1,1)->40
    val raw = Array[Byte](10, 20, 30, 40)
    val st = new PdfStream(9, 0, PdfDict(
      "FunctionType" -> PdfInt(0),
      "Domain" -> PdfArr(PdfInt(0), PdfInt(1), PdfInt(0), PdfInt(1)),
      "Range" -> PdfArr(PdfInt(0), PdfInt(1)),
      "Size" -> PdfArr(PdfInt(2), PdfInt(2)),
      "BitsPerSample" -> PdfInt(8), "Length" -> PdfInt(raw.length)), raw)
    val f = PdfFunction.fromObject(st, identity)
    def v(x0: Double, x1: Double): Double = f.evaluate(Array(x0, x1))(0) * 256.0
    assert(math.abs(v(0, 0) - 10) < 1e-9)
    assert(math.abs(v(1, 0) - 20) < 1e-9)
    assert(math.abs(v(0, 1) - 30) < 1e-9)
    assert(math.abs(v(1, 1) - 40) < 1e-9)
  }

  test("Separation scn with succeeding Type-4 tint -> full text") {
    val r = Extract(PdfFixtures.sSeparation("tinted text extracted"))
    assert(r.status == "ok", r.error)
    assert(r.text == "tinted text extracted")
  }

  test("Separation scn tint failures -> partial text + error (reference abort contract)") {
    for (kind <- Seq("range", "type3", "psop")) {
      val r = Extract(PdfFixtures.sSeparationFailing(kind))
      assert(r.status == "error", s"$kind: ${r.status}")
      assert(r.text == "partial", s"$kind: [${r.text}]")
    }
  }

  test("Separation with a BROKEN tint program fails at page load (eager resources parse)") {
    // Invalid PS (no leading brace) -> colorspace load error -> doc error
    // with NO text, mirroring the reference's eager model-layer load.
    val res = s"<< /Font << /F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >> " +
      "/ColorSpace << /Sep0 [/Separation /Spot /DeviceGray 5 0 R] >> >>"
    val bld = new PdfFixtures.Builder()
    bld.obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    bld.obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
    bld.obj(3, s"<< /Type /Page /Parent 2 0 R /Resources $res /Contents 4 0 R >>")
    val c = "BT (hello) Tj ET".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    bld.stream(4, s"<< /Length ${c.length} >>", c)
    val prog = "not a program".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    bld.stream(5, s"<< /FunctionType 4 /Domain [0 1] /Length ${prog.length} >>", prog)
    val r = Extract(bld.build())
    assert(r.status == "error")
    assert(r.text == "")
  }
}
