package scratch
import graft.fixtures.PdfFixtures
import graft.pdf._
object Prof {
  def time(label: String, n: Int)(f: => Unit): Unit = {
    var i = 0; while (i < n/5) { f; i += 1 } // warm
    val t0 = System.nanoTime()
    i = 0; while (i < n) { f; i += 1 }
    println(f"[prof] $label%-28s ${(System.nanoTime()-t0)/1000.0/n}%8.1f us")
  }
  def main(args: Array[String]): Unit = {
    val lines = (0 until 100).map(k => s"[p$k r0 d17] lorem ipsum dolor sit amet consectetur")
    val pdf = PdfFixtures.multiLinePdf(lines, 0)     // raw classic
    val pdfF = PdfFixtures.multiLinePdf(lines, 1)    // flate
    val n = 3000
    time("full Extract (raw)", n) { graft.Extract(pdf) }
    time("full Extract (flate)", n) { graft.Extract(pdfF) }
    time("doc open (xref+pages)", n) { PdfDocument.open(pdf) }
    val doc = PdfDocument.open(pdf)
    val content = doc.allContentStreams(doc.pages.head)
    time("allContentStreams", n) { doc.allContentStreams(doc.pages.head) }
    time("content parse only", n) { new ContentParser(content).parse() }
    val ops = new ContentParser(content).parse()
    time("processor+handler only", n) { TextExtractor.extractText(content, doc.pages.head.resources) }
    println(s"[prof] content bytes=${content.length} ops=${ops.length}")
    val html = PdfFixtures.htmlMultiPara(lines)
    time("html extract", n) { graft.Extract(html) }
  }
}
