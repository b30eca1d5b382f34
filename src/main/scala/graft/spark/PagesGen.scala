package graft.spark

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.fixtures.PdfFixtures

/** Deterministic synthesis of the Common-Crawl-shaped `pages` input table
  * (url, warc_ts, html binary, text, lang) from the driver's `documents`
  * parquet. No external data: payloads are built per row from the document
  * text by the fixture builders, so the expected extraction output is known
  * by construction. Payload variant rotates by doc_id so the corpus
  * exercises classic xref, flate, xref-stream+objstm, multi-filter, and the
  * HTML branch.
  */
object PagesGen {

  val BaseTs = 1767225600000L // 2026-01-01T00:00:00Z

  /** Number of rotating PDF payload variants (HTML is variant PdfVariants
    * in the mixed corpus). Every variant must round-trip the document text
    * byte-identically through the kernel — that is what the x10 DuckDB
    * oracle checks, so ALL the families below (incl. crypt, CMap, repairs,
    * LZW/RLE, inline images) carry hard end-to-end evidence.
    */
  val PdfVariants = 24

  /** Deterministic payload for one document. */
  def payloadFor(docId: Long, text: String, variant: Int): Array[Byte] = variant match {
    case 0  => PdfFixtures.s01(text)                    // classic xref, raw content
    case 1  => PdfFixtures.s06(text)                    // FlateDecode content
    case 2  => PdfFixtures.s07(text)                    // xref stream + objstm + predictor
    case 3  => PdfFixtures.s11(text)                    // multi-filter [A85, Flate]
    case 4  => PdfFixtures.sCmapDoc(text)               // ToUnicode CMap hex codes
    case 5  => PdfFixtures.sEncrypted(text, docId, aes = false) // RC4 V2/R3 crypt
    case 6  => PdfFixtures.sEncrypted(text, docId, aes = true)  // AESV2 V4/R4 crypt
    case 7  => PdfFixtures.s12(text)                    // broken startxref -> repair
    case 8  => PdfFixtures.sLzw(text)                   // LZWDecode content
    case 9  => PdfFixtures.sRle(text)                   // RunLengthDecode content
    case 10 => PdfFixtures.s15(text)                    // inline image (BI/ID/EI) + text
    case 11 => PdfFixtures.sSeparation(text)            // Separation + Type-4 PS tint
    case 12 => PdfFixtures.sEncryptedR6(text, docId)    // AESV3 V5/R6 crypt
    case 13 => PdfFixtures.sEncryptedObjstm(text, docId) // crypt x objstm x xref-stream
    case 14 => PdfFixtures.sAnnotated(text)             // annotation dispatch + popup
    case 15 => PdfFixtures.sHybrid(text)                // hybrid xref (/XRefStm)
    case 16 => PdfFixtures.sColorSpaces(text)           // Lab + CalRGB + Indexed
    case 17 => PdfFixtures.sTints(text)                 // Type-0 + Type-2 tint fns
    case 18 => PdfFixtures.sIncremental(text)           // incremental update (/Prev)
    case 19 => PdfFixtures.sAhx(text)                   // ASCIIHexDecode content
    case 20 => PdfFixtures.sTiffPred(text)              // Flate + TIFF Predictor 2
    case 21 => PdfFixtures.sShuffledXref(text)          // wrong offsets -> xref rebuild
    case 22 => PdfFixtures.sImages(text, docId)         // 3 XObject + 1 inline image page
    case 23 => PdfFixtures.sShading(text)               // axial shading + tiling/shading patterns
    case _  => PdfFixtures.htmlSimple(text)             // HTML branch
  }

  /** Shared generator: documents -> PageRow with a per-doc payload builder
    * (one body for all four corpus shapes below).
    */
  private def gen(spark: SparkSession, sfDir: String, prefix: String)(
      payload: (Long, String) => Array[Byte]): Dataset[PageRow] = {
    import spark.implicits._
    // documents.parquet is one small file = ONE scan partition; without the
    // adaptive spread the payload builder (and everything the caller chains
    // after it — rewrite, extraction) serializes on a single core. No-op
    // when the scan already yields >= defaultParallelism splits.
    TableIO.spreadScan(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text", "lang"), "doc_id")
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        PageRow(f"https://fixtures.test/$prefix%s-$id%06d",
          new Timestamp(BaseTs + id), payload(id, text), "", lang)
      }
  }

  /** pages table with PDF payloads only (for exact byte round-trip checks). */
  def pagesPdf(spark: SparkSession, sfDir: String): Dataset[PageRow] =
    gen(spark, sfDir, "doc")((id, text) => payloadFor(id, text, (id % PdfVariants).toInt))

  /** pages table with HTML payloads only. */
  def pagesHtml(spark: SparkSession, sfDir: String): Dataset[PageRow] =
    gen(spark, sfDir, "html")((_, text) => PdfFixtures.htmlSimple(text))

  /** Mixed corpus (PDF variants + HTML), rotation by doc_id. */
  def pagesMixed(spark: SparkSession, sfDir: String): Dataset[PageRow] =
    gen(spark, sfDir, "doc")((id, text) =>
      payloadFor(id, text, (id % (PdfVariants + 1)).toInt))

  /** Boilerplate-rich HTML pages (nav/header/aside/footer junk around an
    * article): extraction must emit exactly title + newline + content.
    */
  def pagesHtmlBoiler(spark: SparkSession, sfDir: String): Dataset[PageRow] =
    gen(spark, sfDir, "hb")((id, text) => PdfFixtures.htmlPage(s"Doc $id", Seq(text)))



  /** Bench corpus: documents replicated `replicas`x with distinct urls and
    * perturbed text (deterministic), mixed payload variants.
    */
  def pagesBench(spark: SparkSession, sfDir: String, replicas: Int,
                 textRepeat: Int = 40): Dataset[PageRow] = {
    import spark.implicits._
    // documents.parquet is a single file = a single input partition; spread
    // it BEFORE the payload-building flatMap or the build runs on one core.
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
      .repartition(64)
      .as[(Long, String, String)]
      .flatMap { case (id, text, lang) =>
        (0 until replicas).map { r =>
          val gid = id * replicas + r
          // Common-Crawl-sized, operator-dense payloads: textRepeat lines,
          // each its own text-positioning op pair (like real documents).
          val lines = (0 until textRepeat).map(k => s"[p$k r$r d$id] $text")
          val payload =
            if (gid % 5 == 4) PdfFixtures.htmlMultiPara(lines)
            else PdfFixtures.multiLinePdf(lines, (gid % 5).toInt)
          PageRow(f"https://bench.test/doc-$gid%08d",
            new Timestamp(BaseTs + gid), payload, "", lang)
        }
      }
  }

  /** Small smoke table mixing good docs, duplicates, an error doc, and an
    * oversize doc (FIXTURES.md §5 t1).
    */
  def smokeTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = Seq(
      PageRow("https://t/ok-pdf", new Timestamp(BaseTs), PdfFixtures.s01("Hello World"), "", "en"),
      PageRow("https://t/ok-flate", new Timestamp(BaseTs), PdfFixtures.s06("compressed"), "", "en"),
      PageRow("https://t/ok-html", new Timestamp(BaseTs),
        PdfFixtures.htmlPage("Title", Seq("A paragraph long enough to be kept by the scorer.")), "", "en"),
      // duplicate url: later capture must win
      PageRow("https://t/dup", new Timestamp(BaseTs), PdfFixtures.s01("old capture"), "", "en"),
      PageRow("https://t/dup", new Timestamp(BaseTs + 1000), PdfFixtures.s01("new capture"), "", "en"),
      PageRow("https://t/err", new Timestamp(BaseTs), PdfFixtures.s16(), "", "en"),
      PageRow("https://t/oversize", new Timestamp(BaseTs),
        PdfFixtures.s01("x" * 1024), "", "en"), // caught by a small cap in tests
      PageRow("https://t/empty", new Timestamp(BaseTs), Array.emptyByteArray, "", "en"))
    rows.toDF()
  }
}
