package graft.pdf

import java.io.ByteArrayOutputStream

import PdfObjs._

/** Result of extracting one page: raw output bytes + optional error message.
  * On error the buffer holds the PARTIAL text accumulated before the abort
  * (matching extractor.ExtractText's contract, pdf/extractor/text.go:224-228).
  */
final case class PageExtract(bytes: Array[Byte], error: Option[String])

/** The golden text-extraction operator handler (pdf/extractor/text.go:24-233).
  * Every branch below is a 1:1 port of the reference semantics:
  *
  *  - BT/ET gate all text ops (silently) except in the deprecated variant;
  *  - Tf reloads the ToUnicode CMap (codemap reset unconditionally; missing
  *    font in resources is an ABORT);
  *  - T* emits "\n"; Td/TD emit " " when tx>0 and "\n" when ty<0;
  *  - Tm reads only e,f and emits "\n" on descending y, "\t" on ascending x;
  *  - TJ emits mapped/raw string bytes, and a space for kern values < -100;
  *  - quote ops (' and ") and Do (XObjects) are NOT handled: their text is
  *    silently dropped;
  *  - any handler/processor error aborts and returns partial text.
  */
object TextExtractor {

  /** Modern extractor over one page's joined content streams. */
  def extractText(content: Array[Byte], resources: PdfResources): PageExtract = {
    // Presized to the content length (output text is bounded by ~the string
    // bytes of the stream): avoids the default-32-byte buffer's ~9 growth
    // doublings (~2x the text in copy traffic) per page. Capped so a huge
    // image-bearing stream doesn't over-allocate for a few text bytes.
    val buf = new ByteArrayOutputStream(math.max(64, math.min(content.length, 1 << 20)))
    val operations =
      try new ContentParser(content).parse()
      catch {
        case t: PdfTimeout => throw t
        case e: PdfError   => return PageExtract(Array.emptyByteArray, Some(e.getMessage))
      }

    var codemap: CMap = null
    var inText = false
    var xPos = -1.0
    var yPos = -1.0

    def numAsFloat(o: PdfObj): Option[Double] = o match {
      case PdfInt(v)  => Some(v.toDouble)
      case PdfReal(v) => Some(v)
      case _          => None
    }

    val processor = new ContentProcessor(operations.toSeq)
    try {
      processor.process(resources, (op, _, res) => {
        op.operand match {
          case "BT" => inText = true
          case "ET" => inText = false
          case "Tf" =>
            if (inText) {
              if (op.params.length != 2) throw new PdfError("Incorrect parameter count")
              codemap = null
              val fontName = op.params(0) match {
                case PdfName(n) => n
                case _          => throw new PdfError("Tf range error")
              }
              // resources == null: keep going (text.go:66-68). An EMPTY (but
              // present) resources dict still errors on font lookup below.
              if (res != null) {
                res.getFontByName(fontName) match {
                  case None => throw new PdfError("Font not in resources")
                  case Some(fontObj0) =>
                    PdfObjs.traceToDirect(fontObj0) match {
                      case fontDict: PdfDict =>
                        val toUnicode = fontDict.get("ToUnicode")
                        if (toUnicode != null) {
                          PdfObjs.traceToDirect(toUnicode) match {
                            case st: PdfStream =>
                              val decoded = Filters.decodeStream(st, identity)
                              codemap = CMapParser.load(decoded)
                            case _ => throw new PdfError("Invalid ToUnicode entry - not a stream")
                          }
                        }
                      case _ => ()
                    }
                }
              }
            }
          case "T*" =>
            if (inText) buf.write('\n')
          case "Td" | "TD" =>
            if (inText && op.params.length == 2) {
              (numAsFloat(op.params(0)), numAsFloat(op.params(1))) match {
                case (Some(tx), Some(ty)) =>
                  if (tx > 0) buf.write(' ')
                  if (ty < 0) buf.write('\n')
                case _ => () // parse failure: silent
              }
            }
          case "Tm" =>
            if (inText) {
              if (op.params.length != 6) throw new PdfError("Tm: Invalid number of inputs")
              (numAsFloat(op.params(4)), numAsFloat(op.params(5))) match {
                case (Some(e), Some(f)) =>
                  var skip = false
                  if (yPos == -1) yPos = f
                  else if (yPos > f) {
                    buf.write('\n')
                    xPos = e; yPos = f
                    skip = true
                  }
                  if (!skip) {
                    if (xPos == -1) xPos = e
                    else if (xPos < e) { buf.write('\t'); xPos = e }
                  }
                case _ => () // non-numeric e/f: silent
              }
            }
          case "TJ" =>
            if (inText && op.params.nonEmpty) {
              val arr = op.params(0) match {
                case a: PdfArr => a
                case other => throw new PdfError(s"Invalid parameter type, no array (${other.getClass.getSimpleName})")
              }
              for (obj <- arr.items) obj match {
                case s: PdfStr =>
                  if (codemap != null) buf.write(codemap.charcodeBytesToUnicode(s.bytes))
                  else buf.write(s.bytes)
                case PdfReal(v) => if (v < -100) buf.write(' ')
                case PdfInt(v)  => if (v < -100) buf.write(' ')
                case _          => ()
              }
            }
          case "Tj" =>
            if (inText && op.params.nonEmpty) {
              val s = op.params(0) match {
                case str: PdfStr => str
                case other => throw new PdfError(s"Invalid parameter type, not string (${other.getClass.getSimpleName})")
              }
              if (codemap != null) buf.write(codemap.charcodeBytesToUnicode(s.bytes))
              else buf.write(s.bytes)
            }
          case _ => ()
        }
      })
    } catch {
      case t: PdfTimeout => throw t
      case e: PdfError   => return PageExtract(buf.toByteArray, Some(e.getMessage))
    }
    PageExtract(buf.toByteArray, None)
  }

  /** Deprecated second extractor (pdf/contentstream/contentstream.go:110-198):
    * no CMap, Td/TD/T* emit "\n" UNCONDITIONALLY, Tm handled outside the
    * inText gate too, and type errors return EMPTY text + error.
    */
  def extractTextDeprecated(content: Array[Byte]): PageExtract = {
    val operations =
      try new ContentParser(content).parse()
      catch {
        case t: PdfTimeout => throw t
        case e: PdfError   => return PageExtract(Array.emptyByteArray, Some(e.getMessage))
      }
    val buf = new ByteArrayOutputStream()
    var inText = false
    var xPos = -1.0
    var yPos = -1.0
    def numAsFloat(o: PdfObj): Option[Double] = o match {
      case PdfInt(v)  => Some(v.toDouble)
      case PdfReal(v) => Some(v)
      case _          => None
    }
    for (op <- operations) {
      op.operand match {
        case "BT" => inText = true
        case "ET" => inText = false
        case _    => ()
      }
      if (op.operand == "Td" || op.operand == "TD" || op.operand == "T*") buf.write('\n')
      if (op.operand == "Tm" && op.params.length == 6) {
        (numAsFloat(op.params(4)), numAsFloat(op.params(5))) match {
          case (Some(e), Some(f)) =>
            var skip = false
            if (yPos == -1) yPos = f
            else if (yPos > f) { buf.write('\n'); xPos = e; yPos = f; skip = true }
            if (!skip) {
              if (xPos == -1) xPos = e
              else if (xPos < e) { buf.write('\t'); xPos = e }
            }
          case _ => ()
        }
      }
      if (inText && op.operand == "TJ") {
        if (op.params.nonEmpty) {
          op.params(0) match {
            case arr: PdfArr =>
              for (obj <- arr.items) obj match {
                case s: PdfStr  => buf.write(s.bytes)
                case PdfReal(v) => if (v < -100) buf.write(' ')
                case PdfInt(v)  => if (v < -100) buf.write(' ')
                case _          => ()
              }
            case _ => return PageExtract(Array.emptyByteArray, Some("Invalid parameter type, no array"))
          }
        }
      } else if (inText && op.operand == "Tj") {
        if (op.params.nonEmpty) {
          op.params(0) match {
            case s: PdfStr => buf.write(s.bytes)
            case _ => return PageExtract(Array.emptyByteArray, Some("Invalid parameter type, not string"))
          }
        }
      }
    }
    PageExtract(buf.toByteArray, None)
  }
}
