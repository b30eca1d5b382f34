package graft.pdf

import scala.collection.mutable

/** Markup-annotation authoring with APPEARANCE STREAMS — re-creates the
  * reference annotator (annotator/line.go:20-160, rectangle.go, circle.go)
  * over the Draw shapes (graft.pdf.Draw = contentstream/draw/shapes.go):
  * every annotation carries /AP /N -> a Form XObject whose content stream
  * draws the shape in LOCAL coordinates (the form /BBox) while the
  * annotation /Rect places it globally; opacity < 1 adds an /ExtGState
  * (/ca) named gs1 to the form resources and a gs op (line.go:81-95).
  * Content bytes come from ContentCreator, i.e. the reference's
  * DefaultWriteString operand layout.
  */
object Annotator {

  type Rgb = Draw.Rgb
  val Rgb: Draw.Rgb.type = Draw.Rgb

  final case class LineDef(x1: Double, y1: Double, x2: Double, y2: Double,
                           color: Rgb = Rgb(1, 0, 0), width: Double = 1.0,
                           opacity: Double = 1.0,
                           ending1: Draw.LineEndingStyle = Draw.EndingNone,
                           ending2: Draw.LineEndingStyle = Draw.EndingNone)

  final case class RectDef(x: Double, y: Double, width: Double, height: Double,
                           fill: Option[Rgb] = None,
                           border: Option[(Rgb, Double)] = Some((Rgb(1, 0, 0), 1.0)),
                           opacity: Double = 1.0)

  /** Built annotation: the dict still missing /AP (the author wires the
    * form object number in), the form's content bytes, the form /BBox and
    * the global /Rect (llx, lly, urx, ury).
    */
  final case class Built(dict: PdfDict, formContent: Array[Byte],
                         bbox: (Double, Double, Double, Double),
                         rect: (Double, Double, Double, Double),
                         opacity: Double)

  private def colorArr(c: Rgb): PdfArr =
    PdfArr(PdfReal(c.r), PdfReal(c.g), PdfReal(c.b))

  /** /BS border style dict (model NewBorderStyle + SetBorderWidth). */
  private def borderStyle(w: Double): PdfDict =
    PdfDict("Type" -> PdfName("Border"), "W" -> PdfReal(w))

  private def gsOf(opacity: Double): String = if (opacity < 1.0) "gs1" else ""

  private def leName(s: Draw.LineEndingStyle): PdfName = s match {
    case Draw.EndingArrow => PdfName("ClosedArrow") // line.go:40-47
    case _                => PdfName("None")
  }

  /** CreateLineAnnotation (annotator/line.go:31-76): drawn locally at the
    * origin (drawPdfLine passes X1=Y1=0), /Rect = global offset of the
    * local bbox.
    */
  def line(d: LineDef): Built = {
    val (content, local) = Draw.Line(0, 0, d.x2 - d.x1, d.y2 - d.y1, d.color,
      d.width, d.opacity, d.ending1, d.ending2).draw(gsOf(d.opacity))
    val bbox = (local.llx, local.lly, local.urx, local.ury)
    val rect = (d.x1 + local.llx, d.y1 + local.lly, d.x1 + local.urx, d.y1 + local.ury)
    val dict = PdfDict(
      "Type" -> PdfName("Annot"),
      "Subtype" -> PdfName("Line"),
      "L" -> PdfArr(PdfReal(d.x1), PdfReal(d.y1), PdfReal(d.x2), PdfReal(d.y2)),
      "LE" -> PdfArr(leName(d.ending1), leName(d.ending2)),
      "C" -> colorArr(d.color),
      "IC" -> colorArr(d.color),
      "BS" -> borderStyle(d.width),
      "Rect" -> PdfArr(PdfReal(rect._1), PdfReal(rect._2), PdfReal(rect._3), PdfReal(rect._4)))
    if (d.opacity < 1.0) dict.set("CA", PdfReal(d.opacity))
    Built(dict, content, bbox, rect, d.opacity)
  }

  /** CreateRectangleAnnotation (annotator/rectangle.go) — /Square. */
  def rectangle(d: RectDef): Built = {
    val (content, local) = Draw.Rectangle(0, 0, d.width, d.height, d.fill,
      d.border, d.opacity).draw(gsOf(d.opacity))
    val bbox = (local.llx, local.lly, local.urx, local.ury)
    val rect = (d.x + local.llx, d.y + local.lly, d.x + local.urx, d.y + local.ury)
    val dict = PdfDict(
      "Type" -> PdfName("Annot"),
      "Subtype" -> PdfName("Square"),
      "Rect" -> PdfArr(PdfReal(rect._1), PdfReal(rect._2), PdfReal(rect._3), PdfReal(rect._4)))
    d.border.foreach { case (c, w2) =>
      dict.set("C", colorArr(c))
      dict.set("BS", borderStyle(w2))
    }
    d.fill match {
      case Some(c) => dict.set("IC", colorArr(c))
      case None    => dict.set("IC", PdfArr()) // "No fill" marker (rectangle.go)
    }
    if (d.opacity < 1.0) dict.set("CA", PdfReal(d.opacity))
    Built(dict, content, bbox, rect, d.opacity)
  }

  /** CreateCircleAnnotation (annotator/circle.go) — /Circle. */
  def circle(d: RectDef): Built = {
    val (content, local) = Draw.Circle(0, 0, d.width, d.height, d.fill,
      d.border, d.opacity).draw(gsOf(d.opacity))
    val bbox = (local.llx, local.lly, local.urx, local.ury)
    val rect = (d.x + local.llx, d.y + local.lly, d.x + local.urx, d.y + local.ury)
    val dict = PdfDict(
      "Type" -> PdfName("Annot"),
      "Subtype" -> PdfName("Circle"),
      "Rect" -> PdfArr(PdfReal(rect._1), PdfReal(rect._2), PdfReal(rect._3), PdfReal(rect._4)))
    d.border.foreach { case (c, w2) =>
      dict.set("C", colorArr(c))
      dict.set("BS", borderStyle(w2))
    }
    d.fill.foreach(c => dict.set("IC", colorArr(c)))
    if (d.opacity < 1.0) dict.set("CA", PdfReal(d.opacity))
    Built(dict, content, bbox, rect, d.opacity)
  }

  /** Author a one-page document: text content + the given annotations,
    * each with its /AP /N Form XObject (opacity adds the gs1 /ExtGState to
    * the form resources). The output reopens through the kernel:
    * loadAnnotations validates the dicts, text extraction is unaffected,
    * and the file round-trips PdfWriter.rewrite.
    */
  def authorAnnotated(text: String, annots: Seq[Built]): Array[Byte] = {
    val content = new ContentCreator()
      .add_BT().add_Tf("F1", 12)
      .add_Tj(text).add_ET().bytes
    val objs = mutable.ArrayBuffer.empty[(Long, PdfObj)]
    val annotRefs = mutable.ArrayBuffer.empty[PdfObj]
    var next = 5L
    for (b <- annots) {
      val dictNum = next
      val formNum = next + 1
      next += 2
      val formRes = new PdfDict
      if (b.opacity < 1.0)
        formRes.set("ExtGState",
          PdfDict("gs1" -> PdfDict("ca" -> PdfReal(b.opacity))))
      val formDict = PdfDict(
        "Type" -> PdfName("XObject"),
        "Subtype" -> PdfName("Form"),
        "FormType" -> PdfInt(1),
        "BBox" -> PdfArr(PdfReal(b.bbox._1), PdfReal(b.bbox._2),
          PdfReal(b.bbox._3), PdfReal(b.bbox._4)),
        "Resources" -> formRes,
        "Length" -> PdfInt(b.formContent.length))
      val annotDict = new PdfDict
      for (k <- b.dict.keys) annotDict.set(k, b.dict.get(k))
      annotDict.set("AP", PdfDict("N" -> PdfRef(formNum, 0)))
      objs += dictNum -> annotDict
      objs += formNum -> new PdfStream(formNum, 0, formDict, b.formContent)
      annotRefs += PdfRef(dictNum, 0)
    }
    val page = PdfDict(
      "Type" -> PdfName("Page"),
      "Parent" -> PdfRef(2, 0),
      "Resources" -> PdfDict(
        "Font" -> PdfDict("F1" -> PdfDict(
          "Type" -> PdfName("Font"),
          "Subtype" -> PdfName("Type1"),
          "BaseFont" -> PdfName("Helvetica")))),
      "Annots" -> new PdfArr(annotRefs),
      "Contents" -> PdfRef(4, 0))
    val all = Seq[(Long, PdfObj)](
      1L -> PdfDict("Type" -> PdfName("Catalog"), "Pages" -> PdfRef(2, 0)),
      2L -> PdfDict("Type" -> PdfName("Pages"), "Kids" -> PdfArr(PdfRef(3, 0)),
        "Count" -> PdfInt(1),
        "MediaBox" -> PdfArr(PdfInt(0), PdfInt(0), PdfInt(612), PdfInt(792))),
      3L -> page,
      4L -> new PdfStream(4, 0,
        PdfDict("Length" -> PdfInt(content.length)), content)) ++ objs
    PdfWriter.writeFile(all, Seq("Root" -> PdfRef(1, 0)))
  }
}
