package graft.pdf

import scala.collection.mutable

/** Markup-annotation authoring with APPEARANCE STREAMS — re-creates the
  * reference annotator (annotator/line.go:20-160, rectangle.go, circle.go)
  * over its draw package (contentstream/draw/shapes.go):
  *
  *  - every annotation carries /AP /N -> a Form XObject whose content
  *    stream draws the shape in LOCAL coordinates (the form /BBox), while
  *    the annotation /Rect places it globally;
  *  - LINE: the stroke is a FILLED 4-point polygon perpendicular-offset
  *    around the segment (shapes.go:194-240 Vs/V1..V4 trigonometry), ops
  *    q rg [gs] m l l l f Q. Arrow endings (LineEndingStyleArrow) are NOT
  *    re-created — /LE is always [/None /None] here;
  *  - RECTANGLE (/Square): closed 5-point path, fill rg / border RG+w,
  *    h then B / f / S by fill+border flags (shapes.go:117-158);
  *  - CIRCLE: four cubic Beziers with the 0.551784 magic constant
  *    (shapes.go:26-100), inset by borderWidth/2 when bordered;
  *  - opacity < 1 adds an /ExtGState (/ca) named gs1 to the form
  *    resources and a gs op (line.go:81-95).
  */
object Annotator {

  final case class Rgb(r: Double, g: Double, b: Double)

  final case class LineDef(x1: Double, y1: Double, x2: Double, y2: Double,
                           color: Rgb = Rgb(1, 0, 0), width: Double = 1.0,
                           opacity: Double = 1.0)

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

  private def num(v: Double): String = {
    val r = math.rint(v * 1000000) / 1000000 // clamp float dust
    if (r == math.rint(r)) r.toLong.toString
    else BigDecimal(r).underlying.stripTrailingZeros.toPlainString
  }

  private final class Ops {
    val sb = new java.lang.StringBuilder
    def op(parts: String*): this.type = { sb.append(parts.mkString(" ")).append('\n'); this }
    def bytes: Array[Byte] = sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def colorArr(c: Rgb): PdfArr =
    PdfArr(PdfReal(c.r), PdfReal(c.g), PdfReal(c.b))

  /** /BS border style dict (model NewBorderStyle + SetBorderWidth). */
  private def borderStyle(w: Double): PdfDict =
    PdfDict("Type" -> PdfName("Border"), "W" -> PdfReal(w))

  /** CreateLineAnnotation (annotator/line.go:31-76) without arrow endings. */
  def line(d: LineDef): Built = {
    val dx = d.x2 - d.x1
    val dy = d.y2 - d.y1
    val theta = math.atan2(dy, dx)
    val len = math.sqrt(dx * dx + dy * dy)
    val w = d.width
    val pi = math.Pi
    var mul = 1.0
    if (dx < 0) mul = -mul
    if (dy < 0) mul = -mul
    // shapes.go:216-233 — perpendicular offsets around the (0,0)-anchored
    // segment (the annotator draws in local coordinates, line.go:115-123)
    val vsX = mul * (-w / 2 * math.cos(theta + pi / 2))
    val vsY = mul * (-w / 2 * math.sin(theta + pi / 2) + w * math.sin(theta + pi / 2))
    val pts = Array(
      (vsX + w / 2 * math.cos(theta + pi / 2), vsY + w / 2 * math.sin(theta + pi / 2)),
      (vsX + w / 2 * math.cos(theta + pi / 2) + len * math.cos(theta),
        vsY + w / 2 * math.sin(theta + pi / 2) + len * math.sin(theta)),
      (vsX + w / 2 * math.cos(theta + pi / 2) + len * math.cos(theta) + w * math.cos(theta - pi / 2),
        vsY + w / 2 * math.sin(theta + pi / 2) + len * math.sin(theta) + w * math.sin(theta - pi / 2)),
      (vsX + w / 2 * math.cos(theta - pi / 2), vsY + w / 2 * math.sin(theta - pi / 2)))
    val ops = new Ops
    ops.op("q")
    ops.op(num(d.color.r), num(d.color.g), num(d.color.b), "rg")
    if (d.opacity < 1.0) ops.op("/gs1", "gs")
    for (((x, y), i) <- pts.zipWithIndex)
      ops.op(num(x), num(y), if (i == 0) "m" else "l")
    ops.op("f")
    ops.op("Q")
    val xs = pts.map(_._1); val ys = pts.map(_._2)
    val bbox = (xs.min, ys.min, xs.max, ys.max)
    val rect = (d.x1 + bbox._1, d.y1 + bbox._2, d.x1 + bbox._3, d.y1 + bbox._4)
    val dict = PdfDict(
      "Type" -> PdfName("Annot"),
      "Subtype" -> PdfName("Line"),
      "L" -> PdfArr(PdfReal(d.x1), PdfReal(d.y1), PdfReal(d.x2), PdfReal(d.y2)),
      "LE" -> PdfArr(PdfName("None"), PdfName("None")),
      "C" -> colorArr(d.color),
      "IC" -> colorArr(d.color),
      "BS" -> borderStyle(d.width),
      "Rect" -> PdfArr(PdfReal(rect._1), PdfReal(rect._2), PdfReal(rect._3), PdfReal(rect._4)))
    if (d.opacity < 1.0) dict.set("CA", PdfReal(d.opacity))
    Built(dict, ops.bytes, bbox, rect, d.opacity)
  }

  private def shapeTail(ops: Ops, fill: Option[Rgb], border: Option[(Rgb, Double)]): Unit = {
    ops.op("h")
    (fill, border) match {
      case (Some(_), Some(_)) => ops.op("B")
      case (Some(_), None)    => ops.op("f")
      case (None, Some(_))    => ops.op("S")
      case (None, None)       => ()
    }
    ops.op("Q")
  }

  private def shapeHead(ops: Ops, fill: Option[Rgb], border: Option[(Rgb, Double)],
                        opacity: Double): Unit = {
    ops.op("q")
    fill.foreach(c => ops.op(num(c.r), num(c.g), num(c.b), "rg"))
    border.foreach { case (c, bw) =>
      ops.op(num(c.r), num(c.g), num(c.b), "RG")
      ops.op(num(bw), "w")
    }
    if (opacity < 1.0) ops.op("/gs1", "gs")
  }

  /** CreateRectangleAnnotation (annotator/rectangle.go) — /Square. */
  def rectangle(d: RectDef): Built = {
    val ops = new Ops
    shapeHead(ops, d.fill, d.border, d.opacity)
    // local closed path (shapes.go:118-128), drawn at the origin
    val pts = Seq((0.0, 0.0), (0.0, d.height), (d.width, d.height), (d.width, 0.0), (0.0, 0.0))
    for (((x, y), i) <- pts.zipWithIndex)
      ops.op(num(x), num(y), if (i == 0) "m" else "l")
    shapeTail(ops, d.fill, d.border)
    val bw = d.border.map(_._2).getOrElse(0.0)
    val bbox = (-bw / 2, -bw / 2, d.width + bw / 2, d.height + bw / 2)
    val rect = (d.x + bbox._1, d.y + bbox._2, d.x + bbox._3, d.y + bbox._4)
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
    Built(dict, ops.bytes, bbox, rect, d.opacity)
  }

  /** CreateCircleAnnotation (annotator/circle.go) — /Circle, four cubic
    * Beziers with the 0.551784 magic constant (shapes.go:26-100).
    */
  def circle(d: RectDef): Built = {
    val bw = d.border.map(_._2).getOrElse(0.0)
    var xRad = d.width / 2
    var yRad = d.height / 2
    if (d.border.isDefined) { xRad -= bw / 2; yRad -= bw / 2 }
    val magic = 0.551784
    val xm = xRad * magic
    val ym = yRad * magic
    // curves around (0,0), then offset to the first quadrant (+border inset)
    val off = (xRad + (if (d.border.isDefined) bw / 2 else 0.0),
      yRad + (if (d.border.isDefined) bw / 2 else 0.0))
    def p(x: Double, y: Double) = (x + off._1, y + off._2)
    val curves = Seq(
      (p(-xRad, 0), p(-xRad, ym), p(-xm, yRad), p(0, yRad)),
      (p(0, yRad), p(xm, yRad), p(xRad, ym), p(xRad, 0)),
      (p(xRad, 0), p(xRad, -ym), p(xm, -yRad), p(0, -yRad)),
      (p(0, -yRad), p(-xm, -yRad), p(-xRad, -ym), p(-xRad, 0)))
    val ops = new Ops
    shapeHead(ops, d.fill, d.border, d.opacity)
    for (((p0, p1, p2, p3), i) <- curves.zipWithIndex) {
      if (i == 0) ops.op(num(p0._1), num(p0._2), "m")
      ops.op(num(p1._1), num(p1._2), num(p2._1), num(p2._2), num(p3._1), num(p3._2), "c")
    }
    shapeTail(ops, d.fill, d.border)
    // control points stay inside the circumscribed square (magic < 1), so
    // the path bbox is the square; stroke widens it by borderWidth
    // (shapes.go:80-96)
    val bbox = (-bw / 2, -bw / 2, d.width + bw / 2, d.height + bw / 2)
    val rect = (d.x + bbox._1, d.y + bbox._2, d.x + bbox._3, d.y + bbox._4)
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
    Built(dict, ops.bytes, bbox, rect, d.opacity)
  }

  /** Author a one-page document: text content + the given annotations,
    * each with its /AP /N Form XObject (opacity adds the gs1 /ExtGState to
    * the form resources). The output reopens through the kernel:
    * loadAnnotations validates the dicts, text extraction is unaffected,
    * and the file round-trips PdfWriter.rewrite.
    */
  def authorAnnotated(text: String, annots: Seq[Built]): Array[Byte] = {
    val content = ("BT /F1 12 Tf (" + text.replace("\\", "\\\\")
      .replace("(", "\\(").replace(")", "\\)") + ") Tj ET")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
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
