package graft.pdf

/** Vector shapes drawn through ContentCreator — re-creates the reference
  * draw package (contentstream/draw/): Point/Vector/Path/CubicBezierPath
  * primitives (point.go, vector.go, path.go, bezier_curve.go) and the
  * three shapes (shapes.go): Line (stroke as a FILLED perpendicular-offset
  * polygon, optional ClosedArrow endings via the polar-vector
  * constructions of shapes.go:249-318), Rectangle (closed 5-point path)
  * and Circle (four cubic Beziers, 0.551784 magic constant). Each Draw
  * returns (content bytes, bounding box) like the reference.
  */
object Draw {

  final case class Point(x: Double, y: Double) {
    def add(dx: Double, dy: Double): Point = Point(x + dx, y + dy)
    def addVector(v: Vec): Point = Point(x + v.dx, y + v.dy)
  }

  /** vector.go: polar constructor; Flip/Scale go through magnitude+angle
    * (reference quirk — keeps their float rounding).
    */
  final case class Vec(dx: Double, dy: Double) {
    def add(o: Vec): Vec = Vec(dx + o.dx, dy + o.dy)
    def magnitude: Double = math.sqrt(dx * dx + dy * dy)
    def polarAngle: Double = math.atan2(dy, dx)
    def flip: Vec = {
      val m = magnitude; val t = polarAngle
      Vec(m * math.cos(t + math.Pi), m * math.sin(t + math.Pi))
    }
    def scale(factor: Double): Vec = {
      val m = magnitude; val t = polarAngle
      Vec(factor * m * math.cos(t), factor * m * math.sin(t))
    }
  }
  def vectorPolar(length: Double, theta: Double): Vec =
    Vec(length * math.cos(theta), length * math.sin(theta))

  final case class Rect(llx: Double, lly: Double, urx: Double, ury: Double)

  final case class Path(points: Vector[Point] = Vector.empty) {
    def append(p: Point): Path = Path(points :+ p)
    def offset(dx: Double, dy: Double): Path = Path(points.map(_.add(dx, dy)))
    /** 1-based like the reference GetPointNumber. */
    def pointNumber(n: Int): Point =
      if (n < 1 || n > points.length) Point(0, 0) else points(n - 1)
    def boundingBox: Rect = {
      if (points.isEmpty) return Rect(0, 0, 0, 0)
      val xs = points.map(_.x); val ys = points.map(_.y)
      Rect(xs.min, ys.min, xs.max, ys.max)
    }
    /** DrawPathWithCreator (utils.go:9-17). */
    def drawWith(cc: ContentCreator): Unit =
      for ((p, i) <- points.zipWithIndex)
        if (i == 0) cc.add_m(p.x, p.y) else cc.add_l(p.x, p.y)
  }

  final case class BezierCurve(p0: Point, p1: Point, p2: Point, p3: Point) {
    def offset(dx: Double, dy: Double): BezierCurve =
      BezierCurve(p0.add(dx, dy), p1.add(dx, dy), p2.add(dx, dy), p3.add(dx, dy))
    /** GetBounds samples 1000 curve points (bezier_curve.go:48-85). */
    def bounds: Rect = {
      var minX = p0.x; var maxX = p0.x; var minY = p0.y; var maxY = p0.y
      var t = 0.0
      while (t <= 1.0) {
        val u = 1 - t
        val rx = p0.x * u * u * u + p1.x * 3 * t * u * u + p2.x * 3 * t * t * u + p3.x * t * t * t
        val ry = p0.y * u * u * u + p1.y * 3 * t * u * u + p2.y * 3 * t * t * u + p3.y * t * t * t
        if (rx < minX) minX = rx
        if (rx > maxX) maxX = rx
        if (ry < minY) minY = ry
        if (ry > maxY) maxY = ry
        t += 0.001
      }
      Rect(minX, minY, maxX, maxY)
    }
  }

  final case class BezierPath(curves: Vector[BezierCurve] = Vector.empty) {
    def append(c: BezierCurve): BezierPath = BezierPath(curves :+ c)
    def offset(dx: Double, dy: Double): BezierPath = BezierPath(curves.map(_.offset(dx, dy)))
    def boundingBox: Rect = {
      if (curves.isEmpty) return Rect(0, 0, 0, 0)
      val bs = curves.map(_.bounds)
      Rect(bs.map(_.llx).min, bs.map(_.lly).min, bs.map(_.urx).max, bs.map(_.ury).max)
    }
    /** DrawBezierPathWithCreator (utils.go:21-28). */
    def drawWith(cc: ContentCreator): Unit =
      for ((c, i) <- curves.zipWithIndex) {
        if (i == 0) cc.add_m(c.p0.x, c.p0.y)
        cc.add_c(c.p1.x, c.p1.y, c.p2.x, c.p2.y, c.p3.x, c.p3.y)
      }
  }

  sealed trait LineEndingStyle
  case object EndingNone extends LineEndingStyle
  case object EndingArrow extends LineEndingStyle

  final case class Rgb(r: Double, g: Double, b: Double)

  /** shapes.go:186-340 Line: the stroke is a filled polygon around the
    * segment (the band sits ABOVE a left-to-right segment — reference
    * quirk); ClosedArrow endings splice polar-vector arrowheads into the
    * path.
    */
  final case class Line(x1: Double, y1: Double, x2: Double, y2: Double,
                        color: Rgb = Rgb(0, 0, 0), width: Double = 1.0,
                        opacity: Double = 1.0,
                        ending1: LineEndingStyle = EndingNone,
                        ending2: LineEndingStyle = EndingNone) {
    def draw(gsName: String = ""): (Array[Byte], Rect) = {
      val dy = y2 - y1
      val dx = x2 - x1
      val theta = math.atan2(dy, dx)
      val len = math.sqrt(dx * dx + dy * dy)
      val w = width
      val pi = math.Pi
      var mul = 1.0
      if (dx < 0) mul = -mul
      if (dy < 0) mul = -mul
      val vsX = mul * (-w / 2 * math.cos(theta + pi / 2))
      val vsY = mul * (-w / 2 * math.sin(theta + pi / 2) + w * math.sin(theta + pi / 2))
      var path = Path()
        .append(Point(vsX + w / 2 * math.cos(theta + pi / 2),
          vsY + w / 2 * math.sin(theta + pi / 2)))
        .append(Point(vsX + w / 2 * math.cos(theta + pi / 2) + len * math.cos(theta),
          vsY + w / 2 * math.sin(theta + pi / 2) + len * math.sin(theta)))
        .append(Point(vsX + w / 2 * math.cos(theta + pi / 2) + len * math.cos(theta) + w * math.cos(theta - pi / 2),
          vsY + w / 2 * math.sin(theta + pi / 2) + len * math.sin(theta) + w * math.sin(theta - pi / 2)))
        .append(Point(vsX + w / 2 * math.cos(theta - pi / 2),
          vsY + w / 2 * math.sin(theta - pi / 2)))
      val arrowHeight = 3 * w
      val arrowWidth = 3 * w
      val arrowExtruding = (arrowWidth - w) / 2
      if (ending2 == EndingArrow) { // shapes.go:249-280
        val p2 = path.pointNumber(2)
        val pa1 = p2.addVector(vectorPolar(arrowHeight, theta + pi))
        val bVec = vectorPolar(arrowWidth / 2, theta + pi / 2)
        val aVec = vectorPolar(arrowHeight, theta)
        val pa2 = pa1.addVector(vectorPolar(arrowExtruding, theta + pi / 2))
        val va3 = aVec.add(bVec.flip)
        val pa3 = pa2.addVector(va3)
        val pa4 = pa3.addVector(bVec.scale(2).flip.add(va3.flip))
        val pa5 = pa1.addVector(vectorPolar(w, theta - pi / 2))
        path = Path(Vector(path.pointNumber(1), pa1, pa2, pa3, pa4, pa5,
          path.pointNumber(4)))
      }
      if (ending1 == EndingArrow) { // shapes.go:281-318
        val p1 = path.pointNumber(1)
        val pn = path.pointNumber(path.points.length)
        val pa1 = p1.addVector(vectorPolar(w / 2, theta + pi + pi / 2))
        val pa2 = pa1.addVector(
          vectorPolar(arrowHeight, theta).add(vectorPolar(arrowWidth / 2, theta + pi / 2)))
        val pa3 = pa2.addVector(vectorPolar(arrowExtruding, theta - pi / 2))
        val pa5 = pn.addVector(vectorPolar(arrowHeight, theta))
        val pa6 = pa5.addVector(vectorPolar(arrowExtruding, theta + pi + pi / 2))
        val pa7 = pa1
        path = Path(Vector(pa1, pa2, pa3) ++
          path.points.slice(1, path.points.length - 1) ++ Vector(pa5, pa6, pa7))
      }
      val cc = new ContentCreator
      cc.add_q().add_rg(color.r, color.g, color.b)
      if (gsName.length > 1) cc.add_gs(gsName)
      path = path.offset(x1, y1)
      val bbox = path.boundingBox
      path.drawWith(cc)
      cc.add_f().add_Q()
      (cc.bytes, bbox)
    }
  }

  /** shapes.go:117-158 Rectangle: closed 5-point path at (X,Y), painter op
    * by fill/border flags.
    */
  final case class Rectangle(x: Double, y: Double, width: Double, height: Double,
                             fill: Option[Rgb] = None,
                             border: Option[(Rgb, Double)] = None,
                             opacity: Double = 1.0) {
    def draw(gsName: String = ""): (Array[Byte], Rect) = {
      var path = Path()
        .append(Point(0, 0)).append(Point(0, height))
        .append(Point(width, height)).append(Point(width, 0)).append(Point(0, 0))
      if (x != 0 || y != 0) path = path.offset(x, y)
      val cc = new ContentCreator
      cc.add_q()
      fill.foreach(c => cc.add_rg(c.r, c.g, c.b))
      border.foreach { case (c, bw) => cc.add_RG(c.r, c.g, c.b).add_w(bw) }
      if (gsName.length > 1) cc.add_gs(gsName)
      path.drawWith(cc)
      cc.add_h()
      paintOp(cc)
      cc.add_Q()
      val pb = path.boundingBox
      val bw = border.map(_._2).getOrElse(0.0)
      // stroke widens the box by the border width (shapes.go:160-170 style)
      val bbox =
        if (border.isDefined) Rect(pb.llx - bw / 2, pb.lly - bw / 2, pb.urx + bw / 2, pb.ury + bw / 2)
        else pb
      (cc.bytes, bbox)
    }
    private def paintOp(cc: ContentCreator): Unit = (fill, border) match {
      case (Some(_), Some(_)) => cc.add_B()
      case (Some(_), None)    => cc.add_f()
      case (None, Some(_))    => cc.add_S()
      case (None, None)       => ()
    }
  }

  /** shapes.go:26-100 Circle/ellipse: four cubic Beziers with the 0.551784
    * magic constant, inset by borderWidth/2 when bordered.
    */
  final case class Circle(x: Double, y: Double, width: Double, height: Double,
                          fill: Option[Rgb] = None,
                          border: Option[(Rgb, Double)] = None,
                          opacity: Double = 1.0) {
    def draw(gsName: String = ""): (Array[Byte], Rect) = {
      val bw = border.map(_._2).getOrElse(0.0)
      var xRad = width / 2
      var yRad = height / 2
      if (border.isDefined) { xRad -= bw / 2; yRad -= bw / 2 }
      val magic = 0.551784
      val xm = xRad * magic
      val ym = yRad * magic
      var bp = BezierPath()
        .append(BezierCurve(Point(-xRad, 0), Point(-xRad, ym), Point(-xm, yRad), Point(0, yRad)))
        .append(BezierCurve(Point(0, yRad), Point(xm, yRad), Point(xRad, ym), Point(xRad, 0)))
        .append(BezierCurve(Point(xRad, 0), Point(xRad, -ym), Point(xm, -yRad), Point(0, -yRad)))
        .append(BezierCurve(Point(0, -yRad), Point(-xm, -yRad), Point(-xRad, -ym), Point(-xRad, 0)))
      bp = bp.offset(xRad, yRad)
      if (border.isDefined) bp = bp.offset(bw / 2, bw / 2)
      if (x != 0 || y != 0) bp = bp.offset(x, y)
      val cc = new ContentCreator
      cc.add_q()
      fill.foreach(c => cc.add_rg(c.r, c.g, c.b))
      border.foreach { case (c, w2) => cc.add_RG(c.r, c.g, c.b).add_w(w2) }
      if (gsName.length > 1) cc.add_gs(gsName)
      bp.drawWith(cc)
      cc.add_h()
      (fill, border) match {
        case (Some(_), Some(_)) => cc.add_B()
        case (Some(_), None)    => cc.add_f()
        case (None, Some(_))    => cc.add_S()
        case (None, None)       => ()
      }
      cc.add_Q()
      val pb = bp.boundingBox
      val bbox =
        if (border.isDefined)
          Rect(pb.llx - bw / 2, pb.lly - bw / 2, pb.urx + bw / 2, pb.ury + bw / 2)
        else pb
      (cc.bytes, bbox)
    }
  }
}
