package graft.pdf

/** Shading and pattern MODEL objects — re-creates the reference's
  * model/shading.go:138-330 (newPdfShadingFromPdfObject + per-type
  * loaders) and model/pattern.go:15-200 (newPdfPatternFromPdfObject,
  * tiling/shading contexts):
  *
  *  - shading container may be a dict, stream or indirect-to-dict;
  *    /ShadingType is a REQUIRED integer in 1..7, /ColorSpace is REQUIRED
  *    (full colorspace factory), /Background and /BBox optional arrays
  *    (BBox must be a 4-number rectangle), /AntiAlias optional bool;
  *  - type 1 (function-based): optional /Domain + /Matrix arrays, REQUIRED
  *    /Function (single or array, parsed through the function factory);
  *  - type 2 (axial): REQUIRED /Coords of length 4, REQUIRED /Function,
  *    optional /Domain, /Extend (length 2);
  *  - type 3 (radial): REQUIRED /Coords of length 6, REQUIRED /Function,
  *    optional /Domain, /Extend (length 2);
  *  - types 4-7 (mesh families): REQUIRED integer /BitsPerCoordinate and
  *    /BitsPerComponent (+ /BitsPerFlag for 4/6/7, /VerticesPerRow for 5),
  *    REQUIRED /Decode array and /Function (the reference loads the mesh
  *    parameters; mesh sample decoding happens at render time, which
  *    neither engine implements);
  *  - pattern: REQUIRED /PatternType 1|2. Tiling (1) must be a STREAM
  *    with integer /PaintType and /TilingType, 4-number /BBox, numeric
  *    /XStep and /YStep, /Resources dict; its cell content decodes through
  *    the filter chain. Shading (2) carries a REQUIRED /Shading validated
  *    as above plus an optional 6-number /Matrix.
  */
object PdfShadingModel {

  final case class PdfShadingInfo(shadingType: Int, colorSpace: PdfColorspace,
                                  background: Option[PdfArr],
                                  bbox: Option[(Double, Double, Double, Double)],
                                  antiAlias: Boolean,
                                  coords: Option[PdfArr],
                                  functions: Seq[PdfFunction])

  sealed trait PdfPatternInfo { def patternType: Int }
  final case class TilingPattern(paintType: Int, tilingType: Int,
                                 bbox: (Double, Double, Double, Double),
                                 xStep: Double, yStep: Double,
                                 cellContent: Array[Byte]) extends PdfPatternInfo {
    val patternType = 1
    def isColored: Boolean = paintType == 1
  }
  final case class ShadingPattern(shading: PdfShadingInfo,
                                  matrix: Option[PdfArr]) extends PdfPatternInfo {
    val patternType = 2
  }

  private def num(o: PdfObj): Double = o match {
    case PdfInt(v)  => v.toDouble
    case PdfReal(v) => v
    case _          => throw new PdfError("not a number")
  }

  private def rect4(arr: PdfArr): (Double, Double, Double, Double) = {
    if (arr.length != 4) throw new PdfError("rectangle array not length 4")
    (num(arr(0)), num(arr(1)), num(arr(2)), num(arr(3)))
  }

  /** Function entry: single object or array of objects (shading.go:
    * type-2 loader Function handling).
    */
  private def functions(obj: PdfObj, resolve: PdfObj => PdfObj): Seq[PdfFunction] =
    PdfObjs.traceToDirect(resolve(obj)) match {
      case arr: PdfArr => arr.items.toSeq.map(o => PdfFunction.fromObject(o, resolve))
      case single      => Seq(PdfFunction.fromObject(single, resolve))
    }

  /** newPdfShadingFromPdfObject (shading.go:138-300). */
  def shadingFromObject(obj0: PdfObj, resolve: PdfObj => PdfObj): PdfShadingInfo = {
    val dict = PdfObjs.traceToDirect(resolve(obj0)) match {
      case d: PdfDict    => d
      case st: PdfStream => st.dict
      case _             => throw new PdfError("shading object type unexpected")
    }
    val st = PdfObjs.traceToDirect(resolve(dict.get("ShadingType"))) match {
      case null      => throw new PdfError("Required shading type missing")
      case PdfInt(v) =>
        if (v < 1 || v > 7) throw new PdfError(s"Invalid shading type, not 1-7 (got $v)")
        v.toInt
      case _ => throw new PdfError("Invalid type for shading type")
    }
    val csObj = dict.get("ColorSpace")
    if (csObj == null) throw new PdfError("Required ColorSpace entry missing")
    val cs = PdfColorspace.fromObject(PdfObjs.traceToDirect(resolve(csObj)), resolve)
    val background = PdfObjs.traceToDirect(resolve(dict.get("Background"))) match {
      case null        => None
      case arr: PdfArr => Some(arr)
      case _           => throw new PdfError("Background should be specified by an array")
    }
    val bbox = PdfObjs.traceToDirect(resolve(dict.get("BBox"))) match {
      case null        => None
      case arr: PdfArr => Some(rect4(arr))
      case _           => throw new PdfError("BBox should be specified by an array")
    }
    val antiAlias = PdfObjs.traceToDirect(resolve(dict.get("AntiAlias"))) match {
      case null       => false
      case PdfBool(v) => v
      case _          => throw new PdfError("AntiAlias invalid type, should be bool")
    }
    def reqInt(key: String): Unit =
      PdfObjs.traceToDirect(resolve(dict.get(key))) match {
        case PdfInt(_) => ()
        case null      => throw new PdfError(s"Required attribute missing: $key")
        case _         => throw new PdfError(s"$key invalid type")
      }
    def reqArr(key: String): PdfArr =
      PdfObjs.traceToDirect(resolve(dict.get(key))) match {
        case arr: PdfArr => arr
        case null        => throw new PdfError(s"Required attribute missing: $key")
        case _           => throw new PdfError(s"$key not an array")
      }
    def optExtend(): Unit =
      PdfObjs.traceToDirect(resolve(dict.get("Extend"))) match {
        case null => ()
        case arr: PdfArr =>
          if (arr.length != 2) throw new PdfError(s"Extend length not 2 (got ${arr.length})")
        case _ => throw new PdfError("Extend not an array")
      }
    var coords: Option[PdfArr] = None
    var fns: Seq[PdfFunction] = Nil
    st match {
      case 1 =>
        fns = functions(
          Option(dict.get("Function")).getOrElse(
            throw new PdfError("Required attribute missing: Function")), resolve)
      case 2 | 3 =>
        val want = if (st == 2) 4 else 6
        val c = reqArr("Coords")
        if (c.length != want)
          throw new PdfError(s"Coords length not $want (got ${c.length})")
        coords = Some(c)
        optExtend()
        fns = functions(
          Option(dict.get("Function")).getOrElse(
            throw new PdfError("Required attribute missing: Function")), resolve)
      case 4 | 6 | 7 =>
        reqInt("BitsPerCoordinate"); reqInt("BitsPerComponent"); reqInt("BitsPerFlag")
        reqArr("Decode")
        fns = functions(
          Option(dict.get("Function")).getOrElse(
            throw new PdfError("Required attribute missing: Function")), resolve)
      case 5 =>
        reqInt("BitsPerCoordinate"); reqInt("BitsPerComponent"); reqInt("VerticesPerRow")
        reqArr("Decode")
        fns = functions(
          Option(dict.get("Function")).getOrElse(
            throw new PdfError("Required attribute missing: Function")), resolve)
    }
    PdfShadingInfo(st, cs, background, bbox, antiAlias, coords, fns)
  }

  /** newPdfPatternFromPdfObject (pattern.go): tiling (stream container
    * REQUIRED) or shading pattern.
    */
  def patternFromObject(obj0: PdfObj, resolve: PdfObj => PdfObj): PdfPatternInfo = {
    val resolved = resolve(obj0) match {
      case ind: PdfIndirect => ind.obj
      case other            => other
    }
    val dict = resolved match {
      case d: PdfDict    => d
      case st: PdfStream => st.dict
      case _             => throw new PdfError("pattern object type unexpected")
    }
    val pt = PdfObjs.traceToDirect(resolve(dict.get("PatternType"))) match {
      case null      => throw new PdfError("Pattern type required")
      case PdfInt(v) =>
        if (v != 1 && v != 2) throw new PdfError(s"Pattern type != 1/2 (got $v)")
        v.toInt
      case _ => throw new PdfError("Pattern type numeric check")
    }
    if (pt == 1) {
      val stream = resolved match {
        case st: PdfStream => st
        case _ => throw new PdfError("Tiling pattern container not a stream")
      }
      def reqIntV(key: String): Int =
        PdfObjs.traceToDirect(resolve(dict.get(key))) match {
          case PdfInt(v) => v.toInt
          case null      => throw new PdfError(s"$key missing")
          case _         => throw new PdfError(s"$key invalid type")
        }
      val paint = reqIntV("PaintType")
      val tiling = reqIntV("TilingType")
      val bbox = PdfObjs.traceToDirect(resolve(dict.get("BBox"))) match {
        case arr: PdfArr => rect4(arr)
        case null        => throw new PdfError("BBox missing")
        case _           => throw new PdfError("BBox should be specified by an array")
      }
      def reqNum(key: String): Double =
        PdfObjs.traceToDirect(resolve(dict.get(key))) match {
          case null => throw new PdfError(s"$key missing")
          case o    => num(o)
        }
      val cell = Filters.decodeStream(stream, resolve)
      TilingPattern(paint, tiling, bbox, reqNum("XStep"), reqNum("YStep"), cell)
    } else {
      val sh = dict.get("Shading")
      if (sh == null) throw new PdfError("Shading missing")
      val matrix = PdfObjs.traceToDirect(resolve(dict.get("Matrix"))) match {
        case null => None
        case arr: PdfArr =>
          if (arr.length != 6) throw new PdfError(s"Matrix length not 6 (got ${arr.length})")
          Some(arr)
        case _ => throw new PdfError("Matrix not an array")
      }
      ShadingPattern(shadingFromObject(sh, resolve), matrix)
    }
  }
}
