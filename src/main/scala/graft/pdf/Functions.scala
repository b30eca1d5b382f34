package graft.pdf

import PdfObjs._

/** PDF functions (pdf/model/functions.go) — the evaluation surface needed by
  * Separation/DeviceN tint transforms in the content-stream processor:
  *
  *  - Type 0 sampled (stream; nearest-neighbour interpolation like the
  *    reference's initial implementation, functions.go:292-352),
  *  - Type 2 exponential (dict),
  *  - Type 3 stitching (dict; the reference's Evaluate is "Not implemented
  *    yet" — we mirror the load-time validation AND the evaluate error),
  *  - Type 4 PostScript calculator (stream; graft.pdf.Ps).
  *
  * Type-4 Evaluate does NOT clip inputs to Domain or outputs to Range —
  * the reference doesn't either (functions.go:744-768); out-of-range outputs
  * surface as "Range check" errors in the alternate colorspace instead.
  */
sealed trait PdfFunction {
  def evaluate(x: Array[Double]): Array[Double]
}

object PdfFunction {

  private def numOf(obj: PdfObj): Double = obj match {
    case PdfInt(v)  => v.toDouble
    case PdfReal(v) => v
    case _          => throw new PdfError("Not a number")
  }

  private def floatArray(obj: PdfObj, resolve: PdfObj => PdfObj): Array[Double] =
    traceToDirect(resolve(obj)) match {
      case a: PdfArr => a.items.map(el => numOf(traceToDirect(resolve(el)))).toArray
      case _         => throw new PdfError("Required attribute missing or invalid")
    }

  private def optFloatArray(dict: PdfDict, key: String,
                            resolve: PdfObj => PdfObj): Option[Array[Double]] =
    dict.get(key) match {
      case null => None
      case o =>
        traceToDirect(resolve(o)) match {
          case a: PdfArr => Some(a.items.map(el => numOf(traceToDirect(resolve(el)))).toArray)
          case _         => None // reference: type assertion fails -> treated as absent
        }
    }

  /** newPdfFunctionFromPdfObject (functions.go:30-87): stream -> type 0/4;
    * indirect dict / dict -> type 2/3; anything else a type error.
    */
  def fromObject(obj0: PdfObj, resolve: PdfObj => PdfObj): PdfFunction = {
    val obj = obj0 match {
      case r: PdfRef => resolve(r)
      case o         => o
    }
    obj match {
      case st: PdfStream =>
        st.dict.get("FunctionType") match {
          case PdfInt(0) => type0FromStream(st, resolve)
          case PdfInt(4) => type4FromStream(st, resolve)
          case PdfInt(_) => throw new PdfError("Invalid function type")
          case _         => throw new PdfError("Invalid parameter or missing")
        }
      case io: PdfIndirect =>
        io.obj match {
          case st: PdfStream => fromObject(st, resolve)
          case d: PdfDict    => dictFunction(d, resolve)
          case _             => throw new PdfError("Invalid parameter or missing")
        }
      case d: PdfDict => dictFunction(d, resolve)
      case _          => throw new PdfError("Type error")
    }
  }

  private def dictFunction(d: PdfDict, resolve: PdfObj => PdfObj): PdfFunction =
    d.get("FunctionType") match {
      case PdfInt(2) => type2FromDict(d, resolve)
      case PdfInt(3) => type3FromDict(d, resolve)
      case PdfInt(_) => throw new PdfError("Invalid function type")
      case _         => throw new PdfError("Invalid parameter or missing")
    }

  /** Simple linear interpolation (functions.go:90-97). */
  def interpolate(x: Double, xmin: Double, xmax: Double, ymin: Double, ymax: Double): Double =
    if (math.abs(xmax - xmin) < 0.000001) ymin
    else ymin + (x - xmin) * (ymax - ymin) / (xmax - xmin)

  // ----------------------------------------------------------------- type 0

  final class Type0(val domain: Array[Double], val range: Array[Double],
                    val size: Array[Int], val bitsPerSample: Int,
                    val encode0: Option[Array[Double]], val decode0: Option[Array[Double]],
                    rawData: Array[Byte]) extends PdfFunction {
    val numInputs: Int = domain.length / 2
    val numOutputs: Int = range.length / 2
    private var data: Array[Long] = _

    def evaluate(x: Array[Double]): Array[Double] = {
      if (x.length != numInputs) throw new PdfError("Range check error")
      if (data == null) data = resampleBytes(rawData, bitsPerSample)
      val encode = encode0.getOrElse(
        size.flatMap(s => Array(0.0, (s - 1).toDouble)))
      val decode = decode0.getOrElse(range)
      val indices = new Array[Int](x.length)
      var i = 0
      while (i < x.length) {
        val xip = math.min(math.max(x(i), domain(2 * i)), domain(2 * i + 1))
        val ei = interpolate(xip, domain(2 * i), domain(2 * i + 1), encode(2 * i), encode(2 * i + 1))
        val eip = math.min(math.max(ei, 0), size(i).toDouble)
        var index = math.floor(eip + 0.5).toInt
        if (index < 0) index = 0
        else if (index > size(i)) index = size(i) - 1 // reference's clamp quirk
        indices(i) = index
        i += 1
      }
      var m = indices(0)
      i = 1
      while (i < numInputs) {
        var add = indices(i)
        var j = 0
        while (j < i) { add *= size(j); j += 1 }
        m += add
        i += 1
      }
      m *= numOutputs
      val out = new Array[Double](numOutputs)
      var j = 0
      while (j < numOutputs) {
        if (m + j >= data.length) throw new PdfError("Range check error") // Go would panic
        val rj = data(m + j).toDouble
        val rjp = interpolate(rj, 0, math.pow(2, bitsPerSample.toDouble), decode(2 * j), decode(2 * j + 1))
        out(j) = math.min(math.max(rjp, range(2 * j)), range(2 * j + 1))
        j += 1
      }
      out
    }
  }

  /** sampling.ResampleBytes (pdf/model/sampling/resample.go:10-75): MSB-first
    * bit stream to unsigned samples. QUIRK mirrored: the loop exits when the
    * last BYTE has been consumed, so pending remainder bits are DROPPED even
    * when they hold one or more complete samples (e.g. 4-bit samples lose
    * the low nibble of the final byte).
    */
  def resampleBytes(data: Array[Byte], bitsPerSample: Int): Array[Long] = {
    val samples = scala.collection.mutable.ArrayBuffer.empty[Long]
    var bitsLeft = bitsPerSample
    var sample = 0L
    var remainder = 0
    var remainderBits = 0
    var i = 0
    // NB: condition mirrors the reference exactly — the remainder branch does
    // not consume a byte, so once i == data.length the loop stops and any
    // remaining bits are dropped.
    while (i < data.length) {
      if (remainderBits > 0) {
        val take = math.min(remainderBits, bitsLeft)
        sample = (sample << take) | ((remainder & 0xff) >>> (8 - take)).toLong
        remainderBits -= take
        remainder = if (remainderBits > 0) (remainder << take) & 0xff else 0
        bitsLeft -= take
        if (bitsLeft == 0) { samples += (sample & 0xffffffffL); bitsLeft = bitsPerSample; sample = 0 }
      } else {
        val b = data(i) & 0xff
        i += 1
        val take = math.min(8, bitsLeft)
        remainderBits = 8 - take
        sample = (sample << take) | (b >>> remainderBits).toLong
        if (take < 8) remainder = (b << take) & 0xff
        bitsLeft -= take
        if (bitsLeft == 0) { samples += (sample & 0xffffffffL); bitsLeft = bitsPerSample; sample = 0 }
      }
    }
    samples.toArray
  }

  private def type0FromStream(st: PdfStream, resolve: PdfObj => PdfObj): Type0 = {
    val domain = st.dict.get("Domain") match {
      case null => throw new PdfError("Required attribute missing or invalid")
      case o    => floatArray(o, resolve)
    }
    if (domain.length % 2 != 0) throw new PdfError("Invalid domain range")
    val range = st.dict.get("Range") match {
      case null => throw new PdfError("Required attribute missing or invalid")
      case o    => floatArray(o, resolve)
    }
    if (range.length % 2 != 0) throw new PdfError("Invalid range")
    val size = st.dict.get("Size") match {
      case null => throw new PdfError("Required attribute missing or invalid")
      case o => traceToDirect(resolve(o)) match {
        case a: PdfArr => a.items.map {
          el => traceToDirect(resolve(el)) match {
            case PdfInt(v) => v.toInt
            case _         => throw new PdfError("Size invalid")
          }
        }.toArray
        case _ => throw new PdfError("Required attribute missing or invalid")
      }
    }
    if (size.length != domain.length / 2) throw new PdfError("Range check")
    val bps = traceToDirect(resolve(
      if (st.dict.get("BitsPerSample") == null) PdfNull else st.dict.get("BitsPerSample"))) match {
      case PdfInt(v) => v.toInt
      case _         => throw new PdfError("Required attribute missing or invalid")
    }
    if (!Set(1, 2, 4, 8, 12, 16, 24, 32).contains(bps)) throw new PdfError("Range check")
    st.dict.get("Order") match {
      case null => ()
      case o => traceToDirect(resolve(o)) match {
        case PdfInt(v) if v == 1 || v == 3 => ()
        case PdfInt(_)                     => throw new PdfError("Range check")
        case _                             => () // non-int Order ignored like the reference's failed assert
      }
    }
    val encode = optFloatArray(st.dict, "Encode", resolve)
    val decode = optFloatArray(st.dict, "Decode", resolve)
    val raw = Filters.decodeStream(st, resolve)
    new Type0(domain, range, size, bps, encode, decode, raw)
  }

  // ----------------------------------------------------------------- type 2

  final class Type2(val domain: Array[Double], val range: Array[Double],
                    val c0: Option[Array[Double]], val c1: Option[Array[Double]],
                    val n: Double) extends PdfFunction {
    def evaluate(x: Array[Double]): Array[Double] = {
      if (x.length != 1) throw new PdfError("Range check")
      val a0 = c0.getOrElse(Array(0.0))
      val a1 = c1.getOrElse(Array(1.0))
      val out = new Array[Double](a0.length)
      var i = 0
      while (i < a0.length) {
        out(i) = a0(i) + math.pow(x(0), n) * (a1(i) - a0(i))
        i += 1
      }
      out
    }
  }

  private def type2FromDict(d: PdfDict, resolve: PdfObj => PdfObj): Type2 = {
    val domain = d.get("Domain") match {
      case null => throw new PdfError("Required attribute missing or invalid")
      case o    => floatArray(o, resolve)
    }
    if (domain.length % 2 != 0) throw new PdfError("Invalid domain range")
    val range = d.get("Range") match {
      case null => Array.empty[Double]
      case o => val r = floatArray(o, resolve)
        if (r.length % 2 != 0) throw new PdfError("Invalid range")
        r
    }
    val c0 = optFloatArray(d, "C0", resolve)
    val c1 = optFloatArray(d, "C1", resolve)
    if (c0.map(_.length).getOrElse(0) != c1.map(_.length).getOrElse(0))
      throw new PdfError("Range check")
    val n = d.get("N") match {
      case null => throw new PdfError("Not a number")
      case o    => numOf(traceToDirect(resolve(o)))
    }
    new Type2(domain, range, c0, c1, n)
  }

  // ----------------------------------------------------------------- type 3

  /** Stitching function: load-time validation mirrored; Evaluate mirrors the
    * reference's "Not implemented yet" ERROR (functions.go:562-575) — a doc
    * using a Type-3 tint aborts at scn exactly like under the reference.
    */
  final class Type3(val domain: Array[Double], val functions: Seq[PdfFunction],
                    val bounds: Array[Double], val encode: Array[Double]) extends PdfFunction {
    def evaluate(x: Array[Double]): Array[Double] = {
      if (x.length != 1) throw new PdfError("Range check")
      throw new PdfError("Not implemented yet")
    }
  }

  private def type3FromDict(d: PdfDict, resolve: PdfObj => PdfObj): Type3 = {
    val domain = d.get("Domain") match {
      case null => throw new PdfError("Required attribute missing or invalid")
      case o    => floatArray(o, resolve)
    }
    if (domain.length != 2) throw new PdfError("Invalid domain range")
    d.get("Range") match {
      case null => ()
      case o => if (floatArray(o, resolve).length % 2 != 0) throw new PdfError("Invalid range")
    }
    val functions = traceToDirect(resolve(
      if (d.get("Functions") == null) PdfNull else d.get("Functions"))) match {
      case a: PdfArr => a.items.map(el => fromObject(el, resolve)).toSeq
      case _         => throw new PdfError("Required attribute missing or invalid")
    }
    val bounds = d.get("Bounds") match {
      case null => throw new PdfError("Required attribute missing or invalid")
      case o    => floatArray(o, resolve)
    }
    if (bounds.length != functions.length - 1) throw new PdfError("Range check")
    val encode = d.get("Encode") match {
      case null => throw new PdfError("Required attribute missing or invalid")
      case o    => floatArray(o, resolve)
    }
    if (encode.length != 2 * functions.length) throw new PdfError("Range check")
    new Type3(domain, functions, bounds, encode)
  }

  // ----------------------------------------------------------------- type 4

  final class Type4(val domain: Array[Double], val range: Array[Double],
                    program: Ps.PsProgram) extends PdfFunction {
    def evaluate(x: Array[Double]): Array[Double] =
      Ps.outputsToDoubles(Ps.execute(program, x.toSeq))
  }

  private def type4FromStream(st: PdfStream, resolve: PdfObj => PdfObj): Type4 = {
    val domain = st.dict.get("Domain") match {
      case null => throw new PdfError("Required attribute missing or invalid")
      case o    => floatArray(o, resolve)
    }
    if (domain.length % 2 != 0) throw new PdfError("Invalid domain range")
    val range = st.dict.get("Range") match {
      case null => Array.empty[Double]
      case o => val r = floatArray(o, resolve)
        if (r.length % 2 != 0) throw new PdfError("Invalid range")
        r
    }
    val decoded = Filters.decodeStream(st, resolve)
    new Type4(domain, range, Ps.parse(decoded))
  }
}
