package graft.pdf

import scala.collection.mutable

/** Limited PostScript calculator interpreter for Type-4 PDF functions —
  * semantic re-creation of the reference's pdf/ps package (parser.go,
  * exec.go, stack.go, object.go). Objects are integers, reals, booleans and
  * nested procedures only. Quirks replicated on purpose:
  *
  *  - numeric comparisons (eq/ne/lt/le/gt/ge) use a 1e-6 tolerance
  *    (const.go TOLERANCE);
  *  - `eq` of a boolean vs a non-boolean pushes false rather than erroring;
  *  - `div` rejects a ZERO divisor only via exact equality; `exp` rejects
  *    |exponent| < 1 with a negative base ("Undefined result error");
  *  - `atan` with denominator 0 yields 90/270 by numerator sign;
  *  - `round` on a real yields floor(v+0.5) as a REAL (not an int);
  *  - the stack is capped at ~100 entries (stack.go Push);
  *  - execution RESULT is the whole stack bottom-to-top (exec.go Execute) —
  *    the Type-4 caller takes all of it as the output vector;
  *  - the parser requires a leading '{' but tolerates EOF before the
  *    matching '}' (parser.go parseFunction breaks on EOF).
  */
object Ps {

  val Tolerance = 0.000001

  sealed trait PsObj
  final case class PsInt(value: Long) extends PsObj
  final case class PsReal(value: Double) extends PsObj
  final case class PsBool(value: Boolean) extends PsObj
  final case class PsOperand(name: String) extends PsObj
  final class PsProgram(val items: mutable.ArrayBuffer[PsObj]) extends PsObj

  def err(msg: String): Nothing = throw new PdfError(msg)

  // ------------------------------------------------------------------ stack

  /** Execution stack; index 0 is the BOTTOM (top at the end). */
  final class PsStack {
    val buf: mutable.ArrayBuffer[PsObj] = mutable.ArrayBuffer.empty

    def push(o: PsObj): Unit = {
      if (buf.length > 100) err("Stack overflow")
      buf += o
    }
    def pop(): PsObj = {
      if (buf.isEmpty) err("Stack underflow")
      buf.remove(buf.length - 1)
    }
    def popInt(): Long = pop() match {
      case PsInt(v) => v
      case _        => err("Type check error")
    }
    def popNumber(): Double = pop() match {
      case PsReal(v) => v
      case PsInt(v)  => v.toDouble
      case _         => err("Type check error")
    }
  }

  // ----------------------------------------------------------------- parser

  /** PSParser.Parse (parser.go:35-51): content must start with '{' (after
    * whitespace, needing >= 2 readable bytes — bufio.Peek(2) errors short).
    */
  def parse(content: Array[Byte]): PsProgram = {
    val cur = new Cursor(content)
    cur.skipSpaces()
    if (cur.remaining < 2) err("EOF")
    if (cur.peek(0) != '{') err("Invalid PS Program not starting with {")
    parseFunction(cur, 0)
  }

  private final class Cursor(val data: Array[Byte]) {
    var pos = 0
    def remaining: Int = data.length - pos
    def peek(i: Int): Int = if (pos + i < data.length) data(pos + i) & 0xff else -1
    def read(): Int = { val b = peek(0); if (b >= 0) pos += 1; b }
    def skipSpaces(): Unit = {
      while (pos < data.length && PdfObjs.isWhiteSpace(data(pos) & 0xff)) pos += 1
    }
  }

  private def parseFunction(cur: Cursor, depth: Int): PsProgram = {
    if (depth > 500) err("PS program nesting depth exceeded") // JVM stack guard
    val c = cur.read()
    if (c != '{') err("Invalid function")
    val prog = new PsProgram(mutable.ArrayBuffer.empty)
    var done = false
    while (!done) {
      cur.skipSpaces()
      // parser.go peeks 2 bytes; fewer than 2 remaining -> io.EOF -> break
      // (tolerant of a missing closing brace).
      if (cur.remaining < 2) done = true
      else {
        val b0 = cur.peek(0)
        val b1 = cur.peek(1)
        if (b0 == '}') { cur.read(); done = true }
        else if (b0 == '{') prog.items += parseFunction(cur, depth + 1)
        else if (PdfObjs.isDecimalDigit(b0) || (b0 == '-' && PdfObjs.isDecimalDigit(b1))) {
          prog.items += parseNumber(cur)
        } else {
          // peek up to 5 for the boolean keywords (parser.go:96-115)
          val p = new StringBuilder
          var i = 0
          while (i < 5 && cur.peek(i) >= 0) { p.append(cur.peek(i).toChar); i += 1 }
          val s = p.toString
          if (s.length > 4 && s.startsWith("false")) { cur.pos += 5; prog.items += PsBool(false) }
          else if (s.length > 3 && s.startsWith("true")) { cur.pos += 4; prog.items += PsBool(true) }
          else prog.items += parseOperand(cur)
        }
      }
    }
    prog
  }

  /** parser.go parseNumber: signs only at the start or after 'e'; '.' or 'e'
    * makes it a real; strconv parse failures propagate as errors.
    */
  private def parseNumber(cur: Cursor): PsObj = {
    var isFloat = false
    var allowSigns = true
    val sb = new StringBuilder
    var done = false
    while (!done) {
      val b = cur.peek(0)
      if (b < 0) done = true
      else if (allowSigns && (b == '-' || b == '+')) { sb.append(b.toChar); cur.pos += 1; allowSigns = false }
      else if (PdfObjs.isDecimalDigit(b)) { sb.append(b.toChar); cur.pos += 1 }
      else if (b == '.') { sb.append(b.toChar); cur.pos += 1; isFloat = true }
      else if (b == 'e') { sb.append(b.toChar); cur.pos += 1; isFloat = true; allowSigns = true }
      else done = true
    }
    try {
      if (isFloat) PsReal(sb.toString.toDouble)
      else PsInt(java.lang.Long.parseLong(sb.toString))
    } catch { case _: NumberFormatException => err(s"invalid number: $sb") }
  }

  private def parseOperand(cur: Cursor): PsOperand = {
    val sb = new StringBuilder
    var done = false
    while (!done) {
      val b = cur.peek(0)
      if (b < 0 || PdfObjs.isDelimiter(b) || PdfObjs.isWhiteSpace(b)) done = true
      else { sb.append(b.toChar); cur.pos += 1 }
    }
    if (sb.isEmpty) err("Invalid operand (empty)")
    PsOperand(sb.toString)
  }

  // --------------------------------------------------------------- executor

  /** PSExecutor.Execute: push inputs, run, return the WHOLE stack
    * bottom-to-top as the output vector.
    */
  def execute(program: PsProgram, inputs: Seq[Double]): Seq[PsObj] = {
    val stack = new PsStack
    inputs.foreach(v => stack.push(PsReal(v)))
    exec(program, stack, 0)
    stack.buf.toSeq
  }

  def outputsToDoubles(objs: Seq[PsObj]): Array[Double] = objs.map {
    case PsInt(v)  => v.toDouble
    case PsReal(v) => v
    case _         => err("Type error")
  }.toArray

  private def exec(prog: PsProgram, stack: PsStack, depth: Int): Unit = {
    if (depth > 500) err("PS execution depth exceeded") // JVM stack guard
    for (obj <- prog.items) {
      Deadline.check()
      obj match {
        case o @ (_: PsInt | _: PsReal | _: PsBool) => stack.push(o)
        case p: PsProgram                           => stack.push(p)
        case PsOperand(name)                        => execOp(name, stack, depth)
      }
    }
  }

  // Numeric pop preserving int/real-ness (for the typed binary ops).
  private def popNum(stack: PsStack): Either[Long, Double] = stack.pop() match {
    case PsInt(v)  => Left(v)
    case PsReal(v) => Right(v)
    case _         => err("Type check error")
  }
  private def asD(n: Either[Long, Double]): Double = n.fold(_.toDouble, identity)

  private def execOp(name: String, stack: PsStack, depth: Int): Unit = name match {
    case "abs" => stack.pop() match {
      case PsInt(v)  => stack.push(PsInt(if (v < 0) -v else v))
      case PsReal(v) => stack.push(PsReal(if (v < 0) -v else v))
      case _         => err("Type check error")
    }
    case "add" =>
      val n1 = popNum(stack); val n2 = popNum(stack)
      (n1, n2) match {
        case (Left(a), Left(b)) => stack.push(PsInt(a + b))
        case _                  => stack.push(PsReal(asD(n1) + asD(n2)))
      }
    case "and" => (stack.pop(), stack.pop()) match {
      case (PsBool(a), PsBool(b)) => stack.push(PsBool(a && b))
      case (PsInt(a), PsInt(b))   => stack.push(PsInt(a & b))
      case _                      => err("Type check error")
    }
    case "atan" =>
      val den = stack.popNumber(); val num = stack.popNumber()
      if (den == 0) stack.push(PsReal(if (num < 0) 270 else 90))
      else stack.push(PsReal(math.atan(num / den) * 180 / math.Pi))
    case "bitshift" =>
      val shift = stack.popInt(); val v = stack.popInt()
      // Go shifts by unsigned amounts: >= 64 shifts out to 0 (or -1 for
      // arithmetic right shift of a negative); Scala shifts are mod-64.
      val result =
        if (shift >= 0) { if (shift >= 64) 0L else v << shift }
        else { if (-shift >= 64) (if (v < 0) -1L else 0L) else v >> (-shift) }
      stack.push(PsInt(result))
    case "ceiling" => stack.pop() match {
      case PsReal(v) => stack.push(PsReal(math.ceil(v)))
      case i: PsInt  => stack.push(i)
      case _         => err("Type check error")
    }
    case "copy" =>
      val n = stack.popInt()
      if (n < 0) err("Range check error")
      if (n > stack.buf.length) err("Range check error")
      // NB copy bypasses Push in the reference (stack.go Copy appends
      // directly), so it is NOT subject to the 100-entry cap.
      stack.buf ++= stack.buf.takeRight(n.toInt)
    case "cos" => stack.push(PsReal(math.cos(stack.popNumber() * math.Pi / 180.0)))
    case "cvi" => stack.pop() match {
      case PsReal(v) => stack.push(PsInt(v.toLong))
      case i: PsInt  => stack.push(i)
      case _         => err("Type check error")
    }
    case "cvr" => stack.push(PsReal(stack.popNumber()))
    case "div" =>
      val n1 = popNum(stack)
      if (asD(n1) == 0) err("Undefined result error")
      val n2 = popNum(stack)
      stack.push(PsReal(asD(n2) / asD(n1)))
    case "dup" =>
      val o = stack.pop(); stack.push(o); stack.push(o)
    case "eq" => execEq(stack)
    case "exch" =>
      val top = stack.pop(); val next = stack.pop()
      stack.push(top); stack.push(next)
    case "exp" =>
      val exponent = stack.popNumber(); val base = stack.popNumber()
      if (math.abs(exponent) < 1 && base < 0) err("Undefined result error")
      stack.push(PsReal(math.pow(base, exponent)))
    case "floor" => stack.pop() match {
      case PsReal(v) => stack.push(PsReal(math.floor(v)))
      case i: PsInt  => stack.push(i)
      case _         => err("Type check error")
    }
    case "ge" =>
      val n2 = stack.popNumber(); val n1 = stack.popNumber()
      stack.push(PsBool(math.abs(n1 - n2) < Tolerance || n1 > n2))
    case "gt" =>
      val n2 = stack.popNumber(); val n1 = stack.popNumber()
      stack.push(PsBool(!(math.abs(n1 - n2) < Tolerance) && n1 > n2))
    case "idiv" =>
      val i1 = stack.pop() match { case PsInt(v) => v; case _ => err("Type check error") }
      if (i1 == 0) err("Undefined result error")
      val i2 = stack.pop() match { case PsInt(v) => v; case _ => err("Type check error") }
      stack.push(PsInt(i2 / i1))
    case "if" =>
      val proc = stack.pop() match { case p: PsProgram => p; case _ => err("Type check error") }
      val cond = stack.pop() match { case PsBool(b) => b; case _ => err("Type check error") }
      if (cond) exec(proc, stack, depth + 1)
    case "ifelse" =>
      val proc2 = stack.pop() match { case p: PsProgram => p; case _ => err("Type check error") }
      val proc1 = stack.pop() match { case p: PsProgram => p; case _ => err("Type check error") }
      val cond = stack.pop() match { case PsBool(b) => b; case _ => err("Type check error") }
      if (cond) exec(proc1, stack, depth + 1) else exec(proc2, stack, depth + 1)
    case "index" =>
      val n = stack.pop() match { case PsInt(v) => v; case _ => err("Type check error") }
      if (n < 0) err("Range check error")
      if (n > stack.buf.length - 1) err("Stack underflow")
      stack.push(stack.buf(stack.buf.length - 1 - n.toInt))
    case "le" =>
      val n2 = stack.popNumber(); val n1 = stack.popNumber()
      stack.push(PsBool(math.abs(n1 - n2) < Tolerance || n1 < n2))
    case "log" => stack.push(PsReal(math.log10(stack.popNumber())))
    case "ln"  => stack.push(PsReal(math.log(stack.popNumber())))
    case "lt" =>
      val n2 = stack.popNumber(); val n1 = stack.popNumber()
      stack.push(PsBool(!(math.abs(n1 - n2) < Tolerance) && n1 < n2))
    case "mod" =>
      val i1 = stack.pop() match { case PsInt(v) => v; case _ => err("Type check error") }
      if (i1 == 0) err("Undefined result error")
      val i2 = stack.pop() match { case PsInt(v) => v; case _ => err("Type check error") }
      stack.push(PsInt(i2 % i1))
    case "mul" =>
      val n1 = popNum(stack); val n2 = popNum(stack)
      (n1, n2) match {
        case (Left(a), Left(b)) => stack.push(PsInt(a * b))
        case _                  => stack.push(PsReal(asD(n1) * asD(n2)))
      }
    case "ne" => execEq(stack); execOp("not", stack, depth)
    case "neg" => stack.pop() match {
      case PsReal(v) => stack.push(PsReal(-v))
      case PsInt(v)  => stack.push(PsInt(-v))
      case _         => err("Type check error")
    }
    case "not" => stack.pop() match {
      case PsBool(b) => stack.push(PsBool(!b))
      case PsInt(v)  => stack.push(PsInt(~v))
      case _         => err("Type check error")
    }
    case "or" => (stack.pop(), stack.pop()) match {
      case (PsBool(a), PsBool(b)) => stack.push(PsBool(a || b))
      case (PsInt(a), PsInt(b))   => stack.push(PsInt(a | b))
      case _                      => err("Type check error")
    }
    case "pop" => stack.pop()
    case "round" => stack.pop() match {
      case PsReal(v) => stack.push(PsReal(math.floor(v + 0.5))) // stays REAL
      case i: PsInt  => stack.push(i)
      case _         => err("Type check error")
    }
    case "roll" =>
      val j = stack.pop() match { case PsInt(v) => v; case _ => err("Type check error") }
      val n = stack.pop() match { case PsInt(v) => v; case _ => err("Type check error") }
      if (n < 0) err("Range check error")
      if (n != 0 && n != 1) {
        if (n > stack.buf.length) err("Stack underflow")
        val ni = n.toInt
        var i = 0L
        val times = math.abs(j)
        while (i < times) {
          // a hostile `3 2e9 roll` must hit the per-doc budget, not spin
          if ((i & 0xffff) == 0) Deadline.check()
          val from = stack.buf.length - ni
          if (j > 0) {
            val top = stack.buf.remove(stack.buf.length - 1)
            stack.buf.insert(from, top)
          } else {
            val bottom = stack.buf.remove(from)
            stack.buf += bottom
          }
          i += 1
        }
      }
    case "sin"  => stack.push(PsReal(math.sin(stack.popNumber() * math.Pi / 180.0)))
    case "sqrt" =>
      val v = stack.popNumber()
      if (v < 0) err("Range check error")
      stack.push(PsReal(math.sqrt(v)))
    case "sub" =>
      val n1 = popNum(stack); val n2 = popNum(stack)
      (n1, n2) match {
        case (Left(a), Left(b)) => stack.push(PsInt(b - a))
        case _                  => stack.push(PsReal(asD(n2) - asD(n1)))
      }
    case "truncate" => stack.pop() match {
      case PsReal(v) => stack.push(PsReal(v.toLong.toDouble)) // stays REAL
      case i: PsInt  => stack.push(i)
      case _         => err("Type check error")
    }
    case "xor" => (stack.pop(), stack.pop()) match {
      case (PsBool(a), PsBool(b)) => stack.push(PsBool(a != b))
      case (PsInt(a), PsInt(b))   => stack.push(PsInt(a ^ b))
      case _                      => err("Type check error")
    }
    case other => err(s"Unsupported operand: $other")
  }

  /** eq (object.go:590-650): bool vs non-bool -> FALSE (not an error);
    * numerics compared with tolerance.
    */
  private def execEq(stack: PsStack): Unit = {
    val o1 = stack.pop(); val o2 = stack.pop()
    (o1, o2) match {
      case (PsBool(a), PsBool(b)) => stack.push(PsBool(a == b))
      case (_: PsBool, _) | (_, _: PsBool) => stack.push(PsBool(false))
      case _ =>
        val v1 = o1 match {
          case PsInt(v) => v.toDouble; case PsReal(v) => v; case _ => err("Type check error")
        }
        val v2 = o2 match {
          case PsInt(v) => v.toDouble; case PsReal(v) => v; case _ => err("Type check error")
        }
        stack.push(PsBool(math.abs(v2 - v1) < Tolerance))
    }
  }
}
