package graft.pdf

import java.nio.{ByteBuffer, ByteOrder}

/** SWAR scan for the content-lexer's hottest loop: find the first literal-
  * string delimiter ('(' | ')' | '\\') in a byte range, 8 bytes per step.
  * Uses the classic has-zero bit trick over little-endian longs read through
  * a heap ByteBuffer (HotSpot intrinsifies getLong into a single load);
  * positions are exact, so the caller's semantics are unchanged — this is
  * purely a faster "first index of one of three bytes".
  */
object ByteScan {
  private final val Ones = 0x0101010101010101L
  private final val Highs = 0x8080808080808080L
  private final val OpenB = 0x2828282828282828L // '(' broadcast
  private final val CloseB = 0x2929292929292929L // ')'
  private final val EscB = 0x5c5c5c5c5c5c5c5cL // '\\'

  /** Per-byte 0x80 flag where the byte of x is zero (exact, no false hits). */
  @inline private def zeroBytes(x: Long): Long = (x - Ones) & ~x & Highs

  /** Little-endian long view over `data` for repeated scans of the same
    * array (one wrap per parser instead of one per string token).
    */
  def viewOf(data: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)

  /** First index in [from, until) holding '(', ')' or '\\'; -1 when none.
    * `bb` must be `viewOf(data)`; `until` must be <= data.length; from >=
    * until returns -1.
    */
  def firstStringDelim(bb: ByteBuffer, data: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    val wordLim = until - 8
    while (i <= wordLim) {
      val w = bb.getLong(i)
      val m = zeroBytes(w ^ OpenB) | zeroBytes(w ^ CloseB) | zeroBytes(w ^ EscB)
      if (m != 0L)
        return i + (java.lang.Long.numberOfTrailingZeros(m) >>> 3)
      i += 8
    }
    while (i < until) {
      val c = data(i)
      if (c == '(' || c == ')' || c == '\\') return i
      i += 1
    }
    -1
  }

  /** Convenience overload wrapping `data` itself (tests, one-shot scans). */
  def firstStringDelim(data: Array[Byte], from: Int, until: Int): Int =
    firstStringDelim(viewOf(data), data, from, until)
}
