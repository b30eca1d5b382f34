package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

class ByteScanSpec extends AnyFunSuite {

  private def naive(data: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    while (i < until) {
      val c = data(i)
      if (c == '(' || c == ')' || c == '\\') return i
      i += 1
    }
    -1
  }

  test("firstStringDelim equals the naive scan on random + adversarial input") {
    val rnd = new scala.util.Random(0x5ca1ab1e)
    // random arrays across lengths that cover word/tail boundaries
    for (len <- Seq(0, 1, 2, 7, 8, 9, 15, 16, 17, 31, 64, 100, 1000); trial <- 0 until 50) {
      val data = new Array[Byte](len)
      rnd.nextBytes(data)
      for (from <- Seq(0, 1, 7, 8, math.max(0, len - 3), len)) {
        val f = math.min(from, len)
        assert(ByteScan.firstStringDelim(data, f, len) == naive(data, f, len),
          s"len=$len trial=$trial from=$f data=${data.take(24).mkString(",")}")
      }
    }
    // delimiter at every single position of a 40-byte window, each kind
    for (pos <- 0 until 40; d <- Seq('(', ')', '\\')) {
      val data = Array.fill[Byte](40)('x')
      data(pos) = d.toByte
      assert(ByteScan.firstStringDelim(data, 0, 40) == pos, s"pos=$pos d=$d")
    }
    // first-of-several: the EARLIEST delimiter wins regardless of kind
    val mixed = "xxxx)xx(x\\xxx".getBytes("ISO-8859-1")
    assert(ByteScan.firstStringDelim(mixed, 0, mixed.length) == 4)
    assert(ByteScan.firstStringDelim(mixed, 5, mixed.length) == 7)
    assert(ByteScan.firstStringDelim(mixed, 8, mixed.length) == 9)
    assert(ByteScan.firstStringDelim(mixed, 10, mixed.length) == -1)
    // high-bit bytes must never alias into a delimiter (SWAR edge)
    val high = Array.tabulate[Byte](64)(i => (0x80 | i).toByte)
    assert(ByteScan.firstStringDelim(high, 0, 64) == -1)
    val nearMiss = Array[Byte]('\'', '*', '+', ']', '[', 0x28 - 0x80) // 0xA8
    assert(ByteScan.firstStringDelim(nearMiss, 0, nearMiss.length) == -1)
  }
}
