package scratch

import graft.Extract
import graft.spark.PagesGen

/** Fuzz sweep: point mutations, truncations and splices over EVERY payload
  * variant (incl. round-2 crypt/CMap/LZW/RLE/Separation+PS). Kernel contract:
  * never throw, never hang; every input -> ok/error/empty/timeout within the
  * per-doc budget.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(20260816L)
    val texts = Seq("short", "the quick brown fox jumps over the lazy dog " * 5,
      "unicode ☂ münchen", "")
    var total = 0L
    val statusCounts = scala.collection.mutable.HashMap.empty[String, Long]
    val t0 = System.nanoTime()
    var maxDocMs = 0L
    for (v <- 0 until PagesGen.PdfVariants; (t, ti) <- texts.zipWithIndex) {
      val base = PagesGen.payloadFor(7000L + ti, t, v)
      // point mutations
      for (_ <- 0 until 900) {
        val m = base.clone()
        val edits = 1 + rnd.nextInt(8)
        for (_ <- 0 until edits) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        val s = System.nanoTime()
        val r = Extract(m, Extract.DefaultMaxBytesPerDoc, timeoutMs = 10000)
        maxDocMs = math.max(maxDocMs, (System.nanoTime() - s) / 1000000L)
        statusCounts(r.status) = statusCounts.getOrElse(r.status, 0L) + 1
        total += 1
      }
      // truncations
      for (_ <- 0 until 120) {
        val n = rnd.nextInt(base.length + 1)
        val s = System.nanoTime()
        val r = Extract(java.util.Arrays.copyOf(base, n), Extract.DefaultMaxBytesPerDoc, 10000)
        maxDocMs = math.max(maxDocMs, (System.nanoTime() - s) / 1000000L)
        statusCounts(r.status) = statusCounts.getOrElse(r.status, 0L) + 1
        total += 1
      }
      // splices: random chunk from another variant inserted
      for (_ <- 0 until 120) {
        val other = PagesGen.payloadFor(7100L, texts((ti + 1) % texts.length), (v + 3) % PagesGen.PdfVariants)
        val cut = rnd.nextInt(base.length)
        val take = rnd.nextInt(math.min(other.length, 512) + 1)
        val off = if (other.length == take) 0 else rnd.nextInt(other.length - take + 1)
        val m = java.util.Arrays.copyOf(base, cut) ++
          java.util.Arrays.copyOfRange(other, off, off + take) ++
          java.util.Arrays.copyOfRange(base, cut, base.length)
        val s = System.nanoTime()
        val r = Extract(m, Extract.DefaultMaxBytesPerDoc, 10000)
        maxDocMs = math.max(maxDocMs, (System.nanoTime() - s) / 1000000L)
        statusCounts(r.status) = statusCounts.getOrElse(r.status, 0L) + 1
        total += 1
      }
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[fuzz] $total inputs in $secs%.1f s (max per-doc $maxDocMs ms); statuses: " +
      statusCounts.toSeq.sortBy(-_._2).map { case (k, n) => s"$k=$n" }.mkString(", "))
  }
}
