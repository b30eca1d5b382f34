package graft.ops

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora.
  *
  * Scale notes (designed for 10^12 docs; tested at sf*):
  *  - exact dedup is one hash-aggregate shuffle on the dedup key;
  *  - MinHash+LSH: per-row signature (no shuffle) -> explode 16 band keys
  *    (16x row amplification of tiny rows) -> self-join within band buckets
  *    only (never all-pairs) -> verify candidates with exact Jaccard;
  *  - SimHash: per-row 64-bit fingerprint -> 4x 16-bit block keys
  *    (pigeonhole: hamming<=3 implies one identical block) -> bucket join;
  *  - candidate verification joins back to text by doc_id; at cluster scale
  *    buckets are salted and AQE skew-join handles hot buckets.
  */
object Dedup {

  // ------------------------------------------------------------ exact dedup

  /** Exact dedup: survivors = min(doc_id) per identical text. */
  def exactSurvivors(docs: DataFrame, keyCol: String = "text",
                     idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(keyCol)).agg(min(col(idCol)).as("keep_id"))

  // --------------------------------------------------------------- minhash

  val NumPerms = 64
  val NumBands = 16
  val RowsPerBand: Int = NumPerms / NumBands
  val ShingleK = 3

  /** Word k-shingles of a normalized text. */
  def shingles(text: String, k: Int = ShingleK): Array[String] = {
    if (text == null) return Array.empty
    val toks = text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
    if (toks.length < k) {
      if (toks.isEmpty) Array.empty else Array(toks.mkString(" "))
    } else {
      (0 to toks.length - k).map(i => toks.slice(i, i + k).mkString(" ")).toArray
    }
  }

  /** 64-permutation MinHash signature; permutation i = murmur3(shingle, seed=i). */
  def minhashSignature(text: String): Array[Int] = {
    val sh = shingles(text)
    val sig = Array.fill(NumPerms)(Int.MaxValue)
    for (s <- sh) {
      var i = 0
      while (i < NumPerms) {
        val h = MurmurHash3.stringHash(s, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** Band keys: hash of each band's rows (band index mixed in). */
  def bandKeys(sig: Array[Int]): Array[Long] = {
    val out = new Array[Long](NumBands)
    var b = 0
    while (b < NumBands) {
      var h = MurmurHash3.arrayHash(sig.slice(b * RowsPerBand, (b + 1) * RowsPerBand), b)
      out(b) = (b.toLong << 32) | (h.toLong & 0xffffffffL)
      b += 1
    }
    out
  }

  def exactJaccard(a: String, b: String): Double = {
    val sa = shingles(a).toSet
    val sb = shingles(b).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      val union = sa.size + sb.size - inter
      if (union == 0) 1.0 else inter.toDouble / union
    }
  }

  /** doc_id -> (signature, band keys). */
  def withMinhash(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val sigUdf = udf((s: String) => minhashSignature(s))
    val bandUdf = udf((sig: Seq[Int]) => bandKeys(sig.toArray))
    docs.withColumn("mh_sig", sigUdf(col(textCol)))
      .withColumn("mh_bands", bandUdf(col("mh_sig")))
  }

  /** Near-duplicate PAIRS via MinHash LSH, verified with exact Jaccard.
    * Returns (a, b, jaccard) with a < b.
    */
  def minhashDupPairs(spark: SparkSession, docs: DataFrame,
                      idCol: String = "doc_id", textCol: String = "text",
                      threshold: Double = 0.7): DataFrame = {
    val withSig = withMinhash(docs.select(col(idCol), col(textCol)), textCol)
    val exploded = withSig
      .select(col(idCol).as("id"), explode(col("mh_bands")).as("band"))
    val candidates = exploded.as("l")
      .join(exploded.as("r"), col("l.band") === col("r.band") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()
    val texts = docs.select(col(idCol).as("tid"), col(textCol).as("ttext"))
    val jacUdf = udf((x: String, y: String) => exactJaccard(x, y))
    candidates
      .join(texts.withColumnRenamed("tid", "a").withColumnRenamed("ttext", "ta"), "a")
      .join(texts.withColumnRenamed("tid", "b").withColumnRenamed("ttext", "tb"), "b")
      .withColumn("jaccard", jacUdf(col("ta"), col("tb")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Per-doc dup-group assignment: canonical = min id among verified LSH
    * neighbors (single-pass approximation of connected components; the full
    * iterative-join CC is the scale-out refinement).
    */
  def minhashDupGroups(spark: SparkSession, docs: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       threshold: Double = 0.7): DataFrame = {
    val pairs = minhashDupPairs(spark, docs, idCol, textCol, threshold)
    val neighborMin = pairs.select(col("b").as("id"), col("a").as("nbr"))
      .union(pairs.select(col("a").as("id"), col("b").as("nbr")))
      .groupBy("id").agg(min("nbr").as("min_nbr"))
    docs.select(col(idCol).as("id"))
      .join(neighborMin, Seq("id"), "left")
      .withColumn("dup_group", least(col("id"), coalesce(col("min_nbr"), col("id"))))
      .select(col("id").as(idCol), col("dup_group"))
  }

  // ---------------------------------------------------------------- simhash

  /** 64-bit SimHash over unigram tokens (two murmur seeds forming 64 bits). */
  def simhash64(text: String): Long = {
    val v = new Array[Int](64)
    if (text != null) {
      val toks = text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
      for (t <- toks) {
        val h1 = MurmurHash3.stringHash(t, 0x9747b28c)
        val h2 = MurmurHash3.stringHash(t, 0x85ebca6b)
        val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) v(i) += 1 else v(i) -= 1
          i += 1
        }
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (v(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  def withSimhash(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val f = udf((s: String) => simhash64(s))
    docs.withColumn("simhash", f(col(textCol)))
  }

  /** Near-dup pairs with hamming distance <= maxDist via 4x16-bit block
    * keys (pigeonhole guarantee for maxDist <= 3).
    */
  def simhashDupPairs(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", maxDist: Int = 3): DataFrame = {
    val withSh = withSimhash(docs.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol).as("id"), col("simhash"))
    val blocks = withSh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("blk"),
          shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.blk"), col("bk.key"))
    val hamUdf = udf((a: Long, b: Long) => hamming64(a, b))
    blocks.as("l")
      .join(blocks.as("r"),
        col("l.blk") === col("r.blk") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        col("l.simhash").as("sa"), col("r.simhash").as("sb"))
      .distinct()
      .withColumn("hamming", hamUdf(col("sa"), col("sb")))
      .filter(col("hamming") <= maxDist)
      .select("a", "b", "hamming")
  }

  // ------------------------------------------------------- n-gram jaccard

  /** Character n-gram set Jaccard (exact) — the verification metric for the
    * LSH candidates, also exposed standalone.
    */
  def charNgrams(text: String, n: Int = 5): Set[Int] = {
    if (text == null || text.length < n) return Set.empty
    val norm = text.toLowerCase
    (0 to norm.length - n).iterator.map(i => MurmurHash3.stringHash(norm.substring(i, i + n))).toSet
  }

  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", n: Int = 5,
                        threshold: Double = 0.8): DataFrame = {
    // LSH pre-filter via minhash bands, then exact char-ngram verification.
    val withSig = withMinhash(docs.select(col(idCol), col(textCol)), textCol)
    val exploded = withSig.select(col(idCol).as("id"), explode(col("mh_bands")).as("band"))
    val candidates = exploded.as("l")
      .join(exploded.as("r"), col("l.band") === col("r.band") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b")).distinct()
    val texts = docs.select(col(idCol).as("tid"), col(textCol).as("ttext"))
    val jac = udf((x: String, y: String) => {
      val sa = charNgrams(x, n); val sb = charNgrams(y, n)
      if (sa.isEmpty && sb.isEmpty) 1.0
      else {
        val inter = sa.intersect(sb).size
        val union = sa.size + sb.size - inter
        if (union == 0) 1.0 else inter.toDouble / union
      }
    })
    candidates
      .join(texts.withColumnRenamed("tid", "a").withColumnRenamed("ttext", "ta"), "a")
      .join(texts.withColumnRenamed("tid", "b").withColumnRenamed("ttext", "tb"), "b")
      .withColumn("ngram_jaccard", jac(col("ta"), col("tb")))
      .filter(col("ngram_jaccard") >= threshold)
      .select("a", "b", "ngram_jaccard")
  }
}
