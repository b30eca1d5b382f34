package graft.ops

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  *  - bruteForceTopK is the exact baseline: broadcast the (small) query set,
  *    one scan over the corpus, per-partition top-k via window rank. The dot
  *    product runs in codegen'd `zip_with`/`aggregate` SQL functions — no
  *    UDF in the hot path.
  *  - lshTopK is the scale path: random-hyperplane signatures bucket the
  *    corpus (computed once, reusable as a materialized column); queries
  *    probe their own bucket plus hamming-1 neighbors, so the candidate set
  *    is corpus/2^bits * (1+bits) instead of the full corpus.
  */
object Similarity {

  /** Quantized integer dot product (exact cross-engine arithmetic — used by
    * the DuckDB-oracle query): sum(round(x*1000) * round(y*1000)).
    */
  val QuantDotExpr: String =
    "aggregate(zip_with(embedding, qe, (x, y) -> " +
      "cast(round(cast(x as double)*1000) as bigint) * cast(round(cast(y as double)*1000) as bigint)), " +
      "0L, (acc, v) -> acc + v)"

  /** Double-precision cosine via SQL functions (no UDF). */
  def cosineExpr(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> cast(p as double) * cast(q as double)), 0D, (acc, v) -> acc + v)"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  /** Exact top-k nearest neighbors (cosine) for each query id. */
  def bruteForceTopK(spark: SparkSession, embeddings: DataFrame, queryIds: Seq[Long],
                     k: Int = 10, idCol: String = "vec_id",
                     embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = broadcast(
      embeddings.filter(col(idCol).isInCollection(queryIds))
        .select(col(idCol).as("query_id"), col(embCol).as("qe")))
    val scored = embeddings.select(col(idCol), col(embCol))
      .crossJoin(queries)
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", expr(cosineExpr(embCol, "qe")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cosine"), col("rank"))
  }

  // --------------------------------------------------------------- LSH ANN

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * murmur-derived uniform in [-1, 1].
    */
  def hyperplane(plane: Int, dim: Int): Double = {
    val h = MurmurHash3.productHash((plane, dim))
    (h.toDouble / Int.MaxValue)
  }

  val DefaultSignatureBits = 12

  /** Random-hyperplane signature of a vector. */
  def lshSignature(v: Array[Float], bits: Int): Int = {
    var sig = 0
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var d = 0
      while (d < v.length) { dot += v(d) * hyperplane(p, d); d += 1 }
      if (dot >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  def withLshBucket(embeddings: DataFrame, embCol: String = "embedding",
                    bits: Int = DefaultSignatureBits): DataFrame = {
    val f = udf((v: Seq[Float]) => lshSignature(v.toArray, bits))
    embeddings.withColumn("lsh_bucket", f(col(embCol)))
  }

  /** Pick a signature width that keeps ~32+ vectors per bucket. */
  def bitsFor(corpusSize: Long): Int =
    math.max(2, math.min(DefaultSignatureBits,
      (math.log(math.max(1.0, corpusSize / 32.0)) / math.log(2)).toInt))

  /** Approximate top-k: probe the query's bucket and all hamming-1 buckets.
    * Recall improves with probes; candidates stay ~corpus * (bits+1) / 2^bits.
    */
  def lshTopK(spark: SparkSession, embeddings: DataFrame, queryIds: Seq[Long],
              k: Int = 10, idCol: String = "vec_id",
              embCol: String = "embedding",
              bits: Int = DefaultSignatureBits): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = withLshBucket(embeddings, embCol, bits)
    val probesUdf = udf((sig: Int) => (0 until bits).map(b => sig ^ (1 << b)) :+ sig)
    val queries = broadcast(
      bucketed.filter(col(idCol).isInCollection(queryIds))
        .select(col(idCol).as("query_id"), col(embCol).as("qe"), col("lsh_bucket").as("qb"))
        .withColumn("probe", explode(probesUdf(col("qb"))))
        .select("query_id", "qe", "probe"))
    val scored = bucketed
      .join(queries, col("lsh_bucket") === col("probe"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", expr(cosineExpr(embCol, "qe")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs via shared LSH bucket + exact
    * cosine verification (the embedding analogue of minhash dedup).
    */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double = 0.95,
                            idCol: String = "vec_id",
                            embCol: String = "embedding",
                            bits: Int = DefaultSignatureBits): DataFrame = {
    val bucketed = withLshBucket(embeddings, embCol, bits)
      .select(col(idCol).as("id"), col(embCol).as("e"), col("lsh_bucket"))
    bucketed.as("l")
      .join(bucketed.as("r"),
        col("l.lsh_bucket") === col("r.lsh_bucket") && col("l.id") < col("r.id"))
      .withColumn("cosine", expr(cosineExpr("l.e", "r.e")))
      .filter(col("cosine") >= threshold)
      .select(col("l.id").as("a"), col("r.id").as("b"), col("cosine"))
  }
}
