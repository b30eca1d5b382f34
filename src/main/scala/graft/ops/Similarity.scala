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
  *  - signatures are Long (up to 62 planes) and `bitsFor` scales with corpus
  *    size UNCAPPED: at 10^12 vectors it picks ~35 bits (~2^35 buckets,
  *    ~32 rows each) where a fixed 12-bit cap would leave 10^8-row buckets.
  */
object Similarity {

  /** Quantized integer dot product (exact cross-engine arithmetic — used by
    * the DuckDB-oracle query): sum(round(x*1000) * round(y*1000)).
    */
  val QuantDotExpr: String =
    "aggregate(zip_with(embedding, qe, (x, y) -> " +
      "cast(round(cast(x as double)*1000) as bigint) * cast(round(cast(y as double)*1000) as bigint)), " +
      "0L, (acc, v) -> acc + v)"

  /** Double-precision cosine via SQL functions (no UDF). Zero-norm vectors
    * score -2 (below any real cosine) instead of NaN — Spark orders NaN
    * ABOVE every value, so an unguarded 0/0 would put a single all-zero
    * embedding at rank 1 of every descending top-k.
    */
  def cosineExpr(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> cast(p as double) * cast(q as double)), 0D, (acc, v) -> acc + v)"
    s"CASE WHEN ${dot(a, a)} = 0D OR ${dot(b, b)} = 0D THEN -2D " +
      s"ELSE ${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})) END"
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

  /** Exact top-k by QUANTIZED INTEGER dot product — same plan as
    * bruteForceTopK but with engine-exact arithmetic, so a SQL oracle can
    * reproduce scores AND tie-breaks bit-for-bit.
    */
  def bruteForceTopKQuant(spark: SparkSession, embeddings: DataFrame, queryIds: Seq[Long],
                          k: Int = 10, idCol: String = "vec_id",
                          embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val queries = broadcast(
      embeddings.filter(col(idCol).isInCollection(queryIds))
        .select(col(idCol).as("query_id"), col(embCol).as("qe")))
    val scored = embeddings.select(col(idCol), col(embCol).as("embedding"))
      .crossJoin(queries)
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("dot", expr(QuantDotExpr))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("dot"), col("rank"))
  }

  // --------------------------------------------------------------- LSH ANN

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * FNV-derived INTEGER in [-1000, 1000]. Integer components + quantized
    * vectors make the whole signature computation integer-exact — the same
    * arithmetic runs bit-for-bit in the DuckDB oracle (no FP sign-flip
    * hazard at near-zero dots), and quantized random projections hash as
    * well as real-valued ones.
    */
  def hyperplaneQ(plane: Int, dim: Int): Long =
    java.lang.Long.remainderUnsigned(TextOps.fnv1a64(plane + ":" + dim), 2001L) - 1000L

  /** round-half-away-from-zero (matches SQL round() in Spark and DuckDB). */
  def roundQ(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  val DefaultSignatureBits = 12
  val MaxSignatureBits = 62

  /** Random-hyperplane signature of a vector (Long: up to 62 planes).
    * INTEGER-exact: dot = sum(round(v_d * 1000) * hyperplaneQ(p, d)).
    */
  def lshSignature(v: Array[Float], bits: Int): Long = {
    var sig = 0L
    val q = new Array[Long](v.length)
    var d = 0
    while (d < v.length) { q(d) = roundQ(v(d).toDouble * 1000); d += 1 }
    var p = 0
    while (p < bits) {
      var dot = 0L
      d = 0
      while (d < v.length) { dot += q(d) * hyperplaneQ(p, d); d += 1 }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def withLshBucket(embeddings: DataFrame, embCol: String = "embedding",
                    bits: Int = DefaultSignatureBits): DataFrame = {
    val f = udf((v: Seq[Float]) => lshSignature(v.toArray, bits))
    embeddings.withColumn("lsh_bucket", f(col(embCol)))
  }

  /** Pick a signature width that keeps ~32 vectors per bucket. UNCAPPED in
    * corpus size (10^12 vectors -> 35 bits); bounded only by the Long width.
    */
  def bitsFor(corpusSize: Long): Int = {
    val b = math.ceil(math.log(math.max(1.0, corpusSize / 32.0)) / math.log(2)).toInt
    math.max(2, math.min(MaxSignatureBits, b))
  }

  /** All bucket signatures within hamming `radius` of `sig` (multi-probe
    * set): 1 + bits + C(bits,2) + ... buckets. Radius 2 recovers ~99% of
    * near-neighbours whose signatures drift by <= 2 planes while still
    * probing only ~(1 + b + b^2/2) / 2^b of the corpus.
    */
  def probeSet(sig: Long, bits: Int, radius: Int): Seq[Long] = {
    var cur = Set(sig)
    var all = Set(sig)
    var r = 0
    while (r < radius) {
      cur = cur.flatMap(s => (0 until bits).map(b => s ^ (1L << b)))
      all ++= cur
      r += 1
    }
    all.toSeq.sorted
  }

  /** Approximate top-k: probe the query's bucket and all buckets within
    * hamming `probeRadius`. Recall improves with probes; candidates stay
    * ~corpus * |probes| / 2^bits.
    */
  def lshTopK(spark: SparkSession, embeddings: DataFrame, queryIds: Seq[Long],
              k: Int = 10, idCol: String = "vec_id",
              embCol: String = "embedding",
              bits: Int = DefaultSignatureBits,
              probeRadius: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = withLshBucket(embeddings, embCol, bits)
    val probesUdf = udf((sig: Long) => probeSet(sig, bits, probeRadius))
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

  /** lshTopK with QUANTIZED-INTEGER scoring: with the integer signatures the
    * complete pipeline (bucket assignment, multi-probe, candidate scoring,
    * tie-breaks) is exact cross-engine arithmetic — DuckDB-oracle-checkable
    * end to end.
    */
  def lshTopKQuant(spark: SparkSession, embeddings: DataFrame, queryIds: Seq[Long],
                   k: Int = 10, idCol: String = "vec_id",
                   embCol: String = "embedding",
                   bits: Int = DefaultSignatureBits,
                   probeRadius: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = withLshBucket(embeddings, embCol, bits)
    val probesUdf = udf((sig: Long) => probeSet(sig, bits, probeRadius))
    val queries = broadcast(
      bucketed.filter(col(idCol).isInCollection(queryIds))
        .select(col(idCol).as("query_id"), col(embCol).as("qe"), col("lsh_bucket").as("qb"))
        .withColumn("probe", explode(probesUdf(col("qb"))))
        .select("query_id", "qe", "probe"))
    val scored = bucketed
      // Alias the corpus column to the name QuantDotExpr expects (raw string
      // substitution on the expression text is unsafe for arbitrary embCol).
      .withColumn("embedding", col(embCol))
      .join(queries, col("lsh_bucket") === col("probe"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("dot", expr(QuantDotExpr))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("dot"), col("rank"))
  }

  // --------------------------------------------------------------- IVF ANN

  /** nLists sizing: ~sqrt(n) cells keeps cell size ~sqrt(n) (the classic IVF
    * balance point: probe cost ~ nProbe*n/nLists, centroid scan ~ nLists).
    * UNCAPPED in corpus size like bitsFor: 10^12 vectors -> 10^6 cells.
    */
  def listsFor(corpusSize: Long): Int =
    math.max(2, math.ceil(math.sqrt(math.max(1.0, corpusSize.toDouble))).toInt)

  private def nearestIdx(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      var d = 0.0
      var j = 0
      while (j < c.length) { val t = c(j) - v(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Assignment lists are scanned two-level above this many centroids; a
    * small centroid set is cheaper to scan directly.
    */
  val DirectAssignMaxLists = 32

  /** Two-level coarse-over-coarse centroid index: the nLists centroids are
    * themselves clustered (tiny driver-side Lloyd) into ~sqrt(nLists)
    * super-centroids. A row then scans all supers plus only the member
    * centroids of its `superProbes` nearest supers — per-row distance
    * evals ~ sqrt(L)·(1 + superProbes·avgMembers/sqrt(L)) instead of L,
    * the sublinear-assignment requirement at nLists ~ 10^6 (10^12 rows).
    * Super-boundary assignment is approximate; IVF is already approximate,
    * and ScaleSpec pins BOTH end-to-end recall and the eval budget.
    * Returns (superCentroids, memberCentroidIndices per super).
    */
  private[ops] def buildSuperIndex(cents: Array[Array[Double]], nSuper: Int,
                                   iters: Int = 5): (Array[Array[Double]], Array[Array[Int]]) = {
    val L = cents.length
    val k = math.max(1, math.min(nSuper, L))
    var supers = Array.tabulate(k)(i => cents((i.toLong * L / k).toInt).clone())
    var it = 0
    while (it <= iters) {
      val groups = Array.fill(k)(scala.collection.mutable.ArrayBuffer.empty[Int])
      var ci = 0
      while (ci < L) { groups(nearestIdx(cents(ci), supers)) += ci; ci += 1 }
      val members = groups.map(_.toArray)
      if (it == iters) return (supers, members)
      supers = Array.tabulate(k) { si =>
        val g = members(si)
        if (g.isEmpty) supers(si) // empty super keeps its position
        else {
          val m = new Array[Double](cents(0).length)
          for (c <- g) {
            var d = 0
            while (d < m.length) { m(d) += cents(c)(d); d += 1 }
          }
          var d = 0
          while (d < m.length) { m(d) /= g.length; d += 1 }
          m
        }
      }
      it += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into `nLists` cells; queries scan only their `nProbe` closest
    * cells. The scale path when LSH's hash-only buckets under-fit the data
    * distribution: cells follow the actual cluster structure, so at 10^12
    * vectors nLists ~ sqrt(n) keeps cells ~10^6 rows and a 16-probe query
    * touches ~0.0016% of the corpus. Centroids train on a sample (driver
    * default 100k rows) and live broadcast; assignment is one scan.
    *
    * `rowCount`: pass the (approximate) corpus size when known — it sizes
    * the training-sample fraction and the default nLists WITHOUT an extra
    * full `count()` pass over the corpus (at 100 TB that pass costs more
    * than the training). rowCount < 0 falls back to one count().
    * `nLists` < 0 picks listsFor(rowCount) (~sqrt n).
    */
  def ivfTopK(spark: SparkSession, embeddings: DataFrame, queryIds: Seq[Long],
              k: Int = 10, nLists: Int = -1, nProbe: Int = 4,
              idCol: String = "vec_id", embCol: String = "embedding",
              seed: Long = 42L, trainSample: Int = 100000,
              rowCount: Long = -1L, superProbes: Int = 2,
              distEvals: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.expressions.Window
    val withVec = embeddings
      .withColumn("__vec", array_to_vector(col(embCol).cast("array<double>")))
    val n = if (rowCount >= 0) rowCount else withVec.count()
    if (n == 0)
      return spark.emptyDataFrame
        .select(lit(0L).as("query_id"), lit(0L).as("neighbor_id"),
          lit(0.0).as("cosine"), lit(0).as("rank"))
        .limit(0)
    val lists = if (nLists > 0) nLists else listsFor(n)
    val train =
      if (n > trainSample)
        withVec.sample(withReplacement = false, trainSample.toDouble / n, seed)
      else withVec
    // k is clamped by the TRAINING SAMPLE size, not the corpus: at 10^12
    // rows listsFor asks for ~10^6 cells but training runs on ~trainSample
    // points — requesting more clusters than training points degenerates
    // the quantizer silently. (Raise trainSample alongside nLists when
    // cell-count targets grow.)
    val trainCap = math.min(n, trainSample.toLong)
    val model = new KMeans()
      .setK(math.max(2, math.min(lists.toLong, trainCap).toInt))
      .setSeed(seed).setMaxIter(10).setFeaturesCol("__vec").fit(train)
    val centroids = model.clusterCenters.map(_.toArray)
    // --- assignment: SUBLINEAR in nLists via the two-level centroid index
    // (a per-row linear scan is 10^6 distance evals/row at the 10^12-row
    // design point). Small centroid sets scan directly. `distEvals` counts
    // actual distance evaluations for the ScaleSpec sublinearity pin.
    val actualLists = centroids.length
    val direct = actualLists <= DirectAssignMaxLists
    // 1.5x sqrt(L) supers: centroid clustering is skewed in practice, so a
    // few extra supers keep the probed member count (the dominant term)
    // well under the eval budget.
    val (supers, superMembers) =
      if (direct) (Array.empty[Array[Double]], Array.empty[Array[Int]])
      else buildSuperIndex(centroids, math.ceil(1.5 * math.sqrt(actualLists)).toInt)
    val bcCents = spark.sparkContext.broadcast(centroids)
    val bcSupers = spark.sparkContext.broadcast(supers)
    val bcMembers = spark.sparkContext.broadcast(superMembers)
    val probesN = math.max(1, superProbes)
    val assignUdf = udf((vf: Seq[Float]) => {
      val v = new Array[Double](vf.length)
      var d = 0
      while (d < v.length) { v(d) = vf(d).toDouble; d += 1 }
      val cents = bcCents.value
      if (direct) {
        distEvals.foreach(_.add(cents.length))
        nearestIdx(v, cents)
      } else {
        val sup = bcSupers.value
        val mem = bcMembers.value
        // rank supers, keep the probesN nearest
        val sDist = new Array[Double](sup.length)
        var si = 0
        while (si < sup.length) {
          val c = sup(si)
          var dist = 0.0
          var j = 0
          while (j < c.length) { val t = c(j) - v(j); dist += t * t; j += 1 }
          sDist(si) = dist
          si += 1
        }
        var evals = sup.length.toLong
        // rank only NON-EMPTY supers: an empty super keeps a stale position
        // (buildSuperIndex) and probing it would yield zero member evals —
        // the row would silently fall back to centroid 0
        val order = sDist.zipWithIndex.filter(p => mem(p._2).nonEmpty)
          .sortBy(_._1).take(probesN).map(_._2)
        var best = 0
        var bestD = Double.MaxValue
        for (s <- order; ci <- mem(s)) {
          val c = cents(ci)
          var dist = 0.0
          var j = 0
          while (j < c.length) { val t = c(j) - v(j); dist += t * t; j += 1 }
          evals += 1
          if (dist < bestD || (dist == bestD && ci < best)) { bestD = dist; best = ci }
        }
        distEvals.foreach(_.add(evals))
        best
      }
    })
    val assigned = embeddings.withColumn("list_id", assignUdf(col(embCol)))
    // Probe lists per query: closest centroids by L2 (the quantizer metric),
    // computed driver-side (centroids are tiny).
    val queryVecs = embeddings.filter(col(idCol).isInCollection(queryIds))
      .select(col(idCol), col(embCol)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val probeRows = queryVecs.toSeq.flatMap { case (qid, qv) =>
      centroids.zipWithIndex.map { case (c, ci) =>
        var d = 0.0
        var i = 0
        while (i < c.length) { val t = c(i) - qv(i); d += t * t; i += 1 }
        (qid, ci, d)
      }.sortBy(_._3).take(nProbe).map(p => (qid, p._2))
    }
    import spark.implicits._
    val probes = broadcast(probeRows.toDF("query_id", "probe_list"))
    val queries = broadcast(
      embeddings.filter(col(idCol).isInCollection(queryIds))
        .select(col(idCol).as("query_id"), col(embCol).as("qe")))
    val scored = assigned
      .join(probes, col("list_id") === col("probe_list"))
      .join(queries, "query_id")
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cosine", expr(cosineExpr(embCol, "qe")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic, INTEGER-EXACT IVF ANN — the driver-gate variant (the
    * k-means `ivfTopK` above is the production quantizer). Every step is
    * exact integer arithmetic, so a plain-SQL oracle reproduces the whole
    * pipeline bit-for-bit:
    *  - vectors quantize as q_d = round(v_d * 1000) (BIGINT);
    *  - initial centroids = quantized embeddings of the `nLists` vec_ids
    *    with the LOWEST fnv1a64(vec_id) — a deterministic hash-ordered
    *    sample, so id-clustered corpora (ids assigned by crawl order, say)
    *    still seed across the whole distribution;
    *  - exactly ONE Lloyd step: assign each vector to its nearest centroid
    *    by integer squared-L2 (tie -> lowest centroid index), then recompute
    *    each centroid as the per-dimension floorDiv(sum, count) of its cell
    *    (an empty cell keeps its initial centroid);
    *  - the inverted lists are the assignment under the stepped centroids.
    * Queries probe their `nProbe` nearest stepped centroids and score the
    * candidates with the quantized integer dot product. Distribution shape
    * matches `ivfTopK`: centroids are tiny driver-side state (2 collects of
    * nLists rows), assignment is one scan, probing is a broadcast join.
    */
  def ivfTopKQuant(spark: SparkSession, embeddings: DataFrame, queryIds: Seq[Long],
                   k: Int = 10, nLists: Int = 16, nProbe: Int = 4,
                   idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // Alias the embedding column to a fixed name before any expr() uses it
    // (raw string interpolation of arbitrary column names is unsafe).
    val quant = embeddings.select(col(idCol).as("vid"), col(embCol).as("__emb"))
      .select(col("vid"),
        expr("transform(__emb, x -> cast(round(cast(x as double) * 1000) as bigint))").as("qv"))

    def nearest(cents: Array[Array[Long]]) = udf { (q: Seq[Long]) =>
      var bestIdx = 0
      var bestDist = Long.MaxValue
      var ci = 0
      while (ci < cents.length) {
        val c = cents(ci)
        var dist = 0L
        var d = 0
        while (d < c.length) { val t = q(d) - c(d); dist += t * t; d += 1 }
        if (dist < bestDist) { bestDist = dist; bestIdx = ci } // tie -> lowest ci
        ci += 1
      }
      bestIdx
    }

    // Initial centroids: nLists lowest by (fnv1a64(vid), vid) — a fixed
    // hash-ordered sample (quantizer params — tiny collect). A corpus with
    // fewer than nLists rows simply seeds one cell per row (the SQL mirror's
    // LIMIT adapts identically); an empty corpus returns an empty result.
    val fnvUdf = udf((id: Long) => TextOps.fnv1a64(id.toString))
    val c0: Array[Array[Long]] = quant
      .withColumn("__h", fnvUdf(col("vid")))
      .orderBy(col("__h"), col("vid")).limit(nLists)
      .collect().map(_.getSeq[Long](1).toArray)
    if (c0.isEmpty)
      return spark.emptyDataset[(Long, Long, Long, Int)]
        .toDF("query_id", "neighbor_id", "dot", "rank")
    val lists = c0.length
    val dims = c0(0).length
    // One Lloyd step: per-cell per-dim integer sums + counts. NARROW shape —
    // posexplode to (cell, dim, value) rows and one 3-column aggregation —
    // instead of a dims-wide agg of `sum(element_at(qv, d))` columns: the
    // wide form generated 1 + dims aggregate expressions whose whole-stage
    // codegen compile dominated the query's wall time (guide §1.2 step 2 —
    // this is planning/compile cost, not data cost; the grouped row count
    // is nLists x dims either way, map-side combined). Sums are identical
    // integers, so the stepped centroids — and the oracle hash — are
    // unchanged.
    val cellRows = quant.withColumn("c0", nearest(c0)(col("qv")))
      .select(col("c0"), posexplode(col("qv")).as(Seq("d", "v")))
      .groupBy("c0", "d").agg(count(lit(1)).as("cnt"), sum("v").as("s"))
      .collect()
    val cellCnt = new Array[Long](lists)
    val cellSums = Array.fill(lists)(new Array[Long](dims))
    for (r <- cellRows) {
      val ci = r.getInt(0)
      cellCnt(ci) = r.getLong(2) // same count for every dim of the cell
      cellSums(ci)(r.getInt(1)) = r.getLong(3)
    }
    val c1: Array[Array[Long]] = Array.tabulate(lists) { ci =>
      if (cellCnt(ci) > 0) cellSums(ci).map(s => Math.floorDiv(s, cellCnt(ci)))
      else c0(ci) // empty cell keeps its initial centroid
    }
    val assigned = quant.withColumn("list_id", nearest(c1)(col("qv")))

    // Probe lists per query: nProbe nearest stepped centroids (driver-side —
    // queries and centroids are both tiny).
    val queryVecs = quant.filter(col("vid").isInCollection(queryIds))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val probeRows = queryVecs.toSeq.flatMap { case (qid, qv) =>
      c1.zipWithIndex.map { case (c, ci) =>
        var dist = 0L
        var d = 0
        while (d < c.length) { val t = qv(d) - c(d); dist += t * t; d += 1 }
        (qid, ci, dist)
      }.sortBy(p => (p._3, p._2)).take(nProbe).map(p => (qid, p._2))
    }
    val probes = broadcast(probeRows.toDF("query_id", "probe_list"))
    val queries = broadcast(
      quant.filter(col("vid").isInCollection(queryIds))
        .select(col("vid").as("query_id"), col("qv").as("qq")))
    val scored = assigned
      .join(probes, col("list_id") === col("probe_list"))
      .join(queries, "query_id")
      .filter(col("vid") =!= col("query_id"))
      .withColumn("dot",
        expr("aggregate(zip_with(qv, qq, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("vid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"), col("dot"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs via shared LSH bucket + exact
    * cosine verification (the embedding analogue of minhash dedup).
    *
    * Bucket-size guard: buckets larger than `maxBucket` are NOT self-joined
    * directly — their rows are re-bucketed with `extraBits` additional
    * hyperplanes per refinement round (up to `refineRounds`), splitting
    * crowded-but-heterogeneous buckets. Rows still crowded after the last
    * round ARE joined (they are near-identical vectors: every pair is a
    * true near-dup, so the output itself is what is quadratic — unavoidable).
    * NOTE: refinement trades recall at bucket boundaries for boundedness,
    * like any LSH scheme; near-dup pairs split by an extra plane are lost.
    */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double = 0.95,
                            idCol: String = "vec_id",
                            embCol: String = "embedding",
                            bits: Int = DefaultSignatureBits,
                            maxBucket: Int = 10000,
                            refineRounds: Int = 2,
                            extraBits: Int = 4): DataFrame = {
    require(bits + refineRounds * extraBits <= MaxSignatureBits,
      "bits + refinement exceeds the 62-bit signature budget")
    def pairsWithin(b: DataFrame): DataFrame =
      b.as("l")
        .join(b.as("r"),
          col("l.lsh_bucket") === col("r.lsh_bucket") && col("l.id") < col("r.id"))
        .withColumn("cosine", expr(cosineExpr("l.e", "r.e")))
        .filter(col("cosine") >= threshold)
        .select(col("l.id").as("a"), col("r.id").as("b"), col("cosine"))

    var cur = withLshBucket(embeddings, embCol, bits)
      .select(col(idCol).as("id"), col(embCol).as("e"), col("lsh_bucket"))
    var out: DataFrame = null
    var round = 0
    var curBits = bits
    // Each round reads `cur` three times (counts, small branch, big/next
    // branch); without a persist every read re-runs the signature UDF
    // lineage over the full surviving set — and round r's lineage chains
    // through every earlier round's UDF. Persist each round's working set
    // (MEMORY_AND_DISK, spills at scale): the caller's action materializes
    // each once and all three reads share it. Rounds shrink geometrically
    // (only big-bucket rows survive), so <= refineRounds+1 shrinking caches
    // are held; they release with the session (plan construction is lazy, so
    // an eager per-round unpersist here would empty the cache before the
    // caller ever runs it).
    while (round <= refineRounds && cur != null) {
      cur = cur.persist()
      val counts = cur.groupBy("lsh_bucket").agg(count(lit(1)).as("bn"))
      val small = cur.join(counts.filter(col("bn") <= maxBucket).select("lsh_bucket"), "lsh_bucket")
      val p = pairsWithin(small)
      out = if (out == null) p else out.unionByName(p)
      if (round < refineRounds) {
        val big = cur.join(counts.filter(col("bn") > maxBucket).select("lsh_bucket"), "lsh_bucket")
        // Refine: append extraBits new hyperplane signatures (planes continue
        // from curBits — deterministic, disjoint from the ones already used).
        val fromBit = curBits
        val refineUdf = udf((v: Seq[Float], bucket: Long) => {
          var sig = bucket
          var p2 = fromBit
          while (p2 < fromBit + extraBits) {
            var dot = 0L
            val arr = v
            var d = 0
            while (d < arr.length) { dot += roundQ(arr(d).toDouble * 1000) * hyperplaneQ(p2, d); d += 1 }
            if (dot >= 0) sig |= (1L << p2)
            p2 += 1
          }
          sig
        })
        cur = big.withColumn("lsh_bucket", refineUdf(col("e"), col("lsh_bucket")))
        curBits += extraBits
      } else {
        // Last round: join what remains (homogeneous near-identical buckets).
        val big = cur.join(counts.filter(col("bn") > maxBucket).select("lsh_bucket"), "lsh_bucket")
        out = out.unionByName(pairsWithin(big))
        cur = null
      }
      round += 1
    }
    out
  }
}
