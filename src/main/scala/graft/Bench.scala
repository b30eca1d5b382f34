package graft

import org.apache.spark.sql.SparkSession

import graft.spark.{PagesGen, Pipeline}

/** Benchmark main (driver contract): headline queries + extraction
  * throughput, plus the two-parallelism scaling evidence required by the
  * north rule (no real cluster in the sandbox, so the SAME job runs at
  * local[8] and local[32] over the SAME input; efficiency =
  * throughput(32)/(4 * throughput(8))).
  *
  * Prints ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "extraction":{"docs":N,"docs_per_sec":...},
  *  "scaling":{"p8_docs_per_sec":...,"p32_docs_per_sec":...,"efficiency":...}}
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Extraction throughput at a given parallelism over a fixed parquet
    * corpus; returns (docs, seconds).
    */
  private def extractionRun(spark: SparkSession, pagesPath: String, cores: Int): (Long, Double) = {
    val pages = spark.read.parquet(pagesPath)
    val ((n, _), sec) = timed {
      val ds = Pipeline.extract(spark, pages, s"bench-$cores", numPartitions = cores * 2)
      (ds.filter(_.status != "__never__").count(), ())
    }
    (n, sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench").toString
    val pagesPath = s"$tmp/pages.parquet"

    // ------------------------------------------ phase 0: corpus + queries
    var spark = session(cpus)
    // Materialize the synthetic corpus once so every timed run reads the
    // identical parquet input.
    val (_, buildSec) = timed {
      PagesGen.pagesMixed(spark, sfDir).toDF()
        .write.mode("overwrite").parquet(pagesPath)
    }
    val queryTimes = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    queryTimes("corpus_build") = buildSec
    // Headline relational / ops queries (same set the driver verifies).
    val headline = Seq("q01_lineitem_agg", "q02_top_orders", "q04_latest_event",
      "q05_token_count", "q06_exact_dedup", "q09_ann_topk", "x16_minhash_groups",
      "x17_simhash", "x14_ann_lsh", "x20_multimodal_decode")
    for (name <- headline; fn <- SparkEntry.queries.get(name)) {
      val (_, sec) = timed {
        try fn(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1L }
      }
      queryTimes(name) = sec
    }
    // Extraction at full parallelism (the headline metric).
    val (docsFull, secFull) = extractionRun(spark, pagesPath, cpus)
    queryTimes("extract_full") = secFull
    spark.stop()

    // -------------------------------- phase 1+2: scaling (local[8] vs [32])
    spark = session(8)
    // warm-up (JIT) then timed
    extractionRun(spark, pagesPath, 8)
    val (docs8, sec8) = extractionRun(spark, pagesPath, 8)
    spark.stop()
    spark = session(32)
    extractionRun(spark, pagesPath, 32)
    val (docs32, sec32) = extractionRun(spark, pagesPath, 32)
    spark.stop()

    val tp8 = docs8 / sec8
    val tp32 = docs32 / sec32
    val efficiency = tp32 / (4.0 * tp8)
    val total = queryTimes.values.sum + sec8 + sec32

    val qs = queryTimes.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","extraction":{"docs":$docsFull,"secs":${"%.3f".format(secFull)},"docs_per_sec":${"%.1f".format(docsFull / secFull)}},"scaling":{"p8_docs_per_sec":${"%.1f".format(tp8)},"p32_docs_per_sec":${"%.1f".format(tp32)},"efficiency":${"%.3f".format(efficiency)}}}""")
  }
}
