package graft.spark

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator

import graft.Extract

/** The extraction pipeline: scan -> dedup-by-url -> salt/partition ->
  * mapPartitions kernel -> extracted rows (+ per-partition lineage).
  *
  * Scale design (SURVEY.md §2.10, §4.3):
  *  - dedup keeps the LATEST capture per url (window by warc_ts desc) — one
  *    shuffle on url, unavoidable for the semantics;
  *  - the kernel runs inside ONE typed mapPartitions (no shuffle): a pure
  *    Array[Byte] -> ExtractResult function per row, failure-isolated;
  *  - skew: docs are spread by hashing url (uniform mix of sizes per
  *    partition beats range-by-size, which would cluster the whales);
  *    per-doc byte cap (skipped_oversize) bounds the worst straggler;
  *  - lineage: accumulated per task partition (one row per partition —
  *    thousands of rows at cluster scale, trivially collectible).
  */
object Pipeline {

  val DefaultMaxBytesPerDoc: Int = Extract.DefaultMaxBytesPerDoc

  /** Keep the latest capture per url (SURVEY §2.10 dedup). Ties on warc_ts
    * (same-second recrawls) break deterministically by payload hash so the
    * survivor is stable across shuffles, retries and AQE replans.
    */
  def dedupLatest(pages: DataFrame): DataFrame = {
    val w = Window.partitionBy("url")
      .orderBy(col("warc_ts").desc, xxhash64(col("html")).desc)
    pages
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Run extraction over a pages DataFrame. Returns the extracted Dataset;
    * lineage rows are collected into `lineageAcc` when provided.
    */
  def extract(
      spark: SparkSession,
      pages: DataFrame,
      runId: String,
      numPartitions: Int = -1,
      maxBytesPerDoc: Int = DefaultMaxBytesPerDoc,
      lineageAcc: CollectionAccumulator[LineageRow] = null,
      timeoutMs: Long = Extract.DefaultTimeoutMs): Dataset[ExtractedRow] = {
    import spark.implicits._
    // Project to the kernel's columns BEFORE typing the Dataset: the pages
    // table's text/lang never reach the kernel, so selecting them forced
    // every extraction scan to decode (and any opt-in repartition to
    // shuffle) ~12 KB/doc of dead data (guide §6 column pruning).
    val base = pages
      .select("url", "warc_ts", "html")
      .as[KernelInRow]
    // DEFAULT (-1) is NO pre-kernel shuffle: the scan's own partitioning
    // (spark.sql.files.maxPartitionBytes-sized splits, or the url-hash
    // partitioning left by dedupLatest's window) already spreads the work —
    // re-shuffling the full payload bytes would be the single biggest data
    // movement in the job. Pass numPartitions > 0 to opt IN to an explicit
    // url-hash spread for inputs with measured partition skew
    // (e.g. size-sorted ingest files), or 0 for defaultParallelism spread.
    val typed =
      if (numPartitions < 0) base
      else {
        val parts =
          if (numPartitions > 0) numPartitions
          else spark.sparkContext.defaultParallelism
        base.repartition(parts, col("url"))
      }

    typed.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val startedAt = System.currentTimeMillis()
      var inputRows = 0L
      var okRows = 0L
      var errRows = 0L
      var bytesIn = 0L
      var bytesOut = 0L
      val out = it.map { row =>
        inputRows += 1
        val payload = row.html
        bytesIn += (if (payload == null) 0 else payload.length)
        val r = Extract(payload, maxBytesPerDoc, timeoutMs)
        bytesOut += r.textBytes.length
        if (r.status == "ok") okRows += 1 else if (r.status == "error") errRows += 1
        ExtractedRow(
          url = row.url,
          warc_ts = row.warc_ts,
          text = r.text,
          text_bytes = r.textBytes,
          spans = r.spans.map(s => SpanRow(s.page, s.start, s.end)),
          status = r.status,
          error = r.error,
          partition_id = pid)
      }
      // Lineage flush: once on exhaustion (accurate wall clock) and, as a
      // safety net, on task completion — a downstream limit() that stops
      // consuming early would otherwise never reach the exhaustion path.
      // Completion listeners run before the task reports, so accumulator
      // updates made there still count exactly once per successful task.
      final class LineageIterator extends Iterator[ExtractedRow] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h) flush()
          h
        }
        def next(): ExtractedRow = out.next()
        @volatile private var flushed = false
        def flush(): Unit = if (!flushed && lineageAcc != null) {
          flushed = true
          lineageAcc.add(LineageRow(runId, pid, inputRows, okRows, errRows,
            bytesIn, bytesOut, System.currentTimeMillis() - startedAt,
            startedAt, System.currentTimeMillis()))
        }
      }
      val wrapped = new LineageIterator
      if (lineageAcc != null) {
        val tc = TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => wrapped.flush())
      }
      wrapped
    }
  }

  /** Full job: dedup -> extract. Convenience for the entry points. The
    * dedup window already hash-partitions rows by url, so extraction runs
    * directly on those partitions (no second shuffle).
    */
  def run(spark: SparkSession, pages: DataFrame, runId: String,
          numPartitions: Int = -1): Dataset[ExtractedRow] =
    extract(spark, dedupLatest(pages), runId, numPartitions)

  /** IMAGE extraction over a pages table: the multimodal bridge as a
    * first-class pipeline operator. One mapPartitions pass (same
    * no-pre-shuffle default as text extraction) enumerates + decodes every
    * raster of every PDF payload through PdfImages and emits one ImageRow
    * per image with integer statistics, plus a marker row (source "none")
    * per image-less document so lineage never loses documents. The FULL
    * extract guard set applies per document: empty / oversize payloads and
    * non-PDFs keep taxonomy marker rows, the per-document Deadline makes a
    * hostile spinning PDF a `timeout` row instead of a stuck task, and the
    * Extract-style Throwable backstop turns any kernel defect into an
    * `error` row (interrupts and OOM still propagate). Raw samples stay
    * inside the partition — at 100 TB the images table carries statistics
    * and identities, with decoded bytes re-derivable downstream.
    */
  def extractImages(spark: SparkSession, pages: DataFrame,
                    maxBytesPerDoc: Int = DefaultMaxBytesPerDoc,
                    timeoutMs: Long = Extract.DefaultTimeoutMs): Dataset[ImageRow] = {
    import spark.implicits._
    import graft.pdf.{Deadline, PdfTimeout}
    pages.select("url", "warc_ts", "html").as[KernelInRow]
      .mapPartitions { it =>
        it.flatMap { row =>
          val payload = row.html
          def marker(status: String, nErrors: Int): Iterator[ImageRow] =
            Iterator.single(ImageRow(row.url, -1, -1, "none", 0, 0, 0, 0,
              if (payload == null) 0L else payload.length.toLong, 0L,
              nErrors, status))
          if (payload == null || payload.length == 0) marker("empty", 0)
          else if (payload.length > maxBytesPerDoc) marker("skipped_oversize", 0)
          else if (!graft.Extract.isPdf(payload)) marker("non_pdf", 0)
          else {
            try {
              if (timeoutMs > 0) Deadline.set(System.nanoTime() + timeoutMs * 1000000L)
              val scan =
                try graft.pdf.PdfImages.imagesOf(graft.pdf.PdfDocument.open(payload))
                finally Deadline.clear()
              if (scan.images.isEmpty) marker("ok", scan.nErrors)
              else scan.images.iterator.map { im =>
                ImageRow(row.url, im.page, im.idx, im.source, im.width,
                  im.height, im.bpc, im.components, im.data.length.toLong,
                  im.band0Sum, scan.nErrors, "ok")
              }
            } catch {
              case _: PdfTimeout => marker("timeout", 1)
              case ie: InterruptedException =>
                Thread.currentThread().interrupt(); throw ie
              case fatal: OutOfMemoryError => throw fatal
              case _: Throwable => marker("error", 1) // Extract-style backstop
            }
          }
        }
      }
  }
}
