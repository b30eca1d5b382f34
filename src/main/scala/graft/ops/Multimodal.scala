package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video ride as opaque `binary`
  * columns with typed metadata, processed in batched per-partition passes.
  *
  * The actual media codecs are NOT in this container, so the decode kernel
  * below is a clearly-marked DETERMINISTIC FAKE (it parses our own synthetic
  * header and derives features from the payload bytes). Everything around
  * it — the binary column, schema, mapPartitions batching, partition
  * strategy — is the real production shape: swapping `fakeDecode` for a
  * JNI/FFmpeg/libjpeg call changes nothing else.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)
  final case class MediaMeta(doc_id: Long, kind: String, width: Int, height: Int,
                             n_bytes: Long, mean_byte: Double, features: Array[Float])

  /** Synthesize a deterministic media blob: [magic u8][w u16][h u16][pixels]. */
  def syntheticMedia(docId: Long, kind: String): Array[Byte] = {
    val w = 8 + (docId % 24).toInt
    val h = 8 + ((docId / 7) % 16).toInt
    val out = new Array[Byte](5 + w * h)
    out(0) = (if (kind == "image") 0x7f else 0x7e).toByte
    out(1) = ((w >> 8) & 0xff).toByte; out(2) = (w & 0xff).toByte
    out(3) = ((h >> 8) & 0xff).toByte; out(4) = (h & 0xff).toByte
    var i = 0
    var seed = docId * 6364136223846793005L + 1442695040888963407L
    while (i < w * h) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      out(5 + i) = ((seed >>> 56) & 0xff).toByte
      i += 1
    }
    out
  }

  /** STUB decode (deterministic fake — see object doc). Real codecs would
    * plug in here without touching the Spark plumbing.
    */
  def fakeDecode(media: Array[Byte]): (Int, Int, Double, Array[Float]) = {
    if (media == null || media.length < 5) return (0, 0, 0.0, Array.fill(8)(0f))
    val w = ((media(1) & 0xff) << 8) | (media(2) & 0xff)
    val h = ((media(3) & 0xff) << 8) | (media(4) & 0xff)
    var sum = 0L
    val hist = new Array[Long](8)
    var i = 5
    while (i < media.length) {
      val b = media(i) & 0xff
      sum += b
      hist(b >> 5) += 1
      i += 1
    }
    val n = math.max(1, media.length - 5)
    (w, h, sum.toDouble / n, hist.map(c => c.toFloat / n))
  }

  /** documents -> synthetic media table (binary column + metadata). */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id")
      .as[Long]
      .map(id => MediaRow(id, syntheticMedia(id, if (id % 3 == 0) "audio" else "image"),
        if (id % 3 == 0) "audio" else "image"))
  }

  /** Batched decode/feature-extract over the binary column: one pass, no
    * shuffle; the per-partition iterator is where a real decoder would
    * amortize codec init across the batch.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // (real pipelines initialize the codec once per partition here)
      it.map { row =>
        val (w, h, mean, feats) = fakeDecode(row.media)
        MediaMeta(row.doc_id, row.kind, w, h,
          if (row.media == null) 0L else row.media.length.toLong, mean, feats)
      }
    }
  }

  /** Frame-sample plumbing for "video": pick every nth byte-block as a frame
    * key and emit (doc_id, frame_idx, frame_hash) — the schema/batch shape of
    * real frame sampling.
    */
  def frameSample(media: Dataset[MediaRow], everyN: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      val body = if (row.media == null || row.media.length <= 5) Array.emptyByteArray
      else row.media.drop(5)
      body.grouped(everyN).zipWithIndex.map { case (block, idx) =>
        (row.doc_id, idx, scala.util.hashing.MurmurHash3.bytesHash(block).toLong)
      }
    }.toDF("doc_id", "frame_idx", "frame_hash")
  }
}
