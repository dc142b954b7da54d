package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata; decode / feature-extract /
 * frame-sample run as partition-local batch transforms
 * (`mapPartitions` over a typed Dataset — the Scala analogue of
 * `mapInPandas` batch UDFs).
 *
 * The actual codec step is STUBBED (no image/audio libraries in this
 * environment): [[MediaCodec.decode]] is a clearly-marked deterministic
 * fake. Everything around it — schema, batching, partitioning, feature
 * shape — is real and tested, so swapping in a real decoder is a
 * one-function change.
 *
 * Scale notes: media bytes never shuffle — features are extracted
 * map-side and only the (tiny) feature rows move. Partition sizing is
 * the caller's job via `spark.sql.files.maxPartitionBytes` (media rows
 * are large; keep partitions at a few hundred MB).
 */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, mime_type: String, media: Array[Byte])

  /** Extracted features: fixed shape regardless of codec. */
  case class MediaFeatures(
      media_id: Long,
      mime_type: String,
      n_bytes: Long,
      byte_entropy: Double,
      feature: Array[Float])

  /** STUB decoder boundary. Real deployments replace `decode` with an
   * actual codec (JPEG/PNG/ffmpeg); the deterministic fake hashes bytes
   * into a fixed-dim pseudo-feature so the pipeline is testable. */
  object MediaCodec {
    val FeatureDim = 16

    /** STUB: deterministic fake "decode + embed". Replace with a real
     * codec call; signature and batch shape stay the same. */
    def decode(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        acc(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      acc
    }

    def entropy(bytes: Array[Byte]): Double = {
      if (bytes.isEmpty) return 0.0
      val counts = new Array[Long](256)
      bytes.foreach(b => counts(b & 0xff) += 1)
      val n = bytes.length.toDouble
      counts.foldLeft(0.0) { (acc, c) =>
        if (c == 0) acc else acc - (c / n) * math.log(c / n) / math.log(2.0)
      }
    }
  }

  /** Synthesise a media table from the documents fixture (text bytes as
   * payload) — stands in for a real binary column until the fixtures
   * carry one. */
  def fromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("mime_type"),
      col("text").cast("binary").as("media"))

  /** Partition-local feature extraction — the `mapInPandas` analogue:
   * batches stay on their partition, media bytes never cross the wire,
   * only fixed-shape features come out. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(
          media_id = r.media_id,
          mime_type = r.mime_type,
          n_bytes = r.media.length.toLong,
          byte_entropy = MediaCodec.entropy(r.media),
          feature = MediaCodec.decode(r.media))
      }
    }
  }

  /** A sampled frame from a (fake) container stream. */
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /**
   * Frame sampling — every `everyN`-th fixed-size chunk of the payload
   * (STUB: a real implementation asks the container for keyframes; the
   * chunking here is a deterministic fake). The Spark-side shape is
   * real: partition-local, one media row fans out to many frame rows,
   * frames stay on their partition until explicitly shuffled.
   */
  def frameSample(spark: SparkSession, media: DataFrame,
      everyN: Int = 4, frameBytes: Int = 64): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      r.media.grouped(frameBytes).zipWithIndex
        .filter(_._2 % everyN == 0)
        .map { case (chunk, idx) => Frame(r.media_id, idx, chunk) }
    }
  }

  /** Feature "resize" — bucket-mean downsampling to `outDim` (STUB for
   * a real image resize; deterministic, fixed output shape). */
  def resizeFeature(feature: Array[Float], outDim: Int): Array[Float] = {
    val out = new Array[Float](outDim)
    val counts = new Array[Int](outDim)
    var i = 0
    while (i < feature.length) {
      val b = math.min((i.toLong * outDim / math.max(feature.length, 1)).toInt, outDim - 1)
      out(b) += feature(i); counts(b) += 1
      i += 1
    }
    var j = 0
    while (j < outDim) { if (counts(j) > 0) out(j) /= counts(j); j += 1 }
    out
  }

  /** Relational metadata face (oracle-checkable): payload sizes without
   * touching the codec. */
  def mediaMeta(documents: DataFrame): DataFrame =
    fromDocuments(documents).select(
      col("media_id"),
      col("mime_type"),
      octet_length(col("media")).cast("long").as("n_bytes"))
}
