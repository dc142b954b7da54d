package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Multimodal.MediaRow

/**
 * Perceptual IMAGE near-duplicate detection — the multimodal twin of
 * the text near-dedup family (Dedup.simhashPairs): a multimodal
 * training corpus is full of resizes, re-encodes and light edits of
 * the same picture, which byte-level hashing can never catch. The
 * classic answer is a difference hash (dHash): decode, reduce to a
 * coarse luminance grid, and keep one bit per horizontally adjacent
 * cell pair ("is the right cell brighter?") — brightness ORDER
 * survives re-encoding and mild edits, absolute values don't.
 *
 * The decode is the REAL JDK ImageIO path the media family already
 * uses (Multimodal.MediaCodec: PNG/JPEG/GIF/BMP without external
 * codecs), reduced by the same Rec.601 [[Multimodal.MediaCodec.luminanceGrid]]
 * at dHash shape (9×8 → 8×8 = 64 bits). The 64 bits are carried as
 * FOUR 16-bit band integers — the natural LSH representation (the
 * banded self-join buckets on them directly) and it keeps every value
 * comfortably inside signed arithmetic in both engines.
 *
 * Same banding math as the text SimHash face: with 4 bands, any pair
 * within Hamming distance 3 shares at least one untouched band
 * (pigeonhole), so the bucket join is a GUARANTEED-recall candidate
 * generator, never a heuristic.
 */
object ImageHash {

  val GridW = 9
  val GridH = 8
  val Bands = 4
  val BitsPerBand = 16

  /** dHash bands of a decoded image: bit i = gy*8+gx set when cell
   * (gx+1, gy) is strictly brighter than cell (gx, gy); band j holds
   * bits [16j, 16j+16). None when the bytes don't decode as an image
   * (tolerance — corrupt rows claim nothing). */
  private[ops] def dhashBands(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    Multimodal.MediaCodec.decodeImage(bytes).map { img =>
      (img.getWidth, img.getHeight, dhashOfImage(img))
    }

  /** The dHash core over an already-decoded image — shared with the
   * animated-GIF composited-frame face (q_m42) and the fixture
   * ground-truth builders. */
  private[graft] def dhashOfImage(img: java.awt.image.BufferedImage): Array[Int] = {
    val g = Multimodal.MediaCodec.luminanceGrid(img, GridW, GridH)
    val bands = new Array[Int](Bands)
    var gy = 0
    while (gy < GridH) {
      var gx = 0
      while (gx < GridW - 1) {
        if (g(gy * GridW + gx + 1) > g(gy * GridW + gx)) {
          val i = gy * (GridW - 1) + gx
          bands(i / BitsPerBand) |= 1 << (i % BitsPerBand)
        }
        gx += 1
      }
      gy += 1
    }
    bands
  }

  /** The repo's dhash_hex convention: bands high-to-low, 4 hex
   * digits each, lowercase. */
  private[graft] def bandsHex(bands: Array[Int]): String =
    f"${bands(3)}%04x${bands(2)}%04x${bands(1)}%04x${bands(0)}%04x"

  /** Per-image dHash table (q_m31): (media_id, width, height,
   * b0..b3, dhash_hex). Pure map-side — one decode per blob inside
   * its partition, only the 4-int signature leaves. */
  def dhashTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap(r => dhashBands(r.media).map { case (w, h, b) =>
          (r.media_id, w, h, b(0), b(1), b(2), b(3))
        })
      }
      .toDF("media_id", "width", "height", "b0", "b1", "b2", "b3")
      .withColumn("dhash_hex", concat(
        lower(lpad(hex(col("b3")), 4, "0")), lower(lpad(hex(col("b2")), 4, "0")),
        lower(lpad(hex(col("b1")), 4, "0")), lower(lpad(hex(col("b0")), 4, "0"))))
  }

  /** Container sniff by magic bytes — what the blob actually IS
   * (mime_type columns lie on real crawls): png / jpeg / gif / bmp /
   * webp-lossless (RIFF+WEBP+VP8L) / webp (any other WEBP payload,
   * e.g. lossy VP8) / other. */
  private[ops] def container(b: Array[Byte]): String = {
    def tag(o: Int, t: String): Boolean =
      o + t.length <= b.length &&
        t.indices.forall(i => (b(o + i) & 0xff) == t.charAt(i))
    if (b == null || b.length < 12) "other"
    else if ((b(0) & 0xff) == 0x89 && tag(1, "PNG")) "png"
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (tag(0, "GIF8")) "gif"
    else if (tag(0, "BM")) "bmp"
    else if (tag(0, "RIFF") && tag(8, "WEBP"))
      if (tag(12, "VP8L")) "webp-lossless" else "webp"
    else "other"
  }

  /** Decode-COVERAGE table (q_m34): per (mime_type, container) the
   * row count and how many actually decode through the perceptual
   * family's decode path (ImageIO + the in-repo VP8L and VP8
   * decoders). On a
   * real crawl this is the first number an image-dedup run must
   * report — q_m31–q_m33 silently skip undecodable rows by design
   * (tolerance), and without this face that skip is invisible.
   * Scale shape: map-side sniff+decode, then one tiny groupBy. */
  def decodeCoverage(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          (r.mime_type, container(r.media),
            if (dhashBands(r.media).isDefined) 1L else 0L)
        }
      }
      .toDF("mime_type", "container", "ok")
      .groupBy("mime_type", "container")
      .agg(count(lit(1)).as("n"), sum(col("ok")).as("n_decoded"))
  }

  /** Near-duplicate image pairs (q_m32): band-bucket self-join (any
   * equal band → candidate), exact Hamming distance over the four
   * bands, keep pairs within `maxHamming`. With maxHamming < Bands
   * the pigeonhole guarantee holds: a qualifying pair always shares
   * an intact band, so recall is exact.
   *
   * Scale shape: the O(n²) pair space never materialises — the
   * shuffles are the band groupBy-join keyed on (band_idx, value),
   * and only signature rows (7 ints) move; the images themselves
   * stay in their partitions behind [[dhashTable]]. Same plan family
   * as Dedup.simhashPairs, already ScaleProbe'd at 10M rows. */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < Bands,
      s"pigeonhole guarantee needs maxHamming < bands (got $maxHamming >= $Bands)")
    val banded = hashes.select(
      col("media_id"), col("b0"), col("b1"), col("b2"), col("b3"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band_idx", "band_val")))
    def side(n: String) = banded.select(
      col("band_idx"), col("band_val"), col("media_id").as(s"id_$n"),
      col("b0").as(s"${n}0"), col("b1").as(s"${n}1"),
      col("b2").as(s"${n}2"), col("b3").as(s"${n}3"))
    side("a").join(side("b"), Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("a0").bitwiseXOR(col("b0"))) +
          bit_count(col("a1").bitwiseXOR(col("b1"))) +
          bit_count(col("a2").bitwiseXOR(col("b2"))) +
          bit_count(col("a3").bitwiseXOR(col("b3")))).cast("long").as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }
}
