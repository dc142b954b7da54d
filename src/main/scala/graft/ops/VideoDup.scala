package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Multimodal.MediaRow

/**
 * Video RE-MUX dedup — the video cell of the modality matrix (text
 * SimHash, image dHash, audio spectral fingerprints, video THIS):
 * the dominant duplication shape for video corpora is the SAME
 * stream re-containered (MP4 ↔ AVI ↔ MKV re-muxes carry identical
 * codec payloads behind different box/chunk framing), which byte
 * hashing of the FILE can never catch but per-frame perceptual
 * hashing catches exactly.
 *
 * Signature: walk the container's real sample tables (the AVI `movi`
 * chunk walk / MP4 `stbl` walk the frame-sampling family already
 * uses), decode every video frame (MJPEG — real pixels), dHash each
 * with the image family's 64-bit grid hash, and digest the ORDERED
 * hash sequence (md5 over the hex concatenation) together with the
 * frame count. Re-muxed copies produce identical sequences;
 * different content diverges at the first frame (the per-frame hash
 * is the image family's, with its avalanche-backed distinctness).
 *
 * Payload-digest fallback (round 18; TS added in round 19): when NO
 * frame pixel-decodes — H.264/HEVC and friends, i.e. nearly all real
 * video — the signature falls back to an md5 over the ORDERED RAW
 * sample byte spans the same container walks already locate (AVI
 * `movi` chunks, MP4 `stbl` samples of any video codec, moof/trun
 * fragment runs, WebM video-track blocks, and MPEG-TS video PES
 * payloads REASSEMBLED per PID — PES/TS headers stripped, so the
 * digested bytes are the elementary stream an MP4 twin carries). A
 * re-mux carries the codec payload bytes verbatim, so this catches
 * every H.264 MP4 ↔ AVI ↔ fragmented-MP4 ↔ TS re-container with
 * ZERO decode; what it deliberately does NOT catch is a re-encode
 * (that needs pixels) or a re-mux that rewrites the bitstream
 * framing (AVCC ↔ Annex-B). The `sig_kind` column says which path
 * produced each signature ('phash' = perceptual, 'payload' =
 * raw-span digest); kinds never join against each other.
 *
 * Scale shape: decode + hash are partition-local per blob; only
 * (media_id, n_frames, 16-byte digest, kind) rows reach the pair
 * join — one exchange keyed on the digest, video bytes never
 * shuffle.
 */
object VideoDup {

  /** Ordered per-frame dHash hexes of the container's video frames
   * (AVI `movi` chunks, else MP4 sample-table samples). Frames that
   * fail pixel decode claim nothing — a video with NO decodable
   * frame yields Nil. */
  private[graft] def frameDhashSeq(b: Array[Byte]): Seq[String] = {
    val spans = {
      val avi = Multimodal.AvHeaders.aviVideoChunks(b)
      if (avi.nonEmpty) avi else Multimodal.AvHeaders.mp4VideoSamples(b)
    }
    spans.flatMap { case (off, len) =>
      if (off < 0 || len <= 0 || off.toLong + len > b.length) None
      else ImageHash.dhashBands(
        java.util.Arrays.copyOfRange(b, off, off + len)).map {
        case (_, _, bands) =>
          bands.reverseIterator.map(v => f"$v%04x").mkString
      }
    }
  }

  /** Raw sample-span GROUPS for the payload-digest path (one group =
   * one sample/access unit, usually a single contiguous span): AVI
   * `movi` chunks, else self-contained MP4 samples of ANY video
   * codec, else the moof/trun fragment runs, else WebM video-track
   * SimpleBlock payloads (VP8/VP9/AV1 re-muxes carry them verbatim;
   * audio tracks are excluded via the Tracks walk), else — round
   * 19 — MPEG-TS PES payload REASSEMBLY per video PID: a PES
   * packet's payload fragments across its TS packets form one
   * group, so the HLS-era `.ts` segment digests equal to an MP4
   * carrying the same codec payload. What the path still
   * deliberately does NOT catch is a re-encode (that needs pixels)
   * or a re-mux that rewrites the bitstream framing (AVCC ↔
   * Annex-B). */
  private[graft] def payloadSpans(b: Array[Byte]): Seq[Seq[(Int, Int)]] = {
    val avi = Multimodal.AvHeaders.aviVideoChunks(b)
    if (avi.nonEmpty) avi.map(Seq(_))
    else {
      val moov = Multimodal.AvHeaders.mp4AnyVideoSamples(b)
      if (moov.nonEmpty) moov.map(Seq(_))
      else {
        val frag = Multimodal.AvHeaders.mp4FragmentVideoSamples(b)
        if (frag.nonEmpty) frag.map(Seq(_))
        else {
          val webm = Multimodal.AvHeaders.webmVideoBlockSpans(b)
          if (webm.nonEmpty) webm.map(Seq(_))
          else Multimodal.AvHeaders.tsVideoPesSamples(b)
        }
      }
    }
  }

  /** md5 over the ordered raw sample bytes; the count is SAMPLES
   * (groups), not fragments, so a TS twin reports the same n_frames
   * as its MP4 re-mux. None when no group is fully in-bounds. */
  private[graft] def payloadDigest(b: Array[Byte]): Option[(Int, String)] = {
    val groups = payloadSpans(b).filter(g => g.nonEmpty && g.forall {
      case (off, len) => off >= 0 && len > 0 && off.toLong + len <= b.length })
    if (groups.isEmpty) None
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      for (g <- groups; (off, len) <- g) md.update(b, off, len)
      Some((groups.size, md.digest().map(x => f"$x%02x").mkString))
    }
  }

  /** Per-video signature row: (media_id, n_frames, sig, sig_kind).
   * Perceptual when any frame pixel-decodes; payload-digest
   * otherwise; no row when the container yields nothing at all. */
  def signatureTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val seq = frameDhashSeq(r.media)
          if (seq.nonEmpty) {
            val md = java.security.MessageDigest.getInstance("MD5")
            val sig = md.digest(seq.mkString(",").getBytes("US-ASCII"))
              .map(x => f"$x%02x").mkString
            Some((r.media_id, seq.size, sig, "phash"))
          } else payloadDigest(r.media).map { case (n, sig) =>
            (r.media_id, n, sig, "payload")
          }
        }
      }
      .toDF("media_id", "n_frames", "sig", "sig_kind")
  }

  /** Container sniff for the coverage face. */
  private[graft] def videoContainer(b: Array[Byte]): String = {
    if (b == null || b.length < 8) return "other"
    def tag(o: Int, s: String): Boolean = Multimodal.AvHeaders.magic(b, o, s)
    if (tag(0, "RIFF") && tag(8, "AVI ")) "avi"
    else if (tag(4, "ftyp")) "mp4"
    else if ((b(0) & 0xff) == 0x1A && (b(1) & 0xff) == 0x45 &&
      (b(2) & 0xff) == 0xDF && (b(3) & 0xff) == 0xA3) "webm"
    else if ((b(0) & 0xff) == 0x47 && b.length >= 189 &&
      (b(188) & 0xff) == 0x47) "mpeg-ts"
    else "other"
  }

  /** Decode-COVERAGE table (q_m41) — the video twin of q_m34's
   * honesty face: per (mime_type, container) the row count, how many
   * rows the PIXEL path sees (any frame ImageIO-decodable — MJPEG
   * only today) and how many the PAYLOAD-digest path sees (raw
   * sample spans locatable — AVI chunks, MP4 stbl of any video
   * codec, moof/trun fragments, WebM video-track SimpleBlocks, and
   * since round 19 reassembled MPEG-TS PES payloads). The two
   * columns measure the two q_m38 signature paths independently;
   * mpeg-ts pixel decode stays the honest zero. Scale shape:
   * map-side sniff+walk, one tiny groupBy. */
  def decodeCoverage(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          (r.mime_type, videoContainer(r.media),
            if (frameDhashSeq(r.media).nonEmpty) 1L else 0L,
            if (payloadDigest(r.media).isDefined) 1L else 0L)
        }
      }
      .toDF("mime_type", "container", "px", "pl")
      .groupBy("mime_type", "container")
      .agg(count(lit(1)).as("n"), sum(col("px")).as("n_pixel"),
        sum(col("pl")).as("n_payload"))
  }

  /** Re-mux pairs: equal kind + frame count + ordered digest.
   * One digest-keyed exchange over fixed-shape rows. */
  def remuxPairs(sigs: DataFrame): DataFrame = {
    val l = sigs.as("l")
    val r = sigs.as("r")
    l.join(r, col("l.sig") === col("r.sig") &&
        col("l.sig_kind") === col("r.sig_kind") &&
        col("l.n_frames") === col("r.n_frames") &&
        col("l.media_id") < col("r.media_id"))
      .select(col("l.media_id").as("media_id_a"),
        col("r.media_id").as("media_id_b"),
        col("l.sig_kind").as("sig_kind"))
  }
}
