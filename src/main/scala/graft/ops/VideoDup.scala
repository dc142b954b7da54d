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
 * video — the signature falls back to an md5 over the ORDERED
 * sample payloads the same container walks already locate (AVI
 * `movi` chunks, MP4 `stbl` samples of any video codec, moof/trun
 * fragment runs, WebM video-track blocks, and MPEG-TS video PES
 * payloads REASSEMBLED per PID — PES/TS headers stripped, so the
 * digested bytes are the elementary stream an MP4 twin carries).
 * Round 20 adds NAL-framing NORMALIZATION before the digest: a real
 * `ffmpeg -c copy` TS ↔ MP4 re-container rewrites H.26x framing
 * (Annex-B start codes ↔ avcC length prefixes) even though the NAL
 * payloads are untouched, so each access unit that parses as either
 * framing is digested as its ordered NAL-unit sequence instead of
 * raw bytes ([[nalUnits]]). The path now catches every H.264 MP4 ↔
 * AVI ↔ fragmented-MP4 ↔ TS re-container INCLUDING framing
 * rewrites, still with ZERO decode; what it deliberately does NOT
 * catch is a re-encode (that needs pixels). The `sig_kind` column
 * says which path produced each signature ('phash' = perceptual,
 * 'payload' = sample digest); kinds never join against each other.
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
   * carrying the same codec payload (framing rewrites are handled
   * by [[nalUnits]] normalization at digest time, round 20). What
   * the path still deliberately does NOT catch is a re-encode —
   * that needs pixels. */
  /** Span groups plus the container's FRAMING hint: MP4 samples are
   * length-prefixed by construction (avcC), so the normalizer tries
   * length prefixes first there; TS carries Annex-B, AVI/WebM have
   * no declared H.26x framing (Annex-B is the unframed-container
   * convention) — the hint resolves the genuinely ambiguous AUs
   * (round-20 review fix: an AVCC AU whose first length prefix is
   * 0x000001xx — a 256-383-byte NAL — parses as Annex-B too, so
   * order must come from the container, the way real demuxers know
   * it, not from a guess). */
  private[graft] def payloadSpans(
      b: Array[Byte]): (Seq[Seq[(Int, Int)]], Boolean) = {
    val avi = Multimodal.AvHeaders.aviVideoChunks(b)
    if (avi.nonEmpty) (avi.map(Seq(_)), false)
    else {
      val moov = Multimodal.AvHeaders.mp4AnyVideoSamples(b)
      if (moov.nonEmpty) (moov.map(Seq(_)), true)
      else {
        val frag = Multimodal.AvHeaders.mp4FragmentVideoSamples(b)
        if (frag.nonEmpty) (frag.map(Seq(_)), true)
        else {
          val webm = Multimodal.AvHeaders.webmVideoBlockSpans(b)
          if (webm.nonEmpty) (webm.map(Seq(_)), false)
          else (Multimodal.AvHeaders.tsVideoPesSamples(b), false)
        }
      }
    }
  }

  /** Annex-B split of one access unit [from, until): a start code
   * (00 00 01 or 00 00 00 01) at the very beginning, NAL payloads
   * between start codes (a zero immediately before a 3-byte code is
   * read as the 4-byte form — the emission convention every muxer
   * uses; a NAL whose own trailing bytes could alias a start code
   * is ambiguous in Annex-B itself). Every NAL must be nonempty
   * with forbidden_zero_bit 0, else the AU is not Annex-B. */
  private def annexBUnits(b: Array[Byte], from: Int,
      until: Int): Option[Seq[(Int, Int)]] = {
    var i =
      if (until - from >= 5 && b(from) == 0 && b(from + 1) == 0 &&
        b(from + 2) == 0 && b(from + 3) == 1) from + 4
      else if (until - from >= 4 && b(from) == 0 && b(from + 1) == 0 &&
        b(from + 2) == 1) from + 3
      else return None
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var nalStart = i
    while (i + 2 < until) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) {
        var end = i
        if (end > nalStart && b(end - 1) == 0) end -= 1 // 4-byte form
        if (end <= nalStart) return None // empty NAL
        out += ((nalStart, end - nalStart))
        i += 3
        nalStart = i
      } else i += 1
    }
    if (until <= nalStart) return None // trailing empty NAL
    out += ((nalStart, until - nalStart))
    if (out.forall { case (o, _) => (b(o) & 0x80) == 0 }) Some(out.toSeq)
    else None
  }

  /** Length-prefixed (AVCC/HVCC-style) split of one access unit:
   * BE lengths of `lsize` bytes chaining NAL payloads that consume
   * the AU EXACTLY, each nonempty with forbidden_zero_bit 0 — the
   * exact-consumption requirement is what keeps arbitrary bytes
   * (MJPEG frames, VP9 payloads) from parsing by accident. */
  private def lengthPrefixedUnits(b: Array[Byte], from: Int, until: Int,
      lsize: Int): Option[Seq[(Int, Int)]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var p = from
    while (p < until) {
      if (p + lsize > until) return None
      var len = 0L
      var k = 0
      while (k < lsize) { len = (len << 8) | (b(p + k) & 0xffL); k += 1 }
      if (len <= 0 || p + lsize + len > until) return None
      val o = p + lsize
      if ((b(o) & 0x80) != 0) return None
      out += ((o, len.toInt))
      p = o + len.toInt
    }
    if (out.nonEmpty) Some(out.toSeq) else None
  }

  /** The ordered NAL units of one access unit, whatever its framing
   * (round 20): the container hint orders the attempts — MP4-derived
   * AUs try 4/2-byte length prefixes (the avcC convention) before
   * Annex-B, everything else Annex-B first — so an AU that happens
   * to parse BOTH ways (an AVCC unit whose first prefix is
   * 0x000001xx) normalizes the way its container framed it. None
   * when the AU parses as neither — the digest then falls back to
   * raw bytes, so non-NAL codecs are untouched. */
  private[graft] def nalUnits(b: Array[Byte], from: Int, until: Int,
      lengthFirst: Boolean = false): Option[Seq[(Int, Int)]] =
    if (lengthFirst)
      lengthPrefixedUnits(b, from, until, 4)
        .orElse(lengthPrefixedUnits(b, from, until, 2))
        .orElse(annexBUnits(b, from, until))
    else
      annexBUnits(b, from, until)
        .orElse(lengthPrefixedUnits(b, from, until, 4))
        .orElse(lengthPrefixedUnits(b, from, until, 2))

  /** md5 over the ordered sample payloads; the count is SAMPLES
   * (groups), not fragments, so a TS twin reports the same n_frames
   * as its MP4 re-mux. None when no group is fully in-bounds.
   *
   * Round 20 — NAL-framing NORMALIZATION: every real `ffmpeg -c
   * copy` TS ↔ MP4 re-container rewrites H.26x bitstream framing
   * (TS carries Annex-B start codes, MP4 carries avcC length
   * prefixes), so raw-byte digests can never pair them. Each access
   * unit that parses as Annex-B or as exactly-consuming length
   * prefixes is digested as its ordered NAL payload sequence
   * (tag 'N', then BE32 length + bytes per NAL — framing-free);
   * anything else is digested raw (tag 'R' + BE32 length + bytes),
   * so VP8/VP9/MJPEG payload twins keep matching byte-for-byte and
   * the two derivations can never alias each other. Still ZERO
   * decode. */
  private[graft] def payloadDigest(b: Array[Byte]): Option[(Int, String)] = {
    val (spans, lengthFirst) = payloadSpans(b)
    val groups = spans.filter(g => g.nonEmpty && g.forall {
      case (off, len) => off >= 0 && len > 0 && off.toLong + len <= b.length })
    if (groups.isEmpty) None
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      def putLen(v: Int): Unit = md.update(Array[Byte](
        (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte))
      for (g <- groups) {
        // single-span AUs (the common case) parse in place; spanning
        // AUs (TS continuation packets) concatenate once
        val (au, from, until) =
          if (g.size == 1) (b, g.head._1, g.head._1 + g.head._2)
          else {
            val total = g.iterator.map(_._2).sum
            val tmp = new Array[Byte](total)
            var o = 0
            for ((off, len) <- g) {
              System.arraycopy(b, off, tmp, o, len)
              o += len
            }
            (tmp, 0, total)
          }
        nalUnits(au, from, until, lengthFirst) match {
          case Some(nals) =>
            md.update('N'.toByte)
            for ((o, l) <- nals) { putLen(l); md.update(au, o, l) }
          case None =>
            md.update('R'.toByte)
            putLen(until - from)
            md.update(au, from, until - from)
        }
      }
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
