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
 * Header DECODING is real: [[ImageHeaders.imageMeta]] parses PNG IHDR
 * and walks JPEG segments to the SOF frame header — pure byte-level
 * format knowledge, no codec library. Pixel DECODING is real for
 * images: [[MediaCodec.decode]] goes through the JDK's ImageIO
 * readers (PNG/JPEG/GIF/BMP) and reduces pixels to a mean-luminance
 * grid feature. Sample DECODING is real across the classic audio
 * containers and codecs ([[MediaCodec.decodeAudio]] — direct
 * lock-free parsers for WAV/AIFF/AU linear PCM, compressed G.711
 * mu-law/A-law via 256-entry expansion tables, and compressed IMA
 * ADPCM via the standard's adaptive-step tables — a codec the JDK
 * itself cannot read; [[MediaCodec.decodeAudioSampled]] keeps the JDK
 * sound stack as the residual path, parity-pinned against the direct
 * parsers). Container METADATA is real across the web's AV stack:
 * MP4/ISO-BMFF ([[AvHeaders.parseMp4]] box walk), WebM/Matroska
 * ([[AvHeaders.parseWebm]] EBML varint walk), Ogg Opus/Vorbis
 * ([[AvHeaders.parseOgg]] including the 48 kHz granule clock), AIFF
 * ([[AvHeaders.parseAiff]] with the 80-bit extended sample rate) and
 * AU ([[AvHeaders.parseAu]]). FRAME iteration is real for animated GIF
 * ([[MediaCodec.decodeGifFrames]] — ImageIO's reader walks every
 * animation frame, so [[frameSample]] is a true keyframe sampler for
 * that container).
 * Only PERCEPTUAL-codec payloads (MP3/AAC/video bitstreams) fall back
 * to a clearly-marked deterministic byte-hash fake
 * ([[MediaCodec.byteHashFeature]] — no such codec libraries in this
 * environment); schema, batching and partitioning are identical on
 * all paths, so swapping in a real AV codec is a one-function change.
 *
 * Scale notes: media bytes never shuffle — features are extracted
 * map-side and only the (tiny) feature rows move. Partition sizing is
 * the caller's job via `spark.sql.files.maxPartitionBytes` (media rows
 * are large; keep partitions at a few hundred MB).
 */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, mime_type: String, media: Array[Byte])

  /** Parsed image header: format + pixel dimensions. */
  case class ImageMeta(format: String, width: Int, height: Int)

  /**
   * Real binary image-header parsing from magic bytes — no codec
   * dependency, just the public file-format structure:
   *  - PNG: 8-byte signature, then the IHDR chunk (required first by
   *    the spec) carries width/height as big-endian 32-bit ints.
   *  - JPEG: SOI marker, then a walk over FF-prefixed segments (each
   *    with a 2-byte big-endian length that includes itself) until a
   *    start-of-frame marker (SOF0/1/2/...); the frame header carries
   *    height then width as big-endian 16-bit ints.
   * Anything that doesn't parse — junk, truncation, a declared mime
   * lying about the bytes — is None, never an exception: at corpus
   * scale a crashing row is a lost partition, a None is a filter.
   */
  object ImageHeaders {
    private val PngSig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)

    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def be16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

    def imageMeta(bytes: Array[Byte]): Option[ImageMeta] = {
      if (bytes == null) None
      else if (isPng(bytes)) parsePng(bytes)
      else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
        parseJpeg(bytes)
      else None
    }

    private def isPng(b: Array[Byte]): Boolean =
      b.length >= 8 && PngSig.indices.forall(i => (b(i) & 0xff) == PngSig(i))

    private def parsePng(b: Array[Byte]): Option[ImageMeta] = {
      // signature(8) + chunk length(4) + "IHDR"(4) + width(4) + height(4)
      if (b.length < 24) return None
      val isIhdr = b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'
      if (!isIhdr) return None
      val w = be32(b, 16)
      val h = be32(b, 20)
      if (w > 0 && h > 0) Some(ImageMeta("png", w, h)) else None
    }

    /** Start-of-frame markers carrying dimensions: SOF0–SOF15 minus the
     * non-frame ones sharing the range (DHT C4, JPG C8, DAC CC). */
    private def isSof(marker: Int): Boolean =
      marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc

    private def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // lost sync: not a marker
        val marker = b(i + 1) & 0xff
        if (isSof(marker)) {
          // marker(2) + length(2) + precision(1) + height(2) + width(2)
          if (i + 8 >= b.length) return None
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          return if (w > 0 && h > 0) Some(ImageMeta("jpeg", w, h)) else None
        } else if (marker == 0xd9 || marker == 0xda) {
          return None // EOI / start-of-scan before any frame header
        } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
          i += 2 // standalone marker, no length field
        } else {
          val len = be16(b, i + 2)
          if (len < 2) return None
          i += 2 + len
        }
      }
      None
    }

    /** Parsed EXIF identity fields: orientation (tag 0x0112), original
     * capture DateTime (0x0132), camera Make (0x010F). */
    case class ExifMeta(orientation: Option[Int], dateTime: Option[String],
        make: Option[String])

    /** JPEG APP1/EXIF walk — the metadata an image pipeline reads
     * BEFORE any pixel decode: orientation (rotate-before-train),
     * capture time (snapshot/dedup logic), camera make (source
     * stratification). Segment walk to the APP1 carrying the
     * "Exif" + two NUL bytes header, then a TIFF IFD0 entry scan (both
     * byte orders): per TIFF 6.0, values ≤ 4 bytes sit inline in the
     * entry's value field, larger ones via a TIFF-relative offset,
     * SHORTs in the field's first two bytes. Total: anything
     * malformed yields None fields, never a throw. */
    private[ops] def exifMeta(b: Array[Byte]): ExifMeta = {
      val none = ExifMeta(None, None, None)
      if (b == null || b.length < 4 || (b(0) & 0xff) != 0xff ||
        (b(1) & 0xff) != 0xd8) return none
      // JPEG segment walk to APP1 + Exif header
      var i = 2
      var tiff = -1
      var tiffEnd = -1
      while (tiff < 0 && i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return none
        val marker = b(i + 1) & 0xff
        if (marker == 0xd9 || marker == 0xda) return none
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i += 2
        else {
          val len = be16(b, i + 2)
          if (len < 2) return none
          if (marker == 0xe1 && len >= 14 && i + 2 + len <= b.length &&
            b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
            b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0) {
            tiff = i + 10
            tiffEnd = i + 2 + len
          }
          i += 2 + len
        }
      }
      tiffMeta(b, tiff, tiffEnd)
    }

    /** PNG eXIf chunk (PNG extension, standardized 2017): the same
     * TIFF payload JPEG carries in APP1, as a chunk before IDAT.
     * Chunk walk with length/CRC framing; anything malformed yields
     * None fields. */
    private[ops] def pngExifMeta(b: Array[Byte]): ExifMeta = {
      val none = ExifMeta(None, None, None)
      if (b == null || b.length < 8 || (b(0) & 0xff) != 0x89 ||
        b(1) != 'P' || b(2) != 'N' || b(3) != 'G') return none
      var i = 8
      while (i + 8 <= b.length) {
        val len = be32(b, i)
        if (len < 0 || i + 12L + len > b.length) return none
        if (b(i + 4) == 'e' && b(i + 5) == 'X' && b(i + 6) == 'I' &&
          b(i + 7) == 'f')
          return tiffMeta(b, i + 8, i + 8 + len.toInt)
        if (b(i + 4) == 'I' && b(i + 5) == 'D' && b(i + 6) == 'A' &&
          b(i + 7) == 'T') return none // eXIf precedes image data
        i += 12 + len.toInt
      }
      none
    }

    /** WebP EXIF chunk (extended VP8X containers): a top-level RIFF
     * chunk with fourcc `EXIF` whose payload is the TIFF block —
     * written bare by libwebp, but some converters keep the JPEG
     * carrier's "Exif\0\0" prefix; both are accepted (libwebp's own
     * reader tolerates both). */
    private[ops] def webpExifMeta(b: Array[Byte]): ExifMeta = {
      val none = ExifMeta(None, None, None)
      if (b == null || b.length < 20 || b(0) != 'R' || b(1) != 'I' ||
        b(2) != 'F' || b(3) != 'F' || b(8) != 'W' || b(9) != 'E' ||
        b(10) != 'B' || b(11) != 'P') return none
      var p = 12
      while (p + 8 <= b.length) {
        val size = (b(p + 4) & 0xffL) | ((b(p + 5) & 0xffL) << 8) |
          ((b(p + 6) & 0xffL) << 16) | ((b(p + 7) & 0xffL) << 24)
        if (size < 0 || p + 8 + size > b.length) return none
        if (b(p) == 'E' && b(p + 1) == 'X' && b(p + 2) == 'I' && b(p + 3) == 'F') {
          val off = p + 8
          val end = off + size.toInt
          val tiff =
            if (size >= 6 && b(off) == 'E' && b(off + 1) == 'x' &&
              b(off + 2) == 'i' && b(off + 3) == 'f' && b(off + 4) == 0 &&
              b(off + 5) == 0) off + 6
            else off
          return tiffMeta(b, tiff, end)
        }
        p += 8 + size.toInt + (size.toInt & 1)
      }
      none
    }

    /** TIFF IFD0 scan over `b[tiff, tiffEnd)` — shared by the JPEG
     * APP1, PNG eXIf and WebP EXIF carriers. */
    private def tiffMeta(b: Array[Byte], tiff: Int, tiffEnd: Int): ExifMeta = {
      val none = ExifMeta(None, None, None)
      if (tiff < 0 || tiff + 8 > tiffEnd) return none
      val little =
        if (b(tiff) == 'I' && b(tiff + 1) == 'I') true
        else if (b(tiff) == 'M' && b(tiff + 1) == 'M') false
        else return none
      def u16(o: Int): Int =
        if (o < 0 || o + 2 > tiffEnd) -1
        else if (little) ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
        else be16(b, o)
      def u32(o: Int): Long =
        if (o < 0 || o + 4 > tiffEnd) -1L
        else if (little)
          ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
            ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
        else be32(b, o) & 0xffffffffL
      if (u16(tiff + 2) != 42) return none
      val ifd0 = u32(tiff + 4)
      if (ifd0 < 0 || ifd0 > Int.MaxValue / 2 ||
        tiff + ifd0 + 2 > tiffEnd) return none
      val base = (tiff + ifd0).toInt
      val n = u16(base)
      if (n < 0 || base + 2 + 12L * n > tiffEnd) return none
      var orient: Option[Int] = None
      var dt: Option[String] = None
      var make: Option[String] = None
      def ascii(vpos: Int, count: Int): Option[String] = {
        if (count <= 0 || count > 4096) return None
        val a = if (count <= 4) vpos else {
          val off = u32(vpos)
          if (off < 0 || off > Int.MaxValue / 2) return None
          tiff + off.toInt
        }
        if (a < tiff || a + count > tiffEnd) None
        else Some(new String(b, a, count - 1, "US-ASCII")) // strip NUL
      }
      var e = 0
      while (e < n) {
        val p = base + 2 + 12 * e
        val tag = u16(p)
        val typ = u16(p + 2)
        val count = u32(p + 4)
        tag match {
          case 0x0112 if typ == 3 && count == 1 =>
            val v = u16(p + 8)
            if (v >= 1 && v <= 8) orient = Some(v)
          case 0x0132 if typ == 2 => dt = ascii(p + 8, count.toInt)
          case 0x010f if typ == 2 => make = ascii(p + 8, count.toInt)
          case _ => ()
        }
        e += 1
      }
      ExifMeta(orient, dt, make)
    }
  }

  /**
   * Relational face of the header parser: one row per media row with
   * parsed (format, width, height) — NULLs where the bytes don't
   * parse. Partition-local (mapPartitions at the codec boundary, the
   * one place imperative byte-walking beats an Expression); media
   * bytes never leave their partition, only the fixed-shape metadata
   * comes out.
   */
  def imageMetaTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val m = ImageHeaders.imageMeta(r.media)
          (r.media_id, r.mime_type,
            if (r.media == null) 0L else r.media.length.toLong,
            m.map(_.format), m.map(_.width), m.map(_.height))
        }
      }
      .toDF("media_id", "mime_type", "n_bytes", "format", "width", "height")
  }

  /** Relational face of the EXIF walk ([[ImageHeaders.exifMeta]]):
   * one row per media row with orientation / capture DateTime /
   * camera make — NULLs where there is no EXIF. The pre-decode
   * metadata pass of an image corpus (rotate-before-train,
   * capture-time dedup, camera stratification); same partition-local
   * discipline as [[imageMetaTable]]. */
  def exifTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val m = ImageHeaders.exifMeta(r.media)
          (r.media_id, m.orientation, m.dateTime, m.make)
        }
      }
      .toDF("media_id", "orientation", "exif_datetime", "make")
  }

  /** Parsed audio/container header: format + whichever of the pixel /
   * PCM fields the container carries (None for the rest). */
  case class AvMeta(
      format: String,
      width: Option[Int] = None,
      height: Option[Int] = None,
      channels: Option[Int] = None,
      sampleRate: Option[Int] = None,
      bitsPerSample: Option[Int] = None,
      durationMs: Option[Long] = None)

  /**
   * Real audio/raster container-header parsing from magic bytes — the
   * audio companion to [[ImageHeaders]], same pure-public-format,
   * no-codec-library discipline:
   *  - WAV: RIFF signature + WAVE form type, then a WALK over the RIFF
   *    chunk list (4-byte id + LE32 length, word-aligned) for the
   *    `fmt ` chunk (PCM channels / sample rate / byte rate / bits)
   *    and the `data` chunk whose byte length over the byte rate gives
   *    the clip duration. Unknown chunks (LIST, fact, cue…) are
   *    skipped by length, exactly like JPEG's segment walk.
   *  - GIF: GIF87a/GIF89a signature, logical-screen width/height as
   *    LE16 at bytes 6/8.
   *  - BMP: "BM" + BITMAPINFOHEADER (header size ≥ 40) with SIGNED
   *    LE32 width/height at 18/22 — a negative height is a legal
   *    top-down BMP, reported as its magnitude.
   *  - MP4/ISO-BMFF: `ftyp` at offset 4, then a box walk into
   *    `moov/mvhd` (timescale + duration, version 0 and 1) and
   *    `moov/trak/tkhd` (16.16 fixed-point dimensions) —
   *    [[parseMp4]].
   *  - AIFF: FORM/AIFF IFF chunks, `COMM` with the 80-bit extended
   *    sample rate — [[parseAiff]].
   *  - AU/SND: ".snd" + five BE32 header words — [[parseAu]].
   * Anything that doesn't parse is None, never an exception (same
   * lost-partition argument as [[ImageHeaders.imageMeta]]).
   */
  object AvHeaders {
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], o: Int, t: String): Boolean =
      b.length >= o + 4 && b(o) == t(0).toByte && b(o + 1) == t(1).toByte &&
        b(o + 2) == t(2).toByte && b(o + 3) == t(3).toByte

    /** General-length magic compare — the one shared helper for the
     * container sniffers (the 4-char [[tag]] stays for hot walks). */
    private[ops] def magic(b: Array[Byte], o: Int, t: String): Boolean =
      b != null && b.length >= o + t.length &&
        t.indices.forall(i => b(o + i) == t.charAt(i).toByte)

    def avMeta(bytes: Array[Byte]): Option[AvMeta] = {
      if (bytes == null) None
      else if (tag(bytes, 0, "RIFF") && tag(bytes, 8, "WAVE")) parseWav(bytes)
      else if (tag(bytes, 0, "RIFF") && tag(bytes, 8, "AVI ")) parseAvi(bytes)
      else if (bytes.length >= 10 &&
        (tag(bytes, 0, "GIF8") && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'))
        parseGif(bytes)
      else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') parseBmp(bytes)
      else if (bytes.length >= 12 && tag(bytes, 4, "ftyp")) parseMp4(bytes)
      else if (tag(bytes, 0, "OggS")) parseOgg(bytes)
      else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x1a &&
        (bytes(1) & 0xff) == 0x45 && (bytes(2) & 0xff) == 0xdf &&
        (bytes(3) & 0xff) == 0xa3) parseWebm(bytes)
      else if (tag(bytes, 0, "FORM")) parseAiff(bytes)
      else if (bytes.length >= 4 && bytes(0) == '.' && bytes(1) == 's' &&
        bytes(2) == 'n' && bytes(3) == 'd') parseAu(bytes)
      else if (bytes.length >= 4 &&
        ((bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') ||
          ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xe0) == 0xe0))) {
        // magic-less bitstreams: both walks demand >= 2 valid frames;
        // ADTS first (its 0xFFF?+layer-00 sync is the stricter mask)
        val adts = parseAdts(bytes)
        if (adts.nonEmpty) adts else parseMp3(bytes)
      } else None
    }

    private def parseWav(b: Array[Byte]): Option[AvMeta] = {
      var i = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, byteRate, bits
      var dataLen: Option[Int] = None
      while (i + 8 <= b.length && (fmt.isEmpty || dataLen.isEmpty)) {
        val len = le32(b, i + 4)
        if (len < 0) return None // corrupt length: abort the walk
        if (tag(b, i, "fmt ") && len >= 16 && i + 8 + 16 <= b.length)
          fmt = Some((le16(b, i + 10), le32(b, i + 12), le32(b, i + 16), le16(b, i + 22)))
        else if (tag(b, i, "data"))
          dataLen = Some(len)
        // A chunk length near Int.MaxValue would wrap `i` negative and
        // index the array with a negative offset; a declared length that
        // overruns the buffer (other than a trailing `data` chunk we've
        // already recorded) means the container is corrupt — stop here.
        if (len > b.length - i - 8) {
          i = b.length // nothing beyond a truncated/oversized chunk is walkable
        } else {
          i += 8 + len + (len & 1) // RIFF chunks are word-aligned
        }
      }
      fmt.flatMap { case (ch, rate, byteRate, bits) =>
        if (ch <= 0 || rate <= 0 || byteRate <= 0) None
        else Some(AvMeta("wav", channels = Some(ch), sampleRate = Some(rate),
          bitsPerSample = Some(bits),
          durationMs = dataLen.map(n => n.toLong * 1000L / byteRate)))
      }
    }

    /** Sample payload locator for [[MediaCodec.decodeAudio]]: the same
     * RIFF walk as [[parseWav]], returning (audioFormat, channels,
     * bitsPerSample, dataOffset, dataLen) — for linear PCM
     * (audioFormat 1, 8/16-bit) and G.711 A-law/mu-law (formats 6/7,
     * 8-bit); None otherwise, never an exception. */
    private[ops] def wavSamples(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
      if (b == null || !(tag(b, 0, "RIFF") && tag(b, 8, "WAVE"))) return None
      var i = 12
      var fmt: Option[(Int, Int, Int)] = None // audioFormat, channels, bits
      var data: Option[(Int, Int)] = None     // offset, len
      while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
        val len = le32(b, i + 4)
        if (len < 0) return None
        if (tag(b, i, "fmt ") && len >= 16 && i + 8 + 16 <= b.length)
          fmt = Some((le16(b, i + 8), le16(b, i + 10), le16(b, i + 22)))
        else if (tag(b, i, "data"))
          data = Some((i + 8, len))
        if (len > b.length - i - 8) i = b.length // truncated/corrupt: stop
        else i += 8 + len + (len & 1)
      }
      for {
        (audioFormat, ch, bits) <- fmt
        if ch > 0 && (audioFormat match {
          case 1 => bits == 8 || bits == 16 || bits == 24 || bits == 32
          case 3 => bits == 32 // IEEE float
          case 6 | 7 => bits == 8 // G.711 A-law / mu-law
          case _ => false
        })
        (off, len) <- data
      } yield (audioFormat, ch, bits, off, len)
    }

    /** Signed normalized sample read for every (format, bits) pair
     * [[wavSamples]] admits — ONE reader shared by the feature
     * envelope and the fingerprint decode so the two paths can never
     * disagree on sign/width conventions. Float samples are clamped
     * to [−1, 1] and NaNs read as silence (hostile-input totality). */
    private[ops] def wavSampleAt(b: Array[Byte], fmt: Int, bits: Int, o: Int): Float =
      fmt match {
        case 1 if bits == 8 => ((b(o) & 0xff) - 128) / 128f
        case 1 if bits == 16 => ((b(o) & 0xff) | (b(o + 1) << 8)) / 32768f
        case 1 if bits == 24 =>
          ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) << 16)) / 8388608f
        case 1 => // 32-bit LE PCM
          ((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
            (b(o + 3) << 24)).toFloat / 2147483648f
        case 3 => // IEEE float32 LE
          val v = java.lang.Float.intBitsToFloat(
            (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
              (b(o + 3) << 24))
          if (v.isNaN) 0f else math.max(-1f, math.min(1f, v))
        case 6 => MediaCodec.AlawTable(b(o) & 0xff) / 32768f
        case _ => MediaCodec.UlawTable(b(o) & 0xff) / 32768f
      }

    /**
     * Audio clip windows for [[frameSample]] — the audio analogue of
     * the video paths' standalone frames: a PCM or G.711 WAV's data
     * payload is sliced into fixed `clipMs` windows aligned to whole
     * sample frames (channels × bytes-per-sample) and each window is
     * re-wrapped with a canonical 44-byte WAV header carrying the
     * source's format/channels/rate/bits — so every emitted clip is
     * itself a decodable media row ([[MediaCodec.decodeAudio]] reads
     * its real envelope), exactly like the GIF/AVI/MP4 paths'
     * standalone PNG/JPEG frames. A trailing partial window is kept
     * when it holds at least one whole frame. Nil for anything that
     * isn't a sliceable PCM/G.711 WAV — never an exception.
     */
    private[ops] def wavClips(b: Array[Byte], clipMs: Int): Seq[Array[Byte]] = {
      if (clipMs <= 0 || b == null ||
        !(tag(b, 0, "RIFF") && tag(b, 8, "WAVE"))) return Nil
      var i = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // format, ch, rate, bits
      var data: Option[(Int, Int)] = None
      while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
        val len = le32(b, i + 4)
        if (len < 0) return Nil
        if (tag(b, i, "fmt ") && len >= 16 && i + 8 + 16 <= b.length)
          fmt = Some((le16(b, i + 8), le16(b, i + 10), le32(b, i + 12), le16(b, i + 22)))
        else if (tag(b, i, "data"))
          data = Some((i + 8, len))
        if (len > b.length - i - 8) i = b.length
        else i += 8 + len + (len & 1)
      }
      (fmt, data) match {
        case (Some((format, ch, rate, bits)), Some((off, len0)))
          if ch > 0 && ch <= 64 && rate > 0 && (format match {
            case 1 => bits == 8 || bits == 16
            case 6 | 7 => bits == 8
            case _ => false
          }) =>
          val len = math.min(len0, b.length - off) // tolerate a short tail
          val frameBytes = ch * (bits / 8)
          val clipBytes = math.max(
            (rate.toLong * clipMs / 1000L).toInt, 1) * frameBytes
          if (len < frameBytes || clipBytes <= 0) return Nil
          def header(n: Int): Array[Byte] = {
            def w16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
            def w32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte,
              (v >>> 16).toByte, (v >>> 24).toByte)
            "RIFF".getBytes("US-ASCII") ++ w32(36 + n) ++
              "WAVE".getBytes("US-ASCII") ++
              "fmt ".getBytes("US-ASCII") ++ w32(16) ++
              w16(format) ++ w16(ch) ++ w32(rate) ++
              w32(rate * frameBytes) ++ w16(frameBytes) ++ w16(bits) ++
              "data".getBytes("US-ASCII") ++ w32(n)
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          var p = off
          val end = off + len - (len % frameBytes) // whole frames only
          while (p < end) {
            val n = math.min(clipBytes, end - p)
            out += header(n) ++ java.util.Arrays.copyOfRange(b, p, p + n)
            p += n
          }
          out.toSeq
        case _ => Nil
      }
    }

    /** IMA ADPCM payload locator for WAV format tag 17 with 4-bit
     * samples: (channels, blockAlign, dataOffset, dataLen). The block
     * alignment comes from the fmt chunk's own nBlockAlign field —
     * the block structure is the codec's frame unit. */
    private[ops] def wavAdpcm(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (b == null || !(tag(b, 0, "RIFF") && tag(b, 8, "WAVE"))) return None
      var i = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // format, ch, blockAlign, bits
      var data: Option[(Int, Int)] = None
      while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
        val len = le32(b, i + 4)
        if (len < 0) return None
        if (tag(b, i, "fmt ") && len >= 16 && i + 8 + 16 <= b.length)
          fmt = Some((le16(b, i + 8), le16(b, i + 10), le16(b, i + 20), le16(b, i + 22)))
        else if (tag(b, i, "data"))
          data = Some((i + 8, len))
        if (len > b.length - i - 8) i = b.length
        else i += 8 + len + (len & 1)
      }
      for {
        (format, ch, blockAlign, bits) <- fmt
        if format == 17 && bits == 4 && ch > 0 && ch <= 2 && blockAlign > 0
        (off, len) <- data
      } yield (ch, blockAlign, off, len)
    }

    /** PCM payload locator for AIFF and AIFF-C (round 20): COMM
     * (channels/bits, validated; for AIFC also the compressionType —
     * 'NONE'/'twos' = BE PCM, 'sowt' = LE PCM16 (the Mac-rip
     * corpus's little-endian type), 'fl32'/'FL32' = BE float32;
     * any other compression claims nothing) plus the SSND chunk —
     * samples start after SSND's 8-byte offset/blockSize header plus
     * its declared offset. Returns (channels, bits, sampleOffset,
     * byteLen, codec) with codec 0 = BE PCM, 1 = sowt, 2 = fl32. */
    private[ops] def aiffSamples(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
      if (b == null || !(tag(b, 0, "FORM") && b.length >= 12 &&
        (tag(b, 8, "AIFF") || tag(b, 8, "AIFC")))) return None
      val aifc = tag(b, 8, "AIFC")
      var i = 12
      var comm: Option[(Int, Int, Int)] = None // channels, bits, codec
      var ssnd: Option[(Int, Int)] = None // sample offset, byte len
      while (i + 8 <= b.length && (comm.isEmpty || ssnd.isEmpty)) {
        val len = be32(b, i + 4)
        if (len < 0 || len > b.length - i - 8) i = b.length // truncated: stop
        else {
          if (tag(b, i, "COMM") && len >= 18) {
            val codec: Option[Int] =
              if (!aifc) Some(0)
              else if (len < 22) None // AIFC COMM must carry the type
              else if (tag(b, i + 26, "NONE") || tag(b, i + 26, "twos")) Some(0)
              else if (tag(b, i + 26, "sowt")) Some(1)
              else if (tag(b, i + 26, "fl32") || tag(b, i + 26, "FL32")) Some(2)
              else None // compressed types this reader doesn't decode
            codec.foreach(cd => comm = Some((be16(b, i + 8), be16(b, i + 14), cd)))
          } else if (tag(b, i, "SSND") && len >= 8) {
            val off = be32(b, i + 8)
            if (off >= 0 && off <= len - 8)
              ssnd = Some((i + 16 + off.toInt, (len - 8 - off).toInt))
          }
          i += 8 + len.toInt + (len.toInt & 1)
        }
      }
      for {
        (ch, bits, cd) <- comm
        if ch > 0 && (cd match {
          case 1 => bits == 16 // sowt is defined for 16-bit PCM
          case 2 => bits == 32 // float32
          case _ => bits == 8 || bits == 16 || bits == 24 || bits == 32
        })
        (off, len) <- ssnd
      } yield (ch, bits, off, len, cd)
    }

    /** Signed normalized sample read for the (codec, width) pairs
     * [[aiffSamples]] admits (AIFF PCM8 is SIGNED, unlike WAV;
     * codec 1 = sowt little-endian 16-bit, codec 2 = BE float32).
     * Shared by the feature envelope and the fingerprint decode. */
    private[ops] def aiffSampleAt(b: Array[Byte], codec: Int, bits: Int, o: Int): Float =
      codec match {
        case 1 => ((b(o + 1) << 8) | (b(o) & 0xff)).toShort / 32768f
        case 2 => java.lang.Float.intBitsToFloat(
          (b(o) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) |
            (b(o + 3) & 0xff))
        case _ => bits match {
          case 8 => b(o) / 128f
          case 16 => ((b(o) << 8) | (b(o + 1) & 0xff)).toShort / 32768f
          case 24 =>
            ((b(o) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)) / 8388608f
          case _ =>
            ((b(o) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) |
              (b(o + 3) & 0xff)).toFloat / 2147483648f
        }
      }

    /** Bytes per sample and signed normalized BE read for the AU
     * encodings [[auSamples]] admits. */
    private[ops] def auBytesPer(enc: Int): Int =
      enc match { case 3 => 2; case 4 => 3; case 5 => 4; case _ => 1 }
    private[ops] def auSampleAt(b: Array[Byte], enc: Int, o: Int): Float =
      enc match {
        case 1 => MediaCodec.UlawTable(b(o) & 0xff) / 32768f
        case 2 => b(o) / 128f // AU PCM8 is signed
        case 3 => ((b(o) << 8) | (b(o + 1) & 0xff)).toShort / 32768f
        case 4 =>
          ((b(o) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)) / 8388608f
        case 5 =>
          ((b(o) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) |
            (b(o + 3) & 0xff)).toFloat / 2147483648f
        case _ => MediaCodec.AlawTable(b(o) & 0xff) / 32768f
      }

    /** Sample payload locator for AU: header fields are already the
     * locator — (encoding, channels, dataOffset, dataLen) for mu-law
     * (1), signed PCM8 (2), PCM16 BE (3) and A-law (27). */
    private[ops] def auSamples(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (b == null || b.length < 24 ||
        !(b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd')) return None
      val off = be32(b, 4)
      val size = be32(b, 8)
      val enc = be32(b, 12).toInt
      val ch = be32(b, 20)
      if (off < 24 || off >= b.length || ch <= 0 || ch > 64) None
      else if (enc != 1 && enc != 2 && enc != 3 && enc != 4 && enc != 5 &&
        enc != 27) None
      else {
        val avail = b.length - off
        val len = if (size >= 0 && size < avail) size else avail
        Some((enc, ch.toInt, off.toInt, len.toInt))
      }
    }

    private def parseGif(b: Array[Byte]): Option[AvMeta] = {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w > 0 && h > 0) Some(AvMeta("gif", width = Some(w), height = Some(h)))
      else None
    }

    private def be16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

    /**
     * ISO-BMFF (MP4/MOV) box walk — the video-container companion to
     * the RIFF chunk walk, pure public format structure (ISO/IEC
     * 14496-12): each box is a BE32 size + 4-char type; `size == 1`
     * means a 64-bit largesize follows, `size == 0` means
     * to-end-of-buffer. The file is recognised by an `ftyp` box at
     * offset 4 (how every sniffer detects BMFF). Fields come from
     * `moov`: `mvhd` (version 0 or 1) carries timescale + duration,
     * the first `trak/tkhd` with nonzero dimensions carries
     * width/height as 16.16 fixed-point (integer part reported).
     * A recognised `ftyp` with an unwalkable/absent `moov` still
     * reports format "mp4" with NULL fields — the container identity
     * is byte-proven even when the index is truncated away (common:
     * moov-at-end files cut mid-transfer).
     */
    private[ops] def parseMp4(b: Array[Byte]): Option[AvMeta] = {
      if (b.length < 12 || !tag(b, 4, "ftyp")) return None
      var ts: Option[Long] = None
      var dur: Option[Long] = None
      var dims: Option[(Int, Int)] = None
      // (start, end) of each box's PAYLOAD; None on malformed headers
      def walk(from: Int, to: Int)(f: (String, Int, Int) => Unit): Unit = {
        var i = from
        while (i + 8 <= to) {
          val size = be32(b, i)
          val tpe = new String(b, i + 4, 4, "US-ASCII")
          val (payload, end): (Int, Long) =
            if (size == 0) (i + 8, to.toLong) // to end of enclosing box
            else if (size == 1) {
              if (i + 16 > to) return
              val hi = be32(b, i + 8); val lo = be32(b, i + 12)
              if (hi != 0) return // >2 GiB box in a byte-array payload: corrupt
              (i + 16, i + lo)
            } else (i + 8, i + size)
          if (end < payload || end > to) return // overruns the buffer: stop
          f(tpe, payload, end.toInt)
          if (end.toInt <= i) return // zero-progress guard
          i = end.toInt
        }
      }
      walk(0, b.length) { (tpe, p, e) =>
        if (tpe == "moov") {
          walk(p, e) { (t2, p2, e2) =>
            if (t2 == "mvhd" && p2 + 4 <= e2) {
              val version = b(p2) & 0xff
              if (version == 0 && p2 + 20 <= e2) {
                ts = Some(be32(b, p2 + 12)); dur = Some(be32(b, p2 + 16))
              } else if (version == 1 && p2 + 32 <= e2) {
                // creation/modification are 8 bytes each in v1;
                // duration is BE64 — take it whole (fits a Long)
                ts = Some(be32(b, p2 + 20))
                dur = Some((be32(b, p2 + 24) << 32) | be32(b, p2 + 28))
              }
            } else if (t2 == "trak" && dims.isEmpty) {
              walk(p2, e2) { (t3, p3, e3) =>
                if (t3 == "tkhd" && p3 + 4 <= e3) {
                  val off = if ((b(p3) & 0xff) == 1) 88 else 76
                  if (p3 + off + 8 <= e3) {
                    // 16.16 fixed-point: integer part is the high 16 bits
                    val w = be16(b, p3 + off)
                    val h = be16(b, p3 + off + 4)
                    if (w > 0 && h > 0) dims = Some((w, h))
                  }
                }
              }
            }
          }
        }
      }
      Some(AvMeta("mp4",
        width = dims.map(_._1), height = dims.map(_._2),
        // d >= 0 rejects a crafted v1 BE64 with the top bit set (the
        // hi<<32|lo assembly would go negative); the all-ones values
        // are the spec's "duration unknown" sentinels in v0 and v1
        durationMs = for {
          t <- ts; d <- dur
          if t > 0 && d >= 0 && d != 0xFFFFFFFFL
        } yield d * 1000L / t))
    }

    /**
     * AIFF header parse (FORM/AIFF IFF structure — big-endian, chunk
     * id + BE32 length, word-aligned like RIFF): the `COMM` chunk
     * carries channels (BE16), frame count (BE32), sample bits (BE16)
     * and the sample rate as an 80-bit IEEE extended float (the one
     * place the format shows its Motorola heritage). Duration =
     * frames / rate.
     */
    private[ops] def parseAiff(b: Array[Byte]): Option[AvMeta] = {
      if (!(tag(b, 0, "FORM") && b.length >= 12 &&
        (tag(b, 8, "AIFF") || tag(b, 8, "AIFC")))) return None
      var i = 12
      while (i + 8 <= b.length) {
        val len = be32(b, i + 4)
        if (len < 0 || len > b.length - i - 8) return None // truncated: stop
        if (tag(b, i, "COMM") && len >= 18) {
          val ch = be16(b, i + 8)
          val frames = be32(b, i + 10)
          val bits = be16(b, i + 14)
          val rate = extended80(b, i + 16)
          return if (ch > 0 && rate > 0)
            Some(AvMeta("aiff", channels = Some(ch), sampleRate = Some(rate.round.toInt),
              bitsPerSample = Some(bits),
              durationMs = Some((frames * 1000L / rate).round)))
          else None
        }
        i += 8 + len.toInt + (len.toInt & 1)
      }
      None
    }

    /** 80-bit IEEE 754 extended float (AIFF sample rate): 1 sign +
     * 15 exponent (bias 16383) + 64 explicit-integer-bit mantissa. */
    private def extended80(b: Array[Byte], o: Int): Double = {
      if (o + 10 > b.length) return 0.0
      val sign = if ((b(o) & 0x80) != 0) -1.0 else 1.0
      val exp = ((b(o) & 0x7f) << 8) | (b(o + 1) & 0xff)
      var mant = 0.0
      var i = 0
      while (i < 8) { mant = mant * 256.0 + (b(o + 2 + i) & 0xff); i += 1 }
      if (exp == 0 && mant == 0.0) 0.0
      else sign * mant * math.pow(2.0, exp - 16383 - 63)
    }

    /**
     * Ogg container parse (Opus and Vorbis — the open web-audio
     * stack): the first page's packet identifies the codec
     * ("OpusHead" → channels at packet byte 9, pre-skip LE16 at 10,
     * input rate LE32 at 12; 0x01"vorbis" → channels at 11, rate LE32
     * at 12), and the LAST page's granule position (LE64 at page
     * byte 6) gives the duration — Opus granules tick at 48 kHz
     * regardless of input rate, minus the pre-skip; Vorbis granules
     * tick at the stream rate. The backward scan for the final "OggS"
     * capture pattern is how every player seeks without an index.
     */
    private[ops] def parseOgg(b: Array[Byte]): Option[AvMeta] = {
      if (b.length < 28 || !tag(b, 0, "OggS")) return None
      val nSegs = b(26) & 0xff
      val p = 27 + nSegs // first packet start
      if (p >= b.length) return Some(AvMeta("ogg"))
      def lastGranule(): Option[Long] = {
        // Ogg does NOT escape "OggS" inside packet payloads (real
        // demuxers CRC-check candidate pages when seeking), so a raw
        // magic hit must pass the cheap header sanity checks — version
        // byte 0, only the three defined header-type flag bits, segment
        // table in bounds — before its granule is trusted; on mismatch
        // (or granule -1 = "no packet ends on this page") keep
        // scanning backward to the previous candidate.
        var i = b.length - 27 // minimum full header: 27 bytes
        while (i >= 0) {
          if (tag(b, i, "OggS") &&
            (b(i + 4) & 0xff) == 0 && // stream structure version
            (b(i + 5) & 0xf8) == 0 && // flags: only 0x01/0x02/0x04 defined
            i + 27 + (b(i + 26) & 0xff) <= b.length) { // segment table fits
            var g = 0L
            var k = 7
            while (k >= 0) { g = (g << 8) | (b(i + 6 + k) & 0xffL); k -= 1 }
            if (g >= 0) return Some(g)
          }
          i -= 1
        }
        None
      }
      if (b.length >= p + 19 && tag(b, p, "Opus") && tag(b, p + 4, "Head")) {
        val ch = b(p + 9) & 0xff
        val preSkip = le16(b, p + 10)
        val rate = le32(b, p + 12)
        if (ch <= 0) return Some(AvMeta("ogg"))
        Some(AvMeta("opus", channels = Some(ch),
          sampleRate = if (rate > 0) Some(rate) else None,
          durationMs = lastGranule().collect {
            case g if g > preSkip => (g - preSkip) * 1000L / 48000L
          }))
      } else if (b.length >= p + 16 && (b(p) & 0xff) == 0x01 &&
        tag(b, p + 1, "vorb") && b(p + 5) == 'i' && b(p + 6) == 's') {
        val ch = b(p + 11) & 0xff
        val rate = le32(b, p + 12)
        if (ch <= 0 || rate <= 0) return Some(AvMeta("ogg"))
        Some(AvMeta("vorbis", channels = Some(ch), sampleRate = Some(rate),
          durationMs = lastGranule().map(g => g * 1000L / rate)))
      } else Some(AvMeta("ogg")) // a real Ogg page, unrecognised codec
    }

    /** The stream's granule clock: (ticks per second, pre-skip ticks)
     * from the BOS page's identification packet — Opus granules tick
     * at 48 kHz regardless of input rate and start `pre-skip` ticks
     * early; Vorbis granules tick at the stream rate. None for
     * unrecognised codecs: a granule without a clock is not a time. */
    private[ops] def oggGranuleClock(b: Array[Byte]): Option[(Long, Long)] = {
      if (b == null || b.length < 28 || !tag(b, 0, "OggS")) return None
      val p = 27 + (b(26) & 0xff)
      if (b.length >= p + 19 && tag(b, p, "Opus") && tag(b, p + 4, "Head"))
        Some((48000L, le16(b, p + 10).toLong))
      else if (b.length >= p + 16 && (b(p) & 0xff) == 0x01 &&
        tag(b, p + 1, "vorb") && b(p + 5) == 'i' && b(p + 6) == 's' &&
        le32(b, p + 12) > 0)
        Some((le32(b, p + 12).toLong, 0L))
      else None
    }

    // MPEG-1/2/2.5 Layer III header tables (public spec constants)
    private val Mp3KbpsV1 =
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
    private val Mp3KbpsV2 =
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
    private val Mp3Rates = Map(
      3 -> Array(44100, 48000, 32000), // MPEG1
      2 -> Array(22050, 24000, 16000), // MPEG2
      0 -> Array(11025, 12000, 8000)) // MPEG2.5

    /** Shard-unit locator for MP3 (MPEG Layer III) streams: one
     * (offset, size) per audio FRAME — sync word + version/bitrate/
     * samplerate/padding fields give every frame's byte length by the
     * published formula (144000·kbps/rate + pad for MPEG1, half for
     * MPEG2/2.5), so the bitstream walks frame to frame without any
     * decode: frame boundaries are where a real decoder can start,
     * and frame count × samples-per-frame is the duration clock. An
     * ID3v2 tag (syncsafe size) is skipped; the walk stops at the
     * first non-frame byte (junk, truncation, a trailing ID3v1 tag).
     * Layer I/II and free-format frames are out of scope — the walk
     * stops rather than guessing their lengths. */
    /** Bytes to skip for a leading ID3v2 tag: 10-byte header +
     * syncsafe size + (ID3v2.4 only) 10 more when the footer flag
     * (header byte 5, bit 0x10) is set — the size field does NOT
     * count the footer, so ignoring it lands the walk on the '3DI'
     * footer bytes and a valid file yields zero frames. */
    private def id3v2Skip(b: Array[Byte]): Int =
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
          ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
        10 + sz + (if ((b(5) & 0x10) != 0) 10 else 0)
      } else 0

    private[ops] def mp3Frames(b: Array[Byte]): Seq[(Int, Int)] = {
      if (b == null || b.length < 4) return Nil
      var i = id3v2Skip(b)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      while (i + 4 <= b.length) {
        if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) return out.toSeq
        val ver = (b(i + 1) >> 3) & 0x3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        val layer = (b(i + 1) >> 1) & 0x3 // 1=Layer III
        val brIdx = (b(i + 2) >> 4) & 0xf
        val srIdx = (b(i + 2) >> 2) & 0x3
        val pad = (b(i + 2) >> 1) & 0x1
        if (ver == 1 || layer != 1 || brIdx == 0 || brIdx == 15 || srIdx == 3)
          return out.toSeq
        val kbps = if (ver == 3) Mp3KbpsV1(brIdx) else Mp3KbpsV2(brIdx)
        val sr = Mp3Rates(ver)(srIdx)
        val size = (if (ver == 3) 144000 else 72000) * kbps / sr + pad
        if (size < 4 || i + size > b.length) return out.toSeq
        out += ((i, size))
        i += size
      }
      out.toSeq
    }

    /** MP3 metadata from the frame walk: channels from the first
     * frame's mode field, sample rate from its header, duration from
     * the summed per-frame sample clocks (1152 samples/frame MPEG1
     * Layer III, 576 for MPEG2/2.5). Requires ≥ 2 valid consecutive
     * frames (or would misidentify random 0xFF-led bytes). */
    private[ops] def parseMp3(b: Array[Byte]): Option[AvMeta] = {
      val frames = mp3Frames(b)
      if (frames.size < 2) return None
      val h = frames.head._1
      val ver = (b(h + 1) >> 3) & 0x3
      val srIdx = (b(h + 2) >> 2) & 0x3
      val sr = Mp3Rates(ver)(srIdx)
      val mode = (b(h + 3) >> 6) & 0x3 // 3 = mono
      val spf = if (ver == 3) 1152L else 576L
      Some(AvMeta("mp3",
        channels = Some(if (mode == 3) 1 else 2),
        sampleRate = Some(sr),
        durationMs = Some(frames.size * spf * 1000L / sr)))
    }

    private val AdtsRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
      24000, 22050, 16000, 12000, 11025, 8000, 7350)

    /** Shard-unit locator for AAC/ADTS streams: one (offset, size) per
     * ADTS frame — even simpler than MP3, the header CARRIES the
     * 13-bit frame length explicitly (bits spanning header bytes
     * 3–5), so the walk is syncword check + length hop. An ID3v2 tag
     * is skipped; the walk stops at the first non-frame byte. */
    private[ops] def adtsFrames(b: Array[Byte]): Seq[(Int, Int)] = {
      if (b == null || b.length < 7) return Nil
      var i = id3v2Skip(b)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      while (i + 7 <= b.length) {
        // 12-bit syncword + layer '00' (bits 1-2 of byte 1)
        if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xf6) != 0xf0) return out.toSeq
        val sfIdx = (b(i + 2) >> 2) & 0xf
        if (sfIdx >= AdtsRates.length) return out.toSeq
        val len = ((b(i + 3) & 0x3) << 11) | ((b(i + 4) & 0xff) << 3) |
          ((b(i + 5) & 0xff) >> 5)
        if (len < 7 || i + len > b.length) return out.toSeq
        out += ((i, len))
        i += len
      }
      out.toSeq
    }

    /** AAC/ADTS metadata from the frame walk: channels from the
     * channel configuration, rate from the sampling-frequency index,
     * duration from 1024 samples per raw data block. Requires ≥ 2
     * valid consecutive frames (magic-less format). */
    private[ops] def parseAdts(b: Array[Byte]): Option[AvMeta] = {
      val frames = adtsFrames(b)
      if (frames.size < 2) return None
      val h = frames.head._1
      val sfIdx = (b(h + 2) >> 2) & 0xf
      val chanCfg = ((b(h + 2) & 0x1) << 2) | ((b(h + 3) >> 6) & 0x3)
      val sr = AdtsRates(sfIdx)
      // raw blocks per frame: low 2 bits of header byte 6, plus one
      val blocks = frames.map { case (off, _) => (b(off + 6) & 0x3) + 1L }.sum
      Some(AvMeta("aac",
        channels = if (chanCfg > 0) Some(chanCfg) else None,
        sampleRate = Some(sr),
        durationMs = Some(blocks * 1024L * 1000L / sr)))
    }

    /** Shard-unit locator for Ogg containers: one row per PAGE —
     * (page_seq, offset, size, granule_pos, header_type). Pages are
     * the smallest independently-seekable unit of an Ogg stream (each
     * carries its own capture pattern, granule clock position and
     * CRC): an audio corpus shards on page boundaries the way a video
     * corpus shards on keyframes, and the granule positions give the
     * time axis with no codec involved. Forward walk with the same
     * header sanity checks as [[parseOgg]]'s backward seek (version 0,
     * only defined flag bits, segment table and body in bounds); a
     * malformed or truncated page stops the walk at what parsed. */
    private[ops] def oggPages(b: Array[Byte]): Seq[(Int, Int, Int, Long, Int)] = {
      if (b == null || b.length < 27 || !tag(b, 0, "OggS")) return Nil
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long, Int)]
      var i = 0
      while (i + 27 <= b.length && tag(b, i, "OggS") &&
        (b(i + 4) & 0xff) == 0 && (b(i + 5) & 0xf8) == 0) {
        val nSegs = b(i + 26) & 0xff
        if (i + 27 + nSegs > b.length) return out.toSeq
        var body = 0
        var s = 0
        while (s < nSegs) { body += b(i + 27 + s) & 0xff; s += 1 }
        val size = 27 + nSegs + body
        if (i + size > b.length) return out.toSeq
        var g = 0L
        var k = 7
        while (k >= 0) { g = (g << 8) | (b(i + 6 + k) & 0xffL); k -= 1 }
        out += ((le32(b, i + 18), i, size, g, b(i + 5) & 0xff))
        i += size
      }
      out.toSeq
    }

    /**
     * WebM/Matroska parse — an EBML walk (the container's entire
     * structure is nested (varint id, varint size, payload) elements,
     * public spec): `Segment/Info` carries TimestampScale (ns per
     * timestamp tick, default 1e6) and a float Duration in ticks;
     * `Segment/Tracks/TrackEntry/Video` carries PixelWidth/Height,
     * `.../Audio` SamplingFrequency and Channels. Element IDs keep
     * their length-marker bits (per spec); sizes strip them; an
     * all-ones size means unknown/streaming extent (clamped to the
     * buffer). Truncated elements stop the walk with whatever was
     * found — same tolerance discipline as the RIFF/BMFF walks.
     */
    /** EBML varint at `i`: leading zero bits of the first byte give
     * the length (1..8); `keepMarker` keeps the length-marker bit
     * (element IDs) or strips it (sizes). ONE implementation for
     * every Matroska walk in this object. */
    private[ops] def ebmlVint(b: Array[Byte], i: Int,
        keepMarker: Boolean): Option[(Long, Int)] = {
      if (i >= b.length) return None
      val first = b(i) & 0xff
      if (first == 0) return None
      val len = Integer.numberOfLeadingZeros(first) - 23 // 1..8
      if (len > 8 || i + len > b.length) return None
      var v = if (keepMarker) first.toLong else (first & (0xff >>> len)).toLong
      var k = 1
      while (k < len) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
      Some((v, len))
    }

    /** EBML element iteration over [from, to): calls `f` with
     * (id, payloadStart, payloadEnd); unknown-size elements run to
     * the enclosing end, malformed headers stop the walk (the same
     * totality discipline as every walker here). */
    private[ops] def ebmlWalk(b: Array[Byte], from: Int, to: Int)(
        f: (Long, Int, Int) => Unit): Unit = {
      var i = from
      while (i < to) {
        val id = ebmlVint(b, i, keepMarker = true) match {
          case Some(x) => x; case None => return
        }
        val sz = ebmlVint(b, i + id._2, keepMarker = false) match {
          case Some(x) => x; case None => return
        }
        val p = i + id._2 + sz._2
        val unknown = sz._1 == (1L << (7 * sz._2)) - 1
        val end = if (unknown) to.toLong else math.min(to.toLong, p.toLong + sz._1)
        if (end < p) return
        f(id._1, p, end.toInt)
        if (end.toInt <= i) return
        i = end.toInt
      }
    }

    private[ops] def parseWebm(b: Array[Byte]): Option[AvMeta] = {
      if (b.length < 4 || (b(0) & 0xff) != 0x1a || (b(1) & 0xff) != 0x45 ||
        (b(2) & 0xff) != 0xdf || (b(3) & 0xff) != 0xa3) return None
      def vint(i: Int, keepMarker: Boolean): Option[(Long, Int)] =
        ebmlVint(b, i, keepMarker)
      var ts: Long = 1000000L // TimestampScale default: 1e6 ns
      var durTicks: Option[Double] = None
      var width: Option[Int] = None
      var height: Option[Int] = None
      var chans: Option[Int] = None
      var rate: Option[Int] = None
      def beFloat(i: Int, len: Int): Option[Double] = len match {
        case 4 if i + 4 <= b.length =>
          Some(java.lang.Float.intBitsToFloat(
            ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
              ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)).toDouble)
        case 8 if i + 8 <= b.length =>
          var v = 0L
          var k = 0
          while (k < 8) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
          Some(java.lang.Double.longBitsToDouble(v))
        case _ => None
      }
      def beUint(i: Int, len: Int): Long = {
        var v = 0L
        var k = 0
        while (k < len && i + k < b.length) { v = (v << 8) | (b(i + k) & 0xffL); k += 1 }
        v
      }
      def walk(from: Int, to: Int, depth: Int): Unit = {
        if (depth > 8) return
        var i = from
        while (i < to) {
          val id = vint(i, keepMarker = true) match {
            case Some(x) => x
            case None => return
          }
          val sz = vint(i + id._2, keepMarker = false) match {
            case Some(x) => x
            case None => return
          }
          val p = i + id._2 + sz._2
          // all-ones size = unknown extent: clamp to the enclosing end
          val unknown = sz._1 == (1L << (7 * sz._2)) - 1
          val end = if (unknown) to.toLong
            else math.min(to.toLong, p.toLong + sz._1)
          if (end < p) return
          id._1 match {
            case 0x18538067L | 0x1549a966L | 0x1654ae6bL | 0xaeL | 0xe0L | 0xe1L =>
              walk(p, end.toInt, depth + 1) // Segment/Info/Tracks/TrackEntry/Video/Audio
            case 0x2ad7b1L => ts = beUint(p, (end - p).toInt)
            case 0x4489L => durTicks = beFloat(p, (end - p).toInt)
            case 0xb0L if width.isEmpty =>
              val w = beUint(p, (end - p).toInt).toInt
              if (w > 0) width = Some(w)
            case 0xbaL if height.isEmpty =>
              val h = beUint(p, (end - p).toInt).toInt
              if (h > 0) height = Some(h)
            case 0x9fL if chans.isEmpty =>
              val ch = beUint(p, (end - p).toInt).toInt
              if (ch > 0) chans = Some(ch)
            case 0xb5L if rate.isEmpty =>
              beFloat(p, (end - p).toInt).foreach(r => if (r > 0) rate = Some(r.round.toInt))
            case _ => () // skip leaves we don't read
          }
          if (end.toInt <= i) return // zero-progress guard
          i = end.toInt
        }
      }
      walk(0, b.length, 0)
      Some(AvMeta("webm",
        width = width, height = height, channels = chans, sampleRate = rate,
        durationMs = for { d <- durTicks; if d > 0 && ts > 0 }
          yield (d * ts / 1e6).round))
    }

    /** Segment/Info TimestampScale in ns per tick (default 1e6 = 1 ms
     * ticks) — the clock that converts SimpleBlock ticks to wall
     * time. Self-contained EBML walk with the same varint/tolerance
     * discipline as [[parseWebm]]. */
    private[ops] def webmTimestampScale(b: Array[Byte]): Long = {
      if (b == null || b.length < 4 || (b(0) & 0xff) != 0x1a ||
        (b(1) & 0xff) != 0x45 || (b(2) & 0xff) != 0xdf ||
        (b(3) & 0xff) != 0xa3) return 1000000L
      def vint(i: Int, keepMarker: Boolean): Option[(Long, Int)] =
        ebmlVint(b, i, keepMarker)
      var ts = 1000000L
      def walk(from: Int, to: Int, depth: Int): Unit = {
        if (depth > 4) return
        var i = from
        while (i < to) {
          val id = vint(i, keepMarker = true).getOrElse(return)
          val sz = vint(i + id._2, keepMarker = false).getOrElse(return)
          val p = i + id._2 + sz._2
          val unknown = sz._1 == (1L << (7 * sz._2)) - 1
          val end = if (unknown) to.toLong else math.min(to.toLong, p.toLong + sz._1)
          if (end < p) return
          id._1 match {
            case 0x18538067L | 0x1549a966L => walk(p, end.toInt, depth + 1)
            case 0x2ad7b1L =>
              var v = 0L
              var k = 0
              while (k < (end - p).toInt && p + k < b.length) {
                v = (v << 8) | (b(p + k) & 0xffL); k += 1
              }
              if (v > 0) ts = v
            case _ => ()
          }
          if (end.toInt <= i) return
          i = end.toInt
        }
      }
      walk(0, b.length, 0)
      ts
    }

    /** Shard-unit locator for WebM/Matroska: one row per SimpleBlock —
     * (block_idx 1-based in file order, track number, cluster
     * timestamp + block-relative timestamp in ticks, frame-data
     * offset, frame-data size, is_key). Clusters are the container's
     * seekable unit and bit 0x80 of the SimpleBlock header marks
     * where decode can start — the WebM analogue of the MP4
     * stss/moof walks, no codec involved. Lacing (header flags &
     * 0x06) is not expanded: a laced block is one row covering the
     * whole laced payload. Same tolerance discipline as every walker
     * here: malformed structure yields what parsed, never a throw. */
    private[ops] def webmBlocks(b: Array[Byte]): Seq[(Long, Long, Long, Int, Int, Boolean)] = {
      if (b == null || b.length < 4 || (b(0) & 0xff) != 0x1a ||
        (b(1) & 0xff) != 0x45 || (b(2) & 0xff) != 0xdf ||
        (b(3) & 0xff) != 0xa3) return Nil
      def vint(i: Int, keepMarker: Boolean): Option[(Long, Int)] =
        ebmlVint(b, i, keepMarker)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Int, Int, Boolean)]
      var blockIdx = 0L
      def walk(from: Int, to: Int)(f: (Long, Int, Int) => Unit): Unit =
        ebmlWalk(b, from, to)(f)
      walk(0, b.length) { (id0, p0, e0) =>
        if (id0 == 0x18538067L) walk(p0, e0) { (id1, p1, e1) => // Segment
          if (id1 == 0x1f43b675L) { // Cluster
            var clusterTs = 0L
            walk(p1, e1) { (id2, p2, e2) =>
              if (id2 == 0xe7L) { // cluster Timestamp, BE uint
                var v = 0L
                var j = p2
                while (j < e2) { v = (v << 8) | (b(j) & 0xffL); j += 1 }
                clusterTs = v
              } else if (id2 == 0xa3L) { // SimpleBlock
                vint(p2, keepMarker = false).foreach { case (track, tLen) =>
                  val hp = p2 + tLen
                  if (hp + 3 <= e2) {
                    val rel = ((b(hp) << 8) | (b(hp + 1) & 0xff)).toShort.toLong
                    val flags = b(hp + 2) & 0xff
                    blockIdx += 1
                    out += ((blockIdx, track, clusterTs + rel, hp + 3,
                      e2 - (hp + 3), (flags & 0x80) != 0))
                  }
                }
              }
            }
          }
        }
      }
      out.toSeq
    }

    /** VIDEO track numbers of a WebM/Matroska file: TrackEntries
     * whose TrackType (0x83) is 1 or that carry a Video element
     * (0xE0); TrackNumber (0xD7) when present, else the entry's
     * 1-based ordinal (the Matroska default numbering). Feeds the
     * payload-digest re-mux path, which must not digest audio
     * tracks. */
    private[ops] def webmVideoTracks(b: Array[Byte]): Set[Long] = {
      if (b == null || b.length < 4 || (b(0) & 0xff) != 0x1a ||
        (b(1) & 0xff) != 0x45 || (b(2) & 0xff) != 0xdf ||
        (b(3) & 0xff) != 0xa3) return Set.empty
      val out = scala.collection.mutable.Set.empty[Long]
      ebmlWalk(b, 0, b.length) { (id0, p0, e0) =>
        if (id0 == 0x18538067L) ebmlWalk(b, p0, e0) { (id1, p1, e1) => // Segment
          if (id1 == 0x1654ae6bL) out ++= tracksVideoNumbers(b, p1, e1)
        }
      }
      out.toSet
    }

    /** Video track numbers from ONE Tracks element's payload. */
    private def tracksVideoNumbers(b: Array[Byte], from: Int, to: Int): Set[Long] = {
      def beUint(p: Int, e: Int): Long = {
        var v = 0L
        var j = p
        while (j < e) { v = (v << 8) | (b(j) & 0xffL); j += 1 }
        v
      }
      val out = scala.collection.mutable.Set.empty[Long]
      var ordinal = 0L
      ebmlWalk(b, from, to) { (id2, p2, e2) =>
        if (id2 == 0xaeL) { // TrackEntry
          ordinal += 1
          var num = -1L
          var isVideo = false
          ebmlWalk(b, p2, e2) { (id3, p3, e3) =>
            if (id3 == 0xd7L) num = beUint(p3, e3) // TrackNumber
            else if (id3 == 0x83L) isVideo ||= beUint(p3, e3) == 1L
            else if (id3 == 0xe0L) isVideo = true // Video element
          }
          if (isVideo) out += (if (num > 0) num else ordinal)
        }
      }
      out.toSet
    }

    /** ONE-pass video-payload span walk (the q_m38 payload-digest
     * source): candidate spans are collected with their track number
     * and filtered against the video-track set at the END of the
     * walk, so a (legal, if unusual) Tracks-after-Cluster layout
     * still yields its spans. Both SimpleBlock and BlockGroup/Block
     * framings are read; LACED blocks are skipped explicitly — their
     * payload starts with lace-size headers, so the raw span is NOT
     * the codec payload and digesting it would only manufacture
     * false non-matches (the q_m41 honesty face counts the skip). */
    private[ops] def webmVideoBlockSpans(b: Array[Byte]): Seq[(Int, Int)] = {
      val vts = webmVideoTracksOnePass(b)
      if (vts._1.isEmpty) Nil else vts._2
    }

    private def webmVideoTracksOnePass(
        b: Array[Byte]): (Set[Long], Seq[(Int, Int)]) = {
      if (b == null || b.length < 4 || (b(0) & 0xff) != 0x1a ||
        (b(1) & 0xff) != 0x45 || (b(2) & 0xff) != 0xdf ||
        (b(3) & 0xff) != 0xa3) return (Set.empty, Nil)
      var tracks = Set.empty[Long]
      val cand = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
      // [track vint][2-byte ts][flags][data]: same prefix for
      // SimpleBlock and Block; flags bits 0x06 = lacing in use
      def blockSpan(p: Int, e: Int): Unit =
        ebmlVint(b, p, keepMarker = false).foreach { case (track, tLen) =>
          val hp = p + tLen
          if (hp + 3 <= e && (b(hp + 2) & 0x06) == 0)
            cand += ((track, hp + 3, e - (hp + 3)))
        }
      ebmlWalk(b, 0, b.length) { (id0, p0, e0) =>
        if (id0 == 0x18538067L) ebmlWalk(b, p0, e0) { (id1, p1, e1) => // Segment
          if (id1 == 0x1654ae6bL) tracks ++= tracksVideoNumbers(b, p1, e1)
          else if (id1 == 0x1f43b675L) ebmlWalk(b, p1, e1) { (id2, p2, e2) => // Cluster
            if (id2 == 0xa3L) blockSpan(p2, e2) // SimpleBlock
            else if (id2 == 0xa0L) ebmlWalk(b, p2, e2) { (id3, p3, e3) =>
              if (id3 == 0xa1L) blockSpan(p3, e3) // Block in BlockGroup
            }
          }
        }
      }
      (tracks, cand.collect { case (t, off, len) if tracks(t) => (off, len) }.toSeq)
    }

    /** One Matroska block's FRAMES: [track vint][2-byte ts][flags]
     * then the payload, with the three lacing schemes expanded
     * (audio blocks commonly lace several codec packets into one
     * block): 0 = none, 1 = Xiph (255-run sizes, last implicit),
     * 2 = fixed (equal split), 3 = EBML (first size a vint, then
     * SIGNED vint deltas, last implicit). Returns (track,
     * frame spans); malformed lacing yields no frames (tolerance).
     */
    private[ops] def webmBlockFrames(b: Array[Byte], p: Int,
        e: Int): (Long, Seq[(Int, Int)]) = {
      val tv = ebmlVint(b, p, keepMarker = false).getOrElse(return (-1L, Nil))
      val (track, tLen) = tv
      val hp = p + tLen
      if (hp + 3 > e) return (-1L, Nil)
      val flags = b(hp + 2) & 0xff
      val data = hp + 3
      val lacing = (flags >> 1) & 3
      if (lacing == 0) return (track, if (e > data) Seq((data, e - data)) else Nil)
      if (data >= e) return (track, Nil)
      val n = (b(data) & 0xff) + 1
      var q = data + 1
      val sizes = new Array[Int](n)
      lacing match {
        case 1 => // Xiph
          var k = 0
          while (k < n - 1) {
            var s = 0
            var more = true
            while (more) {
              if (q >= e) return (track, Nil)
              val lace = b(q) & 0xff
              s += lace
              q += 1
              more = lace == 255
            }
            sizes(k) = s
            k += 1
          }
        case 2 => // fixed-size
          val total = e - q
          if (total <= 0 || total % n != 0) return (track, Nil)
          java.util.Arrays.fill(sizes, total / n)
        case _ => // 3 = EBML
          // a single-frame EBML lace carries ZERO size fields (the
          // lone frame is the implicit remainder) — round-20 review
          // fix: reading a vint here would eat the frame's own bytes
          if (n > 1) {
            val f0 = ebmlVint(b, q, keepMarker = false).getOrElse(return (track, Nil))
            if (f0._1 > Int.MaxValue) return (track, Nil)
            sizes(0) = f0._1.toInt
            q += f0._2
            var k = 1
            while (k < n - 1) {
              val d = ebmlVint(b, q, keepMarker = false).getOrElse(return (track, Nil))
              val delta = d._1 - ((1L << (7 * d._2 - 1)) - 1)
              val s = sizes(k - 1).toLong + delta
              if (s < 0 || s > Int.MaxValue) return (track, Nil)
              sizes(k) = s.toInt
              q += d._2
              k += 1
            }
          }
      }
      // last frame size is implicit: whatever remains
      if (lacing != 2) {
        var head = 0L
        var k = 0
        while (k < n - 1) { head += sizes(k); k += 1 }
        val last = (e - q) - head
        if (last <= 0 || last > Int.MaxValue) return (track, Nil)
        sizes(n - 1) = last.toInt
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var off = q
      var k = 0
      while (k < n) {
        if (sizes(k) < 0 || off + sizes(k) > e) return (track, Nil)
        out += ((off, sizes(k)))
        off += sizes(k)
        k += 1
      }
      (track, out.toSeq)
    }

    /** Vorbis AUDIO packets of a WebM/Matroska file (round 20): the
     * first TrackEntry whose CodecID is "A_VORBIS" provides the
     * three header packets via CodecPrivate's Xiph lacing (count
     * byte 2, then 255-run sizes for the first two; the third is
     * the remainder — Matroska's standard Vorbis private-data
     * shape), and its block frames (SimpleBlock and BlockGroup/
     * Block, all lacings expanded) are the audio packets in stream
     * order. Returns the packet list ready for
     * [[Vorbis.decodePackets]] plus the per-channel sample clamp
     * derived from Segment Duration × SamplingFrequency (−1 when
     * either is absent). Candidate blocks are filtered against the
     * track number at the END of the walk, so a Tracks-after-Cluster
     * layout still decodes (the webmVideoBlockSpans discipline). */
    private[ops] def webmVorbisPackets(
        b: Array[Byte]): Option[(Seq[Array[Byte]], Long)] = {
      if (b == null || b.length < 4 || (b(0) & 0xff) != 0x1a ||
        (b(1) & 0xff) != 0x45 || (b(2) & 0xff) != 0xdf ||
        (b(3) & 0xff) != 0xa3) return None
      def beUint(p: Int, e: Int): Long = {
        var v = 0L
        var j = p
        while (j < e) { v = (v << 8) | (b(j) & 0xffL); j += 1 }
        v
      }
      def beFloat(p: Int, e: Int): Double = (e - p) match {
        case 4 => java.lang.Float.intBitsToFloat(beUint(p, e).toInt).toDouble
        case 8 => java.lang.Double.longBitsToDouble(beUint(p, e))
        case _ => -1.0
      }
      var tsScale = 1000000L
      var durTicks = -1.0
      var rate = -1.0
      var vorbisTrack = -1L
      var codecPriv: Option[(Int, Int)] = None
      var ordinal = 0L
      val cand = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(Int, Int)])]
      ebmlWalk(b, 0, b.length) { (id0, p0, e0) =>
        if (id0 == 0x18538067L) ebmlWalk(b, p0, e0) { (id1, p1, e1) => // Segment
          if (id1 == 0x1549a966L) ebmlWalk(b, p1, e1) { (id2, p2, e2) => // Info
            if (id2 == 0x2ad7b1L) tsScale = beUint(p2, e2)
            else if (id2 == 0x4489L) durTicks = beFloat(p2, e2)
          }
          else if (id1 == 0x1654ae6bL) ebmlWalk(b, p1, e1) { (id2, p2, e2) => // Tracks
            if (id2 == 0xaeL) { // TrackEntry
              ordinal += 1
              var num = -1L
              var isVorbis = false
              var priv: Option[(Int, Int)] = None
              var sfreq = -1.0
              ebmlWalk(b, p2, e2) { (id3, p3, e3) =>
                if (id3 == 0xd7L) num = beUint(p3, e3)
                else if (id3 == 0x86L) // CodecID
                  isVorbis = new String(b, p3, e3 - p3, "US-ASCII") == "A_VORBIS"
                else if (id3 == 0x63a2L) priv = Some((p3, e3 - p3))
                else if (id3 == 0xe1L) ebmlWalk(b, p3, e3) { (id4, p4, e4) =>
                  if (id4 == 0xb5L) sfreq = beFloat(p4, e4) // SamplingFrequency
                }
              }
              if (isVorbis && vorbisTrack < 0 && priv.nonEmpty) {
                vorbisTrack = if (num > 0) num else ordinal
                codecPriv = priv
                rate = sfreq
              }
            }
          }
          else if (id1 == 0x1f43b675L) ebmlWalk(b, p1, e1) { (id2, p2, e2) => // Cluster
            if (id2 == 0xa3L) cand += webmBlockFrames(b, p2, e2)
            else if (id2 == 0xa0L) ebmlWalk(b, p2, e2) { (id3, p3, e3) =>
              if (id3 == 0xa1L) cand += webmBlockFrames(b, p3, e3)
            }
          }
        }
      }
      if (vorbisTrack < 0) return None
      // CodecPrivate: Xiph-laced id + comment + setup headers
      val (po, plen) = codecPriv.get
      if (plen < 3 || (b(po) & 0xff) != 2) return None
      var q = po + 1
      val hsizes = new Array[Int](2)
      var k = 0
      while (k < 2) {
        var s = 0
        var more = true
        while (more) {
          if (q >= po + plen) return None
          val lace = b(q) & 0xff
          s += lace
          q += 1
          more = lace == 255
        }
        hsizes(k) = s
        k += 1
      }
      val third = (po + plen) - q - hsizes(0) - hsizes(1)
      if (third <= 0) return None
      val headers = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var off = q
      for (s <- Seq(hsizes(0), hsizes(1), third)) {
        if (off + s > po + plen) return None
        headers += java.util.Arrays.copyOfRange(b, off, off + s)
        off += s
      }
      val audio = cand.iterator.filter(_._1 == vorbisTrack).flatMap(_._2)
        .map { case (o, l) => java.util.Arrays.copyOfRange(b, o, o + l) }
        .toSeq
      val clamp =
        if (durTicks > 0 && tsScale > 0 && rate > 0)
          math.round(durTicks * tsScale / 1e9 * rate)
        else -1L
      Some((headers.toSeq ++ audio, clamp))
    }

    /**
     * AU/SND header parse (Sun audio, the simplest real container:
     * ".snd" magic then five BE32 words — data offset, data size,
     * encoding, sample rate, channels). Encodings map to bit depths
     * (1 = 8-bit mu-law, 2/3/4/5 = 8/16/24/32-bit linear PCM,
     * 27 = 8-bit A-law); duration from data size over the frame rate.
     */
    private[ops] def parseAu(b: Array[Byte]): Option[AvMeta] = {
      if (b.length < 24 || !(b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'))
        return None
      val dataSize = be32(b, 8)
      val encoding = be32(b, 12).toInt
      val rate = be32(b, 16)
      val ch = be32(b, 20)
      val bits = encoding match {
        case 1 | 27 => Some(8) // mu-law / A-law: 8 stored bits per sample
        case 2 => Some(8)
        case 3 => Some(16)
        case 4 => Some(24)
        case 5 => Some(32)
        case _ => None
      }
      // ch capped at 64 (same sanity bound as auSamples): an
      // adversarial header with rate and ch both near 2^31 would
      // overflow the Long duration divisor below
      if (rate <= 0 || ch <= 0 || rate > Int.MaxValue || ch > 64) None
      else Some(AvMeta("au", channels = Some(ch.toInt), sampleRate = Some(rate.toInt),
        bitsPerSample = bits,
        durationMs = bits.collect {
          case bps if dataSize >= 0 =>
            dataSize * 1000L / (rate * ch * (bps / 8).max(1))
        }))
    }

    /**
     * AVI header parse — the same RIFF walk as [[parseWav]] against the
     * "AVI " form type (public format: each chunk is a 4-char id +
     * LE32 length, word-aligned; `LIST` chunks nest with a 4-char list
     * type as the first payload word). Fields come from the `hdrl`
     * LIST's `avih` chunk (MainAVIHeader): microseconds per frame at
     * payload offset 0, total frames at 16, width/height at 32/36.
     * Duration = usPerFrame * totalFrames / 1000 (zero total frames —
     * a header-only file cut before `movi` — reports no duration but
     * keeps the byte-proven container identity, same tolerance as
     * [[parseMp4]]'s moov-less ftyp).
     */
    private[ops] def parseAvi(b: Array[Byte]): Option[AvMeta] = {
      if (!(tag(b, 0, "RIFF") && tag(b, 8, "AVI "))) return None
      var meta: Option[AvMeta] = None
      var i = 12
      while (i + 8 <= b.length && meta.isEmpty) {
        val len = le32(b, i + 4)
        if (len < 0 || len > b.length - i - 8) return meta.orElse(Some(AvMeta("avi")))
        if (tag(b, i, "LIST") && tag(b, i + 8, "hdrl")) {
          // walk the hdrl LIST for avih
          var j = i + 12
          val end = i + 8 + len
          while (j + 8 <= end && meta.isEmpty) {
            val l2 = le32(b, j + 4)
            if (l2 < 0 || l2 > end - j - 8) return Some(AvMeta("avi"))
            if (tag(b, j, "avih") && l2 >= 40) {
              val usPerFrame = le32(b, j + 8)
              val totalFrames = le32(b, j + 24)
              val w = le32(b, j + 40)
              val h = le32(b, j + 44)
              meta = Some(AvMeta("avi",
                width = if (w > 0) Some(w) else None,
                height = if (h > 0) Some(h) else None,
                durationMs =
                  if (usPerFrame > 0 && totalFrames > 0)
                    Some(usPerFrame.toLong * totalFrames / 1000L)
                  else None))
            }
            j += 8 + l2 + (l2 & 1)
          }
        }
        i += 8 + len + (len & 1)
      }
      meta.orElse(Some(AvMeta("avi"))) // RIFF/AVI proven, headers absent
    }

    /**
     * Video-frame chunk locator for AVI: walks the top-level RIFF
     * chunks to the `movi` LIST and returns every video chunk —
     * stream-numbered ids `##dc` (compressed) / `##db` (uncompressed),
     * e.g. `00dc` for stream 0 — as (dataOffset, dataLen) in file
     * order. For an MJPEG AVI each such chunk is one complete JPEG
     * image. `rec ` grouping LISTs inside `movi` are descended into
     * (AVI 1.0 interleave); audio (`##wb`) and index chunks are
     * skipped by length, same discipline as the WAV walk.
     */
    private[ops] def aviVideoChunks(b: Array[Byte]): Seq[(Int, Int)] = {
      if (b == null || !(tag(b, 0, "RIFF") && tag(b, 8, "AVI "))) return Nil
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def isVideoId(o: Int): Boolean =
        b(o) >= '0' && b(o) <= '9' && b(o + 1) >= '0' && b(o + 1) <= '9' &&
          b(o + 2) == 'd' && (b(o + 3) == 'c' || b(o + 3) == 'b')
      def walkMovi(from: Int, to: Int): Unit = {
        var i = from
        while (i + 8 <= to) {
          val len = le32(b, i + 4)
          if (len < 0 || len > to - i - 8) return // truncated: stop
          if (tag(b, i, "LIST") && tag(b, i + 8, "rec "))
            walkMovi(i + 12, i + 8 + len)
          else if (isVideoId(i)) out += ((i + 8, len))
          i += 8 + len + (len & 1)
        }
      }
      var i = 12
      while (i + 8 <= b.length) {
        val len = le32(b, i + 4)
        if (len < 0 || len > b.length - i - 8) return out.toSeq
        if (tag(b, i, "LIST") && tag(b, i + 8, "movi"))
          walkMovi(i + 12, i + 8 + len)
        i += 8 + len + (len & 1)
      }
      out.toSeq
    }

    /**
     * Video-sample locator for ISO-BMFF (the MP4 companion to
     * [[aviVideoChunks]]): walks `moov/trak/mdia/minf/stbl` and, when
     * the `stsd` entry declares an MJPEG-family codec ('jpeg',
     * 'mjpa', 'mjpb', 'MJPG'), reconstructs every sample's
     * (offset, size) from the sample tables — `stsz` (uniform
     * sample_size or the per-sample table), `stco` chunk offsets, and
     * the `stsc` sample-to-chunk runs expanded per the spec (each run
     * applies from its first_chunk until the next run's first_chunk;
     * samples within a chunk are contiguous). Each such sample is one
     * complete JPEG image. Same tolerance discipline as every walker
     * here: malformed tables yield Nil, never a throw.
     */
    /** One `trak`'s parsed sample tables. All fields are scoped to the
     * single trak they were read from — a multi-track file (e.g. MJPEG
     * video + PCM audio) must never combine one trak's codec identity
     * with another trak's stsz/stco/stsc, or the emitted (offset,
     * size) coordinates point into the wrong track's media data. */
    private case class TrakTables(
        trackId: Long, // tkhd track_ID; -1 if absent
        codec: String, // stsd first sample entry fourcc; null if absent
        uniformSize: Long, sampleCount: Long,
        sizeTable: Array[Long], chunkOffs: Array[Long],
        stscRuns: Array[(Long, Long)], // (first_chunk, samples_per_chunk)
        syncSamples: Array[Long], // stss 1-based sample numbers; null = no stss
        timescale: Long = 0L, // mdhd media timescale; 0 if absent
        sttsRuns: Array[(Long, Long)] = null) { // (sample_count, delta ticks)
      def complete: Boolean =
        chunkOffs != null && stscRuns != null && sampleCount > 0 &&
          (uniformSize > 0 || sizeTable != null)
    }

    /** Generic ISO-BMFF box iteration over `[from, to)`: calls `f`
     * with (type, boxStart, payloadStart, end) per box; handles
     * largesize (size == 1) and to-end (size == 0) boxes; stops at the
     * first malformed header. Shared by the moov sample-table walk and
     * the moof fragment walk. */
    private def walkBoxes(b: Array[Byte], from: Int, to: Int)(
        f: (String, Int, Int, Int) => Unit): Unit = {
      var i = from
      while (i + 8 <= to) {
        val size = be32(b, i)
        val tpe = new String(b, i + 4, 4, "US-ASCII")
        val (payload, end): (Int, Long) =
          if (size == 0) (i + 8, to.toLong)
          else if (size == 1) {
            if (i + 16 > to) return
            if (be32(b, i + 8) != 0) return // >2 GiB box in a byte array
            (i + 16, i + be32(b, i + 12))
          } else (i + 8, i + size)
        if (end < payload || end > to) return
        f(tpe, i, payload, end.toInt)
        if (end.toInt <= i) return
        i = end.toInt
      }
    }

    private val MjpegCodecs = Set("jpeg", "mjpa", "mjpb", "MJPG")
    /** H.26x-family sample-entry fourccs: pixels need a real codec to
     * decode, but keyframe LOCATION is pure sample-table arithmetic —
     * stss names the sync samples, stsz/stco/stsc place them. */
    private val H26xCodecs = Set("avc1", "avc3", "hvc1", "hev1", "h263", "s263")

    /** Walk `moov/trak/mdia/minf/stbl` and return one [[TrakTables]]
     * per trak, in file order, each holding ONLY that trak's boxes.
     * Same tolerance discipline as every walker here: malformed
     * structure yields what parsed so far, never a throw. */
    private def mp4Traks(b: Array[Byte]): Seq[TrakTables] = {
      if (b == null || b.length < 12 || !tag(b, 4, "ftyp")) return Nil
      val traks = scala.collection.mutable.ArrayBuffer.empty[TrakTables]
      def walk(from: Int, to: Int)(f: (String, Int, Int) => Unit): Unit =
        walkBoxes(b, from, to)((t, _, p, e) => f(t, p, e))
      walk(0, b.length) { (t0, p0, e0) =>
        if (t0 == "moov") walk(p0, e0) { (t1, p1, e1) =>
          if (t1 == "trak") {
            // per-trak state, committed when this trak's walk returns
            var trackId = -1L
            var codec: String = null
            var uniformSize = 0L
            var sampleCount = 0L
            var sizeTable: Array[Long] = null
            var chunkOffs: Array[Long] = null
            var stscRuns: Array[(Long, Long)] = null
            var syncSamples: Array[Long] = null
            var timescale = 0L
            var sttsRuns: Array[(Long, Long)] = null
            walk(p1, e1) { (t2, p2, e2) =>
              if (t2 == "tkhd" && p2 + 4 <= e2) {
                // fullbox: version decides the 32/64-bit time fields
                // before track_ID
                val off = if ((b(p2) & 0xff) == 1) p2 + 4 + 16 else p2 + 4 + 8
                if (off + 4 <= e2) trackId = be32(b, off)
              }
              if (t2 == "mdia") walk(p2, e2) { (t3, p3, e3) =>
                if (t3 == "mdhd" && p3 + 4 <= e3) {
                  // fullbox: version 1 has 64-bit create/modify times
                  val off = if ((b(p3) & 0xff) == 1) p3 + 4 + 16 else p3 + 4 + 8
                  if (off + 4 <= e3) timescale = be32(b, off)
                }
                if (t3 == "minf") walk(p3, e3) { (t4, p4, e4) =>
                  if (t4 == "stbl") walk(p4, e4) { (t5, p5, e5) =>
                    t5 match {
                      case "stsd" if p5 + 8 <= e5 =>
                        // first sample entry's format fourcc at +8+4
                        if (be32(b, p5 + 4) >= 1 && p5 + 16 <= e5)
                          codec = new String(b, p5 + 12, 4, "US-ASCII")
                      case "stsz" if p5 + 12 <= e5 =>
                        uniformSize = be32(b, p5 + 4)
                        sampleCount = be32(b, p5 + 8)
                        if (uniformSize == 0 && sampleCount > 0 &&
                          p5 + 12 + 4 * sampleCount <= e5 && sampleCount <= (1 << 22)) {
                          sizeTable = Array.tabulate(sampleCount.toInt)(j =>
                            be32(b, p5 + 12 + 4 * j))
                        }
                      case "stco" if p5 + 8 <= e5 =>
                        val n = be32(b, p5 + 4)
                        if (n > 0 && p5 + 8 + 4 * n <= e5 && n <= (1 << 22))
                          chunkOffs = Array.tabulate(n.toInt)(j => be32(b, p5 + 8 + 4 * j))
                      case "co64" if p5 + 8 <= e5 =>
                        // 64-bit chunk offsets: what any >4 GiB MP4
                        // carries instead of stco — a 100 TB video
                        // corpus is FULL of these
                        val n = be32(b, p5 + 4)
                        if (n > 0 && p5 + 8 + 8 * n <= e5 && n <= (1 << 22))
                          chunkOffs = Array.tabulate(n.toInt)(j =>
                            (be32(b, p5 + 8 + 8 * j) << 32) | be32(b, p5 + 12 + 8 * j))
                      case "stsc" if p5 + 8 <= e5 =>
                        val n = be32(b, p5 + 4)
                        if (n > 0 && p5 + 8 + 12 * n <= e5 && n <= (1 << 20))
                          stscRuns = Array.tabulate(n.toInt)(j =>
                            (be32(b, p5 + 8 + 12 * j), be32(b, p5 + 12 + 12 * j)))
                      case "stss" if p5 + 8 <= e5 =>
                        val n = be32(b, p5 + 4)
                        if (n >= 0 && p5 + 8 + 4 * n <= e5 && n <= (1 << 22))
                          syncSamples = Array.tabulate(n.toInt)(j =>
                            be32(b, p5 + 8 + 4 * j))
                      case "stts" if p5 + 8 <= e5 =>
                        val n = be32(b, p5 + 4)
                        if (n > 0 && p5 + 8 + 8 * n <= e5 && n <= (1 << 20))
                          sttsRuns = Array.tabulate(n.toInt)(j =>
                            (be32(b, p5 + 8 + 8 * j), be32(b, p5 + 12 + 8 * j)))
                      case _ => ()
                    }
                  }
                }
              }
            }
            traks += TrakTables(trackId, codec, uniformSize, sampleCount,
              sizeTable, chunkOffs, stscRuns, syncSamples, timescale, sttsRuns)
          }
        }
      }
      traks.toSeq
    }

    /** Expand one trak's stsc runs chunk by chunk, laying samples out
     * contiguously from each chunk's offset; (offset, size) per sample
     * in sample order. Bounds-checked against the file length —
     * coordinates pointing outside the blob end the expansion. */
    private def expandSamples(t: TrakTables, fileLen: Int): Seq[(Int, Int)] = {
      if (!t.complete) return Nil
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var sample = 0L
      var chunk = 1 // 1-based per spec
      def samplesPerChunk(c: Int): Long = {
        var spc = 0L
        t.stscRuns.foreach { case (first, n) => if (first <= c) spc = n }
        spc
      }
      while (sample < t.sampleCount && chunk <= t.chunkOffs.length) {
        var off = t.chunkOffs(chunk - 1)
        var j = 0L
        val spc = samplesPerChunk(chunk)
        while (j < spc && sample < t.sampleCount) {
          val size =
            if (t.uniformSize > 0) t.uniformSize else t.sizeTable(sample.toInt)
          if (size <= 0 || off < 0 || off + size > fileLen) return out.toSeq
          out += ((off.toInt, size.toInt))
          off += size
          j += 1
          sample += 1
        }
        if (spc <= 0) return out.toSeq // degenerate mapping: stop
        chunk += 1
      }
      out.toSeq
    }

    private[ops] def mp4VideoSamples(b: Array[Byte]): Seq[(Int, Int)] =
      mp4Traks(b).collect {
        case t if MjpegCodecs.contains(t.codec) => expandSamples(t, b.length)
      }.flatten

    /** Sample spans of every recognized VIDEO trak regardless of
     * codec — the payload-digest re-mux path's span source for the
     * self-contained layout: H.264/HEVC pixels need a codec library,
     * but the raw ordered sample bytes identify the stream exactly
     * (a re-mux carries them verbatim). Audio traks (mp4a …) are
     * excluded so a movie's soundtrack can't leak into the video
     * signature. */
    private val VideoSampleCodecs: Set[String] =
      MjpegCodecs ++ H26xCodecs ++ Set("vp08", "vp09", "av01", "mp4v")
    private[ops] def mp4AnyVideoSamples(b: Array[Byte]): Seq[(Int, Int)] =
      mp4Traks(b).collect {
        case t if t.codec != null && VideoSampleCodecs.contains(t.codec) =>
          expandSamples(t, b.length)
      }.flatten

    /** Keyframe LOCATOR for H.26x-in-MP4: (1-based sample number,
     * offset, size) of every `stss`-declared sync sample in each
     * H.26x-family trak. The pixels of these codecs can't be decoded
     * without a real codec library, but a 100 TB video pipeline shards
     * on keyframe boundaries — which are pure sample-table arithmetic:
     * `stss` names the sync samples, stsz/stco/stsc place their bytes.
     * Traks without an stss box are skipped (per ISO/IEC 14496-12 the
     * absence of stss means EVERY sample is sync — for our MJPEG traks
     * that is already what [[mp4VideoSamples]] emits; for H.26x a
     * missing stss in the wild accompanies fragmented files this
     * walker doesn't cover, so no-stss emits nothing rather than
     * claiming every delta frame is a keyframe). */
    private[ops] def mp4SyncSamples(b: Array[Byte]): Seq[(Long, Int, Int)] =
      mp4SyncSamplesC(b).map { case (sn, off, len, _) => (sn, off, len) }

    /** [[mp4SyncSamples]] plus the owning trak's codec fourcc — the
     * NAL header layout differs per family (AVC vs HEVC vs the
     * non-NAL h263), so the `is_idr` probe downstream must know which
     * trak each sync sample came from. */
    private[ops] def mp4SyncSamplesC(b: Array[Byte]): Seq[(Long, Int, Int, String)] =
      mp4Traks(b).collect {
        case t if H26xCodecs.contains(t.codec) && t.syncSamples != null =>
          val all = expandSamples(t, b.length).toIndexedSeq
          t.syncSamples.toSeq.collect {
            case sn if sn >= 1 && sn <= all.length =>
              val (off, len) = all((sn - 1).toInt)
              (sn, off, len, t.codec)
          }
      }.flatten

    /** [[mp4SyncSamplesC]] plus each sync sample's PRESENTATION START
     * TIME in milliseconds — the time axis that pairs keyframes with
     * caption cues: `stts` gives every sample's duration in mdhd
     * ticks, so sample n starts at the prefix sum of the first n−1
     * deltas, converted by the mdhd timescale. Samples past the last
     * stts run reuse its delta (tolerance: the spec says stts covers
     * all samples). Traks without stts or a positive timescale emit
     * nothing — a keyframe with no derivable clock cannot be aligned. */
    /** Prefix-sum the stts runs into per-sample start ticks. A
     * degenerate sample_count=0 run covers no samples and is skipped
     * BEFORE consuming a delta, so empty runs contribute no ticks;
     * the last run still backstops samples past stts coverage (the
     * documented tolerance). */
    private[ops] def sttsStartTicks(runs: Array[(Long, Long)], n: Int): Array[Long] = {
      val startTicks = new Array[Long](n)
      var i = 0
      var tick = 0L
      var run = 0
      var left = if (runs.nonEmpty) runs(0)._1 else 0L
      while (i < n) {
        while (left <= 0 && run + 1 < runs.length) {
          run += 1
          left = runs(run)._1
        }
        startTicks(i) = tick
        tick += (if (run < runs.length) runs(run)._2 else 0L)
        left -= 1
        i += 1
      }
      startTicks
    }

    private[ops] def mp4SyncSampleTimes(b: Array[Byte]): Seq[(Long, Int, Int, Long)] =
      mp4Traks(b).collect {
        case t if H26xCodecs.contains(t.codec) && t.syncSamples != null &&
            t.timescale > 0 && t.sttsRuns != null =>
          val all = expandSamples(t, b.length).toIndexedSeq
          val startTicks = sttsStartTicks(t.sttsRuns, all.length)
          t.syncSamples.toSeq.collect {
            case sn if sn >= 1 && sn <= all.length =>
              val (off, len) = all((sn - 1).toInt)
              (sn, off, len, startTicks((sn - 1).toInt) * 1000L / t.timescale)
          }
      }.flatten

    /** moov/mvex/trex per-track fragment defaults: track_ID →
     * (default_sample_duration, default_sample_size,
     * default_sample_flags). */
    private def trexDefaults(b: Array[Byte]): Map[Long, (Long, Long, Long)] = {
      val m = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
      walkBoxes(b, 0, b.length) { (t0, _, p0, e0) =>
        if (t0 == "moov") walkBoxes(b, p0, e0) { (t1, _, p1, e1) =>
          if (t1 == "mvex") walkBoxes(b, p1, e1) { (t2, _, p2, e2) =>
            if (t2 == "trex" && p2 + 24 <= e2)
              m(be32(b, p2 + 4)) = (be32(b, p2 + 12), be32(b, p2 + 16), be32(b, p2 + 20))
          }
        }
      }
      m.toMap
    }

    /** Keyframe locator for FRAGMENTED MP4 (CMAF/DASH/HLS segments —
     * `moov` holds empty sample tables + `mvex` defaults, samples live
     * in `moof`+`mdat` fragments): walks every moof's
     * `traf`/`tfhd`/`trun`, reconstructs each sample's (offset, size)
     * from the run tables (base-data-offset / default-base-is-moof,
     * per-sample or tfhd/trex default sizes), and emits
     * (1-based sample number counted across fragments per track,
     * offset, size) for every SYNC sample of an H.26x-family track.
     * Sync per ISO/IEC 14496-12 §8.8.3: `sample_is_non_sync_sample`
     * (bit 16 of the sample flags) clear — resolved per-sample →
     * first-sample-flags → tfhd default → trex default; samples whose
     * flags are unresolvable are NOT claimed as keyframes. The moov
     * stbl walk ([[mp4SyncSamples]]) covers self-contained files; this
     * covers the segment layout a streaming-video corpus actually
     * ships — together: keyframe sharding without a codec library. */
    private[ops] def mp4FragmentSyncSamples(b: Array[Byte]): Seq[(Long, Int, Int)] =
      mp4FragmentSyncSamplesC(b).map { case (sn, off, len, _) => (sn, off, len) }

    /** EVERY fragmented video sample's (offset, size) in decode
     * order, sync or not — the payload-digest re-mux path's span
     * source for the segment layout: a re-mux carries identical
     * codec payload bytes, so the ordered raw spans identify the
     * stream without any pixel decode. */
    private[ops] def mp4FragmentVideoSamples(b: Array[Byte]): Seq[(Int, Int)] =
      mp4FragmentSamplesFull(b).map { case (_, off, len, _, _, _) => (off, len) }

    /** [[mp4FragmentSyncSamples]] plus the owning track's codec fourcc
     * (via the moov trak walk's track_ID → codec mapping) — same
     * rationale as [[mp4SyncSamplesC]]. */
    private[ops] def mp4FragmentSyncSamplesC(b: Array[Byte]): Seq[(Long, Int, Int, String)] =
      mp4FragmentSyncSamplesFull(b).map { case (sn, off, len, codec, _) =>
        (sn, off, len, codec)
      }

    /** Sync-only projection of [[mp4FragmentSamplesFull]] — the
     * keyframe faces keep their exact pre-r18 semantics. */
    private def mp4FragmentSyncSamplesFull(b: Array[Byte]): Seq[(Long, Int, Int, String, Long)] =
      mp4FragmentSamplesFull(b).collect { case (sn, off, len, codec, tMs, true) =>
        (sn, off, len, codec, tMs)
      }

    /** [[mp4FragmentSyncSamples]] plus each sync sample's DECODE time
     * in milliseconds — the fragmented layout's time axis, the
     * counterpart of [[mp4SyncSampleTimes]]'s stts prefix sums: `tfdt`
     * anchors each traf's baseMediaDecodeTime (absent tfdt continues
     * from the track's previous fragment, per ISO/IEC 14496-12
     * §8.8.12), per-sample trun durations (or tfhd/trex defaults)
     * advance it, and the moov mdhd timescale converts ticks → ms
     * (−1 when the track has no usable timescale). */
    private[ops] def mp4FragmentSyncSampleTimes(b: Array[Byte]): Seq[(Long, Int, Int, Long)] =
      mp4FragmentSyncSamplesFull(b).map { case (sn, off, len, _, tMs) =>
        (sn, off, len, tMs)
      }

    /** The shared fragment walk: every sample with resolvable
     * coordinates, tagged with its sync-sample status (last tuple
     * element). Sync resolution per ISO/IEC 14496-12 §8.8.3 is
     * unchanged from the pre-r18 sync-only walker; non-sync samples
     * are now ALSO emitted (sync=false) so the payload-digest path
     * can see the whole stream. */
    private def mp4FragmentSamplesFull(b: Array[Byte]): Seq[(Long, Int, Int, String, Long, Boolean)] = {
      if (b == null || b.length < 12 || !tag(b, 4, "ftyp")) return Nil
      val videoCodec = mp4Traks(b).collect {
        case t if H26xCodecs.contains(t.codec) && t.trackId > 0 =>
          t.trackId -> (t.codec, t.timescale)
      }.toMap
      val videoTracks = videoCodec.keySet
      if (videoTracks.isEmpty) return Nil
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int, String, Long, Boolean)]
      val trex = trexDefaults(b)
      val counters = scala.collection.mutable.Map.empty[Long, Long]
      // per-track decode clock in mdhd ticks: a traf WITHOUT tfdt
      // continues where the track's previous fragment ended
      val clocks = scala.collection.mutable.Map.empty[Long, Long]
      walkBoxes(b, 0, b.length) { (t0, moofStart, p0, e0) =>
        if (t0 == "moof") walkBoxes(b, p0, e0) { (t1, _, p1, e1) =>
          if (t1 == "traf") {
            var trackId = -1L
            var baseOff = moofStart.toLong // spec default for the first trun
            var defSize = 0L
            var defFlags = -1L
            var defDur = 0L
            var tfdtTicks = -1L
            var curTicks = -1L // resolved lazily at the first trun
            // a trun WITHOUT data-offset-present continues where the
            // previous trun's samples ended (ISO/IEC 14496-12 §8.8.8);
            // -1 = no previous trun in this traf
            var runningPos = -1L
            walkBoxes(b, p1, e1) { (t2, _, p2, e2) =>
              t2 match {
                case "tfhd" if p2 + 8 <= e2 =>
                  val flags = ((b(p2 + 1) & 0xff) << 16) |
                    ((b(p2 + 2) & 0xff) << 8) | (b(p2 + 3) & 0xff)
                  trackId = be32(b, p2 + 4)
                  var o = p2 + 8
                  if ((flags & 0x01) != 0 && o + 8 <= e2) { // base_data_offset
                    baseOff = (be32(b, o) << 32) | be32(b, o + 4); o += 8
                  }
                  if ((flags & 0x02) != 0) o += 4 // sample_description_index
                  if ((flags & 0x08) != 0 && o + 4 <= e2) { defDur = be32(b, o); o += 4 }
                  if ((flags & 0x10) != 0 && o + 4 <= e2) { defSize = be32(b, o); o += 4 }
                  if ((flags & 0x20) != 0 && o + 4 <= e2) { defFlags = be32(b, o); o += 4 }
                  // default-base-is-moof yields to an EXPLICIT
                  // base_data_offset when both flags are set
                  // (ISO/IEC 14496-12: base-data-offset-present wins)
                  if ((flags & 0x20000) != 0 && (flags & 0x01) == 0) baseOff = moofStart
                  trex.get(trackId).foreach { case (td, ts, tf) =>
                    if ((flags & 0x08) == 0) defDur = td
                    if ((flags & 0x10) == 0) defSize = ts
                    if ((flags & 0x20) == 0) defFlags = tf
                  }
                case "tfdt" if p2 + 8 <= e2 =>
                  tfdtTicks =
                    if ((b(p2) & 0xff) == 1 && p2 + 12 <= e2)
                      (be32(b, p2 + 4) << 32) | be32(b, p2 + 8)
                    else be32(b, p2 + 4)
                case "trun" if p2 + 8 <= e2 && videoTracks.contains(trackId) =>
                  if (curTicks < 0)
                    curTicks =
                      if (tfdtTicks >= 0) tfdtTicks
                      else clocks.getOrElse(trackId, 0L)
                  val timescale = videoCodec(trackId)._2
                  val tflags = ((b(p2 + 1) & 0xff) << 16) |
                    ((b(p2 + 2) & 0xff) << 8) | (b(p2 + 3) & 0xff)
                  val n = be32(b, p2 + 4)
                  var o = p2 + 8
                  var hasDataOff = false
                  var dataOff = 0L
                  if ((tflags & 0x01) != 0 && o + 4 <= e2) {
                    hasDataOff = true
                    dataOff = be32(b, o).toInt // SIGNED 32-bit offset
                    o += 4
                  }
                  var firstFlags = -1L
                  if ((tflags & 0x04) != 0 && o + 4 <= e2) { firstFlags = be32(b, o); o += 4 }
                  var pos =
                    if (hasDataOff) baseOff + dataOff
                    else if (runningPos >= 0) runningPos // continue prior trun
                    else baseOff + dataOff
                  var j = 0L
                  var ok = n >= 0 && n <= (1 << 22)
                  while (ok && j < n) {
                    var dur = defDur
                    if ((tflags & 0x100) != 0) {
                      if (o + 4 <= e2) { dur = be32(b, o); o += 4 } else ok = false
                    }
                    var size = defSize
                    if ((tflags & 0x200) != 0) {
                      if (o + 4 <= e2) { size = be32(b, o); o += 4 } else ok = false
                    }
                    var sflags = if (j == 0 && firstFlags >= 0) firstFlags else defFlags
                    if ((tflags & 0x400) != 0) {
                      if (o + 4 <= e2) { sflags = be32(b, o); o += 4 } else ok = false
                    }
                    if ((tflags & 0x800) != 0) o += 4 // composition time offset
                    if (ok && size > 0) {
                      val cnt = counters.getOrElse(trackId, 0L) + 1
                      counters(trackId) = cnt
                      val sync = sflags >= 0 && ((sflags >> 16) & 1L) == 0L
                      if (pos >= 0 && pos + size <= b.length) {
                        val tMs =
                          if (timescale > 0) curTicks * 1000L / timescale else -1L
                        out += ((cnt, pos.toInt, size.toInt,
                          videoCodec(trackId)._1, tMs, sync))
                      }
                      pos += size
                      curTicks += dur
                    } else ok = false // unsized sample: offsets unknowable
                    j += 1
                  }
                  if (ok) runningPos = pos
                case _ => ()
              }
            }
            if (trackId > 0 && curTicks >= 0) clocks(trackId) = curTicks
          }
        }
      }
      out.toSeq
    }

    /** FLAC STREAMINFO walk: `fLaC` magic, then the metadata-block
     * chain (1-byte last-flag+type, 3-byte BE length) until the
     * last-block flag; STREAMINFO (type 0) carries the packed
     * rate/channels/bits/total-samples word at payload bytes 10–17.
     * Returns (audio start offset, sample_rate, channels,
     * bits_per_sample, total_samples) — duration is
     * total_samples/sample_rate, the whole relational identity of a
     * speech-corpus file without touching a subframe. Truncated block
     * chains yield None, never a throw. */
    private[ops] def flacStreamInfo(b: Array[Byte]): Option[(Int, Int, Int, Int, Long)] = {
      if (b == null || b.length < 42 || b(0) != 'f' || b(1) != 'L' ||
        b(2) != 'a' || b(3) != 'C') return None
      var i = 4
      var info: Option[(Int, Int, Int, Long)] = None
      var last = false
      while (!last && i + 4 <= b.length) {
        val hdr = b(i) & 0xff
        last = (hdr & 0x80) != 0
        val btype = hdr & 0x7f
        val len = ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        val p = i + 4
        if (p + len > b.length) return None
        if (btype == 0 && len >= 34) {
          var v = 0L
          var j = 0
          while (j < 8) { v = (v << 8) | (b(p + 10 + j) & 0xffL); j += 1 }
          val sr = (v >>> 44).toInt
          if (sr > 0)
            info = Some((sr, ((v >>> 41) & 7).toInt + 1,
              ((v >>> 36) & 31).toInt + 1, v & ((1L << 36) - 1)))
        }
        i = p + len
      }
      if (!last) None
      else info.map { case (sr, ch, bps, t) => (i, sr, ch, bps, t) }
    }

    /** Shard-unit locator for FLAC streams: frame boundaries by the
     * 14-bit sync scan (0xFF 0xF8/0xF9) from the end of the metadata
     * chain — FLAC frame headers (unlike ADTS) carry no length field,
     * so boundary location without subframe decode IS a sync scan,
     * the same recovery walk stream tools use. A payload byte pair
     * that happens to equal the sync code would split a frame early —
     * the documented precision limit of every codec-free FLAC walker
     * (ruling it out requires CRC-8 verification over decoded
     * headers); the fixture keeps fill bytes 7-bit so the contract is
     * exact. The first frame must start exactly at the audio offset
     * or nothing is emitted. */
    private[ops] def flacFrames(b: Array[Byte]): Seq[(Int, Int)] =
      flacStreamInfo(b) match {
        case None            => Nil
        case Some(si) => flacFramesFrom(b, si._1)
      }

    /** [[flacFrames]] with the audio offset ALREADY located — so a
     * caller that parsed STREAMINFO for its own columns
     * ([[flacFrameTable]]) walks the metadata chain once, not
     * twice. */
    private[ops] def flacFramesFrom(b: Array[Byte], off: Int): Seq[(Int, Int)] = {
      def sync(p: Int): Boolean = p + 1 < b.length &&
        (b(p) & 0xff) == 0xff && (b(p + 1) & 0xfe) == 0xf8
      if (off >= b.length || !sync(off)) Nil
      else {
        val starts = scala.collection.mutable.ArrayBuffer(off)
        var p = off + 2
        while (p + 1 < b.length) {
          if (sync(p)) { starts += p; p += 2 } else p += 1
        }
        starts.toSeq.zipWithIndex.map { case (s, i) =>
          val end = if (i + 1 < starts.length) starts(i + 1) else b.length
          (s, end - s)
        }
      }
    }

    /** H.26x/MPEG-video PMT stream_types: keyframe sharding applies
     * to these; audio/data elementary streams are not shard units. */
    private val TsVideoStreamTypes = Set(0x01, 0x02, 0x1b, 0x24)

    /** Shard-unit locator for MPEG-TS (ISO/IEC 13818-1) segments —
     * the container legacy HLS corpora ship: walk the 188-byte packet
     * grid, parse PAT (PID 0) → program_map_PIDs, parse each PMT →
     * VIDEO elementary PIDs by stream_type (0x01/0x02 MPEG video,
     * 0x1B AVC, 0x24 HEVC — NOT by entry order: audio usually lists
     * first), then emit one (packet_idx, byte offset, pid,
     * random_access_indicator, pes_start_code_present) per
     * payload-unit-start packet of a video PID. RAI comes from the
     * adaptation field of that packet (ISO/IEC 13818-1 §2.4.3.5 — the
     * TS-level keyframe mark a segmenter cuts on); the PES start-code
     * probe (payload begins 00 00 01) is the same honesty column as
     * the keyframe tables' is_idr. Tolerance: PSI sections must fit
     * their packet (multi-packet PSI is out of scope — yields what
     * parsed), a bad sync byte ends the walk, CRC32 is not verified
     * (demuxer-on-trusted-storage discipline), partial trailing
     * packets are ignored. Three passes over the grid (PAT, PMT,
     * emit) so PSI repetition anywhere in the file works. */
    private[ops] def tsPesStarts(b: Array[Byte]): Seq[(Int, Long, Int, Boolean, Boolean)] =
      tsPesWalk(b, wantPts = false).map { case (pkt, off, pid, rai, isPes, _) =>
        (pkt, off, pid, rai, isPes)
      }

    /** [[tsPesStarts]] plus each PES's PRESENTATION TIME in
     * milliseconds, parsed from the PES header's 33-bit/90 kHz PTS
     * (marker-bit encoding, present when PTS_DTS_flags' high bit is
     * set) — the time axis that lets caption cues pair with `.ts`
     * segments the way q_m19 pairs them with MP4 keyframes. −1 when
     * the header carries no PTS (the table face turns that into
     * NULL). */
    private[ops] def tsPesStartsPts(b: Array[Byte]): Seq[(Int, Long, Int, Boolean, Boolean, Long)] =
      tsPesWalk(b, wantPts = true)

    // TS packet-header field reads, shared by the PES-start walk and
    // the round-19 PES payload reassembly
    private def tsPid(b: Array[Byte], p: Int): Int =
      ((b(p + 1) & 0x1f) << 8) | (b(p + 2) & 0xff)
    private def tsPusi(b: Array[Byte], p: Int): Boolean = (b(p + 1) & 0x40) != 0
    private def tsAfc(b: Array[Byte], p: Int): Int = (b(p + 3) >> 4) & 0x3
    private def tsHasPayload(b: Array[Byte], p: Int): Boolean = {
      val a = tsAfc(b, p); a == 1 || a == 3
    }
    private def tsPayloadOff(b: Array[Byte], p: Int): Int =
      if (tsAfc(b, p) >= 2) p + 5 + (b(p + 4) & 0xff) else p + 4

    /** MPEG-1/2 audio PMT stream_types (the MP3 family the Layer III
     * decoder reads); AAC-ADTS (0x0F) stays out — its reassembled ES
     * is ADTS frames nothing here decodes (the same honest zero as
     * bare .aac files). */
    private val TsMpegAudioStreamTypes = Set(0x03, 0x04)

    private def tsVideoPids(b: Array[Byte]): (Set[Int], Int) =
      tsPids(b, TsVideoStreamTypes)

    /** PAT → PMT → elementary PIDs of the wanted stream_types plus
     * the count of packets before the first bad sync byte. Passes
     * 1–2 of the TS walk, shared by [[tsPesStarts]],
     * [[tsVideoPesSamples]] and [[tsMpegAudioEs]]. */
    private def tsPids(b: Array[Byte], wanted: Set[Int]): (Set[Int], Int) = {
      val nPkts = b.length / 188
      // PSI section start: payload offset + 1 + pointer_field
      def sectionStart(p: Int): Int = {
        val po = tsPayloadOff(b, p)
        if (!tsHasPayload(b, p) || po < 0 || po >= p + 188) -1
        else {
          val s = po + 1 + (b(po) & 0xff)
          if (s >= p + 188) -1 else s
        }
      }
      // pass 1: PAT → PMT PIDs (program 0 is the network PID, skipped)
      val pmtPids = scala.collection.mutable.Set.empty[Int]
      var j = 0
      var sync = true
      while (sync && j < nPkts) {
        val p = 188 * j
        if ((b(p) & 0xff) != 0x47) sync = false
        else {
          if (tsPid(b, p) == 0 && tsPusi(b, p)) {
            val s = sectionStart(p)
            if (s >= 0 && (b(s) & 0xff) == 0x00 && s + 8 <= p + 188) {
              val secLen = ((b(s + 1) & 0x0f) << 8) | (b(s + 2) & 0xff)
              val end = math.min(s + 3 + secLen - 4, p + 188) // excl. CRC
              var q = s + 8
              while (q + 4 <= end) {
                val prog = ((b(q) & 0xff) << 8) | (b(q + 1) & 0xff)
                if (prog != 0) pmtPids += ((b(q + 2) & 0x1f) << 8) | (b(q + 3) & 0xff)
                q += 4
              }
            }
          }
          j += 1
        }
      }
      val lastSync = j // packets beyond the first bad sync never parse
      if (pmtPids.isEmpty) return (Set.empty, lastSync)
      // pass 2: PMT → elementary PIDs by stream_type
      val videoPids = scala.collection.mutable.Set.empty[Int]
      j = 0
      while (j < lastSync) {
        val p = 188 * j
        if (pmtPids.contains(tsPid(b, p)) && tsPusi(b, p)) {
          val s = sectionStart(p)
          if (s >= 0 && (b(s) & 0xff) == 0x02 && s + 12 <= p + 188) {
            val secLen = ((b(s + 1) & 0x0f) << 8) | (b(s + 2) & 0xff)
            val end = math.min(s + 3 + secLen - 4, p + 188) // excl. CRC
            val pil = ((b(s + 10) & 0x0f) << 8) | (b(s + 11) & 0xff)
            var q = s + 12 + pil
            while (q + 5 <= end) {
              val st = b(q) & 0xff
              val epid = ((b(q + 1) & 0x1f) << 8) | (b(q + 2) & 0xff)
              val esLen = ((b(q + 3) & 0x0f) << 8) | (b(q + 4) & 0xff)
              if (wanted(st)) videoPids += epid
              q += 5 + esLen
            }
          }
        }
        j += 1
      }
      (videoPids.toSet, lastSync)
    }

    /** Shared TS walk: the PTS decode is gated on `wantPts` so the
     * PTS-less q_m17 face doesn't pay marker-bit reassembly per PES
     * start across a corpus-scale scan. */
    private def tsPesWalk(b: Array[Byte], wantPts: Boolean): Seq[(Int, Long, Int, Boolean, Boolean, Long)] = {
      if (b == null || b.length < 188 || (b(0) & 0xff) != 0x47) return Nil
      def rai(p: Int): Boolean =
        tsAfc(b, p) >= 2 && (b(p + 4) & 0xff) >= 1 && (b(p + 5) & 0x40) != 0
      val (videoPids, lastSync) = tsVideoPids(b)
      if (videoPids.isEmpty) return Nil
      // pass 3: emit one row per payload-unit-start video packet
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int, Boolean, Boolean, Long)]
      var j = 0
      while (j < lastSync) {
        val p = 188 * j
        if (videoPids.contains(tsPid(b, p)) && tsPusi(b, p) && tsHasPayload(b, p)) {
          val po = tsPayloadOff(b, p)
          val isPes = po + 3 <= p + 188 &&
            b(po) == 0 && b(po + 1) == 0 && b(po + 2) == 1
          // PES header: flags2 at po+7 (bit 7 = PTS present), header
          // data at po+9; PTS is 5 marker-bit-encoded bytes
          val ptsMs =
            if (wantPts && isPes && po + 14 <= p + 188 &&
                (b(po + 7) & 0x80) != 0 && (b(po + 8) & 0xff) >= 5) {
              val q = po + 9
              val pts = (((b(q) >> 1) & 0x7L) << 30) |
                ((b(q + 1) & 0xffL) << 22) |
                (((b(q + 2) >> 1) & 0x7fL) << 15) |
                ((b(q + 3) & 0xffL) << 7) |
                ((b(q + 4) >> 1) & 0x7fL)
              pts / 90L
            } else -1L
          out += ((j, 188L * j, tsPid(b, p), rai(p), isPes, ptsMs))
        }
        j += 1
      }
      out.toSeq
    }

    /** PES payload REASSEMBLY for the video PIDs of an MPEG-TS
     * segment (round 19, the q_m38/q_m41 payload path): one group of
     * byte spans per PES packet — the PES header is stripped from
     * the start packet, continuation packets contribute their whole
     * TS payload, and a nonzero PES_packet_length bounds the total
     * (video commonly writes 0 = unbounded; the group then ends at
     * the PID's next payload-unit start). Concatenated in order the
     * groups ARE the elementary stream, so a TS ↔ MP4 re-mux of the
     * same codec payload digests equal with ZERO decode — the
     * HLS-era `.ts` share of web video stops being invisible to
     * re-mux dedup. A unit whose payload start is not a PES start
     * code (00 00 01) claims nothing, as does data before the first
     * unit start; multiple video PIDs emit their groups in PID
     * order. */
    private[ops] def tsVideoPesSamples(b: Array[Byte]): Seq[Seq[(Int, Int)]] = {
      if (b == null || b.length < 188 || (b(0) & 0xff) != 0x47) return Nil
      val (videoPids, lastSync) = tsVideoPids(b)
      if (videoPids.isEmpty) return Nil
      tsPesPayloadGroups(b, videoPids, lastSync)
    }

    /** Reassembled MPEG-1/2 AUDIO elementary stream of a TS segment
     * (round 19): PES payloads of the first MP3-family audio PID
     * concatenated — the ES is a plain Layer III frame stream, so
     * MP3-in-TS feeds the same real decoder (and fingerprint) as
     * bare .mp3 files. PES packetization need not align to MP3
     * frames; concatenation is the spec's ES recovery. */
    private[ops] def tsMpegAudioEs(b: Array[Byte]): Option[Array[Byte]] = {
      if (b == null || b.length < 188 || (b(0) & 0xff) != 0x47) return None
      val (pids, lastSync) = tsPids(b, TsMpegAudioStreamTypes)
      if (pids.isEmpty) return None
      // FIRST (lowest) audio PID only: a TS with two audio programs
      // must not concatenate unrelated elementary streams into one
      // corrupted ES that matches neither bare .mp3 twin
      val groups = tsPesPayloadGroups(b, Set(pids.min), lastSync)
      if (groups.isEmpty) return None
      var total = 0L
      for (g <- groups; (_, len) <- g) total += len
      if (total <= 0 || total > (64L << 20)) return None // hostile cap
      val out = new Array[Byte](total.toInt)
      var o = 0
      for (g <- groups; (off, len) <- g) {
        System.arraycopy(b, off, out, o, len)
        o += len
      }
      Some(out)
    }

    /** The per-PES payload reassembly walk over an already-resolved
     * PID set ([[tsVideoPesSamples]] / [[tsMpegAudioEs]] share it). */
    private def tsPesPayloadGroups(b: Array[Byte], videoPids: Set[Int],
        lastSync: Int): Seq[Seq[(Int, Int)]] = {
      val done = scala.collection.mutable.Map.empty[Int,
        scala.collection.mutable.ArrayBuffer[Seq[(Int, Int)]]]
      val cur = scala.collection.mutable.Map.empty[Int,
        scala.collection.mutable.ArrayBuffer[(Int, Int)]]
      val remaining = scala.collection.mutable.Map.empty[Int, Long] // -1 = unbounded
      def close(pd: Int): Unit = cur.remove(pd).foreach { g =>
        if (g.nonEmpty)
          done.getOrElseUpdate(pd,
            scala.collection.mutable.ArrayBuffer.empty) += g.toSeq
      }
      def addSpan(pd: Int, from: Int, to: Int): Unit = if (to > from) {
        val rem = remaining(pd)
        val take = if (rem < 0) to - from else math.min(rem, (to - from).toLong).toInt
        if (take > 0) {
          cur(pd) += ((from, take))
          if (rem >= 0) remaining(pd) = rem - take
        }
      }
      var j = 0
      while (j < lastSync) {
        val p = 188 * j
        val pd = tsPid(b, p)
        if (videoPids.contains(pd) && tsHasPayload(b, p)) {
          val po = tsPayloadOff(b, p)
          val end = p + 188
          if (tsPusi(b, p)) {
            close(pd)
            // PES prefix: 00 00 01 sid len16, then the optional
            // header ('10' flags, flags2, header_data_length)
            if (po >= 0 && po + 9 <= end &&
              b(po) == 0 && b(po + 1) == 0 && b(po + 2) == 1) {
              val pesLen = ((b(po + 4) & 0xff) << 8) | (b(po + 5) & 0xff)
              val hdl = b(po + 8) & 0xff
              val ds = po + 9 + hdl
              if (ds <= end) {
                cur(pd) = scala.collection.mutable.ArrayBuffer.empty
                remaining(pd) =
                  if (pesLen > 0) math.max(0L, pesLen.toLong - 3L - hdl) else -1L
                addSpan(pd, ds, end)
              }
            }
          } else if (cur.contains(pd) && po >= 0 && po <= end) {
            addSpan(pd, po, end)
          }
        }
        j += 1
      }
      videoPids.foreach(close)
      videoPids.toSeq.sorted.flatMap(pd => done.get(pd).map(_.toSeq).getOrElse(Nil))
    }

    private def parseBmp(b: Array[Byte]): Option[AvMeta] = {
      // BM(2) + file size(4) + reserved(4) + pixel offset(4) + DIB size(4)
      if (b.length < 26) return None
      if (le32(b, 14) < 40) return None // not a BITMAPINFOHEADER family
      val w = le32(b, 18)
      val h = le32(b, 22) // signed: negative = top-down row order
      if (w > 0 && h != 0)
        Some(AvMeta("bmp", width = Some(w), height = Some(math.abs(h))))
      else None
    }
  }

  /**
   * Unified relational probe over image AND audio containers: one row
   * per media row with whichever header family the BYTES (not the
   * declared mime) parse as — PNG/JPEG via [[ImageHeaders]], then
   * WAV/GIF/BMP via [[AvHeaders]]; NULL columns where the container
   * carries no such field, NULL format where nothing parses. Same
   * partition-local discipline as [[imageMetaTable]]: the blobs never
   * leave their partition, only fixed-shape metadata comes out.
   */
  def avMetaTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val m = ImageHeaders.imageMeta(r.media)
            .map(im => AvMeta(im.format, width = Some(im.width), height = Some(im.height)))
            .orElse(AvHeaders.avMeta(r.media))
          (r.media_id, r.mime_type,
            if (r.media == null) 0L else r.media.length.toLong,
            m.map(_.format), m.flatMap(_.width), m.flatMap(_.height),
            m.flatMap(_.channels), m.flatMap(_.sampleRate),
            m.flatMap(_.bitsPerSample), m.flatMap(_.durationMs))
        }
      }
      .toDF("media_id", "mime_type", "n_bytes", "format", "width", "height",
        "channels", "sample_rate", "bits", "duration_ms")
  }

  /**
   * Relational face of the AVI video-chunk walk (oracle-checkable):
   * one row per video frame chunk with its byte offset and length in
   * the container, plus a JPEG-signature probe of the chunk payload
   * (an MJPEG AVI carries one complete JPEG per `00dc` chunk). Same
   * partition-local discipline as [[avMetaTable]]: blobs never leave
   * their partition, only fixed-shape chunk coordinates come out.
   */
  def aviFrameTable(spark: SparkSession, media: DataFrame): DataFrame =
    frameTable(spark, media, AvHeaders.aviVideoChunks)

  /** Relational face of the ISO-BMFF sample-table walk
   * ([[AvHeaders.mp4VideoSamples]]): one row per MJPEG video sample
   * with its byte offset and length — [[aviFrameTable]]'s MP4
   * companion, same shape and discipline. */
  def mp4FrameTable(spark: SparkSession, media: DataFrame): DataFrame =
    frameTable(spark, media, AvHeaders.mp4VideoSamples)

  /**
   * Relational face of the H.26x keyframe locator
   * ([[AvHeaders.mp4SyncSamples]]): one row per `stss` sync sample
   * with its 1-based sample number and byte coordinates, plus a probe
   * of the sample payload's first NAL unit header. Both framings an
   * `avc1` sample can carry put that header at payload offset 4 —
   * AVCC length-prefix (4-byte NAL length, then the header) and
   * Annex-B (00 00 00 01 start code, then the header) — and
   * `nal_unit_type` is its low 5 bits; type 5 = IDR slice → `is_idr`.
   * A 100 TB video pipeline shards on exactly these coordinates: the
   * keyframes are where decode can start, located here WITHOUT any
   * codec library. Same partition-local discipline as
   * [[aviFrameTable]]: blobs never leave their partition.
   */
  def mp4KeyframeTable(spark: SparkSession, media: DataFrame): DataFrame =
    keyframeTable(spark, media, AvHeaders.mp4SyncSamplesC)

  /** Shared body of the keyframe TIME tables: the locator returns
   * (sample_no, offset, n_bytes, t_ms ticks-to-ms) with a negative
   * t_ms where the clock was unreadable (mdhd timescale 0/absent) —
   * surfaced as NULL, matching [[tsPtsTable]]'s missing-PTS contract,
   * so a consumer computing min/durations never reads a sentinel as a
   * real timestamp. */
  private def keyframeTimeTable(spark: SparkSession, media: DataFrame,
      locate: Array[Byte] => Seq[(Long, Int, Int, Long)]): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          locate(r.media).map { case (sn, off, len, tMs) =>
            (r.media_id, sn, off.toLong, len.toLong,
              if (tMs >= 0) Some(tMs) else None)
          }
        }
      }
      .toDF("media_id", "sample_no", "offset", "n_bytes", "t_ms")
  }

  /** [[mp4KeyframeTable]] with each keyframe's PRESENTATION START
   * TIME in milliseconds ([[AvHeaders.mp4SyncSampleTimes]]: stts
   * prefix sums over the mdhd timescale) — the time axis a
   * clip-caption pairing op range-joins caption cues against. Same
   * partition-local discipline; only fixed-shape rows move. */
  def mp4KeyframeTimeTable(spark: SparkSession, media: DataFrame): DataFrame =
    keyframeTimeTable(spark, media, AvHeaders.mp4SyncSampleTimes)

  /** [[mp4KeyframeTimeTable]] for FRAGMENTED MP4: each sync sample's
   * decode time from tfdt + trun/tfhd/trex durations over the mdhd
   * timescale ([[AvHeaders.mp4FragmentSyncSampleTimes]]) — the CMAF
   * segment time axis, same shape as the self-contained one so the
   * clip-caption pairing works on either layout. */
  def mp4FragmentedKeyframeTimeTable(spark: SparkSession, media: DataFrame): DataFrame =
    keyframeTimeTable(spark, media, AvHeaders.mp4FragmentSyncSampleTimes)

  /** [[mp4KeyframeTable]] for FRAGMENTED MP4 (CMAF/DASH segments):
   * sync samples located from `moof`/`traf`/`trun` run tables
   * ([[AvHeaders.mp4FragmentSyncSamples]]) instead of the moov stbl.
   * Same output shape and partition-local discipline. */
  def mp4FragmentedKeyframeTable(spark: SparkSession, media: DataFrame): DataFrame =
    keyframeTable(spark, media, AvHeaders.mp4FragmentSyncSamplesC)

  /** Relational face of the Ogg page walk ([[AvHeaders.oggPages]]):
   * one row per page with its byte coordinates, sequence number,
   * granule position and the BOS/EOS flags — the shard list AND time
   * axis of an audio corpus, no codec needed (granules tick on the
   * codec clock; the q_m6 metadata face converts them to durations).
   * Same partition-local discipline as the keyframe tables: blobs
   * never leave their partition. */
  def oggPageTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          AvHeaders.oggPages(r.media).map { case (seq, off, len, g, ht) =>
            (r.media_id, seq, off.toLong, len.toLong, g,
              (ht & 2) != 0, (ht & 4) != 0)
          }
        }
      }
      .toDF("media_id", "page_seq", "offset", "n_bytes", "granule_pos",
        "is_bos", "is_eos")
  }

  /** [[oggPageTable]] plus each page's granule position converted to
   * MILLISECONDS via the BOS packet's clock
   * ([[AvHeaders.oggGranuleClock]]: Opus 48 kHz minus pre-skip,
   * Vorbis the stream rate) — the AUDIO time axis, NULL where the
   * codec is unrecognised or the page carries granule −1 ("no packet
   * ends here"). An Ogg granule is the position where the page's last
   * packet ENDS, so a cue window selecting these t_ms values selects
   * the pages whose audio finishes inside it — the audio shards a
   * transcript aligner fetches. [[Captions.clipCaptionPairs]] takes
   * this table directly. */
  def oggPageTimeTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val clock = AvHeaders.oggGranuleClock(r.media)
          AvHeaders.oggPages(r.media).map { case (seq, off, len, g, ht) =>
            val tMs = clock.collect {
              case (rate, skip) if g >= 0 =>
                math.max(g - skip, 0L) * 1000L / rate
            }
            (r.media_id, seq, off.toLong, len.toLong, g,
              (ht & 2) != 0, (ht & 4) != 0, tMs)
          }
        }
      }
      .toDF("media_id", "page_seq", "offset", "n_bytes", "granule_pos",
        "is_bos", "is_eos", "t_ms")
  }

  /** Relational face of the WebM SimpleBlock walk
   * ([[AvHeaders.webmBlocks]]): one row per block with its track,
   * tick-clock time, frame-data coordinates and the keyframe flag —
   * the third container's shard list (MP4 self-contained + fragmented
   * are the other two). Same partition-local discipline throughout. */
  def webmBlockTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          AvHeaders.webmBlocks(r.media).map { case (bi, track, t, off, len, key) =>
            (r.media_id, bi, track, t, off.toLong, len.toLong, key)
          }
        }
      }
      .toDF("media_id", "block_idx", "track", "time_ticks", "offset",
        "n_bytes", "is_key")
  }

  /** [[webmBlockTable]] plus each block's time in MILLISECONDS —
   * ticks × Segment/Info TimestampScale (ns per tick,
   * [[AvHeaders.webmTimestampScale]]) ÷ 1e6 — the WebM time axis;
   * with the keyframe flag this completes cue pairing across all four
   * video layouts (MP4 self-contained/fragmented, TS, WebM). Same
   * partition-local discipline. */
  def webmBlockTimeTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val ts = AvHeaders.webmTimestampScale(r.media)
          AvHeaders.webmBlocks(r.media).map { case (bi, track, t, off, len, key) =>
            (r.media_id, bi, track, t, off.toLong, len.toLong, key,
              t * ts / 1000000L)
          }
        }
      }
      .toDF("media_id", "block_idx", "track", "time_ticks", "offset",
        "n_bytes", "is_key", "t_ms")
  }

  /** One decoded ANMF animation frame record (animated WebP).
   * `dataOff` is where the frame's subchunks start (ALPH included
   * when present) — the rewrap span for a standalone frame file is
   * [dataOff, chunkOff + chunkBytes). */
  private[ops] final case class AnmfFrame(
      idx: Int, x: Int, y: Int, w: Int, h: Int, durationMs: Int,
      disposeBackground: Boolean, noBlend: Boolean, hasAlpha: Boolean,
      codec: String, chunkOff: Int, chunkBytes: Int, dataOff: Int)

  /** Animated-WebP container walk (the RIFF/WEBP VP8X+ANIM+ANMF
   * extended layout): per ANMF chunk the frame geometry (x/y stored
   * halved, w/h minus-one coded), duration, disposal/blending flags,
   * the frame bitstream's codec (`VP8 ` lossy / VP8L lossless, with
   * an optional preceding ALPH alpha chunk) and the image subchunk's
   * byte span INCLUDING its 8-byte chunk header — the ranged-read
   * coordinates a frame shard rewraps into a standalone decodable
   * WebP. Nil for non-WebP bytes, still images, or on the first
   * malformed chunk — total, never an exception. */
  private[ops] def webpAnmfFrames(b: Array[Byte]): Seq[AnmfFrame] = {
    if (b == null || b.length < 30) return Nil
    def tag(o: Int, t: String): Boolean =
      o + 4 <= b.length && t.indices.forall(i => (b(o + i) & 0xff) == t.charAt(i))
    if (!tag(0, "RIFF") || !tag(8, "WEBP") || !tag(12, "VP8X")) return Nil
    def le24(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)
    def le32(o: Int) = le24(o) | ((b(o + 3) & 0xff) << 24)
    val out = Vector.newBuilder[AnmfFrame]
    var off = 12
    var idx = 0
    var ok = true
    while (ok && off + 8 <= b.length) {
      val sz = le32(off + 4)
      if (sz < 0 || off + 8 + sz > b.length) ok = false
      else {
        if (tag(off, "ANMF") && sz >= 16) {
          val d = off + 8
          // frame data subchunks: optional ALPH, then the image chunk
          var p = d + 16
          val end = d + sz
          var hasAlpha = false
          if (tag(p, "ALPH") && p + 8 <= end) {
            hasAlpha = true
            val asz = le32(p + 4)
            if (asz >= 0 && p + 8 + asz <= end) p += 8 + asz + (asz & 1)
            else p = end
          }
          val codec =
            if (tag(p, "VP8 ")) "vp8"
            else if (tag(p, "VP8L")) "vp8l"
            else null
          if (codec != null && p + 8 <= end) {
            val csz = le32(p + 4).toLong & 0xffffffffL // RIFF sizes are unsigned
            val span = math.min(8 + csz + (csz & 1), (end - p).toLong).toInt
            out += AnmfFrame(idx, 2 * le24(d), 2 * le24(d + 3),
              le24(d + 6) + 1, le24(d + 9) + 1, le24(d + 12),
              disposeBackground = (b(d + 15) & 0x01) != 0,
              noBlend = (b(d + 15) & 0x02) != 0,
              hasAlpha = hasAlpha, codec = codec,
              chunkOff = p, chunkBytes = span, dataOff = d + 16)
            idx += 1
          }
        }
        off += 8 + sz + (sz & 1)
      }
    }
    out.result()
  }

  /** Rewrap one ANMF frame's subchunks (ALPH when present + the
   * image chunk) as a standalone RIFF/WEBP file — a complete
   * decodable image any WebP decoder (incl. libwebp and the in-repo
   * Vp8/Vp8l) reads; the frame-sampling analogue of the animated-GIF
   * PNG re-encode. */
  private[ops] def webpFrameFile(b: Array[Byte], f: AnmfFrame): Array[Byte] = {
    val end = f.chunkOff + f.chunkBytes
    val body = 4 + (end - f.dataOff)
    val out = new Array[Byte](8 + body)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    out(4) = (body & 0xff).toByte; out(5) = ((body >> 8) & 0xff).toByte
    out(6) = ((body >> 16) & 0xff).toByte; out(7) = ((body >> 24) & 0xff).toByte
    out(8) = 'W'; out(9) = 'E'; out(10) = 'B'; out(11) = 'P'
    System.arraycopy(b, f.dataOff, out, 12, end - f.dataOff)
    out
  }

  /** VP8X canvas dims (minus-one coded 24-bit LE) + the ANIM loop
   * count; None when the file isn't an animated VP8X WebP. */
  private[ops] def webpAnimCanvas(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b == null || b.length < 30) return None
    def tag(o: Int, t: String): Boolean =
      o + 4 <= b.length && t.indices.forall(i => (b(o + i) & 0xff) == t.charAt(i))
    if (!tag(0, "RIFF") || !tag(8, "WEBP") || !tag(12, "VP8X")) return None
    def le24(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)
    def le32(o: Int) = le24(o) | ((b(o + 3) & 0xff) << 24)
    val vp8xSz = le32(16)
    if (vp8xSz < 10 || 20 + vp8xSz > b.length) return None
    if ((b(20) & 0x02) == 0) return None // animation flag
    val cw = le24(24) + 1
    val ch = le24(27) + 1
    var off = 20 + vp8xSz + (vp8xSz & 1)
    while (off + 8 <= b.length) {
      val sz = le32(off + 4)
      if (sz < 0 || off + 8 + sz > b.length) return None
      if (tag(off, "ANIM") && sz >= 6)
        return Some((cw, ch, (b(off + 12) & 0xff) | ((b(off + 13) & 0xff) << 8)))
      off += 8 + sz + (sz & 1)
    }
    None
  }

  /** Relational face of the animated-WebP walk (q_m35): one row per
   * ANMF frame with geometry, timing, flags, codec and the
   * standalone-rewrappable chunk span, plus the file-level canvas
   * dims and loop count — the image analogue of the video keyframe
   * shard lists: what a multimodal pipeline ranges-reads to train on
   * animation frames. Pure map-side, blobs never shuffle. */
  def webpAnimTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          webpAnimCanvas(r.media) match {
            case None => Iterator.empty
            case Some((cw, ch, loop)) =>
              webpAnmfFrames(r.media).iterator.map { f =>
                (r.media_id, f.idx, f.x, f.y, f.w, f.h, f.durationMs,
                  f.disposeBackground, f.noBlend, f.hasAlpha, f.codec,
                  f.chunkOff.toLong, f.chunkBytes.toLong, cw, ch, loop)
              }
          }
        }
      }
      .toDF("media_id", "frame_idx", "frame_x", "frame_y", "frame_w",
        "frame_h", "duration_ms", "dispose_background", "no_blend",
        "has_alpha", "codec", "chunk_offset", "chunk_bytes",
        "canvas_w", "canvas_h", "loop_count")
  }

  /** One parsed animated-GIF frame: geometry from the image
   * descriptor, timing/disposal from the PRECEDING Graphic Control
   * Extension (absent → delay 0, disposal 0 per GIF89a). */
  private[graft] final case class GifFrame(idx: Int, x: Int, y: Int,
      w: Int, h: Int, delayCs: Int, disposal: Int, interlaced: Boolean,
      hasLct: Boolean,
      // pixel-path coordinates (round 18): the frame's local color
      // table span, the LZW min-code byte offset, and the GCE
      // transparent index (-1 = opaque)
      lctOff: Int = -1, lctLen: Int = 0, lzwOff: Int = -1,
      transp: Int = -1)

  /** Structural animated-GIF walk (GIF89a) — no LZW decode: header +
   * logical screen descriptor (+GCT by its packed size), then the
   * block grammar: extensions (GCE timing captured; NETSCAPE loop
   * count captured; comment/plain-text skipped by their own
   * sub-block framing), image descriptors (+LCT), and each image's
   * data sub-block chain hopped length byte by length byte. Returns
   * (canvas_w, canvas_h, loop_count, frames); the walk ends at the
   * trailer, a malformed block, or a sub-block overrunning the file
   * — complete frames stay claimed (the q_m35 totality rule). */
  private[graft] def gifAnim(b: Array[Byte]): Option[(Int, Int, Int, Seq[GifFrame])] = {
    if (b == null || b.length < 13 || b(0) != 'G' || b(1) != 'I' ||
      b(2) != 'F' || b(3) != '8' || (b(4) != '7' && b(4) != '9') ||
      b(5) != 'a') return None
    def u16(p: Int): Int = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    val cw = u16(6)
    val ch = u16(8)
    val packed = b(10) & 0xff
    var p = 13 + (if ((packed & 0x80) != 0) 3 << ((packed & 7) + 1) else 0)
    /** hop a sub-block chain; -1 on overrun */
    def skipSubBlocks(start: Int): Int = {
      var q = start
      while (q < b.length && b(q) != 0) {
        q += 1 + (b(q) & 0xff)
      }
      if (q >= b.length) -1 else q + 1
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[GifFrame]
    var loop = 0
    var delay = 0
    var disposal = 0
    var transp = -1
    var ok = true
    while (ok && p < b.length && (b(p) & 0xff) != 0x3B) {
      (b(p) & 0xff) match {
        case 0x21 if p + 1 < b.length =>
          val label = b(p + 1) & 0xff
          if (label == 0xF9 && p + 8 <= b.length && (b(p + 2) & 0xff) == 4) {
            // GCE: fixed 8 bytes (intro, label, size 4, packed,
            // delay LE16 in centiseconds, transparent idx, 0)
            disposal = ((b(p + 3) & 0xff) >> 2) & 7
            delay = u16(p + 4)
            transp = if ((b(p + 3) & 1) != 0) b(p + 6) & 0xff else -1
            p += 8
          } else if (label == 0xFF && p + 14 <= b.length &&
            (b(p + 2) & 0xff) == 11 &&
            new String(b, p + 3, 11, java.nio.charset.StandardCharsets.US_ASCII)
              .startsWith("NETSCAPE")) {
            // application extension: data sub-block 03 01 loop LE16
            if (p + 19 <= b.length && (b(p + 14) & 0xff) == 3 &&
              (b(p + 15) & 0xff) == 1) loop = u16(p + 16)
            val next = skipSubBlocks(p + 14)
            if (next < 0) ok = false else p = next
          } else {
            // generic extension (comment, plain text, unknown app):
            // label then sub-blocks, skipped by their own framing
            val after = skipSubBlocks(p + 2)
            if (after < 0) ok = false else p = after
          }
        case 0x2C if p + 10 <= b.length =>
          val ipacked = b(p + 9) & 0xff
          val lct = (ipacked & 0x80) != 0
          val lctLen = if (lct) 3 << ((ipacked & 7) + 1) else 0
          val dataStart = p + 10 + lctLen + 1 // + LZW min-code byte
          if (dataStart > b.length) ok = false
          else {
            val after = skipSubBlocks(dataStart)
            if (after < 0) ok = false
            else {
              frames += GifFrame(frames.size, u16(p + 1), u16(p + 3),
                u16(p + 5), u16(p + 7), delay, disposal,
                (ipacked & 0x40) != 0, lct,
                lctOff = if (lct) p + 10 else -1, lctLen = lctLen,
                lzwOff = p + 10 + lctLen, transp = transp)
              delay = 0; disposal = 0; transp = -1 // GCE: ONE image
              p = after
            }
          }
        case _ => ok = false
      }
    }
    Some((cw, ch, loop, frames.toSeq))
  }

  /** Relational face of [[gifAnim]] (q_m39): one row per animation
   * frame with geometry, timing, disposal and the file-level canvas
   * and NETSCAPE loop count — the GIF twin of the animated-WebP
   * table (q_m35). Pure map-side structural walk, no LZW decode. */
  def gifAnimTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          gifAnim(r.media) match {
            case None => Iterator.empty
            case Some((cw, ch, loop, frames)) =>
              frames.iterator.map { f =>
                (r.media_id, f.idx, f.x, f.y, f.w, f.h, f.delayCs,
                  f.disposal, f.interlaced, f.hasLct, cw, ch, loop)
              }
          }
        }
      }
      .toDF("media_id", "frame_idx", "frame_x", "frame_y", "frame_w",
        "frame_h", "delay_cs", "disposal", "interlaced", "has_lct",
        "canvas_w", "canvas_h", "loop_count")
  }

  /** GIF LZW decode (GIF89a §22 / Appendix F): variable-width codes
   * read LSB-first across the data sub-block chain, clear/end codes,
   * dictionary to 4096 entries with the width bump at each power of
   * two (deferred-clear streams — width capped at 12 with the table
   * full — decode fine). Returns EXACTLY `npix` pixel indices;
   * anything short, long, or structurally corrupt claims nothing
   * (tolerance — a bad frame is a skipped frame, never a throw).
   * `start` is the offset of the LZW minimum-code-size byte. */
  private[graft] def gifLzwDecode(b: Array[Byte], start: Int,
      npix: Int): Option[Array[Byte]] = {
    if (b == null || start < 0 || start >= b.length || npix <= 0) return None
    val minCode = b(start) & 0xff
    if (minCode < 2 || minCode > 8) return None
    val clear = 1 << minCode
    val endCode = clear + 1
    var blockPos = start + 1
    var pos = 0
    var blockEnd = 0
    def nextDataByte(): Int = {
      if (pos >= blockEnd) {
        if (blockPos >= b.length) return -1
        val len = b(blockPos) & 0xff
        if (len == 0) return -1 // chain terminator
        if (blockPos + 1 + len > b.length) return -1
        pos = blockPos + 1
        blockEnd = pos + len
        blockPos = blockEnd
      }
      val v = b(pos) & 0xff
      pos += 1
      v
    }
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    def firstOf(c0: Int): Byte = {
      var c = c0
      while (c >= clear + 2) c = prefix(c)
      c.toByte
    }
    val out = new Array[Byte](npix)
    val stack = new Array[Byte](4097)
    var outN = 0
    var codeSize = minCode + 1
    var free = clear + 2
    var oldCode = -1
    var bitBuf = 0
    var bitCnt = 0
    while (outN < npix) {
      while (bitCnt < codeSize) {
        val nb = nextDataByte()
        if (nb < 0) return None // ran dry before npix pixels
        bitBuf |= nb << bitCnt
        bitCnt += 8
      }
      val code = bitBuf & ((1 << codeSize) - 1)
      bitBuf >>>= codeSize
      bitCnt -= codeSize
      if (code == clear) {
        codeSize = minCode + 1
        free = clear + 2
        oldCode = -1
      } else if (code == endCode) {
        return None // early end: the descriptor promised npix
      } else {
        var sp = 0
        var cur = code
        if (code >= free) {
          // the KwKwK case: only the NEXT free slot is legal
          if (code != free || oldCode < 0) return None
          stack(sp) = firstOf(oldCode); sp += 1
          cur = oldCode
        }
        while (cur >= clear + 2) {
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
          if (sp > 4096) return None // cycle guard
        }
        if (cur >= clear) return None // corrupt chain into clear/end
        val first = cur.toByte
        stack(sp) = first; sp += 1
        if (outN + sp > npix) return None // more pixels than promised
        while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
        if (oldCode >= 0 && free < 4096) {
          prefix(free) = oldCode
          suffix(free) = first
          free += 1
          if (free == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        oldCode = code
      }
    }
    Some(out)
  }

  /** GIF interlace row order (GIF89a Appendix E): pass 1 every 8th
   * row from 0, pass 2 every 8th from 4, pass 3 every 4th from 2,
   * pass 4 every 2nd from 1. */
  private[graft] def gifInterlaceRows(h: Int): Array[Int] =
    (Seq(0 until h by 8, 4 until h by 8, 2 until h by 4, 1 until h by 2)
      .flatten).toArray

  /** Composited per-frame dHash of an animated GIF (q_m42) — the
   * full pixel twin of [[gifAnim]]'s structural walk: each frame's
   * indices LZW-decode, map through the local-else-global color
   * table (transparent index skipped), composite onto the canvas at
   * the frame rect (interlace rows reordered), and the CANVAS at
   * that render moment dHashes with the image family's grid hash;
   * disposal then applies (2 = clear the rect to the black initial
   * state, 3 = restore the pre-frame canvas). Frames that fail to
   * decode are skipped — claimed frames are real pixels, never
   * guesses. Canvas bounded at 16 MP (a hostile header can't
   * allocate the task away). */
  private[graft] def gifFrameHashes(b: Array[Byte]): Seq[(Int, String)] =
    gifAnim(b) match {
      case None => Nil
      case Some((cw, ch, _, frames)) =>
        if (cw <= 0 || ch <= 0 || cw.toLong * ch > 16000000L) Nil
        else {
          val packed = b(10) & 0xff
          val gctOff = if ((packed & 0x80) != 0) 13 else -1
          val gctLen = if (gctOff > 0) 3 << ((packed & 7) + 1) else 0
          val canvas = new Array[Int](cw * ch) // 0x000000 = black
          val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
          frames.foreach { f =>
            val palOff = if (f.hasLct) f.lctOff else gctOff
            val palLen = if (f.hasLct) f.lctLen else gctLen
            val nColors = palLen / 3
            if (palOff >= 0 && f.w > 0 && f.h > 0 &&
              f.w.toLong * f.h <= 16000000L &&
              palOff + palLen <= b.length) {
              gifLzwDecode(b, f.lzwOff, f.w * f.h).foreach { idx =>
                val saved = if (f.disposal == 3) canvas.clone() else null
                val rows =
                  if (f.interlaced) gifInterlaceRows(f.h)
                  else Array.tabulate(f.h)(identity)
                var ry = 0
                while (ry < f.h) {
                  val cy = f.y + rows(ry)
                  var x = 0
                  while (x < f.w) {
                    val cx = f.x + x
                    val ci = idx(ry * f.w + x) & 0xff
                    if (ci != f.transp && ci < nColors &&
                      cx < cw && cy < ch) {
                      val o = palOff + 3 * ci
                      canvas(cy * cw + cx) = ((b(o) & 0xff) << 16) |
                        ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)
                    }
                    x += 1
                  }
                  ry += 1
                }
                val img = new java.awt.image.BufferedImage(cw, ch,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                img.setRGB(0, 0, cw, ch, canvas, 0, cw)
                out += ((f.idx, ImageHash.bandsHex(ImageHash.dhashOfImage(img))))
                f.disposal match {
                  case 2 => // restore the covered rect to background
                    var ry2 = 0
                    while (ry2 < f.h) {
                      val cy = f.y + ry2
                      var x = 0
                      while (x < f.w) {
                        val cx = f.x + x
                        if (cx < cw && cy < ch) canvas(cy * cw + cx) = 0
                        x += 1
                      }
                      ry2 += 1
                    }
                  case 3 => if (saved != null)
                    System.arraycopy(saved, 0, canvas, 0, canvas.length)
                  case _ => ()
                }
              }
            }
          }
          out.toSeq
        }
    }

  /** Relational face of [[gifFrameHashes]] (q_m42): per animation
   * frame the composited-canvas dHash — what lets animated GIFs
   * feed the perceptual near-dup family frame-by-frame, the pixel
   * completion of the q_m39 structural walk. Pure map-side. */
  def gifFrameHashTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          gifFrameHashes(r.media).map { case (fi, hx) => (r.media_id, fi, hx) }
        }
      }
      .toDF("media_id", "frame_idx", "dhash_hex")
  }

  /** Relational face of the MP3 frame walk ([[AvHeaders.mp3Frames]]):
   * one row per audio frame with its byte coordinates and a sync-word
   * probe — frame boundaries are where a real decoder can start, so
   * this is the MP3 shard list, located from the public header tables
   * with no codec. Same partition-local discipline throughout. */
  def mp3FrameTable(spark: SparkSession, media: DataFrame): DataFrame =
    bitstreamFrameTable(spark, media, AvHeaders.mp3Frames)

  /** [[mp3FrameTable]]'s AAC/ADTS sibling
   * ([[AvHeaders.adtsFrames]]): same shape, same discipline. */
  def adtsFrameTable(spark: SparkSession, media: DataFrame): DataFrame =
    bitstreamFrameTable(spark, media, AvHeaders.adtsFrames)

  /** Relational face of the FLAC walk: one row per audio frame
   * (located by [[AvHeaders.flacFrames]]' sync scan) carrying the
   * file's STREAMINFO identity ([[AvHeaders.flacStreamInfo]]) —
   * sample rate, channels, bit depth, total samples and the derived
   * duration — so one query yields both the shard list and the
   * audio-corpus metadata a speech pipeline filters on. Same
   * partition-local discipline as every walker here. */
  def flacFrameTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          AvHeaders.flacStreamInfo(r.media).toSeq.flatMap {
            case (audioOff, sr, ch, bps, total) =>
              AvHeaders.flacFramesFrom(r.media, audioOff).zipWithIndex.map {
                case ((off, len), i) =>
                  (r.media_id, i, off.toLong, len.toLong, sr, ch, bps,
                    total, total * 1000L / sr)
              }
          }
        }
      }
      .toDF("media_id", "frame_idx", "offset", "n_bytes", "sample_rate",
        "channels", "bits", "total_samples", "duration_ms")
  }

  /** Relational face of the MPEG-TS walk ([[AvHeaders.tsPesStarts]]):
   * one row per video PES start with its packet index, byte offset,
   * elementary PID, the adaptation field's random_access_indicator
   * (the TS keyframe mark an HLS segmenter cuts on) and a PES
   * start-code probe — the `.ts` shard list, completing the container
   * set beside the MP4/WebM/Ogg/MP3/ADTS walkers. Same
   * partition-local discipline: blobs never leave their partition. */
  def tsPesTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          AvHeaders.tsPesStarts(r.media).zipWithIndex.map {
            case ((pkt, off, pid, rai, isPes), i) =>
              (r.media_id, i, pkt, off, pid, rai, isPes)
          }
        }
      }
      .toDF("media_id", "pes_idx", "packet_idx", "offset", "pid",
        "rai", "is_pes")
  }

  /** [[tsPesTable]] plus each PES's presentation time in ms from the
   * header's 33-bit/90 kHz PTS ([[AvHeaders.tsPesStartsPts]]) — the
   * `.ts` time axis, NULL where the header carries no PTS. Gives TS
   * segments the same cue-pairing surface the MP4 keyframe time table
   * gives MP4 ([[Captions.clipCaptionPairs]] takes either). */
  def tsPtsTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          AvHeaders.tsPesStartsPts(r.media).zipWithIndex.map {
            case ((pkt, off, pid, rai, isPes, ptsMs), i) =>
              (r.media_id, i, pkt, off, pid, rai, isPes,
                if (ptsMs >= 0) Some(ptsMs) else None)
          }
        }
      }
      .toDF("media_id", "pes_idx", "packet_idx", "offset", "pid",
        "rai", "is_pes", "t_ms")
  }

  private def bitstreamFrameTable(spark: SparkSession, media: DataFrame,
      locate: Array[Byte] => Seq[(Int, Int)]): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          locate(r.media).zipWithIndex.map { case ((off, len), idx) =>
            val isSync = len >= 2 && (r.media(off) & 0xff) == 0xff &&
              (r.media(off + 1) & 0xe0) == 0xe0
            (r.media_id, idx, off.toLong, len.toLong, isSync)
          }
        }
      }
      .toDF("media_id", "frame_idx", "offset", "n_bytes", "is_sync")
  }

  /** `is_idr` probe per codec family: both MP4 framings (AVCC/HVCC
   * length prefix, Annex-B start code) put the first NAL header at
   * payload offset 4. AVC's `nal_unit_type` is the header byte's low
   * 5 bits (5 = IDR slice); HEVC's is bits 1–6 of the first of its
   * TWO header bytes (19 = IDR_W_RADL, 20 = IDR_N_LP,
   * ISO/IEC 23008-2 §7.4.2). h263/s263 bitstreams are not NAL-based
   * at all, so the probe answers NULL rather than reading an AVC mask
   * into a GOB header. */
  private[ops] def isIdrProbe(media: Array[Byte], off: Int, len: Int,
      codec: String): Option[Boolean] = codec match {
    case "avc1" | "avc3" =>
      Some(len >= 5 && (media(off + 4) & 0x1f) == 5)
    case "hvc1" | "hev1" =>
      Some(len >= 5 && {
        val t = (media(off + 4) >> 1) & 0x3f
        t == 19 || t == 20
      })
    case _ => None
  }

  private def keyframeTable(spark: SparkSession, media: DataFrame,
      locate: Array[Byte] => Seq[(Long, Int, Int, String)]): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          locate(r.media).map { case (sn, off, len, codec) =>
            (r.media_id, sn, off.toLong, len.toLong,
              isIdrProbe(r.media, off, len, codec))
          }
        }
      }
      .toDF("media_id", "sample_no", "offset", "n_bytes", "is_idr")
  }

  private def frameTable(spark: SparkSession, media: DataFrame,
      locate: Array[Byte] => Seq[(Int, Int)]): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          locate(r.media).zipWithIndex.map {
            case ((off, len), idx) =>
              val isJpeg = len >= 3 && (r.media(off) & 0xff) == 0xff &&
                (r.media(off + 1) & 0xff) == 0xd8 && (r.media(off + 2) & 0xff) == 0xff
              (r.media_id, idx, off.toLong, len.toLong, isJpeg)
          }
        }
      }
      .toDF("media_id", "frame_idx", "offset", "n_bytes", "is_jpeg")
  }

  /** Extracted features: fixed shape regardless of codec. */
  case class MediaFeatures(
      media_id: Long,
      mime_type: String,
      n_bytes: Long,
      byte_entropy: Double,
      feature: Array[Float])

  /** Decoder boundary. Image payloads get a REAL pixel decode through
   * the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP readers ship with the
   * JRE — no external codec dependency), reduced to a deterministic
   * 4x4 mean-luminance grid as the fixed-dim feature. Audio payloads
   * get a REAL sample decode — WAV/AIFF/AU linear PCM and compressed
   * G.711 mu-law/A-law parsed directly (pure public byte formats,
   * lock-free), anything else the JDK sound stack can read via
   * [[decodeAudioSampled]] — reduced to a mean-amplitude envelope of
   * the same shape. Everything else (perceptual codecs, text, corrupt
   * containers) falls back to the deterministic byte-hash
   * pseudo-feature so the pipeline stays total and testable; a real
   * deployment swaps [[byteHashFeature]] for an ffmpeg-style codec at
   * this one seam. */
  object MediaCodec {
    // every blob is an in-memory byte array: ImageIO's default
    // DISK-backed stream cache writes a temp file per read — per-row
    // filesystem traffic that dominated the 50k-shard decode probe
    // once non-ImageIO containers (WebP) entered the mix
    javax.imageio.ImageIO.setUseCache(false)

    val FeatureDim = 16
    private val GridW = 4
    private val GridH = 4 // GridW * GridH == FeatureDim

    /** Decode + featurize: mean-luminance grid for decodable images,
     * mean-amplitude envelope for decodable audio — direct lock-free
     * parsers for WAV/AIFF/AU linear PCM and G.711 mu-law/A-law
     * ([[decodeAudio]]), then the JDK sound stack for anything else it
     * can read ([[decodeAudioSampled]]) — byte-hash fake otherwise.
     * Total — corrupt bytes are a fallback, never an exception (a
     * crashing row is a lost partition). */
    def decode(bytes: Array[Byte]): Array[Float] =
      decodeImage(bytes).map(luminanceGrid(_, GridW, GridH))
        .orElse(decodeAudio(bytes))
        .orElse(decodeAudioSampled(bytes))
        .getOrElse(byteHashFeature(bytes))

    /** IMA/DVI ADPCM step and index tables (public-domain standard —
     * the classic 4-bit telephony/game codec). Shared by the decoder
     * here and the fixture encoder (two directions of the same
     * standard; MultimodalSpec round-trips them). */
    private[graft] val ImaStepTable: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
      34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
      157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
      598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
      1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
      5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635,
      13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
    private[graft] val ImaIndexTable: Array[Int] =
      Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

    /** One IMA ADPCM reconstruction step: returns the new predictor
     * for `nibble` given the current (predictor, stepIndex); the
     * caller advances stepIndex via [[ImaIndexTable]]. Used by decode
     * AND the fixture encoder (the standard defines reconstruction
     * once — the encoder embeds the decoder). */
    private[graft] def imaReconstruct(predictor: Int, stepIndex: Int, nibble: Int): Int = {
      val step = ImaStepTable(stepIndex)
      var vpdiff = step >> 3
      if ((nibble & 4) != 0) vpdiff += step
      if ((nibble & 2) != 0) vpdiff += step >> 1
      if ((nibble & 1) != 0) vpdiff += step >> 2
      val next = if ((nibble & 8) != 0) predictor - vpdiff else predictor + vpdiff
      math.max(-32768, math.min(32767, next))
    }

    /**
     * REAL IMA ADPCM decode for WAV format tag 17 — a genuinely
     * compressed (4 bits/sample, adaptive-step DPCM) codec the JDK
     * sound stack does NOT read, decoded here from the public
     * standard: per block and channel, a 4-byte header seeds the
     * predictor/step index, then 4-byte nibble groups interleave
     * across channels (low nibble first). Returns (channels,
     * interleaved 16-bit frames) — shared by the feature envelope and
     * the fingerprint path ([[graft.ops.AudioFp.monoSamples]]). None
     * for non-ADPCM WAV or malformed block structure — total, never
     * an exception.
     */
    private[ops] def adpcmSamples(bytes: Array[Byte]): Option[(Int, Array[Short])] =
      AvHeaders.wavAdpcm(bytes).flatMap { case (channels, blockAlign, off, len) =>
        val headerBytes = 4 * channels
        if (blockAlign <= headerBytes || blockAlign % (4 * channels) != 0) return None
        val samplesPerBlock = (blockAlign - headerBytes) * 2 / channels + 1
        val avail = math.min(len, bytes.length - off)
        val nBlocks = avail / blockAlign
        val nFrames = nBlocks * samplesPerBlock
        if (nFrames <= 0) return None
        val out = new Array[Short](nFrames * channels)
        val predictor = new Array[Int](channels)
        val stepIdx = new Array[Int](channels)
        var frame = 0
        var b = 0
        while (b < nBlocks) {
          val blockStart = off + b * blockAlign
          var c = 0
          while (c < channels) {
            val h = blockStart + c * 4
            predictor(c) = ((bytes(h + 1) << 8) | (bytes(h) & 0xff)).toShort.toInt
            stepIdx(c) = math.max(0, math.min(88, bytes(h + 2) & 0xff))
            c += 1
          }
          // frame 0 of the block is the header predictor itself
          var k = 0
          while (k < channels) { out(frame * channels + k) = predictor(k).toShort; k += 1 }
          frame += 1
          // nibble data: 4-byte groups round-robin across channels;
          // each group holds 8 consecutive samples for its channel
          val dataBytes = blockAlign - headerBytes
          val groups = dataBytes / 4
          val groupSamples = Array.ofDim[Int](channels, 8)
          var g = 0
          var emittedInBlock = 1
          while (g < groups) {
            val ch = g % channels
            val gOff = blockStart + headerBytes + g * 4
            var i = 0
            while (i < 8) {
              val byte = bytes(gOff + i / 2) & 0xff
              val nib = if (i % 2 == 0) byte & 0x0f else byte >> 4
              predictor(ch) = imaReconstruct(predictor(ch), stepIdx(ch), nib)
              stepIdx(ch) = math.max(0, math.min(88, stepIdx(ch) + ImaIndexTable(nib)))
              groupSamples(ch)(i) = predictor(ch)
              i += 1
            }
            // after each full round of channel groups, 8 frames complete
            if (ch == channels - 1) {
              var s = 0
              while (s < 8 && emittedInBlock < samplesPerBlock) {
                var k = 0
                while (k < channels) {
                  out(frame * channels + k) = groupSamples(k)(s).toShort
                  k += 1
                }
                frame += 1
                emittedInBlock += 1
                s += 1
              }
            }
            g += 1
          }
          b += 1
        }
        Some((channels, out))
      }

    /** [[adpcmSamples]] reduced to the shared amplitude envelope. */
    private def adpcmEnvelope(bytes: Array[Byte]): Option[Array[Float]] =
      adpcmSamples(bytes).flatMap { case (channels, samples) =>
        envelopeOf(samples.length / channels, channels) { (f, c) =>
          math.abs(samples(f * channels + c) / 32768f)
        }
      }

    /** G.711 mu-law decode table (256 entries, the public standard's
     * exponent/mantissa expansion) — table decode makes companded
     * audio a LOCK-FREE hot path: routing it through the JDK sound
     * stack serialized on AudioSystem's provider lookup (measured
     * 1.1k → 1.7k blobs/s from 1 → 32 threads; the table path scales
     * linearly). */
    private[ops] val UlawTable: Array[Short] = Array.tabulate(256) { i =>
      val u = ~i & 0xff
      val exp = (u >> 4) & 7
      val mant = u & 0x0f
      val mag = (((mant << 3) + 0x84) << exp) - 0x84
      (if ((u & 0x80) != 0) -mag else mag).toShort
    }

    /** G.711 A-law decode table (0x55 toggle, segment expansion;
     * bit 7 set = positive). */
    private[ops] val AlawTable: Array[Short] = Array.tabulate(256) { i =>
      val a = i ^ 0x55
      val seg = (a >> 4) & 7
      val mant = a & 0x0f
      val mag = if (seg == 0) (mant << 4) + 8 else ((mant << 4) + 0x108) << (seg - 1)
      (if ((a & 0x80) != 0) mag else -mag).toShort
    }

    /** Shared mean-|amplitude| envelope accumulator: `ampAt(frame,
     * channel)` in [0,1] per sample, averaged across channels into
     * [[FeatureDim]] time cells. */
    private def envelopeOf(nFrames: Int, channels: Int)(
        ampAt: (Int, Int) => Float): Option[Array[Float]] = {
      if (nFrames <= 0) return None
      val out = new Array[Float](FeatureDim)
      val counts = new Array[Int](FeatureDim)
      var f = 0
      while (f < nFrames) {
        var acc = 0f
        var c = 0
        while (c < channels) { acc += ampAt(f, c); c += 1 }
        val cell = math.min((f.toLong * FeatureDim / nFrames).toInt, FeatureDim - 1)
        out(cell) += acc / channels
        counts(cell) += 1
        f += 1
      }
      var i = 0
      while (i < FeatureDim) {
        if (counts(i) > 0) out(i) /= counts(i)
        i += 1
      }
      Some(out)
    }

    /**
     * Real sample decode for WAV, AIFF and AU containers — pure public
     * byte formats, no codec library, no shared locks: linear PCM
     * (WAV LE 8-bit-unsigned/16/24/32-bit and IEEE float32; AIFF BE
     * 8-bit-SIGNED/16-bit; AU BE 8/16-bit) and G.711 A-law / mu-law
     * (genuinely compressed, logarithmically companded — expanded
     * through 256-entry tables)
     * from the container's data chunk, located by the format's own
     * chunk/box walk. Samples are averaged across channels and reduced
     * to a [[FeatureDim]]-cell mean-|amplitude| envelope in [0,1] —
     * the audio analogue of the luminance grid, and the same fixed
     * feature shape. None for other containers/codecs or truncated
     * payloads ([[decodeAudioSampled]] then has a shot via the JDK
     * sound stack before the byte-hash fallback).
     */
    def decodeAudio(bytes: Array[Byte]): Option[Array[Float]] =
      wavEnvelope(bytes).orElse(adpcmEnvelope(bytes))
        .orElse(aiffEnvelope(bytes)).orElse(auEnvelope(bytes))
        .orElse(Flac.envelope(bytes)) // real FLAC decode (graft.ops.Flac)

    private def wavEnvelope(bytes: Array[Byte]): Option[Array[Float]] =
      AvHeaders.wavSamples(bytes).flatMap { case (fmtTag, channels, bits, off, len) =>
        val bytesPerSample = bits / 8
        val frameBytes = channels * bytesPerSample
        val nFrames = math.min(len, bytes.length - off) / frameBytes
        envelopeOf(nFrames, channels) { (f, c) =>
          val o = off + f * frameBytes + c * bytesPerSample
          math.abs(AvHeaders.wavSampleAt(bytes, fmtTag, bits, o))
        }
      }

    private def aiffEnvelope(bytes: Array[Byte]): Option[Array[Float]] =
      AvHeaders.aiffSamples(bytes).flatMap { case (channels, bits, off, len, codec) =>
        val bytesPerSample = bits / 8
        val frameBytes = channels * bytesPerSample
        val nFrames = math.min(len, bytes.length - off) / frameBytes
        envelopeOf(nFrames, channels) { (f, c) =>
          val o = off + f * frameBytes + c * bytesPerSample
          math.abs(AvHeaders.aiffSampleAt(bytes, codec, bits, o))
        }
      }

    private def auEnvelope(bytes: Array[Byte]): Option[Array[Float]] =
      AvHeaders.auSamples(bytes).flatMap { case (enc, channels, off, len) =>
        val bytesPerSample = AvHeaders.auBytesPer(enc)
        val frameBytes = channels * bytesPerSample
        val nFrames = math.min(len, bytes.length - off) / frameBytes
        envelopeOf(nFrames, channels) { (f, c) =>
          val o = off + f * frameBytes + c * bytesPerSample
          math.abs(AvHeaders.auSampleAt(bytes, enc, o))
        }
      }

    /** Magic gate for [[decodeAudioSampled]]: only containers where
     * the JDK sound stack can decode something the direct parsers
     * don't already cover — AIFC variants and high-resolution AU
     * encodings. WAV is deliberately ABSENT: the JDK's WAV reader
     * handles only PCM and G.711, all of which [[decodeAudio]] decodes
     * directly, so routing any WAV here would re-introduce the
     * AudioSystem provider lock for formats the stack rejects anyway
     * (e.g. MS-ADPCM, MP3-in-WAV). Everything else skips the
     * AudioSystem sniff entirely, so the common case (text/junk
     * payloads) never pays exception-control-flow cost. */
    private def sampledAudioMagic(b: Array[Byte]): Boolean =
      b.length >= 12 && (
        (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
          b(8) == 'A' && b(9) == 'I' && b(10) == 'F') || // AIFF / AIFC
        (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd')) // AU

    /** Bound on the decoded-PCM bytes [[decodeAudioSampled]] will pull
     * through the converter: the envelope of a longer clip is computed
     * over this prefix (64 MiB ≈ 6 min of 16-bit stereo at 44.1 kHz) —
     * a cap, not a failure, so a pathological duration claim cannot
     * balloon executor memory. */
    private val MaxSampledPcmBytes = 64 * 1024 * 1024

    /**
     * Residual sample decode through the JDK sound stack
     * (`javax.sound.sampled` ships with the JRE — no external codec):
     * whatever [[decodeAudio]]'s direct parsers decline but
     * `AudioSystem` can still read (e.g. AIFC variants, esoteric AU
     * encodings) decodes to linear PCM via its format conversion and
     * reduces to the same [[FeatureDim]]-cell mean-|amplitude|
     * envelope. NOT the hot path: AudioSystem's provider lookup takes
     * a process-wide lock (measured 1.1k → 1.7k blobs/s from 1 → 32
     * threads), which is why WAV/AIFF/AU PCM and G.711 decode
     * directly — lock-free, table-expanded — in [[decodeAudio]]
     * instead. None for anything the stack can't read — total, never
     * an exception.
     */
    def decodeAudioSampled(bytes: Array[Byte]): Option[Array[Float]] =
      if (bytes == null || !sampledAudioMagic(bytes)) None
      else decodeAudioViaJdk(bytes)

    /** The AudioSystem decode itself, no magic gate — exposed within
     * the package so the spec can cross-check the direct parsers
     * against the JDK's decoders on containers (WAV G.711) the
     * production gate deliberately keeps off this locked path. */
    private[graft] def decodeAudioViaJdk(bytes: Array[Byte]): Option[Array[Float]] = {
      if (bytes == null) return None
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val base = ais.getFormat
          val ch = base.getChannels
          if (ch <= 0) return None
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            base.getSampleRate, 16, ch, ch * 2, base.getSampleRate, false)
          val pcmStream =
            if (base.matches(target)) ais
            else javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
          // NOT readNBytes: the JDK's PCM conversion streams can return
          // 0 (not -1) forever on a truncated trailing frame — a
          // 0-byte read here must mean EOF or the loop never ends
          // (fuzzed corrupt WAV headers hang readNBytes in
          // PCMtoPCMCodecStream.read)
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](65536)
          var n = pcmStream.read(buf)
          while (n > 0 && bos.size < MaxSampledPcmBytes) {
            bos.write(buf, 0, n)
            n = pcmStream.read(buf)
          }
          val pcm = bos.toByteArray
          val frameBytes = ch * 2
          val nFrames = pcm.length / frameBytes
          if (nFrames <= 0) return None
          val out = new Array[Float](FeatureDim)
          val counts = new Array[Int](FeatureDim)
          var f = 0
          while (f < nFrames) {
            var acc = 0f
            var c = 0
            while (c < ch) {
              val o = f * frameBytes + c * 2
              acc += math.abs(((pcm(o + 1) << 8) | (pcm(o) & 0xff)).toShort / 32768f)
              c += 1
            }
            val cell = math.min((f.toLong * FeatureDim / nFrames).toInt, FeatureDim - 1)
            out(cell) += acc / ch
            counts(cell) += 1
            f += 1
          }
          var i = 0
          while (i < FeatureDim) {
            if (counts(i) > 0) out(i) /= counts(i)
            i += 1
          }
          Some(out)
        } finally ais.close()
      } catch { case _: Throwable => None }
    }

    /** Real pixel decode: ImageIO (PNG/JPEG/GIF/BMP), then the
     * in-repo WebP decoders the JDK can't read — [[graft.ops.Vp8l]]
     * for RIFF/WEBP/VP8L (lossless) and [[graft.ops.Vp8]] for
     * RIFF/WEBP/`VP8 ` (lossy keyframes, the majority of real-web
     * WebP); None for anything none of them parses (header-only
     * blobs, junk, corrupt streams). */
    def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes == null || bytes.length == 0) None
      else {
        val io =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
          catch { case _: Throwable => None }
        io.orElse(Vp8l.decodeImage(bytes)).orElse(Vp8.decodeImage(bytes))
          .map(img => orientImage(img, exifOrientation(bytes)))
      }

    /** EXIF orientation of the CONTAINER bytes (JPEG APP1 / PNG
     * eXIf) — 1 when absent/unreadable. Decoders never apply
     * orientation themselves (ImageIO included), so without this a
     * phone photo and its upright twin perceptually hash apart. */
    private[ops] def exifOrientation(bytes: Array[Byte]): Int = {
      val meta =
        if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
          (bytes(1) & 0xff) == 0xd8) ImageHeaders.exifMeta(bytes)
        else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 &&
          bytes(1) == 'P') ImageHeaders.pngExifMeta(bytes)
        else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I')
          ImageHeaders.webpExifMeta(bytes)
        else ImageHeaders.ExifMeta(None, None, None)
      meta.orientation.getOrElse(1)
    }

    /** Apply a TIFF/EXIF orientation (1..8) to a decoded image —
     * rotate-before-train: display(x,y) = stored(u,v) per the TIFF
     * 6.0 orientation table (2 = flip H, 3 = 180°, 4 = flip V,
     * 5 = transpose, 6 = 90° CW, 7 = transverse, 8 = 270° CW; 5-8
     * swap the display dims). Exact integer pixel remap — no
     * resampling, so perceptual hashes of a rotated capture and its
     * upright twin agree bit-for-bit. */
    private[graft] def orientImage(img: java.awt.image.BufferedImage,
        o: Int): java.awt.image.BufferedImage = {
      if (o <= 1 || o > 8) return img
      val w = img.getWidth
      val h = img.getHeight
      val swap = o >= 5
      val (dw, dh) = if (swap) (h, w) else (w, h)
      // always ARGB: re-instantiating an indexed/custom source type
      // would re-quantize through setRGB; ARGB is lossless for all
      val out = new java.awt.image.BufferedImage(dw, dh,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      var y = 0
      while (y < dh) {
        var x = 0
        while (x < dw) {
          val (u, v) = o match {
            case 2 => (w - 1 - x, y)
            case 3 => (w - 1 - x, h - 1 - y)
            case 4 => (x, h - 1 - y)
            case 5 => (y, x)
            case 6 => (y, h - 1 - x)
            case 7 => (w - 1 - y, h - 1 - x)
            case _ => (w - 1 - y, x) // 8
          }
          out.setRGB(x, y, img.getRGB(u, v))
          x += 1
        }
        y += 1
      }
      out
    }

    /** Real per-frame decode for GIF containers — the one ANIMATED
     * format the JDK iterates natively: ImageIO's GIF reader exposes
     * every animation frame via `read(i)`. Nil for anything else
     * (non-GIF magic, header-only blobs, corrupt LZW) — total, never
     * an exception, same lost-partition argument as [[decode]]. */
    def decodeGifFrames(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
      if (bytes == null || bytes.length < 6 ||
        bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != '8')
        return Nil
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        if (iis == null) return Nil
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return Nil
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            (0 until n).flatMap { i =>
              try Option(reader.read(i)) catch { case _: Throwable => None }
            }
          } finally reader.dispose()
        } finally iis.close()
      } catch { case _: Throwable => Nil }
    }

    /** Re-encode a decoded frame as a standalone PNG payload
     * (lossless), so sampled frames are themselves decodable media
     * rows — [[decode]] on a sampled frame gives its real luminance
     * grid. */
    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Rec.601 luminance averaged per grid cell — a fixed-shape,
     * resolution-independent image signature. Pixels are pulled one
     * ROW at a time through the bulk `getRGB` overload: the per-pixel
     * overload re-runs color-model dispatch on every call, which
     * dominated the decode profile (~3× slower on the 50k-blob
     * ScaleProbe media case). */
    def luminanceGrid(img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Float] = {
      val out = new Array[Float](gw * gh)
      val counts = new Array[Int](gw * gh)
      val w = img.getWidth
      val h = img.getHeight
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        val gy = math.min(y * gh / h, gh - 1)
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val gx = math.min(x * gw / w, gw - 1)
          val rgb = row(x)
          val lum = (0.299f * ((rgb >> 16) & 0xff) +
            0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)) / 255f
          val cell = gy * gw + gx
          out(cell) += lum
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      var c = 0
      while (c < out.length) {
        if (counts(c) > 0) out(c) /= counts(c)
        c += 1
      }
      out
    }

    /** Deterministic byte-hash pseudo-feature — the fallback for
     * non-image payloads (and the seam a real audio/video codec would
     * replace). A null payload is the zero feature — this is the last
     * stop on [[decode]]'s fallback chain, so it must uphold the
     * "never an exception" contract the earlier stages promise. */
    def byteHashFeature(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](FeatureDim)
      if (bytes == null) return acc
      var i = 0
      while (i < bytes.length) {
        acc(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
        i += 1
      }
      acc
    }

    def entropy(bytes: Array[Byte]): Double = {
      if (bytes == null || bytes.isEmpty) return 0.0
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
          n_bytes = if (r.media == null) 0L else r.media.length.toLong,
          byte_entropy = MediaCodec.entropy(r.media),
          feature = MediaCodec.decode(r.media))
      }
    }
  }

  /** A sampled frame from a container stream. `decoded` is the
   * provenance marker: true for frames the container itself yielded
   * (GIF animation frames, AVI video chunks), false for the
   * fixed-size byte-chunk fallback — so a downstream consumer can
   * never mistake opaque chunks for real frames. */
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte],
      decoded: Boolean)

  /**
   * Frame sampling. REAL keyframe iteration for two containers:
   *  - animated GIF — every `everyN`-th decoded animation frame
   *    ([[MediaCodec.decodeGifFrames]]), re-encoded as a standalone
   *    PNG payload so each sampled frame is itself a decodable media
   *    row with its own luminance grid;
   *  - MJPEG AVI — every `everyN`-th `00dc`/`00db` video chunk from
   *    the `movi` LIST ([[AvHeaders.aviVideoChunks]]); each chunk IS
   *    a complete JPEG, emitted as-is (already standalone decodable;
   *    trailing chunk padding after the JPEG EOI marker is ignored by
   *    every decoder);
   *  - MJPEG MP4/MOV — every `everyN`-th video sample located by the
   *    real `stbl` sample-table walk ([[AvHeaders.mp4VideoSamples]]:
   *    stsd codec check, stsz sizes, stco/stsc chunk mapping); same
   *    complete-JPEG-per-sample property as AVI;
   *  - PCM / G.711 WAV — every `everyN`-th `audioClipMs` window of
   *    the sample payload, frame-aligned and re-wrapped as a
   *    standalone WAV ([[AvHeaders.wavClips]]) so each clip decodes
   *    to its own real envelope;
   *  - H.26x MP4 (self-contained OR fragmented) — every `everyN`-th
   *    KEYFRAME sample, located without decode by the stss walk
   *    ([[AvHeaders.mp4SyncSamples]]) or the moof/trun walk
   *    ([[AvHeaders.mp4FragmentSyncSamples]]); each emitted chunk is
   *    the exact IDR sample's bytes — the unit a real decoder starts
   *    from — with `decoded = false` (the PIXELS are not decoded;
   *    only pixel decode remains stubbed, the segmentation is real).
   * Every other payload falls back to every `everyN`-th fixed-size
   * byte chunk with `decoded = false` (STUB: a real implementation
   * asks the codec for pixels — no AV codec libraries in this
   * environment). `frame_idx` is the index in the source stream
   * (frame / sample / clip / chunk number), not a dense rank, on all
   * paths. The Spark-side shape is identical either way:
   * partition-local, one media row fans out to many frame rows,
   * frames stay on their partition until explicitly shuffled.
   */
  def frameSample(spark: SparkSession, media: DataFrame,
      everyN: Int = 4, frameBytes: Int = 64,
      audioClipMs: Int = 1000): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val gifFrames = MediaCodec.decodeGifFrames(r.media)
      // animated WebP: each ANMF frame rewraps into a standalone
      // decodable WebP (the GIF re-encode's zero-copy sibling)
      val webpFrames =
        if (gifFrames.nonEmpty) Nil else webpAnmfFrames(r.media)
      val videoChunks =
        if (gifFrames.nonEmpty || webpFrames.nonEmpty) Nil
        else {
          val avi = AvHeaders.aviVideoChunks(r.media)
          if (avi.nonEmpty) avi else AvHeaders.mp4VideoSamples(r.media)
        }
      val audioClips =
        if (gifFrames.nonEmpty || webpFrames.nonEmpty || videoChunks.nonEmpty) Nil
        else AvHeaders.wavClips(r.media, audioClipMs)
      val keySamples =
        if (gifFrames.nonEmpty || webpFrames.nonEmpty || videoChunks.nonEmpty ||
          audioClips.nonEmpty) Nil
        else {
          val stss = AvHeaders.mp4SyncSamples(r.media)
          if (stss.nonEmpty) stss else AvHeaders.mp4FragmentSyncSamples(r.media)
        }
      // MP3/AAC: frame-aligned chunks (each frame is where a real
      // decoder starts) instead of arbitrary byte chunks; samples not
      // decoded
      val mp3 =
        if (gifFrames.nonEmpty || webpFrames.nonEmpty || videoChunks.nonEmpty ||
          audioClips.nonEmpty || keySamples.nonEmpty) Nil
        else {
          val adts = AvHeaders.adtsFrames(r.media)
          if (adts.size >= 2) adts else AvHeaders.mp3Frames(r.media)
        }
      if (gifFrames.nonEmpty)
        gifFrames.iterator.zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case (img, idx) =>
            Frame(r.media_id, idx, MediaCodec.encodePng(img), decoded = true) }
      else if (webpFrames.nonEmpty)
        webpFrames.iterator
          .filter(_.idx % everyN == 0)
          .map { f =>
            Frame(r.media_id, f.idx, webpFrameFile(r.media, f), decoded = true) }
      else if (videoChunks.nonEmpty)
        videoChunks.iterator.zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case ((off, len), idx) =>
            Frame(r.media_id, idx,
              java.util.Arrays.copyOfRange(r.media, off, off + len),
              decoded = true) }
      else if (audioClips.nonEmpty)
        audioClips.iterator.zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case (clip, idx) => Frame(r.media_id, idx, clip, decoded = true) }
      else if (keySamples.nonEmpty)
        // exact IDR sample bytes, keyframe-aligned segmentation —
        // decoded stays false: the bitstream needs a real codec for
        // pixels, but these chunks are where one would start
        keySamples.iterator.zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case ((_, off, len), idx) =>
            Frame(r.media_id, idx,
              java.util.Arrays.copyOfRange(r.media, off, off + len),
              decoded = false) }
      else if (mp3.size >= 2)
        mp3.iterator.zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case ((off, len), idx) =>
            Frame(r.media_id, idx,
              java.util.Arrays.copyOfRange(r.media, off, off + len),
              decoded = false) }
      else {
        val bytes = if (r.media == null) Array.emptyByteArray else r.media
        bytes.grouped(frameBytes).zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case (chunk, idx) => Frame(r.media_id, idx, chunk, decoded = false) }
      }
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
