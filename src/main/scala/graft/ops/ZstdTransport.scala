package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Multimodal.MediaRow

/**
 * Zstandard transport walkers — the compression layer modern LLM
 * corpora actually ship in: `.jsonl.zst` document shards (Dolma, The
 * Pile, RedPajama), `.warc.zst` crawls (the IIPC successor to
 * `.warc.gz` — one zstd frame per record group, optional shared
 * dictionary in a leading skippable frame), and `.tar.zst` WebDataset
 * shards. zstd-jni ships on Spark's own classpath (it is Spark's
 * shuffle/event-log codec), so no new dependency is introduced.
 *
 * Reference scope note: the reference engine (lucasnetau/php-ec)
 * reads NDJSON from process pipes and leaves transport compression to
 * the pipe producer (SURVEY §2.1 S8); these walkers are the batch
 * corpus-scale face of the same contract — the bytes arrive
 * compressed, the engine owns the decode.
 *
 * Scale discipline (identical to the gzip walkers in [[Archives]]):
 * every walker is a partition-local byte pass over one blob — frame
 * indices, record identities and member coordinates leave the
 * partition, payload bytes never do. Decompression state (one
 * `ZstdDecompressCtx`, one scratch window) is allocated once per
 * partition walk and reused across frames, never per frame.
 *
 * Frame-structure parsing is done BY HAND (RFC 8878 frame and block
 * headers) rather than by the library for two reasons: (a) the
 * library's streaming reader fails truncation SILENTLY (a cut frame
 * yields zero bytes and a clean EOF — measured, not assumed), while
 * the structural walk detects the overrun and applies the walkers'
 * tolerance rule (complete frames are claimed, the cut tail is not);
 * (b) the frame boundary IS the ranged-read coordinate a 100 TB
 * loader needs — `[frame_offset, frame_offset + frame_comp_bytes)`
 * fetches one record group decodable in isolation, exactly like the
 * `.warc.gz` member span.
 */
object ZstdTransport {

  /** Inflated-bytes cap per zstd frame (warc.zst record groups). The
   * IIPC draft recommends small record groups per frame precisely so
   * consumers can ranged-read them; a frame inflating past the cap
   * ends the walk unemitted (tolerance, same as the gzip walkers'
   * caps). */
  private[ops] val FrameCapBytes: Int = 1 << 24

  /** Longest carried line for the jsonl walker — a "line" that never
   * terminates inside the cap is dropped and the walk continues at
   * the next newline (a single pathological document must not buffer
   * unbounded bytes in the task). */
  private[ops] val LineCapBytes: Int = 1 << 20

  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def le24(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16)

  private val DataMagic = 0xFD2FB528L
  /** Skippable-frame magics 0x184D2A50..5F; the IIPC `.warc.zst`
   * dictionary frame uses the final nibble 0xD. */
  private def skippableNibble(magic: Long): Int =
    if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) (magic & 0xF).toInt else -1

  /** One parsed frame span: `skipNibble` is -1 for a data frame, else
   * the skippable magic's low nibble (0xD = IIPC dictionary). */
  private[graft] final case class ZFrame(
      offset: Long, compBytes: Long, skipNibble: Int)

  /**
   * Structural frame walk (RFC 8878): data frames are measured by
   * parsing the frame header descriptor (dictionary-ID and
   * frame-content-size field widths, single-segment flag) and then
   * hopping block headers (3-byte LE: last-block bit, block type,
   * block size; RLE blocks carry ONE payload byte) to the last block,
   * plus the 4-byte content checksum when the descriptor announces
   * one. Skippable frames are magic + 4-byte LE size. The walk ends
   * at the first malformed or file-overrunning frame — a truncated
   * shard keeps its complete frames, the cut tail claims nothing.
   * No decompression happens here: this is the index pass.
   */
  private[graft] def zstdFrames(b: Array[Byte]): Seq[ZFrame] = {
    if (b == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[ZFrame]
    var pos = 0
    var ok = true
    while (ok && pos + 4 <= b.length) {
      val magic = le32(b, pos)
      val nib = skippableNibble(magic)
      if (nib >= 0) {
        if (pos + 8 > b.length) ok = false
        else {
          val size = le32(b, pos + 4)
          val end = pos.toLong + 8 + size
          if (end > b.length) ok = false
          else { out += ZFrame(pos.toLong, 8 + size, nib); pos = end.toInt }
        }
      } else if (magic == DataMagic) {
        if (pos + 5 > b.length) ok = false
        else {
          val fhd = b(pos + 4) & 0xff
          val dictIdLen = Array(0, 1, 2, 4)(fhd & 3)
          val singleSegment = (fhd & 0x20) != 0
          val fcsLen = (fhd >>> 6) match {
            case 0 => if (singleSegment) 1 else 0
            case 1 => 2
            case 2 => 4
            case _ => 8
          }
          // reserved bit (3) must be zero per RFC 8878 §3.1.1.1.1
          if ((fhd & 0x08) != 0) ok = false
          else {
            var p = pos + 5 + dictIdLen + fcsLen +
              (if (singleSegment) 0 else 1) // window descriptor byte
            var last = false
            while (ok && !last) {
              if (p + 3 > b.length) ok = false
              else {
                val bh = le24(b, p)
                last = (bh & 1) == 1
                val btype = (bh >>> 1) & 3
                val bsize = bh >>> 3
                if (btype == 3) ok = false // reserved block type
                else p += 3 + (if (btype == 1) 1 else bsize) // RLE: 1 byte
              }
            }
            if (ok) {
              val ckLen = if ((fhd & 0x04) != 0) 4 else 0
              val end = p.toLong + ckLen
              if (end > b.length) ok = false
              else { out += ZFrame(pos.toLong, end - pos, -1); pos = end.toInt }
            }
          }
        }
      } else ok = false
    }
    out.toSeq
  }

  /** The IIPC `.warc.zst` dictionary: when the FIRST frame is a
   * skippable frame with magic nibble 0xD, its payload is the shared
   * zstd dictionary — stored raw, or itself zstd-compressed (the
   * draft allows both; a compressed payload is recognised by its own
   * data-frame magic and inflated, capped). */
  private[graft] def warcZstDict(b: Array[Byte], frames: Seq[ZFrame]): Option[Array[Byte]] =
    frames.headOption.filter(_.skipNibble == 0xD).flatMap { f =>
      val payloadOff = (f.offset + 8).toInt
      val payloadLen = (f.compBytes - 8).toInt
      if (payloadLen <= 0) None
      else if (payloadLen >= 4 && le32(b, payloadOff) == DataMagic)
        inflateFrame(b, payloadOff, payloadLen, None, FrameCapBytes)
      else Some(java.util.Arrays.copyOfRange(b, payloadOff, payloadOff + payloadLen))
    }

  /** Inflate ONE data frame, capped. Uses the exact-size path when
   * the frame header declares its content size, else streams through
   * the library (fixture frames always declare; streaming-written
   * frames in the wild may not). Any library error claims nothing. */
  private[graft] def inflateFrame(b: Array[Byte], off: Int, len: Int,
      dict: Option[Array[Byte]], cap: Int): Option[Array[Byte]] = {
    import com.github.luben.zstd.{Zstd, ZstdDecompressCtx, ZstdInputStreamNoFinalizer}
    val declared =
      try Zstd.getFrameContentSize(b, off, len) catch { case _: Exception => -1L }
    try {
      if (declared >= 0 && declared <= cap) {
        val dst = new Array[Byte](declared.toInt)
        val ctx = new ZstdDecompressCtx()
        try {
          dict.foreach(ctx.loadDict)
          val n = ctx.decompressByteArray(dst, 0, dst.length, b, off, len)
          if (n == declared) Some(dst) else None
        } finally ctx.close()
      } else if (declared > cap) None
      else {
        val in = new ZstdInputStreamNoFinalizer(
          new java.io.ByteArrayInputStream(b, off, len))
        try {
          dict.foreach(in.setDict)
          val out = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](64 * 1024)
          var n = in.read(chunk)
          var over = false
          while (n > 0 && !over) {
            if (out.size + n > cap) over = true
            else { out.write(chunk, 0, n); n = in.read(chunk) }
          }
          if (over) None else Some(out.toByteArray)
        } finally in.close()
      }
    } catch { case _: Exception => None }
  }

  /** Strict whole-entity decode for `Content-Encoding: zstd` HTTP
   * bodies: the byte range must be EXACTLY a run of well-formed
   * frames (structural walk first — the library cannot see
   * truncation), then every frame inflates under the shared cap.
   * Anything else claims nothing — the WET faces' corrupt-layer
   * discipline. */
  private[ops] def contentDecodeCapped(b: Array[Byte], off: Int, len: Int,
      cap: Int): Option[Array[Byte]] = {
    if (b == null || off < 0 || len <= 0 || off + len > b.length) return None
    val slice = java.util.Arrays.copyOfRange(b, off, off + len)
    val frames = zstdFrames(slice)
    if (frames.isEmpty ||
      frames.map(_.compBytes).sum != len.toLong) return None
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach { f =>
      if (f.skipNibble < 0) {
        inflateFrame(slice, f.offset.toInt, f.compBytes.toInt, None,
          cap - out.size) match {
          case Some(d) => out.write(d, 0, d.length)
          case None => return None
        }
      }
    }
    Some(out.toByteArray)
  }

  // ------------------------------------------------------- .warc.zst

  /** One row per WARC record inside the shard's data frames:
   * (frame_idx, frame_offset, frame_comp_bytes, frame_uncomp_bytes,
   * has_dict, record_idx, warc_type, target_uri, warc_date,
   * payload_digest, content_length). `frame_idx` is ordinal over ALL
   * frames (the dictionary skippable frame, when present, is frame 0
   * and emits no records); `record_idx` is the record's ordinal
   * WITHIN its frame. A frame that fails to inflate, or whose
   * inflated bytes don't parse as records from offset 0, ends the
   * walk after the records already claimed (tolerance). */
  private[graft] def warcZstRecords(b: Array[Byte]): Seq[(Int, Long, Long, Long,
      Boolean, Int, Option[String], Option[String], Option[String], Option[String], Long)] = {
    val frames = zstdFrames(b)
    val dict = warcZstDict(b, frames)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long,
      Boolean, Int, Option[String], Option[String], Option[String], Option[String], Long)]
    var ok = true
    frames.zipWithIndex.foreach { case (f, idx) =>
      if (ok && f.skipNibble < 0) {
        inflateFrame(b, f.offset.toInt, f.compBytes.toInt, dict, FrameCapBytes) match {
          case Some(inflated) =>
            val recs = Archives.warcRecords(inflated)
            // enforce the documented contract: a data frame whose
            // inflated bytes don't parse as a WARC record at offset 0
            // ends the walk (its shard-index coordinates would lie)
            if (recs.isEmpty) ok = false
            else recs.zipWithIndex.foreach {
              case ((_, _, clen, wtype, uri, wdate, digest), r) =>
                out += ((idx, f.offset, f.compBytes, inflated.length.toLong,
                  dict.isDefined, r, wtype, uri, wdate, digest, clen))
            }
          case None => ok = false
        }
      }
    }
    out.toSeq
  }

  /** Relational face of [[warcZstRecords]] (q_w39) — the `.warc.zst`
   * shard list: a ranged read of [frame_offset, frame_offset +
   * frame_comp_bytes) plus the (tiny, shared) dictionary fetches one
   * record group decodable in isolation. Pure map-side. */
  def warcZstRecordTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          warcZstRecords(r.media).map { case (fi, fo, fc, fu, hd, ri, wt, uri, wd, dg, cl) =>
            (r.media_id, fi, fo, fc, fu, hd, ri, wt, uri, wd, dg, cl)
          }
        }
      }
      .toDF("media_id", "frame_idx", "frame_offset", "frame_comp_bytes",
        "frame_uncomp_bytes", "has_dict", "record_idx", "warc_type",
        "target_uri", "warc_date", "payload_digest", "content_length")
  }

  // ------------------------------------------------------ .jsonl.zst

  /** Continuous decompressed stream over all data frames (gzip or
   * zstd by magic; plain bytes pass through). */
  private def transportStream(b: Array[Byte]): Option[(String, java.io.InputStream)] = {
    import com.github.luben.zstd.ZstdInputStreamNoFinalizer
    if (b == null || b.length < 2) None
    else if ((b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b)
      try Some(("gzip", new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))))
      catch { case _: java.io.IOException => None }
    else if (b.length >= 4 && le32(b, 0) == DataMagic)
      try Some(("zstd", new ZstdInputStreamNoFinalizer(
        new java.io.ByteArrayInputStream(b)).setContinuous(true)))
      catch { case _: java.io.IOException => None }
    else if ((b(0) & 0xff) == '{') // already-plain NDJSON shard
      Some(("plain", new java.io.ByteArrayInputStream(b)))
    else None
  }

  /** Newline-split over a decompressed stream with a bounded carry:
   * lines are emitted complete ('\n'-terminated; a final unterminated
   * tail IS emitted — jsonl writers routinely omit the last newline),
   * a line overrunning [[LineCapBytes]] is dropped (its line_no
   * consumed) and the split resumes after its terminator. Transport
   * ERRORS (a cut gzip stream throws) end the walk with the complete
   * lines already claimed and the carry suppressed — a corrupt tail
   * is never claimed as a document. A cut ZSTD stream instead ends
   * SILENTLY at the last complete frame (library behaviour, measured)
   * — the walk keeps the byte-prefix's complete lines plus, when the
   * cut lands mid-line at a frame boundary, one partial tail line
   * (indistinguishable from a writer omitting the final newline;
   * documented tolerance). */
  private[graft] def jsonlLines(b: Array[Byte]): Seq[(String, Int, String)] = {
    transportStream(b) match {
      case None => Nil
      case Some((codec, in)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, String)]
        try {
          val chunk = new Array[Byte](64 * 1024)
          val carry = new java.io.ByteArrayOutputStream()
          var dropping = false
          var lineNo = 0
          def flush(upTo: Array[Byte], from: Int, to: Int): Unit = {
            // the cap applies to the WHOLE line, including a final
            // segment arriving in the same chunk as its terminator
            if (carry.size + (to - from) > LineCapBytes) dropping = true
            if (!dropping) carry.write(upTo, from, to - from)
            val line = carry.toByteArray
            carry.reset()
            if (!dropping)
              out += ((codec, lineNo,
                new String(line, java.nio.charset.StandardCharsets.UTF_8)))
            dropping = false
            lineNo += 1
          }
          var failed = false
          def readChunk(): Int =
            try in.read(chunk) catch { case _: java.io.IOException => failed = true; -1 }
          var n = readChunk()
          while (n > 0) {
            var s = 0
            var i = 0
            while (i < n) {
              if (chunk(i) == '\n') { flush(chunk, s, i); s = i + 1 }
              i += 1
            }
            if (!dropping) {
              if (carry.size + (n - s) > LineCapBytes) { carry.reset(); dropping = true }
              else carry.write(chunk, s, n - s)
            }
            n = readChunk()
          }
          if (carry.size > 0 && !dropping && !failed) {
            val line = carry.toByteArray
            out += ((codec, lineNo,
              new String(line, java.nio.charset.StandardCharsets.UTF_8)))
          }
        } finally in.close()
        out.toSeq
    }
  }

  /** Relational face of [[jsonlLines]] (q_w38) — the compressed
   * NDJSON document shard, the format LLM pretraining corpora ship
   * in. Field extraction happens RELATIONALLY on the emitted line
   * (codegen'd regexp over the already-distributed rows), so the
   * map-side walk stays a pure transport decode. */
  def jsonlDocTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          jsonlLines(r.media).map { case (codec, ln, line) => (r.media_id, codec, ln, line) }
        }
      }
      .toDF("media_id", "codec", "line_no", "line")
      // escape-aware string spans: real pretraining NDJSON routinely
      // carries \" inside text, so the capture walks escape pairs
      // instead of stopping at the first quote. The captured value is
      // the RAW JSON-escaped span (no unescape pass) — downstream
      // text analysis sees \" and \\ two-char sequences verbatim.
      .withColumn("doc_id",
        nullif(regexp_extract(col("line"),
          "\"id\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"", 1), lit("")))
      .withColumn("lang",
        nullif(regexp_extract(col("line"),
          "\"lang\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"", 1), lit("")))
      .withColumn("text",
        nullif(regexp_extract(col("line"),
          "\"text\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"", 1), lit("")))
      .withColumn("n_chars", length(col("line")))
      .drop("line")
  }

  // -------------------------------------------------------- .tar.zst

  private def readFully(in: java.io.InputStream, dst: Array[Byte], len: Int): Int = {
    var got = 0
    var n = 0
    while (got < len && n >= 0) {
      n = try in.read(dst, got, len - got) catch { case _: java.io.IOException => -1 }
      if (n > 0) got += n
    }
    got
  }

  private def skipFully(in: java.io.InputStream, count: Long, scratch: Array[Byte]): Boolean = {
    var left = count
    while (left > 0) {
      val n = try in.read(scratch, 0, math.min(left, scratch.length.toLong).toInt)
      catch { case _: java.io.IOException => -1 }
      if (n <= 0) return false
      left -= n
    }
    true
  }

  /** Name-override payload cap (GNU 'L' / PAX 'x' entries) — a
   * long-name entry is a filename, not a payload. */
  private val NameCapBytes = 64 * 1024

  /** STREAMING tar member walk over the decompressed `.tar.zst`
   * stream — unlike [[Archives.tarMembers]] (whole-blob), this never
   * materialises the inflated archive: it reads 512-byte headers,
   * SKIPS payload bytes through a scratch window, and carries only
   * the pending long-name override — task memory is one 64 KiB
   * scratch regardless of shard size, which is what a multi-GB
   * WebDataset shard requires (a `.tar.zst` stream has no per-member
   * ranged-read coordinates, so loaders stream it end to end; the
   * emitted `data_offset` is the offset in UNCOMPRESSED space).
   * Header parse and override layering are byte-identical to
   * [[Archives.tarMembers]] (shared low-level field parsers). */
  private[graft] def tarZstMembers(b: Array[Byte]): Seq[(String, Long, Long, Long, String)] = {
    if (b == null || b.length < 4 || le32(b, 0) != DataMagic) return Nil
    import com.github.luben.zstd.ZstdInputStreamNoFinalizer
    val in =
      try new ZstdInputStreamNoFinalizer(
        new java.io.ByteArrayInputStream(b)).setContinuous(true)
      catch { case _: java.io.IOException => return Nil }
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long, String)]
      val hdr = new Array[Byte](512)
      val scratch = new Array[Byte](64 * 1024)
      var pos = 0L
      var ok = true
      var pending: Option[String] = None
      while (ok) {
        if (readFully(in, hdr, 512) < 512) ok = false
        else {
          var allZero = true
          var i = 0
          while (allZero && i < 512) { if (hdr(i) != 0) allZero = false; i += 1 }
          if (allZero) ok = false
          else {
            val magic = Archives.tarString(hdr, 257, 5)
            val size = Archives.tarOctal(hdr, 124, 12)
            if (magic != "ustar" || size < 0) ok = false
            else {
              val prefix = Archives.tarString(hdr, 345, 155)
              val name0 = Archives.tarString(hdr, 0, 100)
              val rawName = if (prefix.nonEmpty) prefix + "/" + name0 else name0
              val tf = hdr(156) & 0xff
              val typeflag = if (tf == 0) "0" else tf.toChar.toString
              val dataOff = pos + 512
              val padded = ((size + 511) / 512) * 512
              val name = typeflag match {
                case "L" | "x" => rawName
                case _ =>
                  val n = pending.getOrElse(rawName); pending = None; n
              }
              if (typeflag == "L" || typeflag == "x") {
                if (size > NameCapBytes) ok = false
                else {
                  val payload = new Array[Byte](size.toInt)
                  if (readFully(in, payload, size.toInt) < size.toInt) ok = false
                  else {
                    if (typeflag == "L")
                      pending = Some(Archives.tarString(payload, 0, payload.length))
                        .filter(_.nonEmpty).orElse(pending)
                    else
                      pending = Archives.paxPath(payload, 0, payload.length)
                        .filter(_.nonEmpty).orElse(pending)
                    if (!skipFully(in, padded - size, scratch)) ok = false
                  }
                }
              } else if (!skipFully(in, padded, scratch)) ok = false
              if (ok) {
                out += ((name, pos, dataOff, size, typeflag))
                pos = dataOff + padded
              }
            }
          }
        }
      }
      out.toSeq
    } finally in.close()
  }

  /** Relational face of [[tarZstMembers]] (q_w40): the `.tar.zst`
   * WebDataset shard index. Composes with
   * [[Archives.webdatasetSamples]] unchanged (same member-row
   * shape). Pure map-side, bounded task memory. */
  def tarZstMemberTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("mime_type"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          tarZstMembers(r.media).zipWithIndex.map {
            case ((name, hOff, dOff, size, tf), i) =>
              (r.media_id, i, name, hOff, dOff, size, tf)
          }
        }
      }
      .toDF("media_id", "member_idx", "name", "header_offset",
        "data_offset", "n_bytes", "typeflag")
  }
}
