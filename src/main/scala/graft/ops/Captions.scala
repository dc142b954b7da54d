package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Caption/transcript extraction and cue↔keyframe alignment — the
 * pairing ops that turn the shard-list time axes (q_m10–q_m13) into
 * AV-text TRAINING DATA. The reference has no analogue; this is the
 * LLM-pipeline brief: a 100 TB video corpus ships WebVTT/SRT sidecar
 * captions, and the unit a video-text training set is made of is the
 * (clip, caption) pair — a caption cue matched to the keyframes whose
 * presentation times fall inside its window, because keyframes are
 * where clip decode can start.
 *
 * Scale design: cue parsing is a pure map-side string kernel (one
 * pass per payload, no shuffle — plan-pinned like the byte walkers);
 * the alignment is an equi-join on media_id with the time window as a
 * join-level range predicate — never a cartesian, and the cue side of
 * a typical corpus (kilobytes per video) broadcasts.
 */
object Captions {

  /** Input row shape (public: Catalyst deserializer codegen needs
   * access, same as Multimodal.MediaRow). */
  case class CaptionRow(media_id: Long, content: String)

  /** A full timing line: `(?:hh:)?mm:ss(.|,)mmm --> (?:hh:)?mm:ss(.|,)mmm`
   * — WebVTT uses `.`, SRT uses `,`; the hour field is optional in
   * WebVTT's short form; the arrow is REQUIRED between the two
   * timestamps (WebVTT: one or more spaces/tabs around it), so a junk
   * line that merely contains `-->` or two bare timestamps never
   * selects as the timing line. The DuckDB oracle applies this same
   * pattern line-by-line — keep the two in lock-step. */
  private val CueLineRe =
    ("""(?:(\d+):)?(\d{1,2}):(\d{1,2})[.,](\d{3})[ \t]+-->[ \t]+""" +
      """(?:(\d+):)?(\d{1,2}):(\d{1,2})[.,](\d{3})""").r

  private def toMs(h: String, mi: String, s: String, f: String): Long = {
    val hh = Option(h).map(_.toLong).getOrElse(0L)
    hh * 3600000L + mi.toLong * 60000L + s.toLong * 1000L + f.toLong
  }

  /**
   * Parse one WebVTT or SRT payload into (cue_idx, start_ms, end_ms,
   * text) cues. Both formats are blank-line-separated blocks; a cue
   * block is any block whose FIRST line matching the full
   * `ts --> ts` timing pattern supplies the window — lines before it
   * (WebVTT cue identifiers, SRT counters, junk arrow lines) are
   * skipped, lines after it are the cue text (joined with newline,
   * preserved verbatim). Non-cue blocks (the WEBVTT header,
   * NOTE/STYLE blocks, junk) contribute nothing. Malformed payloads
   * yield what parsed, never a throw — the same tolerance discipline
   * as the byte walkers.
   */
  private[ops] def parseCues(content: String): Seq[(Int, Long, Long, String)] = {
    if (content == null) return Nil
    val norm = content.replace("\r\n", "\n").replace('\r', '\n')
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
    norm.split("\n\n", -1).foreach { blk =>
      val lines = blk.split("\n", -1)
      val ai = lines.indexWhere(l => CueLineRe.findFirstIn(l).isDefined)
      if (ai >= 0) {
        val m = CueLineRe.findFirstMatchIn(lines(ai)).get
        out += ((out.size,
          toMs(m.group(1), m.group(2), m.group(3), m.group(4)),
          toMs(m.group(5), m.group(6), m.group(7), m.group(8)),
          lines.drop(ai + 1).mkString("\n")))
      }
    }
    out.toSeq
  }

  /**
   * Caption-text normaliser: cue payloads arrive with WebVTT markup
   * (<i>/<b>/<u>, <c.class> spans, <v Speaker> voice spans,
   * <hh:mm:ss.mmm> karaoke timestamps) and SRT/ASS `{\an8}`-style
   * override blocks; text analysis (q_x1 langid, q_x3 quality) wants
   * the spoken words only. Three codegen'd regexp passes: angle-tag
   * strip, brace-override strip, whitespace collapse (newlines from
   * the multiline cue join included) + trim. An opt-in projection —
   * q_m18 keeps payloads verbatim; q_m29/q_m30 apply this. The DuckDB
   * oracle runs the IDENTICAL patterns (explicit `[ \t\r\n]`
   * whitespace class — Java and RE2 disagree on `\s`'s edges).
   */
  def cleanCueText(text: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(text,
      "<[^>]*>", ""),
      "\\{\\\\[^}]*\\}", ""),
      "[ \\t\\r\\n]+", " "))

  /** Relational face of [[parseCues]]: one row per cue with its
   * 0-based index and window. Pure map-side — payloads never leave
   * their partition, only fixed-shape cue rows come out. */
  def cueTable(spark: SparkSession, captions: DataFrame): DataFrame = {
    import spark.implicits._
    captions.select(col("media_id"), col("content"))
      .as[CaptionRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          parseCues(r.content).map { case (i, s, e, text) =>
            (r.media_id, i, s, e, text)
          }
        }
      }
      .toDF("media_id", "cue_idx", "start_ms", "end_ms", "text")
  }

  /**
   * Clip-caption pairs: each caption cue matched to every keyframe of
   * the SAME media whose presentation time lands inside the cue's
   * half-open window (start_ms <= t_ms < end_ms) — the keyframes a
   * clip extractor for that cue can seek to. Inputs are the
   * [[cueTable]] and [[Multimodal.mp4KeyframeTimeTable]] shapes.
   *
   * Scale shape: an equi-join on media_id carrying the range
   * predicate in the join condition — Catalyst plans a hash/merge
   * join on the key (never a cartesian; plan-pinned), and the cue
   * side broadcasts when small. Cues with no in-window keyframe drop
   * out (inner join): a cue whose window holds no decodable start
   * point yields no training pair.
   */
  def clipCaptionPairs(cues: DataFrame, keyframes: DataFrame): DataFrame = {
    // generic over the time axis: any table with (media_id, t_ms)
    // pairs — MP4 keyframe times, fragmented-MP4 tfdt times, TS PES
    // PTS — its remaining columns pass through after the cue columns
    val axisCols = keyframes.columns.filter(_ != "media_id").map(keyframes(_))
    cues.join(keyframes,
        cues("media_id") === keyframes("media_id") &&
          keyframes("t_ms") >= cues("start_ms") &&
          keyframes("t_ms") < cues("end_ms"))
      .select(Seq(cues("media_id"), cues("cue_idx"), cues("start_ms"),
        cues("end_ms"), cues("text")) ++ axisCols: _*)
  }

  /**
   * Clip EXTRACTION coordinates: for each cue, the byte span a clip
   * cutter hands to a ranged read — from the first in-window
   * keyframe's offset to the NEXT keyframe after the last in-window
   * one (a decoder must run keyframe-to-keyframe; the file end caps
   * the final span). One row per cue that has at least one in-window
   * keyframe: (byte_from, byte_to, n_keyframes) — with the cue text,
   * this IS the (clip bytes, caption) training record, fetchable
   * without decoding anything.
   *
   * Scale shape: one window shuffle on media_id for the next-keyframe
   * LEAD, the file-size join is map-side metadata (length() of the
   * blob — no bytes move), the pairing join is [[clipCaptionPairs]]'
   * keyed join, and the final per-cue aggregation shuffles only
   * fixed-shape cue rows.
   */
  def clipByteSpans(cues: DataFrame, keyframes: DataFrame,
      media: DataFrame): DataFrame = {
    val w = Window.partitionBy("media_id").orderBy("sample_no")
    val sizes = media.select(col("media_id"),
      length(col("media")).cast("long").as("file_bytes"))
    val kf = keyframes
      .withColumn("next_offset", lead(col("offset"), 1).over(w))
      .join(sizes, Seq("media_id"))
      .select(col("media_id"), col("sample_no"), col("offset"),
        coalesce(col("next_offset"), col("file_bytes")).as("span_end"),
        col("t_ms"))
    clipCaptionPairs(cues, kf)
      .groupBy("media_id", "cue_idx", "start_ms", "end_ms", "text")
      .agg(min("offset").as("byte_from"), max("span_end").as("byte_to"),
        count(lit(1)).as("n_keyframes"))
  }
}
