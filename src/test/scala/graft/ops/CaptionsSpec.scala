package graft.ops

import graft.SparkSpec
import graft.tools.CaptionFixture

class CaptionsSpec extends SparkSpec {

  test("WebVTT parse: header/NOTE skipped, identifiers skipped, short times, multiline text") {
    val vtt = Seq(
      "WEBVTT",
      "NOTE a comment block\nwith two lines",
      "00:01.000 --> 00:02.500\nhello world",
      "ident-7\n00:00:03.000 --> 00:00:04.250\nline one\nline two"
    ).mkString("\n\n")
    val got = Captions.parseCues(vtt)
    assert(got == Seq(
      (0, 1000L, 2500L, "hello world"),
      (1, 3000L, 4250L, "line one\nline two")))
  }

  test("SRT parse: counters skipped, comma decimals, CRLF normalised") {
    val srt = "1\r\n00:00:00,500 --> 00:00:01,000\r\nfirst\r\n\r\n" +
      "2\r\n01:02:03,004 --> 01:02:04,005\r\nsecond"
    val got = Captions.parseCues(srt)
    assert(got == Seq(
      (0, 500L, 1000L, "first"),
      (1, 3723004L, 3724005L, "second")))
  }

  test("non-cue payloads parse to nothing, never a throw") {
    assert(Captions.parseCues(null).isEmpty)
    assert(Captions.parseCues("").isEmpty)
    assert(Captions.parseCues("WEBVTT\n\nNOTE empty").isEmpty)
    assert(Captions.parseCues("junk prose with no cues").isEmpty)
    // an arrow line without two parsable timestamps is not a cue
    assert(Captions.parseCues("a --> b\ntext").isEmpty)
    assert(Captions.parseCues("00:01.000 --> soon\ntext").isEmpty)
    // two timestamps with the arrow NOT between them is not a timing line
    assert(Captions.parseCues("00:01.000 00:02.500 -->\ntext").isEmpty)
  }

  test("junk arrow lines before the timing line are skipped, not fatal") {
    // the timing line is the first FULL `ts --> ts` line; a bare-arrow
    // line above it must not swallow the cue (and the DuckDB oracle
    // applies the identical per-line rule)
    val got = Captions.parseCues("see --> here\n00:01.000 --> 00:02.500\nhello")
    assert(got == Seq((0, 1000L, 2500L, "hello")))
  }

  test("fixture contract: every full row's cues match the id formulas") {
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L)) {
      val got = Captions.parseCues(CaptionFixture.row(id)._2)
      val expect = (0 until CaptionFixture.nCues(id)).map { i =>
        (i, CaptionFixture.startMs(id, i), CaptionFixture.endMs(id, i),
          CaptionFixture.cueText(id, i))
      }
      assert(got == expect, s"id=$id got $got")
    }
    assert(Captions.parseCues(CaptionFixture.row(3)._2).isEmpty)
    assert(Captions.parseCues(CaptionFixture.row(7)._2).isEmpty)
  }

  test("cue text normaliser strips tags and overrides, collapses whitespace") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 4L, 5L, 6L, 9L, 10L)
    val df = ids.map(id => (id, CaptionFixture.row(id)._2)).toDF("media_id", "content")
    val got = Captions.cueTable(spark, df)
      .select(col("media_id"), col("cue_idx"),
        Captions.cleanCueText(col("text")).as("clean"))
      .as[(Long, Int, String)].collect().toSet
    val expect = ids.filter(id => id % 8 != 3 && id % 8 != 7).flatMap { id =>
      (0 until CaptionFixture.nCues(id)).map { i =>
        (id, i, CaptionFixture.cleanCueText(id, i))
      }
    }.toSet
    assert(got == expect)
    // the tagged inputs really were dirty, and one cue cleans to EMPTY
    // (the q_m30 curation filter's case)
    assert(ids.exists(id => CaptionFixture.cueText(id, 0).contains("<")))
    assert(expect.exists(_._3.isEmpty))
    // direct kernel checks, one per stripped construct
    def clean1(s: String): String = {
      val one = Seq((0L, s)).toDF("media_id", "content")
      Captions.cueTable(spark,
          one.withColumn("content",
            org.apache.spark.sql.functions.concat(
              org.apache.spark.sql.functions.lit("00:01.000 --> 00:02.000\n"),
              col("content"))))
        .select(Captions.cleanCueText(col("text"))).as[String].collect().head
    }
    assert(clean1("<v Roger>hi <i>there</i></v>") == "hi there")
    assert(clean1("{\\an8}top <b>bold</b>") == "top bold")
    assert(clean1("a\nb\tc  d") == "a b c d")
    assert(clean1("<00:01.500>karaoke <c.yellow>word</c>") == "karaoke word")
  }

  test("clip-caption pairs: half-open window, per-media join, no cross-media leakage") {
    import spark.implicits._
    val cues = Seq(
      (1L, 0, 0L, 100L, "a"),   // covers t=0 and t=50, not t=100
      (1L, 1, 100L, 200L, "b"), // covers t=100, t=150
      (2L, 0, 0L, 1000L, "c")   // media 2 has no keyframes
    ).toDF("media_id", "cue_idx", "start_ms", "end_ms", "text")
    val kfs = Seq(
      (1L, 1L, 24L, 48L, 0L),
      (1L, 3L, 120L, 48L, 50L),
      (1L, 5L, 216L, 48L, 100L),
      (1L, 7L, 312L, 48L, 150L),
      (3L, 1L, 24L, 48L, 0L) // media 3 has no cues
    ).toDF("media_id", "sample_no", "offset", "n_bytes", "t_ms")
    val got = Captions.clipCaptionPairs(cues, kfs)
      .select("media_id", "cue_idx", "sample_no", "t_ms")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0, 1L, 0L), (1L, 0, 3L, 50L),
      (1L, 1, 5L, 100L), (1L, 1, 7L, 150L)))
  }

  test("clip byte spans: first in-window keyframe to the next one after, EOF caps") {
    import spark.implicits._
    val cues = Seq(
      (1L, 0, 0L, 100L, "a"),   // keyframes at t=0,50 → bytes 24..216
      (1L, 1, 100L, 200L, "b")  // keyframes at t=100,150 → 216..400 (EOF)
    ).toDF("media_id", "cue_idx", "start_ms", "end_ms", "text")
    val kfs = Seq(
      (1L, 1L, 24L, 48L, 0L),
      (1L, 3L, 120L, 48L, 50L),
      (1L, 5L, 216L, 48L, 100L),
      (1L, 7L, 312L, 48L, 150L)
    ).toDF("media_id", "sample_no", "offset", "n_bytes", "t_ms")
    val media = Seq((1L, "video/mp4", new Array[Byte](400)))
      .toDF("media_id", "mime_type", "media")
    val got = Captions.clipByteSpans(cues, kfs, media)
      .select("cue_idx", "byte_from", "byte_to", "n_keyframes")
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(got == Set((0, 24L, 216L, 2L), (1, 216L, 400L, 2L)))
  }

  test("keyframe time axis: stts prefix sums match the fixture clock") {
    import graft.tools.AvcMp4Fixture
    for (id <- Seq(0L, 1L, 2L, 5L, 6L)) {
      val bytes = AvcMp4Fixture.mp4(id)
      val delta = graft.tools.MjpegMp4Fixture.usPerFrame(id).toLong * 90000L / 1000000L
      val got = Multimodal.AvHeaders.mp4SyncSampleTimes(bytes)
      val plain = Multimodal.AvHeaders.mp4SyncSamples(bytes)
      assert(got.map(t => (t._1, t._2, t._3)) == plain)
      got.foreach { case (sn, _, _, tMs) =>
        assert(tMs == (sn - 1) * delta * 1000L / 90000L, s"id=$id sn=$sn")
      }
    }
    // broken rows: no time rows
    assert(Multimodal.AvHeaders.mp4SyncSampleTimes(graft.tools.AvcMp4Fixture.row(3)._2).isEmpty)
    assert(Multimodal.AvHeaders.mp4SyncSampleTimes(graft.tools.AvcMp4Fixture.row(7)._2).isEmpty)
  }
}
