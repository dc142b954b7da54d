package graft.ops

import graft.SparkSpec
import graft.tools.{AviFixture, AvcMp4Fixture, MjpegMp4Fixture, VideoDupFixture}

class VideoDupSpec extends SparkSpec {

  test("re-mux twins hash identically across containers; groups are distinct") {
    val mp4 = VideoDupFixture.row(4L)._2 // group 2, MP4
    val avi = VideoDupFixture.row(5L)._2 // group 2, AVI of the same frames
    val a = VideoDup.frameDhashSeq(mp4)
    val b = VideoDup.frameDhashSeq(avi)
    assert(a.nonEmpty && a == b)
    assert(a.size == VideoDupFixture.nFrames(2L))
    val other = VideoDup.frameDhashSeq(VideoDupFixture.row(6L)._2) // group 3
    assert(other != a)
    // the ORIGINAL id-derived fixtures share frame bytes per id too —
    // the cross-container property is not a fixture artifact
    val id = 2L
    assert(VideoDup.frameDhashSeq(MjpegMp4Fixture.row(id)._2) ==
      VideoDup.frameDhashSeq(AviFixture.row(id)._2))
  }

  test("junk and frame-less containers claim nothing on either path") {
    assert(VideoDup.frameDhashSeq("no video".getBytes("US-ASCII")).isEmpty)
    assert(VideoDup.frameDhashSeq(AviFixture.headerOnly(0L)).isEmpty)
    assert(VideoDup.frameDhashSeq(MjpegMp4Fixture.truncated()).isEmpty)
    assert(VideoDup.payloadDigest("no video".getBytes("US-ASCII")).isEmpty)
    assert(VideoDup.payloadDigest(AviFixture.headerOnly(0L)).isEmpty)
    assert(VideoDup.payloadDigest(MjpegMp4Fixture.truncated()).isEmpty)
  }

  test("AVC twins: pixels decode nowhere, payload digests pair — incl. fragmented") {
    val g = 6L // the fixture's AVC class
    val mp4 = VideoDupFixture.row(12L)._2
    val avi = VideoDupFixture.row(13L)._2
    assert(VideoDup.frameDhashSeq(mp4).isEmpty &&
      VideoDup.frameDhashSeq(avi).isEmpty,
      "AVC pixels decoded — the payload path is untested")
    val d = VideoDup.payloadDigest(mp4)
    assert(d.nonEmpty && d == VideoDup.payloadDigest(avi))
    assert(d.get._1 == AvcMp4Fixture.nFrames(g))
    // the fragmented (CMAF) layout of the SAME stream carries the
    // same ordered sample bytes — the third re-mux corner
    assert(VideoDup.payloadDigest(AvcMp4Fixture.fragMp4(g)) == d)
    // a different stream digests apart
    assert(VideoDup.payloadDigest(AvcMp4Fixture.mp4(14L)) != d)
  }

  test("container sniff labels every fixture class the oracle expects") {
    import graft.tools.{TsFixture, WebmFixture}
    assert(VideoDup.videoContainer(VideoDupFixture.row(0L)._2) == "mp4")
    assert(VideoDup.videoContainer(VideoDupFixture.row(1L)._2) == "avi")
    assert(VideoDup.videoContainer(VideoDupFixture.row(14L)._2) == "other") // junk
    assert(VideoDup.videoContainer(AvcMp4Fixture.row(0L)._2) == "mp4")
    assert(VideoDup.videoContainer(AvcMp4Fixture.row(3L)._2) == "mp4") // ftyp only
    assert(VideoDup.videoContainer(AvcMp4Fixture.row(7L)._2) == "other")
    assert(VideoDup.videoContainer(WebmFixture.row(0L)._2) == "webm")
    assert(VideoDup.videoContainer(WebmFixture.row(3L)._2) == "webm") // cut, magic kept
    assert(VideoDup.videoContainer(TsFixture.row(0L)._2) == "mpeg-ts")
    assert(VideoDup.videoContainer(TsFixture.row(3L)._2) == "mp4") // the lying cut class
  }

  test("webm payload path: video-track blocks digest, audio tracks excluded") {
    import graft.tools.{AvFixture, WebmFixture}
    val w = WebmFixture.webm(5L)
    assert(Multimodal.AvHeaders.webmVideoTracks(w) == Set(1L))
    val d = VideoDup.payloadDigest(w)
    assert(d.nonEmpty && d.get._1 == WebmFixture.nFrames(5L))
    assert(VideoDup.payloadDigest(WebmFixture.webm(6L)) != d)
    assert(VideoDup.payloadDigest(WebmFixture.row(3L)._2).isEmpty) // cut init
    // a TrackEntry declaring TrackType audio (2) and no Video
    // element must not contribute its blocks
    import AvFixture.{ebml, beUintBytes}
    val header = ebml(0x1a45dfa3L, ebml(0x4282L, "webm".getBytes("US-ASCII")))
    val audioEntry = ebml(0xaeL,
      ebml(0xd7L, beUintBytes(1L)) ++ ebml(0x83L, beUintBytes(2L)))
    val tracks = ebml(0x1654ae6bL, audioEntry)
    val block = ebml(0x1f43b675L, ebml(0xe7L, beUintBytes(0L)) ++
      ebml(0xa3L, Array[Byte](0x81.toByte, 0, 0, 0x80.toByte, 1, 2, 3, 4)))
    val audioOnly = header ++ ebml(0x18538067L, tracks ++ block)
    assert(Multimodal.AvHeaders.webmVideoTracks(audioOnly).isEmpty)
    assert(VideoDup.payloadDigest(audioOnly).isEmpty)
  }

  test("webm span walk: laced blocks skipped, BlockGroup read, Tracks-after-Cluster kept") {
    import graft.tools.{AvFixture, WebmFixture}
    import AvFixture.{ebml, beUintBytes}
    val header = ebml(0x1a45dfa3L, ebml(0x4282L, "webm".getBytes("US-ASCII")))
    val videoEntry = ebml(0xaeL,
      ebml(0xd7L, beUintBytes(1L)) ++ ebml(0x83L, beUintBytes(1L)))
    val tracks = ebml(0x1654ae6bL, videoEntry)
    val payload = Array[Byte](9, 8, 7, 6, 5)
    def sb(flags: Int, body: Array[Byte]) = ebml(0xa3L,
      Array[Byte](0x81.toByte, 0, 0, flags.toByte) ++ body)
    def clusterOf(blocks: Array[Byte]) = ebml(0x1f43b675L,
      ebml(0xe7L, beUintBytes(0L)) ++ blocks)
    def file(body: Array[Byte]) = header ++ ebml(0x18538067L, body)
    // a laced SimpleBlock (flags 0x06 = EBML lacing): the raw span
    // would include lace headers — the walk must claim nothing
    val laced = file(tracks ++ clusterOf(
      sb(0x06, Array[Byte](1, 4) ++ payload)))
    assert(Multimodal.AvHeaders.webmVideoBlockSpans(laced).isEmpty)
    // the same payload unlaced IS a span
    val plain = file(tracks ++ clusterOf(sb(0x80, payload)))
    val plainSpans = Multimodal.AvHeaders.webmVideoBlockSpans(plain)
    assert(plainSpans.map { case (o, l) =>
      java.util.Arrays.copyOfRange(plain, o, o + l).toSeq } == Seq(payload.toSeq))
    // Block inside a BlockGroup: same prefix layout, same span
    val grouped = file(tracks ++ clusterOf(ebml(0xa0L,
      ebml(0xa1L, Array[Byte](0x81.toByte, 0, 0, 0) ++ payload))))
    assert(Multimodal.AvHeaders.webmVideoBlockSpans(grouped).map {
      case (o, l) => java.util.Arrays.copyOfRange(grouped, o, o + l).toSeq
    } == Seq(payload.toSeq))
    // Tracks AFTER the Cluster (legal, unusual): spans still resolve
    val tracksLast = file(clusterOf(sb(0x80, payload)) ++ tracks)
    assert(Multimodal.AvHeaders.webmVideoBlockSpans(tracksLast).map {
      case (o, l) => java.util.Arrays.copyOfRange(tracksLast, o, o + l).toSeq
    } == Seq(payload.toSeq))
    // and the digest agrees with the Tracks-first layout of the
    // same payload (the re-mux equality this path exists for)
    assert(VideoDup.payloadDigest(tracksLast) == VideoDup.payloadDigest(plain))
  }

  test("cross-container webm ↔ mp4 (vp09) re-mux pairs via payload digest") {
    import graft.tools.WebmFixture
    // a WebM whose VP9-style block payloads get re-muxed into an MP4
    // with identical sample bytes: the payload digest must match
    // across containers — the dominant real-world case this path
    // exists for (VP9/AV1 payloads are container-independent)
    val webm = WebmFixture.webm(7L)
    val spans = Multimodal.AvHeaders.webmVideoBlockSpans(webm)
    assert(spans.nonEmpty)
    val samples = spans.map { case (off, len) =>
      java.util.Arrays.copyOfRange(webm, off, off + len)
    }
    val mp4 = graft.tools.MjpegMp4Fixture.mp4FromSamples(samples,
      WebmFixture.width(7L), WebmFixture.height(7L), 40000,
      graft.tools.MjpegMp4Fixture.stsdFourcc("vp09",
        WebmFixture.width(7L), WebmFixture.height(7L)))._1
    assert(VideoDup.frameDhashSeq(mp4).isEmpty) // no pixel decode
    val d1 = VideoDup.payloadDigest(webm)
    val d2 = VideoDup.payloadDigest(mp4)
    assert(d1.nonEmpty && d1 == d2,
      s"cross-container digest mismatch: $d1 vs $d2")
  }

  test("TS ↔ MP4 re-mux: PES reassembly digests equal to the stbl twin, zero decode") {
    import graft.tools.{MjpegMp4Fixture, TsFixture}
    // reassembly byte-exactness across every packetization shape: a
    // small sample (stuffed start packet), exact start capacity
    // (168), start+1 AF-stuffed continuation, exact
    // start+continuation (352), and a long one
    val sizes = Seq(60, 168, 200, 352, 500)
    val varied = sizes.zipWithIndex.map { case (n, i) =>
      Array.tabulate[Byte](n)(j => ((i * 131 + j * 7) & 0xff).toByte) }
    val tsv = TsFixture.tsFromSamples(varied)
    val vGroups = Multimodal.AvHeaders.tsVideoPesSamples(tsv)
    assert(vGroups.size == varied.size)
    vGroups.zip(varied).foreach { case (g, s) =>
      val got = g.flatMap { case (off, len) =>
        java.util.Arrays.copyOfRange(tsv, off, off + len).toSeq }
      assert(got == s.toSeq, "reassembled PES payload differs from the sample")
    }
    // cross-container digest equality (the re-mux catch itself):
    // uniform even-size samples, because the MP4 muxer writes a
    // uniform stsz padded to the max — the TS twin carries the SAME
    // bytes per access unit
    val samples = (0 until 5).map(i =>
      Array.tabulate[Byte](352)(j => ((i * 131 + j * 7) & 0xff).toByte))
    val ts = TsFixture.tsFromSamples(samples)
    val mp4 = MjpegMp4Fixture.mp4FromSamples(samples, 320, 240, 40000,
      MjpegMp4Fixture.stsdFourcc("avc1", 320, 240))._1
    assert(VideoDup.videoContainer(ts) == "mpeg-ts")
    assert(VideoDup.frameDhashSeq(ts).isEmpty) // no TS pixel decode
    val dTs = VideoDup.payloadDigest(ts)
    val dMp4 = VideoDup.payloadDigest(mp4)
    assert(dTs.nonEmpty && dTs.get._1 == samples.size, s"ts digest $dTs")
    assert(dTs == dMp4, s"cross-container digest mismatch: $dTs vs $dMp4")
    // PES_packet_length BOUNDS the payload: a stray continuation
    // packet appended after the last PES must not change the digest
    val stray = new Array[Byte](188)
    stray(0) = 0x47
    stray(1) = (TsFixture.VideoPid >> 8).toByte
    stray(2) = (TsFixture.VideoPid & 0xff).toByte
    stray(3) = 0x1f // payload only, some cc
    java.util.Arrays.fill(stray, 4, 188, 0x55.toByte)
    assert(VideoDup.payloadDigest(ts ++ stray) == dTs,
      "bytes past PES_packet_length leaked into the digest")
  }

  test("legacy TS fixture rows reassemble one sample per PES and pair via remuxPairs") {
    import graft.tools.{MjpegMp4Fixture, TsFixture}
    import spark.implicits._
    // the committed walk fixture's id contract: nPes PES per segment
    for (id <- Seq(0L, 2L, 5L)) {
      val d = VideoDup.payloadDigest(TsFixture.ts(id))
      assert(d.nonEmpty && d.get._1 == TsFixture.nPes(id), s"id=$id → $d")
    }
    assert(VideoDup.payloadDigest(TsFixture.row(7L)._2).isEmpty)
    // end-to-end: a ts/mp4 twin pair lands in remuxPairs as 'payload'
    // (uniform even sample size: the MP4 muxer pads stsz to the max)
    val samples = (0 until 4).map(i =>
      Array.tabulate[Byte](260)(j => ((i * 31 + j * 11) & 0xff).toByte))
    val rows = Seq(
      (0L, "video/mp2t", TsFixture.tsFromSamples(samples)),
      (1L, "video/mp4", MjpegMp4Fixture.mp4FromSamples(samples, 320, 240, 40000,
        MjpegMp4Fixture.stsdFourcc("avc1", 320, 240))._1),
      (2L, "video/mp2t", TsFixture.ts(9L))) // different content: no pair
    val pairs = VideoDup.remuxPairs(VideoDup.signatureTable(spark,
        rows.toDF("media_id", "mime_type", "media")))
      .select("media_id_a", "media_id_b", "sig_kind")
      .as[(Long, Long, String)].collect().toSet
    assert(pairs == Set((0L, 1L, "payload")), s"got $pairs")
  }

  test("pair face: exact re-mux pair set over the fixture, kinds labelled") {
    import spark.implicits._
    val rows = (0L until 32L).map { id =>
      val (m, b) = VideoDupFixture.row(id); (id, m, b)
    }
    val pairs = VideoDup.remuxPairs(VideoDup.signatureTable(spark,
        rows.toDF("media_id", "mime_type", "media")))
      .as[(Long, Long, String)].collect().toSet
    val want = (0L until 16L).filter(_ % 8 != 7).map(g =>
      (2 * g, 2 * g + 1,
        if (g % 8 == 6 || g % 8 == 5) "payload" else "phash")).toSet
    assert(pairs == want, s"got $pairs")
  }

  test("NAL normalization: Annex-B-in-TS pairs with AVCC-in-MP4 (real re-mux shape)") {
    val g = 5L // the fixture's cross-framing class
    val mp4 = VideoDupFixture.row(10L)._2 // AVCC length prefixes
    val ts = VideoDupFixture.row(11L)._2 // the SAME NALs, Annex-B
    assert(VideoDup.videoContainer(ts) == "mpeg-ts")
    assert(VideoDup.frameDhashSeq(mp4).isEmpty && VideoDup.frameDhashSeq(ts).isEmpty)
    val d = VideoDup.payloadDigest(mp4)
    assert(d.nonEmpty && d == VideoDup.payloadDigest(ts),
      "framing rewrite broke the digest — normalization regressed")
    assert(d.get._1 == AvcMp4Fixture.nFrames(g))
    // byte-level check: the two containers genuinely carry DIFFERENT
    // bytes per access unit (prefix vs start code) — the old
    // raw-byte digest could never have paired them
    val auTs = Multimodal.AvHeaders.tsVideoPesSamples(ts).head.head
    val tsAu = java.util.Arrays.copyOfRange(ts, auTs._1, auTs._1 + auTs._2)
    assert(tsAu.take(4).sameElements(Array[Byte](0, 0, 0, 1)))
    val auMp4 = Multimodal.AvHeaders.mp4AnyVideoSamples(mp4).head
    val mp4Au = java.util.Arrays.copyOfRange(mp4, auMp4._1, auMp4._1 + auMp4._2)
    assert(!mp4Au.take(4).sameElements(tsAu.take(4)))
    assert(mp4Au.drop(4).sameElements(tsAu.drop(4)), "NAL bodies differ")
  }

  test("nalUnits: framing parses, raw fallback, and AU-boundary sensitivity") {
    def units(b: Array[Byte]) = VideoDup.nalUnits(b, 0, b.length)
      .map(_.map { case (o, l) => java.util.Arrays.copyOfRange(b, o, o + l).toSeq })
    val n1 = Array[Byte](0x65, 10, 20, 30)
    val n2 = Array[Byte](0x41, 7, 0, 9, 11)
    // Annex-B with mixed 3-/4-byte start codes
    val annexB = Array[Byte](0, 0, 0, 1) ++ n1 ++ Array[Byte](0, 0, 1) ++ n2
    assert(units(annexB) == Some(Seq(n1.toSeq, n2.toSeq)))
    // AVCC 4-byte lengths
    val avcc = Array[Byte](0, 0, 0, 4) ++ n1 ++ Array[Byte](0, 0, 0, 5) ++ n2
    assert(units(avcc) == Some(Seq(n1.toSeq, n2.toSeq)))
    // 2-byte lengths
    val avcc2 = Array[Byte](0, 4) ++ n1 ++ Array[Byte](0, 5) ++ n2
    assert(units(avcc2) == Some(Seq(n1.toSeq, n2.toSeq)))
    // non-NAL bytes fall back to raw (None): MJPEG-ish, short, junk
    assert(units(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 1, 2)).isEmpty)
    assert(units(Array[Byte](1, 2, 3)).isEmpty)
    // forbidden_zero_bit set → not a NAL stream
    assert(units(Array[Byte](0, 0, 1, 0x80.toByte, 1, 2)).isEmpty)
    // under-consuming length chain → not AVCC
    assert(units(Array[Byte](0, 0, 0, 9) ++ n1).isEmpty)
    // AU-boundary sensitivity of the digest: the same NALs split
    // 1+2 vs 2+1 across access units must digest apart (re-mux
    // equality is per access unit, not per byte stream)
    import graft.tools.{MjpegMp4Fixture, TsFixture}
    def sc(n: Array[Byte]) = Array[Byte](0, 0, 0, 1) ++ n
    val n3 = Array[Byte](0x41, 9, 9, 9, 9, 9)
    val tsA = TsFixture.tsFromSamples(Seq(sc(n1), sc(n2) ++ sc(n3)))
    val tsB = TsFixture.tsFromSamples(Seq(sc(n1) ++ sc(n2), sc(n3)))
    assert(VideoDup.payloadDigest(tsA) != VideoDup.payloadDigest(tsB))
  }

  test("ambiguous AVCC prefix 0x000001xx: the container hint resolves the framing") {
    // a 300-byte NAL's AVCC length prefix is 00 00 01 2C — the AU
    // ALSO parses as Annex-B (review finding): the MP4 side must
    // normalize as length-prefixed (its avcC framing), the TS side
    // as Annex-B, and the cross-framing twins must still pair
    import graft.tools.{MjpegMp4Fixture, TsFixture}
    val nal = Array.tabulate[Byte](300)(j =>
      if (j == 0) 0x41 else ((j * 7 + 3) & 0x7f).toByte)
    val avccAu = Array[Byte](0, 0, 1, 44) ++ nal // BE32 length 300
    val annexBAu = Array[Byte](0, 0, 0, 1) ++ nal
    // both parses of the SAME ambiguous AU succeed, with different
    // boundaries — only the hint picks the right one
    assert(VideoDup.nalUnits(avccAu, 0, avccAu.length, lengthFirst = true)
      .exists(_.map(_._2) == Seq(300)))
    assert(VideoDup.nalUnits(avccAu, 0, avccAu.length, lengthFirst = false)
      .exists(_.map(_._2) != Seq(300)), "the ambiguity this test exists for is gone?")
    val mp4 = MjpegMp4Fixture.mp4FromSamples(Seq(avccAu, avccAu), 320, 240,
      40000, MjpegMp4Fixture.stsdFourcc("avc1", 320, 240))._1
    val ts = TsFixture.tsFromSamples(Seq(annexBAu, annexBAu))
    val d1 = VideoDup.payloadDigest(mp4)
    val d2 = VideoDup.payloadDigest(ts)
    assert(d1.nonEmpty && d1 == d2,
      s"ambiguous-prefix cross-framing twins digest apart: $d1 vs $d2")
  }
}
