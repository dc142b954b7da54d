package graft.ops

import graft.SparkSpec
import graft.tools.{Mp3DupFixture, Mp3Encoder}

/**
 * MPEG-1 Layer III decoder ([[Mp3]]) against the independent in-repo
 * encoder direction ([[Mp3Encoder]]) — the FLAC validation pattern:
 * no reference MP3 codec exists in this container, so the decode
 * logic is pinned by inverting a from-spec encoder exactly, the
 * table constants are gated by completeness validation, and the
 * declared seams (unverified tables, computed prototype) are
 * themselves tested to CLAIM NOTHING rather than decay silently.
 */
class Mp3Spec extends SparkSpec {

  test("every shipped Huffman table is a complete prefix code (the transcription gate)") {
    def check(name: String, entries: Seq[(Int, Int)]): Unit = {
      val kraft = entries.map { case (l, _) => math.pow(2.0, -l) }.sum
      assert(math.abs(kraft - 1.0) < 1e-12, s"$name kraft=$kraft")
      val codes = entries.map { case (l, c) =>
        assert(c >= 0 && c < (1 << l), s"$name code wider than length")
        String.format(s"%${l}s", Integer.toBinaryString(c)).replace(' ', '0')
      }
      assert(codes.distinct.size == codes.size, s"$name duplicate codes")
      for (a <- codes; b <- codes if a != b)
        assert(!b.startsWith(a), s"$name prefix clash $a / $b")
    }
    Mp3Tables.big.foreach { case (id, t) =>
      assert(t.entries.length == t.dim * t.dim, s"table $id entry count")
      check(s"table $id", t.entries.toSeq)
    }
    check("count1A", Mp3Tables.count1A.toSeq)
    check("count1B", Mp3Tables.count1B.toSeq)
    // the gate itself: unverified ids are absent, never half-present
    assert(!Mp3Tables.big.contains(8) && !Mp3Tables.big.contains(13) &&
      !Mp3Tables.big.contains(16) && !Mp3Tables.big.contains(24))
  }

  test("scalefactor-band tables sum to the spec totals (transcription self-check)") {
    assert(Mp3Tables.sfbLong.size == 9, "3 MPEG-1 + 3 MPEG-2 + 3 MPEG-2.5 rates")
    for ((sr, w) <- Mp3Tables.sfbLong) {
      assert(w.length == 22 && w.sum == 576, s"long $sr")
      assert(Mp3Tables.sfbShort(sr).length == 13 &&
        Mp3Tables.sfbShort(sr).sum == 192, s"short $sr")
    }
    assert(Mp3Tables.slen.length == 16 && Mp3Tables.pretab.length == 21)
    // LSF cross-checks (round 20): the normative table-sharing
    // equalities — 16 kHz reuses the 22.05 kHz LONG table; BOTH
    // MPEG-2.5 low rates reuse that long table and the 16 kHz SHORT
    // table (the libmad/mpg123 aliasing; 8 kHz has its own tables)
    assert(Mp3Tables.sfbLong(16000).sameElements(Mp3Tables.sfbLong(22050)))
    assert(Mp3Tables.sfbLong(11025).sameElements(Mp3Tables.sfbLong(22050)))
    assert(Mp3Tables.sfbLong(12000).sameElements(Mp3Tables.sfbLong(22050)))
    assert(Mp3Tables.sfbShort(11025).sameElements(Mp3Tables.sfbShort(16000)))
    assert(Mp3Tables.sfbShort(12000).sameElements(Mp3Tables.sfbShort(16000)))
    assert(!Mp3Tables.sfbLong(8000).sameElements(Mp3Tables.sfbLong(22050)))
    // every LSF slen/partition split covers the exact scalefactor
    // totals (21 long, 36 short, 33 mixed) in EVERY compress range
    for ((lg, sh, mx) <- Seq(
      (Seq(6, 5, 5, 5), Seq(9, 9, 9, 9), Seq(6, 9, 9, 9)), // sfc < 400
      (Seq(6, 5, 7, 3), Seq(9, 9, 12, 6), Seq(6, 9, 12, 6)), // 400-499
      (Seq(11, 10, 0, 0), Seq(18, 18, 0, 0), Seq(15, 18, 0, 0)))) { // >= 500
      assert(lg.sum == 21 && sh.sum == 36 && mx.sum == 33)
    }
  }

  test("MPEG-2/2.5 LSF roundtrip at every low rate (round 20)") {
    // the single-granule frame path end to end: header variant, 9/17
    // byte side info, 9-bit scalefac_compress formula, LSF sfb tables
    for (rate <- Seq(22050, 24000, 16000, 11025, 12000, 8000)) {
      val n = 16000
      val pcm = Array.tabulate(n)(t => (Mp3DupFixture.signal(3L, t) * 28000).toInt)
      val mp3 = Mp3Encoder.encodeLsfMono(pcm, rate)
      val dec = Mp3.decode(mp3).getOrElse(sys.error(s"lsf $rate claims nothing"))
      assert(dec.sampleRate == rate && dec.channels == 1)
      assert(dec.samples.length > 0) // length is frame-quantized; SNR gates
      def snrAt(off: Int): Double = {
        var se = 0.0
        var ss = 0.0
        var i = 1000
        while (i < n - 1000) {
          val r = pcm(i) / 32768.0
          val j = i + off
          val d = if (j >= 0 && j < dec.samples.length) dec.samples(j) else 0.0
          se += (r - d) * (r - d); ss += r * r
          i += 1
        }
        10.0 * math.log10(ss / se)
      }
      val s0 = snrAt(0)
      assert(s0 > 15.0, s"lsf $rate roundtrip SNR $s0 dB")
      assert(Seq(-576, -32, 32, 576).forall(o => snrAt(o) < s0),
        s"lsf $rate alignment drifted")
    }
    // the ≥400 scalefac_compress RANGES use their own slen/partition
    // splits — (6,5,7,3) for 400-499, (11,10) + implied preflag for
    // ≥500 (round-20 review fix: the splits are range-dependent, not
    // fixed); each roundtrips through true bytes
    for (mode <- Seq(1, 2)) {
      val n = 16000
      val pcm = Array.tabulate(n)(t => (Mp3DupFixture.signal(9L, t) * 26000).toInt)
      val mp3 = Mp3Encoder.encodeLsfMono(pcm, 22050, sfcMode = mode)
      val dec = Mp3.decode(mp3).getOrElse(sys.error(s"sfc mode $mode claims nothing"))
      var se = 0.0
      var ss = 0.0
      var i = 1000
      while (i < n - 1000) {
        val r = pcm(i) / 32768.0
        val d = r - dec.samples(i)
        se += d * d; ss += r * r
        i += 1
      }
      val s = 10.0 * math.log10(ss / se)
      assert(s > 12.0, s"sfc mode $mode roundtrip SNR $s dB")
    }
    // an LSF joint-INTENSITY frame claims nothing (the declared seam):
    // flip a mono LSF header to joint-stereo+intensity — the frame
    // structure no longer matches and decode must return None/claim
    // nothing rather than decode against the wrong pan law
    val mp3 = Mp3Encoder.encodeLsfMono(
      Array.tabulate(8000)(t => (Mp3DupFixture.signal(3L, t) * 20000).toInt), 22050)
    val patched = mp3.clone()
    var i = 0
    while (i + 4 <= patched.length) {
      if ((patched(i) & 0xff) == 0xff) patched(i + 3) =
        ((patched(i + 3) & 0x0f) | 0x50).toByte // joint stereo, intensity
      i += 1
    }
    assert(Mp3.decode(patched).isEmpty)
  }

  test("encode→decode roundtrip: exact length, sample-aligned, SNR past the quantizer floor") {
    val pcm = Mp3DupFixture.basePcm(1L)
    val mp3 = Mp3Encoder.encode(pcm, 32000)
    val dec = Mp3.decode(mp3).get
    assert(dec.sampleRate == 32000 && dec.channels == 1)
    // N ≡ −480 (mod 1152) → decode returns exactly N samples
    assert(dec.samples.length == pcm.length)
    def snrAt(off: Int): Double = {
      var se = 0.0
      var ss = 0.0
      var i = 2000
      while (i < pcm.length - 2000) {
        val r = pcm(i) / 32768.0
        val j = i + off
        val d = if (j >= 0 && j < dec.samples.length) dec.samples(j) else 0.0
        se += (r - d) * (r - d); ss += r * r
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    val s0 = snrAt(0)
    assert(s0 > 14.0, s"roundtrip SNR $s0 dB")
    // delay compensation: offset 0 beats every nearby alignment
    assert((-40 to 40).filter(_ != 0).forall(o => snrAt(o) < s0),
      "offset 0 is not the best alignment — delay handshake drifted")
  }

  test("fingerprint contract: mp3 twins within the codec gate, lossless twins within the exact gate") {
    for (g <- Seq(0L, 3L, 9L)) {
      val a = AudioFp.signature(Mp3DupFixture.row(2 * g)._2).get
      val b = AudioFp.signature(Mp3DupFixture.row(2 * g + 1)._2).get
      val ham = (0 until AudioFp.SigBands).map(i => Integer.bitCount(a(i) ^ b(i))).sum
      assert(ham <= 7, s"group $g mp3 twin hamming $ham")
    }
    for (g <- Seq(0L, 2L)) { // WAV ↔ FLAC: lossless + perturbation
      val a = AudioFp.signature(graft.tools.AudioDupFixture.row(2 * g)._2).get
      val b = AudioFp.signature(graft.tools.AudioDupFixture.row(2 * g + 1)._2).get
      val ham = (0 until AudioFp.SigBands).map(i => Integer.bitCount(a(i) ^ b(i))).sum
      assert(ham <= 3, s"group $g lossless twin hamming $ham")
    }
  }

  private def setBits(b: Array[Byte], bitOff: Int, len: Int, v: Int): Unit = {
    var k = 0
    while (k < len) {
      val bit = (v >> (len - 1 - k)) & 1
      val p = bitOff + k
      val mask = 1 << (7 - (p & 7))
      if (bit == 1) b(p >> 3) = (b(p >> 3) | mask).toByte
      else b(p >> 3) = (b(p >> 3) & ~mask).toByte
      k += 1
    }
  }

  test("unverified Huffman table selection claims nothing (the gate at decode time)") {
    val mp3 = Mp3Encoder.encode(Mp3DupFixture.basePcm(2L), 32000)
    assert(Mp3.decode(mp3).isDefined)
    val patched = mp3.clone()
    // mono frame layout: header 32 bits, side info mdb9+priv5+scfsi4,
    // per granule part23(12)+big(9)+gg(8)+sfc(4)+wsf(1) then the
    // first 5-bit table_select — granule 0 at frame bit 84,
    // granule 1 at 32+18+59+34 = 143
    val frameBytes = 144000 * 320 / 32000
    var off = 0
    while (off + frameBytes <= patched.length) {
      setBits(patched, off * 8 + 84, 5, 13) // table 13: not shipped
      setBits(patched, off * 8 + 143, 5, 13)
      off += frameBytes
    }
    assert(Mp3.decode(patched).isEmpty,
      "a frame selecting an unverified table must claim nothing")
  }

  test("a frame dropped on granule-1 failure leaves NO granule-0 audio in the filterbank state") {
    val mp3 = Mp3Encoder.encode(Mp3DupFixture.basePcm(5L), 32000)
    val frameBytes = 144000 * 320 / 32000
    val patched = mp3.clone()
    // poison ONLY frame 0's granule 1 (table_select at frame bit 143
    // → unshipped table 13): the frame drops, the rest decodes
    setBits(patched, 143, 5, 13)
    val full = Mp3.decode(patched).get
    // the encoder writes main_data_begin = 0 (no reservoir), so the
    // stream minus the poisoned frame carries the same frames 1..n —
    // with per-frame STAGED overlap/synth state the two decodes are
    // bit-identical; unstaged state would leak frame 0's granule 0
    // into the first surviving frame's overlap-add
    val tail = Mp3.decode(
      java.util.Arrays.copyOfRange(patched, frameBytes, patched.length)).get
    assert(full.samples.length == tail.samples.length)
    assert(full.samples.sameElements(tail.samples),
      "dropped frame polluted the filterbank state")
  }

  test("tolerance: junk, lone frames, truncation, ID3 framing") {
    assert(Mp3.decode("not an mp3 at all".getBytes("US-ASCII")).isEmpty)
    assert(Mp3.decode(null).isEmpty)
    val mp3 = Mp3Encoder.encode(Mp3DupFixture.basePcm(4L), 32000)
    val frameBytes = 144000 * 320 / 32000
    // a single frame is not identified as mp3 (random-sync defense)
    assert(Mp3.decode(java.util.Arrays.copyOf(mp3, frameBytes)).isEmpty)
    // truncation mid-frame: complete frames stay claimed
    val cut = java.util.Arrays.copyOf(mp3, 3 * frameBytes + 17)
    val dec = Mp3.decode(cut).get
    assert(dec.samples.length == 3 * 1152 - 480)
    // ID3v2 tag in front: skipped by the syncsafe size
    val tag = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0, 0, 0, 40) ++ new Array[Byte](40)
    assert(Mp3.decode(tag ++ mp3).map(_.samples.length) ==
      Mp3.decode(mp3).map(_.samples.length))
  }

  test("the roundtrip exercises EVERY shipped table, not just one") {
    def getBits(b: Array[Byte], bitOff: Int, len: Int): Int = {
      var v = 0
      var k = 0
      while (k < len) {
        val p = bitOff + k
        v = (v << 1) | ((b(p >> 3) >> (7 - (p & 7))) & 1)
        k += 1
      }
      v
    }
    val frameBytes = 144000 * 320 / 32000
    val bigSeen = scala.collection.mutable.Set.empty[Int]
    val c1Seen = scala.collection.mutable.Set.empty[Int]
    // designed multi-tones, encoded with sclCap = 0 so quantized
    // magnitudes track raw amplitudes: one tone per region at the
    // amplitude that lands each target table's range (q ≈ 5.5·a^¾),
    // plus a |q|=1 tail tone past the last big value for count1
    val cases = Seq(
      // (region0 amp @400Hz, region1 amp @3kHz, region2 amp @8kHz, tail @14kHz)
      (1.0, 0.25, 0.08, 0.08), // → 7/9, 2/3, 1, quads
      (1.0, 0.45, 0.0, 0.08), //  → 7/9, 5/6, 0, quads
      (0.08, 1.0, 0.45, 0.0)) // → 1, 7/9, 5/6
    for ((a0, a1, a2, a3) <- cases) {
      val pcm = Array.tabulate(Mp3DupFixture.NSamples) { t =>
        val s = a0 * math.sin(2 * math.Pi * 400.0 * t / 32000) +
          a1 * math.sin(2 * math.Pi * 3000.0 * t / 32000 + 1.0) +
          a2 * math.sin(2 * math.Pi * 8000.0 * t / 32000 + 2.0) +
          a3 * math.sin(2 * math.Pi * 14000.0 * t / 32000 + 0.5)
        (s * 16000).toInt
      }
      val mp3 = Mp3Encoder.encode(pcm, 32000, sclCap = 0)
      var off = 0
      while (off + frameBytes <= mp3.length) {
        for (grBase <- Seq(off * 8 + 50, off * 8 + 109)) { // granule starts
          bigSeen += getBits(mp3, grBase + 34, 5)
          bigSeen += getBits(mp3, grBase + 39, 5)
          bigSeen += getBits(mp3, grBase + 44, 5)
          c1Seen += getBits(mp3, grBase + 58, 1)
        }
        off += frameBytes
      }
      // every such encode must still decode end to end
      assert(Mp3.decode(mp3).isDefined)
    }
    // the per-region smallest-covering-table policy + granule-parity
    // alternates reach the whole verified set end-to-end
    assert(Set(0, 1, 2, 3, 5, 6, 7, 9).subsetOf(bigSeen.toSet),
      s"big tables exercised: $bigSeen")
    assert(c1Seen == Set(0, 1), s"count1 tables exercised: $c1Seen")
    assert(bigSeen.toSet.subsetOf(Set(0, 1, 2, 3, 5, 6, 7, 9)),
      s"encoder emitted an unshipped table: $bigSeen")
  }

  test("stereo MS roundtrip exercises the 2-channel decode paths") {
    val n = Mp3DupFixture.NSamples
    val l = Array.tabulate(n)(t => (Mp3DupFixture.signal(1L, t) * 32000).toInt)
    val r = Array.tabulate(n)(t => (Mp3DupFixture.signal(2L, t) * 32000).toInt)
    val mp3 = Mp3Encoder.encodeStereoMs(l, r, 32000)
    val dec = Mp3.decode(mp3).get
    assert(dec.channels == 2 && dec.samples.length == 2 * n)
    def snr(ref: Array[Int], ch: Int): Double = {
      var se = 0.0
      var ss = 0.0
      var i = 2000
      while (i < n - 2000) {
        val a = ref(i) / 32768.0
        val d = dec.samples(i * 2 + ch)
        se += (a - d) * (a - d); ss += a * a
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    assert(snr(l, 0) > 10.0, s"left ${snr(l, 0)}")
    assert(snr(r, 1) > 10.0, s"right ${snr(r, 1)}")
    // intensity stereo is DECODED since round 18 (long blocks):
    // flipping the bit on an MS stream reinterprets the side
    // channel's rzero tail as intensity bands — a different but
    // valid decode, not a claim-nothing
    val frameBytes = 144000 * 320 / 32000
    val patched = mp3.clone()
    var off = 0
    while (off + frameBytes <= patched.length) {
      patched(off + 3) = (patched(off + 3) | 0x10).toByte
      off += frameBytes
    }
    val decP = Mp3.decode(patched).get
    assert(decP.channels == 2 && decP.samples.length == dec.samples.length)
  }

  test("intensity stereo roundtrip: positions reconstruct the panned highs") {
    val n = Mp3DupFixture.NSamples
    // lows differ per channel; the high band is the SAME tone panned
    // hard toward the left (R = 0.5·L) — the regime intensity coding
    // represents exactly
    def lo1(t: Int) = 0.3 * math.sin(2 * math.Pi * 500.0 * t / 32000)
    def lo2(t: Int) = 0.3 * math.sin(2 * math.Pi * 800.0 * t / 32000 + 1.0)
    def hi(t: Int) = 0.25 * math.sin(2 * math.Pi * 6500.0 * t / 32000 + 0.3)
    val l = Array.tabulate(n)(t => ((lo1(t) + hi(t)) * 32000).toInt)
    val r = Array.tabulate(n)(t => ((lo2(t) + 0.5 * hi(t)) * 32000).toInt)
    val mp3 = Mp3Encoder.encodeStereoIntensity(l, r, 32000)
    // header says joint stereo + intensity
    assert((mp3(3) >> 6) == 1 && ((mp3(3) >> 4) & 3) == 1)
    val dec = Mp3.decode(mp3).get
    assert(dec.channels == 2 && dec.samples.length == 2 * n)
    def snr(ref: Array[Int], ch: Int): Double = {
      var se = 0.0
      var ss = 0.0
      var i = 2000
      while (i < n - 2000) {
        val a = ref(i) / 32768.0
        val d = dec.samples(i * 2 + ch)
        se += (a - d) * (a - d); ss += a * a
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    assert(snr(l, 0) > 8.0, s"left ${snr(l, 0)}")
    assert(snr(r, 1) > 8.0, s"right ${snr(r, 1)}")
  }

  test("intensity over SHORT blocks: the per-window pan decodes (round 20)") {
    val n = Mp3DupFixture.NSamples
    // same shape as the long-block intensity test: distinct lows,
    // one high tone panned toward the left — now through block_type
    // 2 granules (3 windows × short band geometry)
    def lo1(t: Int) = 0.3 * math.sin(2 * math.Pi * 500.0 * t / 32000)
    def lo2(t: Int) = 0.3 * math.sin(2 * math.Pi * 800.0 * t / 32000 + 1.0)
    def hi(t: Int) = 0.25 * math.sin(2 * math.Pi * 6500.0 * t / 32000 + 0.3)
    val l = Array.tabulate(n)(t => ((lo1(t) + hi(t)) * 32000).toInt)
    val r = Array.tabulate(n)(t => ((lo2(t) + 0.5 * hi(t)) * 32000).toInt)
    val mp3 = Mp3Encoder.encodeStereoIntensityShort(l, r, 32000)
    // header says joint stereo + intensity
    assert((mp3(3) >> 6) == 1 && ((mp3(3) >> 4) & 3) == 1)
    val dec = Mp3.decode(mp3).getOrElse(
      sys.error("short-block intensity claims nothing — the guard regressed"))
    assert(dec.channels == 2 && dec.samples.length == 2 * n)
    def snr(ref: Array[Int], ch: Int): Double = {
      var se = 0.0
      var ss = 0.0
      var i = 2000
      while (i < n - 2000) {
        val a = ref(i) / 32768.0
        val d = dec.samples(i * 2 + ch)
        se += (a - d) * (a - d); ss += a * a
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    assert(snr(l, 0) > 8.0, s"left ${snr(l, 0)}")
    assert(snr(r, 1) > 8.0, s"right ${snr(r, 1)}")
    // the codec fingerprint gate against the WAV mixdown twin — on
    // the fixture's band-placed signal family (every fingerprint
    // band carries deliberate signal; a tones-only probe leaves
    // noise-floor bands whose comparisons flip arbitrarily at ANY
    // codec's noise level, long or short)
    val l2 = Array.tabulate(n)(t => (Mp3DupFixture.signal(1L, t) * 30000).toInt)
    val r2 = Array.tabulate(n)(t => (Mp3DupFixture.signal(2L, t) * 30000).toInt)
    val mp32 = Mp3Encoder.encodeStereoIntensityShort(l2, r2, 32000)
    val mono = Array.tabulate(n)(t => (l2(t) + r2(t)) / 2)
    val a = AudioFp.signature(Mp3DupFixture.wav(mono)).get
    val b = AudioFp.signature(mp32).get
    val d = (0 until AudioFp.SigBands).map(k => Integer.bitCount(a(k) ^ b(k))).sum
    assert(d <= 7, s"short-intensity twin at hamming $d")
  }

  test("LSF short blocks and LSF stereo MS roundtrip (round 20)") {
    def snr(ref: Array[Int], dec: Array[Float], ch: Int, nch: Int): Double = {
      var se = 0.0
      var ss = 0.0
      var i = 2000
      while (i < ref.length - 2000) {
        val a = ref(i) / 32768.0
        val d = if (i * nch + ch < dec.length) dec(i * nch + ch) else 0.0
        se += (a - d) * (a - d); ss += a * a
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    // LSF SHORT-block mono: the LSF (9,9,9,9) scalefactor partitions
    // over the short geometry through true bytes
    val n = 16000
    val pcm = Array.tabulate(n)(t => (Mp3DupFixture.signal(4L, t) * 28000).toInt)
    for (rate <- Seq(22050, 8000)) {
      val mp3 = Mp3Encoder.encodeLsfMonoShort(pcm, rate)
      val dec = Mp3.decode(mp3).getOrElse(sys.error(s"lsf-short $rate claims nothing"))
      assert(dec.sampleRate == rate && dec.channels == 1)
      val s = snr(pcm, dec.samples, 0, 1)
      assert(s > 15.0, s"lsf short $rate SNR $s dB")
    }
    // LSF joint-stereo MS: the 17-byte 2-channel side info + MS
    // inverse through the single-granule frame
    val l = Array.tabulate(n)(t => (Mp3DupFixture.signal(5L, t) * 26000).toInt)
    val r = Array.tabulate(n)(t => (Mp3DupFixture.signal(6L, t) * 26000).toInt)
    val ms = Mp3Encoder.encodeLsfStereoMs(l, r, 24000)
    val dec = Mp3.decode(ms).getOrElse(sys.error("lsf stereo claims nothing"))
    assert(dec.channels == 2 && dec.sampleRate == 24000)
    assert(snr(l, dec.samples, 0, 2) > 12.0, s"left ${snr(l, dec.samples, 0, 2)}")
    assert(snr(r, dec.samples, 1, 2) > 12.0, s"right ${snr(r, dec.samples, 1, 2)}")
  }

  test("MIXED blocks roundtrip: long prefix + short rest in one granule (round 20)") {
    // exercises the decoder's mixed scalefactor read (8 long + 9
    // short bands), the mixed requantize split at line 36, the
    // sbLimit-1 alias reduction and the per-subband hybrid window
    // dispatch — none of which any prior stream touched
    val n = Mp3DupFixture.NSamples
    val pcm = Mp3DupFixture.basePcm(12L)
    val mp3 = Mp3Encoder.encodeMonoMixed(pcm, 32000)
    val dec = Mp3.decode(mp3).getOrElse(sys.error("mixed claims nothing"))
    assert(dec.sampleRate == 32000 && dec.channels == 1)
    assert(dec.samples.length == n, s"${dec.samples.length} vs $n")
    def snrAt(off: Int): Double = {
      var se = 0.0
      var ss = 0.0
      var i = 1000
      while (i < n - 1000) {
        val r = pcm(i) / 32768.0
        val j = i + off
        val d = if (j >= 0 && j < dec.samples.length) dec.samples(j) else 0.0
        se += (r - d) * (r - d); ss += r * r
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    val s0 = snrAt(0)
    assert(s0 > 15.0, s"mixed roundtrip SNR $s0 dB")
    assert((-32 to 32).filter(_ != 0).forall(o => snrAt(o) < s0),
      "mixed alignment drifted")
    // and the codec fingerprint gate against the WAV twin
    val a = AudioFp.signature(Mp3DupFixture.wav(pcm)).get
    val b = AudioFp.signature(mp3).get
    val d = (0 until AudioFp.SigBands).map(k => Integer.bitCount(a(k) ^ b(k))).sum
    assert(d <= 7, s"mixed twin at hamming $d")
    // intensity over MIXED blocks: jointStereoShort's mixed branch
    // (longEnd-offset band walk) through true bytes
    val l = Array.tabulate(n)(t => (Mp3DupFixture.signal(7L, t) * 26000).toInt)
    val r = Array.tabulate(n)(t => (Mp3DupFixture.signal(8L, t) * 26000).toInt)
    val mi = Mp3Encoder.encodeStereoIntensityMixed(l, r, 32000)
    assert((mi(3) >> 6) == 1 && ((mi(3) >> 4) & 3) == 1) // joint + intensity
    val dec2 = Mp3.decode(mi).getOrElse(
      sys.error("mixed-intensity claims nothing — the shape guard misfired"))
    assert(dec2.channels == 2 && dec2.samples.length == 2 * n)
    def snr2(ref: Array[Int], ch: Int): Double = {
      var se = 0.0
      var ss = 0.0
      var i = 2000
      while (i < n - 2000) {
        val v = ref(i) / 32768.0
        val x = dec2.samples(i * 2 + ch)
        se += (v - x) * (v - x); ss += v * v
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    assert(snr2(l, 0) > 8.0, s"mixed-intensity left ${snr2(l, 0)}")
    assert(snr2(r, 1) > 8.0, s"mixed-intensity right ${snr2(r, 1)}")
  }

  test("pair face: exact mp3 re-encode pair set over the fixture") {
    import spark.implicits._
    val rows = (0L until 32L).map { id =>
      val (m, b) = Mp3DupFixture.row(id); (id, m, b)
    }
    val pairs = AudioFp.nearDupPairsCodec(AudioFp.fingerprintTable(spark,
        rows.toDF("media_id", "mime_type", "media")))
      .select("media_id_a", "media_id_b").as[(Long, Long)].collect().toSet
    val want = (0L until 16L).filter(_ % 8 != 7).map(g => (2 * g, 2 * g + 1)).toSet
    assert(pairs == want, s"got $pairs")
  }
}
