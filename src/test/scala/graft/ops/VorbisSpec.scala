package graft.ops

import graft.SparkSpec
import graft.tools.{Mp3DupFixture, VorbisEncoder}

/**
 * Ogg Vorbis decoder ([[Vorbis]]) against the independent in-repo
 * encoder direction ([[VorbisEncoder]]) — the FLAC/MP3 validation
 * pattern. The IMDCT and the lapped-window math are additionally
 * pinned against the spec's DIRECT formulas (no trust in the FFT
 * factorization), and the declared seams (floor 0, single-entry
 * codebooks) are tested to claim nothing.
 */
class VorbisSpec extends SparkSpec {

  test("imdct equals the spec's direct formula (both block sizes)") {
    for (n <- Seq(64, 512, 2048)) {
      val rnd = new scala.util.Random(7 + n)
      val spec = Array.fill(n / 2)(rnd.nextDouble() * 2 - 1)
      val fast = Vorbis.imdct(spec, n)
      var j = 0
      while (j < n) {
        var acc = 0.0
        var k = 0
        while (k < n / 2) {
          acc += spec(k) * math.cos(2.0 * math.Pi / n * (j + 0.5 + n / 4.0) * (k + 0.5))
          k += 1
        }
        assert(math.abs(fast(j) - acc) < 1e-8 * n, s"n=$n j=$j: ${fast(j)} vs $acc")
        j += 1
      }
    }
  }

  test("windowed MDCT/IMDCT overlap-add is a unity roundtrip, incl. mixed block sizes") {
    // pure lapped-transform TDAC over the decoder's own window(),
    // independent of the bitstream: long/short transitions use the
    // flag-dependent slopes; reconstruction must be exact where
    // blocks fully overlap
    val bs0 = 256
    val bs1 = 2048
    val rnd = new scala.util.Random(11)
    val x = Array.fill(6 * bs1 + 4096)(rnd.nextDouble() * 2 - 1)
    // block schedule: sizes with spec-consistent prev/next flags
    val sizes = Seq(bs0, bs0, bs1, bs1, bs0, bs1, bs0, bs0, bs0, bs1, bs1, bs1)
    case class Blk(n: Int, start: Int, w: Array[Double])
    // absolute placement: consecutive blocks' slope CENTERS align,
    // so the start advance from block i−1 to i is 3·prevN/4 − n/4 —
    // negative when a long block follows a short one (its zero
    // region extends back over the short block)
    var pos = bs1
    val blocks = sizes.zipWithIndex.map { case (n, i) =>
      val prevN = if (i == 0) n else sizes(i - 1)
      val nextN = if (i == sizes.length - 1) n else sizes(i + 1)
      if (i > 0) pos += 3 * sizes(i - 1) / 4 - n / 4
      val w =
        if (n == bs0) Vorbis.window(n, bs0, bs0, prevFlag = true, nextFlag = true)
        else Vorbis.window(n, bs0, bs0, prevFlag = prevN == bs1, nextFlag = nextN == bs1)
      Blk(n, pos, w)
    }
    // forward: per block, windowed direct MDCT at scale 4/N
    def mdct(b: Blk): Array[Double] = {
      val out = new Array[Double](b.n / 2)
      var k = 0
      while (k < b.n / 2) {
        var acc = 0.0
        var j = 0
        while (j < b.n) {
          acc += x(b.start + j) * b.w(j) *
            math.cos(2.0 * math.Pi / b.n * (j + 0.5 + b.n / 4.0) * (k + 0.5))
          j += 1
        }
        out(k) = acc * 4.0 / b.n
        k += 1
      }
      out
    }
    // inverse: imdct + window + overlap-add at the same placement
    val recon = new Array[Double](x.length)
    blocks.foreach { b =>
      val y = Vorbis.imdct(mdct(b), b.n)
      var j = 0
      while (j < b.n) { recon(b.start + j) += y(j) * b.w(j); j += 1 }
    }
    // exact where coverage is complete: from the center of block 0
    // to the center of the last block
    val from = blocks.head.start + blocks.head.n / 2
    val until = blocks.last.start + blocks.last.n / 2
    var j = from
    while (j < until) {
      assert(math.abs(recon(j) - x(j)) < 1e-9, s"j=$j: ${recon(j)} vs ${x(j)}")
      j += 1
    }
  }

  test("encode→decode roundtrip: exact length, sample-aligned, SNR past the quantizer floor") {
    val pcm = Mp3DupFixture.basePcm(1L)
    val ogg = VorbisEncoder.encode(pcm, 32000)
    val dec = Vorbis.decode(ogg).getOrElse(sys.error("claims nothing"))
    assert(dec.sampleRate == 32000 && dec.channels == 1)
    assert(dec.samples.length == pcm.length, s"${dec.samples.length} vs ${pcm.length}")
    def snrAt(off: Int): Double = {
      var se = 0.0
      var ss = 0.0
      var i = 1000
      while (i < pcm.length - 1000) {
        val r = pcm(i) / 32768.0
        val j = i + off
        val d = if (j >= 0 && j < dec.samples.length) dec.samples(j) else 0.0
        se += (r - d) * (r - d); ss += r * r
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    val s0 = snrAt(0)
    assert(s0 > 25.0, s"roundtrip SNR $s0 dB")
    assert((-32 to 32).filter(_ != 0).forall(o => snrAt(o) < s0),
      "offset 0 is not the best alignment — the granule handshake drifted")
  }

  test("stereo roundtrip exercises square-polar coupling and residue type 2 deinterleave") {
    val n = Mp3DupFixture.NSamples
    val l = Array.tabulate(n)(t => (Mp3DupFixture.signal(1L, t) * 32000).toInt)
    val r = Array.tabulate(n)(t => (Mp3DupFixture.signal(2L, t) * 32000).toInt)
    val ogg = VorbisEncoder.encodeStereo(l, r, 32000)
    val dec = Vorbis.decode(ogg).getOrElse(sys.error("claims nothing"))
    assert(dec.channels == 2 && dec.samples.length == 2 * n)
    def snr(ref: Array[Int], ch: Int): Double = {
      var se = 0.0
      var ss = 0.0
      var i = 1000
      while (i < n - 1000) {
        val a = ref(i) / 32768.0
        val d = dec.samples(i * 2 + ch)
        se += (a - d) * (a - d); ss += a * a
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    // the angle channel reconstructs as M−A, accumulating BOTH
    // quantization errors — ~3 dB below the mag channel by design
    assert(snr(l, 0) > 15.0, s"left ${snr(l, 0)}")
    assert(snr(r, 1) > 12.0, s"right ${snr(r, 1)}")
  }

  test("block-SWITCHED roundtrip (256/2048): the real-web stream shape decodes exactly") {
    val pcm = Mp3DupFixture.basePcm(6L)
    val ogg = graft.tools.VorbisEncoder.encodeSwitched(pcm, 32000)
    val dec = Vorbis.decode(ogg).getOrElse(sys.error("claims nothing"))
    assert(dec.sampleRate == 32000 && dec.channels == 1)
    assert(dec.samples.length == pcm.length, s"${dec.samples.length} vs ${pcm.length}")
    def snrAt(off: Int): Double = {
      var se = 0.0
      var ss = 0.0
      var i = 1000
      while (i < pcm.length - 1000) {
        val r = pcm(i) / 32768.0
        val j = i + off
        val d = if (j >= 0 && j < dec.samples.length) dec.samples(j) else 0.0
        se += (r - d) * (r - d); ss += r * r
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    val s0 = snrAt(0)
    // the raised-floor shaping costs ~1 dB of quantizer precision at
    // the raised bins; the structural contract is exactness of
    // length/alignment and the codec-gate fingerprint below
    assert(s0 > 22.0, s"switched roundtrip SNR $s0 dB")
    assert((-32 to 32).filter(_ != 0).forall(o => snrAt(o) < s0),
      "offset 0 is not the best alignment across block switches")
    // and the switched re-encode still lands inside the codec gate
    val a = AudioFp.signature(Mp3DupFixture.wav(pcm)).get
    val b = AudioFp.signature(ogg).get
    val ham = (0 until AudioFp.SigBands).map(i => Integer.bitCount(a(i) ^ b(i))).sum
    assert(ham <= 7, s"switched vorbis twin hamming $ham")
  }

  test("fingerprint contract: vorbis twins within the codec gate") {
    for (g <- Seq(0L, 3L, 9L)) {
      val pcm = Mp3DupFixture.basePcm(g)
      val a = AudioFp.signature(Mp3DupFixture.wav(pcm)).get
      val b = AudioFp.signature(VorbisEncoder.encode(pcm, 32000)).get
      val ham = (0 until AudioFp.SigBands).map(i => Integer.bitCount(a(i) ^ b(i))).sum
      assert(ham <= 7, s"group $g vorbis twin hamming $ham")
    }
  }

  test("STEREO block-switched roundtrip: coupling + asymmetric windows together") {
    val n = Mp3DupFixture.NSamples
    val l = Array.tabulate(n)(t => (Mp3DupFixture.signal(3L, t) * 32000).toInt)
    val r = Array.tabulate(n)(t => (Mp3DupFixture.signal(5L, t) * 32000).toInt)
    val ogg = graft.tools.VorbisEncoder.encodeSwitchedChannels(Seq(l, r), 32000)
    val dec = Vorbis.decode(ogg).getOrElse(sys.error("claims nothing"))
    assert(dec.channels == 2 && dec.samples.length == 2 * n)
    def snr(ref: Array[Int], ch: Int): Double = {
      var se = 0.0
      var ss = 0.0
      var i = 1000
      while (i < n - 1000) {
        val a = ref(i) / 32768.0
        val d = dec.samples(i * 2 + ch)
        se += (a - d) * (a - d); ss += a * a
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    assert(snr(l, 0) > 14.0, s"left ${snr(l, 0)}")
    assert(snr(r, 1) > 11.0, s"right ${snr(r, 1)}")
  }

  test("residue types 0 and 1 roundtrip (per-channel layouts, type 0's strided partitions)") {
    val pcm = Mp3DupFixture.basePcm(7L)
    for (resType <- Seq(0, 1)) {
      val ogg = graft.tools.VorbisEncoder.encodeMonoResidue(pcm, 32000, resType)
      val dec = Vorbis.decode(ogg).getOrElse(sys.error(s"type $resType claims nothing"))
      assert(dec.samples.length == pcm.length)
      var se = 0.0
      var ss = 0.0
      var i = 1000
      while (i < pcm.length - 1000) {
        val r = pcm(i) / 32768.0
        val d = dec.samples(i)
        se += (r - d) * (r - d); ss += r * r
        i += 1
      }
      val snr = 10.0 * math.log10(ss / se)
      assert(snr > 25.0, s"residue type $resType SNR $snr dB")
    }
  }

  test("sequence_p codebook roundtrip: the accumulation branch decodes exactly") {
    // round 20: the coarse book declares sequence_p — decodeVq must
    // ACCUMULATE out_k = q_k + out_{k−1}; a decoder ignoring the bit
    // would reconstruct deltas as absolutes and collapse the SNR
    val pcm = Mp3DupFixture.basePcm(8L)
    val ogg = VorbisEncoder.encodeMonoSeqP(pcm, 32000)
    val dec = Vorbis.decode(ogg).getOrElse(sys.error("claims nothing"))
    assert(dec.samples.length == pcm.length)
    var se = 0.0
    var ss = 0.0
    var i = 1000
    while (i < pcm.length - 1000) {
      val r = pcm(i) / 32768.0
      val d = r - dec.samples(i)
      se += d * d; ss += r * r
      i += 1
    }
    val snr = 10.0 * math.log10(ss / se)
    assert(snr > 25.0, s"seqP roundtrip SNR $snr dB")
  }

  test("floor posts overflowing `room` fold per spec — both directions, via bitstream") {
    // direct spec-arithmetic pins of the folding branch (re-derived
    // here, not shared with the implementation's callers):
    // fold DOWN — y=[127,127], v=2 ≥ room=2·min(1,127)=2, highroom 1
    // < lowroom 127 → finalY = 127 − (2−1) − 1 = 125
    val down = new Array[Float](256)
    Vorbis.floor1Synth(Array(0, 128, 32, 64), Array(127, 127, 2, 0), 2, 256, down)
    assert(down(32) == Vorbis.InverseDb(250))
    // fold UP — y=[8,8], v=20 ≥ room=2·min(120,8)=16, highroom 120 >
    // lowroom 8 → finalY = 20 − 8 + 8 = 20
    val up = new Array[Float](256)
    Vorbis.floor1Synth(Array(0, 128, 32, 64), Array(8, 8, 20, 0), 2, 256, up)
    assert(up(32) == Vorbis.InverseDb(40))
    def snrOf(pcm: Array[Int], ogg: Array[Byte]): Double = {
      val dec = Vorbis.decode(ogg).getOrElse(sys.error("claims nothing"))
      assert(dec.samples.length == pcm.length)
      var se = 0.0
      var ss = 0.0
      var i = 1000
      while (i < pcm.length - 1000) {
        val r = pcm(i) / 32768.0
        val d = r - dec.samples(i)
        se += d * d; ss += r * r
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    // fold-down through the bitstream on a normal signal (the 1.3×
    // curve dip stays inside the residue lattice)
    val pcm = Mp3DupFixture.basePcm(9L)
    val sDown = snrOf(pcm, VorbisEncoder.encodeMonoFloorOverflow(pcm, 32000, high = true))
    assert(sDown > 20.0, s"fold-down roundtrip SNR $sDown dB")
    // fold-up RAISES the curve over the floor's X range [0, 128) by
    // ~10^(l·7/255/…) — any signal living there would quantize to
    // zero against the raised curve, so the probe signal is a QUIET
    // (base level ≤ 61 ⇒ amplitude ≲ 3 LSB) HIGH-frequency tone at
    // bin ~180: past the last post, where the curve keeps the base
    // level and the roundtrip stays quantizer-exact
    val quiet = Array.tabulate(Mp3DupFixture.NSamples)(t =>
      math.round(3.0 * math.sin(2.0 * math.Pi * 180.0 / 512.0 * t)).toInt)
    assert(quiet.exists(_ != 0), "quiet signal degenerated to silence")
    val sUp = snrOf(quiet, VorbisEncoder.encodeMonoFloorOverflow(quiet, 32000, high = false))
    assert(sUp > 20.0, s"fold-up roundtrip SNR $sUp dB")
  }

  test("multi-submap mapping: two submaps, one channel each, decode via mux routing") {
    // the mapping's submap dispatch (mux → submapFloor/submapResidue)
    // that every single-submap profile bypasses — real multichannel
    // streams are built this way
    val n = Mp3DupFixture.NSamples
    val l = Array.tabulate(n)(t => (Mp3DupFixture.signal(3L, t) * 30000).toInt)
    val r = Array.tabulate(n)(t => (Mp3DupFixture.signal(4L, t) * 30000).toInt)
    val ogg = VorbisEncoder.encodeStereoDualSubmap(l, r, 32000)
    val dec = Vorbis.decode(ogg).getOrElse(sys.error("dual-submap claims nothing"))
    assert(dec.channels == 2 && dec.samples.length == 2 * n)
    def snr(ref: Array[Int], ch: Int): Double = {
      var se = 0.0
      var ss = 0.0
      var i = 1000
      while (i < n - 1000) {
        val a = ref(i) / 32768.0
        val d = dec.samples(i * 2 + ch)
        se += (a - d) * (a - d); ss += a * a
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    // no coupling: each channel quantizes independently — full SNR
    assert(snr(l, 0) > 25.0, s"left ${snr(l, 0)}")
    assert(snr(r, 1) > 25.0, s"right ${snr(r, 1)}")
  }

  test("STEREO residue types 0/1: per-partition channel interleave + doNotDecode skip") {
    val n = Mp3DupFixture.NSamples
    val l = Array.tabulate(n)(t => (Mp3DupFixture.signal(5L, t) * 30000).toInt)
    val r = Array.tabulate(n)(t => (Mp3DupFixture.signal(6L, t) * 30000).toInt)
    def snr(dec: Vorbis.Pcm, ref: Array[Int], ch: Int): Double = {
      var se = 0.0
      var ss = 0.0
      var i = 1000
      while (i < n - 1000) {
        val a = ref(i) / 32768.0
        val d = dec.samples(i * 2 + ch)
        se += (a - d) * (a - d); ss += a * a
        i += 1
      }
      10.0 * math.log10(ss / se)
    }
    for (resType <- Seq(0, 1)) {
      // uncoupled stereo: the decoder reads both channels' classwords
      // and vectors INTERLEAVED per partition — the inner-loop shape
      // no coupled (type 2) or mono stream can reach
      val ogg = VorbisEncoder.encodeStereoResidue(l, r, 32000, resType)
      val dec = Vorbis.decode(ogg).getOrElse(
        sys.error(s"stereo residue $resType claims nothing"))
      assert(dec.channels == 2 && dec.samples.length == 2 * n)
      assert(snr(dec, l, 0) > 25.0, s"type $resType left ${snr(dec, l, 0)}")
      assert(snr(dec, r, 1) > 25.0, s"type $resType right ${snr(dec, r, 1)}")
      // SILENT right channel: its floor writes the 0 bit and its
      // residue share is skipped — the decoder's doNotDecode path
      // must keep the interleave aligned and render exact zeros
      val silent = new Array[Int](n)
      val ogg2 = VorbisEncoder.encodeStereoResidue(l, silent, 32000, resType)
      val dec2 = Vorbis.decode(ogg2).getOrElse(
        sys.error(s"silent-channel residue $resType claims nothing"))
      assert(snr(dec2, l, 0) > 25.0, s"type $resType left-of-silent ${snr(dec2, l, 0)}")
      var i = 0
      while (i < n) {
        assert(dec2.samples(2 * i + 1) == 0f, s"silent channel nonzero at $i")
        i += 1
      }
    }
  }

  test("residue class 0 (silent partitions): identical decode, strictly fewer bytes") {
    // a low tone: high-frequency partitions quantize to exact zero,
    // so the classifier codes them CLASS 0 (no books, decoder leaves
    // zeros); the all-class-1 encode of the same PCM must decode to
    // the IDENTICAL samples in strictly more bytes — proof the
    // silent path both ran and is exactly equivalent
    val n = Mp3DupFixture.NSamples
    val pcm = Array.tabulate(n)(t =>
      (math.sin(2.0 * math.Pi * 300.0 * t / 32000.0) * 18000).toInt)
    val silent = VorbisEncoder.encodeMonoSilentClasses(pcm, 32000)
    val plain = VorbisEncoder.encode(pcm, 32000)
    val a = Vorbis.decode(silent).getOrElse(sys.error("silent claims nothing"))
    val b = Vorbis.decode(plain).getOrElse(sys.error("plain claims nothing"))
    assert(a.samples.length == b.samples.length)
    assert(a.samples.sameElements(b.samples),
      "class-0 partitions decoded differently from coded zeros")
    assert(silent.length < plain.length,
      s"no partition classified silent (${silent.length} vs ${plain.length})")
  }

  test("tolerance: junk, truncation, structural-fixture fakes claim nothing") {
    assert(Vorbis.decode(null).isEmpty)
    assert(Vorbis.decode("OggS but not really".getBytes("US-ASCII")).isEmpty)
    // the structural Ogg walk fixture (BOS id header + EOS, no setup)
    import graft.tools.OggFixture
    for (id <- Seq(0L, 1L, 2L, 3L, 7L))
      assert(Vorbis.decode(OggFixture.row(id)._2).isEmpty, s"ogg fixture id=$id")
    // a real stream cut inside the setup header claims nothing
    val ogg = VorbisEncoder.encode(Mp3DupFixture.basePcm(2L), 32000)
    assert(Vorbis.decode(java.util.Arrays.copyOf(ogg, 120)).isEmpty)
    // cut mid-audio: the complete packets still decode (pages after
    // the cut vanish; granule clamps to what demuxed)
    val cut = Vorbis.decode(java.util.Arrays.copyOf(ogg, ogg.length * 2 / 3))
    assert(cut.nonEmpty && cut.get.samples.length > 0)
    assert(cut.get.samples.length < Mp3DupFixture.NSamples)
  }

  test("multiplexed Ogg: pages of a second logical stream are filtered by serial") {
    val pcm = Mp3DupFixture.basePcm(9L)
    val ogg = graft.tools.VorbisEncoder.encode(pcm, 32000)
    val ref = Vorbis.decode(ogg).get
    // interleave a decoy page (different serial, junk payload) after
    // every real page — a multiplexed A/V Ogg's shape
    def decoy(seq: Int): Array[Byte] = {
      val body = Array.tabulate[Byte](40)(i => ((seq * 31 + i) & 0x7f).toByte)
      val h = new Array[Byte](27 + 1)
      h(0) = 'O'; h(1) = 'g'; h(2) = 'g'; h(3) = 'S'
      h(4) = 0; h(5) = 0
      h(14) = 0x77 // serial != the vorbis stream's
      h(18) = seq.toByte
      h(26) = 1 // one segment
      h(27) = 40 // lacing
      h ++ body
    }
    val pages = Multimodal.AvHeaders.oggPages(ogg)
    val out = new java.io.ByteArrayOutputStream()
    pages.zipWithIndex.foreach { case ((_, off, size, _, _), i) =>
      out.write(ogg, off, size)
      out.write(decoy(i))
    }
    val muxed = Vorbis.decode(out.toByteArray)
    assert(muxed.nonEmpty)
    assert(muxed.get.samples.length == ref.samples.length)
    assert(muxed.get.samples.sameElements(ref.samples),
      "decoy pages leaked into the vorbis packet stream")
  }

  test("fuzz: random corruption of valid streams is total — decodes or claims nothing") {
    // 100 TB of crawl bytes WILL hit every corruption; the decoder
    // must be total (bounded loops, caught structural errors), never
    // throw or hang. Seeded: failures reproduce.
    val base = graft.tools.VorbisEncoder.encode(Mp3DupFixture.basePcm(5L), 32000)
    val switched = graft.tools.VorbisEncoder.encodeSwitched(Mp3DupFixture.basePcm(5L), 32000)
    // round 20: the variant profiles (sequence_p book, silent
    // classes) join the corruption mix — their decoder branches must
    // be as total as the default path's
    val seqP = graft.tools.VorbisEncoder.encodeMonoSeqP(Mp3DupFixture.basePcm(5L), 32000)
    val silent = graft.tools.VorbisEncoder.encodeMonoSilentClasses(
      Array.tabulate(8192)(t => (math.sin(2.0 * math.Pi * 300.0 * t / 32000.0) * 18000).toInt), 32000)
    val half = Array.tabulate(8192)(t => (Mp3DupFixture.signal(5L, t) * 20000).toInt)
    val dual = graft.tools.VorbisEncoder.encodeStereoDualSubmap(half, half.map(-_), 32000)
    val uncoupled = graft.tools.VorbisEncoder.encodeStereoResidue(
      half, new Array[Int](half.length), 32000, 0)
    val sources = Array(base, switched, seqP, silent, dual, uncoupled)
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 120) {
      val src = sources(trial % sources.length)
      val b = src.clone()
      val flips = 1 + rnd.nextInt(8)
      for (_ <- 0 until flips)
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Vorbis.decode(b) // must return, Some or None — any throw fails
    }
    for (trial <- 0 until 40) {
      val src = sources(trial % sources.length)
      val cut = 1 + rnd.nextInt(src.length - 1)
      Vorbis.decode(java.util.Arrays.copyOf(src, cut))
    }
    // the TS walks under the same discipline
    val mp3 = graft.tools.Mp3Encoder.encode(Mp3DupFixture.basePcm(5L), 32000)
    val ts = graft.tools.TsFixture.tsFromAudioEs(mp3)
    for (_ <- 0 until 60) {
      val b = ts.clone()
      for (_ <- 0 until 1 + rnd.nextInt(6))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      AudioFp.monoSamples(b)
      Multimodal.AvHeaders.tsVideoPesSamples(b)
    }
    // round 20: the WebM-Vorbis walk (CodecPrivate lacing, block
    // frame expansion) and the LSF decode under the same discipline
    val webm = Remux.webmVorbisFromOgg(base)
    val lsf = graft.tools.Mp3Encoder.encodeLsfMono(Mp3DupFixture.basePcm(5L), 22050)
    for (_ <- 0 until 60) {
      val b = webm.clone()
      for (_ <- 0 until 1 + rnd.nextInt(6))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Vorbis.decodeWebm(b)
      val m = lsf.clone()
      for (_ <- 0 until 1 + rnd.nextInt(6))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Mp3.decode(m)
    }
    for (trial <- 0 until 30) {
      Vorbis.decodeWebm(java.util.Arrays.copyOf(webm, 1 + rnd.nextInt(webm.length - 1)))
      Mp3.decode(java.util.Arrays.copyOf(lsf, 1 + rnd.nextInt(lsf.length - 1)))
    }
    succeed
  }

  test("a hostile setup header (bad codebook) claims nothing, never throws") {
    val ogg = VorbisEncoder.encode(Mp3DupFixture.basePcm(4L), 32000)
    // find the setup packet's codebook sync on the second page and
    // corrupt a length field region
    val patched = ogg.clone()
    var i = 60
    var found = false
    while (i < patched.length - 3 && !found) {
      if ((patched(i) & 0xff) == 0x42 && (patched(i + 1) & 0xff) == 0x43 &&
        (patched(i + 2) & 0xff) == 0x56) { // 'BCV' LSb-first spelling
        patched(i) = 0x00 // break the sync: the setup must claim nothing
        found = true
      }
      i += 1
    }
    assert(Vorbis.decode(patched).isEmpty || !found)
  }
}
