package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.FlacEncoder
import graft.tools.FlacEncoder._

/**
 * FLAC decoder ([[Flac]]) against the independent encode-direction
 * implementation ([[FlacEncoder]]): every subframe type, both rice
 * methods, partitioning, escapes, all four channel assignments —
 * each round-trip must reproduce the source PCM EXACTLY and pass the
 * end-to-end STREAMINFO-MD5 check (the encoder hashes the source,
 * the decoder hashes its reconstruction).
 */
class FlacSpec extends AnyFunSuite {

  private def pcmMono(n: Int, f: Int => Int): Array[Int] = Array.tabulate(n)(f)

  private def pcmStereo(n: Int, l: Int => Int, r: Int => Int): Array[Int] = {
    val out = new Array[Int](2 * n)
    var t = 0
    while (t < n) { out(2 * t) = l(t); out(2 * t + 1) = r(t); t += 1 }
    out
  }

  private def roundTrip(pcm: Array[Int], channels: Int, blockSize: Int,
      plans: Seq[FramePlan], tag: String): Flac.Pcm = {
    val bytes = FlacEncoder.encode(pcm, channels, 16000, blockSize, plans)
    val got = Flac.decode(bytes)
    assert(got.isDefined, s"$tag: did not decode")
    val p = got.get
    assert(p.channels == channels && p.sampleRate == 16000, s"$tag identity")
    assert(p.samples.toSeq == pcm.toSeq, s"$tag samples differ")
    assert(p.md5Ok, s"$tag md5 mismatch")
    p
  }

  test("constant / verbatim / fixed orders round-trip (mono)") {
    val n = 700 // 2 full 256-blocks + a 188-sample tail (8-bit form)
    roundTrip(pcmMono(n, _ => -1234), 1, 256,
      Seq(FramePlan(Constant, 0, 0, 0)), "constant")
    roundTrip(pcmMono(n, t => ((t * 7919 + 13) % 65536) - 32768), 1, 256,
      Seq(FramePlan(Verbatim, 0, 0, 0)), "verbatim")
    for (order <- 0 to 4)
      roundTrip(pcmMono(n, t => (t * t % 1000) - 500 + (t % 17)), 1, 256,
        Seq(FramePlan(Fixed(order), 0, 0, 0)), s"fixed$order")
  }

  test("rice methods, partition orders and escape partitions") {
    val n = 1024
    val sig = pcmMono(n, t => ((t * 31 + (t * t % 509) * 3) % 4096) - 2048)
    roundTrip(sig, 1, 512, Seq(FramePlan(Fixed(2), 0, 0, 0)), "rice4-po0")
    roundTrip(sig, 1, 512, Seq(FramePlan(Fixed(2), 0, 1, 2)), "rice5-po2")
    roundTrip(sig, 1, 512, Seq(FramePlan(Fixed(1), 0, 0, 1, escape = true)),
      "escape")
    // an all-zero escape partition (width degenerates to 1 bit of 0s)
    roundTrip(pcmMono(n, _ => 0), 1, 512,
      Seq(FramePlan(Fixed(0), 0, 0, 0, escape = true)), "escape-zero")
  }

  test("LPC subframe round-trips with a 64-bit accumulator") {
    val n = 768
    val sig = pcmMono(n, t =>
      (8000 * math.sin(t / 9.0) + 600 * math.sin(t / 2.3)).toInt)
    val lpc = Lpc(Array(3 << 8, -(3 << 7), 1 << 6), precision = 12, shift = 8)
    roundTrip(sig, 1, 256, Seq(FramePlan(lpc, 0, 0, 1)), "lpc3")
  }

  test("stereo decorrelation: independent, left/side, right/side, mid/side") {
    val n = 512
    val l: Int => Int = t => (6000 * math.sin(t / 7.0)).toInt + (t % 23)
    val r: Int => Int = t => (5500 * math.sin(t / 7.0 + 0.2)).toInt - (t % 19)
    val pcm = pcmStereo(n, l, r)
    for ((assign, tag) <- Seq(1 -> "indep", 8 -> "leftside",
        9 -> "rightside", 10 -> "midside"))
      roundTrip(pcm, 2, 256, Seq(FramePlan(Fixed(2), assign, 0, 0)), tag)
    // plans cycling through all assignments across frames
    roundTrip(pcm, 2, 128, Seq(
      FramePlan(Fixed(2), 1, 0, 0), FramePlan(Fixed(1), 8, 1, 1),
      FramePlan(Verbatim, 9, 0, 0), FramePlan(Fixed(3), 10, 0, 2)), "cycle")
  }

  test("tolerance: corrupt CRCs and junk claim nothing; truncation keeps whole frames") {
    val pcm = pcmMono(600, t => (t % 251) - 125)
    val bytes = FlacEncoder.encode(pcm, 1, 16000, 256,
      Seq(FramePlan(Fixed(2), 0, 0, 0)))
    assert(Flac.decode("not flac at all".getBytes("US-ASCII")).isEmpty)
    assert(Flac.decode(null).isEmpty)
    // flip a bit inside the SECOND frame's payload: frame 1 decodes,
    // the corrupt frame fails its CRC and the walk stops there
    val full = Flac.decode(bytes).get
    assert(full.totalSamples == 600)
    val si = Flac.streamInfo(bytes).get
    // find the second frame: scan for the sync from past the first header
    val secondSync = {
      var q = si.audioOffset + 4
      while (!((bytes(q) & 0xff) == 0xff && (bytes(q + 1) & 0xfc) == 0xf8)) q += 1
      q
    }
    val corrupt = bytes.clone()
    corrupt(secondSync + 9) = (corrupt(secondSync + 9) ^ 0x10).toByte
    val partial = Flac.decode(corrupt)
    assert(partial.isDefined && partial.get.totalSamples == 256)
    assert(!partial.get.md5Ok) // incomplete stream can never claim the md5
    assert(partial.get.samples.toSeq == pcm.take(256).toSeq)
    // truncation mid-frame: same contract
    val cut = java.util.Arrays.copyOf(bytes, bytes.length - 3)
    val t = Flac.decode(cut)
    assert(t.isDefined && t.get.totalSamples == 512 && !t.get.md5Ok)
  }

  test("envelope: normalized mono mean over channels") {
    val pcm = pcmStereo(300, _ => 16384, _ => -16384)
    val bytes = FlacEncoder.encode(pcm, 2, 16000, 256,
      Seq(FramePlan(Verbatim, 1, 0, 0)))
    val env = Flac.envelope(bytes).get
    assert(env.length == 300 && env.forall(v => math.abs(v) < 1e-6))
  }
}
