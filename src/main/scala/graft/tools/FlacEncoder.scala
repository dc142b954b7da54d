package graft.tools

/**
 * FLAC encoder (RFC 9639) for fixture/ground-truth use — an
 * independent spec implementation of the ENCODE direction that
 * [[graft.ops.Flac]] must invert exactly. Deliberately
 * deterministic, never adaptive: the caller chooses the subframe
 * type, stereo decorrelation and rice partitioning per frame, so a
 * fixture can exercise every decode path on purpose instead of
 * hoping an optimizing encoder happens to pick it.
 *
 * STREAMINFO carries the MD5 of the SOURCE PCM (little-endian
 * interleaved, per spec) — the end-to-end check: the decoder's
 * reconstruction hashes identically only if every step is exact.
 *
 * Supported: 16-bit PCM, 1-2 channels, CONSTANT / VERBATIM / FIXED
 * 0-4 / LPC subframes, independent / left-side / right-side /
 * mid-side channel assignment, rice methods 0 and 1, partition
 * orders 0-2, escape partitions.
 */
object FlacEncoder {

  sealed trait SubframeKind
  case object Constant extends SubframeKind
  case object Verbatim extends SubframeKind
  final case class Fixed(order: Int) extends SubframeKind
  /** A fixed set of LPC coefficients (quantized, with shift). */
  final case class Lpc(coefs: Array[Int], precision: Int, shift: Int)
    extends SubframeKind

  /** Per-frame encode plan. `assign`: 0..channels-1 = independent,
   * 8 = left/side, 9 = right/side, 10 = mid/side. */
  final case class FramePlan(kind: SubframeKind, assign: Int,
      riceMethod: Int, partitionOrder: Int, escape: Boolean = false)

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nb += 1
        if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    def alignZero(): Unit = if (nb != 0) bits(0, 8 - nb)
    def toBytes: Array[Byte] = { alignZero(); out.toByteArray }
  }

  private def utf8Coded(v: Long, bw: BitWriter): Unit = {
    if (v < 0x80) bw.bits(v, 8)
    else if (v < 0x800) {
      bw.bits(0xc0 | (v >>> 6), 8); bw.bits(0x80 | (v & 0x3f), 8)
    } else {
      // fixture frame numbers stay tiny; two forms suffice
      bw.bits(0xe0 | (v >>> 12), 8)
      bw.bits(0x80 | ((v >>> 6) & 0x3f), 8)
      bw.bits(0x80 | (v & 0x3f), 8)
    }
  }

  private def zigzag(v: Int): Long = {
    val l = v.toLong
    (l << 1) ^ (l >> 63)
  }

  private def writeResidual(bw: BitWriter, res: Array[Int], order: Int,
      blockSize: Int, method: Int, planPo: Int, escape: Boolean): Unit = {
    val pBits = if (method == 0) 4 else 5
    val escCode = (1 << pBits) - 1
    bw.bits(method, 2)
    // clamp the plan's partition order to what this frame admits —
    // the tail frame's block size need not divide into 2^po parts
    var po = planPo
    while (po > 0 && (blockSize % (1 << po) != 0 ||
      blockSize / (1 << po) <= order)) po -= 1
    bw.bits(po, 4)
    val parts = 1 << po
    val partLen = blockSize / parts
    var idx = 0
    var p = 0
    while (p < parts) {
      val n = if (p == 0) partLen - order else partLen
      val slice = res.slice(idx, idx + n)
      if (escape) {
        // raw two's-complement n-bit samples (NOT zigzagged):
        // width = smallest signed width holding every value
        def sBits(v: Int): Int =
          33 - Integer.numberOfLeadingZeros(if (v < 0) ~v else v)
        val width = slice.foldLeft(1)((m, v) => math.max(m, sBits(v)))
        bw.bits(escCode, pBits)
        bw.bits(width, 5)
        slice.foreach(v => bw.bits(v.toLong & ((1L << width) - 1), width))
      } else {
        // rice parameter: smallest k with mean quotient reasonable —
        // deterministic: bits of the mean magnitude
        val mean = if (slice.isEmpty) 0L
        else slice.map(v => zigzag(v)).sum / math.max(1, slice.length)
        var k = 0
        while ((1L << k) < mean + 1 && k < escCode - 1) k += 1
        bw.bits(k, pBits)
        slice.foreach { v =>
          val u = zigzag(v)
          val q = (u >>> k).toInt
          var i = 0
          while (i < q) { bw.bits(0, 1); i += 1 }
          bw.bits(1, 1)
          if (k > 0) bw.bits(u & ((1L << k) - 1), k)
        }
      }
      idx += n
      p += 1
    }
  }

  private def writeSubframe(bw: BitWriter, samples: Array[Int], bps: Int,
      plan: FramePlan): Unit = {
    val n = samples.length
    plan.kind match {
      case Constant =>
        bw.bits(0, 1); bw.bits(0, 6); bw.bits(0, 1)
        bw.bits(samples(0).toLong & ((1L << bps) - 1), bps)
      case Verbatim =>
        bw.bits(0, 1); bw.bits(1, 6); bw.bits(0, 1)
        samples.foreach(v => bw.bits(v.toLong & ((1L << bps) - 1), bps))
      case Fixed(order) =>
        bw.bits(0, 1); bw.bits(8 + order, 6); bw.bits(0, 1)
        var i = 0
        while (i < order) {
          bw.bits(samples(i).toLong & ((1L << bps) - 1), bps); i += 1
        }
        val res = new Array[Int](n - order)
        var t = order
        while (t < n) {
          val p = order match {
            case 0 => 0L
            case 1 => samples(t - 1).toLong
            case 2 => 2L * samples(t - 1) - samples(t - 2)
            case 3 => 3L * samples(t - 1) - 3L * samples(t - 2) + samples(t - 3)
            case _ => 4L * samples(t - 1) - 6L * samples(t - 2) +
              4L * samples(t - 3) - samples(t - 4)
          }
          res(t - order) = (samples(t) - p).toInt
          t += 1
        }
        writeResidual(bw, res, order, n, plan.riceMethod,
          plan.partitionOrder, plan.escape)
      case Lpc(coefs, precision, shift) =>
        val order = coefs.length
        bw.bits(0, 1); bw.bits(32 + (order - 1), 6); bw.bits(0, 1)
        var i = 0
        while (i < order) {
          bw.bits(samples(i).toLong & ((1L << bps) - 1), bps); i += 1
        }
        bw.bits(precision - 1, 4)
        bw.bits(shift.toLong & 0x1f, 5)
        coefs.foreach(c => bw.bits(c.toLong & ((1L << precision) - 1), precision))
        val res = new Array[Int](n - order)
        var t = order
        while (t < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * samples(t - 1 - j); j += 1 }
          res(t - order) = (samples(t) - (acc >> shift)).toInt
          t += 1
        }
        writeResidual(bw, res, order, n, plan.riceMethod,
          plan.partitionOrder, plan.escape)
    }
  }

  /** Encode 16-bit interleaved PCM. `plans` supplies one FramePlan
   * per frame (cycled); `blockSize` fixed except the final partial
   * frame (8/16-bit end-of-header form). */
  def encode(pcm: Array[Int], channels: Int, sampleRate: Int,
      blockSize: Int, plans: Seq[FramePlan]): Array[Byte] = {
    val bits = 16
    val nSamples = pcm.length / channels
    // STREAMINFO md5 of little-endian interleaved source pcm
    val md = java.security.MessageDigest.getInstance("MD5")
    val raw = new Array[Byte](pcm.length * 2)
    var i = 0
    while (i < pcm.length) {
      raw(2 * i) = (pcm(i) & 0xff).toByte
      raw(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
      i += 1
    }
    val md5 = md.digest(raw)

    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (last block)
    val si = new BitWriter
    si.bits(blockSize.toLong, 16); si.bits(blockSize.toLong, 16) // min/max block
    si.bits(0, 24); si.bits(0, 24) // min/max frame size unknown
    si.bits(sampleRate.toLong, 20)
    si.bits((channels - 1).toLong, 3)
    si.bits((bits - 1).toLong, 5)
    si.bits(nSamples.toLong, 36)
    val siBytes = si.toBytes ++ md5
    out.write(Array[Byte](0x80.toByte, 0, 0, siBytes.length.toByte))
    out.write(siBytes)

    var frameNo = 0L
    var t0 = 0
    while (t0 < nSamples) {
      val bs = math.min(blockSize, nSamples - t0)
      val plan = plans((frameNo % plans.size).toInt)
      val bw = new BitWriter
      bw.bits(0x3ffe, 14) // sync
      bw.bits(0, 1)       // reserved
      bw.bits(0, 1)       // fixed blocking
      val bsCode = bs match {
        case 192 => 1
        case 576 => 2
        case 1152 => 3
        case 256 => 8
        case 512 => 9
        case 1024 => 10
        case 2048 => 11
        case 4096 => 12
        case v if v <= 256 => 6
        case _ => 7
      }
      bw.bits(bsCode.toLong, 4)
      bw.bits(0, 4) // sample rate from STREAMINFO
      val assign = if (channels == 1) 0 else plan.assign
      bw.bits(assign.toLong, 4)
      bw.bits(4, 3) // 16-bit
      bw.bits(0, 1) // reserved
      utf8Coded(frameNo, bw)
      if (bsCode == 6) bw.bits((bs - 1).toLong, 8)
      if (bsCode == 7) bw.bits((bs - 1).toLong, 16)
      val hdr = bw.toBytes // aligned by construction
      val bw2 = new BitWriter
      hdr.foreach(b => bw2.bits(b.toLong & 0xff, 8))
      bw2.bits(graft.ops.Flac.crc8(hdr, 0, hdr.length).toLong, 8)
      // channel subframes
      val chans: Array[Array[Int]] =
        if (channels == 1)
          Array(Array.tabulate(bs)(t => pcm(t0 + t)))
        else {
          val l = Array.tabulate(bs)(t => pcm(2 * (t0 + t)))
          val r = Array.tabulate(bs)(t => pcm(2 * (t0 + t) + 1))
          assign match {
            case 8 => Array(l, Array.tabulate(bs)(t => l(t) - r(t)))
            case 9 => Array(Array.tabulate(bs)(t => l(t) - r(t)), r)
            case 10 => Array(
              Array.tabulate(bs)(t => (l(t) + r(t)) >> 1),
              Array.tabulate(bs)(t => l(t) - r(t)))
            case _ => Array(l, r)
          }
        }
      var c = 0
      while (c < chans.length) {
        val extra = assign match {
          case 8 => if (c == 1) 1 else 0
          case 9 => if (c == 0) 1 else 0
          case 10 => if (c == 1) 1 else 0
          case _ => 0
        }
        writeSubframe(bw2, chans(c), bits + extra, plan)
        c += 1
      }
      bw2.alignZero()
      val body = bw2.toBytes
      out.write(body)
      val crc = graft.ops.Flac.crc16(body, 0, body.length)
      out.write((crc >> 8) & 0xff); out.write(crc & 0xff)
      frameNo += 1
      t0 += bs
    }
    out.toByteArray
  }
}
