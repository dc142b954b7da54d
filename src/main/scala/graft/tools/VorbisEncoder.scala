package graft.tools

/**
 * Minimal-but-conformant Ogg Vorbis encoder — the validation
 * direction for [[graft.ops.Vorbis]], the FLAC/MP3 pattern: no
 * reference Vorbis codec exists in this container, so the decoder is
 * pinned by inverting an INDEPENDENT from-spec encoder exactly.
 * Everything a Vorbis decoder needs ships in the stream's own setup
 * header, so this encoder designs its own tiny codebooks:
 *
 *  - blocksizes 512/512; two modes (blockflag 0 and 1, alternating
 *    per block) so mode selection and the long-block window-flag
 *    reads are exercised — with equal blocksizes every window is the
 *    full symmetric slope;
 *  - one floor1: single partition, one class (dims 2, no
 *    subclasses), multiplier 2, posts [0, 128, 32, 64], encoded FLAT
 *    per frame (y0 = y1 = level, interior posts at predicted = 0
 *    deviation) — the frame's spectral shape lives in the residue;
 *  - one residue, type 2 (channels interleaved): partition size 32,
 *    two classifications (0 = silent, 1 = coded via a two-pass
 *    cascade), classbook of 16 uniform 4-bit words, and two lookup
 *    type 1 lattice books (16×16 entries, uniform 8-bit codes):
 *    coarse step 1/8 over [−1, 1), fine step 1/128 over [−1/16,
 *    1/16) — quantization lands at ~36 dB, the lossy-codec noise the
 *    fingerprint's codec gate exists for;
 *  - stereo uses one coupling step (square polar, the encoder is the
 *    exact inverse of the decoder's branch table);
 *  - real Ogg pages with the real Ogg CRC-32 (poly 0x04c11db7,
 *    unreflected) — the committed fixtures are genuinely valid files.
 *
 * Forward MDCT scale 4/N makes the decoder's sum-form IMDCT +
 * Princen-Bradley window a unity roundtrip (pinned in VorbisSpec);
 * the floor level is quantized through the decoder's own computed
 * amplitude table, so the flat-floor division is exact.
 */
object VorbisEncoder {

  private val N = 512
  private val N2 = N / 2
  private val Hop = N2 / 1 // advance per block = N/2

  // ------------------------------------------------------ bit writer
  private final class Bw {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def writeBit(b: Int): Unit = {
      cur |= (b & 1) << nBits
      nBits += 1
      if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
    }
    /** LSb-first field write (the Vorbis packing convention). */
    def bits(v: Long, n: Int): Unit = {
      var k = 0
      while (k < n) { writeBit(((v >> k) & 1L).toInt); k += 1 }
    }
    /** Huffman codeword write: MSB of the codeword first. */
    def code(c: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) { writeBit((c >> k) & 1); k -= 1 }
    }
    def toBytes: Array[Byte] = {
      val out = buf.toArray
      if (nBits > 0) out :+ cur.toByte else out
    }
  }

  // ------------------------------------------------------ structure
  /** float32_pack for exact powers of two: mantissa 1, exponent
   * biased at 788 (value = mantissa·2^(exp−788)). */
  private def packPow2(log2: Int, negative: Boolean): Long =
    (if (negative) 0x80000000L else 0L) | ((788L + log2) << 21) | 1L

  private def writeCodebook(bw: Bw, dims: Int, entries: Int, lenBits: Int,
      lookup: Option[(Int, Int, Long, Long, Int)], // (type, valueBits, min, delta, lookupValues)
      seqP: Boolean = false): Unit = {
    bw.bits(0x564342, 24)
    bw.bits(dims, 16)
    bw.bits(entries, 24)
    bw.bits(0, 1) // unordered
    bw.bits(0, 1) // not sparse
    var i = 0
    while (i < entries) { bw.bits(lenBits - 1, 5); i += 1 }
    lookup match {
      case None => bw.bits(0, 4)
      case Some((lookupType, valueBits, min, delta, lookupValues)) =>
        bw.bits(lookupType, 4)
        bw.bits(min, 32)
        bw.bits(delta, 32)
        bw.bits(valueBits - 1, 4)
        bw.bits(if (seqP) 1 else 0, 1) // sequence_p
        if (lookupType == 1) {
          var j = 0
          while (j < lookupValues) { bw.bits(j, valueBits); j += 1 }
        } else {
          // type 2: explicit per-entry vectors — entry e decodes to
          // (m[2e], m[2e+1]); the SAME lattice values as the type-1
          // form, so quantization is identical and the decoder's
          // type-2 vector context is bitstream-exercised
          var e = 0
          while (e < entries) {
            bw.bits(e % lookupValues, valueBits)
            bw.bits(e / lookupValues, valueBits)
            e += 1
          }
        }
    }
  }

  /** Round-20 encode variants — each exercises a decoder branch the
   * default profile never reaches (the block-switching precedent:
   * exercising a spec-implemented-but-untested branch found a REAL
   * lap-buffer bug in round 19):
   *  - seqP: the coarse residue book is a sequence_p lattice (values
   *    ACCUMULATE across the vector's dims per spec) over a wider
   *    [−2, 1.875] range so the accumulated deltas stay in-lattice;
   *  - floorMode 1: floor posts [127, 127, 2, 0] — the x=32 post
   *    value reaches `room` with highroom < lowroom (fold DOWN);
   *  - floorMode 2: posts [l, l, 2l+4, 0] with a quiet signal
   *    (l ≤ 61) — v ≥ room with highroom > lowroom (fold UP; only
   *    raises the curve, so residues shrink and the roundtrip stays
   *    exact);
   *  - classifySilent: residue partitions whose every value
   *    quantizes to exact zero are coded CLASS 0 (no books, decoder
   *    leaves zeros) instead of class 1 — the silent-partition path.
   */
  final case class EncOpts(
      seqP: Boolean = false,
      floorMode: Int = 0,
      classifySilent: Boolean = false,
      dualSubmap: Boolean = false) // 2 channels → 2 submaps, no coupling

  /** The three header packets for `ch` channels at `rate`, block
   * sizes 2^log0 / 2^log1 (the residue's `end` covers the LONG
   * block's vector — interleaved for type 2, per-channel for types
   * 0/1; short blocks clamp per spec). */
  private def headers(ch: Int, rate: Int, log0: Int, log1: Int,
      resType: Int, opts: EncOpts): (Array[Byte], Array[Byte], Array[Byte]) = {
    val idw = new Bw
    idw.bits(1, 8); "vorbis".foreach(c => idw.bits(c.toLong, 8))
    idw.bits(0, 32) // version
    idw.bits(ch, 8)
    idw.bits(rate.toLong, 32)
    idw.bits(0, 32); idw.bits(0, 32); idw.bits(0, 32) // bitrates
    idw.bits(log0, 4); idw.bits(log1, 4)
    idw.bits(1, 1) // framing
    val cmw = new Bw
    cmw.bits(3, 8); "vorbis".foreach(c => cmw.bits(c.toLong, 8))
    val vendor = "graft-vorbis"
    cmw.bits(vendor.length.toLong, 32)
    vendor.foreach(c => cmw.bits(c.toLong, 8))
    cmw.bits(0, 32) // no user comments
    cmw.bits(1, 1)
    val sw = new Bw
    sw.bits(5, 8); "vorbis".foreach(c => sw.bits(c.toLong, 8))
    // books: 0 = classbook, 1 = floor book, 2 = coarse (lookup type
    // 1 lattice), 3 = fine (lookup type 2, explicit vectors carrying
    // the same lattice — both VQ contexts get bitstream coverage)
    sw.bits(3, 8) // count − 1
    writeCodebook(sw, 4, 16, 4, None)
    writeCodebook(sw, 1, 128, 7, None)
    if (opts.seqP)
      // sequence_p coarse: 32×32 lattice over [−2, 1.875] step 1/8 —
      // the wider range holds the ACCUMULATED second component
      // (out1 = q1 + out0, each in [−1, 1))
      writeCodebook(sw, 2, 1024, 10, Some((1, 5, packPow2(1, negative = true), packPow2(-3, negative = false), 32)), seqP = true)
    else
      writeCodebook(sw, 2, 256, 8, Some((1, 4, packPow2(0, negative = true), packPow2(-3, negative = false), 16)))
    writeCodebook(sw, 2, 256, 8, Some((2, 4, packPow2(-4, negative = true), packPow2(-7, negative = false), 16)))
    sw.bits(0, 6); sw.bits(0, 16) // one time transform, zero
    // one floor, type 1
    sw.bits(0, 6); sw.bits(1, 16)
    sw.bits(1, 5) // partitions
    sw.bits(0, 4) // partition 0 → class 0
    sw.bits(2 - 1, 3) // class 0 dims = 2
    sw.bits(0, 2) // subclasses = 0
    sw.bits(1 + 1, 8) // subclass book → book 1 (floor book; the read subtracts 1)
    sw.bits(2 - 1, 2) // multiplier − 1
    sw.bits(7, 4) // rangebits → X range [0, 128]
    sw.bits(32, 7); sw.bits(64, 7) // the two partition posts
    // one residue of the requested type. With dualSubmap each
    // submap holds ONE channel, so the vector `end` is per-channel.
    val endVec =
      (1 << (log1 - 1)) * (if (resType == 2 && !opts.dualSubmap) ch else 1)
    sw.bits(0, 6); sw.bits(resType, 16)
    sw.bits(0, 24) // begin
    sw.bits(endVec, 24) // end
    sw.bits(32 - 1, 24) // partition size
    sw.bits(2 - 1, 6) // classifications
    sw.bits(0, 8) // classbook = book 0
    // class 0: cascade 0; class 1: cascade 0b11 (passes 0 and 1)
    sw.bits(0, 3); sw.bits(0, 1)
    sw.bits(3, 3); sw.bits(0, 1)
    sw.bits(2, 8) // class 1 pass 0 → book 2 (coarse)
    sw.bits(3, 8) // class 1 pass 1 → book 3 (fine)
    // one mapping, type 0
    sw.bits(0, 6); sw.bits(0, 16)
    if (opts.dualSubmap) {
      // TWO submaps, one channel each, NO coupling — the multi-submap
      // mux dispatch real multichannel streams use (round 20: the
      // decoder path no prior stream touched)
      require(ch == 2, "dualSubmap is a 2-channel profile")
      sw.bits(1, 1) // submaps present
      sw.bits(2 - 1, 4) // submaps − 1
      sw.bits(0, 1) // no coupling
      sw.bits(0, 2) // reserved
      sw.bits(0, 4) // mux(ch0) → submap 0
      sw.bits(1, 4) // mux(ch1) → submap 1
      for (_ <- 0 until 2) {
        sw.bits(0, 8) // time config (discarded)
        sw.bits(0, 8) // submap floor 0
        sw.bits(0, 8) // submap residue 0 (both submaps share it)
      }
    } else {
      sw.bits(0, 1) // one submap
      if (ch == 2 && resType == 2) {
        sw.bits(1, 1) // coupling present
        sw.bits(0, 8) // steps − 1
        sw.bits(0, 1) // magnitude = ch 0 (ilog(ch−1) = 1 bit)
        sw.bits(1, 1) // angle = ch 1
      } else sw.bits(0, 1) // types 0/1 carry UNCOUPLED channels here
      sw.bits(0, 2) // reserved
      sw.bits(0, 8) // time config (discarded)
      sw.bits(0, 8) // submap floor 0
      sw.bits(0, 8) // submap residue 0
    }
    // two modes: blockflag 0 and 1, same mapping
    sw.bits(1, 6)
    sw.bits(0, 1); sw.bits(0, 16); sw.bits(0, 16); sw.bits(0, 8)
    sw.bits(1, 1); sw.bits(0, 16); sw.bits(0, 16); sw.bits(0, 8)
    sw.bits(1, 1) // framing
    (idw.toBytes, cmw.toBytes, sw.toBytes)
  }

  // ----------------------------------------------------------- math
  /** Forward MDCT over a pre-WINDOWED frame, scale 4/N (unity
   * roundtrip with the decoder's sum-form IMDCT under the
   * Princen–Bradley window). */
  private def mdct(frame: Array[Double], n: Int): Array[Double] = {
    val n2 = n / 2
    val out = new Array[Double](n2)
    var k = 0
    while (k < n2) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += frame(j) *
          math.cos(2.0 * math.Pi / n * (j + 0.5 + n / 4.0) * (k + 0.5))
        j += 1
      }
      out(k) = acc * 4.0 / n
      k += 1
    }
    out
  }

  /** Quantize through the decoder's computed amplitude table: the
   * smallest level whose floor value covers `m` with 2× headroom
   * (keeps |residue| ≤ ~0.5 so the coupled angle stays inside the
   * coarse lattice). */
  private def floorLevel(m: Double): Int = {
    val target = math.min(1.0, math.max(1e-7, 2.0 * m))
    val idx = math.ceil((math.log10(target) * 255.0 / 7.0 + 255.0) / 2.0).toInt
    math.max(1, math.min(127, idx))
  }

  private def invDb(levelIdx: Int): Double =
    math.pow(10.0, (2 * levelIdx - 255).toDouble * 7.0 / 255.0)

  private def quantIdx(v: Double, min: Double, step: Double, maxIdx: Int = 15): Int =
    math.max(0, math.min(maxIdx, math.round((v - min) / step).toInt))

  // --------------------------------------------------------- packets
  /** One audio packet over the channel spectra (each length n/2);
   * `endVec` is the residue header's `end` (the long block's vector
   * length — short blocks clamp to their own, per spec). */
  private def audioPacket(specs: Array[Array[Double]], mode: Int,
      prevFlag: Boolean, nextFlag: Boolean, endVec: Int,
      resType: Int, opts: EncOpts = EncOpts()): Array[Byte] = {
    val ch = specs.length
    val n2 = specs(0).length
    val bw = new Bw
    bw.bits(0, 1) // audio packet
    bw.bits(mode, 1) // two modes → 1 bit
    if (mode == 1) {
      bw.bits(if (prevFlag) 1 else 0, 1)
      bw.bits(if (nextFlag) 1 else 0, 1)
    }
    // SHAPED floor per channel: base level from the peak, interior
    // posts RAISED (post at x=32 by up to 6 levels, x=64 by 2 above
    // its neighbor prediction) — every frame exercises the decoder's
    // prediction, room-folding and Bresenham line branches, and a
    // raised curve only shrinks residues, so the lattice headroom
    // (incl. the stereo angle) is preserved. The curve is rendered
    // through the DECODER's own floor1Synth, so division is exact.
    val xList = Array(0, 1 << 7, 32, 64)
    val levels = specs.map { s =>
      var m = 0.0
      var i = 0
      while (i < n2) { m = math.max(m, math.abs(s(i))); i += 1 }
      floorLevel(m)
    }
    val curves = Array.ofDim[Float](ch, n2)
    val rawYs = Array.tabulate(ch) { c =>
      val l = levels(c)
      val raw = opts.floorMode match {
        case 1 =>
          // fold DOWN: base at the ceiling, v=2 ≥ room=2·min(1,127),
          // highroom < lowroom → finalY = 127 − (2−1) − 1 = 125 (a
          // 1.3× dip — residues stay inside the lattice)
          Array(127, 127, 2, 0)
        case 2 =>
          // fold UP: v = 2l+4 ≥ room = 2l, highroom > lowroom →
          // finalY = v − l + l = 2l+4; the curve only RISES, so
          // residues shrink and the roundtrip stays exact. Needs
          // 2l+4 ≤ 127 → a quiet signal.
          require(l <= 61, s"floor overflow-up needs a quiet signal (level $l)")
          Array(l, l, 2 * l + 4, 0)
        case _ =>
          val d2 = math.max(0, math.min(6, math.min(127 - l, l - 1)))
          val p3 = graft.ops.Vorbis.renderPoint(32, l + d2, 128, l, 64)
          val d3 = math.max(0, math.min(2, math.min(127 - p3, p3 - 1)))
          Array(l, l, 2 * d2, 2 * d3)
      }
      graft.ops.Vorbis.floor1Synth(xList, raw, 2, n2, curves(c))
      raw
    }
    // a channel whose spectrum is exactly zero is UNAUDIBLE: its
    // floor writes the 0 bit and its residue is skipped entirely —
    // the decoder's doNotDecode path (round 20)
    val audible = specs.map(_.exists(_ != 0.0))
    var c = 0
    while (c < ch) {
      if (audible(c)) {
        bw.bits(1, 1) // nonzero
        bw.bits(rawYs(c)(0).toLong, 7) // y0 (raw, ilog(127) bits)
        bw.bits(rawYs(c)(1).toLong, 7) // y1
        bw.code(rawYs(c)(2), 7); bw.code(rawYs(c)(3), 7) // posts via the floor book
      } else bw.bits(0, 1)
      c += 1
    }
    // residues r = spec / floorCurve, then square-polar coupling
    val r = Array.tabulate(ch, n2)((c0, i) => specs(c0)(i) / curves(c0)(i))
    if (opts.dualSubmap) {
      // two submaps, one channel each: the residue vector of ch0 is
      // emitted for submap 0, then ch1's for submap 1 — the decoder
      // dispatches by the mapping's mux (an unaudible channel's
      // submap emits nothing at all)
      var c = 0
      while (c < ch) {
        if (audible(c)) emitResidue(bw, r(c), math.min(endVec, n2), resType, opts)
        c += 1
      }
      return bw.toBytes
    }
    if (resType != 2) {
      // types 0/1: the channels of one submap decode INTERLEAVED per
      // partition with per-channel classwords; unaudible channels
      // are skipped (doNotDecode)
      emitResidueMulti(bw, r, audible.map(!_), math.min(endVec, n2),
        resType, opts)
      return bw.toBytes
    }
    if (!audible.exists(identity)) return bw.toBytes // all silent: no residue
    val inter = new Array[Double](n2 * ch)
    if (ch == 2) {
      var i = 0
      while (i < n2) {
        val l = r(0)(i); val rt = r(1)(i)
        val (m, a) =
          if (l > 0) { if (l > rt) (l, l - rt) else (rt, l - rt) }
          else { if (rt > l) (l, rt - l) else (rt, rt - l) }
        inter(2 * i) = m
        inter(2 * i + 1) = a
        i += 1
      }
    } else {
      var i = 0
      while (i < n2) { inter(i) = r(0)(i); i += 1 }
    }
    emitResidue(bw, inter, math.min(endVec, n2 * ch), resType, opts)
    bw.toBytes
  }

  /** Residue emission over one decoded vector: partitions of 32,
   * classwords of 4, two cascade passes; the decoded range is
   * [begin, min(end, vector length)) per spec. Types 1 and 2 lay
   * each partition out contiguously (type 2 over the interleaved
   * vector); type 0 strides — vector s carries elements
   * (off+s, off+s+step) with step = psize/dims = 16. */
  private def emitResidue(bw: Bw, inter: Array[Double], nVec: Int,
      resType: Int, opts: EncOpts): Unit =
    emitResidueMulti(bw, Array(inter), Array(false), nVec, resType, opts)

  /** The multi-channel form of [[emitResidue]] — residue types 0/1
   * decode the channels of ONE submap interleaved per partition
   * (classwords for every coded channel at each group boundary,
   * then each partition's vectors channel by channel), and channels
   * whose floor was unaudible (`dnd`) are skipped entirely — the
   * decoder's doNotDecode path (round 20: first bitstream
   * exercise of both). */
  private def emitResidueMulti(bw: Bw, vecs: Array[Array[Double]],
      dnd: Array[Boolean], nVec: Int, resType: Int, opts: EncOpts): Unit = {
    val nCh = vecs.length
    val partitions = nVec / 32
    val coarse = Array.ofDim[Double](nCh, nVec)
    // coarse lattice geometry (seqP uses the wider 32-value lattice)
    val cMin = if (opts.seqP) -2.0 else -1.0
    val cMax = if (opts.seqP) 31 else 15
    val cVals = cMax + 1
    val cBits = if (opts.seqP) 10 else 8
    val zeroIdx = math.round(-cMin / 0.125).toInt // lattice index of 0.0
    // per-partition class: 0 (silent — no books, decoder leaves
    // zeros) when EVERY value quantizes to exact zero through both
    // passes, so classified and unclassified streams decode
    // identically and class 0 only saves bits
    def quantsToZero(v: Double): Boolean =
      quantIdx(v, cMin, 0.125, cMax) == zeroIdx &&
        quantIdx(v, -0.0625, 1.0 / 128) == 8
    val cls = Array.tabulate(nCh, partitions) { (ch, pc) =>
      if (!opts.classifySilent) 1
      else {
        var allZero = true
        var k = 0
        while (k < 32 && allZero) {
          allZero = quantsToZero(vecs(ch)(pc * 32 + k))
          k += 1
        }
        if (allZero) 0 else 1
      }
    }
    for (pass <- 0 until 2) {
      var pc = 0
      while (pc < partitions) {
        if (pass == 0) {
          // classwords for every coded channel at the group
          // boundary, channel order; high partition first within
          // each word (the decoder peels temp % 2 from the end)
          var ch = 0
          while (ch < nCh) {
            if (!dnd(ch)) {
              var e = 0
              var i = 0
              while (i < 4) {
                e = e * 2 + (if (pc + i < partitions) cls(ch)(pc + i) else 0)
                i += 1
              }
              bw.code(e, 4)
            }
            ch += 1
          }
        }
        var w = 0
        while (w < 4 && pc < partitions) {
          var ch = 0
          while (ch < nCh) {
            if (!dnd(ch) && cls(ch)(pc) == 1) {
              val inter = vecs(ch)
              val crs = coarse(ch)
              var j = 0
              while (j < 16) { // 16 dim-2 vectors per partition
                val e0 = if (resType == 0) pc * 32 + j else pc * 32 + 2 * j
                val e1 = if (resType == 0) pc * 32 + j + 16 else pc * 32 + 2 * j + 1
                if (pass == 0) {
                  if (opts.seqP) {
                    // sequence_p: the decoder ACCUMULATES out1 = q1 +
                    // out0, so the second index codes the DELTA
                    val i0 = quantIdx(inter(e0), cMin, 0.125, cMax)
                    val c0 = cMin + i0 * 0.125
                    val i1 = quantIdx(inter(e1) - c0, cMin, 0.125, cMax)
                    crs(e0) = c0
                    crs(e1) = c0 + (cMin + i1 * 0.125)
                    bw.code(i1 * cVals + i0, cBits)
                  } else {
                    val i0 = quantIdx(inter(e0), -1.0, 0.125)
                    val i1 = quantIdx(inter(e1), -1.0, 0.125)
                    crs(e0) = -1.0 + i0 * 0.125
                    crs(e1) = -1.0 + i1 * 0.125
                    bw.code(i1 * 16 + i0, 8)
                  }
                } else {
                  val i0 = quantIdx(inter(e0) - crs(e0), -0.0625, 1.0 / 128)
                  val i1 = quantIdx(inter(e1) - crs(e1), -0.0625, 1.0 / 128)
                  bw.code(i1 * 16 + i0, 8)
                }
                j += 1
              }
            }
            ch += 1
          }
          pc += 1
          w += 1
        }
      }
    }
  }

  // ------------------------------------------------------------- ogg
  /** Ogg CRC-32: polynomial 0x04c11db7, unreflected, init/xorout 0. */
  private lazy val crcTable: Array[Int] = Array.tabulate(256) { i =>
    var r = i << 24
    var k = 0
    while (k < 8) {
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
      k += 1
    }
    r
  }
  private def oggCrc(b: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < b.length) {
      crc = (crc << 8) ^ crcTable(((crc >>> 24) ^ (b(i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  /** One page from whole packets (each packet laced 255,255,…,tail). */
  private def page(packets: Seq[Array[Byte]], headerType: Int, granule: Long,
      serial: Int, seq: Int): Array[Byte] = {
    val lacing = scala.collection.mutable.ArrayBuffer.empty[Int]
    packets.foreach { p =>
      var rem = p.length
      while (rem >= 255) { lacing += 255; rem -= 255 }
      lacing += rem // the terminating lace (0 for an empty tail)
    }
    require(lacing.size <= 255, "vorbis encoder: too many segments for one page")
    val out = new java.io.ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII"), 0, 4)
    out.write(0); out.write(headerType)
    var g = granule
    var i = 0
    while (i < 8) { out.write((g & 0xff).toInt); g >>= 8; i += 1 }
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    le32(serial); le32(seq); le32(0) // CRC placeholder
    out.write(lacing.size)
    lacing.foreach(out.write)
    packets.foreach(p => out.write(p, 0, p.length))
    val bytes = out.toByteArray
    val crc = oggCrc(bytes)
    bytes(22) = (crc & 0xff).toByte
    bytes(23) = ((crc >> 8) & 0xff).toByte
    bytes(24) = ((crc >> 16) & 0xff).toByte
    bytes(25) = ((crc >> 24) & 0xff).toByte
    bytes
  }

  // ------------------------------------------------------------ main
  /** Generic schedule-driven encode: `sizes` is the per-block size
   * list (each 2^log0 or 2^log1); blocks are placed so consecutive
   * slope centers align (start advance 3·prevN/4 − curN/4, the
   * decoder's lap geometry), windowed with the DECODER's own
   * flag-dependent window, and the EOS granule is the exact input
   * length — decode returns exactly that many samples. */
  private def encodeScheduled(chans: Seq[Array[Int]], rate: Int,
      log0: Int, log1: Int, sizes: IndexedSeq[Int],
      resType: Int = 2, opts: EncOpts = EncOpts()): Array[Byte] = {
    val ch = chans.size
    require(ch == 1 || ch == 2, "mono or stereo")
    // residue-0/1 streams carry UNCOUPLED channels through the
    // per-channel interleaved inner loop; square-polar coupling is
    // the type-2 profile's (the headers declare it only there)
    val t = chans.head.length
    val bs0 = 1 << log0
    val endVec = (1 << (log1 - 1)) *
      (if (resType == 2 && !opts.dualSubmap) ch else 1)
    val (idp, cmp, sup) = headers(ch, rate, log0, log1, resType, opts)
    val serial = 0x67726166 // 'graf'
    val pages = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    pages += page(Seq(idp), 2, 0L, serial, 0)
    pages += page(Seq(cmp, sup), 0, 0L, serial, 1)
    var seq = 2
    val pending = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var emitted = 0L
    def flush(eos: Boolean): Unit = {
      if (pending.nonEmpty || eos) {
        val granule = if (eos) t.toLong else math.min(emitted, t.toLong)
        pages += page(pending.toSeq, if (eos) 4 else 0, granule, serial, seq)
        seq += 1
        pending.clear()
      }
    }
    // block 0 is centered at sample 0, so the decoder's first
    // emitted sample (the center of block 0) is x[0]
    var pos = -sizes(0) / 2
    var b = 0
    while (b < sizes.length) {
      val n = sizes(b)
      if (b > 0) {
        pos += 3 * sizes(b - 1) / 4 - n / 4
        emitted += (sizes(b - 1) + n) / 4
      }
      val long = n == (1 << log1) && log1 != log0
      val mode = if (log0 == log1) b % 2 else if (long) 1 else 0
      val prevFlag = b == 0 || sizes(b - 1) == (1 << log1)
      val nextFlag = b == sizes.length - 1 || sizes(b + 1) == (1 << log1)
      val w =
        if (mode == 1) graft.ops.Vorbis.window(n, bs0, bs0, prevFlag, nextFlag)
        else graft.ops.Vorbis.window(n, bs0, bs0, prevFlag = true, nextFlag = true)
      val frame = new Array[Double](n)
      val specs = new Array[Array[Double]](ch)
      var c = 0
      while (c < ch) {
        val x = chans(c)
        var j = 0
        while (j < n) {
          val idx = pos + j
          frame(j) = (if (idx >= 0 && idx < t) x(idx) / 32768.0 else 0.0) * w(j)
          j += 1
        }
        specs(c) = mdct(frame, n)
        c += 1
      }
      pending += audioPacket(specs, mode, prevFlag, nextFlag, endVec, resType, opts)
      if (pending.size >= 40) flush(eos = false)
      b += 1
    }
    flush(eos = true)
    pages.flatten.toArray
  }

  /** Encode 16-bit-range PCM (one array per channel) at `rate` with
   * uniform 512-sample blocks, modes alternating per block. */
  def encodeChannels(chans: Seq[Array[Int]], rate: Int): Array[Byte] = {
    val t = chans.head.length
    val blocks = (t + N2 - 1) / N2 + 1
    encodeScheduled(chans, rate, 9, 9, IndexedSeq.fill(blocks)(N))
  }

  def encode(pcm: Array[Int], rate: Int): Array[Byte] =
    encodeChannels(Seq(pcm), rate)

  /** Mono encode through residue type 0 or 1 (uniform 512 blocks) —
   * exercises the decoder's per-channel residue layouts (type 0's
   * strided partitions in particular), which real coupled streams
   * rarely use but the spec requires. */
  def encodeMonoResidue(pcm: Array[Int], rate: Int, resType: Int): Array[Byte] = {
    require(resType == 0 || resType == 1)
    val blocks = (pcm.length + N2 - 1) / N2 + 1
    encodeScheduled(Seq(pcm), rate, 9, 9, IndexedSeq.fill(blocks)(N), resType)
  }

  /** STEREO encode through residue type 0 or 1 (one submap, NO
   * coupling): the decoder reads the two channels' classwords and
   * vectors INTERLEAVED per partition — the multi-channel inner
   * residue loop no coupled (type 2) or mono stream can reach. */
  def encodeStereoResidue(l: Array[Int], r: Array[Int], rate: Int,
      resType: Int): Array[Byte] = {
    require(resType == 0 || resType == 1)
    val blocks = (l.length + N2 - 1) / N2 + 1
    encodeScheduled(Seq(l, r), rate, 9, 9, IndexedSeq.fill(blocks)(N), resType)
  }

  def encodeStereo(l: Array[Int], r: Array[Int], rate: Int): Array[Byte] =
    encodeChannels(Seq(l, r), rate)

  /** Stereo encode through TWO submaps (one channel each, no
   * coupling) — the multi-submap mapping dispatch real multichannel
   * streams use; exercises the decoder's mux/submapFloor/
   * submapResidue routing that the single-submap profiles never
   * touch. */
  def encodeStereoDualSubmap(l: Array[Int], r: Array[Int], rate: Int): Array[Byte] =
    encodeScheduled(Seq(l, r), rate, 9, 9, uniformBlocks(l.length),
      opts = EncOpts(dualSubmap = true))

  private def uniformBlocks(len: Int): IndexedSeq[Int] =
    IndexedSeq.fill((len + N2 - 1) / N2 + 1)(N)

  /** Mono encode whose coarse residue book is a SEQUENCE_P lattice —
   * exercises the decoder's value-accumulation branch
   * (out_k = q_k + out_{k−1}) through the bitstream. */
  def encodeMonoSeqP(pcm: Array[Int], rate: Int): Array[Byte] =
    encodeScheduled(Seq(pcm), rate, 9, 9, uniformBlocks(pcm.length),
      opts = EncOpts(seqP = true))

  /** Mono encode whose floor posts genuinely OVERFLOW `room` —
   * `high` folds DOWN from a ceiling base (highroom < lowroom),
   * else folds UP from a quiet base (highroom > lowroom; the signal
   * must be quiet enough that its level is ≤ 61). */
  def encodeMonoFloorOverflow(pcm: Array[Int], rate: Int,
      high: Boolean): Array[Byte] =
    encodeScheduled(Seq(pcm), rate, 9, 9, uniformBlocks(pcm.length),
      opts = EncOpts(floorMode = if (high) 1 else 2))

  /** Mono encode that codes all-zero-quantizing partitions as
   * residue CLASS 0 (silent — no books): decodes identically to the
   * all-class-1 stream of the same PCM, in strictly fewer bytes. */
  def encodeMonoSilentClasses(pcm: Array[Int], rate: Int): Array[Byte] =
    encodeScheduled(Seq(pcm), rate, 9, 9, uniformBlocks(pcm.length),
      opts = EncOpts(classifySilent = true))

  /** Block-SWITCHED encode (256/2048, the shape every real-web
   * Vorbis stream has): a deterministic schedule mixing short runs
   * and long runs so all four window-flag combinations appear —
   * exercises the decoder's asymmetric lapped windows end to end
   * through the bitstream, not just in the TDAC math test. Stereo
   * goes through the same square-polar coupling as the uniform
   * path. */
  def encodeSwitched(pcm: Array[Int], rate: Int): Array[Byte] =
    encodeSwitchedChannels(Seq(pcm), rate)

  def encodeSwitchedChannels(chans: Seq[Array[Int]], rate: Int): Array[Byte] = {
    val t = chans.head.length
    val bs0 = 256
    val bs1 = 2048
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    var covered = 0L
    var i = 0
    while (covered < t + bs1 || sizes.size < 3) {
      // pattern: long long short short long short short long …
      val n = if (Seq(0, 1, 4, 7).contains(i % 8)) bs1 else bs0
      if (sizes.nonEmpty) covered += (sizes.last + n) / 4
      sizes += n
      i += 1
    }
    encodeScheduled(chans, rate, 8, 11, sizes.toIndexedSeq)
  }
}
