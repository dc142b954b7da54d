package graft.tools

/**
 * Minimal conforming VP8 keyframe ENCODER for fixture twins — the
 * lossy counterpart of [[Vp8lEncoder]]: it emits real RFC 6386
 * bitstreams (boolean arithmetic coder with carry propagation,
 * keyframe header, B_PRED mode records, DC-coefficient tokens with
 * the default probability model) that any conforming decoder —
 * libwebp included — reconstructs EXACTLY.
 *
 * The exactness trick: at quantizer index 4 the luma DC dequant
 * factor is 8, and the inverse DCT of a DC-only block is
 * `(8·r + 4) >> 3 = r` for every integer r — so a source whose value
 * is constant per 4x4 block round-trips losslessly through the lossy
 * pipeline when each block is coded as B_DC_PRED prediction plus a
 * single DC coefficient `r = v - pred`. Loop filter level 0 keeps
 * reconstruction untouched. Chroma stays at 128 (gray) with zero
 * residual everywhere.
 *
 * The encoder tracks reconstruction exactly like the decoder
 * (synthesized 127/129 borders, DC4 prediction over reconstructed
 * neighbors), so `graft.ops.Vp8.decodeYuv(encode(...))` returns the
 * source luma byte-for-byte; Vp8EncoderSpec pins that plus the
 * dHash-equality of fixture twins.
 */
object Vp8Encoder {

  /** RFC 6386 §7.1/§8.1 boolean encoder (reference form: 32-bit
   * bottom with explicit carry propagation into emitted bytes). */
  final class BoolEncoder {
    private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
    private var range = 255
    private var bottom = 0L
    private var bitCount = 24

    private def addOneToOutput(): Unit = {
      var i = buf.length - 1
      var carry = true
      while (carry) {
        if (i < 0) { carry = false } // cannot happen on legal streams
        else if (buf(i) == 0xff.toByte) { buf(i) = 0; i -= 1 }
        else { buf(i) = (buf(i) + 1).toByte; carry = false }
      }
    }

    def bool(b: Int, prob: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (b != 0) { bottom += split; range -= split }
      else range = split
      while (range < 128) {
        range <<= 1
        if ((bottom & 0x80000000L) != 0) addOneToOutput()
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          buf += ((bottom >> 24) & 0xff).toByte
          bottom &= 0xffffffL
          bitCount = 8
        }
      }
    }

    def bit(b: Int): Unit = bool(b, 128)

    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }

    def flush(): Array[Byte] = {
      val c0 = bitCount
      var v = bottom
      if ((v & (1L << (32 - c0))) != 0) addOneToOutput()
      v = (v << (c0 & 7)) & 0xffffffffL
      var c = c0 >> 3
      while (c > 0) { v = (v << 8) & 0xffffffffL; c -= 1 }
      c = 4
      while (c > 0) {
        buf += ((v >> 24) & 0xff).toByte
        v = (v << 8) & 0xffffffffL
        c -= 1
      }
      buf.toArray
    }
  }

  // --- the same spec constants the decoder uses (public RFC 6386
  // values; kept tiny and local so the tool has no private deps)
  private val KF_YMODE_PROB0 = 145 // P(leaf B_PRED at ymode root)
  private val KF_UV_PROB0 = 142    // P(leaf DC at uv root)
  private val KF_BMODE_PROB00_0 = 231 // kf_bmode_probs[DC][DC][0]
  private val CAT_BASE = Array(5, 7, 11, 19, 35, 67)
  private val CAT_PROBS: Array[Array[Int]] = Array(
    Array(159), Array(165, 145), Array(173, 148, 140), Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))

  /** Tree paths (node-probability index, branch bit) for the DCT
   * token tree — structure mirrors the decoder's TOKEN_TREE. Index
   * by token id: 0..4 literal values, 5..10 categories, 11 EOB. */
  private val TOKEN_PATHS: Array[Array[(Int, Int)]] = {
    val tree = Array(-11, 2, 0, 4, -1, 6, 8, 12, -2, 10, -3, -4, 14, 16, -5, -6, 18, 20, -7, -8, -9, -10)
    val out = new Array[Array[(Int, Int)]](12)
    def walk(node: Int, path: List[(Int, Int)]): Unit = {
      for (b <- 0 to 1) {
        val nxt = tree(node + b)
        val p = (node >> 1, b) :: path
        if (nxt <= 0) out(-nxt) = p.reverse.toArray
        else walk(nxt, p)
      }
    }
    walk(0, Nil)
    out
  }

  /** Encode one |coeff| value + sign as a DCT token with the default
   * probability row `probs(pOff..pOff+10)`. */
  private def encodeCoeff(be: BoolEncoder, probs: Array[Int], pOff: Int,
                          v: Int, skipEobBranch: Boolean): Unit = {
    val a = math.abs(v)
    val token =
      if (a <= 4) a
      else if (a <= 6) 5
      else if (a <= 10) 6
      else if (a <= 18) 7
      else if (a <= 34) 8
      else if (a <= 66) 9
      else 10
    encodeToken(be, probs, pOff, token, skipEobBranch)
    if (token >= 5) {
      val cat = token - 5
      val extra = a - CAT_BASE(cat)
      val cp = CAT_PROBS(cat)
      var i = 0
      while (i < cp.length) {
        be.bool((extra >> (cp.length - 1 - i)) & 1, cp(i))
        i += 1
      }
    }
    if (a != 0) be.bit(if (v < 0) 1 else 0)
  }

  private def encodeToken(be: BoolEncoder, probs: Array[Int], pOff: Int,
                          token: Int, skipEobBranch: Boolean): Unit = {
    val path = TOKEN_PATHS(token)
    var i = if (skipEobBranch) 1 else 0 // path(0) is always the EOB/rest branch
    while (i < path.length) {
      be.bool(path(i)._2, probs(pOff + path(i)._1))
      i += 1
    }
  }

  /**
   * Encode a keyframe whose luma is `luma(x, y)` (0..255, MUST be
   * constant over each 4x4-aligned block for the lossless
   * round-trip; values beyond (w, h) up to the 16-px macroblock pad
   * are taken from the clamped coordinate) and whose chroma is the
   * neutral 128. Returns the complete RIFF/WEBP file bytes.
   */
  def encode(w: Int, h: Int, luma: (Int, Int) => Int): Array[Byte] = {
    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4
    val w16 = mbW * 16; val h16 = mbH * 16
    def src(x: Int, y: Int): Int =
      luma(math.min(x, w - 1), math.min(y, h - 1))

    // reconstruction plane with synthesized borders (127 above, 129
    // left, 127 corner) — mirrors the decoder exactly
    val stride = w16 + 1
    val plane = new Array[Int](stride * (h16 + 1))
    java.util.Arrays.fill(plane, 0, stride, 127)
    var r = 1
    while (r <= h16) { plane(r * stride) = 129; r += 1 }
    @inline def at(x: Int, y: Int) = plane((y + 1) * stride + (x + 1))

    // --- per-block DC residuals + skip flags, tracking reconstruction
    val nMb = mbW * mbH
    val skips = new Array[Boolean](nMb)
    val dcs = new Array[Int](nMb * 16)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val mi = mbY * mbW + mbX
        var anyNz = false
        var b = 0
        while (b < 16) {
          val bx = mbX * 16 + (b & 3) * 4
          val by = mbY * 16 + (b >> 2) * 4
          var sumA = 0; var sumL = 0
          var i = 0
          while (i < 4) {
            sumA += at(bx + i, by - 1)
            sumL += at(bx - 1, by + i)
            i += 1
          }
          val pred = (sumA + sumL + 4) >> 3
          val v = src(bx, by)
          val res = v - pred
          dcs(mi * 16 + b) = res
          if (res != 0) anyNz = true
          // reconstruct: pred + ((8*res + 4) >> 3) == v exactly
          var yy = 0
          while (yy < 4) {
            var xx = 0
            while (xx < 4) {
              plane((by + yy + 1) * stride + (bx + xx + 1)) = v
              xx += 1
            }
            yy += 1
          }
          b += 1
        }
        skips(mi) = !anyNz
        mbX += 1
      }
      mbY += 1
    }

    // --- first (control) partition
    val hdr = new BoolEncoder
    hdr.bit(0) // color space
    hdr.bit(0) // clamping
    hdr.bit(0) // segmentation disabled
    hdr.bit(0) // filter type: normal (level 0 => never applied)
    hdr.literal(0, 6) // loop filter level 0
    hdr.literal(0, 3) // sharpness
    hdr.bit(0) // no lf delta
    hdr.literal(0, 2) // one token partition
    hdr.literal(4, 7) // y_ac_qi = 4 (dc dequant factor 8)
    hdr.bit(0); hdr.bit(0); hdr.bit(0); hdr.bit(0); hdr.bit(0) // no deltas
    hdr.bit(1) // refresh entropy probs
    // no coefficient probability updates
    var i = 0
    while (i < 1056) {
      hdr.bool(0, graft.ops.Vp8Tables.COEFF_UPDATE_PROBS(i))
      i += 1
    }
    hdr.bit(1) // mb_no_coeff_skip in use
    hdr.literal(128, 8) // skip probability
    // mode records: every MB is B_PRED with all-DC submodes + DC uv
    var mi = 0
    while (mi < nMb) {
      hdr.bool(if (skips(mi)) 1 else 0, 128)
      hdr.bool(0, KF_YMODE_PROB0) // ymode tree leaf B_PRED = "0"
      var b = 0
      while (b < 16) {
        // every context is [DC][DC]: all neighbors (incl. synthesized
        // out-of-frame ones) are B_DC_PRED
        hdr.bool(0, KF_BMODE_PROB00_0)
        b += 1
      }
      hdr.bool(0, KF_UV_PROB0) // uv DC = "0"
      mi += 1
    }
    val part0 = hdr.flush()

    // --- token partition. Nonzero context tracking mirrors the
    // decoder: per-plane above (per MB column) and left flags.
    val tk = new BoolEncoder
    val probs = graft.ops.Vp8Tables.COEFF_PROBS
    val aY = new Array[Int](mbW * 4); val lY = new Array[Int](4)
    val aU = new Array[Int](mbW * 2); val lU = new Array[Int](2)
    val aV = new Array[Int](mbW * 2); val lV = new Array[Int](2)
    val BANDS1 = 1 // band of coefficient position 1
    mbY = 0
    while (mbY < mbH) {
      java.util.Arrays.fill(lY, 0)
      java.util.Arrays.fill(lU, 0)
      java.util.Arrays.fill(lV, 0)
      var mbX = 0
      while (mbX < mbW) {
        val mi2 = mbY * mbW + mbX
        if (skips(mi2)) {
          var k = 0
          while (k < 4) { aY(mbX * 4 + k) = 0; lY(k) = 0; k += 1 }
          k = 0
          while (k < 2) {
            aU(mbX * 2 + k) = 0; lU(k) = 0
            aV(mbX * 2 + k) = 0; lV(k) = 0
            k += 1
          }
        } else {
          var b = 0
          while (b < 16) {
            val rr = b >> 2; val cc = b & 3
            val ctx = aY(mbX * 4 + cc) + lY(rr)
            val res = dcs(mi2 * 16 + b)
            // type 3 (Y without Y2), position 0, band 0
            val pOff = (3 * 8 + 0) * 33 + ctx * 11
            if (res == 0) {
              encodeToken(tk, probs, pOff, 11, skipEobBranch = false) // EOB
              aY(mbX * 4 + cc) = 0; lY(rr) = 0
            } else {
              encodeCoeff(tk, probs, pOff, res, skipEobBranch = false)
              // EOB at position 1: band 1, ctx from |res|
              val ctx1 = if (math.abs(res) > 1) 2 else 1
              val pOff1 = (3 * 8 + BANDS1) * 33 + ctx1 * 11
              encodeToken(tk, probs, pOff1, 11, skipEobBranch = false)
              aY(mbX * 4 + cc) = 1; lY(rr) = 1
            }
            b += 1
          }
          // chroma: all residuals zero -> immediate EOB per block
          var p = 0
          while (p < 2) {
            val aC = if (p == 0) aU else aV
            val lC = if (p == 0) lU else lV
            var sb = 0
            while (sb < 4) {
              val rr = sb >> 1; val cc = sb & 1
              val ctx = aC(mbX * 2 + cc) + lC(rr)
              val pOff = (2 * 8 + 0) * 33 + ctx * 11
              encodeToken(tk, probs, pOff, 11, skipEobBranch = false)
              aC(mbX * 2 + cc) = 0; lC(rr) = 0
              sb += 1
            }
            p += 1
          }
        }
        mbX += 1
      }
      mbY += 1
    }
    val part1 = tk.flush()

    // --- assemble the frame
    val out = new java.io.ByteArrayOutputStream()
    val tag = (part0.length << 5) | (1 << 4) | 0 // keyframe, version 0, shown
    out.write(tag & 0xff); out.write((tag >> 8) & 0xff); out.write((tag >> 16) & 0xff)
    out.write(0x9d); out.write(0x01); out.write(0x2a)
    out.write(w & 0xff); out.write((w >> 8) & 0x3f)
    out.write(h & 0xff); out.write((h >> 8) & 0x3f)
    out.write(part0)
    out.write(part1)
    ImageDupFixture.riff("VP8 ", out.toByteArray)
  }
}
