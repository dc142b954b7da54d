package graft.ops

/**
 * WebP-LOSSLESS (VP8L) decoder — the self-contained entropy-coded
 * half of WebP (RFC 9649): no external codec, just an LSB-first
 * bitstream, canonical prefix codes and an ARGB pixel loop. WebP is
 * a large share of modern web images and the JDK's ImageIO cannot
 * read it, so without this the perceptual near-dup family silently
 * drops every WebP row (the q_m34 coverage face makes that miss a
 * queryable number; this decoder closes the lossless half).
 *
 * Scope (documented subset, tolerance-not-throw like every walker):
 * literal pixels + COLOR-CACHE symbols (the spec's
 * `(0x1e35a7bd·argb) >>> (32-bits)` recent-color table) + the
 * SUBTRACT-GREEN transform (the payload-less transform gray/flat
 * images compress through); LZ77 backreferences, the
 * predictor/color/color-indexing transforms and meta-prefix codes
 * claim nothing. The PREFIX-CODE machinery itself is complete per
 * the spec: simple codes (1–2 symbols), full codes via the
 * code-length code (3-bit lengths in kCodeLengthCodeOrder, the
 * optional max_symbol path, repeat codes 16/17/18), canonical
 * assignment, and the single-symbol 0-bit degenerate form.
 *
 * Reference behaviour: lucasnetau/php-ec has no media layer at all —
 * this face exists for the LLM-pipeline brief (image near-dedup over
 * crawl corpora), not the reference surface.
 */
private[ops] object Vp8l {

  /** Spec order of the code-length code's 3-bit lengths
   * (kCodeLengthCodeOrder, all 19 entries). */
  private val ClOrder = Array(
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private final class Bad extends RuntimeException
  private def bad(): Nothing = throw new Bad

  /** LSB-first bit reader over a byte span, hard-bounded. */
  private final class Br(b: Array[Byte], startByte: Int, endByte: Int) {
    private var pos = startByte.toLong * 8
    private val end = endByte.toLong * 8
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= end) bad()
        v |= ((b((pos >>> 3).toInt) >>> (pos & 7).toInt) & 1) << i
        pos += 1
        i += 1
      }
      v
    }
  }

  /** Canonical prefix code: bit-by-bit descent (first-read bit is the
   * code's MSB, the deflate convention the spec shares). A code where
   * at most one symbol has a nonzero length degenerates to 0 bits. */
  private final class Code(lens: Array[Int]) {
    private val maxLen = 15
    private val count = new Array[Int](maxLen + 1)
    lens.foreach { l => if (l < 0 || l > maxLen) bad(); if (l > 0) count(l) += 1 }
    private val nonzero = count.sum
    private val single =
      if (nonzero <= 1) lens.indexWhere(_ > 0) // -1 = empty: unusable
      else -2
    private val firstCode = new Array[Int](maxLen + 1)
    private val offset = new Array[Int](maxLen + 1)
    private val sym = new Array[Int](nonzero)
    if (single == -2) {
      var c = 0
      var total = 0
      var l = 1
      while (l <= maxLen) {
        firstCode(l) = c
        offset(l) = total
        c = (c + count(l)) << 1
        total += count(l)
        l += 1
      }
      // completeness (Kraft equality): an over- or under-subscribed
      // code is corrupt input
      if (firstCode(maxLen) + count(maxLen) != (1 << maxLen)) bad()
      val idx = new Array[Int](maxLen + 1)
      var s = 0
      while (s < lens.length) {
        val ln = lens(s)
        if (ln > 0) { sym(offset(ln) + idx(ln)) = s; idx(ln) += 1 }
        s += 1
      }
    }
    def read(br: Br): Int = {
      if (single >= 0) return single
      if (single == -1) bad()
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.bits(1)
        len += 1
        if (count(len) > 0 && code - firstCode(len) < count(len) &&
            code >= firstCode(len))
          return sym(offset(len) + code - firstCode(len))
      }
      bad()
    }
  }

  private object Code {
    def single(s: Int): Code = {
      val lens = new Array[Int](s + 1)
      lens(s) = 1
      new Code(lens) // nonzero == 1 → degenerate 0-bit form
    }
    def pair(s0: Int, s1: Int, alphabet: Int): Code = {
      if (s0 >= alphabet || s1 >= alphabet || s0 == s1) bad()
      val lens = new Array[Int](alphabet)
      lens(s0) = 1
      lens(s1) = 1
      new Code(lens)
    }
  }

  /** One prefix code per the spec's ReadHuffmanCode. */
  private def readCode(br: Br, alphabet: Int): Code =
    if (br.bits(1) == 1) {
      // simple: 1 or 2 symbols
      val n = br.bits(1) + 1
      val s0 = br.bits(if (br.bits(1) == 1) 8 else 1)
      if (n == 1) {
        if (s0 >= alphabet) bad()
        Code.single(s0)
      } else Code.pair(s0, br.bits(8), alphabet)
    } else {
      val numCl = 4 + br.bits(4) // 4..19 == ClOrder.length
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) {
        clLens(ClOrder(i)) = br.bits(3)
        i += 1
      }
      val clCode = new Code(clLens)
      var maxSymbol =
        if (br.bits(1) == 1) {
          val nbits = 2 + 2 * br.bits(3)
          2 + br.bits(nbits)
        } else alphabet
      if (maxSymbol > alphabet) bad()
      val lens = new Array[Int](alphabet)
      var symbol = 0
      var prev = 8
      var done = false
      while (!done && symbol < alphabet) {
        if (maxSymbol == 0) done = true
        else {
          maxSymbol -= 1
          val cl = clCode.read(br)
          if (cl < 16) {
            lens(symbol) = cl
            symbol += 1
            if (cl != 0) prev = cl
          } else {
            val (extra, base) = cl match {
              case 16 => (2, 3)
              case 17 => (3, 3)
              case 18 => (7, 11)
              case _  => bad()
            }
            val repeat = base + br.bits(extra)
            if (symbol + repeat > alphabet) bad()
            val fill = if (cl == 16) prev else 0
            var r = 0
            while (r < repeat) { lens(symbol) = fill; symbol += 1; r += 1 }
          }
        }
      }
      new Code(lens)
    }

  /** Locate the VP8L chunk payload inside a RIFF/WEBP container. */
  private def vp8lSpan(b: Array[Byte]): Option[(Int, Int)] = {
    def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def tag(o: Int, t: String): Boolean =
      o + 4 <= b.length && t.indices.forall(i => (b(o + i) & 0xff) == t.charAt(i))
    if (b == null || b.length < 20 || !tag(0, "RIFF") || !tag(8, "WEBP"))
      return None
    var p = 12
    while (p + 8 <= b.length) {
      val size = le32(p + 4)
      if (size < 0 || p + 8 + size > b.length) return None
      if (tag(p, "VP8L")) return Some((p + 8, (size).toInt))
      p += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    None
  }

  /** Decode a VP8L image to (width, height, ARGB pixels), or None on
   * anything outside the documented subset or corrupt — tolerance,
   * never a throw. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      vp8lSpan(bytes).flatMap { case (off, len) =>
        val br = new Br(bytes, off, off + len)
        if (br.bits(8) != 0x2f) return None
        val w = br.bits(14) + 1
        val h = br.bits(14) + 1
        br.bits(1) // alpha-is-used hint
        if (br.bits(3) != 0) return None // version must be 0
        // transforms: SUBTRACT_GREEN (type 2, no payload) is the one
        // in scope — predictor/color/indexing claim nothing
        var subtractGreen = false
        while (br.bits(1) == 1) br.bits(2) match {
          case 2 => subtractGreen = true
          case _ => return None
        }
        // color cache: indexed by (0x1e35a7bd · argb) >>> (32 - bits)
        val cacheBits =
          if (br.bits(1) == 1) {
            val cb = br.bits(4)
            if (cb < 1 || cb > 11) return None
            cb
          } else 0
        if (br.bits(1) != 0) return None // meta-prefix codes: subset
        if (w.toLong * h > (1 << 24)) return None // runaway guard
        val cacheSize = if (cacheBits == 0) 0 else 1 << cacheBits
        val green = readCode(br, 256 + 24 + cacheSize)
        val red = readCode(br, 256)
        val blue = readCode(br, 256)
        val alpha = readCode(br, 256)
        readCode(br, 40) // distance code: parsed, unused in subset
        val cache = new Array[Int](cacheSize)
        val px = new Array[Int](w * h)
        var i = 0
        while (i < px.length) {
          val g = green.read(br)
          if (g < 256) {
            val r = red.read(br)
            val b2 = blue.read(br)
            val a = alpha.read(br)
            val argb = (a << 24) | (r << 16) | (g << 8) | b2
            px(i) = argb
            if (cacheBits > 0)
              cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
            i += 1
          } else if (g < 280) return None // LZ77 backreference: subset
          else {
            val idx = g - 280
            if (idx >= cacheSize) return None
            px(i) = cache(idx)
            i += 1
          }
        }
        if (subtractGreen) {
          var j = 0
          while (j < px.length) {
            val p = px(j)
            val g = (p >>> 8) & 0xff
            val r = (((p >>> 16) & 0xff) + g) & 0xff
            val b2 = ((p & 0xff) + g) & 0xff
            px(j) = (p & 0xff00ff00) | (r << 16) | b2
            j += 1
          }
        }
        Some((w, h, px))
      }
    } catch { case _: Bad | _: ArrayIndexOutOfBoundsException => None }

  /** [[decode]] as a BufferedImage, for the shared luminance-grid
   * path the perceptual family hashes through. */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    decode(bytes).map { case (w, h, px) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      img.setRGB(0, 0, w, h, px, 0, w)
      img
    }
}
