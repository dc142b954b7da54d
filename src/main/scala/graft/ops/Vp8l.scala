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
 * Scope (tolerance-not-throw like every walker). DECODED: the FULL
 * lossless format — literal pixels, COLOR-CACHE symbols (the spec's
 * `(0x1e35a7bd·argb) >>> (32-bits)` recent-color table), LZ77
 * BACKREFERENCES (length/distance prefix values with extra bits and
 * the 120-entry near-pixel distance-code plane mapping), META-PREFIX
 * code groups (the per-block entropy-group image large images are
 * coded with), and all four transforms: PREDICTOR (all 14 spatial
 * predictors with the top-row/left-column/top-right-edge rules),
 * cross-COLOR (signed 3.5 fixed-point green→red, green→blue,
 * red→blue deltas), SUBTRACT-GREEN, and COLOR-INDEXING (delta-coded
 * palette + sub-byte pixel bundling, the icon/logo shape). Inverse
 * transforms apply in reverse bitstream order per the spec, with the
 * effective width tracked through the bundling. Lossy VP8 (the other
 * WebP half) has no decoder — measured honestly by the q_m34
 * coverage face.
 *
 * The PREFIX-CODE machinery is complete per the spec: simple codes
 * (1–2 symbols), full codes via the code-length code (3-bit lengths
 * in kCodeLengthCodeOrder, the optional max_symbol path, repeat
 * codes 16/17/18), canonical assignment, Kraft-equality corruption
 * check, and the single-symbol 0-bit degenerate form.
 *
 * Reference behaviour: lucasnetau/php-ec has no media layer at all —
 * this face exists for the LLM-pipeline brief (image near-dedup over
 * crawl corpora), not the reference surface.
 */
private[graft] object Vp8l {

  /** Spec order of the code-length code's 3-bit lengths
   * (kCodeLengthCodeOrder, all 19 entries). */
  private val ClOrder = Array(
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** The 120 near-pixel distance codes (RFC 9649 §4.2.2): entry k-1
   * encodes distance code k as (dy<<4)|(8-dx) — dy rows up, dx
   * columns left (negative dx = right). Codes above 120 are plain
   * scan-line distances offset by 120. */
  private[graft] val PlaneCodes: Array[Int] = Array(
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
    0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e, 0x00, 0x74, 0x7c, 0x41,
    0x4f, 0x10, 0x20, 0x62, 0x6e, 0x30, 0x73, 0x7d, 0x51, 0x5f,
    0x40, 0x72, 0x7e, 0x61, 0x6f, 0x50, 0x71, 0x7f, 0x60, 0x70)

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

  /** One entropy GROUP: the five prefix codes a pixel decodes
   * through. */
  private final class Group(br: Br, cacheSize: Int) {
    val green = readCode(br, 256 + 24 + cacheSize)
    val red = readCode(br, 256)
    val blue = readCode(br, 256)
    val alpha = readCode(br, 256)
    val dist = readCode(br, 40)
  }

  /** Length/distance prefix value (RFC 9649 §4.2.1): the first four
   * codes are the values 1..4, then pairs of codes share doubling
   * ranges with `(code-2)>>1` extra bits. */
  private def prefixVal(code: Int, br: Br): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }

  /** Distance-code → pixel distance (§4.2.2): codes 1..120 address a
   * near neighborhood via [[PlaneCodes]], clamped to at least 1;
   * larger codes are scan-line distances offset by 120. */
  private[graft] def planeDist(code: Int, w: Int): Int =
    if (code > 120) code - 120
    else if (code < 1) bad()
    else {
      val d = PlaneCodes(code - 1)
      val dist = (d >> 4) * w + (8 - (d & 0xf))
      if (dist >= 1) dist else 1
    }

  /** Decode one entropy-coded image (the spec's DecodeImageStream
   * body after the transform layer): color-cache config, the
   * meta-prefix group image (level0 only), prefix codes, then the
   * literal / cache / LZ77 pixel loop. Sub-images (transform data,
   * the meta-prefix image itself) decode through the same machinery
   * with `level0 = false`. */
  private def decodePixels(br: Br, w: Int, h: Int, level0: Boolean): Array[Int] = {
    if (w.toLong * h > (1 << 24)) bad() // runaway guard
    val cacheBits =
      if (br.bits(1) == 1) {
        val cb = br.bits(4)
        if (cb < 1 || cb > 11) bad()
        cb
      } else 0
    val cacheSize = if (cacheBits == 0) 0 else 1 << cacheBits
    // meta-prefix: a sub-resolution image whose (red<<8)|green picks
    // the entropy group per block — how real encoders adapt codes
    // across large images
    var metaBits = 0
    var metaImg: Array[Int] = null
    var metaW = 0
    var nGroups = 1
    if (level0 && br.bits(1) == 1) {
      metaBits = br.bits(3) + 2
      metaW = (w + (1 << metaBits) - 1) >> metaBits
      val metaH = (h + (1 << metaBits) - 1) >> metaBits
      metaImg = decodePixels(br, metaW, metaH, level0 = false)
      var mx = 0
      var i = 0
      while (i < metaImg.length) {
        val g = (metaImg(i) >>> 8) & 0xffff
        if (g > mx) mx = g
        i += 1
      }
      nGroups = mx + 1
      if (nGroups > 65536) bad() // beyond the format's group-id space
    }
    val groups = Array.fill(nGroups)(new Group(br, cacheSize))
    val cache = new Array[Int](cacheSize)
    val px = new Array[Int](w * h)
    var i = 0
    var x = 0
    while (i < px.length) {
      val group =
        if (metaImg == null) groups(0)
        else {
          val y = i / w
          val m = (metaImg(((y >> metaBits) * metaW) + (x >> metaBits)) >>> 8) & 0xffff
          groups(m)
        }
      val g = group.green.read(br)
      if (g < 256) {
        val r = group.red.read(br)
        val b2 = group.blue.read(br)
        val a = group.alpha.read(br)
        val argb = (a << 24) | (r << 16) | (g << 8) | b2
        px(i) = argb
        if (cacheBits > 0)
          cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
        i += 1
        x += 1; if (x == w) x = 0
      } else if (g < 280) {
        // LZ77 backreference: length prefix value, then a distance
        // symbol → prefix value → plane-mapped pixel distance.
        // Copied pixels insert into the color cache like literals.
        val length = prefixVal(g - 256, br)
        val dist = planeDist(prefixVal(group.dist.read(br), br), w)
        if (dist > i || i + length > px.length) bad()
        var k = 0
        while (k < length) {
          val v = px(i - dist)
          px(i) = v
          if (cacheBits > 0)
            cache((0x1e35a7bd * v) >>> (32 - cacheBits)) = v
          i += 1
          k += 1
        }
        x = i % w
      } else {
        val idx = g - 280
        if (idx >= cacheSize) bad()
        px(i) = cache(idx)
        i += 1
        x += 1; if (x == w) x = 0
      }
    }
    px
  }

  // ------------------------- inverse transforms -------------------------

  /** Per-channel (a+b)/2 without unpacking (libwebp's Average2 /
   * the spec's per-component floor average). */
  private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  /** Per-channel modular sum: residual + prediction. */
  private def addPx(a: Int, b: Int): Int = {
    val s1 = ((a & 0xff00ff00) >>> 8) + ((b & 0xff00ff00) >>> 8)
    val s0 = (a & 0x00ff00ff) + (b & 0x00ff00ff)
    ((s1 & 0x00ff00ff) << 8) | (s0 & 0x00ff00ff)
  }

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Predictor 11: per the spec, estimate p = L + T - TL per channel
   * and return whichever of L/T is Manhattan-closer to p (top wins
   * ties). */
  private def selectPred(t: Int, l: Int, tl: Int): Int = {
    var d = 0
    var s = 0
    while (s < 32) {
      val lc = (l >>> s) & 0xff
      val tc = (t >>> s) & 0xff
      val tlc = (tl >>> s) & 0xff
      d += math.abs(lc - tlc) - math.abs(tc - tlc)
      s += 8
    }
    if (d <= 0) t else l
  }

  /** Predictor 12: per-channel clip(L + T - TL). */
  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var s = 0
    while (s < 32) {
      val v = clip255(((l >>> s) & 0xff) + ((t >>> s) & 0xff) - ((tl >>> s) & 0xff))
      out |= v << s
      s += 8
    }
    out
  }

  /** Predictor 13: per-channel clip(a + (a-b)/2) with a = avg2(L,T),
   * b = TL; integer division truncates toward zero like the spec's
   * C pseudocode. */
  private def clampAddSubHalf(a: Int, b: Int): Int = {
    var out = 0
    var s = 0
    while (s < 32) {
      val ac = (a >>> s) & 0xff
      val bc = (b >>> s) & 0xff
      out |= clip255(ac + (ac - bc) / 2) << s
      s += 8
    }
    out
  }

  /** Inverse PREDICTOR transform, in place: scan order, residual +
   * predicted value per channel. Block (x>>bits, y>>bits) picks the
   * mode from the transform image's green channel; the top-left
   * pixel predicts from opaque black, the rest of the top row from
   * L, the left column from T, and the rightmost column's TR reads
   * the current row's leftmost (already-final) pixel — the flat
   * array index does that naturally. */
  private def applyPredictor(
      px: Array[Int], w: Int, h: Int,
      sizeBits: Int, tw: Int, modes: Array[Int]): Unit = {
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (y == 0 && x == 0) 0xff000000
          else if (y == 0) px(i - 1)
          else if (x == 0) px(i - w)
          else {
            val mode = (modes(((y >> sizeBits) * tw) + (x >> sizeBits)) >>> 8) & 0xff
            val l = px(i - 1)
            val t = px(i - w)
            val tl = px(i - w - 1)
            val tr = px(i - w + 1)
            mode match {
              case 0  => 0xff000000
              case 1  => l
              case 2  => t
              case 3  => tr
              case 4  => tl
              case 5  => avg2(avg2(l, tr), t)
              case 6  => avg2(l, tl)
              case 7  => avg2(l, t)
              case 8  => avg2(tl, t)
              case 9  => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => selectPred(t, l, tl)
              case 12 => clampAddSubFull(l, t, tl)
              case 13 => clampAddSubHalf(avg2(l, t), tl)
              case _  => bad()
            }
          }
        px(i) = addPx(px(i), pred)
        i += 1
        x += 1
      }
      y += 1
    }
  }

  /** Signed 3.5 fixed-point color-transform delta: both operands as
   * int8, product arithmetic-shifted by 5 (the spec's
   * ColorTransformDelta). */
  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  /** Inverse cross-COLOR transform, in place: per block, add the
   * green→red, green→blue and red→blue deltas back (red before blue,
   * blue seeing the NEW red, per the spec's inverse order). The
   * element lives in the transform pixel as blue=green_to_red,
   * green=green_to_blue, red=red_to_blue. */
  private def applyColor(
      px: Array[Int], w: Int, h: Int,
      sizeBits: Int, tw: Int, elems: Array[Int]): Unit = {
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val e = elems(((y >> sizeBits) * tw) + (x >> sizeBits))
        val g2r = e & 0xff
        val g2b = (e >>> 8) & 0xff
        val r2b = (e >>> 16) & 0xff
        val p = px(i)
        val green = (p >>> 8) & 0xff
        val red = (((p >>> 16) & 0xff) + ctDelta(g2r, green)) & 0xff
        val blue = ((p & 0xff) + ctDelta(g2b, green) + ctDelta(r2b, red)) & 0xff
        px(i) = (p & 0xff00ff00) | (red << 16) | blue
        i += 1
        x += 1
      }
      y += 1
    }
  }

  /** Inverse SUBTRACT-GREEN, in place: add green back to red/blue. */
  private def applySubtractGreen(px: Array[Int]): Unit = {
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

  private sealed trait Transform
  private case object SubGreen extends Transform
  private final case class PredictorT(sizeBits: Int, tw: Int, modes: Array[Int])
    extends Transform
  private final case class ColorT(sizeBits: Int, tw: Int, elems: Array[Int])
    extends Transform
  /** Palette transform: `palette` (delta-decoded ARGB entries),
   * `widthBits` (pixel bundling: 0/1/2/3 → 1/2/4/8 indices per
   * packed pixel), `unpackedW` the width BEFORE this transform. */
  private final case class ColorIndexT(
      palette: Array[Int], widthBits: Int, unpackedW: Int) extends Transform

  /** Inverse COLOR-INDEXING: unbundle the packed image's green
   * channels into palette lookups (LSB-first sub-pixel order within a
   * packed pixel, §4.2.4); an out-of-range index is transparent
   * black per the spec. Returns the widened pixel array. */
  private def applyColorIndex(
      px: Array[Int], packedW: Int, h: Int,
      palette: Array[Int], widthBits: Int, unpackedW: Int): Array[Int] = {
    if (widthBits == 0) {
      // no bundling: every green is a direct palette index
      var i = 0
      while (i < px.length) {
        val idx = (px(i) >>> 8) & 0xff
        px(i) = if (idx < palette.length) palette(idx) else 0
        i += 1
      }
      px
    } else {
      val perPixel = 1 << widthBits          // indices per packed pixel
      val bits = 8 >> widthBits               // bits per index
      val mask = (1 << bits) - 1
      val out = new Array[Int](unpackedW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < unpackedW) {
          val packed = px(y * packedW + (x >> widthBits))
          val idx = ((packed >>> 8) >>> ((x & (perPixel - 1)) * bits)) & mask
          out(y * unpackedW + x) =
            if (idx < palette.length) palette(idx) else 0
          x += 1
        }
        y += 1
      }
      out
    }
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
        decodeStream(br, w, h).map(px => (w, h, px))
      }
    } catch { case _: Bad | _: ArrayIndexOutOfBoundsException => None }

  /** Decode a HEADERLESS VP8L bitstream of known dimensions — the
   * form lossy WebP's ALPH chunk carries (compression method 1: the
   * lossless format minus the signature/size header, the alpha value
   * riding in the green channel). Entry for [[Vp8.decodeImage]]'s
   * alpha path. */
  private[ops] def decodeAlphaStream(bytes: Array[Byte], off: Int, end: Int,
      w: Int, h: Int): Option[Array[Int]] =
    try decodeStream(new Br(bytes, off, end), w, h)
    catch { case _: Bad | _: ArrayIndexOutOfBoundsException => None }

  /** The post-header decode machinery shared by [[decode]] (5-byte
   * signature header parsed first) and [[decodeAlphaStream]]
   * (dimensions supplied by the ALPH container). */
  private def decodeStream(br: Br, w: Int, h: Int): Option[Array[Int]] = {
    if (w.toLong * h > (1 << 24)) return None // runaway guard
    locally {
      {
        // transforms, in bitstream order; inverses apply in REVERSE
        // order, so prepending while reading yields the apply order.
        // COLOR_INDEXING shrinks the effective width for everything
        // read AFTER it (pixel bundling), so the current width is
        // tracked through the declarations and restored transform by
        // transform on the way back out
        var transforms: List[Transform] = Nil
        var curW = w
        var more = br.bits(1) == 1
        while (more) {
          br.bits(2) match {
            case 0 => // PREDICTOR
              val sb = br.bits(3) + 2
              val tw = (curW + (1 << sb) - 1) >> sb
              val th = (h + (1 << sb) - 1) >> sb
              transforms ::= PredictorT(sb, tw,
                decodePixels(br, tw, th, level0 = false))
            case 1 => // cross-COLOR
              val sb = br.bits(3) + 2
              val tw = (curW + (1 << sb) - 1) >> sb
              val th = (h + (1 << sb) - 1) >> sb
              transforms ::= ColorT(sb, tw,
                decodePixels(br, tw, th, level0 = false))
            case 2 => transforms ::= SubGreen
            case _ => // COLOR_INDEXING: palette + pixel bundling
              val tableSize = br.bits(8) + 1
              val palette = decodePixels(br, tableSize, 1, level0 = false)
              // palette entries are DELTA-coded per channel (§4.2.4)
              var i = 1
              while (i < palette.length) {
                palette(i) = addPx(palette(i), palette(i - 1))
                i += 1
              }
              val widthBits =
                if (tableSize <= 2) 3
                else if (tableSize <= 4) 2
                else if (tableSize <= 16) 1
                else 0
              transforms ::= ColorIndexT(palette, widthBits, curW)
              curW = (curW + (1 << widthBits) - 1) >> widthBits
          }
          more = br.bits(1) == 1
        }
        var px = decodePixels(br, curW, h, level0 = true)
        transforms.foreach {
          case SubGreen                  => applySubtractGreen(px)
          case PredictorT(sb, tw, modes) => applyPredictor(px, curW, h, sb, tw, modes)
          case ColorT(sb, tw, elems)     => applyColor(px, curW, h, sb, tw, elems)
          case ColorIndexT(pal, wb, uw) =>
            px = applyColorIndex(px, curW, h, pal, wb, uw)
            curW = uw
        }
        if (curW != w) return None // transform chain must restore full width
        Some(px)
      }
    }
  }

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
