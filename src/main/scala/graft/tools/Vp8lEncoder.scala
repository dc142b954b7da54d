package graft.tools

import graft.ops.Vp8l
import graft.tools.ImageDupFixture.BitWriter

/**
 * A small REAL VP8L encoder (RFC 9649 bitstreams) — test support for
 * the [[graft.ops.Vp8l]] decoder. Unlike the fixed-layout twin
 * encoding in [[ImageDupFixture]] (whose bit grid the DuckDB oracle
 * reads pixels straight out of, and which therefore stays frozen),
 * this encoder produces the stream shapes `cwebp -lossless` actually
 * emits: frequency-built canonical prefix codes declared through the
 * code-length code, LZ77 backreferences with plane-mapped distances,
 * color-cache hits, meta-prefix entropy groups, and the predictor /
 * cross-color / subtract-green transforms (forward-applied in
 * bitstream order, so the decoder's reverse-order inverses undo them).
 * Round-tripping arbitrary images through it pins the decoder paths
 * no hand-written fixture stream could cover.
 *
 * The code builder is balanced (Kraft-complete by construction:
 * `2^L - n` symbols at length `L-1`, the rest at `L`), not
 * length-optimal — decoders cannot tell the difference.
 */
object Vp8lEncoder {

  /** Forward transforms, in the order they are DECLARED in the
   * bitstream (the decoder inverse-applies them in reverse). */
  sealed trait Tf
  case object SubGreenTf extends Tf
  /** `modeOf(bx, by)` picks the predictor mode (0..13) per block. */
  final case class PredictorTf(sizeBits: Int, modeOf: (Int, Int) => Int) extends Tf
  /** `elemOf(bx, by)` = (green_to_red, green_to_blue, red_to_blue),
   * each a signed 3.5 fixed-point byte (0..255). */
  final case class ColorTf(sizeBits: Int, elemOf: (Int, Int) => (Int, Int, Int)) extends Tf
  /** Palette transform: the palette derives from the image's distinct
   * colors (≤ 256, first-seen order), delta-coded into the stream;
   * indices bundle sub-byte when the palette is small (≤16). */
  case object ColorIndexTf extends Tf

  /** Encoding plan for the main entropy image. `metaGroups > 1`
   * splits the image into `1 << metaBits`-pixel blocks striped over
   * that many entropy groups. */
  final case class Plan(
      transforms: Seq[Tf] = Nil,
      cacheBits: Int = 0,
      useLz77: Boolean = true,
      metaBits: Int = 0,
      metaGroups: Int = 1)

  // ----------------------- canonical code support -----------------------

  /** Per-symbol (length, code) table; emission is zero bits when only
   * one symbol is used (the decoder's degenerate 0-bit form). */
  private final class Enc(val lens: Array[Int]) {
    val nUsed: Int = lens.count(_ > 0)
    val codes: Array[Int] = {
      val out = new Array[Int](lens.length)
      val maxLen = if (nUsed == 0) 0 else lens.max
      val count = new Array[Int](maxLen + 1)
      lens.foreach(l => if (l > 0) count(l) += 1)
      val next = new Array[Int](maxLen + 1)
      var c = 0
      var l = 1
      while (l <= maxLen) { next(l) = c; c = (c + count(l)) << 1; l += 1 }
      var s = 0
      while (s < lens.length) {
        if (lens(s) > 0) { out(s) = next(lens(s)); next(lens(s)) += 1 }
        s += 1
      }
      out
    }
    def emit(bw: BitWriter, sym: Int): Unit = {
      require(lens(sym) > 0, s"emitting unused symbol $sym")
      if (nUsed > 1) bw.code(codes(sym), lens(sym))
    }
  }

  /** Balanced complete code over the used symbols: with n symbols and
   * L = ceil(log2 n), the first `2^L - n` get length L-1, the rest L
   * — Kraft equality holds by construction. */
  private def balanced(used: Seq[Int], alphabet: Int): Enc = {
    val syms = used.distinct.sorted
    require(syms.nonEmpty && syms.last < alphabet, s"symbols $syms vs $alphabet")
    val lens = new Array[Int](alphabet)
    if (syms.size == 1) lens(syms.head) = 1
    else {
      val n = syms.size
      var l = 1
      while ((1 << l) < n) l += 1
      val shorter = (1 << l) - n
      syms.zipWithIndex.foreach { case (s, i) =>
        lens(s) = if (i < shorter) l - 1 else l
      }
    }
    new Enc(lens)
  }

  /** Declare a code in the bitstream: the simple form when 1–2
   * symbols allow it, else the full code-length-code form. Returns
   * the emission table. */
  private def writeCode(bw: BitWriter, enc: Enc, alphabet: Int): Enc = {
    val used = enc.lens.indices.filter(enc.lens(_) > 0)
    // the simple form carries symbols in at most 8 bits — length
    // codes (256+) and cache symbols (280+) need the full form
    if (used.size <= 2 && used.last < 256) {
      bw.bits(1, 1)                 // simple
      bw.bits(used.size - 1, 1)     // num_symbols - 1
      val s0 = used.head
      if (s0 < 2) { bw.bits(0, 1); bw.bits(s0, 1) }
      else { bw.bits(1, 1); bw.bits(s0, 8) }
      if (used.size == 2) bw.bits(used(1), 8)
      return enc
    }
    bw.bits(0, 1) // full form
    // code-length sequence: literal lengths; zero runs via 17/18
    val seq = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var i = 0
    while (i < alphabet) {
      if (enc.lens(i) == 0) {
        // greedy zero runs: 18 covers 11–138, 17 covers 3–10, literal
        // zeros mop up any 1–2 remainder — every run length encodes
        var run = 0
        while (i + run < alphabet && enc.lens(i + run) == 0) run += 1
        var left = run
        while (left >= 11) {
          val t = math.min(138, left)
          seq += ((18, 7, t - 11)); left -= t
        }
        if (left >= 3) { seq += ((17, 3, left - 3)); left = 0 }
        while (left > 0) { seq += ((0, 0, 0)); left -= 1 }
        i += run
      } else {
        seq += ((enc.lens(i), 0, 0))
        i += 1
      }
    }
    val clEnc = balanced(seq.map(_._1).distinct.toSeq, 19)
    val numCl = math.max(4,
      Vp8lDecl.clOrderPos.zipWithIndex
        .collect { case (sym, pos) if clEnc.lens(sym) > 0 => pos + 1 }
        .foldLeft(0)(math.max))
    bw.bits(numCl - 4, 4)
    var p = 0
    while (p < numCl) { bw.bits(clEnc.lens(Vp8lDecl.clOrderPos(p)), 3); p += 1 }
    bw.bits(0, 1) // no max_symbol: the sequence covers the full alphabet
    seq.foreach { case (sym, eb, ev) =>
      clEnc.emit(bw, sym)
      if (eb > 0) bw.bits(ev, eb)
    }
    enc
  }

  private object Vp8lDecl {
    /** kCodeLengthCodeOrder: position p declares symbol clOrderPos(p). */
    val clOrderPos: Array[Int] = Array(
      17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
  }

  // --------------------------- token stream ---------------------------

  private sealed trait Token
  private final case class Lit(argb: Int) extends Token
  private final case class Hit(idx: Int) extends Token
  private final case class Copy(len: Int, dist: Int) extends Token

  /** Inverse of the decoder's prefixVal: value → (code, extraBits,
   * extraVal). */
  private def prefixCode(v: Int): (Int, Int, Int) = {
    require(v >= 1)
    if (v <= 4) return (v - 1, 0, 0)
    var c = 4
    while (c < 40) {
      val extra = (c - 2) >> 1
      val offset = (2 + (c & 1)) << extra
      if (v >= offset + 1 && v <= offset + (1 << extra))
        return (c, extra, v - offset - 1)
      c += 1
    }
    sys.error(s"prefix value out of range: $v")
  }

  /** Distance → distance code: a near distance uses its plane code
   * (searched through the decoder's own mapping — round-trip
   * consistent by construction), else scan-line distance + 120. */
  private def distCode(dist: Int, w: Int): Int = {
    var k = 1
    while (k <= 120) {
      if (Vp8l.planeDist(k, w) == dist) return k
      k += 1
    }
    dist + 120
  }

  /** Greedy tokenizer: prefer a dist-1 / dist-w / dist-(w+1) run of
   * length ≥ 3 (capped at 4096), then a color-cache hit, then a
   * literal — the classic encoder shape, enough to exercise every
   * decoder path. */
  private def tokenize(px: Array[Int], w: Int, cacheBits: Int,
      useLz77: Boolean): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    val cacheSize = if (cacheBits == 0) 0 else 1 << cacheBits
    val cache = new Array[Int](cacheSize)
    val seen = new Array[Boolean](cacheSize)
    def idxOf(v: Int): Int = (0x1e35a7bd * v) >>> (32 - cacheBits)
    var i = 0
    while (i < px.length) {
      var emitted = false
      if (useLz77 && i > 0) {
        var bestLen = 0
        var bestDist = 0
        Seq(1, w, w + 1).filter(_ <= i).foreach { d =>
          var l = 0
          while (i + l < px.length && l < 4096 && px(i + l - d) == px(i + l)) l += 1
          if (l > bestLen) { bestLen = l; bestDist = d }
        }
        if (bestLen >= 3) {
          out += Copy(bestLen, bestDist)
          var k = 0
          while (k < bestLen) {
            val v = px(i + k)
            if (cacheBits > 0) { cache(idxOf(v)) = v; seen(idxOf(v)) = true }
            k += 1
          }
          i += bestLen
          emitted = true
        }
      }
      if (!emitted) {
        val v = px(i)
        if (cacheBits > 0 && seen(idxOf(v)) && cache(idxOf(v)) == v)
          out += Hit(idxOf(v))
        else out += Lit(v)
        if (cacheBits > 0) { cache(idxOf(v)) = v; seen(idxOf(v)) = true }
        i += 1
      }
    }
    out.result()
  }

  // ------------------------- entropy image emit -------------------------

  /** Encode one entropy-coded image (sub-images: `level0 = false`,
   * no meta groups). `groupOf(x, y)` attributes each token to the
   * entropy group of its starting pixel. */
  private def writeEntropyImage(bw: BitWriter, px: Array[Int], w: Int, h: Int,
      level0: Boolean, cacheBits: Int, useLz77: Boolean,
      metaBits: Int, metaGroups: Int): Unit = {
    val cacheSize = if (cacheBits == 0) 0 else 1 << cacheBits
    if (cacheBits > 0) { bw.bits(1, 1); bw.bits(cacheBits, 4) }
    else bw.bits(0, 1)
    val nGroups = if (level0 && metaBits > 0) metaGroups else 1
    def groupOf(pos: Int): Int =
      if (nGroups == 1) 0
      else {
        val bx = (pos % w) >> metaBits
        val by = (pos / w) >> metaBits
        (bx + by) % nGroups
      }
    if (level0) {
      if (metaBits > 0) {
        bw.bits(1, 1) // meta-prefix present
        bw.bits(metaBits - 2, 3)
        val tw = (w + (1 << metaBits) - 1) >> metaBits
        val th = (h + (1 << metaBits) - 1) >> metaBits
        val meta = Array.tabulate(tw * th) { j =>
          val g = ((j % tw) + (j / tw)) % nGroups
          (0xff << 24) | ((g >>> 8) << 16) | ((g & 0xff) << 8)
        }
        writeEntropyImage(bw, meta, tw, th, level0 = false,
          cacheBits = 0, useLz77 = false, metaBits = 0, metaGroups = 1)
      } else bw.bits(0, 1)
    }
    val tokens = tokenize(px, w, cacheBits, useLz77)
    // histograms per group, tracked at token start positions
    val greens = Array.fill(nGroups)(Vector.newBuilder[Int])
    val reds = Array.fill(nGroups)(Vector.newBuilder[Int])
    val blues = Array.fill(nGroups)(Vector.newBuilder[Int])
    val alphas = Array.fill(nGroups)(Vector.newBuilder[Int])
    val dists = Array.fill(nGroups)(Vector.newBuilder[Int])
    var pos = 0
    tokens.foreach {
      case Lit(v) =>
        val g = groupOf(pos)
        greens(g) += (v >>> 8) & 0xff
        reds(g) += (v >>> 16) & 0xff
        blues(g) += v & 0xff
        alphas(g) += (v >>> 24) & 0xff
        pos += 1
      case Hit(idx) =>
        greens(groupOf(pos)) += 280 + idx
        pos += 1
      case Copy(len, dist) =>
        val g = groupOf(pos)
        greens(g) += 256 + prefixCode(len)._1
        dists(g) += prefixCode(distCode(dist, w))._1
        pos += len
    }
    val encs = (0 until nGroups).map { g =>
      val gr = greens(g).result()
      // every group needs a usable green code even if the stripe got
      // no tokens (the decoder parses all declared groups)
      val green = balanced(if (gr.isEmpty) Seq(0) else gr, 256 + 24 + cacheSize)
      def side(b: Vector[Int]): Enc = balanced(if (b.isEmpty) Seq(0) else b, 256)
      val dd = dists(g).result()
      (writeCode(bw, green, 256 + 24 + cacheSize),
        writeCode(bw, side(reds(g).result()), 256),
        writeCode(bw, side(blues(g).result()), 256),
        writeCode(bw, side(alphas(g).result()), 256),
        writeCode(bw, balanced(if (dd.isEmpty) Seq(0) else dd, 40), 40))
    }
    pos = 0
    tokens.foreach {
      case Lit(v) =>
        val (ge, re, be, ae, _) = encs(groupOf(pos))
        ge.emit(bw, (v >>> 8) & 0xff)
        re.emit(bw, (v >>> 16) & 0xff)
        be.emit(bw, v & 0xff)
        ae.emit(bw, (v >>> 24) & 0xff)
        pos += 1
      case Hit(idx) =>
        encs(groupOf(pos))._1.emit(bw, 280 + idx)
        pos += 1
      case Copy(len, dist) =>
        val (ge, _, _, _, de) = encs(groupOf(pos))
        val (lc, leb, lev) = prefixCode(len)
        ge.emit(bw, 256 + lc)
        if (leb > 0) bw.bits(lev, leb)
        val (dc, deb, dev) = prefixCode(distCode(dist, w))
        de.emit(bw, dc)
        if (deb > 0) bw.bits(dev, deb)
        pos += len
    }
  }

  // ------------------------- forward transforms -------------------------

  private def fwdSubGreen(px: Array[Int]): Array[Int] =
    px.map { p =>
      val g = (p >>> 8) & 0xff
      val r = (((p >>> 16) & 0xff) - g) & 0xff
      val b = ((p & 0xff) - g) & 0xff
      (p & 0xff00ff00) | (r << 16) | b
    }

  private def avg2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** The decoder's predicted value for pixel i given FINAL pixels —
   * duplicated forward-side so residuals are exact. */
  private def predict(px: Array[Int], w: Int, i: Int, mode: Int): Int = {
    val y = i / w
    val x = i % w
    if (y == 0 && x == 0) return 0xff000000
    if (y == 0) return px(i - 1)
    if (x == 0) return px(i - w)
    val l = px(i - 1); val t = px(i - w)
    val tl = px(i - w - 1); val tr = px(i - w + 1)
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
      case 11 =>
        var d = 0
        var s = 0
        while (s < 32) {
          val lc = (l >>> s) & 0xff; val tc = (t >>> s) & 0xff
          val tlc = (tl >>> s) & 0xff
          d += math.abs(lc - tlc) - math.abs(tc - tlc)
          s += 8
        }
        if (d <= 0) t else l
      case 12 =>
        var out = 0
        var s = 0
        while (s < 32) {
          out |= clip255(((l >>> s) & 0xff) + ((t >>> s) & 0xff) -
            ((tl >>> s) & 0xff)) << s
          s += 8
        }
        out
      case 13 =>
        val a = avg2(l, t)
        var out = 0
        var s = 0
        while (s < 32) {
          val ac = (a >>> s) & 0xff; val bc = (tl >>> s) & 0xff
          out |= clip255(ac + (ac - bc) / 2) << s
          s += 8
        }
        out
      case m => sys.error(s"mode $m")
    }
  }

  private def subPx(a: Int, b: Int): Int = {
    var out = 0
    var s = 0
    while (s < 32) {
      out |= ((((a >>> s) & 0xff) - ((b >>> s) & 0xff)) & 0xff) << s
      s += 8
    }
    out
  }

  private def fwdPredictor(px: Array[Int], w: Int, h: Int,
      sizeBits: Int, modeOf: (Int, Int) => Int): Array[Int] = {
    val out = new Array[Int](px.length)
    var i = 0
    while (i < px.length) {
      val mode = modeOf((i % w) >> sizeBits, (i / w) >> sizeBits)
      out(i) = subPx(px(i), predict(px, w, i, mode))
      i += 1
    }
    out
  }

  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  private def fwdColor(px: Array[Int], w: Int, h: Int,
      sizeBits: Int, elemOf: (Int, Int) => (Int, Int, Int)): Array[Int] =
    px.zipWithIndex.map { case (p, i) =>
      val (g2r, g2b, r2b) = elemOf((i % w) >> sizeBits, (i / w) >> sizeBits)
      val green = (p >>> 8) & 0xff
      val red = (p >>> 16) & 0xff
      val blue = p & 0xff
      val nr = (red - ctDelta(g2r, green)) & 0xff
      val nb = (blue - ctDelta(g2b, green) - ctDelta(r2b, red)) & 0xff
      (p & 0xff00ff00) | (nr << 16) | nb
    }

  // ------------------------------ encode ------------------------------

  /** Encode ARGB pixels as a RIFF/WEBP file with a VP8L chunk. */
  def encode(px: Array[Int], w: Int, h: Int, plan: Plan = Plan()): Array[Byte] = {
    require(px.length == w * h)
    val bw = new BitWriter
    bw.bits(0x2f, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1) // alpha hint
    bw.bits(0, 3) // version
    var cur = px
    var curW = w // COLOR_INDEXING bundles pixels: width shrinks mid-chain
    plan.transforms.foreach { tf =>
      bw.bits(1, 1)
      tf match {
        case SubGreenTf =>
          bw.bits(2, 2)
          cur = fwdSubGreen(cur)
        case PredictorTf(sb, modeOf) =>
          bw.bits(0, 2)
          bw.bits(sb - 2, 3)
          val tw = (curW + (1 << sb) - 1) >> sb
          val th = (h + (1 << sb) - 1) >> sb
          val modes = Array.tabulate(tw * th) { j =>
            (0xff << 24) | ((modeOf(j % tw, j / tw) & 0xff) << 8)
          }
          writeEntropyImage(bw, modes, tw, th, level0 = false,
            cacheBits = 0, useLz77 = false, metaBits = 0, metaGroups = 1)
          cur = fwdPredictor(cur, curW, h, sb, modeOf)
        case ColorTf(sb, elemOf) =>
          bw.bits(1, 2)
          bw.bits(sb - 2, 3)
          val tw = (curW + (1 << sb) - 1) >> sb
          val th = (h + (1 << sb) - 1) >> sb
          val elems = Array.tabulate(tw * th) { j =>
            val (g2r, g2b, r2b) = elemOf(j % tw, j / tw)
            (0xff << 24) | ((r2b & 0xff) << 16) | ((g2b & 0xff) << 8) | (g2r & 0xff)
          }
          writeEntropyImage(bw, elems, tw, th, level0 = false,
            cacheBits = 0, useLz77 = false, metaBits = 0, metaGroups = 1)
          cur = fwdColor(cur, curW, h, sb, elemOf)
        case ColorIndexTf =>
          bw.bits(3, 2)
          val palette = cur.distinct
          require(palette.length <= 256,
            s"palette transform needs <= 256 colors, got ${palette.length}")
          bw.bits(palette.length - 1, 8)
          // delta-code per channel (the decoder re-accumulates)
          val delta = palette.zipWithIndex.map { case (p, i) =>
            if (i == 0) p else subPx(p, palette(i - 1))
          }
          writeEntropyImage(bw, delta, palette.length, 1, level0 = false,
            cacheBits = 0, useLz77 = false, metaBits = 0, metaGroups = 1)
          val widthBits =
            if (palette.length <= 2) 3
            else if (palette.length <= 4) 2
            else if (palette.length <= 16) 1
            else 0
          val idxOf = palette.zipWithIndex.toMap
          val perPixel = 1 << widthBits
          val bits = 8 >> widthBits
          val packedW = (curW + perPixel - 1) >> widthBits
          cur = Array.tabulate(packedW * h) { j =>
            val y = j / packedW
            val x0 = (j % packedW) << widthBits
            var bundled = 0
            var k = 0
            while (k < perPixel && x0 + k < curW) {
              bundled |= idxOf(cur(y * curW + x0 + k)) << (k * bits)
              k += 1
            }
            (0xff << 24) | (bundled << 8)
          }
          curW = packedW
      }
    }
    bw.bits(0, 1) // no more transforms
    writeEntropyImage(bw, cur, curW, h, level0 = true,
      plan.cacheBits, plan.useLz77, plan.metaBits, plan.metaGroups)
    ImageDupFixture.riff("VP8L", bw.toBytes)
  }
}
