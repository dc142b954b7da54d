package graft.ops

import graft.SparkSpec
import graft.tools.ImageDupFixture

class Vp8lSpec extends SparkSpec {

  test("vp8l decode: exact ARGB pixels — every cell equals the fixture contract") {
    for (id <- Seq(5L, 13L, 21L, 29L)) { // the WebP-lossless class
      val bytes = ImageDupFixture.row(id)._2
      val got = Vp8l.decode(bytes)
      assert(got.isDefined, s"id=$id did not decode")
      val (w, h, px) = got.get
      assert(w == ImageDupFixture.W && h == ImageDupFixture.H, s"id=$id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val v = ImageDupFixture.cell(id, x / 2, y / 2)
        val want = (255 << 24) | (v << 16) | (v << 8) | v
        assert(px(y * w + x) == want, s"id=$id pixel ($x,$y)")
      }
    }
  }

  test("vp8l twin hashes identically to its PNG sibling — re-encode invariance") {
    for (id <- Seq(5L, 13L, 21L, 29L)) {
      val webp = ImageHash.dhashBands(ImageDupFixture.webp(id))
      val png = ImageHash.dhashBands(ImageDupFixture.png(id))
      assert(webp.isDefined && png.isDefined, s"id=$id")
      assert(webp.get._3.toSeq == png.get._3.toSeq, s"id=$id bands")
      assert((webp.get._1, webp.get._2) == (png.get._1, png.get._2), s"id=$id dims")
    }
  }

  test("a 19-entry code-length declaration (full kCodeLengthCodeOrder) parses") {
    // the fixture always declares 12/13 code lengths; a real encoder
    // may declare all 19 — the order table's tail (…14, 15) must be
    // honoured. Hand-build a 2×1 image: green = simple 2-symbol code,
    // red/blue = uniform 8-bit codes declared with num_code_lengths=19
    val bw = new ImageDupFixture.BitWriter
    bw.bits(0x2f, 8)
    bw.bits(1, 14) // width 2
    bw.bits(0, 14) // height 1
    bw.bits(0, 1); bw.bits(0, 3) // alpha hint, version
    bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1) // no transform/cache/meta
    // GREEN: simple two symbols {100, 200} → 1-bit canonical codes
    bw.bits(1, 1); bw.bits(1, 1); bw.bits(1, 1)
    bw.bits(100, 8); bw.bits(200, 8)
    def uniform8With19(): Unit = {
      bw.bits(0, 1)
      bw.bits(19 - 4, 4) // ALL 19 order slots declared
      val lens = Array.fill(19)(0)
      lens(8) = 1  // order idx 8  → symbol 16
      lens(11) = 1 // order idx 11 → symbol 8
      lens.foreach(bw.bits(_, 3))
      bw.bits(0, 1) // no max_symbol
      bw.code(0, 1) // symbol 8 → lens[0]=8, prev=8
      var left = 255
      while (left > 0) {
        val r = if (left >= 9) 6 else if (left > 6) left - 3 else left
        bw.code(1, 1); bw.bits(r - 3, 2); left -= r
      }
    }
    uniform8With19() // red
    uniform8With19() // blue
    bw.bits(1, 1); bw.bits(0, 1); bw.bits(1, 1); bw.bits(255, 8) // alpha {255}
    bw.bits(1, 1); bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)   // distance {0}
    // pixel 0: g=100 (code 0), r=b=100; pixel 1: g=200 (code 1), r=b=200
    bw.code(0, 1); bw.code(100, 8); bw.code(100, 8)
    bw.code(1, 1); bw.code(200, 8); bw.code(200, 8)
    val got = Vp8l.decode(ImageDupFixture.riff("VP8L", bw.toBytes))
    assert(got.isDefined, "19-entry declaration did not decode")
    val (w, h, px) = got.get
    assert(w == 2 && h == 1)
    assert(px(0) == ((255 << 24) | (100 << 16) | (100 << 8) | 100))
    assert(px(1) == ((255 << 24) | (200 << 16) | (200 << 8) | 200))
  }

  test("subtract-green + color cache decode: the gray-image compression path") {
    // how a real encoder ships a gray image: SUBTRACT_GREEN collapses
    // the red/blue channels to 0 (single-symbol 0-bit codes) and the
    // color cache turns repeated pixels into 2-bit hits. 4×1 pixels
    // [10, 10, 30, 10]: literal, cache hit, literal, cache hit.
    val cacheBits = 2
    def cacheIdx(argb: Int): Int = (0x1e35a7bd * argb) >>> (32 - cacheBits)
    // pre-inverse pixels as the cache sees them: (a=255, r'=0, g=v, b'=0)
    def stored(v: Int): Int = (255 << 24) | (v << 8)
    val (iA, iB) = (cacheIdx(stored(10)), cacheIdx(stored(30)))
    assume(iA != iB, "fixture values must not collide for this pin")
    val bw = new ImageDupFixture.BitWriter
    bw.bits(0x2f, 8)
    bw.bits(3, 14); bw.bits(0, 14) // 4×1
    bw.bits(0, 1); bw.bits(0, 3)
    bw.bits(1, 1); bw.bits(2, 2)   // one transform: SUBTRACT_GREEN
    bw.bits(0, 1)                  // no more transforms
    bw.bits(1, 1); bw.bits(cacheBits, 4) // color cache, 4 entries
    bw.bits(0, 1)                  // no meta-prefix
    // GREEN over 284 symbols: {10, 30, 280+iA, 280+iB} all length 2.
    // Code-length code: {0→00, 2→01, 17→10, 18→11} (all length 2);
    // declared through order idx 4 (symbols 17,18,0,1,2).
    bw.bits(0, 1)
    bw.bits(5 - 4, 4)
    Seq(2, 2, 2, 0, 2).foreach(bw.bits(_, 3)) // 17,18,0,1,2
    bw.bits(0, 1) // no max_symbol
    def zeros(n0: Int): Unit = {
      var n = n0
      while (n > 0) {
        if (n >= 11 && (n <= 138 || n - 138 >= 3)) {
          val take = math.min(138, n)
          bw.code(3, 2); bw.bits(take - 11, 7); n -= take // sym 18
        } else if (n >= 3 && (n <= 10 || n - 10 >= 3)) {
          val take = math.min(10, n)
          bw.code(2, 2); bw.bits(take - 3, 3); n -= take // sym 17
        } else { bw.code(0, 2); n -= 1 } // literal 0
      }
    }
    val marks = Seq(10, 30, 280 + math.min(iA, iB), 280 + math.max(iA, iB))
    var at = 0
    marks.foreach { s =>
      zeros(s - at)
      bw.code(1, 2) // code-length symbol 2
      at = s + 1
    }
    zeros(284 - at)
    // RED/BLUE: simple single symbol 0 (1-bit form) → 0 bits/pixel
    bw.bits(1, 1); bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)
    bw.bits(1, 1); bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)
    // ALPHA: single symbol 255; DISTANCE: single symbol 0
    bw.bits(1, 1); bw.bits(0, 1); bw.bits(1, 1); bw.bits(255, 8)
    bw.bits(1, 1); bw.bits(0, 1); bw.bits(0, 1); bw.bits(0, 1)
    // canonical 2-bit green codes in (len, symbol) order over `marks`
    val codeOf = marks.sorted.zipWithIndex.toMap
    bw.code(codeOf(10), 2)             // literal 10 (inserts)
    bw.code(codeOf(280 + iA), 2)       // cache hit → 10
    bw.code(codeOf(30), 2)             // literal 30 (inserts)
    bw.code(codeOf(280 + iA), 2)       // cache hit → 10
    val got = Vp8l.decode(ImageDupFixture.riff("VP8L", bw.toBytes))
    assert(got.isDefined, "subtract-green + cache stream did not decode")
    val (w, h, px) = got.get
    assert(w == 4 && h == 1)
    def gray(v: Int): Int = (255 << 24) | (v << 16) | (v << 8) | v
    assert(px.toSeq == Seq(gray(10), gray(10), gray(30), gray(10)))
  }

  // ---------- real-encoder round trips (Vp8lEncoder) ----------
  // the fixture's frozen 25-bit literal layout exists for the DuckDB
  // oracle; these streams are the shapes `cwebp -lossless` emits

  import graft.tools.Vp8lEncoder
  import graft.tools.Vp8lEncoder.{ColorTf, Plan, PredictorTf, SubGreenTf}

  /** Deterministic "photo-ish" test image: smooth gradients plus
   * splitmix noise, so predictors leave small-but-nonzero residuals
   * and LZ77 finds genuine runs. */
  private def testImage(w: Int, h: Int, seed: Long): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      var z = seed + i * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      val n = ((z ^ (z >>> 31)) & 0x0f).toInt
      val r = (x * 3 + n) & 0xff
      val g = (y * 5 + (n >> 1)) & 0xff
      val b = ((x + y) * 2 + n) & 0xff
      (0xff << 24) | (r << 16) | (g << 8) | b
    }

  private def roundTrip(px: Array[Int], w: Int, h: Int, plan: Plan,
      label: String): Unit = {
    val got = Vp8l.decode(Vp8lEncoder.encode(px, w, h, plan))
    assert(got.isDefined, s"$label did not decode")
    val (gw, gh, gpx) = got.get
    assert(gw == w && gh == h, s"$label dims")
    var i = 0
    while (i < px.length) {
      assert(gpx(i) == px(i),
        f"$label pixel ${i % w},${i / w}: got ${gpx(i)}%08x want ${px(i)}%08x")
      i += 1
    }
  }

  test("LZ77 backreferences round-trip: dist-1/dist-w/dist-(w+1) runs with extra bits") {
    // constant 2x2 cells → every row has dist-1 runs and every second
    // row is a full dist-w copy (length 18 = prefix code 8 + 1 extra
    // bit), so the length/distance extra-bit machinery is exercised
    for (id <- Seq(5L, 13L)) {
      val px = Array.tabulate(ImageDupFixture.W * ImageDupFixture.H) { i =>
        val v = ImageDupFixture.cell(id, (i % ImageDupFixture.W) / 2,
          (i / ImageDupFixture.W) / 2)
        (255 << 24) | (v << 16) | (v << 8) | v
      }
      roundTrip(px, ImageDupFixture.W, ImageDupFixture.H,
        Plan(useLz77 = true), s"lz77 id=$id")
    }
    // a long flat span forces a >3000 length (code 23, 10 extra bits)
    val flat = Array.fill(64 * 64)(0xff336699)
    roundTrip(flat, 64, 64, Plan(useLz77 = true), "lz77 long-run")
  }

  test("all 14 predictor modes round-trip (8x8 blocks, one mode per block)") {
    val (w, h) = (64, 64)
    val px = testImage(w, h, seed = 17L)
    roundTrip(px, w, h, Plan(
      transforms = Seq(PredictorTf(3, (bx, by) => (bx + 8 * by) % 14)),
      useLz77 = false), "predictor all-modes")
  }

  test("cross-color transform round-trips (per-block signed 3.5 deltas)") {
    val (w, h) = (40, 24)
    val px = testImage(w, h, seed = 23L)
    roundTrip(px, w, h, Plan(
      transforms = Seq(ColorTf(3,
        (bx, by) => ((bx * 37 + 1) & 0xff, (by * 91 + 5) & 0xff,
          ((bx ^ by) * 53) & 0xff))),
      useLz77 = false), "cross-color")
  }

  test("the full cwebp shape round-trips: sub-green + predictor + cross-color + cache + LZ77 + meta groups") {
    val (w, h) = (48, 32)
    val px = testImage(w, h, seed = 41L)
    roundTrip(px, w, h, Plan(
      transforms = Seq(SubGreenTf,
        PredictorTf(2, (bx, by) => (3 * bx + by) % 14),
        ColorTf(3, (bx, by) => ((bx * 19) & 0xff, (by * 11) & 0xff, 7))),
      cacheBits = 4, useLz77 = true, metaBits = 2, metaGroups = 3),
      "full combo")
    // transform order matters (inverses apply in reverse): flip it
    roundTrip(px, w, h, Plan(
      transforms = Seq(PredictorTf(3, (_, _) => 11), SubGreenTf),
      cacheBits = 2, useLz77 = true), "reverse order")
  }

  test("color-indexing transform round-trips: palette sizes across every bundling width") {
    import graft.tools.Vp8lEncoder.ColorIndexTf
    // 2 colors → 8 px/byte, 4 → 4 px/byte, 16 → 2 px/byte, 200 → none;
    // odd widths exercise the partial final bundle
    def paletteImage(w: Int, h: Int, n: Int): Array[Int] =
      Array.tabulate(w * h) { i =>
        val k = (i * 7 + (i / w) * 3) % n
        (0xff << 24) | ((k * 37 % 256) << 16) | ((k * 91 % 256) << 8) |
          (k * 53 % 256)
      }
    for ((n, w, h) <- Seq((2, 10, 4), (4, 13, 5), (16, 7, 9), (200, 23, 11))) {
      roundTrip(paletteImage(w, h, n), w, h,
        Plan(transforms = Seq(ColorIndexTf), useLz77 = false),
        s"palette n=$n")
      // LZ77 over the PACKED image too (what real encoders emit)
      roundTrip(paletteImage(w, h, n), w, h,
        Plan(transforms = Seq(ColorIndexTf), useLz77 = true),
        s"palette+lz77 n=$n")
    }
    // the fixture's gray cells fit a palette: dhash equals the PNG twin
    for (id <- Seq(5L, 21L)) {
      val px = Array.tabulate(ImageDupFixture.W * ImageDupFixture.H) { i =>
        val v = ImageDupFixture.cell(id, (i % ImageDupFixture.W) / 2,
          (i / ImageDupFixture.W) / 2)
        (255 << 24) | (v << 16) | (v << 8) | v
      }
      val palWebp = Vp8lEncoder.encode(px, ImageDupFixture.W,
        ImageDupFixture.H, Plan(transforms = Seq(ColorIndexTf)))
      val got = ImageHash.dhashBands(palWebp)
      val png = ImageHash.dhashBands(ImageDupFixture.png(id))
      assert(got.isDefined && got.get._3.toSeq == png.get._3.toSeq, s"id=$id")
    }
  }

  test("fixture twins through the REAL backref+predictor path hash identically to PNG siblings") {
    for (id <- Seq(5L, 13L, 21L, 29L)) {
      val px = Array.tabulate(ImageDupFixture.W * ImageDupFixture.H) { i =>
        val v = ImageDupFixture.cell(id, (i % ImageDupFixture.W) / 2,
          (i / ImageDupFixture.W) / 2)
        (255 << 24) | (v << 16) | (v << 8) | v
      }
      val realWebp = Vp8lEncoder.encode(px, ImageDupFixture.W,
        ImageDupFixture.H, Plan(
          transforms = Seq(SubGreenTf, PredictorTf(2, (_, _) => 2)),
          cacheBits = 3, useLz77 = true))
      val webp = ImageHash.dhashBands(realWebp)
      val png = ImageHash.dhashBands(ImageDupFixture.png(id))
      assert(webp.isDefined && png.isDefined, s"id=$id")
      assert(webp.get._3.toSeq == png.get._3.toSeq, s"id=$id bands")
      assert((webp.get._1, webp.get._2) == (png.get._1, png.get._2), s"id=$id dims")
    }
  }

  test("plane-code distance table: 120 distinct near-pixel codes with the spec anchors") {
    assert(Vp8l.PlaneCodes.length == 120)
    assert(Vp8l.PlaneCodes.distinct.length == 120)
    val w = 100
    assert(Vp8l.planeDist(1, w) == w)      // directly above
    assert(Vp8l.planeDist(2, w) == 1)      // left
    assert(Vp8l.planeDist(3, w) == w + 1)  // above-left
    assert(Vp8l.planeDist(4, w) == w - 1)  // above-right
    // every near code addresses a pixel within 8 rows/columns
    for (k <- 1 to 120) {
      val d = Vp8l.PlaneCodes(k - 1)
      assert((d >> 4) <= 7 && (8 - (d & 0xf)) >= -7, s"code $k")
      assert(Vp8l.planeDist(k, w) >= 1, s"code $k dist")
    }
    assert(Vp8l.planeDist(121, w) == 1)    // scan-line distances
    assert(Vp8l.planeDist(320, w) == 200)
  }

  test("vp8l tolerance: lossy stubs, truncation, bit flips and fuzz never throw") {
    // a VP8 (lossy) container is never claimed by the LOSSLESS
    // decoder — that class belongs to graft.ops.Vp8
    assert(Vp8l.decode(ImageDupFixture.vp8LossyStub(7L)).isEmpty)
    assert(Vp8l.decode(ImageDupFixture.vp8(7L)).isEmpty)
    assert(Vp8l.decode(null).isEmpty)
    assert(Vp8l.decode(Array.emptyByteArray).isEmpty)
    val good = ImageDupFixture.webp(5L)
    // truncations at every framing boundary claim nothing
    for (cut <- Seq(4, 12, 19, 21, 40, good.length - 3))
      assert(Vp8l.decode(good.take(cut)).isEmpty, s"cut=$cut")
    // random fuzz + seeded bit flips: total, never a throw — over the
    // fixture stream AND a real-path stream carrying every feature
    // (transforms, cache, LZ77, meta groups)
    val combo = graft.tools.Vp8lEncoder.encode(
      testImage(48, 32, seed = 41L), 48, 32, graft.tools.Vp8lEncoder.Plan(
        transforms = Seq(SubGreenTf,
          PredictorTf(2, (bx, by) => (3 * bx + by) % 14),
          ColorTf(3, (bx, by) => ((bx * 19) & 0xff, (by * 11) & 0xff, 7))),
        cacheBits = 4, useLz77 = true, metaBits = 2, metaGroups = 3))
    for (cut <- Seq(4, 12, 19, 21, 25, 40, combo.length / 2, combo.length - 3))
      Vp8l.decode(combo.take(cut)) // truncation at any depth: no throw
    val rnd = new scala.util.Random(43)
    for (_ <- 0 until 300) {
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      Vp8l.decode(b)
      for (base <- Seq(good, combo)) {
        val flipped = base.clone()
        flipped(rnd.nextInt(flipped.length)) =
          (flipped(rnd.nextInt(flipped.length)) ^ (1 << rnd.nextInt(8))).toByte
        Vp8l.decode(flipped) // may decode to different pixels, must not throw
      }
    }
  }

  test("decode coverage face: the miss is a queryable number per container") {
    import spark.implicits._
    val ids = (0L until 64L)
    val cov = ImageHash.decodeCoverage(spark,
        ids.map(id => (id, ImageDupFixture.row(id)._1, ImageDupFixture.row(id)._2))
          .toDF("media_id", "mime_type", "media"))
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // 64 ids: %8==3 cut png (8), %32==7 REAL lossy vp8 (2), %32==23
    // broken-vp8 stub (2), %16==15 junk (4), %8==5 vp8l (8), rest
    // intact png (40)
    assert(cov(("image/png", "png")) == ((48L, 40L))) // intact + cut
    assert(cov(("image/webp", "webp-lossless")) == ((8L, 8L)))
    assert(cov(("image/webp", "webp")) == ((4L, 2L))) // real VP8 in, stubs out
    assert(cov(("image/png", "other")) == ((4L, 0L))) // junk rows
  }
}
