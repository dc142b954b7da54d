package graft.ops

import graft.SparkSpec
import graft.tools.{ImageDupFixture, Vp8Encoder}

/** Round-trip pins for the fixture VP8 encoder.
 *
 * Conformance chain: tools/vp8_groundtruth.py verified (one-off,
 * libwebp via ctypes) that libwebp decodes the encoder's fixture
 * rows to the exact cell values, and Vp8Spec pins graft.ops.Vp8 to
 * libwebp byte-exactly over 57 real streams — so the in-sbt
 * `encode -> Vp8.decodeYuv == source` pins here are equivalent to a
 * libwebp round-trip, not a self-consistency tautology.
 */
class Vp8EncoderSpec extends SparkSpec {

  private def roundTrip(w: Int, h: Int, luma: (Int, Int) => Int): Unit = {
    val bytes = Vp8Encoder.encode(w, h, luma)
    val f = Vp8.decodeYuv(bytes).getOrElse(fail(s"${w}x$h did not decode"))
    assert(f.width == w && f.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((f.y(y * w + x) & 0xff) == luma(x, y), s"y($x,$y)")
    for (i <- 0 until f.chromaW * f.chromaH) {
      assert((f.u(i) & 0xff) == 128, s"u@$i")
      assert((f.v(i) & 0xff) == 128, s"v@$i")
    }
  }

  test("DC-only 4x4-block sources round-trip exactly (all residual magnitudes)") {
    // full value range incl. residuals beyond every token category
    // boundary (|r| up to ~127 from the 128-ish predictions)
    roundTrip(64, 48, (x, y) => ((x / 4) * 53 + (y / 4) * 31) % 256)
    roundTrip(64, 48, (x, y) => if (((x / 4) + (y / 4)) % 2 == 0) 0 else 255)
    roundTrip(16, 16, (_, _) => 128) // all-skip: zero residual everywhere
    roundTrip(4, 4, (_, _) => 7)
    roundTrip(20, 12, (x, y) => (x / 4 * 16 + y / 4 * 8) % 251) // odd MB pad
  }

  test("fixture twins: vp8(id) hashes identically to the 18x16 PNG sibling") {
    for (id <- Seq(7L, 39L, 71L, 103L, 6L)) { // the fixture class + an even id
      val vp8 = ImageHash.dhashBands(ImageDupFixture.vp8(id))
      val png = ImageHash.dhashBands(ImageDupFixture.png(id))
      assert(vp8.isDefined && png.isDefined, s"id=$id")
      assert(vp8.get._3.toSeq == png.get._3.toSeq, s"id=$id bands")
      assert((vp8.get._1, vp8.get._2) == ((36, 32)), s"id=$id dims")
      assert((png.get._1, png.get._2) == ((18, 16)), s"id=$id png dims")
    }
  }

  test("fixture twins decode to the exact cell grid") {
    val f = Vp8.decodeYuv(ImageDupFixture.vp8(7L)).get
    for (y <- 0 until 32; x <- 0 until 36)
      assert((f.y(y * 36 + x) & 0xff) == ImageDupFixture.cell(7L, x / 4, y / 4),
        s"($x,$y)")
  }

  test("encoded streams survive the decoder's tolerance paths") {
    val good = ImageDupFixture.vp8(7L)
    for (cut <- Seq(4, 12, 19, 21, 25, 40, good.length / 2))
      Vp8.decodeYuv(good.take(cut)) // truncation: no throw
    val rnd = new scala.util.Random(47)
    for (_ <- 0 until 200) {
      val flipped = good.clone()
      flipped(rnd.nextInt(flipped.length)) =
        (flipped(rnd.nextInt(flipped.length)) ^ (1 << rnd.nextInt(8))).toByte
      Vp8.decodeYuv(flipped) // may decode differently, must not throw
    }
  }
}
