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

  test("vp8l tolerance: lossy stubs, truncation, bit flips and fuzz never throw") {
    // the lossy-VP8 container is NOT claimed (no lossy decoder here)
    assert(Vp8l.decode(ImageDupFixture.vp8LossyStub(7L)).isEmpty)
    assert(Vp8l.decode(null).isEmpty)
    assert(Vp8l.decode(Array.emptyByteArray).isEmpty)
    val good = ImageDupFixture.webp(5L)
    // truncations at every framing boundary claim nothing
    for (cut <- Seq(4, 12, 19, 21, 40, good.length - 3))
      assert(Vp8l.decode(good.take(cut)).isEmpty, s"cut=$cut")
    // random fuzz + seeded bit flips: total, never a throw
    val rnd = new scala.util.Random(43)
    for (_ <- 0 until 300) {
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      Vp8l.decode(b)
      val flipped = good.clone()
      flipped(rnd.nextInt(flipped.length)) =
        (flipped(rnd.nextInt(flipped.length)) ^ (1 << rnd.nextInt(8))).toByte
      Vp8l.decode(flipped) // may decode to different pixels, must not throw
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
    // 64 ids: %8==3 cut png (8), %16==7 lossy webp (4), %16==15 junk
    // (4), %8==5 vp8l (8), rest intact png (40)
    assert(cov(("image/png", "png")) == ((48L, 40L))) // intact + cut
    assert(cov(("image/webp", "webp-lossless")) == ((8L, 8L)))
    assert(cov(("image/webp", "webp")) == ((4L, 0L))) // the lossy miss
    assert(cov(("image/png", "other")) == ((4L, 0L))) // junk rows
  }
}
