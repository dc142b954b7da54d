package graft.ops

import graft.SparkSpec
import graft.tools.ImageDupFixture

class ImageHashSpec extends SparkSpec {

  /** Contract-side bands: the same integer cell comparisons the
   * DuckDB oracle runs over the raw bytes. */
  private def contractBands(id: Long): Array[Int] = {
    val bands = new Array[Int](4)
    for (gy <- 0 until 8; gx <- 0 until 8) {
      if (ImageDupFixture.cell(id, gx + 1, gy) > ImageDupFixture.cell(id, gx, gy)) {
        val i = gy * 8 + gx
        bands(i / 16) |= 1 << (i % 16)
      }
    }
    bands
  }

  test("dhash: the REAL ImageIO decode reproduces the pixel contract exactly") {
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L, 12L, 13L)) {
      val got = ImageHash.dhashBands(ImageDupFixture.row(id)._2)
      assert(got.isDefined, s"id=$id did not decode")
      val (w, h, bands) = got.get
      assert(w == 18 && h == 16, s"id=$id dims")
      assert(bands.toSeq == contractBands(id).toSeq, s"id=$id bands")
    }
    // the real lossy-VP8 twin decodes to the SAME bands at 2x scale
    val vp8 = ImageHash.dhashBands(ImageDupFixture.row(7L)._2)
    assert(vp8.isDefined && (vp8.get._1, vp8.get._2) == ((36, 32)))
    assert(vp8.get._3.toSeq == contractBands(7L).toSeq)
    // truncated, broken-vp8 and junk rows claim nothing
    assert(ImageHash.dhashBands(ImageDupFixture.row(3L)._2).isEmpty)
    assert(ImageHash.dhashBands(ImageDupFixture.row(23L)._2).isEmpty)
    assert(ImageHash.dhashBands(null).isEmpty)
  }

  test("dhash: a 2x upscale + PNG re-encode keeps the hash — brightness order survives") {
    val orig = ImageDupFixture.png(4L)
    val img = Multimodal.MediaCodec.decodeImage(orig).get
    val big = new java.awt.image.BufferedImage(36, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = big.createGraphics()
    g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
    g2.drawImage(img, 0, 0, 36, 32, null)
    g2.dispose()
    val rescaled = Multimodal.MediaCodec.encodePng(big)
    assert(ImageHash.dhashBands(rescaled).map(_._3.toSeq) ==
      ImageHash.dhashBands(orig).map(_._3.toSeq))
  }

  test("near-dup pairs: every surviving even/odd perturbed pair is found, hamming <= 2") {
    import spark.implicits._
    val ids = (0L until 32L)
    val hashes = ImageHash.dhashTable(spark,
      ids.map(id => (id, ImageDupFixture.row(id)._1, ImageDupFixture.row(id)._2))
        .toDF("media_id", "mime_type", "media"))
    val present = hashes.select("media_id").as[Long].collect().toSet
    // decodable: everything except cut PNGs (%8==3), the broken-VP8
    // stub (%32==23) and ASCII junk (%16==15); the REAL lossy-VP8
    // twin (%32==7) decodes through graft.ops.Vp8 and joins the table
    assert(present == ids.filter(id =>
      id % 8 != 3 && id % 32 != 23 && id % 16 != 15).toSet)
    val pairs = ImageHash.nearDupPairs(hashes)
      .as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    for (g <- 0L until 16L
         if present(2 * g) && present(2 * g + 1)) {
      val h = pairs.get((2 * g, 2 * g + 1))
      assert(h.isDefined, s"pair g=$g missing")
      assert(h.get <= 2, s"pair g=$g hamming=${h.get}")
    }
  }
}
