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

  test("exif-oriented twins: rotate-before-hash recovers the upright bands (PNG eXIf)") {
    // id%32==17, orientations 3 / 6 / 8 cycling by id/32
    for (id <- Seq(17L, 49L, 81L)) {
      val bytes = ImageDupFixture.row(id)._2
      val o = ImageDupFixture.exifOrientation(id)
      assert(Multimodal.MediaCodec.exifOrientation(bytes) == o, s"id=$id tag")
      val got = ImageHash.dhashBands(bytes)
      assert(got.isDefined, s"id=$id did not decode")
      val (w, h, bands) = got.get
      assert(w == 18 && h == 16, s"id=$id post-orient dims ($w,$h)")
      assert(bands.toSeq == contractBands(id).toSeq, s"id=$id o=$o bands")
      // and WITHOUT the orientation tag the stored image hashes APART
      // (the real-world failure this class exists to catch)
      val stored = Multimodal.MediaCodec.orientImage(
        Multimodal.MediaCodec.decodeImage(bytes).get, 1)
      assert(got.get._3.toSeq == bands.toSeq && {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        o == 3 || img.getWidth != 18 // stored 6/8 shapes are 16x18
      }, s"id=$id stored-shape sanity"); stored.getWidth
    }
  }

  test("orientImage: all 8 TIFF orientations invert on an asymmetric image") {
    // display(x,y) picks a unique source pixel: encode (u,v) in the
    // pixel value and check the documented mapping directly
    val w = 3; val h = 2
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (v <- 0 until h; u <- 0 until w) img.setRGB(u, v, (v * w + u) * 10)
    def at(i: java.awt.image.BufferedImage, x: Int, y: Int) =
      i.getRGB(x, y) & 0xffffff
    val maps: Map[Int, (Int, Int) => (Int, Int)] = Map(
      1 -> ((x, y) => (x, y)), 2 -> ((x, y) => (w - 1 - x, y)),
      3 -> ((x, y) => (w - 1 - x, h - 1 - y)), 4 -> ((x, y) => (x, h - 1 - y)),
      5 -> ((x, y) => (y, x)), 6 -> ((x, y) => (y, h - 1 - x)),
      7 -> ((x, y) => (w - 1 - y, h - 1 - x)), 8 -> ((x, y) => (w - 1 - y, x)))
    for (o <- 1 to 8) {
      val out = Multimodal.MediaCodec.orientImage(img, o)
      val (dw, dh) = if (o >= 5) (h, w) else (w, h)
      assert(out.getWidth == dw && out.getHeight == dh, s"o=$o dims")
      for (y <- 0 until dh; x <- 0 until dw) {
        val (u, v) = maps(o)(x, y)
        assert(at(out, x, y) == (v * w + u) * 10, s"o=$o at ($x,$y)")
      }
    }
  }

  test("real JPEG APP1 orientation is honored by decodeImage") {
    // encode a JPEG, splice an EXIF APP1 orientation=6 after SOI: the
    // oriented decode must equal the exact rotation of the unoriented
    // decode of the SAME bytes (no double-encode noise in the assert)
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 24)
      img.setRGB(x, y, ((x * 11 + y * 29) % 251) * 0x010101)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val plain = bos.toByteArray
    val tiff = Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0, 1, 0,
      0x12, 0x01, 3, 0, 1, 0, 0, 0, 6, 0, 0, 0, 0, 0, 0, 0)
    val app1 = Array[Byte](0xFF.toByte, 0xE1.toByte,
      ((tiff.length + 8 + 2) >> 8).toByte, ((tiff.length + 8 + 2) & 0xff).toByte,
      'E', 'x', 'i', 'f', 0, 0) ++ tiff
    val tagged = plain.take(2) ++ app1 ++ plain.drop(2)
    assert(Multimodal.MediaCodec.exifOrientation(tagged) == 6)
    val oriented = Multimodal.MediaCodec.decodeImage(tagged).get
    val base = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(tagged)) // raw decode, no orient
    assert(oriented.getWidth == 16 && oriented.getHeight == 24)
    for (y <- 0 until 24; x <- 0 until 16)
      assert((oriented.getRGB(x, y) & 0xffffff) ==
        (base.getRGB(y, 16 - 1 - x) & 0xffffff), s"($x,$y)")
  }

  test("WebP EXIF chunk orientation is honored (extended VP8X container)") {
    // rebuild the VP8L twin as an extended container: VP8X + VP8L +
    // EXIF(orientation=8), both bare-TIFF and Exif\0\0-prefixed
    val simple = ImageDupFixture.webp(5L)
    val payloadLen = (simple(16) & 0xff) | ((simple(17) & 0xff) << 8) |
      ((simple(18) & 0xff) << 16) | ((simple(19) & 0xff) << 24)
    val vp8l = java.util.Arrays.copyOfRange(simple, 20, 20 + payloadLen)
    val tiff = Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0, 1, 0,
      0x12, 0x01, 3, 0, 1, 0, 0, 0, 8, 0, 0, 0, 0, 0, 0, 0)
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val n = data.length
      fourcc.getBytes("US-ASCII") ++ Array[Byte]((n & 0xff).toByte,
        ((n >> 8) & 0xff).toByte, ((n >> 16) & 0xff).toByte,
        ((n >> 24) & 0xff).toByte) ++ data ++
        (if ((n & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
    }
    val vp8x = chunk("VP8X", Array[Byte](0x08, 0, 0, 0, // EXIF flag
      17, 0, 0, 15, 0, 0)) // canvas 18x16 minus-one coded
    for (exifPayload <- Seq(tiff, "Exif".getBytes("US-ASCII") ++
        Array[Byte](0, 0) ++ tiff)) {
      val body = vp8x ++ chunk("VP8L", vp8l) ++ chunk("EXIF", exifPayload)
      val n = body.length + 4
      val file = "RIFF".getBytes("US-ASCII") ++ Array[Byte]((n & 0xff).toByte,
        ((n >> 8) & 0xff).toByte, ((n >> 16) & 0xff).toByte,
        ((n >> 24) & 0xff).toByte) ++ "WEBP".getBytes("US-ASCII") ++ body
      assert(Multimodal.MediaCodec.exifOrientation(file) == 8)
      val oriented = Multimodal.MediaCodec.decodeImage(file).get
      assert(oriented.getWidth == 16 && oriented.getHeight == 18)
      val raw = graft.ops.Vp8l.decodeImage(file).get // no orientation
      for (y <- 0 until 18; x <- 0 until 16)
        assert((oriented.getRGB(x, y) & 0xffffff) ==
          (raw.getRGB(18 - 1 - y, x) & 0xffffff), s"($x,$y)")
    }
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
