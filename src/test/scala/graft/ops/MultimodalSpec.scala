package graft.ops

import graft.SparkSpec
import graft.ops.Multimodal.ImageHeaders
import graft.tools.MediaFixture

class MultimodalSpec extends SparkSpec {

  test("PNG IHDR parse: dimensions round-trip through real chunk bytes") {
    val m = ImageHeaders.imageMeta(MediaFixture.png(640, 480))
    assert(m.contains(Multimodal.ImageMeta("png", 640, 480)))
    // spec-max-ish dims survive the signed-int big-endian read
    val big = ImageHeaders.imageMeta(MediaFixture.png(65535, 1))
    assert(big.contains(Multimodal.ImageMeta("png", 65535, 1)))
  }

  test("JPEG SOF parse: baseline, progressive, and COM-shifted segment layouts") {
    assert(ImageHeaders.imageMeta(MediaFixture.jpeg(800, 600))
      .contains(Multimodal.ImageMeta("jpeg", 800, 600)))
    assert(ImageHeaders.imageMeta(MediaFixture.jpeg(320, 240, progressive = true))
      .contains(Multimodal.ImageMeta("jpeg", 320, 240)))
    // a COM segment before the SOF must not confuse the walk
    assert(ImageHeaders.imageMeta(MediaFixture.jpeg(101, 77, comLen = 13))
      .contains(Multimodal.ImageMeta("jpeg", 101, 77)))
  }

  test("unparseable bytes are None, never an exception") {
    assert(ImageHeaders.imageMeta(MediaFixture.truncatedPng()).isEmpty)
    assert(ImageHeaders.imageMeta(MediaFixture.junk(7)).isEmpty)
    assert(ImageHeaders.imageMeta(Array.emptyByteArray).isEmpty)
    assert(ImageHeaders.imageMeta(null).isEmpty)
    // JPEG SOI but garbage after: lost marker sync
    assert(ImageHeaders.imageMeta(Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x01)).isEmpty)
    // JPEG that ends (EOI) before any SOF
    assert(ImageHeaders.imageMeta(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)).isEmpty)
  }

  test("imageMetaTable parses the fixture rows per the generator's ground truth") {
    import spark.implicits._
    val rows = (0L until 64L).map { id =>
      val (mime, bytes) = MediaFixture.row(id)
      (id, mime, bytes)
    }
    val out = Multimodal.imageMetaTable(spark, rows.toDF("media_id", "mime_type", "media"))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    (0L until 64L).foreach { id =>
      val r = out(id)
      if (id % 8 == 3 || id % 8 == 7) {
        assert(r.isNullAt(r.fieldIndex("format")), s"id=$id")
      } else if (id % 4 == 0) {
        assert(r.getAs[String]("format") == "png", s"id=$id")
        assert(r.getAs[Int]("width") == MediaFixture.width(id), s"id=$id")
        assert(r.getAs[Int]("height") == MediaFixture.height(id), s"id=$id")
      } else {
        assert(r.getAs[String]("format") == "jpeg", s"id=$id")
        assert(r.getAs[Int]("width") == MediaFixture.width(id), s"id=$id")
        assert(r.getAs[Int]("height") == MediaFixture.height(id), s"id=$id")
      }
    }
  }
}
