package graft.ops

import graft.SparkSpec
import graft.tools.{AnimWebpFixture, ImageDupFixture}

/** Unit pins for the animated-WebP walk (q_m35) and its
 * frame-sampling face. */
class AnimWebpSpec extends SparkSpec {

  test("anmf walk: geometry, timing, flags and codecs match the fixture contract") {
    val id = 10L // clean class, 1 + 10%4 = 3 frames
    val bytes = AnimWebpFixture.animated(id)
    val frames = Multimodal.webpAnmfFrames(bytes)
    assert(frames.size == 3)
    for ((f, k) <- frames.zipWithIndex) {
      assert(f.idx == k)
      assert(f.x == 2 * ((k * 3) % 10) && f.y == 2 * (k % 7), s"k=$k xy")
      val (w, h) = if (k % 2 == 0) (20, 12) else (ImageDupFixture.W, ImageDupFixture.H)
      assert(f.w == w && f.h == h, s"k=$k dims")
      assert(f.durationMs == 40 + 10 * k, s"k=$k dur")
      assert(f.disposeBackground == ((k & 1) != 0), s"k=$k dispose")
      assert(f.noBlend == ((k & 2) != 0), s"k=$k blend")
      assert(!f.hasAlpha)
      assert(f.codec == (if (k % 2 == 0) "vp8" else "vp8l"), s"k=$k codec")
    }
    assert(Multimodal.webpAnimCanvas(bytes).contains(
      (AnimWebpFixture.CanvasW, AnimWebpFixture.CanvasH, (id % 3).toInt)))
  }

  test("negative classes: junk, still VP8X and the truncated frame claim nothing extra") {
    assert(Multimodal.webpAnmfFrames("junk not a riff".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.webpAnmfFrames(AnimWebpFixture.still(4L)).isEmpty)
    assert(Multimodal.webpAnimCanvas(AnimWebpFixture.still(4L)).isEmpty)
    // truncated: the cut frame is dropped, earlier frames survive
    val full = AnimWebpFixture.animated(13L) // 1 + 13%4 = 2 frames
    val cut = full.take(full.length - 10)
    assert(Multimodal.webpAnmfFrames(full).size == 2)
    assert(Multimodal.webpAnmfFrames(cut).size == 1)
    // fuzz: total, never a throw
    val rnd = new scala.util.Random(53)
    for (_ <- 0 until 200) {
      val flipped = full.clone()
      flipped(rnd.nextInt(flipped.length)) =
        (flipped(rnd.nextInt(flipped.length)) ^ (1 << rnd.nextInt(8))).toByte
      Multimodal.webpAnmfFrames(flipped)
      Multimodal.webpAnimCanvas(flipped)
    }
  }

  test("rewrapped frame chunks decode: the vp8 frame yields its exact cell grid") {
    val id = 10L
    val bytes = AnimWebpFixture.animated(id)
    val frames = Multimodal.webpAnmfFrames(bytes)
    for (f <- frames) {
      val standalone = Multimodal.webpFrameFile(bytes, f)
      val img = Multimodal.MediaCodec.decodeImage(standalone)
      assert(img.isDefined, s"frame ${f.idx} did not decode")
      assert(img.get.getWidth == f.w && img.get.getHeight == f.h, s"frame ${f.idx}")
    }
    // the lossy frame's pixels are the DC-exact cells
    val f0 = frames(0)
    val yuv = Vp8.decodeYuv(Multimodal.webpFrameFile(bytes, f0)).get
    for (y <- 0 until 12; x <- 0 until 20)
      assert((yuv.y(y * 20 + x) & 0xff) ==
        (ImageDupFixture.cell(id, x / 4, y / 4) + 0) % 256, s"($x,$y)")
  }

  test("frameSample emits decodable standalone webps for animated-webp rows") {
    import spark.implicits._
    // 10: clean animation (3 frames); 18: truncated (3 frames cut to
    // 2); 4: still VP8X — no animation frames, so it takes the
    // undecoded byte-chunk fallback like any unknown format
    val rows = Seq(10L, 18L, 4L).map { id =>
      val (mime, bytes) = AnimWebpFixture.row(id)
      (id, mime, bytes)
    }
    val frames = Multimodal.frameSample(spark,
      rows.toDF("media_id", "mime_type", "media"), everyN = 1).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(10L).length == 3 && byId(18L).length == 2)
    assert(byId(4L).forall(!_.decoded))
    for (f <- frames if f.media_id != 4L) {
      assert(f.decoded)
      assert(Multimodal.MediaCodec.decodeImage(f.frame).isDefined,
        s"media ${f.media_id} frame ${f.frame_idx}")
    }
  }
}
