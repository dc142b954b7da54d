package graft.ops

import graft.SparkSpec

/** Ground-truth pin for the ALPH (alpha plane) decode of lossy WebP.
 *
 * fixtures/vp8alpha.parquet (tools/vp8_alpha_groundtruth.py) holds
 * real VP8X+ALPH+VP8 files — libwebp-encoded RGBA sweeps (gradient /
 * noise / mask / flat alpha, the default headerless-VP8L alpha
 * compression), crafted raw-compression chunks covering all three
 * filter methods (libwebp-confirmed), and the third-party CPython
 * python.webp — each with the reference decoder's exact alpha plane.
 * The alpha path is lossless, so decodeAlpha must match BYTE-EXACT.
 */
class Vp8AlphaSpec extends SparkSpec {

  private def fixturePath: String = {
    val local = new java.io.File("fixtures/vp8alpha.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/vp8alpha.parquet"
  }

  private lazy val cases: Seq[(String, Int, Int, Array[Byte], Array[Byte])] =
    spark.read.parquet(fixturePath).collect().toSeq.map { r =>
      (r.getAs[String]("name"), r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Array[Byte]]("webp"), r.getAs[Array[Byte]]("alpha"))
    }

  test("every fixture alpha plane decodes byte-exact against libwebp") {
    assert(cases.nonEmpty)
    val failures = cases.flatMap { case (name, w, h, webp, want) =>
      Vp8.decodeAlpha(webp, w, h) match {
        case None => Seq(s"$name: alpha did not decode")
        case Some(got) =>
          if (got.length != want.length) Seq(s"$name: length ${got.length} != ${want.length}")
          else {
            val n = got.indices.count(i => got(i) != want(i))
            if (n == 0) Nil
            else {
              val first = got.indices.find(i => got(i) != want(i)).get
              Seq(s"$name: $n/${got.length} bytes differ, first at $first " +
                s"(got ${got(first) & 0xff} want ${want(first) & 0xff})")
            }
          }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }

  test("decodeImage carries alpha: ARGB type, exact A channel, opaque files stay RGB") {
    val (_, w, h, webp, want) = cases.find(_._1.startsWith("amask")).get
    val img = Vp8.decodeImage(webp).get
    assert(img.getType == java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w)
      assert(((img.getRGB(x, y) >>> 24) & 0xff) == (want(y * w + x) & 0xff), s"($x,$y)")
    // a plain lossy file (no ALPH) stays RGB
    val plain = spark.read.parquet(new java.io.File("fixtures/vp8.parquet").getAbsolutePath)
      .collect().find(_.getAs[String]("name") == "flat_16x16_q75").get
      .getAs[Array[Byte]]("webp")
    assert(Vp8.decodeImage(plain).get.getType == java.awt.image.BufferedImage.TYPE_INT_RGB)
  }

  test("alpha tolerance: preprocessing, bad compression and truncation claim nothing") {
    val (_, w, h, webp, _) = cases.head
    // flip the preprocessing bits in the ALPH header byte
    def alphAt(b: Array[Byte]): Int = {
      var o = 12
      while (o + 8 <= b.length) {
        val sz = (b(o + 4) & 0xff) | ((b(o + 5) & 0xff) << 8) |
          ((b(o + 6) & 0xff) << 16) | ((b(o + 7) & 0xff) << 24)
        if (b(o) == 'A' && b(o + 1) == 'L' && b(o + 2) == 'P' && b(o + 3) == 'H')
          return o + 8
        o += 8 + sz + (sz & 1)
      }
      -1
    }
    val i = alphAt(webp)
    assert(i > 0)
    val pre = webp.clone
    pre(i) = (pre(i) | 0x10).toByte // preprocessing = 1: claim nothing
    assert(Vp8.decodeAlpha(pre, w, h).isEmpty)
    val badComp = webp.clone
    badComp(i) = ((badComp(i) & ~3) | 2).toByte // reserved compression
    assert(Vp8.decodeAlpha(badComp, w, h).isEmpty)
    assert(Vp8.decodeAlpha(webp.take(i + 4), w, h).isEmpty)
    val rnd = new scala.util.Random(59)
    for (_ <- 0 until 100) {
      val flipped = webp.clone()
      flipped(rnd.nextInt(flipped.length)) =
        (flipped(rnd.nextInt(flipped.length)) ^ (1 << rnd.nextInt(8))).toByte
      Vp8.decodeAlpha(flipped, w, h) // total, never a throw
      Vp8.decodeImage(flipped)
    }
  }
}
