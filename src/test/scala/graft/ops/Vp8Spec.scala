package graft.ops

import graft.SparkSpec

/** Ground-truth pin for the VP8 (lossy WebP) decoder.
 *
 * fixtures/vp8.parquet (tools/vp8_groundtruth.py) holds real VP8
 * keyframe streams — libwebp-encoded sweeps over gradient / noise /
 * checker / edge / color-bar content at qualities 10..90 and odd
 * sizes down to 1x1, plus a stream from the CPython test suite that
 * this repo's fixture generator did NOT encode — together with the
 * Y/U/V planes the reference libwebp decoder produces for each.
 * The in-repo decoder must match those planes BYTE-EXACTLY: any
 * wrong probability-table entry, dequant factor, predictor formula
 * or loop-filter tap desynchronizes the arithmetic decoder or the
 * reconstruction and shows up as a diff here.
 */
class Vp8Spec extends SparkSpec {

  private def fixturePath: String = {
    val local = new java.io.File("fixtures/vp8.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/vp8.parquet"
  }

  private lazy val cases: Seq[(String, Int, Int, Array[Byte], Array[Byte], Array[Byte], Array[Byte])] = {
    val rows = spark.read.parquet(fixturePath).collect()
    rows.toSeq.map { r =>
      (r.getAs[String]("name"), r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Array[Byte]]("webp"), r.getAs[Array[Byte]]("y_plane"),
        r.getAs[Array[Byte]]("u_plane"), r.getAs[Array[Byte]]("v_plane"))
    }
  }

  private def diffStat(name: String, plane: String, got: Array[Byte], want: Array[Byte]): String = {
    if (got.length != want.length)
      return s"$name/$plane length ${got.length} != ${want.length}"
    var n = 0; var first = -1; var maxd = 0
    var i = 0
    while (i < got.length) {
      if (got(i) != want(i)) {
        n += 1
        if (first < 0) first = i
        val d = math.abs((got(i) & 0xff) - (want(i) & 0xff))
        if (d > maxd) maxd = d
      }
      i += 1
    }
    if (n == 0) ""
    else s"$name/$plane: $n/${got.length} bytes differ, first at $first " +
      s"(got ${got(first) & 0xff} want ${want(first) & 0xff}), maxdiff $maxd"
  }

  test("every fixture stream decodes to libwebp's exact Y/U/V planes") {
    assert(cases.nonEmpty)
    val failures = cases.flatMap { case (name, w, h, webp, ey, eu, ev) =>
      Vp8.decodeYuv(webp) match {
        case None => Seq(s"$name: did not decode")
        case Some(f) =>
          val dims = if (f.width != w || f.height != h)
            Seq(s"$name: dims ${f.width}x${f.height} != ${w}x$h") else Nil
          dims ++ Seq(
            diffStat(name, "y", f.y, ey),
            diffStat(name, "u", f.u, eu),
            diffStat(name, "v", f.v, ev)).filter(_.nonEmpty)
      }
    }
    assert(failures.isEmpty, failures.take(20).mkString("\n", "\n", ""))
  }

  test("decodeImage: gray luma maps to equal RGB channels (full-range identity)") {
    // flat_16x16 is a gray image: u=v=128 everywhere after encode,
    // so the BufferedImage must be exactly (y,y,y) per pixel.
    val (_, w, h, webp, ey, _, _) = cases.find(_._1 == "flat_16x16_q75").get
    val img = Vp8.decodeImage(webp).get
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val yy = ey(y * w + x) & 0xff
      assert(rgb == ((0xff << 24) | (yy << 16) | (yy << 8) | yy), s"($x,$y)")
    }
  }

  test("tolerance: junk, truncated and non-keyframe bytes claim nothing") {
    assert(Vp8.decodeYuv("not a riff at all, definitely".getBytes("US-ASCII")).isEmpty)
    assert(Vp8.decodeYuv(Array[Byte]()).isEmpty)
    val (_, _, _, webp, _, _, _) = cases.head
    assert(Vp8.decodeYuv(webp.take(16)).isEmpty)      // header cut mid-chunk
    val flipped = webp.clone
    flipped(20) = (flipped(20) | 1).toByte            // set interframe bit
    assert(Vp8.decodeYuv(flipped).isEmpty)
  }
}
