package graft.ops

import graft.SparkSpec

/**
 * Animated-GIF PIXEL path ([[Multimodal.gifLzwDecode]] /
 * [[Multimodal.gifFrameHashes]]): the fixture build already pins the
 * whole walk against ImageIO-encoded data (incl. interlace and all
 * four disposal modes); this spec adds a SECOND independent encode
 * direction — a naive clear-heavy LZW writer emitting one code per
 * pixel — which gives exact pixel control for the cases the encoder
 * never produces: transparency skip, hand-built interlace,
 * structural corruption.
 */
class GifPixelSpec extends SparkSpec {

  /** Naive GIF-LZW encode at min-code-size 8: a clear code, then
   * every index as its own literal code (a clear re-issued every 200
   * codes keeps the width at 9 bits), then the end code — valid,
   * maximally dumb LZW. */
  private def naiveLzw(indices: Array[Byte]): Array[Byte] = {
    val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var buf = 0L
    var n = 0
    def put(code: Int): Unit = {
      buf |= code.toLong << n
      n += 9
      while (n >= 8) { bytes += (buf & 0xff).toByte; buf >>>= 8; n -= 8 }
    }
    put(256)
    var cnt = 0
    indices.foreach { b =>
      if (cnt == 200) { put(256); cnt = 0 }
      put(b & 0xff)
      cnt += 1
    }
    put(257)
    if (n > 0) bytes += (buf & 0xff).toByte
    bytes.toArray
  }

  /** Wrap raw LZW bytes as min-code byte + sub-block chain. */
  private def subBlocks(data: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out += 8 // min code size
    data.grouped(255).foreach { g => out += g.length.toByte; out ++= g }
    out += 0
    out.toArray
  }

  private def le16(v: Int): Array[Byte] = Array[Byte](v.toByte, (v >> 8).toByte)

  /** Hand-assembled GIF89a: canvas w×h, 4-color GCT padded to 256
   * entries (black, white, red, green, rest black), frames of
   * (x, y, w, h, disposal, transparentIdx, interlacedFlag, indices
   * in STORAGE order). */
  private def gif(cw: Int, ch: Int,
      frames: Seq[(Int, Int, Int, Int, Int, Int, Boolean, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(cw)); out.write(le16(ch))
    out.write(0x80 | 7); out.write(0); out.write(0) // GCT, 256 entries
    val pal = new Array[Byte](256 * 3)
    def set(i: Int, r: Int, g: Int, b: Int): Unit = {
      pal(3 * i) = r.toByte; pal(3 * i + 1) = g.toByte; pal(3 * i + 2) = b.toByte
    }
    set(1, 255, 255, 255); set(2, 255, 0, 0); set(3, 0, 255, 0)
    out.write(pal)
    frames.foreach { case (x, y, w, h, disp, transp, inter, idx) =>
      out.write(Array[Byte](0x21, 0xF9.toByte, 4))
      out.write((disp << 2) | (if (transp >= 0) 1 else 0))
      out.write(le16(0)); out.write(math.max(transp, 0)); out.write(0)
      out.write(0x2C)
      out.write(le16(x)); out.write(le16(y)); out.write(le16(w)); out.write(le16(h))
      out.write(if (inter) 0x40 else 0)
      out.write(subBlocks(naiveLzw(idx)))
    }
    out.write(0x3B)
    out.toByteArray
  }

  private def hashOf(canvas: Array[Int], cw: Int, ch: Int): String = {
    val img = new java.awt.image.BufferedImage(cw, ch,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, cw, ch, canvas, 0, cw)
    ImageHash.bandsHex(ImageHash.dhashOfImage(img))
  }

  test("interlace row order pins the spec's four passes") {
    assert(Multimodal.gifInterlaceRows(12).toSeq ==
      Seq(0, 8, 4, 2, 6, 10, 1, 3, 5, 7, 9, 11))
    assert(Multimodal.gifInterlaceRows(1).toSeq == Seq(0))
    assert(Multimodal.gifInterlaceRows(5).toSeq == Seq(0, 4, 2, 1, 3))
  }

  test("lzw decode: naive stream round-trips, corrupt streams claim nothing") {
    val idx = Array.tabulate[Byte](500)(i => (i % 4).toByte)
    val packed = subBlocks(naiveLzw(idx))
    assert(Multimodal.gifLzwDecode(packed, 0, 500).map(_.toSeq)
      .contains(idx.toSeq))
    // short data: promised more pixels than the stream carries
    assert(Multimodal.gifLzwDecode(packed, 0, 501).isEmpty)
    // truncated mid-chain
    assert(Multimodal.gifLzwDecode(packed.take(packed.length / 2), 0, 500).isEmpty)
    // garbage min-code
    assert(Multimodal.gifLzwDecode(Array[Byte](1, 2, 0), 0, 4).isEmpty)
  }

  test("transparency skips pixels; disposal 2 restores the rect; disposal 3 restores the canvas") {
    val cw = 8; val ch = 8
    // frame 0: full-canvas white, keep (disposal 1)
    val f0 = (0, 0, 8, 8, 1, -1, false, Array.fill[Byte](64)(1))
    // frame 1: 4x4 at (2,2), red with the top half TRANSPARENT (idx 3
    // declared transparent), restore-to-background (disposal 2) after
    val f1px = Array.tabulate[Byte](16)(i => if (i < 8) 3 else 2)
    val f1 = (2, 2, 4, 4, 2, 3, false, f1px)
    // frame 2: full-canvas green, restore-to-previous (disposal 3)
    val f2 = (0, 0, 8, 8, 3, -1, false, Array.fill[Byte](64)(3))
    // frame 3: single white row at top — composes over frame 2's
    // RESTORED state (white canvas with the black disposal-2 hole)
    val f3 = (0, 0, 8, 1, 0, -1, false, Array.fill[Byte](8)(1))
    val b = gif(cw, ch, Seq(f0, f1, f2, f3))
    val got = Multimodal.gifFrameHashes(b)
    // reference composite, hand-maintained
    val white = 0xFFFFFF; val red = 0xFF0000; val green = 0x00FF00
    val c0 = Array.fill(64)(white)
    val c1 = c0.clone() // top half of the 4x4 rect transparent: only rows 4-5 red
    for (y <- 4 to 5; x <- 2 to 5) c1(y * 8 + x) = red
    val c2 = Array.fill(64)(green)
    val c3 = c1.clone() // frame 1's disposal-2 rect back to black
    for (y <- 2 to 5; x <- 2 to 5) c3(y * 8 + x) = 0
    // then frame 3 paints the top row white (already white — state pin)
    assert(got.map(_._1) == Seq(0, 1, 2, 3))
    assert(got(0)._2 == hashOf(c0, cw, ch))
    assert(got(1)._2 == hashOf(c1, cw, ch))
    assert(got(2)._2 == hashOf(c2, cw, ch))
    assert(got(3)._2 == hashOf(c3, cw, ch))
  }

  test("hand-built interlaced frame lands rows in natural order") {
    // 8 rows, each row a constant color alternating white/red in
    // NATURAL order; storage order is the interlace permutation
    val natural = Array.tabulate[Byte](64)(i => if ((i / 8) % 2 == 0) 1 else 2)
    val perm = Multimodal.gifInterlaceRows(8)
    val storage = new Array[Byte](64)
    for (sr <- 0 until 8; x <- 0 until 8)
      storage(sr * 8 + x) = natural(perm(sr) * 8 + x)
    val b = gif(8, 8, Seq((0, 0, 8, 8, 0, -1, true, storage)))
    val want = natural.map(i => if (i == 1) 0xFFFFFF else 0xFF0000)
    val got = Multimodal.gifFrameHashes(b)
    assert(got.size == 1 && got.head._2 == hashOf(want, 8, 8))
  }

  test("relational face matches the fixture ground truth end to end") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rows = (0L until 24L).map { id =>
      val (m, b) = graft.tools.GifAnimFixture.row(id); (id, m, b)
    }
    val got = Multimodal.gifFrameHashTable(spark,
        rows.toDF("media_id", "mime_type", "media"))
      .orderBy(col("media_id"), col("frame_idx"))
      .as[(Long, Int, String)].collect().toSeq
    val want = (0L until 24L).flatMap(graft.tools.GifAnimFixture.expectedHashRows)
    assert(got == want)
  }
}
