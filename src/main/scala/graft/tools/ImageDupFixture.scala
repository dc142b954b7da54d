package graft.tools

/**
 * Deterministic near-duplicate IMAGE fixture for the q_m31/q_m32
 * perceptual-hash family — real 18×16 truecolor PNGs whose IDAT uses
 * zlib's STORED (uncompressed) deflate mode, so the DuckDB oracle can
 * read every pixel byte straight out of the blob hex at a pinned
 * offset while ImageIO performs a genuine PNG decode of the same
 * bytes.
 *
 * Pixel contract (what both the decoder and the oracle see):
 *  - gray truecolor (R = G = B), so Rec.601 luminance is
 *    order-isomorphic to the raw byte value;
 *  - constant 2×2 cells aligned to the 9×8 dHash grid, so the float
 *    cell means compare exactly like the integer cell values
 *    (equal-valued cells compare equal, distinct ones keep their
 *    integer order — no epsilon at the comparison boundary);
 *  - cell value = (g·37 + gy·19 + gx·23) % 251 with g = id/2: the
 *    EVEN id is the base image, the ODD id perturbs exactly ONE cell
 *    (+37 mod 251) — flipping at most the 2 dHash bits that compare
 *    against that cell, a guaranteed near-duplicate pair.
 *
 * Layout per media_id:
 *  - id % 8 == 3 → PNG signature + a cut mid-IHDR: decode fails,
 *                  no hash row.
 *  - id % 8 == 7 → ASCII junk: no row.
 *  - else        → the 948-byte stored-zlib PNG described above.
 *
 * Usage: runMain graft.tools.ImageDupFixture [outFile] [rows]
 * (default fixtures/imagedup.parquet, 500 rows)
 */
object ImageDupFixture {

  val W = 18
  val H = 16
  val GridW = 9
  val GridH = 8

  /** The 2×2-constant cell value — multiplicatively scrambled so
   * different base images hash FAR apart (a linear gradient would
   * make most dHash bits constant across every image and the pair
   * face degenerate); the oracle never replicates this arithmetic,
   * it reads the pixel bytes. */
  def cell(id: Long, gx: Int, gy: Int): Int = {
    val g = id / 2
    // splitmix64 finalizer: full avalanche, so adjacent cells compare
    // effectively at random (a weaker scramble leaves the adjacent
    // difference nearly constant and every image hashes alike)
    var h = g * 1000003L + gy * 101L + gx * 13L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^= h >>> 31
    val base = ((h & 0x7fffffffL) % 251).toInt
    val (pgx, pgy) = ((g % 9).toInt, (g % 8).toInt)
    if (id % 2 == 1 && gx == pgx && gy == pgy) ((base + 37) % 251)
    else base
  }

  private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val len = data.length
    out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
      (len >>> 8).toByte, len.toByte))
    val tb = ctype.getBytes("US-ASCII")
    out.write(tb); out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    val c = crc.getValue
    out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
      (c >>> 8).toByte, c.toByte))
    out.toByteArray
  }

  /** Raw scanlines: per row a 0 filter byte + W×3 RGB bytes. */
  def scanlines(id: Long): Array[Byte] = {
    val out = new Array[Byte]((1 + W * 3) * H)
    var y = 0
    while (y < H) {
      val base = y * (1 + W * 3)
      out(base) = 0 // filter: None
      var x = 0
      while (x < W) {
        val v = cell(id, x / 2, y / 2).toByte
        out(base + 1 + 3 * x) = v
        out(base + 2 + 3 * x) = v
        out(base + 3 + 3 * x) = v
        x += 1
      }
      y += 1
    }
    out
  }

  /** zlib wrapper with ONE stored deflate block: 78 01, block header
   * (BFINAL=1, BTYPE=00), LEN/NLEN little-endian, raw bytes, then the
   * Adler-32 of the raw bytes. */
  def storedZlib(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x78); out.write(0x01)
    out.write(0x01) // BFINAL=1, BTYPE=stored
    out.write(raw.length & 0xff); out.write((raw.length >>> 8) & 0xff)
    out.write(~raw.length & 0xff); out.write((~raw.length >>> 8) & 0xff)
    out.write(raw)
    val ad = new java.util.zip.Adler32()
    ad.update(raw)
    val a = ad.getValue
    out.write(Array[Byte]((a >>> 24).toByte, (a >>> 16).toByte,
      (a >>> 8).toByte, a.toByte))
    out.toByteArray
  }

  def png(id: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = new Array[Byte](13)
    ihdr(0) = (W >>> 24).toByte; ihdr(1) = (W >>> 16).toByte
    ihdr(2) = (W >>> 8).toByte; ihdr(3) = W.toByte
    ihdr(4) = (H >>> 24).toByte; ihdr(5) = (H >>> 16).toByte
    ihdr(6) = (H >>> 8).toByte; ihdr(7) = H.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    // compression 0, filter 0, interlace 0 already zeroed
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", storedZlib(scanlines(id))))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  def row(id: Long): (String, Array[Byte]) = {
    val b =
      if (id % 8 == 3) png(id).take(20) // cut mid-IHDR: decode fails
      else if (id % 8 == 7)
        s"plain junk $id with no png signature".getBytes("US-ASCII")
      else png(id)
    ("image/png", b)
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("fixtures/imagedup.parquet")
    val rows = args.lift(1).map(_.toInt).getOrElse(500)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("imagedup-fixture")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val df = (0L until rows.toLong).map { id =>
      val (mime, bytes) = row(id)
      (id, mime, bytes)
    }.toDF("media_id", "mime_type", "media")
    FixtureIo.writeSingleParquet(df, out, rows.toLong)
    spark.stop()
  }
}
