package graft.ops

/**
 * MPEG-1 Layer III constant tables ([[Mp3]]):
 *
 *  - scalefactor-band widths for the three MPEG-1 sampling rates
 *    (long: 22 bands summing to 576; short: 13 bands summing to 192
 *    per window) — each table's sum is unit-pinned, a transcription
 *    error cannot survive the build;
 *  - the scalefac_compress → (slen1, slen2) table and the preflag
 *    pretab;
 *  - Huffman code tables. HONEST SCOPE: the spec's code tables are
 *    empirical constants with no derivation, and this environment
 *    has no reference decoder or known-good bitstream to validate a
 *    transcription against. Tables are therefore GATED: every table
 *    shipped here is unit-verified to be a COMPLETE prefix code
 *    (Kraft sum exactly 1, pairwise prefix-free) — a strong filter
 *    against transcription noise, though it cannot catch an
 *    equal-length code swap — and table ids NOT in [[Mp3Tables.big]]
 *    make the whole frame claim nothing rather than decode silently
 *    wrong. Shipped: 0-3, 5-7, 9 and both count1 tables (all
 *    verified); 8 and 10-31 failed verification of this
 *    transcription and are deliberately absent — the linbits
 *    families are the main gap for real-world streams, visible in
 *    the q_m40 coverage face.
 */
object Mp3Tables {

  /** Long-block scalefactor band WIDTHS per sampling rate. MPEG-1
   * rates (44100, 48000, 32000) plus — round 20 — the MPEG-2 LSF
   * rates (22050, 24000, 16000) and MPEG-2.5 (11025, 12000, 8000).
   * LSF transcription verification (the gate this repo applies to
   * every tabulated constant, documented in the object comment):
   * each table sums to 576, the 16 kHz table is BYTE-IDENTICAL to
   * the 22.05 kHz table and MPEG-2.5's 11025/12000 BOTH reuse the
   * 22.05/16 kHz long table (and the 16 kHz short table) — the
   * band-table aliasing the public reference decoders (libmad,
   * mpg123) encode as #define/row reuse, which cross-checks the
   * transcription — and the 8 kHz table carries the standard's
   * documented odd 2-wide tail. An equal-sum width swap inside one
   * table would survive these checks; the in-repo LSF encoder
   * direction exercises every band end-to-end but shares the
   * table, so that residual risk is declared, not closed. */
  val sfbLong: Map[Int, Array[Int]] = {
    val lsf2205 = Array(6, 6, 6, 6, 6, 6, 8, 10, 12, 14, 16, 20, 24,
      28, 32, 38, 46, 52, 60, 68, 58, 54)
    val lsf24 = Array(6, 6, 6, 6, 6, 6, 8, 10, 12, 14, 16, 18, 22,
      26, 32, 38, 46, 54, 62, 70, 76, 36)
    Map(
      44100 -> Array(4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10, 12, 16, 20, 24,
        28, 34, 42, 50, 54, 76, 158),
      48000 -> Array(4, 4, 4, 4, 4, 4, 6, 6, 6, 8, 10, 12, 16, 18, 22,
        28, 34, 40, 46, 54, 54, 192),
      32000 -> Array(4, 4, 4, 4, 4, 4, 6, 6, 8, 10, 12, 16, 20, 24, 30,
        38, 46, 56, 68, 84, 102, 26),
      22050 -> lsf2205,
      24000 -> lsf24,
      16000 -> lsf2205, // normative: 16 kHz reuses the 22.05 kHz table
      // MPEG-2.5: BOTH low rates reuse the 22.05/16 kHz LONG table
      // (not the 24 kHz one — round-20 review fix, cross-checked
      // against the libmad/mpg123 band-table aliasing), 8 kHz its own
      11025 -> lsf2205,
      12000 -> lsf2205,
      8000 -> Array(12, 12, 12, 12, 12, 12, 16, 20, 24, 28, 32, 40, 48,
        56, 64, 76, 90, 2, 2, 2, 2, 2))
  }

  /** Short-block scalefactor band widths (per window); LSF rates
   * added in round 20 under the same verification gate. */
  val sfbShort: Map[Int, Array[Int]] = {
    val lsf2205 = Array(4, 4, 4, 6, 6, 8, 10, 14, 18, 26, 32, 42, 18)
    val lsf24 = Array(4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 32, 44, 12)
    val lsf16 = Array(4, 4, 4, 6, 8, 10, 12, 14, 18, 24, 30, 40, 18)
    Map(
      44100 -> Array(4, 4, 4, 4, 6, 8, 10, 12, 14, 18, 22, 30, 56),
      48000 -> Array(4, 4, 4, 4, 6, 6, 10, 12, 14, 16, 20, 26, 66),
      32000 -> Array(4, 4, 4, 4, 6, 8, 12, 16, 20, 26, 34, 42, 12),
      22050 -> lsf2205,
      24000 -> lsf24,
      16000 -> lsf16,
      // MPEG-2.5: both low rates reuse the 16 kHz SHORT table (the
      // same review-verified aliasing as the long tables)
      11025 -> lsf16,
      12000 -> lsf16,
      8000 -> Array(8, 8, 8, 12, 16, 20, 24, 28, 36, 2, 2, 2, 26))
  }

  /** scalefac_compress → (slen1, slen2). */
  val slen: Array[(Int, Int)] = Array(
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))

  /** preflag pretab (long sfb 0-20). */
  val pretab: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2)

  /** One big-values Huffman table: dimension (xlen == ylen here),
   * linbits, and row-major (x * dim + y) → (hlen, hcod). */
  final case class Huff(dim: Int, linbits: Int, entries: Array[(Int, Int)]) {
    /** Direct decode LUT at the table's max code length W: index by
     * the next W bits → packed (x << 12 | y << 8 | hlen). */
    lazy val maxLen: Int = entries.map(_._1).max
    lazy val lut: Array[Int] = {
      val t = new Array[Int](1 << maxLen)
      java.util.Arrays.fill(t, -1)
      var i = 0
      while (i < entries.length) {
        val (len, code) = entries(i)
        val x = i / dim
        val y = i % dim
        val base = code << (maxLen - len)
        var j = 0
        while (j < (1 << (maxLen - len))) {
          t(base + j) = (x << 12) | (y << 8) | len
          j += 1
        }
        i += 1
      }
      t
    }
  }

  private def h(dim: Int, linbits: Int, e: (Int, Int)*): Huff =
    Huff(dim, linbits, e.toArray)

  /** Verified big-values tables by table_select id. Table 0 carries
   * no data (all-zero region) and is handled by the caller. */
  val big: Map[Int, Huff] = Map(
    1 -> h(2, 0, (1, 1), (3, 1), (2, 1), (3, 0)),
    2 -> h(3, 0,
      (1, 1), (3, 2), (6, 1),
      (3, 3), (3, 1), (5, 1),
      (5, 3), (5, 2), (6, 0)),
    3 -> h(3, 0,
      (2, 3), (2, 2), (6, 1),
      (3, 1), (2, 1), (5, 1),
      (5, 3), (5, 2), (6, 0)),
    5 -> h(4, 0,
      (1, 1), (3, 2), (6, 6), (7, 5),
      (3, 3), (3, 1), (6, 4), (7, 4),
      (6, 7), (6, 5), (7, 7), (8, 1),
      (7, 6), (6, 1), (7, 1), (8, 0)),
    6 -> h(4, 0,
      (3, 7), (3, 3), (5, 5), (7, 1),
      (3, 6), (2, 2), (4, 3), (5, 2),
      (4, 5), (4, 4), (5, 4), (6, 1),
      (6, 3), (5, 3), (6, 2), (7, 0)),
    7 -> h(6, 0,
      (1, 1), (3, 2), (6, 10), (8, 19), (8, 16), (9, 10),
      (3, 3), (4, 3), (6, 7), (7, 10), (7, 5), (8, 3),
      (6, 11), (5, 4), (7, 13), (8, 17), (8, 8), (9, 4),
      (7, 12), (7, 11), (8, 18), (9, 15), (9, 11), (9, 2),
      (7, 7), (7, 6), (8, 9), (9, 14), (9, 3), (10, 1),
      (8, 6), (8, 4), (9, 5), (10, 3), (10, 2), (10, 0)),
    9 -> h(6, 0,
      (3, 7), (3, 5), (5, 9), (6, 14), (8, 15), (9, 7),
      (3, 6), (3, 4), (4, 5), (5, 5), (6, 6), (8, 7),
      (4, 7), (4, 6), (5, 8), (6, 8), (7, 8), (8, 5),
      (6, 15), (5, 6), (6, 9), (7, 10), (7, 5), (8, 1),
      (7, 11), (6, 7), (7, 9), (7, 6), (8, 4), (9, 1),
      (8, 14), (7, 4), (8, 6), (8, 2), (9, 6), (9, 0)))

  /** count1 table A: quad index v*8+w*4+x*2+y → (hlen, hcod). */
  val count1A: Array[(Int, Int)] = Array(
    (1, 1), (4, 5), (4, 4), (5, 5), (4, 6), (6, 5), (5, 4), (6, 4),
    (4, 7), (5, 3), (5, 6), (6, 0), (5, 7), (6, 2), (6, 3), (6, 1))

  /** count1 table B: every quad in 4 bits, code = ~v. */
  val count1B: Array[(Int, Int)] =
    Array.tabulate(16)(v => (4, 15 - v))

  /** count1 LUTs at width 6 / 4: packed (v<<8 | hlen). */
  private def c1Lut(t: Array[(Int, Int)]): Array[Int] = {
    val w = t.map(_._1).max
    val lut = new Array[Int](1 << w)
    java.util.Arrays.fill(lut, -1)
    t.zipWithIndex.foreach { case ((len, code), v) =>
      val base = code << (w - len)
      (0 until (1 << (w - len))).foreach(j => lut(base + j) = (v << 8) | len)
    }
    lut
  }
  lazy val count1ALut: Array[Int] = c1Lut(count1A)
  lazy val count1BLut: Array[Int] = c1Lut(count1B)
  val count1AMax = 6
  val count1BMax = 4

  /** Alias-reduction butterfly coefficients (ISO 11172-3 2.4.3.4.7). */
  val aliasCi: Array[Double] =
    Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  val aliasCs: Array[Double] = aliasCi.map(c => 1.0 / math.sqrt(1.0 + c * c))
  val aliasCa: Array[Double] = aliasCi.map(c => c / math.sqrt(1.0 + c * c))
}
