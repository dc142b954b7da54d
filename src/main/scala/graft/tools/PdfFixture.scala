package graft.tools

/**
 * Deterministic classic-xref PDF fixture for the q_w18/q_w19 walkers —
 * real `%PDF-1.4` files with `N G obj … endobj` bodies, a 20-byte-entry
 * cross-reference table, a trailer dictionary and `startxref`, built
 * byte-for-byte so the DuckDB oracle re-walks the xref chain
 * independently (startxref hop, fixed-width entry grid, `/Prev` chase).
 *
 * Layout per media_id:
 *  - id % 8 == 3 → well-formed body but `startxref` points past the
 *                  file end: no xref is readable, the walker emits
 *                  nothing.
 *  - id % 8 == 7 → ASCII junk, no %PDF magic: no rows.
 *  - id % 4 == 1 → INCREMENTAL UPDATE: the original file plus an
 *                  appended generation-1 rewrite of the first page
 *                  object and a second xref section whose trailer
 *                  `/Prev` points at the original table — the walker
 *                  must walk the chain (section 0 = latest) and the
 *                  q_w19 resolution must prefer section 0's entry.
 *  - else        → a single-section file: catalog, page tree,
 *                  1 + id%4 page objects each with a content stream,
 *                  one xref subsection covering all objects.
 *
 * Every section uses ONE subsection (`0 N` / `start count`) — small
 * real PDFs do; multi-subsection tables are exercised by unit tests
 * on synthetic bytes (the walker handles them; the oracle contract
 * only needs the fixture's shape). All bytes are 7-bit ASCII so the
 * oracle's blob→VARCHAR decode is total.
 *
 * Usage: runMain graft.tools.PdfFixture [outFile] [rows]
 * (default fixtures/pdf.parquet, 500 rows)
 */
object PdfFixture {

  def nPages(id: Long): Int = 1 + (id % 4).toInt

  /** Object bodies of the base file, in object-number order starting
   * at 1: catalog, pages node, then per page (page object, content
   * stream). Content text is deterministic and never contains
   * `endobj`/`stream` tokens. */
  def objects(id: Long): Seq[String] = {
    val k = nPages(id)
    val kids = (0 until k).map(p => s"${3 + 2 * p} 0 R").mkString(" ")
    val catalog = "<< /Type /Catalog /Pages 2 0 R >>"
    val pages = s"<< /Type /Pages /Kids [ $kids ] /Count $k >>"
    val perPage = (0 until k).flatMap { p =>
      val contentNum = 4 + 2 * p
      val text = s"BT (doc $id page $p) Tj ET"
      Seq(
        s"<< /Type /Page /Parent 2 0 R /Contents $contentNum 0 R >>",
        s"<< /Length ${text.length} >>\nstream\n$text\nendstream")
    }
    (catalog +: pages +: perPage)
  }

  /** One serialized indirect object. */
  def obj(num: Int, gen: Int, body: String): String =
    s"$num $gen obj\n$body\nendobj\n"

  /** A 20-byte xref entry: 10-digit offset, 5-digit gen, n/f, ` \n`. */
  def entry(off: Long, gen: Int, inUse: Boolean): String =
    f"$off%010d $gen%05d ${if (inUse) "n" else "f"} \n"

  /** The base single-section file and the byte offset of each object
   * (index 0 = object number 1). */
  def base(id: Long): (String, Seq[Long]) = {
    val head = "%PDF-1.4\n"
    val bodies = objects(id)
    val offs = bodies.zipWithIndex.scanLeft(head.length.toLong) {
      case (o, (b, i)) => o + obj(i + 1, 0, b).length
    }.dropRight(1)
    val body = bodies.zipWithIndex.map { case (b, i) => obj(i + 1, 0, b) }.mkString
    val xrefOff = head.length + body.length
    val n = bodies.size + 1
    val xref = s"xref\n0 $n\n" + entry(0, 65535, inUse = false) +
      offs.map(o => entry(o, 0, inUse = true)).mkString +
      s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n"
    (head + body + xref, offs)
  }

  /** The incremental update appended for id%4==1: object 3 rewritten
   * at generation 1, a single-subsection xref `3 1` and a trailer
   * whose /Prev points at the base table. */
  def withUpdate(id: Long): String = {
    val (orig, _) = base(id)
    val baseXrefOff = orig.indexOf("xref\n").toLong
    val newBody = s"<< /Type /Page /Parent 2 0 R /Rev $id >>"
    val updObj = obj(3, 1, newBody)
    val updOff = orig.length.toLong
    val xrefOff = updOff + updObj.length
    val n = objects(id).size + 1
    orig + updObj + s"xref\n3 1\n" + entry(updOff, 1, inUse = true) +
      s"trailer\n<< /Size $n /Root 1 0 R /Prev $baseXrefOff >>\nstartxref\n$xrefOff\n%%EOF\n"
  }

  /** startxref points 64 bytes past the end: nothing is walkable. */
  def badStart(id: Long): String = {
    val (orig, _) = base(id)
    val cut = orig.lastIndexOf("startxref\n")
    orig.substring(0, cut) + s"startxref\n${orig.length + 64}\n%%EOF\n"
  }

  def row(id: Long): (String, Array[Byte]) = {
    val s =
      if (id % 8 == 3) badStart(id)
      else if (id % 8 == 7) s"plain junk $id with no pdf framing at all\n"
      else if (id % 4 == 1) withUpdate(id)
      else base(id)._1
    ("application/pdf", s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("fixtures/pdf.parquet")
    val rows = args.lift(1).map(_.toInt).getOrElse(500)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("pdf-fixture")
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
