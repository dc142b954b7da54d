package graft.tools

/**
 * Deterministic WebVTT/SRT caption fixture, sharing [[AvcMp4Fixture]]'s
 * media_id domain so cue windows can be aligned against that fixture's
 * keyframe time axis (the q_m19 clip-caption pairing). Exercises
 * [[graft.ops.Captions.parseCues]] against true payload text.
 *
 * Layout per media_id (the oracle re-parses the same text in SQL):
 *  - id % 8 == 3 → WEBVTT header + NOTE block only: NO cues.
 *  - id % 8 == 7 → junk prose with no timing lines: NO cues.
 *  - id even     → WebVTT: "WEBVTT" header block, a NOTE block the
 *                  parser must skip (it contains a bare `-->` with no
 *                  timestamps — a non-cue arrow block), then cues —
 *                  odd cues carry an identifier line AND a junk arrow
 *                  line before the timing line (the parser must skip
 *                  past both to the first FULL `ts --> ts` line);
 *                  id % 4 == 0 uses the short mm:ss.mmm time form (no
 *                  hour field).
 *  - id odd      → SRT: numbered cues with comma-decimal times.
 *  - cue windows: nCues = 2 + id%4, start_ms(i) = i·(30 + 10·(id%4)),
 *    end_ms = start_ms + 45 + 5·(id%3) — sized to overlap the first
 *    ~200 ms where AvcMp4Fixture's keyframes live. Odd cues have
 *    two-line text (the parser keeps the newline).
 *  - blocks are joined by exactly ONE blank line, no trailing newline
 *    (so a split on "\n\n" is exact on both engines).
 *
 * Usage: runMain graft.tools.CaptionFixture [outFile] [rows]
 * (default fixtures/captions.parquet, 500 rows)
 */
object CaptionFixture {

  def nCues(id: Long): Int = 2 + (id % 4).toInt
  def startMs(id: Long, i: Int): Long = i.toLong * (30 + 10 * (id % 4))
  def endMs(id: Long, i: Int): Long = startMs(id, i) + 45 + 5 * (id % 3)

  def cueText(id: Long, i: Int): String = {
    val l1 = s"cue $id $i alpha${(id + i) % 10}"
    if (i % 2 == 1) l1 + "\n" + s"beta${(id * 7 + i) % 10} gamma" else l1
  }

  private def fmt(ms: Long, sep: Char, shortForm: Boolean): String = {
    val h = ms / 3600000
    val m = (ms % 3600000) / 60000
    val s = (ms % 60000) / 1000
    val f = ms % 1000
    if (shortForm) f"$m%02d:$s%02d$sep$f%03d"
    else f"$h%02d:$m%02d:$s%02d$sep$f%03d"
  }

  def vtt(id: Long): String = {
    val blocks = Seq("WEBVTT",
      s"NOTE deterministic fixture $id\nsee --> notes") ++
      (0 until nCues(id)).map { i =>
        val timing = fmt(startMs(id, i), '.', id % 4 == 0) + " --> " +
          fmt(endMs(id, i), '.', id % 4 == 0)
        val ident =
          if (i % 2 == 1) s"ident-$id-$i\nnote --> arrow junk $id\n" else ""
        ident + timing + "\n" + cueText(id, i)
      }
    blocks.mkString("\n\n")
  }

  def srt(id: Long): String =
    (0 until nCues(id)).map { i =>
      s"${i + 1}\n" + fmt(startMs(id, i), ',', shortForm = false) + " --> " +
        fmt(endMs(id, i), ',', shortForm = false) + "\n" + cueText(id, i)
    }.mkString("\n\n")

  /** (kind, payload) — broken rows carry no timing lines at all. */
  def row(id: Long): (String, String) =
    if (id % 8 == 3) ("vtt", s"WEBVTT\n\nNOTE empty sidecar $id")
    else if (id % 8 == 7) ("txt", s"junk prose $id with no cues here")
    else if (id % 2 == 0) ("vtt", vtt(id))
    else ("srt", srt(id))

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("fixtures/captions.parquet")
    val rows = args.lift(1).map(_.toInt).getOrElse(500)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("caption-fixture")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val df = (0L until rows.toLong).map { id =>
      val (kind, content) = row(id)
      (id, kind, content)
    }.toDF("media_id", "kind", "content")
    FixtureIo.writeSingleParquet(df, out, rows.toLong)
    spark.stop()
  }
}
