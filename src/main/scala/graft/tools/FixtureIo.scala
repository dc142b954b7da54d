package graft.tools

import org.apache.spark.sql.DataFrame

/** Shared fixture output convention: every fixture tool writes ONE
 * parquet FILE (not a directory) so the DuckDB oracle can
 * `read_parquet('<path>')` it directly. Spark only writes
 * directories, so: coalesce to one partition, write to a temp dir,
 * move the single part file to the destination. One implementation —
 * a change to the convention (compression, naming) lands everywhere
 * at once instead of in a dozen fixture mains. */
object FixtureIo {

  def writeSingleParquet(df: DataFrame, out: String, rows: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graftfix").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(
        s"no part-*.parquet under $tmp — Spark wrote nothing for $out"))
    val dest = new java.io.File(out)
    Option(dest.getParentFile).foreach(_.mkdirs())
    java.nio.file.Files.move(part.toPath, dest.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $rows rows to $out")
  }
}
