package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: runs [[graft.SparkEntry.entry]] exactly the
 * way the per-round driver does (flagship query on sf0.001) and
 * prints its row count — the driver checks rows > 0. The sbt console
 * REPL doesn't evaluate piped stdin, so the smoke needs a real main.
 *
 * Usage: runMain graft.tools.EntrySmoke
 */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("ENTRY_ROWS=" + graft.SparkEntry.entry(spark).count())
    spark.stop()
  }
}
