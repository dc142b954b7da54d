package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Single-core interpreter throughput — the like-for-like comparison
 * against the reference's ~60-70k events/s single-threaded hot loop
 * (BASELINE.md; reference: tests_adhoc/speed_test.php): the generic
 * rule interpreter (q_e1 face: sequence + event-time timeouts) on
 * `local[1]`, one shuffle partition, warm run timed. Keeps the
 * README's "~N× the reference single-core" claim re-measurable every
 * round with one command:
 *
 *   sbt "runMain graft.tools.SingleCoreProbe /root/testdata/sf0.1"
 */
object SingleCoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[1]")
      .appName("graft-single-core-probe")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries("q_e1_engine_timeouts")
    q(spark, sfDir).count() // warm-up: JIT + page cache
    val n = graft.Tables.events(spark, sfDir).count()
    val t0 = System.nanoTime()
    q(spark, sfDir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"local1_interpreter_eps","events":$n,"sec":$dt%.3f,"eps":${(n / dt).round}}""")
    spark.stop()
  }
}
