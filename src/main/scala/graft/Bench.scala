package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every SparkEntry
 * query against SPARK_GRAFT_SF_DIR and prints ONE JSON line.
 *
 * A warm-up pass runs first so timings measure steady-state execution
 * (JIT, codegen cache, parquet footer cache) rather than JVM start-up —
 * the same discipline as the reference's 20s hot-loop harness
 * (reference: tests_adhoc/speed_test.php:168-185). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: materialise each query once (errors surface in the timed
    // pass; ignore here)
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
    }
    // drop warm-up caches so the timed pass measures its own full cost
    // (including any cache builds) and cached blocks don't accumulate
    spark.catalog.clearCache()

    var failed = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); () }
      catch { case _: Throwable => failed ::= name }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
