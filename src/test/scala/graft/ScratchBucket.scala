package graft

import org.apache.spark.sql.functions._

/** Scratch experiment: bucketed+partitioned catalog table append + pruning. DELETE ME. */
object ScratchBucket {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("buckexp").toString
    val tbl = "scratch_bands"

    def batchDf(bid: Long, n: Int) = (0 until n).map { i =>
      (bid, (i * 2654435761L) % 1000003L, i % 20, s"doc_${bid}_$i")
    }.toDF("batch_id", "band_hash", "band_idx", "doc_id")

    // first write: create table
    batchDf(0, 1000).write.mode("append")
      .format("parquet")
      .option("path", s"$tmp/bands")
      .partitionBy("batch_id")
      .bucketBy(64, "band_hash")
      .sortBy("band_hash")
      .saveAsTable(tbl)
    println("=== created table ok")
    // append second batch
    batchDf(1, 1000).write.mode("append")
      .format("parquet")
      .option("path", s"$tmp/bands")
      .partitionBy("batch_id")
      .bucketBy(64, "band_hash")
      .sortBy("band_hash")
      .saveAsTable(tbl)
    println("=== appended ok, count=" + spark.table(tbl).count())

    val probeHashes = (0 until 50).map(i => (i * 2654435761L) % 1000003L)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "100000")
    val probe = spark.table(tbl)
      .filter(col("batch_id") =!= 1L && col("band_hash").isInCollection(probeHashes))
    probe.explain("formatted")
    println("=== probe rows=" + probe.count())
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")

    // simulate replay overwrite of partition batch_id=1: delete dir + refresh + append
    val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/bands/batch_id=1"), true)
    spark.catalog.refreshTable(tbl)
    println("=== after delete count=" + spark.table(tbl).count())
    batchDf(1, 500).write.mode("append")
      .format("parquet")
      .option("path", s"$tmp/bands")
      .partitionBy("batch_id")
      .bucketBy(64, "band_hash")
      .sortBy("band_hash")
      .saveAsTable(tbl)
    spark.catalog.refreshTable(tbl)
    println("=== after replay count=" + spark.table(tbl).count())
    // simulate session restart: catalog forgets the table, files remain.
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(
      s"""CREATE TABLE $tbl (band_hash BIGINT, band_idx INT, doc_id STRING, batch_id BIGINT)
         |USING parquet
         |PARTITIONED BY (batch_id)
         |CLUSTERED BY (band_hash) SORTED BY (band_hash) INTO 64 BUCKETS
         |LOCATION '$tmp/bands'""".stripMargin)
    spark.catalog.recoverPartitions(tbl)
    println("=== after re-register count=" + spark.table(tbl).count())
    val probe2 = spark.table(tbl)
      .filter(col("batch_id") =!= 1L && col("band_hash").isInCollection(probeHashes))
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    println("=== re-registered probe plan has SelectedBucketsCount=" +
      probe2.queryExecution.executedPlan.toString.contains("SelectedBucketsCount"))
    probe2.explain("formatted")
    // and append still works after re-registration
    batchDf(2, 300).write.mode("append")
      .format("parquet")
      .option("path", s"$tmp/bands")
      .partitionBy("batch_id")
      .bucketBy(64, "band_hash")
      .sortBy("band_hash")
      .saveAsTable(tbl)
    println("=== after post-reregister append count=" + spark.table(tbl).count())
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.stop()
  }
}
