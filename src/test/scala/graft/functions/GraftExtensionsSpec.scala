package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("graft_dot SQL function matches the Column API and known values") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }

  test("graft_minhash SQL function is bit-identical to the Column API signature") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "c d e f g")).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.ops.Dedup.minhashBase(graft.ops.Dedup.shingles(col("text"), 3)).as("hv"))
    df.createOrReplaceTempView("mh_in")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_minhash(hv, 8) AS sig FROM mh_in ORDER BY doc_id")
      .collect().map(_.getSeq[Long](1).toSeq)
    val viaApi = df
      .select(col("doc_id"), graft.ops.Dedup.minhashFromBase(col("hv"), 8).as("sig"))
      .orderBy("doc_id")
      .collect().map(_.getSeq[Long](1).toSeq)
    assert(viaSql.toSeq == viaApi.toSeq)
    spark.catalog.dropTempView("mh_in")
  }

  test("NULL literal arguments are rejected with the descriptive error, not an NPE") {
    GraftExtensions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_miss_count('abc', CAST(NULL AS STRING))").collect()
    }
    assert(err.getMessage.contains("non-NULL"), err.getMessage)
    val err2 = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array(1L), CAST(NULL AS INT))").collect()
    }
    assert(err2.getMessage.contains("non-NULL"), err2.getMessage)
  }

  test("graft_minhash rejects a non-literal k") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, Array(1L, 2L))).toDF("doc_id", "hv").createOrReplaceTempView("mh_bad")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash(hv, CAST(doc_id AS INT)) FROM mh_bad").collect()
    }
    assert(err.getMessage.contains("literal"))
    spark.catalog.dropTempView("mh_bad")
  }

  test("graft_marker_hits and graft_miss_count SQL functions match the Column API") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_marker_hits(split('the cat and the dog', ' '),
        |         array('the','and'), array('der','und')) AS mh,
        |       graft_miss_count('a.b,c!', 'abc') AS mc""".stripMargin)
      .collect().head
    assert(r.getSeq[Int](0).toSeq == Seq(3, 0))
    assert(r.getInt(1) == 3)
  }

  test("graft_shingles SQL function matches Dedup.shingles") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_shingles(split('a b c d', ' '), 3) AS sh")
      .collect().head.getSeq[String](0).toSeq
    assert(viaSql == Seq("a b c", "b c d"))
    import spark.implicits._
    val viaApi = Seq("a b c d").toDF("text")
      .select(graft.ops.Dedup.shingles(col("text"), 3))
      .collect().head.getSeq[String](0).toSeq
    assert(viaSql == viaApi)
  }

  test("registrations are per-session and the injector class applies cleanly") {
    // runtime registration does not leak into sibling sessions: query
    // the REGISTERED name on a fresh session BEFORE registering there
    GraftExtensions.register(spark)
    val s2 = spark.newSession()
    assert(intercept[Exception] {
      s2.sql("SELECT graft_dot(array(1.0d), array(2.0d))").collect()
    }.getMessage.toLowerCase.contains("unresolved"))
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT graft_dot(array(1.0d), array(2.0d))").collect().head.getDouble(0) == 2.0)
    // the config-time injector (spark.sql.extensions hook) shares the
    // same function list; applying it to an extension point is a no-throw
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
