package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextExpressionsSpec extends SparkSpec {

  test("markerHits counts occurrences per set in one pass, duplicates included") {
    import spark.implicits._
    val df = Seq("the cat and the dog", "der und der", "").toDF("text")
    val got = df.select(Texts.markerHits(split(col("text"), " "),
      Seq(Seq("the", "and"), Seq("der", "und"))).as("mh"))
      .collect().map(_.getSeq[Int](0).toSeq)
    assert(got.toSeq == Seq(Seq(3, 0), Seq(0, 3), Seq(0, 0)))
  }

  test("markerHits matches the HOF formulation on CJK markers") {
    import spark.implicits._
    val markers = Seq("的", "是")
    val df = Seq("我 是 的 是 x", "无 关").toDF("text")
    val native = df.select(element_at(
      Texts.markerHits(split(col("text"), " "), Seq(markers)), 1)).as[Int].collect().toSeq
    val hof = df.select(size(filter(split(col("text"), " "),
      w => array_contains(array(markers.map(lit): _*), w)))).as[Int].collect().toSeq
    assert(native == hof && native == Seq(3, 0))
  }

  test("missCount equals the single-char-class regex count, including multi-byte") {
    import spark.implicits._
    val allowed = ('A' to 'Z').mkString + ('a' to 'z').mkString + ('0' to '9').mkString + " "
    val df = Seq("ab c!", "", "!!!", "a.b,c", "中文 ok?", "naïve café").toDF("text")
    val got = df.select(
      Texts.missCount(col("text"), allowed).as("native"),
      size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9 ]"), lit(0))).as("regex"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("wordNGrams skips null elements within a gram, like array_join") {
    import spark.implicits._
    val arr = array(lit("a"), lit(null).cast("string"), lit("b"))
    val df = Seq(1).toDF("x")
    val native = df.select(Texts.wordNGrams(arr, 2, distinct = false, padShort = false))
      .collect().head.getSeq[String](0).toSeq
    val hof = df.select(transform(sequence(lit(1), size(arr) - 1),
      i => array_join(slice(arr, i, lit(2)), " ")))
      .collect().head.getSeq[String](0).toSeq
    assert(native == hof && native == Seq("a", "b"))
  }

  test("null inputs propagate as null") {
    import spark.implicits._
    val df = Seq[Option[String]](None).toDF("text")
    val r = df.select(
      Texts.missCount(col("text"), "abc"),
      Texts.markerHits(split(col("text"), " "), Seq(Seq("a")))).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
