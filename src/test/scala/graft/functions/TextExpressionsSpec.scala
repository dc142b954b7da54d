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

  test("winnowFingerprints hash is bit-identical to Dedup.mdhash") {
    import spark.implicits._
    val df = Seq("a", "the quick brown fox", "中文 grams", "").toDF("g")
    val got = df.select(
      element_at(Texts.winnowFingerprints(array(col("g")), 4), 1).as("native"),
      conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("sql"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("winnowFingerprints equals the posexplode + window-min + distinct formulation") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val w = 4
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog the quick brown fox"),
      (2L, "a b a b a b a b a b a b a b"),
      (3L, "short"),
      (4L, "one two three")).toDF("doc_id", "text")
    val grams = Texts.wordNGrams(split(col("text"), " "), 3,
      distinct = false, padShort = true)
    val native = docs
      .select(col("doc_id"), explode(Texts.winnowFingerprints(grams, w)).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    val old = docs
      .select(col("doc_id"), posexplode(grams).as(Seq("pos", "g")))
      .withColumn("h", conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long"))
      .withColumn("fp", min("h").over(win))
      .select(col("doc_id"), col("fp")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == old && native.nonEmpty)
  }

  test("winnowFingerprints skips null gram elements instead of crashing (r22)") {
    import spark.implicits._
    // array(lit(null), "a", "b") through the SQL face: the pre-r22
    // build NPE'd on the null slot; the contract is now to skip it —
    // the result equals winnowing the null-free array
    val df = Seq(1).toDF("i")
    val withNull = df.select(Texts.winnowFingerprints(
      array(lit(null).cast("string"), lit("a"), lit("b")), 4).as("fps"))
      .select(explode(col("fps")).as("fp")).collect().map(_.getLong(0)).toSeq
    val without = df.select(Texts.winnowFingerprints(
      array(lit("a"), lit("b")), 4).as("fps"))
      .select(explode(col("fps")).as("fp")).collect().map(_.getLong(0)).toSeq
    assert(withNull == without && withNull.nonEmpty)
  }

  test("sentinelEncode + symbolPairs equal the interpreted SQL formulations (r22)") {
    import spark.implicits._
    val s1 = 1.toChar.toString
    val s2 = 2.toChar.toString
    val words = Seq("ab", "hello", "中文字符", "a中b", "naïve", "x", "🙂🙃ok")
    val df = words.toDF("w")
    // encode: native vs concat_ws(transform(sequence…substr)) chain
    val encHof = concat_ws("", transform(sequence(lit(1), length(col("w"))),
      i => concat(lit(s1), col("w").substr(i, lit(1)), lit(s2))))
    df.select(Texts.sentinelEncode(col("w")).as("n"), encHof.as("h")).collect()
      .foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
    // symbol pairs over multi-char merged symbols: native parse vs
    // regex split + transform/element_at (the pre-r22 chain)
    val enc = Seq(
      s1 + "a" + s2 + s1 + "b" + s2,                     // [a, b]
      s1 + "ab" + s2 + s1 + "c" + s2 + s1 + "de" + s2,   // [ab, c, de]
      s1 + "中文" + s2 + s1 + "x" + s2,                   // multi-byte symbol
      s1 + "only" + s2)                                  // 1 symbol → no pairs
    val edf = enc.toDF("w")
    val syms = split(col("w").substr(lit(2), length(col("w")) - 2),
      java.util.regex.Pattern.quote(s2 + s1))
    val hof2 = edf.select(col("w"), syms.as("s"))
      .filter(size(col("s")) >= 2)
      .select(col("w"), expr(
        "transform(sequence(1, size(s) - 1), i -> struct(element_at(s, i) AS a, element_at(s, i + 1) AS b))").as("ps"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getString(0), p.getString(1))))
      .toMap
    val native = edf.select(col("w"), Texts.symbolPairs(col("w")).as("ps")).collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getString(0), p.getString(1))))
      .toMap
    enc.foreach { w =>
      if (hof2.contains(w)) assert(native(w) == hof2(w), s"mismatch for ${w.length}-char word")
      else assert(native(w).isEmpty)
    }
    assert(native.values.flatten.nonEmpty)
  }

  test("charPairs equals the interpreted substring HOF, multi-byte included") {
    import spark.implicits._
    val words = Seq("ab", "hello", "中文字符", "a中b", "naïve", "x",
      "", "🙂🙃ok", "aa", "日本語テキスト処理")
    val df = words.toDF("w")
    val native = df.select(col("w"),
      Texts.charPairs(col("w")).as("ps")).collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getString(0), p.getString(1))))
      .toMap
    val hof = df.filter(length(col("w")) >= 2).select(col("w"), expr(
      "transform(sequence(1, length(w) - 1)," +
        " i -> struct(substring(w, i, 1) AS pa, substring(w, i + 1, 1) AS pb))").as("ps"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getString(0), p.getString(1))))
      .toMap
    words.foreach { w =>
      val n = w.codePointCount(0, w.length)
      if (n >= 2) assert(native(w) == hof(w), s"mismatch for '$w'")
      else assert(native(w).isEmpty, s"short word '$w' must yield no pairs")
    }
    // null propagates
    val r = Seq[Option[String]](None).toDF("w")
      .select(Texts.charPairs(col("w"))).collect().head
    assert(r.isNullAt(0))
  }
}
