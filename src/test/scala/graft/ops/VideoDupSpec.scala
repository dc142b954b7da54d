package graft.ops

import graft.SparkSpec
import graft.tools.{AviFixture, MjpegMp4Fixture, VideoDupFixture}

class VideoDupSpec extends SparkSpec {

  test("re-mux twins hash identically across containers; groups are distinct") {
    val mp4 = VideoDupFixture.row(4L)._2 // group 2, MP4
    val avi = VideoDupFixture.row(5L)._2 // group 2, AVI of the same frames
    val a = VideoDup.frameDhashSeq(mp4)
    val b = VideoDup.frameDhashSeq(avi)
    assert(a.nonEmpty && a == b)
    assert(a.size == VideoDupFixture.nFrames(2L))
    val other = VideoDup.frameDhashSeq(VideoDupFixture.row(6L)._2) // group 3
    assert(other != a)
    // the ORIGINAL id-derived fixtures share frame bytes per id too —
    // the cross-container property is not a fixture artifact
    val id = 2L
    assert(VideoDup.frameDhashSeq(MjpegMp4Fixture.row(id)._2) ==
      VideoDup.frameDhashSeq(AviFixture.row(id)._2))
  }

  test("junk and frame-less containers claim nothing") {
    assert(VideoDup.frameDhashSeq("no video".getBytes("US-ASCII")).isEmpty)
    assert(VideoDup.frameDhashSeq(AviFixture.headerOnly(0L)).isEmpty)
    assert(VideoDup.frameDhashSeq(MjpegMp4Fixture.truncated()).isEmpty)
  }

  test("pair face: exact re-mux pair set over the fixture") {
    import spark.implicits._
    val rows = (0L until 32L).map { id =>
      val (m, b) = VideoDupFixture.row(id); (id, m, b)
    }
    val pairs = VideoDup.remuxPairs(VideoDup.signatureTable(spark,
        rows.toDF("media_id", "mime_type", "media")))
      .as[(Long, Long)].collect().toSet
    val want = (0L until 16L).filter(_ % 8 != 7).map(g => (2 * g, 2 * g + 1)).toSet
    assert(pairs == want, s"got $pairs")
  }
}
