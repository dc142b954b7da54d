package graft.ops

import graft.SparkSpec
import graft.ops.Multimodal.{AvHeaders, ImageHeaders}
import graft.tools.{AvFixture, AviFixture, MediaFixture, Mp4Fixture}

class MultimodalSpec extends SparkSpec {

  test("PNG IHDR parse: dimensions round-trip through real chunk bytes") {
    val m = ImageHeaders.imageMeta(MediaFixture.png(640, 480))
    assert(m.contains(Multimodal.ImageMeta("png", 640, 480)))
    // spec-max-ish dims survive the signed-int big-endian read
    val big = ImageHeaders.imageMeta(MediaFixture.png(65535, 1))
    assert(big.contains(Multimodal.ImageMeta("png", 65535, 1)))
  }

  test("JPEG SOF parse: baseline, progressive, and COM-shifted segment layouts") {
    assert(ImageHeaders.imageMeta(MediaFixture.jpeg(800, 600))
      .contains(Multimodal.ImageMeta("jpeg", 800, 600)))
    assert(ImageHeaders.imageMeta(MediaFixture.jpeg(320, 240, progressive = true))
      .contains(Multimodal.ImageMeta("jpeg", 320, 240)))
    // a COM segment before the SOF must not confuse the walk
    assert(ImageHeaders.imageMeta(MediaFixture.jpeg(101, 77, comLen = 13))
      .contains(Multimodal.ImageMeta("jpeg", 101, 77)))
  }

  test("unparseable bytes are None, never an exception") {
    assert(ImageHeaders.imageMeta(MediaFixture.truncatedPng()).isEmpty)
    assert(ImageHeaders.imageMeta(MediaFixture.junk(7)).isEmpty)
    assert(ImageHeaders.imageMeta(Array.emptyByteArray).isEmpty)
    assert(ImageHeaders.imageMeta(null).isEmpty)
    // JPEG SOI but garbage after: lost marker sync
    assert(ImageHeaders.imageMeta(Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x01)).isEmpty)
    // JPEG that ends (EOI) before any SOF
    assert(ImageHeaders.imageMeta(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)).isEmpty)
  }

  test("imageMetaTable parses the fixture rows per the generator's ground truth") {
    import spark.implicits._
    val rows = (0L until 64L).map { id =>
      val (mime, bytes) = MediaFixture.row(id)
      (id, mime, bytes)
    }
    val out = Multimodal.imageMetaTable(spark, rows.toDF("media_id", "mime_type", "media"))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    (0L until 64L).foreach { id =>
      val r = out(id)
      if (id % 8 == 3 || id % 8 == 7) {
        assert(r.isNullAt(r.fieldIndex("format")), s"id=$id")
      } else if (id % 4 == 0) {
        assert(r.getAs[String]("format") == "png", s"id=$id")
        assert(r.getAs[Int]("width") == MediaFixture.width(id), s"id=$id")
        assert(r.getAs[Int]("height") == MediaFixture.height(id), s"id=$id")
      } else {
        assert(r.getAs[String]("format") == "jpeg", s"id=$id")
        assert(r.getAs[Int]("width") == MediaFixture.width(id), s"id=$id")
        assert(r.getAs[Int]("height") == MediaFixture.height(id), s"id=$id")
      }
    }
  }

  test("pixel decode: real ImageIO decode across PNG/JPEG/GIF/BMP, known luminance grid") {
    // left half black, right half white (MediaFixture.realImage): the
    // 4x4 mean-luminance grid is exactly [0,0,1,1] per row — a solid
    // pattern that survives even JPEG's lossy round-trip
    for (fmt <- Seq("png", "jpg", "gif", "bmp")) {
      val bytes = MediaFixture.realImage(32, 16, fmt)
      val img = Multimodal.MediaCodec.decodeImage(bytes)
      assert(img.isDefined, s"$fmt did not decode")
      assert(img.get.getWidth == 32 && img.get.getHeight == 16, s"$fmt dims")
      val grid = Multimodal.MediaCodec.decode(bytes)
      assert(grid.length == Multimodal.MediaCodec.FeatureDim)
      val tol = if (fmt == "jpg") 0.05f else 1e-4f
      for (row <- 0 until 4; gx <- 0 until 4) {
        val expected = if (gx < 2) 0f else 1f
        assert(math.abs(grid(row * 4 + gx) - expected) <= tol,
          s"$fmt cell ($row,$gx) = ${grid(row * 4 + gx)}, want $expected")
      }
    }
  }

  test("pixel decode: non-image and header-only payloads fall back to the byte-hash fake") {
    val junk = MediaFixture.junk(3)
    assert(Multimodal.MediaCodec.decodeImage(junk).isEmpty)
    assert(Multimodal.MediaCodec.decode(junk).toSeq ==
      Multimodal.MediaCodec.byteHashFeature(junk).toSeq)
    // header-only fixture blobs carry no pixel data: ImageIO rejects
    // them (no exception), the fake path keeps the pipeline total
    val headerOnly = MediaFixture.png(64, 64)
    assert(Multimodal.MediaCodec.decode(headerOnly).toSeq ==
      Multimodal.MediaCodec.byteHashFeature(headerOnly).toSeq)
    assert(Multimodal.MediaCodec.decode(Array.emptyByteArray).length ==
      Multimodal.MediaCodec.FeatureDim)
  }

  test("audio decode: real PCM samples across widths/channels, known step envelope") {
    // silence → full-scale step (AvFixture.wavStep): the 16-cell mean
    // amplitude envelope is exactly 0 for cells 0-7, ~1 for 8-15
    for ((ch, bits) <- Seq((1, 16), (2, 16), (1, 8), (2, 8))) {
      val bytes = AvFixture.wavStep(ch, 8000, bits, frames = 320)
      val env = Multimodal.MediaCodec.decodeAudio(bytes)
      assert(env.isDefined, s"ch=$ch bits=$bits did not decode")
      val e = env.get
      assert(e.length == Multimodal.MediaCodec.FeatureDim)
      (0 until 8).foreach(i => assert(e(i) == 0f, s"ch=$ch bits=$bits cell $i = ${e(i)}"))
      (8 until 16).foreach(i => assert(math.abs(e(i) - 1f) < 0.01f,
        s"ch=$ch bits=$bits cell $i = ${e(i)}"))
      // decode() routes WAV bytes to the audio path
      assert(Multimodal.MediaCodec.decode(bytes).toSeq == e.toSeq)
    }
    // the zero-filled fixture WAVs decode to an all-silence envelope
    val silent = Multimodal.MediaCodec.decodeAudio(AvFixture.wav(4)) // 16-bit, data > 0
    assert(silent.isDefined && silent.get.forall(_ == 0f))
    // truncated container and junk stay None (byte-hash fallback)
    assert(Multimodal.MediaCodec.decodeAudio(AvFixture.truncatedWav()).isEmpty)
    assert(Multimodal.MediaCodec.decodeAudio(AvFixture.junk(5)).isEmpty)
  }

  test("extractFeatures emits the real luminance grid for decodable rows") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image/png", MediaFixture.realImage(32, 16, "png")),
      (2L, "image/bmp", MediaFixture.realImage(8, 8, "bmp")),
      (3L, "application/octet-stream", MediaFixture.junk(11)))
    val out = Multimodal.extractFeatures(spark, rows.toDF("media_id", "mime_type", "media"))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).feature.toSeq ==
      Multimodal.MediaCodec.decode(MediaFixture.realImage(32, 16, "png")).toSeq)
    assert(math.abs(out(2L).feature(0)) <= 1e-4f && math.abs(out(2L).feature(3) - 1f) <= 1e-4f)
    assert(out(3L).feature.toSeq ==
      Multimodal.MediaCodec.byteHashFeature(MediaFixture.junk(11)).toSeq)
    assert(out.values.forall(_.feature.length == Multimodal.MediaCodec.FeatureDim))
  }

  test("frameSample: REAL per-frame decode for animated GIF, distinct luminance per frame") {
    import spark.implicits._
    val gif2 = AvFixture.animatedGif(16, 16, 2)
    // the container genuinely carries 2 frames the JDK reader iterates
    assert(Multimodal.MediaCodec.decodeGifFrames(gif2).size == 2)
    val junk = AvFixture.junk(9) // 64 bytes, no container signature
    val rows = Seq((1L, "image/gif", gif2), (2L, "application/octet-stream", junk))
      .toDF("media_id", "mime_type", "media")
    val frames = Multimodal.frameSample(spark, rows, everyN = 1, frameBytes = 16).collect()
    val gifFrames = frames.filter(_.media_id == 1L).sortBy(_.frame_idx)
    assert(gifFrames.map(_.frame_idx).toSeq == Seq(0, 1))
    // each sampled frame is a standalone decodable image whose REAL
    // luminance grid matches the generator's per-frame gray level —
    // and the two frames' grids DIFFER (a byte-chunk fake cannot
    // produce this: chunks of one GIF share its palette bytes)
    val grids = gifFrames.map(f => Multimodal.MediaCodec.decode(f.frame))
    assert(grids(0).forall(v => math.abs(v - 0f) <= 0.02f), grids(0).mkString(","))
    assert(grids(1).forall(v => math.abs(v - 1f) <= 0.02f), grids(1).mkString(","))
    // non-GIF payloads keep the chunk fallback (4 × 16-byte chunks)
    val junkFrames = frames.filter(_.media_id == 2L).sortBy(_.frame_idx)
    assert(junkFrames.length == 4)
    assert(junkFrames.head.frame.toSeq == junk.take(16).toSeq)
  }

  test("frameSample: everyN sampling keeps source frame indexes; static GIF falls back") {
    import spark.implicits._
    val gif4 = AvFixture.animatedGif(8, 8, 4)
    val sampled = Multimodal.frameSample(
      spark, Seq((1L, "image/gif", gif4)).toDF("media_id", "mime_type", "media"),
      everyN = 2).collect().sortBy(_.frame_idx)
    // frames 0 and 2 of 4 — frame_idx is the SOURCE index, not a rank
    assert(sampled.map(_.frame_idx).toSeq == Seq(0, 2))
    val lum = sampled.map(f => Multimodal.MediaCodec.decode(f.frame).sum / 16f)
    assert(lum(0) < 0.02f && math.abs(lum(1) - 2f / 3f) < 0.05f)
    // the header-only fixture GIF has no decodable image data: the
    // chunk fallback applies, never an exception
    val staticGif = AvFixture.gif(1)
    val fallback = Multimodal.frameSample(
      spark, Seq((2L, "image/gif", staticGif)).toDF("media_id", "mime_type", "media"),
      everyN = 1, frameBytes = 8).collect()
    assert(fallback.nonEmpty)
    assert(fallback.minBy(_.frame_idx).frame.toSeq == staticGif.take(8).toSeq)
  }

  test("decode chain is null-total: a null media cell is a zero feature, not a dead task") {
    import spark.implicits._
    assert(Multimodal.MediaCodec.decode(null).toSeq ==
      Seq.fill(Multimodal.MediaCodec.FeatureDim)(0f))
    assert(Multimodal.MediaCodec.byteHashFeature(null).toSeq ==
      Seq.fill(Multimodal.MediaCodec.FeatureDim)(0f))
    assert(Multimodal.MediaCodec.entropy(null) == 0.0)
    assert(Multimodal.MediaCodec.decodeGifFrames(null).isEmpty)
    // and through the Dataset faces: a null payload row survives
    val rows = Seq((1L, "image/png", MediaFixture.realImage(8, 8, "png")),
      (2L, "application/octet-stream", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "mime_type", "media")
    val feats = Multimodal.extractFeatures(spark, rows).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(2L).n_bytes == 0L && feats(2L).byte_entropy == 0.0)
    assert(feats(2L).feature.toSeq == Seq.fill(Multimodal.MediaCodec.FeatureDim)(0f))
    assert(Multimodal.frameSample(spark, rows, everyN = 1).collect()
      .count(_.media_id == 2L) == 0) // null payload → zero frames, no crash
  }

  test("AVI parse: avih fields, header-only identity, video-chunk walk matches the contract") {
    val id = 0L
    val m = AvHeaders.avMeta(AviFixture.avi(id)).get
    assert(m.format == "avi")
    assert(m.width.contains(AviFixture.width(id)) && m.height.contains(AviFixture.height(id)))
    assert(m.durationMs.contains(
      AviFixture.usPerFrame(id).toLong * AviFixture.nFrames(id) / 1000L))
    // header-only (capture cut before movi): container identity +
    // dimensions survive, duration does not, and there are no frames
    val ho = AvHeaders.avMeta(AviFixture.headerOnly(3)).get
    assert(ho.format == "avi" && ho.width.contains(AviFixture.width(3)) && ho.durationMs.isEmpty)
    assert(AvHeaders.aviVideoChunks(AviFixture.headerOnly(3)).isEmpty)
    assert(AvHeaders.avMeta(AviFixture.junk(7)).isEmpty)
    // the real RIFF walk lands on exactly the oracle's coordinates:
    // frame chunk i's data at 224 + i*(8+S) + 8, length S
    val (bytes, s) = AviFixture.aviWithSize(4) // nf = 6
    val chunks = AvHeaders.aviVideoChunks(bytes)
    assert(chunks.size == AviFixture.nFrames(4))
    chunks.zipWithIndex.foreach { case ((off, len), i) =>
      assert(off == 224 + i * (8 + s) + 8, s"frame $i offset")
      assert(len == s, s"frame $i length")
    }
  }

  test("frameSample: REAL MJPEG AVI frame iteration, distinct per-frame luminance, provenance flag") {
    import spark.implicits._
    val id = 1L // nf = 3
    val rows = Seq(
      (1L, "video/x-msvideo", AviFixture.avi(id)),
      (2L, "application/octet-stream", AvFixture.junk(9)))
      .toDF("media_id", "mime_type", "media")
    val frames = Multimodal.frameSample(spark, rows, everyN = 1, frameBytes = 16).collect()
    val avi = frames.filter(_.media_id == 1L).sortBy(_.frame_idx)
    assert(avi.map(_.frame_idx).toSeq == (0 until AviFixture.nFrames(id)))
    assert(avi.forall(_.decoded), "container-yielded frames carry decoded = true")
    // every sampled frame is a complete standalone JPEG whose real
    // luminance grid the decoder reads — and the moving bar makes
    // consecutive frames' grids DIFFER (byte chunks of one container
    // could never each decode as an image)
    val grids = avi.map(f => Multimodal.MediaCodec.decode(f.frame).toSeq).toSeq
    grids.sliding(2).foreach { pair =>
      assert(pair.head != pair.last,
        "consecutive AVI frames decode to distinct luminance grids")
    }
    // the byte-chunk fallback is marked NOT decoded
    val junkFrames = frames.filter(_.media_id == 2L)
    assert(junkFrames.nonEmpty && junkFrames.forall(!_.decoded))
    // everyN sampling keeps SOURCE chunk indexes on the AVI path too
    val sampled = Multimodal.frameSample(spark,
      Seq((3L, "video/x-msvideo", AviFixture.avi(4))).toDF("media_id", "mime_type", "media"),
      everyN = 2).collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq == Seq(0, 2, 4)) // of nf = 6
  }

  test("aviFrameTable emits the generator's ground-truth chunk coordinates") {
    import spark.implicits._
    val ids = Seq(0L, 3L, 5L, 7L) // full, header-only, full, junk
    val rows = ids.map(i => { val (m, b) = AviFixture.row(i); (i, m, b) })
      .toDF("media_id", "mime_type", "media")
    val out = Multimodal.aviFrameTable(spark, rows).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    // only full rows produce frames
    assert(out.keys.map(_._1).toSet == Set(0L, 5L))
    for (id <- Seq(0L, 5L)) {
      val (_, s) = AviFixture.aviWithSize(id)
      (0 until AviFixture.nFrames(id)).foreach { i =>
        val r = out((id, i))
        assert(r.getLong(2) == 224L + i * (8 + s) + 8, s"id=$id frame=$i offset")
        assert(r.getLong(3) == s.toLong && r.getBoolean(4), s"id=$id frame=$i len/jpeg")
      }
    }
  }

  test("MP4 MJPEG: stbl sample-table walk lands on the mdat layout contract") {
    import graft.tools.MjpegMp4Fixture
    val id = 4L // nf = 6
    val (bytes, s) = MjpegMp4Fixture.mp4WithSize(id)
    val samples = AvHeaders.mp4VideoSamples(bytes)
    assert(samples.size == MjpegMp4Fixture.nFrames(id))
    samples.zipWithIndex.foreach { case ((off, len), i) =>
      assert(off == 24 + i * s, s"sample $i offset")
      assert(len == s, s"sample $i size")
      // each sample starts with the JPEG SOI marker
      assert((bytes(off) & 0xff) == 0xff && (bytes(off + 1) & 0xff) == 0xd8)
    }
    // the same file's ftyp/moov still parse as plain mp4 metadata
    val meta = AvHeaders.avMeta(bytes).get
    assert(meta.format == "mp4")
    assert(meta.width.contains(MjpegMp4Fixture.width(id)))
    assert(meta.height.contains(MjpegMp4Fixture.height(id)))
    // non-video BMFF (the q_m4 fixture: no trak sample tables at all)
    // and junk yield no samples
    assert(AvHeaders.mp4VideoSamples(Mp4Fixture.mp4(0)).isEmpty)
    assert(AvHeaders.mp4VideoSamples(MjpegMp4Fixture.truncated()).isEmpty)
    assert(AvHeaders.mp4VideoSamples(MjpegMp4Fixture.junk(7)).isEmpty)
  }

  test("MP4 stsc expansion: multi-chunk runs + per-sample stsz table resolve spec-correctly") {
    // hand-built BMFF exercising the GENERAL sample-table paths the
    // fixture doesn't: three chunks at arbitrary offsets, stsc runs
    // [(chunk 1 → 2 samples/chunk), (chunk 3 → 1)] (run 1 extends over
    // chunk 2 per spec), and a PER-SAMPLE stsz table (sample_size 0)
    def be32(v: Long): Array[Byte] =
      Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def fcc(s: String) = s.getBytes("US-ASCII")
    def bx(t: String, p: Array[Byte]): Array[Byte] = be32(p.length + 8L) ++ fcc(t) ++ p
    def full(t: String, p: Array[Byte]): Array[Byte] = bx(t, Array[Byte](0, 0, 0, 0) ++ p)
    val sizes = Seq(10L, 20L, 30L, 40L, 50L)
    val ftyp = bx("ftyp", fcc("isom") ++ be32(512))
    val mdat = bx("mdat", new Array[Byte](300))
    val mdatPay = ftyp.length + 8 // 24
    // chunk starts inside mdat payload, deliberately non-contiguous
    val chunkOffs = Seq(mdatPay + 0, mdatPay + 40, mdatPay + 120)
    val stsd = full("stsd", be32(1) ++ bx("jpeg", new Array[Byte](78)))
    val stsc = full("stsc", be32(2) ++
      be32(1) ++ be32(2) ++ be32(1) ++ // from chunk 1: 2 samples each
      be32(3) ++ be32(1) ++ be32(1)) // from chunk 3: 1 sample
    val stsz = full("stsz", be32(0) ++ be32(sizes.length) ++
      sizes.flatMap(be32).toArray)
    val stco = full("stco", be32(chunkOffs.length) ++
      chunkOffs.flatMap(o => be32(o)).toArray)
    val stbl = bx("stbl", stsd ++ stsc ++ stsz ++ stco)
    val moov = bx("moov",
      bx("trak", bx("mdia", bx("minf", stbl))))
    val bytes = ftyp ++ mdat ++ moov
    val got = AvHeaders.mp4VideoSamples(bytes)
    // chunk 1: samples 0,1 back to back; chunk 2 (run 1 extends):
    // samples 2,3; chunk 3: sample 4
    val expect = Seq(
      (chunkOffs(0), 10), (chunkOffs(0) + 10, 20),
      (chunkOffs(1), 30), (chunkOffs(1) + 30, 40),
      (chunkOffs(2), 50))
    assert(got == expect, s"got $got")
    // a chunk offset pointing past the buffer stops the walk cleanly
    // at the samples already resolved — no throw, no bogus rows
    val stcoBad = full("stco", be32(chunkOffs.length) ++
      (chunkOffs.take(2) :+ 100000).flatMap(o => be32(o)).toArray)
    val moovBad = bx("moov",
      bx("trak", bx("mdia", bx("minf", bx("stbl", stsd ++ stsc ++ stsz ++ stcoBad)))))
    val gotBad = AvHeaders.mp4VideoSamples(ftyp ++ mdat ++ moovBad)
    assert(gotBad == expect.take(4), s"got $gotBad")
  }

  test("MP4 co64 chunk offsets resolve like stco (the >4GiB container layout)") {
    def be32(v: Long): Array[Byte] =
      Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def fcc(s: String) = s.getBytes("US-ASCII")
    def bx(t: String, p: Array[Byte]): Array[Byte] = be32(p.length + 8L) ++ fcc(t) ++ p
    def full(t: String, p: Array[Byte]): Array[Byte] = bx(t, Array[Byte](0, 0, 0, 0) ++ p)
    val ftyp = bx("ftyp", fcc("isom") ++ be32(512))
    val mdat = bx("mdat", new Array[Byte](120))
    val stsd = full("stsd", be32(1) ++ bx("jpeg", new Array[Byte](78)))
    val stsc = full("stsc", be32(1) ++ be32(1) ++ be32(2) ++ be32(1))
    val stsz = full("stsz", be32(10) ++ be32(4)) // uniform 10, 4 samples
    val co64 = full("co64", be32(2) ++ be64(24) ++ be64(80))
    val stbl = bx("stbl", stsd ++ stsc ++ stsz ++ co64)
    val bytes = ftyp ++ mdat ++ bx("moov", bx("trak", bx("mdia", bx("minf", stbl))))
    val got = AvHeaders.mp4VideoSamples(bytes)
    assert(got == Seq((24, 10), (34, 10), (80, 10), (90, 10)), s"got $got")
  }

  test("MP4 multi-track: audio trak tables never contaminate the video trak's samples") {
    // A real MJPEG MP4 usually carries an audio track too. Sample-table
    // state must be scoped PER TRAK: with trak-global state (the round-10
    // bug shape) the video trak's 'jpeg' codec flag combined with
    // whichever trak's tables parsed LAST — here the audio trak, whose
    // stco/stsz point at different coordinates — and the walk emitted
    // audio bytes as decoded video frames. Audio trak is deliberately
    // ordered last to trip exactly that.
    def be32(v: Long): Array[Byte] =
      Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def fcc(s: String) = s.getBytes("US-ASCII")
    def bx(t: String, p: Array[Byte]): Array[Byte] = be32(p.length + 8L) ++ fcc(t) ++ p
    def full(t: String, p: Array[Byte]): Array[Byte] = bx(t, Array[Byte](0, 0, 0, 0) ++ p)
    def trak(codec: String, chunkOff: Int, sampleSize: Int, n: Int): Array[Byte] = {
      val stsd = full("stsd", be32(1) ++ bx(codec, new Array[Byte](78)))
      val stsc = full("stsc", be32(1) ++ be32(1) ++ be32(n) ++ be32(1))
      val stsz = full("stsz", be32(sampleSize) ++ be32(n))
      val stco = full("stco", be32(1) ++ be32(chunkOff))
      bx("trak", bx("mdia", bx("minf", bx("stbl", stsd ++ stsc ++ stsz ++ stco))))
    }
    val ftyp = bx("ftyp", fcc("isom") ++ be32(512))
    val mdat = bx("mdat", new Array[Byte](400))
    val videoTrak = trak("jpeg", 24, 50, 3) // samples at 24, 74, 124
    val audioTrak = trak("mp4a", 200, 16, 8) // different tables entirely
    val bytes = ftyp ++ mdat ++ bx("moov", videoTrak ++ audioTrak)
    val got = AvHeaders.mp4VideoSamples(bytes)
    assert(got == Seq((24, 50), (74, 50), (124, 50)), s"got $got")
    // audio-only file: no video samples at all
    val audioOnly = ftyp ++ mdat ++ bx("moov", audioTrak)
    assert(AvHeaders.mp4VideoSamples(audioOnly).isEmpty)
  }

  test("MP4 stss walk: AVC keyframe coordinates match the fixture contract") {
    import graft.tools.AvcMp4Fixture
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L)) {
      val bytes = AvcMp4Fixture.mp4(id)
      val s = AvcMp4Fixture.sampleSize(id)
      val got = AvHeaders.mp4SyncSamples(bytes)
      val expect = AvcMp4Fixture.syncSamples(id).toSeq.map { sn =>
        (sn, 24 + (sn.toInt - 1) * s, s)
      }
      assert(got == expect, s"id=$id got $got")
      // every located keyframe's first NAL header byte is an IDR slice
      got.foreach { case (_, off, _) =>
        assert((bytes(off + 4) & 0x1f) == 5)
      }
      // the avc1 trak is NOT MJPEG: no decodable video samples claimed
      assert(AvHeaders.mp4VideoSamples(bytes).isEmpty)
    }
    // MJPEG fixture has no stss and no H.26x codec: no keyframe rows
    assert(AvHeaders.mp4SyncSamples(graft.tools.MjpegMp4Fixture.mp4(0)).isEmpty)
    assert(AvHeaders.mp4SyncSamples(AvcMp4Fixture.row(3)._2).isEmpty) // ftyp only
    assert(AvHeaders.mp4SyncSamples(AvcMp4Fixture.row(7)._2).isEmpty) // junk
  }

  test("fragmented MP4: moof/traf/trun walk lands on the fixture's fragment layout") {
    import graft.tools.AvcMp4Fixture
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L)) {
      val bytes = AvcMp4Fixture.fragMp4(id)
      val nf = AvcMp4Fixture.nFrames(id)
      val s = AvcMp4Fixture.sampleSize(id)
      val k = AvcMp4Fixture.syncInterval(id)
      val got = AvHeaders.mp4FragmentSyncSamples(bytes)
      // re-derive via the box-size anchors the oracle uses
      def be32(o: Int): Long = ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      val moovSz = be32(16).toInt
      val moof1 = 16 + moovSz
      val moofSz = be32(moof1).toInt
      val frag = moofSz + 8 + s
      val expect = (0 until nf).filter(_ % k == 0).map { i =>
        ((i + 1).toLong, moof1 + i * frag + moofSz + 8, s)
      }
      assert(got == expect, s"id=$id got $got")
      got.foreach { case (_, off, _) =>
        assert((bytes(off + 4) & 0x1f) == 5) // IDR NAL header
      }
      // the fragmented file's moov has EMPTY sample tables: the stbl
      // walks emit nothing for it
      assert(AvHeaders.mp4VideoSamples(bytes).isEmpty)
      assert(AvHeaders.mp4SyncSamples(bytes).isEmpty)
      // and the self-contained variant has no fragments
      assert(AvHeaders.mp4FragmentSyncSamples(AvcMp4Fixture.mp4(id)).isEmpty)
    }
    assert(AvHeaders.mp4FragmentSyncSamples(AvcMp4Fixture.fragRow(3)._2).isEmpty)
    assert(AvHeaders.mp4FragmentSyncSamples(AvcMp4Fixture.fragRow(7)._2).isEmpty)
  }

  test("tfhd: explicit base_data_offset wins over default-base-is-moof") {
    import graft.tools.AvcMp4Fixture
    // the both-flags variant's base_data_offset points straight at each
    // sample (trun data_offset 0); letting default-base-is-moof
    // override it would shift every emitted offset back to the moof
    // start. Expectation re-derived from the file's own box sizes
    // (its tfhd is 8 bytes longer than fragMp4's, so absolute offsets
    // differ between the variants by design).
    for (id <- Seq(0L, 1L, 2L, 5L)) {
      val bytes = AvcMp4Fixture.fragMp4BothFlags(id)
      val nf = AvcMp4Fixture.nFrames(id)
      val s = AvcMp4Fixture.sampleSize(id)
      val k = AvcMp4Fixture.syncInterval(id)
      def be32(o: Int): Long = ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      val moof1 = 16 + be32(16).toInt
      val moofSz = be32(moof1).toInt
      val frag = moofSz + 8 + s
      val expect = (0 until nf).filter(_ % k == 0).map { i =>
        ((i + 1).toLong, moof1 + i * frag + moofSz + 8, s)
      }
      val got = AvHeaders.mp4FragmentSyncSamples(bytes)
      assert(got == expect, s"id=$id got $got expect $expect")
      assert(got.nonEmpty)
    }
  }

  test("is_idr probe is codec-aware: AVC mask, HEVC NAL types, h263 NULL") {
    // AVCC/Annex-B both put the NAL header at payload offset 4
    val avcIdr = Array[Byte](0, 0, 0, 1, 0x65)
    val avcNon = Array[Byte](0, 0, 0, 1, 0x41)
    assert(Multimodal.isIdrProbe(avcIdr, 0, 5, "avc1").contains(true))
    assert(Multimodal.isIdrProbe(avcNon, 0, 5, "avc3").contains(false))
    // HEVC nal_unit_type = bits 1-6 of the first header byte:
    // 19<<1=0x26 (IDR_W_RADL), 20<<1=0x28 (IDR_N_LP), 1<<1=0x02 (TRAIL_R)
    val hevcIdr = Array[Byte](0, 0, 0, 1, 0x26)
    val hevcIdr2 = Array[Byte](0, 0, 0, 1, 0x28)
    val hevcTrail = Array[Byte](0, 0, 0, 1, 0x02)
    assert(Multimodal.isIdrProbe(hevcIdr, 0, 5, "hvc1").contains(true))
    assert(Multimodal.isIdrProbe(hevcIdr2, 0, 5, "hev1").contains(true))
    assert(Multimodal.isIdrProbe(hevcTrail, 0, 5, "hvc1").contains(false))
    // the AVC mask on the HEVC IDR byte would claim false positives:
    // 0x26 & 0x1f = 6 ≠ 5 happens to miss, but 0x65-as-HEVC is type 50
    assert(Multimodal.isIdrProbe(avcIdr, 0, 5, "hvc1").contains(false))
    // h263/s263 are not NAL bitstreams: the probe must answer NULL
    assert(Multimodal.isIdrProbe(avcIdr, 0, 5, "h263").isEmpty)
    assert(Multimodal.isIdrProbe(avcIdr, 0, 5, "s263").isEmpty)
    // truncated payload: defined false for NAL codecs, not a throw
    assert(Multimodal.isIdrProbe(Array[Byte](1, 2), 0, 2, "avc1").contains(false))
  }

  test("ID3v2.4 footer flag extends the tag skip by 10 bytes") {
    import graft.tools.Mp3Fixture
    // rebuild id 0's stream behind a footer-flagged tag: 10-byte
    // header (flags bit 0x10), 8 payload bytes, 10-byte '3DI' footer
    // NOT counted by the syncsafe size — frames start at 28
    val frames = Mp3Fixture.mp3(0).drop(10 + Mp3Fixture.tagPayload(0))
    val tag = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0x10, 0, 0, 0, 8) ++ Array.fill[Byte](8)(0x11) ++
      ("3DI".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0x10, 0, 0, 0, 8))
    val got = AvHeaders.mp3Frames(tag ++ frames)
    assert(got.size == Mp3Fixture.nFrames(0), s"got $got")
    assert(got.head._1 == 28, s"got $got")
    // without the footer bonus the walk would land on '3DI' and emit 0
    val noFooterFlag = (tag ++ frames).clone()
    noFooterFlag(5) = 0 // claim no footer: frames now "start" at 18
    assert(AvHeaders.mp3Frames(noFooterFlag).isEmpty)
  }

  test("stts prefix sums: zero-count runs contribute no ticks") {
    // normal coverage: two runs, exact prefix sums
    assert(AvHeaders.sttsStartTicks(Array((2L, 10L), (2L, 5L)), 4).toSeq ==
      Seq(0L, 10L, 20L, 25L))
    // a degenerate sample_count=0 run between real runs must not
    // shift subsequent samples by its delta
    assert(AvHeaders.sttsStartTicks(Array((1L, 10L), (0L, 999L), (2L, 5L)), 3).toSeq ==
      Seq(0L, 10L, 15L))
    // leading zero-count run: first sample still starts at 0 on the
    // first REAL run's clock
    assert(AvHeaders.sttsStartTicks(Array((0L, 999L), (2L, 7L)), 2).toSeq ==
      Seq(0L, 7L))
    // tolerance preserved: samples past stts coverage reuse the last
    // run's delta
    assert(AvHeaders.sttsStartTicks(Array((1L, 10L)), 3).toSeq ==
      Seq(0L, 10L, 20L))
    assert(AvHeaders.sttsStartTicks(Array.empty[(Long, Long)], 2).toSeq ==
      Seq(0L, 0L))
  }

  test("fragmented MP4 time axis: tfdt + trex durations match the shared clock") {
    import graft.tools.AvcMp4Fixture
    for (id <- Seq(0L, 1L, 2L, 5L, 6L)) {
      val bytes = AvcMp4Fixture.fragMp4(id)
      val delta = AvcMp4Fixture.fragDelta(id)
      val got = AvHeaders.mp4FragmentSyncSampleTimes(bytes)
      val plain = AvHeaders.mp4FragmentSyncSamples(bytes)
      assert(got.map(t => (t._1, t._2, t._3)) == plain, s"id=$id")
      // fragment i's tfdt anchors sample i at i·delta ticks @ 90 kHz
      got.foreach { case (sn, _, _, tMs) =>
        assert(tMs == (sn - 1) * delta * 1000L / 90000L, s"id=$id sn=$sn got $tMs")
      }
      // both layouts agree on the keyframe clock — the pairing op can
      // take either time table
      val self = AvHeaders.mp4SyncSampleTimes(AvcMp4Fixture.mp4(id))
        .map(t => (t._1, t._4)).toMap
      got.foreach { case (sn, _, _, tMs) =>
        assert(self.get(sn).contains(tMs), s"id=$id sn=$sn layouts disagree")
      }
    }
    assert(AvHeaders.mp4FragmentSyncSampleTimes(AvcMp4Fixture.fragRow(3)._2).isEmpty)
    assert(AvHeaders.mp4FragmentSyncSampleTimes(AvcMp4Fixture.fragRow(7)._2).isEmpty)
  }

  test("FLAC: STREAMINFO unpack + sync-scan frames match the fixture contract") {
    import graft.tools.FlacFixture
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L)) {
      val bytes = FlacFixture.flac(id)
      val si = AvHeaders.flacStreamInfo(bytes)
      assert(si.contains((FlacFixture.audioOffset(id), FlacFixture.sampleRate(id),
        FlacFixture.channels(id), 16, FlacFixture.totalSamples(id))), s"id=$id got $si")
      val s0 = FlacFixture.frameSize0(id)
      val aoff = FlacFixture.audioOffset(id)
      val expect = (0 until FlacFixture.nFrames(id)).map { i =>
        (aoff + i * s0 + 8 * (i * (i - 1) / 2), s0 + 8 * i)
      }
      val got = AvHeaders.flacFrames(bytes)
      assert(got == expect, s"id=$id got $got")
    }
    // header-only: STREAMINFO parses, zero frames
    val ho = FlacFixture.headerOnly(3)
    assert(AvHeaders.flacStreamInfo(ho).nonEmpty)
    assert(AvHeaders.flacFrames(ho).isEmpty)
    // junk / truncation / null: nothing parses
    assert(AvHeaders.flacStreamInfo(FlacFixture.row(7)._2).isEmpty)
    assert(AvHeaders.flacFrames(FlacFixture.row(7)._2).isEmpty)
    assert(AvHeaders.flacStreamInfo(FlacFixture.flac(0).take(30)).isEmpty)
    assert(AvHeaders.flacStreamInfo(null).isEmpty)
    // a metadata chain that never sets the last-block flag: truncated
    val noLast = FlacFixture.flac(0).clone()
    noLast(42) = (noLast(42) & 0x7f).toByte // clear the comment's last flag
    assert(AvHeaders.flacStreamInfo(noLast).isEmpty)
  }

  test("WebM timestamp scale: read from Info, default 1e6, 1ms ticks convert") {
    import graft.tools.WebmFixture
    assert(AvHeaders.webmTimestampScale(WebmFixture.webm(0)) == 1000000L)
    assert(AvHeaders.webmTimestampScale(WebmFixture.row(7)._2) == 1000000L) // junk → default
    assert(AvHeaders.webmTimestampScale(null) == 1000000L)
    // with the fixture's 1e6 scale, t_ms == ticks == i·40
    for (id <- Seq(0L, 1L, 5L)) {
      val blocks = AvHeaders.webmBlocks(WebmFixture.webm(id))
      blocks.foreach { case (bi, _, ticks, _, _, _) =>
        assert(ticks == (bi - 1) * 40, s"id=$id block=$bi")
      }
    }
  }

  test("Ogg granule clock: Opus 48k minus pre-skip, Vorbis stream rate, junk None") {
    import graft.tools.OggFixture
    assert(AvHeaders.oggGranuleClock(OggFixture.row(0)._2) // Opus
      .contains((48000L, OggFixture.preSkip(0).toLong)))
    assert(AvHeaders.oggGranuleClock(OggFixture.row(1)._2) // Vorbis
      .contains((OggFixture.vorbisRate(1).toLong, 0L)))
    assert(AvHeaders.oggGranuleClock(OggFixture.row(7)._2).isEmpty)
    assert(AvHeaders.oggGranuleClock(null).isEmpty)
    assert(AvHeaders.oggGranuleClock(Array.emptyByteArray).isEmpty)
  }

  test("MPEG-TS walk: PES starts match the fixture contract, decoys excluded") {
    import graft.tools.TsFixture
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L)) {
      val bytes = TsFixture.ts(id)
      val f = TsFixture.pktsPerPes(id)
      val k = TsFixture.raiInterval(id)
      val got = AvHeaders.tsPesStarts(bytes)
      val expect = (0 until TsFixture.nPes(id)).map { i =>
        val pkt = 2 + i * (f + 1)
        (pkt, 188L * pkt, TsFixture.VideoPid, i % k == 0, true)
      }
      assert(got == expect, s"id=$id got $got")
    }
    // the PTS face decodes the marker-bit clock: 40 ms per PES
    for (id <- Seq(0L, 1L, 5L)) {
      val pts = AvHeaders.tsPesStartsPts(TsFixture.ts(id))
      pts.zipWithIndex.foreach { case ((_, _, _, _, isPes, tMs), i) =>
        assert(isPes && tMs == TsFixture.ptsMs(id, i), s"id=$id i=$i got $tMs")
      }
    }
    // a PES header without PTS (flags2 bit clear) answers -1, not junk
    val noPts = TsFixture.ts(0).clone()
    // packet 2 is the first video PES start; its flags2 byte is at
    // offset 2*188 + 6(AF) + 7 = payload+7
    noPts(2 * 188 + 6 + 7) = 0
    assert(AvHeaders.tsPesStartsPts(noPts).head._6 == -1L)
    // truncated / junk rows: nothing parses
    assert(AvHeaders.tsPesStarts(TsFixture.row(3)._2).isEmpty)
    assert(AvHeaders.tsPesStarts(TsFixture.row(7)._2).isEmpty)
    assert(AvHeaders.tsPesStarts(Array.emptyByteArray).isEmpty)
    assert(AvHeaders.tsPesStarts(null).isEmpty)
    // a PAT-less grid (PSI packets blanked to null PID 0x1FFF): no rows
    val noPsi = TsFixture.ts(0)
    noPsi(1) = 0x1f; noPsi(2) = 0xff.toByte // PAT packet → null PID
    assert(AvHeaders.tsPesStarts(noPsi).isEmpty)
    // partial trailing packet is ignored, not walked off the end
    val partial = TsFixture.ts(0) ++ Array[Byte](0x47, 0x01)
    assert(AvHeaders.tsPesStarts(partial) == AvHeaders.tsPesStarts(TsFixture.ts(0)))
  }

  test("Ogg page walk: multi-page coordinates, lacing spans, flags; truncation stops clean") {
    def le32b(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le64b(v: Long) = le32b(v & 0xffffffffL) ++ le32b(v >>> 32)
    def page(headerType: Int, granule: Long, seq: Int, payload: Array[Byte]): Array[Byte] = {
      val full = payload.length / 255
      val segTable = Array.fill[Byte](full)(255.toByte) :+ (payload.length % 255).toByte
      "OggS".getBytes("US-ASCII") ++ Array[Byte](0, headerType.toByte) ++
        le64b(granule) ++ le32b(9999) ++ le32b(seq) ++ le32b(0) ++
        Array((full + 1).toByte) ++ segTable ++ payload
    }
    // three pages, the middle one's payload > 255 bytes (multi-lacing)
    val p0 = page(2, 0L, 0, new Array[Byte](30))
    val p1 = page(0, 1000L, 1, new Array[Byte](300)) // 2 lacing entries
    val p2 = page(4, 2000L, 2, new Array[Byte](7))
    val bytes = p0 ++ p1 ++ p2
    val got = AvHeaders.oggPages(bytes)
    val expect = Seq(
      (0, 0, p0.length, 0L, 2),
      (1, p0.length, p1.length, 1000L, 0),
      (2, p0.length + p1.length, p2.length, 2000L, 4))
    assert(got == expect, s"got $got")
    // truncation mid-page-3 keeps the first two pages
    assert(AvHeaders.oggPages(bytes.dropRight(3)) == expect.take(2))
    // the fixture's streams walk to exactly their two pages, and the
    // page sizes tile the blob completely
    val full = graft.tools.OggFixture.row(0)._2
    val pages = AvHeaders.oggPages(full)
    assert(pages.size == 2 && pages.map(_._3).sum == full.length)
    assert(pages.head._5 == 2 && pages.last._5 == 4) // BOS then EOS
    assert(AvHeaders.oggPages(graft.tools.OggFixture.row(7)._2).isEmpty)
  }

  test("MP3 frame walk: fixture contract coordinates, meta fields, MPEG2 rates; tag-only emits nothing") {
    import graft.tools.Mp3Fixture
    import Multimodal.AvHeaders
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L)) {
      val bytes = Mp3Fixture.mp3(id)
      val s = Mp3Fixture.frameSize(id)
      val tag = 10 + Mp3Fixture.tagPayload(id)
      val got = AvHeaders.mp3Frames(bytes)
      assert(got == (0 until Mp3Fixture.nFrames(id)).map(i => (tag + i * s, s)),
        s"id=$id got $got")
      // frame sizes tile the payload completely
      assert(tag + got.map(_._2).sum == bytes.length)
      val meta = AvHeaders.avMeta(bytes).get
      assert(meta.format == "mp3")
      assert(meta.sampleRate.contains(48000))
      assert(meta.channels.contains(if (Mp3Fixture.mono(id)) 1 else 2))
      // MPEG1 Layer III: 1152 samples per frame on the 48 kHz clock
      assert(meta.durationMs.contains(Mp3Fixture.nFrames(id) * 1152L * 1000 / 48000))
    }
    // tag-only and junk parse to nothing
    assert(AvHeaders.mp3Frames(Mp3Fixture.row(3)._2).isEmpty)
    assert(AvHeaders.avMeta(Mp3Fixture.row(3)._2).isEmpty)
    assert(AvHeaders.mp3Frames(Mp3Fixture.row(7)._2).isEmpty)
    // hand-built MPEG2 Layer III at 24 kHz, 64 kbps: half formula,
    // 576 samples/frame — 72000*64/24000 = 192-byte frames
    val h2 = Array[Byte](0xff.toByte, 0xf3.toByte, // MPEG2, L3, no CRC
      ((8 << 4) | (1 << 2)).toByte, 0) // brIdx 8 = 64kbps, srIdx 1 = 24000
    val f2 = h2 ++ new Array[Byte](188)
    val two = f2 ++ f2
    assert(AvHeaders.mp3Frames(two) == Seq((0, 192), (192, 192)))
    val m2 = AvHeaders.parseMp3(two).get
    assert(m2.sampleRate.contains(24000))
    assert(m2.durationMs.contains(2 * 576L * 1000 / 24000))
    // a SINGLE valid frame is NOT identified as mp3 (random 0xFF-led
    // bytes must not sneak in)
    assert(AvHeaders.parseMp3(f2).isEmpty)
  }

  test("frameSample: MP3 payloads chunk on frame boundaries, not fixed-size bytes") {
    import spark.implicits._
    import graft.tools.Mp3Fixture
    val id = 2L // nf = 4
    val rows = Seq((1L, "audio/mpeg", Mp3Fixture.mp3(id)))
      .toDF("media_id", "mime_type", "media")
    val frames = Multimodal.frameSample(spark, rows, everyN = 1).collect()
      .sortBy(_.frame_idx)
    assert(frames.length == Mp3Fixture.nFrames(id))
    frames.foreach { f =>
      assert(!f.decoded) // samples not decoded — but the cut is real
      assert(f.frame.length == Mp3Fixture.frameSize(id))
      assert((f.frame(0) & 0xff) == 0xff && (f.frame(1) & 0xe0) == 0xe0)
    }
  }

  test("AAC/ADTS frame walk: explicit lengths tile the stream; meta fields; tag-only emits nothing") {
    import graft.tools.AacFixture
    import Multimodal.AvHeaders
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L)) {
      val bytes = AacFixture.aac(id)
      val l = AacFixture.frameLen(id)
      val tag = 10 + AacFixture.tagPayload(id)
      val got = AvHeaders.adtsFrames(bytes)
      assert(got == (0 until AacFixture.nFrames(id)).map(i => (tag + i * l, l)),
        s"id=$id got $got")
      assert(tag + got.map(_._2).sum == bytes.length)
      val meta = AvHeaders.avMeta(bytes).get
      assert(meta.format == "aac")
      assert(meta.channels.contains(AacFixture.channels(id)))
      val sr = Seq(48000, 44100, 32000)((id % 3).toInt)
      assert(meta.sampleRate.contains(sr))
      assert(meta.durationMs.contains(AacFixture.nFrames(id) * 1024L * 1000 / sr))
    }
    assert(AvHeaders.adtsFrames(AacFixture.row(3)._2).isEmpty)
    assert(AvHeaders.avMeta(AacFixture.row(3)._2).isEmpty)
    assert(AvHeaders.adtsFrames(AacFixture.row(7)._2).isEmpty)
    // the two magic-less walks never cross-identify: MP3 bytes are not
    // ADTS (layer bits) and ADTS bytes are not MP3 (reserved layer)
    assert(AvHeaders.adtsFrames(graft.tools.Mp3Fixture.mp3(0)).isEmpty)
    assert(AvHeaders.mp3Frames(AacFixture.aac(0)).isEmpty)
    assert(AvHeaders.avMeta(graft.tools.Mp3Fixture.mp3(0)).get.format == "mp3")
  }

  test("EXIF walk: fixture contract fields; MM byte order; inline short ASCII; no-EXIF is all-None") {
    import graft.tools.ExifFixture
    import Multimodal.ImageHeaders
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 13L)) {
      val m = ImageHeaders.exifMeta(ExifFixture.jpeg(id))
      assert(m.orientation.contains(ExifFixture.orientation(id)), s"id=$id")
      assert(m.dateTime.contains(ExifFixture.dateTime(id)), s"id=$id")
      assert(m.make.contains(ExifFixture.make(id)), s"id=$id")
    }
    assert(ImageHeaders.exifMeta(ExifFixture.noExif()) ==
      ImageHeaders.ExifMeta(None, None, None))
    assert(ImageHeaders.exifMeta(graft.tools.AvFixture.junk(7)) ==
      ImageHeaders.ExifMeta(None, None, None))
    // hand-built MM (big-endian) TIFF with an INLINE 4-byte ASCII Make
    // ("ab" + NUL padded: count 3 <= 4 sits in the value field) and
    // orientation in the BE16 halves — the paths the II fixture misses
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def be32(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val entries =
      be16(0x010f) ++ be16(2) ++ be32(3) ++ "ab".getBytes :+ 0.toByte :+ 0.toByte
    val entries2 = entries ++
      (be16(0x0112) ++ be16(3) ++ be32(1) ++ be16(6) ++ be16(0))
    val tiff = "MM".getBytes ++ be16(42) ++ be32(8) ++
      be16(2) ++ entries2 ++ be32(0)
    val app1 = "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff
    val bytes = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte) ++
      be16(app1.length + 2) ++ app1 ++ Array[Byte](0xff.toByte, 0xd9.toByte)
    val mm = ImageHeaders.exifMeta(bytes)
    assert(mm == ImageHeaders.ExifMeta(Some(6), None, Some("ab")), s"got $mm")
  }

  test("WebM SimpleBlock walk: fixture contract coordinates, flags, times; init-only emits nothing") {
    import graft.tools.WebmFixture
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L)) {
      val bytes = WebmFixture.webm(id)
      val s = WebmFixture.frameSize(id)
      val k = WebmFixture.syncInterval(id)
      val got = AvHeaders.webmBlocks(bytes)
      val expect = (0 until WebmFixture.nFrames(id)).map { i =>
        ((i + 1).toLong, 1L, i * 40L, 54 + i * (s + 14) + 14, s, i % k == 0)
      }
      assert(got == expect, s"id=$id got $got")
      // the SAME file's metadata face still parses dims + duration
      val meta = AvHeaders.parseWebm(bytes).get
      assert(meta.width.contains(WebmFixture.width(id)))
      assert(meta.height.contains(WebmFixture.height(id)))
      assert(meta.durationMs.contains(WebmFixture.nFrames(id) * 40L))
      // init-only: segment size claims clusters that aren't there —
      // clamp and emit nothing, never a throw
      assert(AvHeaders.webmBlocks(WebmFixture.truncated(id)).isEmpty)
    }
    assert(AvHeaders.webmBlocks(graft.tools.AvFixture.junk(7)).isEmpty)
  }

  test("WebM SimpleBlock walk general paths: two blocks per cluster, track 2, nonzero relTs, unknown-size segment") {
    // hand-built beyond the fixture's one-block-per-cluster layout
    def ebml(id: Long, payload: Array[Byte]): Array[Byte] = {
      var n = 1
      while ((id >>> (8 * n)) != 0) n += 1
      val idBytes = Array.tabulate[Byte](n)(i => (id >>> (8 * (n - 1 - i))).toByte)
      idBytes ++ Array((payload.length | 0x80).toByte) ++ payload
    }
    def beUintBytes(v: Long): Array[Byte] = {
      var n = 1
      while ((v >>> (8 * n)) != 0) n += 1
      Array.tabulate[Byte](n)(i => (v >>> (8 * (n - 1 - i))).toByte)
    }
    def sb(track: Int, rel: Int, flags: Int, frame: Array[Byte]): Array[Byte] =
      ebml(0xa3L, Array[Byte]((0x80 | track).toByte,
        (rel >> 8).toByte, rel.toByte, flags.toByte) ++ frame)
    val f1 = Array.fill[Byte](10)(1)
    val f2 = Array.fill[Byte](20)(2)
    val clusterPayload = ebml(0xe7L, beUintBytes(500L)) ++
      sb(1, 0, 0x80, f1) ++ sb(2, -40, 0x00, f2)
    val cluster = ebml(0x1f43b675L, clusterPayload)
    val header = ebml(0x1a45dfa3L, ebml(0x4282L, "webm".getBytes("US-ASCII")))
    // Segment with UNKNOWN size (all-ones 1-byte vint 0xFF): streamed
    // WebM ships this — must clamp to the buffer
    val segment = Array[Byte](0x18, 0x53, 0x80.toByte, 0x67, 0xff.toByte) ++ cluster
    val bytes = header ++ segment
    val got = AvHeaders.webmBlocks(bytes)
    val c0 = header.length + 5 // cluster element start
    // cluster: id(4) size(1) ts(2+2=4: value 500 is 2 bytes) = 9 to 1st sb
    val sb1Frame = c0 + 4 + 1 + (1 + 1 + 2) + (1 + 1 + 4)
    val sb2Frame = sb1Frame + 10 + (1 + 1 + 4)
    assert(got == Seq(
      (1L, 1L, 500L, sb1Frame, 10, true),
      (2L, 2L, 460L, sb2Frame, 20, false)), s"got $got")
  }

  test("frameSample: H.26x MP4s emit exact keyframe samples, not arbitrary byte chunks") {
    import spark.implicits._
    import graft.tools.AvcMp4Fixture
    val id = 2L // nf = 4, k = 3 → keyframes at samples 1, 4
    val rows = Seq(
      (1L, "video/mp4", AvcMp4Fixture.mp4(id)),
      (2L, "video/mp4", AvcMp4Fixture.fragMp4(id)))
      .toDF("media_id", "mime_type", "media")
    val frames = Multimodal.frameSample(spark, rows, everyN = 1).collect()
    for (mid <- Seq(1L, 2L)) {
      val fs = frames.filter(_.media_id == mid).sortBy(_.frame_idx)
      assert(fs.length == 2, s"media $mid: ${fs.length} keyframe chunks")
      fs.foreach { f =>
        // pixels aren't decoded — but each chunk is the EXACT IDR
        // sample: AVCC length prefix covering the rest, IDR NAL header
        assert(!f.decoded)
        assert(f.frame.length == AvcMp4Fixture.sampleSize(id))
        assert((f.frame(4) & 0x1f) == 5, s"media $mid idx ${f.frame_idx} not IDR")
      }
    }
  }

  test("fragmented MP4 general paths: trex/tfhd defaults, first-sample-flags, base-data-offset, trun continuation") {
    // the shapes real muxers emit that the fixture's one-sample-per-trun
    // layout doesn't: CMAF classic (sizes from trex defaults, sync via
    // first-sample-flags + non-sync tfhd/trex default), an explicit
    // 64-bit base_data_offset, and a SECOND trun without
    // data-offset-present that must continue after the first trun's
    // samples instead of resetting to base
    def be32(v: Long): Array[Byte] =
      Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def fcc(s: String) = s.getBytes("US-ASCII")
    def bx(t: String, p: Array[Byte]): Array[Byte] = be32(p.length + 8L) ++ fcc(t) ++ p
    def full(t: String, p: Array[Byte]): Array[Byte] = bx(t, Array[Byte](0, 0, 0, 0) ++ p)
    val S = 20L // trex default_sample_size
    val SYNC = 0x02000000L
    val NONSYNC = 0x01010000L
    val ftyp = bx("ftyp", fcc("isom") ++ be32(512))
    val stsd = full("stsd", be32(1) ++ bx("avc1", new Array[Byte](78)))
    val stblE = bx("stbl", stsd ++ full("stsz", be32(0) ++ be32(0)) ++
      full("stsc", be32(0)) ++ full("stco", be32(0)))
    val trak = bx("trak",
      full("tkhd", be32(0) ++ be32(0) ++ be32(1)) ++ // track_ID 1
        bx("mdia", bx("minf", stblE)))
    val trex = full("trex", be32(1) ++ be32(1) ++ be32(1000) ++
      be32(S) ++ be32(NONSYNC)) // default size 20, default flags non-sync
    val moov = bx("moov", trak ++ bx("mvex", trex))

    // moof1 — CMAF classic: default-base-is-moof, NO sizes or flags in
    // the trun (trex default size; first-sample-flags sync, trex
    // default non-sync for the rest), 4 samples
    val tfhd1 = bx("tfhd", Array[Byte](0, 2, 0, 0) ++ be32(1))
    def trun1of(off: Long) = bx("trun",
      Array[Byte](0, 0, 0, 5) ++ be32(4) ++ be32(off) ++ be32(SYNC))
    val moofLen1 = 8 + 16 + (8 + tfhd1.length + trun1of(0).length)
    val moof1 = bx("moof", full("mfhd", be32(1)) ++
      bx("traf", tfhd1 ++ trun1of(moofLen1 + 8L)))
    assert(moof1.length == moofLen1)
    val mdat1 = bx("mdat", new Array[Byte](4 * S.toInt))

    // moof2 — explicit base_data_offset (absolute), trun A with
    // data-offset 0 + per-sample flags (sync, non-sync), trun B
    // WITHOUT data-offset (+ per-sample flags sync, sync): must
    // continue at base + 2·S
    def moof2of(base: Long): Array[Byte] = {
      val tfhd2 = bx("tfhd", Array[Byte](0, 0, 0, 1) ++ be32(1) ++ be64(base))
      val trunA = bx("trun", Array[Byte](0, 0, 4, 1) ++ be32(2) ++ be32(0) ++
        be32(SYNC) ++ be32(NONSYNC))
      val trunB = bx("trun", Array[Byte](0, 0, 4, 0) ++ be32(2) ++
        be32(SYNC) ++ be32(SYNC))
      bx("moof", full("mfhd", be32(2)) ++ bx("traf", tfhd2 ++ trunA ++ trunB))
    }
    val moof2Len = moof2of(0).length
    val head = ftyp ++ moov ++ moof1 ++ mdat1
    val base2 = head.length + moof2Len + 8 // mdat2 payload, absolute
    val bytes = head ++ moof2of(base2) ++ bx("mdat", new Array[Byte](4 * S.toInt))

    val m1 = ftyp.length + moov.length
    val got = AvHeaders.mp4FragmentSyncSamples(bytes)
    val expect = Seq(
      (1L, m1 + moofLen1 + 8, S.toInt), // CMAF: only the first sample is sync
      (5L, base2, S.toInt), // trun A sample 1 (global numbering continues)
      (7L, base2 + 2 * S.toInt, S.toInt), // trun B continues after trun A
      (8L, base2 + 3 * S.toInt, S.toInt))
    assert(got == expect, s"got $got")
  }

  test("frameSample: REAL MJPEG MP4 sample iteration with provenance, distinct luminance") {
    import spark.implicits._
    import graft.tools.MjpegMp4Fixture
    val id = 1L // nf = 3
    val rows = Seq((1L, "video/mp4", MjpegMp4Fixture.mp4(id)))
      .toDF("media_id", "mime_type", "media")
    val frames = Multimodal.frameSample(spark, rows, everyN = 1).collect()
      .sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == (0 until MjpegMp4Fixture.nFrames(id)))
    assert(frames.forall(_.decoded))
    val grids = frames.map(f => Multimodal.MediaCodec.decode(f.frame).toSeq).toSeq
    grids.sliding(2).foreach { pair =>
      assert(pair.head != pair.last,
        "consecutive MP4 samples decode to distinct luminance grids")
    }
  }

  test("frameSample: PCM/G.711 WAV slices into standalone decodable clips with real envelopes") {
    import spark.implicits._
    val wav = AvFixture.wavStep(1, 8000, 16, 320) // 40 ms: silence then full-scale
    val clips = AvHeaders.wavClips(wav, clipMs = 10) // 80 samples per clip
    assert(clips.size == 4)
    // every clip is a standalone WAV whose REAL envelope decodes: the
    // first two clips are the silent half, the last two full-scale —
    // byte chunks of the source could never each decode like this
    val envs = clips.map(c => Multimodal.MediaCodec.decodeAudio(c).get)
    envs.take(2).foreach(e => e.foreach(v => assert(math.abs(v) < 0.01f)))
    envs.drop(2).foreach(e => e.foreach(v => assert(math.abs(v - 1f) < 0.01f)))
    // sample conservation: the clips tile the data payload exactly
    assert(clips.map(_.length - 44).sum == 320 * 2)
    // G.711 mu-law clips stay decodable COMPRESSED audio
    val ulaw = AvFixture.ulawWavStep(1, 8000, 320)
    val uc = AvHeaders.wavClips(ulaw, clipMs = 20)
    assert(uc.size == 2)
    assert(Multimodal.MediaCodec.decodeAudio(uc(1)).get
      .forall(v => math.abs(v - 1f) < 0.05f))
    // the Dataset face emits them with decoded provenance
    val rows = Seq((1L, "audio/wav", wav)).toDF("media_id", "mime_type", "media")
    val frames = Multimodal.frameSample(spark, rows, everyN = 1, audioClipMs = 10)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 4 && frames.forall(_.decoded))
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
    // block codecs (IMA ADPCM, format 17) are NOT byte-sliceable —
    // wavClips refuses and the byte-chunk fallback applies
    assert(AvHeaders.wavClips(AvFixture.adpcmWavStep(1, 8000, 130), 10).isEmpty)
  }

  test("WAV parse: fmt fields, LIST-shifted chunk walk, duration from data/byte rate") {
    val plain = AvHeaders.avMeta(AvFixture.wav(8)).get // id%8==0: no LIST
    assert(plain.format == "wav")
    assert(plain.channels.contains(AvFixture.channels(8)))
    assert(plain.sampleRate.contains(AvFixture.sampleRate(8)))
    assert(plain.bitsPerSample.contains(AvFixture.bits(8)))
    val id = 12L // id%8==4: a LIST chunk sits between fmt and data
    val shifted = AvHeaders.avMeta(AvFixture.wav(id)).get
    val byteRate = AvFixture.sampleRate(id) * AvFixture.channels(id) * AvFixture.bits(id) / 8
    assert(shifted.durationMs.contains(AvFixture.dataLen(id).toLong * 1000L / byteRate))
    // a WAV with no data chunk still yields fmt fields, no duration
    val noData = AvHeaders.avMeta(AvFixture.wav(8).take(36)).get
    assert(noData.sampleRate.contains(AvFixture.sampleRate(8)) && noData.durationMs.isEmpty)
  }

  test("GIF and BMP parse, including GIF87a and top-down negative BMP heights") {
    val gif = AvHeaders.avMeta(AvFixture.gif(1)).get // GIF89a
    assert(gif == Multimodal.AvMeta("gif",
      width = Some(AvFixture.width(1)), height = Some(AvFixture.height(1))))
    assert(AvHeaders.avMeta(AvFixture.gif(13)).get.format == "gif") // id%8==5: GIF87a
    val bmp = AvHeaders.avMeta(AvFixture.bmp(2)).get
    assert(bmp.width.contains(AvFixture.width(2)) && bmp.height.contains(AvFixture.height(2)))
    val topDown = AvHeaders.avMeta(AvFixture.bmp(14)).get // id%8==6: height < 0
    assert(topDown.height.contains(AvFixture.height(14)))
  }

  test("decoder boundary is TOTAL: random and mutated-container bytes never throw") {
    // at corpus scale a throwing row loses a partition — every decode
    // entry point must be total over arbitrary bytes. Fuzz with
    // deterministic random blobs plus real containers with corrupted
    // tails (the nastier case: valid magic, lying interior).
    val rng = new scala.util.Random(42)
    val blobs = (0 until 200).map { i =>
      val b = new Array[Byte](rng.nextInt(200))
      rng.nextBytes(b)
      b
    } ++ Seq(
      MediaFixture.png(64, 64), MediaFixture.jpeg(32, 32),
      AvFixture.wav(0), AvFixture.gif(1), AvFixture.bmp(2),
      AvFixture.wavStep(1, 8000, 16, 64),
      MediaFixture.realImage(8, 8, "png"),
      AvFixture.animatedGif(8, 8, 2),
      AvFixture.aiffStep(1, 8000, 64),
      AvFixture.auStep(1, 8000, 64),
      AvFixture.ulawWavStep(1, 8000, 64),
      AvFixture.alawWavStep(1, 8000, 64),
      AvFixture.adpcmWavStep(2, 8000, 130),
      AvFixture.oggOpus(2, 48000, 500), AvFixture.oggVorbis(1, 44000, 500),
      AvFixture.webm(640, 360, 1000, audioCh = 2, audioRate = 48000),
      Mp4Fixture.mp4(0), Mp4Fixture.mp4(5), Mp4Fixture.truncated(),
      AviFixture.avi(0), AviFixture.avi(4), AviFixture.headerOnly(3),
      graft.tools.MjpegMp4Fixture.mp4(0), graft.tools.MjpegMp4Fixture.mp4(4),
      graft.tools.AvcMp4Fixture.mp4(0), graft.tools.AvcMp4Fixture.mp4(5),
      graft.tools.AvcMp4Fixture.fragMp4(0), graft.tools.AvcMp4Fixture.fragMp4(5),
      graft.tools.WebmFixture.webm(0), graft.tools.OggFixture.row(0)._2,
      graft.tools.Mp3Fixture.mp3(0), graft.tools.ExifFixture.jpeg(0),
      graft.tools.AacFixture.aac(0), graft.tools.TsFixture.ts(0),
      graft.tools.FlacFixture.flac(0)
    ).flatMap { base =>
      (0 until 8).map { _ =>
        val m = base.clone()
        // corrupt 1-3 random bytes anywhere, including length fields
        (0 until 1 + rng.nextInt(3)).foreach { _ =>
          if (m.nonEmpty) m(rng.nextInt(m.length)) = rng.nextInt(256).toByte
        }
        m
      }
    }
    blobs.foreach { b =>
      val f = Multimodal.MediaCodec.decode(b) // must not throw
      assert(f.length == Multimodal.MediaCodec.FeatureDim)
      Multimodal.MediaCodec.decodeAudio(b).foreach(e =>
        assert(e.forall(x => x >= 0f && x <= 1f + 1e-6f)))
      Multimodal.ImageHeaders.imageMeta(b)    // must not throw
      Multimodal.AvHeaders.avMeta(b)          // must not throw
      Multimodal.AvHeaders.aviVideoChunks(b)  // must not throw
      Multimodal.AvHeaders.mp4VideoSamples(b) // must not throw
      Multimodal.AvHeaders.mp4SyncSamples(b)  // must not throw
      Multimodal.AvHeaders.mp4FragmentSyncSamples(b) // must not throw
      Multimodal.AvHeaders.oggPages(b)        // must not throw
      Multimodal.AvHeaders.webmBlocks(b)      // must not throw
      Multimodal.ImageHeaders.exifMeta(b)     // must not throw
      Multimodal.AvHeaders.mp3Frames(b)       // must not throw
      Multimodal.AvHeaders.adtsFrames(b)      // must not throw
      Multimodal.AvHeaders.tsPesStarts(b)     // must not throw
      Multimodal.AvHeaders.flacStreamInfo(b)  // must not throw
      Multimodal.AvHeaders.oggGranuleClock(b) // must not throw
      Multimodal.AvHeaders.webmTimestampScale(b) // must not throw
      Multimodal.AvHeaders.flacFrames(b)      // must not throw
      Multimodal.AvHeaders.mp4SyncSampleTimes(b) // must not throw
      Multimodal.AvHeaders.wavClips(b, 10)    // must not throw
      Multimodal.MediaCodec.decodeGifFrames(b) // must not throw
      Multimodal.MediaCodec.decodeAudioSampled(b) // must not throw
    }
  }

  test("unparseable AV bytes are None, never an exception") {
    assert(AvHeaders.avMeta(AvFixture.truncatedWav()).isEmpty)
    assert(AvHeaders.avMeta(AvFixture.junk(7)).isEmpty)
    assert(AvHeaders.avMeta(Array.emptyByteArray).isEmpty)
    assert(AvHeaders.avMeta(null).isEmpty)
    // RIFF/WAVE but a corrupt negative chunk length: the walk aborts
    val corrupt = AvFixture.wav(8)
    corrupt(19) = 0xff.toByte // fmt chunk length high byte → negative
    assert(AvHeaders.avMeta(corrupt).isEmpty)
    // a POSITIVE chunk length near Int.MaxValue passes the negative-length
    // check but would wrap the walk index negative — must be None, not an
    // ArrayIndexOutOfBoundsException
    val huge = new Array[Byte](64)
    "RIFF".getBytes("US-ASCII").copyToArray(huge, 0)
    "WAVE".getBytes("US-ASCII").copyToArray(huge, 8)
    "JUNK".getBytes("US-ASCII").copyToArray(huge, 12)
    huge(16) = 0xf0.toByte; huge(17) = 0xff.toByte
    huge(18) = 0xff.toByte; huge(19) = 0x7f.toByte // len = 0x7ffffff0
    assert(AvHeaders.avMeta(huge).isEmpty)
  }

  test("audio decode: REAL AIFF and AU sample decode, direct parser vs JDK stack parity") {
    // the same silence→full-scale step as the WAV case, but stored
    // big-endian in AIFF/AU containers. The direct parsers decode it
    // lock-free; the AudioSystem residual path must agree with them
    // (two independent implementations of the same public formats).
    for ((name, bytes) <- Seq(
      "aiff mono" -> AvFixture.aiffStep(1, 8000, 320),
      "aiff stereo" -> AvFixture.aiffStep(2, 8000, 320),
      "au mono" -> AvFixture.auStep(1, 8000, 320))) {
      val env = Multimodal.MediaCodec.decodeAudio(bytes)
      assert(env.isDefined, s"$name did not decode on the direct path")
      val e = env.get
      (0 until 8).foreach(i => assert(math.abs(e(i)) < 0.01f, s"$name cell $i = ${e(i)}"))
      (8 until 16).foreach(i => assert(math.abs(e(i) - 1f) < 0.01f, s"$name cell $i = ${e(i)}"))
      val viaJdk = Multimodal.MediaCodec.decodeAudioSampled(bytes)
      assert(viaJdk.isDefined, s"$name did not decode via AudioSystem")
      e.zip(viaJdk.get).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 1e-4f, s"$name cell $i direct=$a jdk=$b") }
      assert(Multimodal.MediaCodec.decode(bytes).toSeq == e.toSeq, name)
    }
  }

  test("audio decode: G.711 mu-law and A-law WAV are REAL compressed-codec decode paths") {
    for ((name, bytes, tag) <- Seq(
      ("mu-law", AvFixture.ulawWavStep(1, 8000, 320), 7),
      ("a-law", AvFixture.alawWavStep(2, 8000, 320), 6))) {
      val meta = AvHeaders.avMeta(bytes)
      assert(meta.exists(_.format == "wav"), name) // RIFF walk reads the header
      // the direct path DECOMPRESSES the companded payload through the
      // G.711 expansion tables: logarithmic quantisation keeps
      // full-scale within ~2%
      val env = Multimodal.MediaCodec.decodeAudio(bytes)
      assert(env.isDefined, s"$name WAV did not decode")
      val e = env.get
      (0 until 8).foreach(i => assert(math.abs(e(i)) < 0.02f, s"$name cell $i = ${e(i)}"))
      (8 until 16).foreach(i => assert(math.abs(e(i) - 1f) < 0.05f, s"$name cell $i = ${e(i)}"))
      assert(Multimodal.MediaCodec.decode(bytes).toSeq == e.toSeq, name)
      // the JDK's own G.711 decoder agrees with the table expansion
      // (via the ungated seam: the production gate keeps WAV off the
      // locked AudioSystem path since the direct parsers cover it)
      val viaJdk = Multimodal.MediaCodec.decodeAudioViaJdk(bytes)
      assert(viaJdk.isDefined, s"$name did not decode via AudioSystem")
      e.zip(viaJdk.get).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 1e-3f, s"$name cell $i direct=$a jdk=$b") }
    }
    // junk and truncated containers stay None on both audio paths
    assert(Multimodal.MediaCodec.decodeAudio(AvFixture.junk(5)).isEmpty)
    assert(Multimodal.MediaCodec.decodeAudioSampled(AvFixture.junk(5)).isEmpty)
    assert(Multimodal.MediaCodec.decodeAudioSampled(AvFixture.truncatedWav()).isEmpty)
    assert(Multimodal.MediaCodec.decodeAudioSampled(null).isEmpty)
  }

  test("IMA ADPCM WAV is a REAL compressed-codec decode path (mono and stereo)") {
    // 4-bit adaptive DPCM — a codec the JDK sound stack cannot read at
    // all; encoder and decoder share the standard's tables and must
    // round-trip the step envelope. The adaptive quantiser needs ~50
    // samples to slew from silence to full scale, so the cell holding
    // the step edge (8) is excluded; 5200 frames = 325 frames/cell
    // keeps the slew inside that one cell.
    for (ch <- Seq(1, 2)) {
      val bytes = AvFixture.adpcmWavStep(ch, 8000, frames = 5200)
      // the JDK cannot decode it; the metadata walk still reads fmt
      assert(Multimodal.MediaCodec.decodeAudioSampled(bytes).isEmpty, s"ch=$ch")
      val meta = AvHeaders.avMeta(bytes).get
      assert(meta.format == "wav" && meta.channels.contains(ch) &&
        meta.bitsPerSample.contains(4), s"ch=$ch")
      val env = Multimodal.MediaCodec.decodeAudio(bytes)
      assert(env.isDefined, s"ch=$ch ADPCM did not decode")
      val e = env.get
      (0 until 8).foreach(i => assert(math.abs(e(i)) < 0.01f, s"ch=$ch cell $i = ${e(i)}"))
      (9 until 16).foreach(i => assert(math.abs(e(i) - 1f) < 0.02f, s"ch=$ch cell $i = ${e(i)}"))
      assert(Multimodal.MediaCodec.decode(bytes).toSeq == e.toSeq, s"ch=$ch")
    }
    // corrupt block structure stays a fallback, never an exception
    val bad = AvFixture.adpcmWavStep(1, 8000, 130)
    bad(32) = 0x01 // blockAlign -> 1+... misaligned
    Multimodal.MediaCodec.decode(bad) // must not throw
  }

  test("G.711 expansion tables match the JDK codec on all 256 code points, both laws") {
    // one frame per code point: a mono companded WAV whose data chunk
    // is the bytes 0..255 — decode it through javax.sound's own G.711
    // decoder and through the direct table path, then compare the
    // per-frame amplitudes cell by cell. 256 frames over 16 cells =
    // 16 frames/cell, so any single-code-point disagreement larger
    // than rounding shows up in its cell mean.
    for ((name, tag) <- Seq("mu-law" -> 7, "a-law" -> 6)) {
      val codes = Array.tabulate[Byte](256)(_.toByte)
      val fmt = {
        def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
        def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(tag) ++ le16(1) ++
          le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8) ++
          "data".getBytes("US-ASCII") ++ le32(256) ++ codes
      }
      val wav = {
        def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
        "RIFF".getBytes("US-ASCII") ++ le32(4 + fmt.length) ++ "WAVE".getBytes("US-ASCII") ++ fmt
      }
      val direct = Multimodal.MediaCodec.decodeAudio(wav)
      val viaJdk = Multimodal.MediaCodec.decodeAudioViaJdk(wav)
      assert(direct.isDefined && viaJdk.isDefined, name)
      direct.get.zip(viaJdk.get).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 1e-4f, s"$name cell $i direct=$a jdk=$b") }
    }
  }

  test("Ogg parse: OpusHead 48kHz granule clock, Vorbis id header, truncation") {
    val opus = AvHeaders.avMeta(AvFixture.oggOpus(2, 48000, durMs = 2500)).get
    assert(opus.format == "opus")
    assert(opus.channels.contains(2))
    assert(opus.sampleRate.contains(48000))
    assert(opus.durationMs.contains(2500L)) // (granule - preSkip) on the 48kHz clock
    val vorbis = AvHeaders.avMeta(AvFixture.oggVorbis(1, 44000, durMs = 1500)).get
    assert(vorbis.format == "vorbis")
    assert(vorbis.channels.contains(1))
    assert(vorbis.sampleRate.contains(44000))
    assert(vorbis.durationMs.contains(1500L)) // granule on the stream's own clock
    // a first page with an unrecognised codec still identifies as ogg
    val unknown = AvHeaders.avMeta(
      AvFixture.oggOpus(1, 48000, 100).patch(28, "XXXXXXXX".getBytes("US-ASCII"), 8)).get
    assert(unknown == Multimodal.AvMeta("ogg"))
    // truncated mid-header: the magic alone still identifies the container
    val cut = AvHeaders.avMeta(AvFixture.oggOpus(1, 48000, 100).take(30))
    assert(cut.exists(_.format == "ogg"))
  }

  test("WebM parse: EBML varint walk, timestamp-scale duration, video and audio tracks") {
    val video = AvHeaders.avMeta(AvFixture.webm(1280, 720, durMs = 90000)).get
    assert(video.format == "webm")
    assert(video.width.contains(1280))
    assert(video.height.contains(720))
    assert(video.durationMs.contains(90000L)) // float ticks × scale / 1e6
    assert(video.channels.isEmpty && video.sampleRate.isEmpty)
    val av = AvHeaders.avMeta(
      AvFixture.webm(640, 360, durMs = 1234, audioCh = 2, audioRate = 48000)).get
    assert(av.width.contains(640) && av.height.contains(360))
    assert(av.channels.contains(2))
    assert(av.sampleRate.contains(48000))
    assert(av.durationMs.contains(1234L))
    // truncated mid-element: the magic still identifies the container,
    // fields found before the cut survive, no exception
    val cut = AvHeaders.avMeta(AvFixture.webm(1280, 720, 90000).take(20))
    assert(cut.exists(_.format == "webm"))
  }

  test("AIFF and AU header parse: COMM 80-bit extended rate, .snd BE words") {
    val aiff = AvHeaders.avMeta(AvFixture.aiffStep(2, 44100, 441)).get
    assert(aiff.format == "aiff")
    assert(aiff.channels.contains(2))
    assert(aiff.sampleRate.contains(44100)) // through the 80-bit extended float
    assert(aiff.bitsPerSample.contains(16))
    assert(aiff.durationMs.contains(10L)) // 441 frames / 44100 Hz
    val au = AvHeaders.avMeta(AvFixture.auStep(1, 8000, 4000)).get
    assert(au.format == "au")
    assert(au.channels.contains(1))
    assert(au.sampleRate.contains(8000))
    assert(au.bitsPerSample.contains(16))
    assert(au.durationMs.contains(500L)) // 4000 frames / 8000 Hz
  }

  test("MP4 box walk: v0 and v1 mvhd, free-box shift, 16.16 tkhd dims, truncation") {
    val v0 = AvHeaders.avMeta(Mp4Fixture.mp4(0)).get // id%4==0 → mvhd v0
    assert(v0.format == "mp4")
    assert(v0.width.contains(Mp4Fixture.width(0)))
    assert(v0.height.contains(Mp4Fixture.height(0)))
    assert(v0.durationMs.contains(
      Mp4Fixture.duration(0) * 1000L / Mp4Fixture.timescale(0)))
    val v1 = AvHeaders.avMeta(Mp4Fixture.mp4(5)).get // id%4==1 → mvhd v1
    assert(v1.width.contains(Mp4Fixture.width(5)))
    assert(v1.durationMs.contains(
      Mp4Fixture.duration(5) * 1000L / Mp4Fixture.timescale(5)))
    // ftyp-only (moov cut away in transfer): format proven, fields NULL
    val cut = AvHeaders.avMeta(Mp4Fixture.truncated()).get
    assert(cut == Multimodal.AvMeta("mp4"))
    // no ftyp at offset 4: not BMFF at all
    assert(AvHeaders.avMeta(Mp4Fixture.junk(7)).isEmpty)
    // a box whose declared size overruns the buffer stops the walk
    // (fields lost, no exception); the ftyp identity survives
    val overrun = Mp4Fixture.mp4(0)
    overrun(16) = 0x7f.toByte // free box size → huge
    assert(AvHeaders.avMeta(overrun).contains(Multimodal.AvMeta("mp4")))
    // size=0 (to-end) and size<8 (corrupt) boxes terminate cleanly
    val zeroSize = Mp4Fixture.mp4(0)
    zeroSize(16) = 0; zeroSize(17) = 0; zeroSize(18) = 0; zeroSize(19) = 0
    AvHeaders.avMeta(zeroSize) // must not throw
    val tiny = Mp4Fixture.mp4(0)
    tiny(19) = 4 // free box size 4 < 8: zero-progress guard trips
    AvHeaders.avMeta(tiny) // must not throw
  }

  test("avMetaTable parses the MP4 fixture rows per the generator's ground truth") {
    import spark.implicits._
    val rows = (0L until 64L).map { id =>
      val (mime, bytes) = Mp4Fixture.row(id)
      (id, mime, bytes)
    }
    val out = Multimodal.avMetaTable(spark, rows.toDF("media_id", "mime_type", "media"))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    (0L until 64L).foreach { id =>
      val r = out(id)
      if (id % 8 == 7) assert(r.isNullAt(r.fieldIndex("format")), s"id=$id")
      else if (id % 8 == 3) {
        assert(r.getAs[String]("format") == "mp4", s"id=$id")
        assert(r.isNullAt(r.fieldIndex("width")), s"id=$id")
        assert(r.isNullAt(r.fieldIndex("duration_ms")), s"id=$id")
      } else {
        assert(r.getAs[String]("format") == "mp4", s"id=$id")
        assert(r.getAs[Int]("width") == Mp4Fixture.width(id), s"id=$id")
        assert(r.getAs[Int]("height") == Mp4Fixture.height(id), s"id=$id")
        assert(r.getAs[Long]("duration_ms") ==
          Mp4Fixture.duration(id) * 1000L / Mp4Fixture.timescale(id), s"id=$id")
        assert(r.isNullAt(r.fieldIndex("channels")), s"id=$id")
      }
    }
  }

  test("multimodal faces run unchanged on streaming input (stateless map-side transforms)") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rows = (0L until 16L).map { id =>
      val (mime, bytes) = AvFixture.row(id)
      (id, mime, bytes)
    }
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Array[Byte])]
    // the SAME avMetaTable + extractFeatures calls, on a stream — the
    // mapPartitions decode boundary is stateless, so batch code IS the
    // streaming code (the claim the module scaladoc makes)
    val metaQ = Multimodal.avMetaTable(spark, stream.toDF().toDF("media_id", "mime_type", "media"))
      .writeStream.format("memory").queryName("mm_meta").outputMode("append").start()
    val featQ = Multimodal.extractFeatures(spark, stream.toDF().toDF("media_id", "mime_type", "media"))
      .writeStream.format("memory").queryName("mm_feat").outputMode("append").start()
    try {
      stream.addData(rows.take(8))
      metaQ.processAllAvailable(); featQ.processAllAvailable()
      stream.addData(rows.drop(8))
      metaQ.processAllAvailable(); featQ.processAllAvailable()
    } finally { metaQ.stop(); featQ.stop() }
    val streamedMeta = spark.table("mm_meta").collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[String]("format")).toMap
    val batchMeta = Multimodal.avMetaTable(spark, rows.toDF("media_id", "mime_type", "media"))
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[String]("format")).toMap
    assert(streamedMeta == batchMeta)
    val streamedFeat = spark.table("mm_feat").as[Multimodal.MediaFeatures].collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    rows.foreach { case (id, _, bytes) =>
      assert(streamedFeat(id) == Multimodal.MediaCodec.decode(bytes).toSeq, s"id=$id")
    }
  }

  test("avMetaTable parses the Ogg fixture rows per the generator's ground truth") {
    import spark.implicits._
    import graft.tools.OggFixture
    val rows = (0L until 64L).map { id =>
      val (mime, bytes) = OggFixture.row(id)
      (id, mime, bytes)
    }
    val out = Multimodal.avMetaTable(spark, rows.toDF("media_id", "mime_type", "media"))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    (0L until 64L).foreach { id =>
      val r = out(id)
      if (id % 8 == 7) assert(r.isNullAt(r.fieldIndex("format")), s"id=$id")
      else if (id % 8 == 3) {
        assert(r.getAs[String]("format") == "ogg", s"id=$id")
        assert(r.isNullAt(r.fieldIndex("duration_ms")), s"id=$id")
      } else if (id % 4 == 0) {
        assert(r.getAs[String]("format") == "opus", s"id=$id")
        assert(r.getAs[Int]("channels") == OggFixture.channels(id), s"id=$id")
        assert(r.getAs[Int]("sample_rate") == 48000, s"id=$id")
        if (OggFixture.opusDurMs(id) > 0)
          assert(r.getAs[Long]("duration_ms") == OggFixture.opusDurMs(id), s"id=$id")
        else assert(r.isNullAt(r.fieldIndex("duration_ms")), s"id=$id")
      } else {
        assert(r.getAs[String]("format") == "vorbis", s"id=$id")
        assert(r.getAs[Int]("channels") == OggFixture.channels(id), s"id=$id")
        assert(r.getAs[Int]("sample_rate") == OggFixture.vorbisRate(id), s"id=$id")
        assert(r.getAs[Long]("duration_ms") == OggFixture.vorbisDurMs(id), s"id=$id")
      }
    }
  }

  test("avMetaTable parses the AV fixture rows per the generator's ground truth") {
    import spark.implicits._
    val rows = (0L until 64L).map { id =>
      val (mime, bytes) = AvFixture.row(id)
      (id, mime, bytes)
    }
    val out = Multimodal.avMetaTable(spark, rows.toDF("media_id", "mime_type", "media"))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    (0L until 64L).foreach { id =>
      val r = out(id)
      if (id % 4 == 3) assert(r.isNullAt(r.fieldIndex("format")), s"id=$id")
      else if (id % 4 == 0) {
        assert(r.getAs[String]("format") == "wav", s"id=$id")
        assert(r.getAs[Int]("sample_rate") == AvFixture.sampleRate(id), s"id=$id")
        val byteRate = AvFixture.sampleRate(id) * AvFixture.channels(id) * AvFixture.bits(id) / 8
        assert(r.getAs[Long]("duration_ms") ==
          AvFixture.dataLen(id).toLong * 1000L / byteRate, s"id=$id")
        assert(r.isNullAt(r.fieldIndex("width")), s"id=$id")
      } else {
        assert(r.getAs[String]("format") == (if (id % 4 == 1) "gif" else "bmp"), s"id=$id")
        assert(r.getAs[Int]("width") == AvFixture.width(id), s"id=$id")
        assert(r.getAs[Int]("height") == AvFixture.height(id), s"id=$id")
        assert(r.isNullAt(r.fieldIndex("channels")), s"id=$id")
      }
    }
  }

  test("gif animation walk: GCE scoping, extension skipping, 87a, truncation") {
    import graft.tools.GifAnimFixture
    // fixture contract round-trips (the tool asserts it too)
    val (cw, ch, loop, frames) = Multimodal.gifAnim(GifAnimFixture.row(2L)._2).get
    assert((cw, ch, loop) == (40, 30, 2) && frames.size == GifAnimFixture.nFrames(2L))
    // a GCE applies to ONE image; later frames fall back to defaults —
    // hand-assemble: GCE + frame, then a frame WITHOUT its own GCE,
    // with a COMMENT extension between them, on a GIF87a header
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val lct = Array.fill[Byte](6)(0x11) // 2-entry table (size bits 0)
    def img(x: Int) = Array[Byte](0x2C) ++ le16(x) ++ le16(0) ++
      le16(2) ++ le16(2) ++ Array[Byte](0x80.toByte) ++ lct ++
      Array[Byte](2, 1, 0x4C, 0) // lzw min 2, one fake sub-block
    val gif = "GIF87a".getBytes("US-ASCII") ++ le16(10) ++ le16(10) ++
      Array[Byte](0, 0, 0) ++
      Array[Byte](0x21, 0xF9.toByte, 4, (2 << 2).toByte) ++ le16(77) ++
      Array[Byte](0, 0) ++
      img(1) ++
      Array[Byte](0x21, 0xFE.toByte, 3, 0x68, 0x69, 0x21, 0) ++ // comment
      img(3) ++ Array[Byte](0x3B)
    val (_, _, lp, fs) = Multimodal.gifAnim(gif).get
    assert(lp == 0 && fs.size == 2)
    assert(fs(0).delayCs == 77 && fs(0).disposal == 2 && fs(0).x == 1)
    assert(fs(1).delayCs == 0 && fs(1).disposal == 0 && fs(1).x == 3)
    // truncation keeps complete frames
    val cutRow = GifAnimFixture.row(3L)._2 // id%8==3 class
    val got = Multimodal.gifAnim(cutRow).get._4
    assert(got.size == GifAnimFixture.nFrames(3L) - 1)
    // junk claims nothing
    assert(Multimodal.gifAnim("GIF9".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.gifAnim(null).isEmpty)
  }
}
