package graft.ops

import graft.SparkSpec
import graft.tools.{TarFixture, WarcFixture, ZipFixture}

class ArchivesSpec extends SparkSpec {

  test("WARC walk: offsets, lengths and headers match the assembled records") {
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L)) {
      val bytes = WarcFixture.row(id)._2
      val got = Archives.warcRecords(bytes)
      // re-assemble the records and derive expected coordinates
      val recs = WarcFixture.warcinfo(id) +:
        (0 until WarcFixture.nBody(id)).map { i =>
          if (id % 2 == 0 && i == 1) WarcFixture.request(id, i)
          else WarcFixture.response(id, i)
        }
      var off = 0L
      val expect = recs.zipWithIndex.map { case (r, i) =>
        val hdrEnd = r.indexOf("\r\n\r\n")
        val content =
          if (i == 0) s"software: graft-fixture $id\r\n"
          else if (id % 2 == 0 && i == 2)
            s"GET /$id/doc${i - 1} HTTP/1.1\r\nHost: data.example.org\r\n"
          else WarcFixture.responseContent(id, i - 1)
        val wtype =
          if (i == 0) "warcinfo"
          else if (id % 2 == 0 && i == 2) "request"
          else "response"
        val uri = if (i == 0) None else Some(WarcFixture.uri(id, i - 1))
        val row = (off, off + hdrEnd + 4, content.length.toLong, Some(wtype), uri)
        off += r.length
        row
      }
      assert(got == expect, s"id=$id")
    }
  }

  test("WARC walk: truncated tail unclaimed, junk yields nothing") {
    val t = Archives.warcRecords(WarcFixture.row(3)._2)
    assert(t.size == 1 && t.head._4.contains("warcinfo"))
    assert(Archives.warcRecords(WarcFixture.row(7)._2).isEmpty)
    assert(Archives.warcRecords(null).isEmpty)
    assert(Archives.warcRecords(Array.emptyByteArray).isEmpty)
  }

  test("warc.gz walk: member spans and record identity match the assembled members") {
    import graft.tools.WarcGzFixture
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L)) {
      val got = Archives.warcGzMembers(WarcGzFixture.row(id)._2)
      val recs = WarcGzFixture.records(id)
      assert(got.size == recs.size, s"id=$id")
      var off = 0L
      recs.zipWithIndex.foreach { case (r, k) =>
        val bytes = r.getBytes("US-ASCII")
        val m = WarcGzFixture.member(k, bytes)
        val (gOff, gComp, gUncomp, gClen, gType, gUri) = got(k)
        assert(gOff == off && gComp == m.length && gUncomp == bytes.length,
          s"id=$id k=$k span")
        // record identity agrees with the plain-WARC walk of the record
        val (_, _, clen, wtype, uri) = Archives.warcRecords(bytes).head
        assert(gClen == clen && gType == wtype && gUri == uri, s"id=$id k=$k identity")
        off += m.length
      }
    }
  }

  test("warc.gz walk: cut tail drops only the last member; junk and ISIZE lies yield nothing") {
    import graft.tools.WarcGzFixture
    val t = Archives.warcGzMembers(WarcGzFixture.row(3L)._2)
    assert(t.size == WarcGzFixture.records(3L).size - 1) // last member unclaimed
    assert(Archives.warcGzMembers(WarcGzFixture.row(7L)._2).isEmpty)
    assert(Archives.warcGzMembers(null).isEmpty)
    // a member whose ISIZE trailer lies about the inflated length is
    // not claimed: flip a bit in the last 4 bytes of a single member
    val one = WarcGzFixture.member(0,
      WarcGzFixture.records(0L).head.getBytes("US-ASCII"))
    val lying = one.clone()
    lying(lying.length - 2) = (lying(lying.length - 2) ^ 0x01).toByte
    assert(Archives.warcGzMembers(lying).isEmpty)
    // FCOMMENT + FHCRC framing are honoured: hand-build a member with
    // flg 0x12 (FCOMMENT|FHCRC) around the same record
    val rec = WarcGzFixture.records(0L).head.getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0x12, 0, 0, 0, 0, 0, 0xff.toByte))
    out.write("a comment".getBytes("US-ASCII")); out.write(0)
    out.write(Array[Byte](0x33, 0x44)) // FHCRC (value unchecked, framing only)
    val tail = one.drop(10) // flg 0 member: DEFLATE + trailer start at 10
    out.write(tail, 0, tail.length)
    val withOpt = Archives.warcGzMembers(out.toByteArray)
    assert(withOpt.size == 1 && withOpt.head._3 == rec.length)
  }

  test("tar walk: member names, offsets and 512-grid hops match the shard layout") {
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L)) {
      val got = Archives.tarMembers(TarFixture.row(id)._2)
      var off = 0L
      val expect = TarFixture.members(id).map { case (name, data) =>
        val row = (name, off, off + 512L, data.length.toLong, "0")
        off += 512L + ((data.length + 511) / 512) * 512L
        row
      }
      assert(got == expect, s"id=$id")
    }
  }

  test("tar walk: size overrun unclaimed, junk yields nothing, checksum is real") {
    val t = Archives.tarMembers(TarFixture.row(3L)._2)
    assert(t.size == 1 && t.head._1 == "s3_0.jpg")
    assert(Archives.tarMembers(TarFixture.row(7L)._2).isEmpty)
    assert(Archives.tarMembers(null).isEmpty)
    // the computed ustar checksum matches an independent re-sum
    val h = TarFixture.header("x.txt", 5L)
    val stored = Integer.parseInt(
      new String(h.slice(148, 154), java.nio.charset.StandardCharsets.US_ASCII), 8)
    val spaced = h.clone()
    java.util.Arrays.fill(spaced, 148, 156, ' '.toByte)
    assert(stored == spaced.map(_ & 0xff).sum)
  }

  test("zip walk: central-directory entries with local-header data offsets") {
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L)) {
      val got = Archives.zipEntries(ZipFixture.row(id)._2)
      assert(got.size == ZipFixture.nEntries(id), s"id=$id")
      var lho = 0L
      got.zipWithIndex.foreach { case ((name, method, cs, us, gotLho, dOff), e) =>
        val data = ZipFixture.payload(id, e)
        assert(name == ZipFixture.name(id, e), s"id=$id e=$e")
        assert(method == 0 && cs == data.length && us == data.length)
        assert(gotLho == lho, s"id=$id e=$e")
        val headerLen = 30L + name.length + ZipFixture.localExtra(e).length
        assert(dOff.contains(lho + headerLen), s"id=$id e=$e")
        lho += headerLen + data.length
      }
    }
  }

  test("zip walk: over-counted EOCD stops at the bad signature; junk yields nothing") {
    val t = Archives.zipEntries(ZipFixture.row(3L)._2)
    assert(t.size == ZipFixture.nEntries(3L)) // phantom entry not claimed
    assert(Archives.zipEntries(ZipFixture.row(7L)._2).isEmpty)
    assert(Archives.zipEntries(null).isEmpty)
    assert(Archives.zipEntries(new Array[Byte](10)).isEmpty)
  }

  test("zip walk: ZIP64 sentinels parse as empty, never as literal count/offset") {
    // patch a real archive's EOCD count fields to the 0xFFFF sentinel
    val base = ZipFixture.zip(0L)
    val commentLen = "g0".length
    val e = base.length - 22 - commentLen
    val counted = base.clone()
    counted(e + 8) = 0xff.toByte; counted(e + 9) = 0xff.toByte
    counted(e + 10) = 0xff.toByte; counted(e + 11) = 0xff.toByte
    assert(Archives.zipEntries(counted).isEmpty)
    // and the 0xFFFFFFFF central-directory-offset sentinel
    val offset = base.clone()
    for (k <- 16 until 20) offset(e + k) = 0xff.toByte
    assert(Archives.zipEntries(offset).isEmpty)
  }

  test("webdataset samples: members grouped at the FIRST dot, components sorted") {
    import spark.implicits._
    val members = Archives.tarMemberTable(spark,
      Seq((0L, "application/x-tar", TarFixture.row(0L)._2),
        (5L, "application/x-tar", TarFixture.row(5L)._2))
        .toDF("media_id", "mime_type", "media"))
    val got = Archives.webdatasetSamples(members)
      .select("media_id", "sample_key", "n_components", "exts")
      .as[(Long, String, Long, String)].collect().toSet
    val expect = Seq(0L, 5L).flatMap { id =>
      (0 until TarFixture.nSamples(id)).map { k =>
        val exts = if (k % 2 == 0) "jpg,meta.json,txt" else "jpg,txt"
        val n = if (k % 2 == 0) 3L else 2L
        (id, s"s${id}_$k", n, exts)
      }
    }.toSet
    assert(got == expect)
  }

  test("archive walks: totality fuzz — arbitrary bytes never throw") {
    val rnd = new scala.util.Random(41)
    for (_ <- 0 until 200) {
      val b = new Array[Byte](rnd.nextInt(600))
      rnd.nextBytes(b)
      Archives.warcRecords(b) // must not throw
      Archives.tarMembers(b)
      Archives.zipEntries(b)
      Archives.warcGzMembers(b)
      // seed corruption: flip bytes inside real archives
      val wid = rnd.nextInt(16).toLong
      for (real0 <- Seq(WarcFixture.row(wid)._2, TarFixture.row(wid)._2,
          ZipFixture.row(wid)._2, graft.tools.WarcGzFixture.row(wid)._2)) {
        val real = real0.clone()
        if (real.nonEmpty) real(rnd.nextInt(real.length)) = rnd.nextInt().toByte
        Archives.warcRecords(real)
        Archives.tarMembers(real)
        Archives.zipEntries(real)
        Archives.warcGzMembers(real)
      }
    }
  }
}
