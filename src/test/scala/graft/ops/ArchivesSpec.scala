package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.tools.{TarFixture, WarcFixture, ZipFixture}

class ArchivesSpec extends SparkSpec {

  test("WARC walk: offsets, lengths and headers match the assembled records") {
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L)) {
      val bytes = WarcFixture.row(id)._2
      val got = Archives.warcRecords(bytes)
      // derive expected coordinates from each assembled record's own
      // framing: clen = record minus header, terminator and trailing
      // CRLFCRLF; identity headers re-scanned case-insensitively
      val recs = WarcFixture.records(id)
      var off = 0L
      val expect = recs.map { r =>
        val hdrEnd = r.indexOf("\r\n\r\n")
        def h(name: String): Option[String] =
          r.substring(0, hdrEnd).split("\r\n").drop(1).collectFirst {
            case l if l.toLowerCase.startsWith(name + ":") =>
              l.substring(name.length + 1).trim
          }
        val clen = r.length.toLong - hdrEnd - 8
        val row = (off, off + hdrEnd + 4, clen,
          h("warc-type"), h("warc-target-uri"), h("warc-date"),
          h("warc-payload-digest"))
        off += r.length
        row
      }
      assert(got == expect, s"id=$id")
    }
  }

  test("WARC HTTP split: status/content-type/body coordinates for every splittable response") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 4L, 5L, 6L)
    val got = Archives.warcHttpTable(spark,
        ids.map(id => (id, "application/warc", WarcFixture.row(id)._2))
          .toDF("media_id", "mime_type", "media"))
      .as[(Long, Int, Int, Long, Long, Option[String])].collect().toSet
    val expect = ids.flatMap { id =>
      val recs = WarcFixture.records(id)
      val offs = recs.scanLeft(0L)(_ + _.length)
      recs.zipWithIndex.flatMap { case (r, i) =>
        val hdrEnd = r.indexOf("\r\n\r\n")
        val isResp = r.substring(0, hdrEnd).toLowerCase.contains("warc-type: response")
        val payload = r.substring(hdrEnd + 4, r.length - 4)
        val t4 = payload.indexOf("\r\n\r\n")
        val okHttp = payload.startsWith("HTTP/") && t4 >= 0
        if (isResp && okHttp) {
          val head = payload.substring(0, t4)
          val status = head.split("\r\n").head.split(" ")(1).toInt
          val ct = head.split("\r\n").drop(1).collectFirst {
            case l if l.toLowerCase.startsWith("content-type:") =>
              l.substring("content-type:".length).trim
          }
          Some((id, i, status,
            offs(i) + hdrEnd + 4 + t4 + 4,
            payload.length.toLong - t4 - 4, ct))
        } else None
      }
    }.toSet
    assert(got == expect)
    // the broken responses (no CRLFCRLF / non-HTTP payload, sixth
    // from last — spam, alias, robots, meta-robots and header-robots
    // records close the shard) never emit
    assert(!got.exists { case (id, i, _, _, _, _) =>
      i == WarcFixture.records(id).size - 6 })
    // the variant statuses and content-types all appear
    assert(got.map(_._3) == Set(200, 404, 301, 503))
    assert(got.exists(_._6.isEmpty)) // the 301 without Content-Type
  }

  test("WARC WET extraction: 200/text bodies only, html stripped to visible text") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L)
    val table = Archives.warcBodyTextTable(spark,
      ids.map(id => (id, "application/warc", WarcFixture.row(id)._2))
        .toDF("media_id", "mime_type", "media"))
    val got = table.as[(Long, Int, String, String)].collect().toSet
    // expected: every response whose head splits with status 200 and a
    // text/* Content-Type, body re-derived from the record strings
    val expect = ids.filter(id => id % 8 != 7).flatMap { id =>
      val recs = if (id % 8 == 3) Seq(WarcFixture.warcinfo(id)) else WarcFixture.records(id)
      recs.zipWithIndex.flatMap { case (r, i) =>
        val hdrEnd = r.indexOf("\r\n\r\n")
        val isResp = r.substring(0, hdrEnd).toLowerCase.contains("warc-type: response")
        val payload = r.substring(hdrEnd + 4, r.length - 4)
        val t4 = payload.indexOf("\r\n\r\n")
        if (isResp && payload.startsWith("HTTP/") && t4 >= 0) {
          val head = payload.substring(0, t4)
          val status = head.split("\r\n").head.split(" ")(1).toInt
          val ct = head.split("\r\n").drop(1).collectFirst {
            case l if l.toLowerCase.startsWith("content-type:") =>
              l.substring("content-type:".length).trim
          }
          if (status == 200 && ct.exists(_.toLowerCase.startsWith("text/")))
            Some((id, i, ct.get, payload.substring(t4 + 4)))
          else None
        } else None
      }
    }.toSet
    assert(got == expect)
    // an html body is present (id%4==3 variant) and visibly strips:
    // subtrees dropped, tags gone, entities decoded, whitespace flat
    val visible = table
      .withColumn("v", TextAnalysis.htmlVisibleText(org.apache.spark.sql.functions.col("body_text")))
      .filter(org.apache.spark.sql.functions.col("content_type").startsWith("text/html"))
      .select("media_id", "v").as[(Long, String)].collect().toSet
    // every ordinary shard carries the meta-robots html page; id 6
    // additionally has the 200-status variant html
    val metaVis = Seq(0L, 1L, 2L, 4L, 5L, 6L)
      .map(id => id -> s"m $id robots meta page $id").toSet
    assert(visible == metaVis +
      (6L -> "t 6 Doc 6 variant body 6 & more <tagged> 'q' next rel deep mail sq uq sp"))
  }

  test("url host stats: authority grouping, distinct URIs, TLD extraction") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 4L, 5L, 6L)
    val stats = Archives.urlHostStats(Archives.warcRecordTable(spark,
        ids.map(id => (id, "application/warc", WarcFixture.row(id)._2))
          .toDF("media_id", "mime_type", "media")))
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // independent expectation from the record strings
    val uris = ids.flatMap { id =>
      WarcFixture.records(id).flatMap { r =>
        val hdrEnd = r.indexOf("\r\n\r\n")
        val clen = r.length.toLong - hdrEnd - 8
        r.substring(0, hdrEnd).split("\r\n").drop(1).collectFirst {
          case l if l.toLowerCase.startsWith("warc-target-uri:") =>
            (l.substring("warc-target-uri:".length).trim, clen)
        }
      }
    }
    val byHost = uris.groupBy(_._1.split("/")(2).toLowerCase)
    assert(stats.keySet == byHost.keySet)
    // clean hosts all present; spam-URL hosts (q_w14 fixture rows)
    // group alongside them
    assert(ids.map(id => s"data${id % 5}.example.org").toSet.subsetOf(stats.keySet))
    assert(stats.keySet.exists(h => h.startsWith("cdn") || h.startsWith("track")))
    byHost.foreach { case (host, us) =>
      val (_, tld, nRec, nUri, bytes) = stats(host)
      assert(tld == host.split('.').last, host)
      assert(nRec == us.size, host)
      assert(nUri == us.map(_._1).distinct.size, host)
      assert(bytes == us.map(_._2).sum, host)
    }
  }

  test("url keep-latest dedup: most recent fetch wins per URI, fetch counts kept") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L, 10L, 12L)
    val got = Archives.urlDedup(Archives.warcRecordTable(spark,
        ids.map(id => (id, "application/warc", WarcFixture.row(id)._2))
          .toDF("media_id", "mime_type", "media")))
      .as[(String, Long, Int, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    // independent expectation: every response record's (uri, date,
    // media, idx), grouped by uri, max by (date, -media, -idx) order
    val fetches = ids.flatMap { id =>
      WarcFixture.records(id).zipWithIndex.flatMap { case (r, i) =>
        val hdrEnd = r.indexOf("\r\n\r\n")
        def h(n: String): Option[String] =
          r.substring(0, hdrEnd).split("\r\n").drop(1).collectFirst {
            case l if l.toLowerCase.startsWith(n + ":") =>
              l.substring(n.length + 1).trim
          }
        if (h("warc-type").contains("response"))
          h("warc-target-uri").map(u => (u, h("warc-date").get, id, i))
        else None
      }
    }
    val byUri = fetches.groupBy(_._1)
    assert(got.keySet == byUri.keySet)
    // collisions exist: at least one URI fetched from several shards
    assert(byUri.values.exists(_.size > 1))
    byUri.foreach { case (u, fs) =>
      val best = fs.minBy { case (_, d, id, i) => (reverseStr(d), id, i) }
      val (_, mediaId, recIdx, date, n) = got(u)
      assert(n == fs.size, u)
      assert((date, mediaId, recIdx.toLong) == (best._2, best._3, best._4.toLong), u)
    }
  }

  /** Orders descending when used inside an ascending minBy: flips each
   * char so lexicographic min picks the lexicographic max. */
  private def reverseStr(s: String): String = s.map(c => (0xffff - c).toChar)

  test("url filter: rule precedence and boundary cases on synthetic URLs") {
    import spark.implicits._
    val cases: Seq[(String, String)] = Seq(
      "https://ok.example.org/page1" -> null,
      "not a url" -> "unparsable",
      "https://bet-casino1.example.net/win" -> "blocked_host",
      "http://10.1.3.7/page" -> "ip_host",
      "http://10.1.3.7:8080/page" -> "ip_host",
      // blocklist wins over the extension rule (fixed precedence)
      "https://bet-casino0.example.net/img.png" -> "blocked_host",
      "https://cdn.example.org/a/logo.PNG" -> "banned_extension",
      "https://cdn.example.org/a/logo.jpeg" -> "banned_extension",
      // extension fires on the PATH end only, never inside the query
      "https://cdn.example.org/page?f=.png" -> null,
      "https://t.example.org/p?utm_campaign=x" -> "query_spam",
      "https://t.example.org/p?a=1&PHPSESSID=9" -> "query_spam",
      // `sid` must be a whole parameter name, not a suffix
      "https://t.example.org/p?classid=9" -> null,
      "https://d.example.org/a/b/c/d/e/f/g" -> "path_depth",
      "https://d.example.org/a/b/c/d/e/f" -> null,
      ("https://d.example.org/" + "x" * 2100) -> "url_length")
    val got = Archives.urlFilter(
        cases.map(_._1).toDF("target_uri"),
        Archives.defaultBlockedHosts.toDF("blocked_host"))
      .select("target_uri", "blocked_reason")
      .as[(String, Option[String])].collect().toMap
    cases.foreach { case (u, want) => assert(got(u) == Option(want), u) }
  }

  test("crawl delta: overlapping snapshots diff to added/removed/changed/unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // ids 0..119; snapshots overlap on [40, 80) — and id/id+40 share
    // page URIs (the fixture's (3·id+i) % 40 arithmetic), so kept
    // records genuinely move between snapshots
    val ids = (0L until 120L).filter(id => id % 8 != 3 && id % 8 != 7)
    val media = ids.map(id => (id, "application/warc", WarcFixture.row(id)._2))
      .toDF("media_id", "mime_type", "media")
    def snap(pred: org.apache.spark.sql.Column) =
      Archives.pageDigests(
        Archives.warcRecordTable(spark, media.filter(pred)),
        Archives.warcBodyTextTable(spark, media.filter(pred)))
    val got = Archives.crawlDelta(
        snap(col("media_id") < 80), snap(col("media_id") >= 40))
      .as[(String, Option[String], Option[String], String)].collect()
      .map(r => r._1 -> r).toMap

    // independent expectation straight from the record strings
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("ISO-8859-1")).map("%02x".format(_)).mkString
    def kept(snapIds: Seq[Long]): Map[String, Option[String]] =
      snapIds.flatMap { id =>
        WarcFixture.records(id).zipWithIndex.flatMap { case (r, i) =>
          val hdrEnd = r.indexOf("\r\n\r\n")
          def h(n: String): Option[String] =
            r.substring(0, hdrEnd).split("\r\n").drop(1).collectFirst {
              case l if l.toLowerCase.startsWith(n + ":") =>
                l.substring(n.length + 1).trim
            }
          if (!h("warc-type").contains("response")) None
          else h("warc-target-uri").map { u =>
            val payload = r.substring(hdrEnd + 4, r.length - 4)
            val t4 = payload.indexOf("\r\n\r\n")
            val body =
              if (payload.startsWith("HTTP/") && t4 >= 0 &&
                payload.split("\r\n").head.split(" ")(1) == "200" &&
                payload.substring(0, t4).split("\r\n").drop(1).exists(l =>
                  l.toLowerCase.startsWith("content-type:") &&
                    l.split(":", 2)(1).trim.toLowerCase.startsWith("text/")))
                Some(payload.substring(t4 + 4))
              else None
            (u, h("warc-date").get, id, i, body)
          }
        }
      }.groupBy(_._1).map { case (u, fs) =>
        val best = fs.minBy { case (_, d, id, i, _) => (reverseStr(d), id, i) }
        u -> best._5.map(md5hex)
      }
    val oldD = kept(ids.filter(_ < 80)).collect { case (u, Some(d)) => u -> d }
    val newD = kept(ids.filter(_ >= 40)).collect { case (u, Some(d)) => u -> d }
    val expect = (oldD.keySet ++ newD.keySet).map { u =>
      val (o, n) = (oldD.get(u), newD.get(u))
      val st = (o, n) match {
        case (None, _) => "added"
        case (_, None) => "removed"
        case (Some(a), Some(b)) => if (a == b) "unchanged" else "changed"
      }
      u -> ((u, o, n, st))
    }.toMap
    assert(got == expect)
    assert(Set("added", "removed", "changed", "unchanged")
      .subsetOf(got.values.map(_._4).toSet))
  }

  test("url canonicalization: case/www/port/fragment/param noise collapses; SURT keys sort by domain") {
    import spark.implicits._
    val cases: Seq[(String, (String, String))] = Seq(
      "HTTPS://WWW.Data1.EXAMPLE.org:443/page3?utm_source=a&b=2&a=1#x" ->
        ("https://data1.example.org/page3?a=1&b=2",
         "org,example,data1)/page3?a=1&b=2"),
      // no path → /; default http port stripped
      "http://Example.com:80" -> ("http://example.com/", "com,example)/"),
      // NON-default port survives (a different origin)
      "http://example.com:8080/p" ->
        ("http://example.com:8080/p", "com:8080,example)/p"),
      // non-http(s) scheme: no default-port rule
      "ftp://x.y/z?a=1" -> ("ftp://x.y/z?a=1", "y,x)/z?a=1"),
      // all params tracking → the '?' goes too
      "https://spam.example.org/p?utm_x=1&gclid=2" -> ("https://spam.example.org/p", "org,example,spam)/p"),
      "junk" -> (null, null))
    val got = Archives.urlCanonical(cases.map(_._1).toDF("target_uri"))
      .select("target_uri", "canonical_uri", "surt_key")
      .as[(String, Option[String], Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    cases.foreach { case (u, (c, k)) =>
      assert(got(u) == (Option(c), Option(k)), u)
    }
  }

  test("url canonicalization: fixture alias records merge onto their clean page") {
    import spark.implicits._
    val ids = Seq(0L, 2L, 4L, 6L, 8L) // even: utm-only aliases, must merge
    val got = Archives.urlCanonical(
        ids.flatMap(id =>
          Seq(WarcFixture.uri(id, 0), WarcFixture.aliasUri(id)))
          .toDF("target_uri"))
      .select("target_uri", "canonical_uri")
      .as[(String, String)].collect().toMap
    ids.foreach { id =>
      assert(got(WarcFixture.aliasUri(id)) == got(WarcFixture.uri(id, 0)),
        s"id=$id")
      assert(got(WarcFixture.uri(id, 0)) == WarcFixture.uri(id, 0), s"id=$id")
    }
  }

  test("url filter: each fixture spam class draws its rule; clean pages keep") {
    import spark.implicits._
    // covers spamClass 0..4 on both parities, id%8 ∉ {3,7}
    val ids = Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L, 13L, 17L)
    val got = Archives.urlFilter(
        Archives.urlDedup(Archives.warcRecordTable(spark,
          ids.map(id => (id, "application/warc", WarcFixture.row(id)._2))
            .toDF("media_id", "mime_type", "media"))),
        Archives.defaultBlockedHosts.toDF("blocked_host"))
      .select("target_uri", "blocked_reason")
      .as[(String, Option[String])].collect().toMap
    val reasons = Map(0 -> "banned_extension", 1 -> "query_spam",
      2 -> "ip_host", 3 -> "path_depth", 4 -> "blocked_host")
    assert(ids.map(WarcFixture.spamClass).toSet == Set(0, 1, 2, 3, 4))
    ids.foreach { id =>
      assert(got(WarcFixture.spamUri(id))
        .contains(reasons(WarcFixture.spamClass(id))), s"id=$id")
    }
    // (class-3 spam also lives on data* hosts; clean pages are /pageN)
    val clean = got.filter { case (u, _) =>
      u.startsWith("https://data") && u.contains("/page") }
    assert(clean.nonEmpty && clean.values.forall(_.isEmpty))
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
        val (gOff, gComp, gUncomp, gClen, gType, gUri, gDate, gDg) = got(k)
        assert(gOff == off && gComp == m.length && gUncomp == bytes.length,
          s"id=$id k=$k span")
        // record identity agrees with the plain-WARC walk of the record
        val (_, _, clen, wtype, uri, wdate, dg) = Archives.warcRecords(bytes).head
        assert(gClen == clen && gType == wtype && gUri == uri && gDate == wdate
          && gDg == dg, s"id=$id k=$k identity")
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

  test("warc.gz walk: a member inflating far past the head window still indexes, in bounded memory") {
    import graft.tools.WarcGzFixture
    // a 300 KiB record: only the first 64 KiB head is buffered; the
    // rest streams through the scratch window, counted for the ISIZE
    // check and the member boundary — then a normal member follows,
    // proving one big record no longer truncates the shard's index
    val bigBody = "x" * (300 * 1024)
    val big = WarcFixture.record(0L,
      Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://data.example.org/big"),
      bigBody).getBytes("US-ASCII")
    val small = WarcGzFixture.records(0L).head.getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    out.write(WarcGzFixture.member(0, big))
    out.write(WarcGzFixture.member(1, small))
    val got = Archives.warcGzMembers(out.toByteArray)
    assert(got.size == 2)
    assert(got(0)._3 == big.length && got(0)._4 == bigBody.length)
    assert(got(0)._5.contains("response"))
    assert(got(1)._3 == small.length)
    assert(got(1)._1 == got(0)._2) // spans abut: next offset = prior comp length
  }

  test("warc.gz WET extraction: response bodies out of compressed members, cap flags truncation") {
    import graft.tools.WarcGzFixture
    for (id <- Seq(0L, 1L, 2L, 4L, 5L, 6L)) {
      val got = Archives.warcGzBodyTexts(WarcGzFixture.row(id)._2)
      // expected straight from the record strings: responses split at
      // the HTTP head, 200 text/plain in this fixture
      val expect = WarcGzFixture.records(id).zipWithIndex.flatMap { case (r, k) =>
        val hdrEnd = r.indexOf("\r\n\r\n")
        val payload = r.substring(hdrEnd + 4, r.length - 4)
        val t4 = payload.indexOf("\r\n\r\n")
        if (r.substring(0, hdrEnd).contains("WARC-Type: response") &&
            payload.startsWith("HTTP/1.1 200") && t4 >= 0)
          Some((k, "text/plain", payload.substring(t4 + 4), false))
        else None
      }
      assert(got == expect, s"id=$id")
    }
    // a body past the 1 MiB text cap emits its kept prefix, flagged —
    // and the walk continues to the next member
    val bigBody = "y" * (1200 * 1024)
    val big = WarcFixture.record(0L,
      Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://data.example.org/big"),
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + bigBody).getBytes("US-ASCII")
    val small = graft.tools.WarcGzFixture.records(0L)(1).getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    out.write(graft.tools.WarcGzFixture.member(0, big))
    out.write(graft.tools.WarcGzFixture.member(1, small))
    val got2 = Archives.warcGzBodyTexts(out.toByteArray)
    assert(got2.size == 2)
    val (i0, ct0, body0, trunc0) = got2(0)
    assert(i0 == 0 && ct0 == "text/plain" && trunc0)
    assert(body0.length < bigBody.length && bigBody.startsWith(body0))
    assert(body0.nonEmpty && body0.forall(_ == 'y'))
    assert(!got2(1)._4 && got2(1)._1 == 1)
  }

  test("tar walk: member names, offsets and 512-grid hops match the shard layout") {
    for (id <- Seq(0L, 1L, 2L, 4L, 6L, 8L, 9L)) {
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

  test("tar walk: GNU 'L' and PAX 'x' overrides give the next member its full >100-char name") {
    for (id <- Seq(5L, 13L, 21L)) {
      val got = Archives.tarMembers(TarFixture.row(id)._2)
      // physical coordinates: every entry (override entries included)
      // sits on the 512 grid with its payload length
      val phys = TarFixture.physical(id)
      assert(got.size == phys.size, s"id=$id")
      var off = 0L
      got.zip(phys).zipWithIndex.foreach {
        case (((_, gHOff, gDOff, gSize, gTf), (_, data, tf)), j) =>
          assert(gHOff == off && gDOff == off + 512 && gSize == data.length,
            s"id=$id j=$j coordinates")
          assert(gTf == tf.toChar.toString, s"id=$id j=$j typeflag")
          off += 512L + ((data.length + 511) / 512) * 512L
      }
      // regular members carry the FULL logical names, in member order —
      // never the 100-byte header truncation
      val regular = got.filter(_._5 == "0").map(_._1)
      assert(regular == TarFixture.members(id).map(_._1), s"id=$id names")
      assert(regular.forall(_.length > 100), s"id=$id all long")
      // both override kinds are exercised and keep their stored names
      assert(got.exists(_._5 == "L") && got.exists(_._5 == "x"), s"id=$id kinds")
      assert(got.filter(_._5 == "L").forall(_._1 == "././@LongLink"))
      assert(got.filter(_._5 == "x").forall(_._1.startsWith("PaxHeaders/")))
    }
    // an override whose payload is empty leaves the next member's own
    // name in place (tolerance, not a phantom empty name)
    val out = new java.io.ByteArrayOutputStream()
    out.write(TarFixture.header("././@LongLink", 0L, 'L'.toByte))
    out.write(TarFixture.header("short.txt", 2L, '0'.toByte))
    out.write("ab".getBytes("US-ASCII")); out.write(new Array[Byte](510))
    out.write(new Array[Byte](1024))
    val walked = Archives.tarMembers(out.toByteArray)
    assert(walked.map(_._1) == Seq("././@LongLink", "short.txt"))
  }

  test("consecutive overrides: layered like GNU tar — a nameless entry keeps the pending name") {
    // layering contract (what GNU tar does): a NAMED L/x entry
    // replaces any earlier pending override; a nameless one (empty L,
    // x without a path record) contributes nothing and leaves the
    // earlier pending name in force. Real writers emit exactly one
    // named override per member, so the lag(1) oracle form agrees on
    // every real archive and on the fixtures.
    def longL(name: String): (Array[Byte], Array[Byte]) = {
      val p = (name + "\u0000").getBytes("US-ASCII")
      (TarFixture.header("././@LongLink", p.length.toLong, 'L'.toByte), p)
    }
    def paxX(payload: String): (Array[Byte], Array[Byte]) = {
      val p = payload.getBytes("US-ASCII")
      (TarFixture.header("PaxHeaders/x", p.length.toLong, 'x'.toByte), p)
    }
    def shard(entries: (Array[Byte], Array[Byte])*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      entries.foreach { case (h, p) =>
        out.write(h); out.write(p)
        out.write(new Array[Byte]((512 - p.length % 512) % 512))
      }
      out.write(TarFixture.header("own.txt", 2L, '0'.toByte))
      out.write("ab".getBytes("US-ASCII")); out.write(new Array[Byte](510))
      out.write(new Array[Byte](1024))
      out.toByteArray
    }
    def finalName(entries: (Array[Byte], Array[Byte])*): String =
      Archives.tarMembers(shard(entries: _*)).last._1
    // L then x-with-path: the x wins (it is the immediate predecessor)
    assert(finalName(longL("from-L.txt"),
      paxX(TarFixture.paxRecord("from-x.txt"))) == "from-x.txt")
    // L then x WITHOUT a path: the x layers (GNU tar applies both —
    // the name from the L, the pax records from the x)
    assert(finalName(longL("from-L.txt"), paxX("14 mtime=12345\n"))
      == "from-L.txt")
    // L then EMPTY L: the degenerate second entry contributes nothing
    assert(finalName(longL("from-L.txt"), longL("")) == "from-L.txt")
    // x then L: the L wins
    assert(finalName(paxX(TarFixture.paxRecord("from-x.txt")),
      longL("from-L.txt")) == "from-L.txt")
  }

  test("http body decode stack: deflate content coding, unknown transfer coding, layering") {
    import spark.implicits._
    def shard(extraHttp: String, payload: Array[Byte]): Array[Byte] = {
      val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain; " +
        "charset=utf-8\r\n" + extraHttp + "\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val content = head ++ payload
      val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://d.example.org/p\r\n" +
        "Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${content.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      rec ++ content ++ "\r\n\r\n".getBytes("US-ASCII")
    }
    def bodyOf(extraHttp: String, payload: Array[Byte]): Option[String] = {
      val rows = Archives.warcBodyTextTable(spark,
          Seq((1L, "application/warc", shard(extraHttp, payload)))
            .toDF("media_id", "mime_type", "media"))
        .select("body_text").as[String].collect()
      rows.headOption
    }
    val text = "déflate body ünïcode"
    val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // deflate (zlib) content coding inflates
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](512)
    val n = d.deflate(buf); d.end()
    assert(bodyOf("Content-Encoding: deflate\r\n", buf.take(n))
      .contains(text))
    // an unknown TRANSFER coding claims nothing
    assert(bodyOf("Transfer-Encoding: rot13\r\n", raw).isEmpty)
    // corrupt deflate claims nothing
    val bad = buf.take(n); bad(n / 2) = (bad(n / 2) ^ 0x77).toByte
    assert(bodyOf("Content-Encoding: deflate\r\n", bad)
      .forall(_ != text))
    // chunked over deflate layers like chunked over gzip
    assert(bodyOf(
      "Transfer-Encoding: chunked\r\nContent-Encoding: deflate\r\n",
      graft.tools.SitemapFixture.chunkedBytes(buf.take(n)))
      .contains(text))
  }

  test("robots wildcards: metacharacter escaping, anchors, octet precedence") {
    import spark.implicits._
    val rules = Seq(
      ("h.example.org", "disallow", "/*.gif$"), // '.' must be LITERAL
      ("h.example.org", "disallow", "/tmp*/private"),
      ("h.example.org", "allow", "/tmp*/private/ok$"),
      ("h.example.org", "disallow", "/a$b"), // mid-$ is literal, fast path
      ("i.example.org", "disallow", "*") // bare star blocks everything
    ).toDF("host", "rule_type", "prefix")
    val pages = Seq(
      "https://h.example.org/img/banner.gif", // *.gif$ hits
      "https://h.example.org/img/banner.gifx", // $ anchor: no hit
      "https://h.example.org/img/bannerXgif", // '.' literal: no hit
      "https://h.example.org/tmp123/private/doc", // mid-star hits
      "https://h.example.org/tmp123/private/ok", // longer allow wins
      "https://h.example.org/a$b/x", // literal $ prefix
      "https://i.example.org/anything"
    ).toDF("target_uri")
    val got = Archives.robotsFilter(pages, rules)
      .select("target_uri", "robots_allowed", "matched_prefix")
      .as[(String, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val h = "https://h.example.org"
    assert(got(s"$h/img/banner.gif") == ((false, Some("/*.gif$"))))
    assert(got(s"$h/img/banner.gifx") == ((true, None)))
    assert(got(s"$h/img/bannerXgif") == ((true, None)))
    assert(got(s"$h/tmp123/private/doc") == ((false, Some("/tmp*/private"))))
    assert(got(s"$h/tmp123/private/ok") == ((true, Some("/tmp*/private/ok$"))))
    assert(got(s"$h/a$$b/x") == ((false, Some("/a$b"))))
    assert(got("https://i.example.org/anything") == ((false, Some("*"))))
    // backtracking defense: star RUNS collapse (same semantics); a
    // rule past the 8-wildcard implementation limit never matches
    val defense = Seq(
      ("j.example.org", "disallow", "/a***b"), // collapses to /a*b
      ("j.example.org", "disallow", "/x" + "*y" * 9 + "$") // 9 stars: inert
    ).toDF("host", "rule_type", "prefix")
    val dPages = Seq(
      "https://j.example.org/a123b",
      "https://j.example.org/x" + "zy" * 9
    ).toDF("target_uri")
    val dGot = Archives.robotsFilter(dPages, defense)
      .select("target_uri", "robots_allowed")
      .as[(String, Boolean)].collect().toMap
    assert(dGot("https://j.example.org/a123b") == false)
    assert(dGot("https://j.example.org/x" + "zy" * 9) == true)
  }

  test("malformed PAX payloads never override and never throw") {
    def tarWithPax(payload: String): Array[Byte] = {
      val p = payload.getBytes("US-ASCII")
      val out = new java.io.ByteArrayOutputStream()
      out.write(TarFixture.header("PaxHeaders/x", p.length.toLong, 'x'.toByte))
      out.write(p); out.write(new Array[Byte]((512 - p.length % 512) % 512))
      out.write(TarFixture.header("plain.txt", 2L, '0'.toByte))
      out.write("ab".getBytes("US-ASCII")); out.write(new Array[Byte](510))
      out.write(new Array[Byte](1024))
      out.toByteArray
    }
    def nameAfterPax(payload: String): String =
      Archives.tarMembers(tarWithPax(payload)).last._1
    // well-formed: the fixture's own record form overrides
    assert(nameAfterPax(TarFixture.paxRecord("override.txt")) == "override.txt")
    // length prefix lies long / short, missing newline, no digits,
    // non-path keys, empty value: all leave the stored name alone
    assert(nameAfterPax("99 path=liar.txt\n") == "plain.txt")
    assert(nameAfterPax("5 path=liar.txt\n") == "plain.txt")
    assert(nameAfterPax("16 path=cut.txt") == "plain.txt")
    assert(nameAfterPax("path=nolen.txt\n") == "plain.txt")
    assert(nameAfterPax("14 mtime=12345\n") == "plain.txt")
    assert(nameAfterPax("8 path=\n") == "plain.txt")
    // a malformed SECOND record keeps the path the FIRST one parsed
    assert(nameAfterPax(TarFixture.paxRecord("kept.txt") + "99 junk") == "kept.txt")
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

  test("zip walk: ZIP64 form resolves to the identical entries as the classic form") {
    for (id <- Seq(0L, 1L, 2L, 4L, 6L)) {
      val classic = Archives.zipEntries(ZipFixture.zip(id))
      val z64 = Archives.zipEntries(ZipFixture.zip64(id))
      assert(z64 == classic, s"id=$id")
      assert(z64.size == ZipFixture.nEntries(id))
    }
  }

  test("zip walk: sentinels WITHOUT a ZIP64 locator degrade gracefully, never lie") {
    // a 0xFFFF entry count with no locator is treated as a literal
    // count (a 65535-entry archive is legal per APPNOTE): the walk
    // stops at the first bad signature, emitting only the real entries
    val base = ZipFixture.zip(0L)
    val commentLen = "g0".length
    val e = base.length - 22 - commentLen
    val counted = base.clone()
    counted(e + 8) = 0xff.toByte; counted(e + 9) = 0xff.toByte
    counted(e + 10) = 0xff.toByte; counted(e + 11) = 0xff.toByte
    assert(Archives.zipEntries(counted) == Archives.zipEntries(base))
    // a 0xFFFFFFFF cd offset with no locator points past the file: empty
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
        // id 5 is a long-key shard: the sample keys exceed 100 chars
        // and only group correctly because the L/x override applied
        (id, TarFixture.sampleKey(id, k), n, exts)
      }
    }.toSet
    assert(got == expect)
    assert(expect.exists(_._2.length > 100))
  }

  test("webdataset pairs: real JPEG dims + caption per sample, zero shuffle") {
    import spark.implicits._
    val got = Archives.webdatasetPairTable(spark,
      Seq((0L, "application/x-tar", TarFixture.row(0L)._2),
        (5L, "application/x-tar", TarFixture.row(5L)._2),
        (7L, "application/x-tar", TarFixture.row(7L)._2)) // junk: no rows
        .toDF("media_id", "mime_type", "media"))
    assert(got.queryExecution.executedPlan.toString().contains("Exchange")
      == false, "pair table must not shuffle")
    val rows = got.as[(Long, String, Long, Option[String], Option[Int],
      Option[Int], Option[Long], Option[String])].collect().toSet
    val expect = Seq(0L, 5L).flatMap { id =>
      (0 until TarFixture.nSamples(id)).map { k =>
        (id, TarFixture.sampleKey(id, k), if (k % 2 == 0) 3L else 2L,
          Some("jpeg"), Some(TarFixture.jpegWidth(id, k)),
          Some(TarFixture.jpegHeight(id, k)),
          Some(TarFixture.jpgLen(id, k).toLong),
          Some(new String(TarFixture.payload("txt", id, k,
            TarFixture.txtLen(id, k)), "US-ASCII")))
      }
    }.toSet
    assert(rows == expect)
    // a sample with an unparsable image keeps its caption, dims NULL
    val junkImg = TarFixture.header("x.jpg", 4L) ++
      "junk".getBytes("US-ASCII") ++ new Array[Byte](508) ++
      TarFixture.header("x.txt", 2L) ++ "hi".getBytes("US-ASCII") ++
      new Array[Byte](510) ++ new Array[Byte](1024)
    val broken = Archives.webdatasetPairTable(spark,
      Seq((9L, "application/x-tar", junkImg)).toDF("media_id", "mime_type", "media"))
      .as[(Long, String, Long, Option[String], Option[Int],
        Option[Int], Option[Long], Option[String])].collect().toSeq
    assert(broken == Seq((9L, "x", 2L, None, None, None, Some(4L), Some("hi"))))
  }

  test("robots directives: crawl-delay from the * group only; sitemaps group-agnostic") {
    import spark.implicits._
    val robots = Seq(
      // * group carries delay 4; badbot's 99 must be ignored; two
      // sitemap lines in DIFFERENT groups both surface (the sitemaps
      // protocol is group-agnostic); a second fetch of the same host
      // with a smaller delay takes the MIN (conservative reading)
      ("h.example.org",
        "User-agent: *\nCrawl-delay: 4\nDisallow: /x\n" +
          "Sitemap: https://h.example.org/a.xml\n\n" +
          "User-agent: badbot\nCrawl-delay: 99\n" +
          "Sitemap: https://h.example.org/b.xml\n"),
      ("h.example.org",
        "User-agent: *\nCrawl-delay: 2\n"),
      // no * group at all: delay NULL, sitemap still collected
      ("i.example.org",
        "User-agent: badbot\nCrawl-delay: 7\n" +
          "Sitemap: https://i.example.org/s.xml\n"))
      .toDF("host", "body")
    val got = Archives.robotsDirectives(robots)
      .as[(String, Option[Long], String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("h.example.org") ==
      ((Some(2L), "https://h.example.org/a.xml,https://h.example.org/b.xml")))
    assert(got("i.example.org") == ((None, "https://i.example.org/s.xml")))
  }

  test("sitemap discovery: robots-declared + well-known + one-level index recursion; rogue and gz shapes") {
    import spark.implicits._
    import graft.tools.SitemapFixture
    // two protocol-fixture shards (hosts smap0/smap1) + one plain
    // shard (well-known /sitemap.xml path, robots-declared too)
    val media = (Seq(0L, 1L).map(id => (id, SitemapFixture.row(id))) ++
      Seq((50L, WarcFixture.row(8L))))
      .map { case (id, (mime, bytes)) => (id, mime, bytes) }
      .toDF("media_id", "mime_type", "media")
    val pages = Archives.warcPageTable(spark, media)
    // the gz child's body inflates in the page walk
    val gzRows = pages.filter(col("target_uri").endsWith(".xml.gz"))
      .select("body_text", "body_gz_text")
      .as[(Option[String], Option[String])].collect()
    assert(gzRows.length == 2)
    assert(gzRows.forall(_._1.isEmpty), "gz body must not be WET text")
    assert(gzRows.forall(r => r._2.exists(_.contains("<urlset"))))
    // acceptance: declared index + its two children + the plain
    // shard's well-known path; the rogue urlset is NOT trusted
    val accepted = Archives.sitemapAcceptedUris(pages)
      .as[String].collect().toSet
    for (hh <- Seq(0L, 1L)) {
      assert(accepted(s"https://smap$hh.example.org/maps/index-$hh.xml"))
      assert(accepted(s"https://smap$hh.example.org/maps/pages-$hh.xml"))
      assert(accepted(s"https://smap$hh.example.org/maps/extra-$hh.xml.gz"))
      assert(!accepted(s"https://smap$hh.example.org/maps/rogue-$hh.xml"))
    }
    assert(accepted("https://data3.example.org/sitemap.xml"))
    // url entries: 3 plain + 2 gz per smap host, 3 for the data host;
    // rogue entries absent; the gz k=1 entry carries NULL lastmod
    val urls = Archives.sitemapUrls(pages)
      .as[(String, String, Option[String])].collect()
    assert(urls.count(_._1 == "smap0.example.org") == 5)
    assert(urls.count(_._1 == "smap1.example.org") == 5)
    assert(urls.count(_._1 == "data3.example.org") == 3)
    assert(!urls.exists(_._2.contains("rogue")))
    assert(urls.filter(_._2 == SitemapFixture.gzLoc(0, 1))
      .forall(_._3.isEmpty))
    assert(urls.filter(_._2 == SitemapFixture.gzLoc(0, 0))
      .forall(_._3.contains(SitemapFixture.gzLastmod(0))))
  }

  test("gunzipMarkupCapped: markup gate, tolerance on corrupt/truncated/non-markup gz") {
    import graft.tools.SitemapFixture
    def gz(raw: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
      val d = new java.util.zip.Deflater(6, true)
      val dos = new java.util.zip.DeflaterOutputStream(bos, d)
      dos.write(raw); dos.finish(); d.end()
      val crc = new java.util.zip.CRC32(); crc.update(raw)
      def le32(v: Long): Unit = (0 until 4).foreach(i =>
        bos.write(((v >>> (8 * i)) & 0xff).toInt))
      le32(crc.getValue); le32(raw.length.toLong)
      bos.toByteArray
    }
    def run(b: Array[Byte]) =
      Archives.gunzipMarkupCapped(b, 0, b.length, 1 << 20)
    // markup passes (leading whitespace tolerated)
    assert(run(gz("  \n<urlset><url/></urlset>".getBytes("US-ASCII")))
      .exists(_.contains("<url/>")))
    // the real fixture body inflates
    val fx = SitemapFixture.gzBody(2)
    assert(run(fx).contains(SitemapFixture.gzPlainBody(2)))
    // non-markup payloads are abandoned (the .tar.gz download case)
    assert(run(gz("just some text payload".getBytes("US-ASCII"))).isEmpty)
    // empty member, truncation at every depth, corrupt deflate: None
    assert(run(gz(Array.emptyByteArray)).isEmpty)
    for (cut <- Seq(0, 4, 9, 12, fx.length - 9, fx.length - 3))
      assert(run(fx.take(cut)).isEmpty, s"cut=$cut")
    val bad = fx.clone(); bad(14) = (bad(14) ^ 0x55).toByte
    run(bad) // corrupt deflate stream: must not throw
    // cap overrun claims nothing
    assert(Archives.gunzipMarkupCapped(fx, 0, fx.length, 8).isEmpty)
  }

  test("robots: UA-group attribution, longest-match precedence, allow wins ties") {
    import spark.implicits._
    val body = WarcFixture.robotsBody(1)
    val rules = Archives.robotsRules(
      Seq(("data1.example.org", body)).toDF("host", "body"))
    // the trailing badbot group's 'Disallow: /' must NOT leak in
    assert(rules.as[(String, String, String)].collect().toSet == Set(
      ("data1.example.org", "disallow", "/page1"),
      ("data1.example.org", "allow", "/page11"),
      ("data1.example.org", "disallow", "/secret/"),
      ("data1.example.org", "disallow", "/*4$"),
      ("data1.example.org", "allow", "/page*14$")))
    val pages = Seq(
      "https://data1.example.org/page11", // longer allow overrides
      "https://data1.example.org/page12", // /page1 prefix: disallowed
      "https://data1.example.org/page1", // exact disallow
      "https://data1.example.org/page2", // no matching rule: allowed
      "https://data1.example.org/page4", // wildcard /*4$ disallows
      "https://data1.example.org/page14", // Allow: /page*14$ (9 octets) wins
      "https://data1.example.org/page24", // /*4$ again
      "https://data1.example.org/page40", // ENDS in 0: the $ anchor must not fire
      "https://data1.example.org/secret/x",
      "https://other.example.org/page1" // host without rules: allowed
    ).toDF("target_uri")
    val got = Archives.robotsFilter(pages, rules)
      .select("target_uri", "robots_allowed", "matched_rule", "matched_prefix")
      .as[(String, Boolean, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val d = "https://data1.example.org"
    assert(got(s"$d/page11") == ((true, Some("allow"), Some("/page11"))))
    assert(got(s"$d/page12") == ((false, Some("disallow"), Some("/page1"))))
    assert(got(s"$d/page1") == ((false, Some("disallow"), Some("/page1"))))
    assert(got(s"$d/page2") == ((true, None, None)))
    assert(got(s"$d/page4") == ((false, Some("disallow"), Some("/*4$"))))
    assert(got(s"$d/page14") == ((true, Some("allow"), Some("/page*14$"))))
    assert(got(s"$d/page24") == ((false, Some("disallow"), Some("/*4$"))))
    assert(got(s"$d/page40") == ((true, None, None)))
    assert(got(s"$d/secret/x") == ((false, Some("disallow"), Some("/secret/"))))
    assert(got("https://other.example.org/page1") == ((true, None, None)))
    assert(got.size == 10)
    // equal-length allow/disallow on the same prefix: allow wins
    val tie = Archives.robotsFilter(
        Seq("https://h.example.org/xy").toDF("target_uri"),
        Archives.robotsRules(Seq(("h.example.org",
          "User-agent: *\nDisallow: /x\nAllow: /x\n")).toDF("host", "body")))
      .select("robots_allowed").as[Boolean].collect()
    assert(tie.toSeq == Seq(true))
  }

  test("link extraction: absolute pass, root-relative resolve, the rest skip") {
    import spark.implicits._
    val pages = Seq(("https://h.example.org/p",
      """<a href="https://ext.example.net/a">A</a> <a href="/b">B</a> """ +
        """<a href="//cdn.org/c">C</a> <a href="mailto:z@q.example.org">D</a> """ +
        """<a href="rel/e">E</a> <A HREF="/f">case</A> """ +
        // the three real-HTML quoting variants: single-quoted,
        // unquoted (value ends at whitespace or >), spaced `href =`
        """<a href='/sq'>S</a> <a class=x href=/uq>U</a> """ +
        """<a href=bare/v.html>V</a> <a href = "/sp">P</a>""")
    ).toDF("target_uri", "body_text")
    val got = Archives.linkTable(pages)
      .select("link").as[String].collect().toSet
    // protocol-relative and mailto skip; PATH-relative resolves
    // against the page's directory; the anchor match is
    // case-insensitive
    assert(got == Set("https://ext.example.net/a", "https://h.example.org/b",
      "https://h.example.org/rel/e", "https://h.example.org/f",
      "https://h.example.org/sq", "https://h.example.org/uq",
      "https://h.example.org/bare/v.html", "https://h.example.org/sp"))
    val g = Archives.hostLinkGraph(Archives.linkTable(pages))
      .as[(String, String, Long)].collect().toSet
    assert(g == Set(("h.example.org", "ext.example.net", 1L),
      ("h.example.org", "h.example.org", 7L)))
    // directory resolution: a page deeper in the tree resolves
    // path-relatives against ITS directory; dot-leading hrefs skip
    val deep = Seq(("https://h.example.org/dir/sub/p.html",
      """<a href="x.html">X</a> <a href="../up.html">U</a> <a href="./s.html">S</a>"""))
      .toDF("target_uri", "body_text")
    assert(Archives.linkTable(deep).select("link").as[String].collect().toSet ==
      Set("https://h.example.org/dir/sub/x.html"))
    // fixture: each 200-status html variant page (class 3; class 0 is
    // a 404 the WET face drops) emits its absolute cross-host anchor
    // and its resolved root-relative anchor, nothing else
    val ids = Seq(6L, 14L, 22L)
    val recs = Archives.warcRecordTable(spark,
        ids.map(id => (id, "application/warc", WarcFixture.row(id)._2))
          .toDF("media_id", "mime_type", "media"))
      .select("media_id", "record_idx", "target_uri")
    val links = Archives.linkTable(
        Archives.warcBodyTextTable(spark,
          ids.map(id => (id, "application/warc", WarcFixture.row(id)._2))
            .toDF("media_id", "mime_type", "media"))
          .filter(org.apache.spark.sql.functions.lower(
            org.apache.spark.sql.functions.col("content_type"))
            .startsWith("text/html"))
          .join(recs, Seq("media_id", "record_idx")))
      .select("media_id", "link").as[(Long, String)].collect().toSet
    assert(links == ids.flatMap { id =>
      Seq(
        id -> s"https://data${(id + 1) % 5}.example.org/page${id % 40}",
        id -> s"https://data${id % 5}.example.org/page${(id + 2) % 40}",
        id -> s"https://data${id % 5}.example.org/sub/page${(id + 3) % 40}.html",
        id -> s"https://data${id % 5}.example.org/pageS${(id + 4) % 40}",
        id -> s"https://data${id % 5}.example.org/sub/u${(id + 5) % 40}.html",
        id -> s"https://data${id % 5}.example.org/pageQ${(id + 6) % 40}")
    }.toSet)
  }

  test("host rank: fixed-point recurrence matches an independent scalar replay") {
    import spark.implicits._
    // asymmetric hub graph: a and b both cite c; c cites a back;
    // b has no in-links and must sit at exactly the damping floor
    val edges = Seq(
      ("a.example.org", "c.example.org", 3L), ("b.example.org", "c.example.org", 1L),
      ("c.example.org", "a.example.org", 2L))
    val got = Archives.hostRank(
        edges.toDF("src_host", "dst_host", "n_links"), iterations = 10)
      .as[(String, Long)].collect().toMap
    // independent replay of the documented recurrence in plain Scala
    val scale = 1000000000000L
    val nodes = Seq("a.example.org", "b.example.org", "c.example.org")
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 0 until 10) {
      val contrib = nodes.map { d =>
        d -> edges.filter(_._2 == d)
          .map { case (s, _, w) => (r(s) / outdeg(s)) * w }.sum
      }.toMap
      r = nodes.map(d => d -> (scale * 15 / 100 + 85 * contrib(d) / 100)).toMap
    }
    assert(got == r)
    assert(got("b.example.org") == scale * 15 / 100) // no in-links: damping floor
    // b's floor is strictly below both circulating hosts
    assert(got("a.example.org") > got("b.example.org") &&
      got("c.example.org") > got("b.example.org"))
  }

  test("pdf xref walk: single-section layout matches the assembled offsets") {
    import graft.tools.PdfFixture
    for (id <- Seq(0L, 2L, 4L, 8L, 10L, 12L)) { // single-section CLASSIC ids
      val got = Archives.pdfXref(PdfFixture.row(id)._2)
      val (_, offs) = PdfFixture.base(id)
      val bodies = PdfFixture.objects(id)
      assert(got.size == bodies.size + 1, s"id=$id")
      assert(got.head ==
        Archives.PdfEnt(0, 0, 65535, 0L, false, "free", None, None, None),
        s"id=$id")
      got.tail.zipWithIndex.foreach { case (e, i) =>
        assert(e.section == 0 && e.num == i + 1 && e.gen == 0 && e.inUse &&
          e.kind == "direct", s"id=$id obj=${e.num}")
        assert(e.f2 == offs(i), s"id=$id obj=${e.num}")
        val objStr = PdfFixture.obj(i + 1, 0, bodies(i))
        assert(e.objLen.contains(objStr.indexOf("endobj").toLong + 6),
          s"id=$id obj=${e.num}")
        val wantT = "/Type /([A-Za-z]+)".r.findFirstMatchIn(bodies(i)).map(_.group(1))
        assert(e.objType == wantT, s"id=$id obj=${e.num}")
      }
    }
  }

  test("pdf xref STREAM + ObjStm: the 1.5+ form walks to the same catalog") {
    import graft.tools.PdfFixture
    for (id <- Seq(6L, 14L, 22L)) {
      val k = PdfFixture.nPages(id)
      val got = Archives.pdfXref(PdfFixture.row(id)._2)
      assert(got.size == 5 + 2 * k, s"id=$id")
      assert(got.forall(_.section == 0), s"id=$id single section")
      val byNum = got.map(e => e.num -> e).toMap
      // the free head
      assert(byNum(0).kind == "free" && !byNum(0).inUse && byNum(0).gen == 65535)
      // type-2 members: f2 = the ObjStm's object number, gen = index,
      // type + length proven from the DECODED stream
      val members = PdfFixture.stmMembers(id)
      for (i <- 1 to 2 + k) {
        val e = byNum(i)
        assert(e.kind == "objstm" && e.inUse && e.f2 == 3 + 2 * k && e.gen == i - 1,
          s"id=$id obj=$i raw")
        assert(e.objLen.contains(members(i - 1).length.toLong), s"id=$id obj=$i len")
        val wantT = "/Type /([A-Za-z]+)".r.findFirstMatchIn(members(i - 1)).map(_.group(1))
        assert(e.objType == wantT, s"id=$id obj=$i type")
      }
      // direct content cells on the fixed grid, no /Type, cell-1 long
      for (p <- 0 until k) {
        val e = byNum(3 + k + p)
        assert(e.kind == "direct" && e.f2 == PdfFixture.HeadLen + PdfFixture.ContentCell * p
          && e.objType.isEmpty
          && e.objLen.contains(PdfFixture.ContentCell - 1L), s"id=$id content $p")
      }
      assert(byNum(3 + 2 * k).objType.contains("ObjStm") &&
        byNum(3 + 2 * k).objLen.contains(PdfFixture.ObjStmCell - 1L))
      assert(byNum(4 + 2 * k).objType.contains("XRef") &&
        byNum(4 + 2 * k).objLen.contains(PdfFixture.XrefCell - 1L))
      // page text extracts through the ObjStm page dicts
      assert(Archives.pdfPageTexts(PdfFixture.row(id)._2) ==
        (0 until k).map(p => (3 + p, 3 + k + p, s"doc $id page $p")))
    }
  }

  test("pdf xref STREAM: FlateDecode + PNG Predictor 12 rows parse like the hex twin") {
    // a synthetic 1.5+ xref stream whose data is deflated with the
    // PNG 'Up' per-row filter — the encoding real-web writers emit
    val o1 = "%PDF-1.5\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"
    val rows = Seq(
      Array(0, 0, 0, 0, 0, 255, 255), // obj 0: free
      Array(1, 0, 0, 0, 9, 0, 0))     // obj 1: direct at 9
    // PNG Up filter: row = 2 prefix, bytes = cur - prev
    val filtered = new java.io.ByteArrayOutputStream()
    rows.zipWithIndex.foreach { case (r, i) =>
      filtered.write(2)
      r.indices.foreach { j =>
        val prev = if (i == 0) 0 else rows(i - 1)(j)
        filtered.write((r(j) - prev) & 0xff)
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(filtered.toByteArray); d.finish()
    val zbuf = new Array[Byte](256)
    val zn = d.deflate(zbuf); d.end()
    val z = new String(zbuf, 0, zn, java.nio.charset.StandardCharsets.ISO_8859_1)
    val xref = s"2 0 obj\n<< /Type /XRef /Size 2 /W [ 1 4 2 ] " +
      s"/DecodeParms << /Predictor 12 /Columns 7 >> " +
      s"/Filter /FlateDecode /Length ${z.length} >>\nstream\n$z\nendstream\nendobj\n"
    val pdf = o1 + xref + s"startxref\n${o1.length}\n%%EOF\n"
    val got = Archives.pdfXref(pdf.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(got.map(e => (e.num, e.f2, e.inUse, e.kind)) ==
      Seq((0, 0L, false, "free"), (1, 9L, true, "direct")))
    assert(got(1).objType.contains("Catalog"))
    // corrupt deflate bytes: the section contributes nothing, no throw
    val bad = pdf.replace(z, z.reverse)
    assert(Archives.pdfXref(bad.getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1)).isEmpty)
  }

  test("pdf xref walk: /Prev chains sections; resolution prefers the latest") {
    import graft.tools.PdfFixture
    import spark.implicits._
    val id = 1L
    val got = Archives.pdfXref(PdfFixture.row(id)._2)
    val base = PdfFixture.objects(id).size + 1
    assert(got.count(_.section == 0) == 1) // the update section: obj 3 only
    assert(got.count(_.section == 1) == base) // the full base table
    val upd = got.find(_.section == 0).get
    assert(upd.num == 3 && upd.gen == 1 && upd.inUse && upd.objType.contains("Page"))
    val resolved = Archives.pdfObjectTable(spark,
        Seq((id, "application/pdf", PdfFixture.row(id)._2))
          .toDF("media_id", "mime_type", "media"))
      .as[(Long, Int, Int, Long, String, Option[String], Long)].collect()
      .map(r => r._2 -> r).toMap
    assert(resolved(3)._3 == 1 && resolved(3)._4 == upd.f2)
    assert(resolved.size == base - 1) // every in-use object, no free head
    assert(resolved.values.forall(_._5 == "direct"))
    assert(resolved(1)._6.contains("Catalog") && resolved(2)._6.contains("Pages"))
  }

  test("pdf xref walk: bad startxref/junk yield nothing; multi-subsection and tombstones work") {
    import graft.tools.PdfFixture
    import spark.implicits._
    assert(Archives.pdfXref(PdfFixture.row(3L)._2).isEmpty)
    assert(Archives.pdfXref(PdfFixture.row(7L)._2).isEmpty)
    assert(Archives.pdfXref(null).isEmpty)
    assert(Archives.pdfXref(Array.emptyByteArray).isEmpty)
    // synthetic multi-subsection table (a PDF after several updates
    // compacts to `start count` runs) — the fixture stays
    // single-subsection, the walker must not
    val o1 = "%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"
    val pdf = o1 + "xref\n0 2\n" +
      PdfFixture.entry(0, 65535, inUse = false) +
      PdfFixture.entry(9, 0, inUse = true) +
      "5 1\n" + PdfFixture.entry(0, 0, inUse = false) +
      s"trailer\n<< /Size 6 >>\nstartxref\n${o1.length}\n%%EOF\n"
    val got = Archives.pdfXref(pdf.getBytes("US-ASCII"))
    assert(got.map(e => (e.num, e.f2, e.inUse)) ==
      Seq((0, 0L, false), (1, 9L, true), (5, 0L, false)))
    assert(got(1).objType.contains("Catalog"))
    // an 'f' override in the LATEST section tombstones the object:
    // older generations must not resurface in the resolved table
    val x1 = "xref\n0 2\n" + PdfFixture.entry(0, 65535, inUse = false) +
      PdfFixture.entry(9, 0, inUse = true) +
      s"trailer\n<< /Size 2 >>\nstartxref\n${o1.length}\n%%EOF\n"
    val part1 = o1 + x1
    val pdf2 = part1 + "xref\n1 1\n" + PdfFixture.entry(0, 0, inUse = false) +
      s"trailer\n<< /Size 2 /Prev ${o1.length} >>\nstartxref\n${part1.length}\n%%EOF\n"
    val resolved2 = Archives.pdfObjectTable(spark,
        Seq((9L, "application/pdf", pdf2.getBytes("US-ASCII")))
          .toDF("media_id", "mime_type", "media")).collect()
    assert(resolved2.isEmpty)
  }

  test("pdf page text: Tj strings per page; an updated page without /Contents drops out") {
    import graft.tools.PdfFixture
    // plain single-section file: every page's text from the contract,
    // plus the ToUnicode page decoding through its CMap
    val id0 = 2L // nPages = 3
    val k0 = PdfFixture.nPages(id0)
    val got0 = Archives.pdfPageTexts(PdfFixture.row(id0)._2)
    assert(got0 == (0 until k0).map { p =>
      (3 + 2 * p, 4 + 2 * p, s"doc $id0 page $p")
    } ++ Seq((5 + 2 * k0, 6 + 2 * k0, PdfFixture.uMapped(id0)),
      (10 + 2 * k0, 11 + 2 * k0, PdfFixture.encMapped(id0))))
    // update file: page object 3's revision has NO /Contents — page 0
    // must emit nothing, later pages unaffected
    val id1 = 1L // nPages = 2, incremental update rewrites obj 3
    val k1 = PdfFixture.nPages(id1)
    val got1 = Archives.pdfPageTexts(PdfFixture.row(id1)._2)
    assert(got1 == Seq((5, 6, s"doc $id1 page 1"),
      (5 + 2 * k1, 6 + 2 * k1, PdfFixture.uMapped(id1)),
      (10 + 2 * k1, 11 + 2 * k1, PdfFixture.encMapped(id1))))
  }

  test("pdf /Encoding fallback: Annex D tables, /Differences, precedence") {
    import graft.tools.PdfFixture
    // fixture contract spot-pins (WinAnsi high codes, Mac base +
    // Differences overrides)
    assert(PdfFixture.encMapped(2L) == "Wé“«Â é•—áÇ")
    assert(PdfFixture.encMapped(5L) == "Wé“«Å é•—áÄ")
    // Annex D spot-pins straight off the tables
    assert(PdfEncodings.winAnsi(0xE9) == "é" && PdfEncodings.winAnsi(0x93) == "“"
      && PdfEncodings.winAnsi(0x80) == "€")
    assert(PdfEncodings.macRoman(0x8E) == "é" && PdfEncodings.macRoman(0xA5) == "•"
      && PdfEncodings.macRoman(0xD0) == "–" && PdfEncodings.macRoman(0xDB) == "¤")
    assert(!PdfEncodings.macRoman.contains(0xF0)) // the Apple logo: nothing
    assert(PdfEncodings.standard(0x27) == "’" && PdfEncodings.standard(0xA4) == "⁄"
      && PdfEncodings.standard(0xFB) == "ß")
    // glyph-name resolution incl. the uniXXXX arithmetic form
    assert(PdfEncodings.glyphToUnicode("eacute").contains("é"))
    assert(PdfEncodings.glyphToUnicode("uni4E2D").contains("中"))
    assert(PdfEncodings.glyphToUnicode("noSuchGlyph").isEmpty)
  }

  test("pdf ToUnicode: 1-byte and 2-byte CMaps decode show codes to text") {
    import graft.tools.PdfFixture
    // even id: 1-byte bfranges (A-Z → Cyrillic, space-9 identity)
    assert(PdfFixture.uMapped(2L) == "ГОВ 2 МАП")
    // odd id: 2-byte bfrange + bfchar (codes → U+4E01.., U+4E2D)
    assert(PdfFixture.uMapped(5L).length == 5 &&
      PdfFixture.uMapped(5L).last == 0x4E2D.toChar)
    // the parser itself: both range forms, multi-char destinations
    val cm1 = Archives.pdfCmap(
      "begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        "beginbfchar\n<61> <0041>\n<62> <00660069>\nendbfchar").get
    assert(cm1.codeBytes == 1 && cm1.map(0x61) == "A" && cm1.map(0x62) == "fi")
    val cm2 = Archives.pdfCmap(
      "begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
        "beginbfrange\n<0010> <0012> [<0058> <0059> <005A>]\nendbfrange").get
    assert(cm2.codeBytes == 2 &&
      (0x10 to 0x12).map(cm2.map) == Seq("X", "Y", "Z"))
    // unmapped codes claim nothing; text before any Tf stays literal
    val fonts = Map("F9" -> Archives.PdfFontMap(1, Map('a'.toInt -> "Z")))
    assert(Archives.pdfShowText("(raw) Tj /F9 1 Tf (aba) Tj", fonts) == "raw ZZ")
    // a font the dict doesn't know resets to the literal behavior
    assert(Archives.pdfShowText("/F9 1 Tf (aa) Tj /F0 1 Tf (aa) Tj", fonts)
      == "ZZ aa")
    // junk cmap claims nothing
    assert(Archives.pdfCmap("no blocks here").isEmpty)
    // hostile over-long codes can't overflow Int: an 8-digit bfchar
    // code simply doesn't match (bounded capture) — no throw, and the
    // well-formed sibling entry still decodes
    val hostile = Archives.pdfCmap(
      "begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        "beginbfchar\n<63> <0042>\n<FFFFFFFF> <0041>\nendbfchar\n" +
        "beginbfrange\n<FFFFFFFF> <FFFFFFFF> <0043>\nendbfrange")
    assert(hostile.exists(m => m.map == Map(0x63 -> "B")))
    // quadratic-allocation defense: a full-width bfrange whose
    // incremented base is over the 32-digit destination bound claims
    // nothing instead of materializing 65k copies of a huge string
    val bomb = Archives.pdfCmap(
      "begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
        "beginbfrange\n<0000> <FFFF> <" + "41" * 64 + ">\nendbfrange")
    assert(bomb.isEmpty)
  }

  test("pdf show operators: TJ arrays, hex strings, move-and-show forms") {
    // one TJ array: pieces concatenate, kerning numbers drop
    assert(Archives.pdfShowText("BT [ (ab) -250 (cd) 17 (ef) ] TJ ET")
      == "abcdef")
    // mixed literal + hex pieces inside TJ (hex = "XY")
    assert(Archives.pdfShowText("[ (a) <5859> (b) ] TJ") == "aXYb")
    // hex-string Tj with internal whitespace and an ODD digit
    // (pads 0 per ISO 32000): 48 65 6C 6C 6F = Hello, odd "4" -> 0x40
    assert(Archives.pdfShowText("<48 65\n6C6C 6F> Tj") == "Hello")
    assert(Archives.pdfShowText("<484> Tj") == "H@")
    // move-and-show ' and " operators, literal and hex forms
    assert(Archives.pdfShowText("(one) ' (two) \" <33> '") == "one two 3")
    // operators interleave in stream order across forms
    assert(Archives.pdfShowText(
      "BT (a) Tj [ (b) 5 (c) ] TJ <64> Tj ET") == "a bc d")
    // a parenthesized string NOT followed by a show operator is not
    // text; an array not followed by TJ is not either
    assert(Archives.pdfShowText("(skip) Td (keep) Tj [ (no) ] XX") == "keep")
    // empty stream, no-ops
    assert(Archives.pdfShowText("") == "")
    assert(Archives.pdfShowText("BT /F1 12 Tf 72 720 Td ET") == "")
    // the fixture's three cycling forms all extract the same text
    for (p <- 0 until 3)
      assert(Archives.pdfShowText(graft.tools.PdfFixture.pageShow(7L, p))
        == s"doc 7 page $p", s"form $p")
  }

  test("pdf page text: FlateDecode streams inflate; corrupt deflate claims nothing") {
    import graft.tools.PdfFixture
    def flatePdf(data: Array[Byte]): Array[Byte] = {
      val o1 = "%PDF-1.4\n"
      val page = PdfFixture.obj(1, 0,
        "<< /Type /Page /Contents 2 0 R >>")
      val zs = new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
      val cnt = PdfFixture.obj(2, 0,
        s"<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n$zs\nendstream")
      val head = o1 + page + cnt
      val xoff = head.length
      val xref = s"xref\n0 3\n" + PdfFixture.entry(0, 65535, inUse = false) +
        PdfFixture.entry(o1.length, 0, inUse = true) +
        PdfFixture.entry(o1.length + page.length, 0, inUse = true) +
        s"trailer\n<< /Size 3 >>\nstartxref\n$xoff\n%%EOF\n"
      (head + xref).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    val payload = "BT (hello flate) Tj ET".getBytes("US-ASCII")
    val d = new java.util.zip.Deflater()
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](256)
    val n = d.deflate(buf); d.end()
    val z = buf.take(n)
    assert(Archives.pdfPageTexts(flatePdf(z)) == Seq((1, 2, "hello flate")))
    // corrupt deflate: the page emits nothing, the walk doesn't throw
    val bad = z.clone(); bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x5a).toByte
    val t = Archives.pdfPageTexts(flatePdf(bad))
    assert(t.isEmpty || t.forall(_._3 != "hello flate"))
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
      Archives.pdfXref(b)
      // seed corruption: flip bytes inside real archives
      val wid = rnd.nextInt(16).toLong
      for (real0 <- Seq(WarcFixture.row(wid)._2, TarFixture.row(wid)._2,
          ZipFixture.row(wid)._2, graft.tools.WarcGzFixture.row(wid)._2,
          graft.tools.PdfFixture.row(wid)._2)) {
        val real = real0.clone()
        if (real.nonEmpty) real(rnd.nextInt(real.length)) = rnd.nextInt().toByte
        Archives.warcRecords(real)
        Archives.tarMembers(real)
        Archives.zipEntries(real)
        Archives.warcGzMembers(real)
        Archives.pdfXref(real)
      }
    }
  }
}
