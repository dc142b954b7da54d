package graft.ops

import graft.SparkSpec
import graft.tools.{Mp3DupFixture, VorbisEncoder}

/**
 * Round-20 hardening of the Vorbis decoder (the ADVICE findings) and
 * the Vorbis-in-WebM path: setup-wide resource budget, Long-safe
 * lookup sizing, EOP-mid-floor channel-unused semantics, VQ scratch
 * sized from the stream's own dims, and the WebM mux/demux
 * roundtrip against the Ogg twin.
 */
class VorbisHardeningSpec extends SparkSpec {

  // ---- tiny LSb-first writer + Ogg page assembly for crafted setups
  private final class W {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var n = 0
    def bits(v: Long, len: Int): Unit = {
      var k = 0
      while (k < len) {
        cur |= (((v >> k) & 1L).toInt) << n
        n += 1
        if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
        k += 1
      }
    }
    def toBytes: Array[Byte] = if (n > 0) buf.toArray :+ cur.toByte else buf.toArray
  }

  private def idPacket(rate: Int = 32000): Array[Byte] = {
    val b = new Array[Byte](30)
    b(0) = 1
    "vorbis".zipWithIndex.foreach { case (c, i) => b(1 + i) = c.toByte }
    b(11) = 1 // channels
    b(12) = (rate & 0xff).toByte; b(13) = ((rate >> 8) & 0xff).toByte
    b(14) = ((rate >> 16) & 0xff).toByte; b(15) = ((rate >> 24) & 0xff).toByte
    b(28) = 0x99.toByte // blocksizes 512/512
    b(29) = 1 // framing
    b
  }

  private def commentPacket(): Array[Byte] = {
    val b = new Array[Byte](16)
    b(0) = 3
    "vorbis".zipWithIndex.foreach { case (c, i) => b(1 + i) = c.toByte }
    b(15) = 1 // framing (vendor len 0, comment count 0)
    b
  }

  private def setupPacket(body: W => Unit): Array[Byte] = {
    val w = new W
    w.bits(5, 8)
    "vorbis".foreach(c => w.bits(c.toLong, 8))
    body(w)
    w.toBytes
  }

  /** Minimal Ogg stream: BOS page with the id packet, one page with
   * comment + setup (dummy CRC — demux does not verify). */
  private def ogg(packets: Seq[Seq[Array[Byte]]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    packets.zipWithIndex.foreach { case (pagePkts, i) =>
      val lacing = scala.collection.mutable.ArrayBuffer.empty[Int]
      pagePkts.foreach { p =>
        var rem = p.length
        while (rem >= 255) { lacing += 255; rem -= 255 }
        lacing += rem
      }
      val h = new Array[Byte](27)
      h(0) = 'O'; h(1) = 'g'; h(2) = 'g'; h(3) = 'S'
      h(5) = (if (i == 0) 2 else 0).toByte // BOS on the first page
      h(14) = 0x42 // serial
      h(18) = i.toByte // page sequence
      h(26) = lacing.size.toByte // page_segments
      out.write(h, 0, 27)
      lacing.foreach(out.write)
      pagePkts.foreach(p => out.write(p, 0, p.length))
    }
    out.toByteArray
  }

  /** A valid ordered-mode codebook declaration: `entries` codewords,
   * all of length log2(entries) (a full tree), lookup type 0. */
  private def fullTreeBook(w: W, dims: Int, entries: Int, lenBits: Int,
      withLookup: Boolean = false): Unit = {
    w.bits(0x564342, 24)
    w.bits(dims, 16)
    w.bits(entries, 24)
    w.bits(1, 1) // ordered
    w.bits(lenBits - 1, 5)
    // one run covering all entries at the initial length
    val runBits = 32 - Integer.numberOfLeadingZeros(entries)
    w.bits(entries, runBits)
    if (withLookup) {
      w.bits(2, 4) // lookup type 2
      w.bits(0, 32); w.bits(0, 32) // min, delta
      w.bits(0, 4) // valueBits − 1
      w.bits(0, 1) // sequence_p
      // the lookup-bound check fires before any value is read
    } else w.bits(0, 4)
  }

  test("hostile setup: total codebook entries across books are budgeted") {
    // two books of 2^19 (valid full trees) + 1: the second book's
    // declaration alone exceeds the setup-wide 2^20 entry budget and
    // must be rejected BEFORE its arrays are allocated
    val su = setupPacket { w =>
      w.bits(1, 8) // 2 books
      fullTreeBook(w, dims = 1, entries = 1 << 19, lenBits = 19)
      w.bits(0x564342, 24)
      w.bits(1, 16)
      w.bits((1 << 19) + 1, 24) // entries: over the remaining budget
      w.bits(0, 8) // filler (unreached)
    }
    val stream = ogg(Seq(Seq(idPacket()), Seq(commentPacket(), su)))
    val ex = intercept[RuntimeException](Vorbis.decodeOrThrow(stream))
    assert(ex.getMessage.contains("entries budget"), ex.getMessage)
    assert(Vorbis.decode(stream).isEmpty)
  }

  test("lookup sizing is Long-safe: entries*dims that wraps Int is rejected") {
    // 2^20 entries × 4096 dims = 2^32: wraps to 0 in Int (the old
    // bound then passed and allocated a lookup inconsistent with
    // decodeVq's indexing); the Long bound rejects it at header time
    val su = setupPacket { w =>
      w.bits(0, 8) // 1 book
      fullTreeBook(w, dims = 4096, entries = 1 << 20, lenBits = 20,
        withLookup = true)
    }
    val stream = ogg(Seq(Seq(idPacket()), Seq(commentPacket(), su)))
    val ex = intercept[RuntimeException](Vorbis.decodeOrThrow(stream))
    assert(ex.getMessage.contains("lookup bounds"), ex.getMessage)
    assert(Vorbis.decode(stream).isEmpty)
  }

  test("VQ scratch is sized from the stream's own dims (> 64 decodes)") {
    // a legal residue book with dims 100: the fixed 64-float scratch
    // of rounds 18-19 would AIOOBE (silently claiming nothing)
    val child = Vorbis.buildTree(Array.fill(4)(2))
    val lookup = Array.tabulate(4 * 100)(i => i.toFloat)
    val book = new Vorbis.Codebook(100, 4, child, lookup, 0, 2, 0f, 1f,
      sequenceP = false)
    val r = Vorbis.Residue(1, 0, 100, 100, 1, 0,
      Array(1), Array(Array(0, -1, -1, -1, -1, -1, -1, -1)))
    assert(Vorbis.residueScratchDims(r, Array(book)) == 100)
    val out = new Array[Float](Vorbis.residueScratchDims(r, Array(book)))
    val br = new Vorbis.Br(new Array[Byte](32)) // entry 0 = codeword 00
    assert(book.decodeVq(br, out))
    (0 until 100).foreach(k => assert(out(k) == k.toFloat))
  }

  test("EOP mid-floor renders the channel unused (silent frame), decode stays total") {
    val pcm = Mp3DupFixture.basePcm(6L)
    val oggBytes = VorbisEncoder.encode(pcm, 32000)
    val webm = Remux.webmVorbisFromOgg(oggBytes)
    val (packets, clamp) = Multimodal.AvHeaders.webmVorbisPackets(webm).get
    val ref = Vorbis.decodePacketsSafe(packets, clamp).get
    // cut the FIRST audio packet to 2 bytes: the mode bit survives
    // (frame geometry unchanged) but the cut lands inside the floor
    // posts — the channel must go UNUSED (silence), not synthesize a
    // curve from zero-filled posts
    val cut = packets.updated(3, java.util.Arrays.copyOf(packets(3), 2))
    val dec = Vorbis.decodePacketsSafe(cut, clamp).get
    assert(dec.samples.length == ref.samples.length)
    assert(!dec.samples.sameElements(ref.samples), "the cut changed nothing")
    // blocks after the first are untouched: outputs must re-converge
    var i = 768
    while (i < ref.samples.length) {
      assert(dec.samples(i) == ref.samples(i), s"diverged at $i")
      i += 1
    }
  }

  test("webm mux/demux roundtrip: decode equals the Ogg twin exactly") {
    for ((pcm, switched) <- Seq((Mp3DupFixture.basePcm(3L), false),
      (Mp3DupFixture.basePcm(4L), true))) {
      val oggBytes =
        if (switched) VorbisEncoder.encodeSwitched(pcm, 32000)
        else VorbisEncoder.encode(pcm, 32000)
      val ref = Vorbis.decode(oggBytes).get
      val webm = Remux.webmVorbisFromOgg(oggBytes)
      val dec = Vorbis.decodeWebm(webm).getOrElse(sys.error("webm claims nothing"))
      assert(dec.sampleRate == ref.sampleRate && dec.channels == ref.channels)
      assert(dec.samples.length == ref.samples.length,
        s"${dec.samples.length} vs ${ref.samples.length}")
      assert(dec.samples.sameElements(ref.samples))
      // the fingerprint path sees it too, as a webm container
      assert(AudioFp.audioContainer(webm) == "webm")
      assert(AudioFp.monoSamples(webm).nonEmpty)
    }
  }

  test("webm-muxed re-encode pairs with its WAV twin at the codec gate") {
    val g = 2L
    val pcm = Mp3DupFixture.basePcm(g)
    val wav = Mp3DupFixture.wav(pcm)
    val webm = Remux.webmVorbisFromOgg(VorbisEncoder.encode(pcm, 32000))
    val a = AudioFp.signature(wav).getOrElse(sys.error("wav has no signature"))
    val b = AudioFp.signature(webm).getOrElse(sys.error("webm has no signature"))
    val ham = (0 until AudioFp.SigBands)
      .map(i => Integer.bitCount(a(i) ^ b(i))).sum
    assert(ham <= 7, s"wav/webm twin hamming $ham")
  }

  test("junk wraps into a valid webm container that honestly decodes nothing") {
    val w = Remux.webmVorbisFromOgg("junk, not audio".getBytes("US-ASCII"))
    assert(AudioFp.audioContainer(w) == "webm")
    assert(Multimodal.AvHeaders.parseWebm(w).nonEmpty)
    assert(Vorbis.decodeWebm(w).isEmpty)
    assert(AudioFp.monoSamples(w).isEmpty)
  }

  test("EBML lacing variant decodes identically (signed-delta sizes)") {
    // re-lace the muxer's Xiph blocks as EBML lacing by hand: same
    // packets, the decoder's third lacing branch
    val pcm = Mp3DupFixture.basePcm(7L)
    val oggBytes = VorbisEncoder.encode(pcm, 32000)
    val (packets, clamp) = Multimodal.AvHeaders
      .webmVorbisPackets(Remux.webmVorbisFromOgg(oggBytes)).get
    // build one synthetic EBML-laced block over the first 3 audio
    // packets and parse it back through webmBlockFrames
    val grp = packets.slice(3, 6)
    def vintBytes(v: Long): Array[Byte] = {
      var len = 1
      while (v >= (1L << (7 * len)) - 1) len += 1
      Array.tabulate[Byte](len) { i =>
        val x = v >>> (8 * (len - 1 - i))
        if (i == 0) (x | (0x100 >> len)).toByte else x.toByte
      }
    }
    def svintBytes(delta: Long): Array[Byte] = {
      var len = 1
      while (math.abs(delta) >= (1L << (7 * len - 1)) - 1) len += 1
      val stored = delta + ((1L << (7 * len - 1)) - 1)
      Array.tabulate[Byte](len) { i =>
        val x = stored >>> (8 * (len - 1 - i))
        if (i == 0) (x | (0x100 >> len)).toByte else x.toByte
      }
    }
    val sizes = grp.map(_.length)
    val block = Array[Byte](0x81.toByte, 0, 0, 0x86.toByte) ++ // EBML lacing (bits 11)
      Array((grp.size - 1).toByte) ++
      vintBytes(sizes(0).toLong) ++
      svintBytes((sizes(1) - sizes(0)).toLong) ++
      grp.flatten
    val (track, frames) = Multimodal.AvHeaders.webmBlockFrames(block, 0, block.length)
    assert(track == 1L)
    assert(frames.size == 3)
    val recovered = frames.map { case (o, l) =>
      java.util.Arrays.copyOfRange(block, o, o + l) }
    (0 until 3).foreach(k => assert(recovered(k).sameElements(grp(k)), s"frame $k"))
    // and a full decode with the re-laced packets matches
    val full = Vorbis.decodePacketsSafe(packets, clamp).get
    val relaced = Vorbis.decodePacketsSafe(
      packets.take(3) ++ recovered ++ packets.drop(6), clamp).get
    assert(relaced.samples.sameElements(full.samples))
  }
}
