package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Loaders for the driver-provided parquet fixtures (TESTDATA.md).
 *
 * The `events` table is written with parquet TIMESTAMP(NANOS), which
 * Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it
 * with `spark.sql.legacy.parquet.nanosAsLong` and truncate ns→µs
 * ourselves, which matches DuckDB's TIMESTAMP_NS→TIMESTAMP cast
 * semantics (truncation toward zero for positive epochs), so the oracle
 * sees identical microsecond values.
 *
 * All loaders return plain scans — filters/projections applied by the
 * caller push down into the parquet reader (verify with
 * `.explain("formatted")`: PushedFilters / ReadSchema).
 */
object Tables {

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  private def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))

  /** events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,
   *  event_type STRING, value DOUBLE, props STRING).
   *
   * Fixture generations have carried `ts` as TIMESTAMP(NANOS) (read as
   * LongType under the legacy conf), TIMESTAMP(MICROS, adjustedToUTC)
   * (plain TimestampType), and TIMESTAMP(MICROS, isAdjustedToUTC=false)
   * (TimestampNTZType). Normalise all three to one canonical
   * TimestampType here so downstream ops (`unix_micros`, window funcs)
   * see a single type. The session TZ is pinned to UTC in every
   * entrypoint, so the NTZ→TIMESTAMP cast is value-preserving. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      // Legacy nanos-as-long: `div` keeps the ns→µs conversion in
      // integer space (no double rounding).
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** The events table as a typed Dataset[Event] for the rule
   * interpreter: event_type→event, ts→datetime, user_id carried in the
   * payload as the correlation key (FIXTURES.md §2 mapping). */
  def eventsTyped(spark: SparkSession, sfDir: String): org.apache.spark.sql.Dataset[graft.model.Event] = {
    import spark.implicits._
    events(spark, sfDir).select(
      col("event_type").as("event"),
      col("event_id").cast("string").as("id"),
      col("ts").as("datetime"),
      lit(null).cast("timestamp").as("receivedTime"),
      map(lit("key"), col("user_id").cast("string")).as("payload"))
      .as[graft.model.Event]
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")

  /** media(media_id BIGINT, mime_type STRING, media BINARY) — the
   * repo-local deterministic binary fixture (tools.MediaFixture; the
   * driver fixtures carry no binary column). Scale-independent: the
   * same 500 blobs at every sf. */
  def mediaFixturePath: String = {
    val local = new java.io.File("fixtures/media.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/media.parquet"
  }
  def media(spark: SparkSession): DataFrame = spark.read.parquet(mediaFixturePath)

  /** av(media_id BIGINT, mime_type STRING, media BINARY) — repo-local
   * deterministic audio/container fixture (tools.AvFixture: WAV / GIF /
   * BMP blobs plus broken rows). Scale-independent like media. */
  def avFixturePath: String = {
    val local = new java.io.File("fixtures/av.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/av.parquet"
  }
  def av(spark: SparkSession): DataFrame = spark.read.parquet(avFixturePath)

  /** mp4(media_id BIGINT, mime_type STRING, media BINARY) — repo-local
   * deterministic ISO-BMFF video-container fixture (tools.Mp4Fixture:
   * real ftyp/free/moov box structures plus broken rows). */
  def mp4FixturePath: String = {
    val local = new java.io.File("fixtures/mp4.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/mp4.parquet"
  }
  def mp4(spark: SparkSession): DataFrame = spark.read.parquet(mp4FixturePath)

  /** audio(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic audio-container fixture
   * (tools.AudioFixture: AIFF / AU / G.711 mu-law+A-law WAV blobs plus
   * broken rows). */
  def audioFixturePath: String = {
    val local = new java.io.File("fixtures/audio.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/audio.parquet"
  }

  /** aifc(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic AIFF-C fixture (tools.AifcFixture:
   * 'sowt'/'fl32'/'NONE' PCM variants plus the 'ima4' honest-zero
   * compressed class). */
  def aifcFixturePath: String = {
    val local = new java.io.File("fixtures/aifc.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/aifc.parquet"
  }
  def aifc(spark: SparkSession): DataFrame = spark.read.parquet(aifcFixturePath)

  /** mp3lsf(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic MPEG-2 LSF re-encode pairs
   * (tools.Mp3LsfFixture: 22.05 kHz WAV originals + single-granule
   * LSF Layer III encodes of the same PCM, plus junk rows). */
  def mp3lsfFixturePath: String = {
    val local = new java.io.File("fixtures/mp3lsf.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/mp3lsf.parquet"
  }
  def mp3lsf(spark: SparkSession): DataFrame = spark.read.parquet(mp3lsfFixturePath)
  def audio(spark: SparkSession): DataFrame = spark.read.parquet(audioFixturePath)

  /** ogg(media_id BIGINT, mime_type STRING, media BINARY) — repo-local
   * deterministic Ogg container fixture (tools.OggFixture: two-page
   * Opus and Vorbis streams plus broken rows). */
  def oggFixturePath: String = {
    val local = new java.io.File("fixtures/ogg.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/ogg.parquet"
  }
  def ogg(spark: SparkSession): DataFrame = spark.read.parquet(oggFixturePath)

  /** avi(media_id BIGINT, mime_type STRING, media BINARY) — repo-local
   * deterministic RIFF/AVI fixture (tools.AviFixture: MJPEG videos
   * whose `00dc` chunks are real JPEG frames, plus header-only and
   * junk rows). */
  def aviFixturePath: String = {
    val local = new java.io.File("fixtures/avi.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/avi.parquet"
  }
  def avi(spark: SparkSession): DataFrame = spark.read.parquet(aviFixturePath)

  /** mp4mjpeg(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic MJPEG-in-MP4 fixture
   * (tools.MjpegMp4Fixture: real ISO-BMFF sample tables over an mdat
   * of complete JPEG frames, plus truncated and junk rows). */
  def mp4MjpegFixturePath: String = {
    val local = new java.io.File("fixtures/mp4mjpeg.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/mp4mjpeg.parquet"
  }
  def mp4Mjpeg(spark: SparkSession): DataFrame = spark.read.parquet(mp4MjpegFixturePath)

  /** mp4avc(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic H.264-in-MP4 fixture (tools.AvcMp4Fixture:
   * `avc1` sample entry + real `stss` sync-sample box over AVCC
   * length-prefixed NAL payloads, plus truncated and junk rows). */
  def mp4AvcFixturePath: String = {
    val local = new java.io.File("fixtures/mp4avc.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/mp4avc.parquet"
  }
  def mp4Avc(spark: SparkSession): DataFrame = spark.read.parquet(mp4AvcFixturePath)

  /** mp4frag(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic FRAGMENTED MP4 fixture
   * (tools.AvcMp4Fixture.fragRow: CMAF/DASH-style moov with empty
   * sample tables + mvex/trex, one moof+mdat fragment per sample,
   * keyframes marked in trun sample flags; plus truncated/junk rows). */
  def mp4FragFixturePath: String = {
    val local = new java.io.File("fixtures/mp4frag.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/mp4frag.parquet"
  }
  def mp4Frag(spark: SparkSession): DataFrame = spark.read.parquet(mp4FragFixturePath)

  /** webm(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic WebM fixture WITH clusters
   * (tools.WebmFixture: EBML init segment + per-frame Cluster/
   * SimpleBlock rows, keyframes flagged in the block headers; plus
   * init-only and junk rows). */
  def webmFixturePath: String = {
    val local = new java.io.File("fixtures/webm.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/webm.parquet"
  }
  def webm(spark: SparkSession): DataFrame = spark.read.parquet(webmFixturePath)

  /** exif(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic EXIF-bearing JPEG fixture
   * (tools.ExifFixture: APP1/TIFF IFD0 with Make/Orientation/DateTime
   * entries; plus EXIF-less JPEG and junk rows). */
  def exifFixturePath: String = {
    val local = new java.io.File("fixtures/exif.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/exif.parquet"
  }
  def exif(spark: SparkSession): DataFrame = spark.read.parquet(exifFixturePath)

  /** mp3(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic MP3 fixture (tools.Mp3Fixture: ID3v2 tag
   * + real MPEG-1 Layer III frame headers at exact 48 kHz frame
   * sizes; plus tag-only and junk rows). */
  def mp3FixturePath: String = {
    val local = new java.io.File("fixtures/mp3.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/mp3.parquet"
  }
  def mp3(spark: SparkSession): DataFrame = spark.read.parquet(mp3FixturePath)

  /** aac(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic AAC/ADTS fixture (tools.AacFixture:
   * ID3v2 tag + real ADTS headers with explicit 13-bit frame lengths;
   * plus tag-only and junk rows). */
  def aacFixturePath: String = {
    val local = new java.io.File("fixtures/aac.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/aac.parquet"
  }
  def aac(spark: SparkSession): DataFrame = spark.read.parquet(aacFixturePath)

  /** ts(media_id BIGINT, mime_type STRING, media BINARY) — repo-local
   * deterministic MPEG-TS fixture (tools.TsFixture: 188-byte packet
   * grids with real PAT/PMT sections, video PES starts with
   * adaptation-field random_access_indicator, audio decoy packets;
   * plus truncated and junk rows). */
  def tsFixturePath: String = {
    val local = new java.io.File("fixtures/ts.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/ts.parquet"
  }
  def ts(spark: SparkSession): DataFrame = spark.read.parquet(tsFixturePath)

  /** flac(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic FLAC fixture (tools.FlacFixture: real
   * STREAMINFO/metadata chain + sync-coded variable-size frames;
   * plus header-only and junk rows). */
  def flacFixturePath: String = {
    val local = new java.io.File("fixtures/flac.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/flac.parquet"
  }
  def flac(spark: SparkSession): DataFrame = spark.read.parquet(flacFixturePath)

  /** captions(media_id BIGINT, kind STRING, content STRING) —
   * repo-local deterministic WebVTT/SRT sidecar-caption fixture
   * (tools.CaptionFixture; shares AvcMp4Fixture's media_id domain so
   * cues align with that fixture's keyframe time axis). */
  def captionsFixturePath: String = {
    val local = new java.io.File("fixtures/captions.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/captions.parquet"
  }
  def captions(spark: SparkSession): DataFrame = spark.read.parquet(captionsFixturePath)

  /** warc(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic WARC fixture (tools.WarcFixture: real
   * ISO 28500 records with exact Content-Length framing; plus
   * truncated and junk rows). */
  def warcFixturePath: String = {
    val local = new java.io.File("fixtures/warc.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/warc.parquet"
  }
  def warc(spark: SparkSession): DataFrame = spark.read.parquet(warcFixturePath)

  /** warcsm(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic sitemap-protocol WARC fixture
   * (tools.SitemapFixture: robots-DECLARED sitemap index files,
   * `<sitemapindex>` recursion, gzipped `.xml.gz` children, a rogue
   * undeclared urlset; plus junk rows). Separate from warc.parquet
   * because the gz bodies are binary and the plain-WARC oracle
   * decodes whole blobs as UTF-8. */
  def warcsmFixturePath: String = {
    val local = new java.io.File("fixtures/warcsm.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/warcsm.parquet"
  }
  def warcsm(spark: SparkSession): DataFrame = spark.read.parquet(warcsmFixturePath)

  /** imagedup(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic near-duplicate image fixture
   * (tools.ImageDupFixture: real 18×16 stored-zlib truecolor PNGs,
   * even/odd ids forming one-cell-perturbed near-dup pairs; plus
   * truncated and junk rows). */
  def imagedupFixturePath: String = {
    val local = new java.io.File("fixtures/imagedup.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/imagedup.parquet"
  }
  def imagedup(spark: SparkSession): DataFrame = spark.read.parquet(imagedupFixturePath)

  /** animwebp(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic ANIMATED-WebP fixture
   * (tools.AnimWebpFixture: real VP8X+ANIM+ANMF containers whose
   * frame payloads are real in-repo VP8/VP8L bitstreams; plus still,
   * truncated and junk rows). */
  def animwebpFixturePath: String = {
    val local = new java.io.File("fixtures/animwebp.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/animwebp.parquet"
  }
  def animwebp(spark: SparkSession): DataFrame = spark.read.parquet(animwebpFixturePath)

  /** pdf(media_id BIGINT, mime_type STRING, media BINARY) — repo-local
   * deterministic classic-xref PDF fixture (tools.PdfFixture: real
   * object bodies, 20-byte xref entries, trailer + startxref,
   * incremental-update /Prev chains; plus bad-startxref and junk
   * rows). */
  def pdfFixturePath: String = {
    val local = new java.io.File("fixtures/pdf.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/pdf.parquet"
  }
  def pdf(spark: SparkSession): DataFrame = spark.read.parquet(pdfFixturePath)

  /** warcgz(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic `.warc.gz` fixture (tools.WarcGzFixture:
   * one real RFC 1952 gzip member per WARC record, FLG variation,
   * fixed 10-byte headers; plus truncated and junk rows). */
  def warcgzFixturePath: String = {
    val local = new java.io.File("fixtures/warcgz.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/warcgz.parquet"
  }
  def warcgz(spark: SparkSession): DataFrame = spark.read.parquet(warcgzFixturePath)

  /** gifanim(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local animated-GIF fixture (tools.GifAnimFixture: real
   * ImageIO frame data reassembled into hand-laid GIF89a animations
   * with contract metadata; truncated + junk rows). */
  def gifanimFixturePath: String = {
    val local = new java.io.File("fixtures/gifanim.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/gifanim.parquet"
  }
  def gifanim(spark: SparkSession): DataFrame = spark.read.parquet(gifanimFixturePath)

  /** gifhash(media_id BIGINT, frame_idx INT, dhash_hex STRING) —
   * q_m42's ground truth: per animation frame the composited-canvas
   * dHash, computed by GifAnimFixture from the RAW pre-encode frame
   * pixels (an independent composite direction — the engine must
   * reproduce it from the GIF bytes through its own LZW decode). */
  def gifhashFixturePath: String = {
    val local = new java.io.File("fixtures/gifhash.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/gifhash.parquet"
  }

  /** videodup(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local video re-mux fixture (tools.VideoDupFixture: per group
   * an MJPEG MP4 and an AVI carrying the SAME frame bytes; junk
   * groups). */
  def videodupFixturePath: String = {
    val local = new java.io.File("fixtures/videodup.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/videodup.parquet"
  }
  def videodup(spark: SparkSession): DataFrame = spark.read.parquet(videodupFixturePath)

  /** audiodup(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local audio near-duplicate fixture (tools.AudioDupFixture:
   * per group a 16-bit WAV and a FLAC re-encode of the level-changed
   * lightly-perturbed signal; junk groups). */
  def audiodupFixturePath: String = {
    val local = new java.io.File("fixtures/audiodup.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/audiodup.parquet"
  }
  def audiodup(spark: SparkSession): DataFrame = spark.read.parquet(audiodupFixturePath)

  /** mp3dup(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic MP3 re-encode pair fixture
   * (tools.Mp3DupFixture: per group a level-coded multi-tone as WAV
   * and as an in-repo MPEG-1 Layer III encode of the same PCM;
   * junk rows). */
  def mp3dupFixturePath: String = {
    val local = new java.io.File("fixtures/mp3dup.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/mp3dup.parquet"
  }
  def mp3dup(spark: SparkSession): DataFrame = spark.read.parquet(mp3dupFixturePath)

  /** vorbisdup(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local deterministic Ogg Vorbis re-encode pair fixture
   * (tools.VorbisDupFixture: per group the codec-dedup multi-tone as
   * WAV and as an in-repo Vorbis encode of the same PCM; junk
   * rows). */
  def vorbisdupFixturePath: String = {
    val local = new java.io.File("fixtures/vorbisdup.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/vorbisdup.parquet"
  }
  def vorbisdup(spark: SparkSession): DataFrame = spark.read.parquet(vorbisdupFixturePath)

  /** flacpcm(media_id BIGINT, mime_type STRING, media BINARY) —
   * repo-local REAL-FLAC fixture (tools.FlacPcmFixture: fully
   * decodable RFC 9639 streams over id-contract PCM, every subframe
   * type and stereo decorrelation mode; junk rows). Distinct from
   * `flac.parquet`, the sync-scan LOCATOR fixture. */
  def flacpcmFixturePath: String = {
    val local = new java.io.File("fixtures/flacpcm.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/flacpcm.parquet"
  }
  def flacpcm(spark: SparkSession): DataFrame = spark.read.parquet(flacpcmFixturePath)

  /** zst(media_id BIGINT, mime_type STRING, media BINARY) — repo-local
   * deterministic zstd-transport fixture (tools.ZstFixture: `.jsonl`
   * shards in zstd/multi-frame-zstd/gzip/plain codecs, IIPC
   * `.warc.zst` shards with raw/compressed dictionary and checksum
   * classes, `.tar.zst` WebDataset shards; plus truncated and junk
   * rows). Kind alternates by media_id % 3. */
  def zstFixturePath: String = {
    val local = new java.io.File("fixtures/zst.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/zst.parquet"
  }
  def zst(spark: SparkSession): DataFrame = spark.read.parquet(zstFixturePath)

  /** tar(media_id BIGINT, mime_type STRING, media BINARY) — repo-local
   * deterministic WebDataset-layout ustar fixture (tools.TarFixture:
   * real 512-byte headers with computed checksums; plus truncated and
   * junk rows). */
  def tarFixturePath: String = {
    val local = new java.io.File("fixtures/tar.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/tar.parquet"
  }
  def tar(spark: SparkSession): DataFrame = spark.read.parquet(tarFixturePath)

  /** zip(media_id BIGINT, mime_type STRING, media BINARY) — repo-local
   * deterministic ZIP fixture (tools.ZipFixture: STORED members with
   * real CRC-32s, local-only extra fields, archive comments; plus
   * over-counted and junk rows). */
  def zipFixturePath: String = {
    val local = new java.io.File("fixtures/zip.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/zip.parquet"
  }
  def zip(spark: SparkSession): DataFrame = spark.read.parquet(zipFixturePath)

  /** pii(rec_id BIGINT, text STRING) — repo-local deterministic
   * PII-bearing text fixture (tools.PiiFixture; the driver corpus is
   * digit-free word salad, so identifier scanning needs its own rows). */
  def piiFixturePath: String = {
    val local = new java.io.File("fixtures/pii.parquet")
    if (local.exists) local.getAbsolutePath else "/root/repo/fixtures/pii.parquet"
  }
  def pii(spark: SparkSession): DataFrame = spark.read.parquet(piiFixturePath)
}
