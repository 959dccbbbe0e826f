package graft.ops

import graft.SparkSpec

/** Round-16 M4A/AAC support ([[RiffCodecs.decodeM4a]] over
  * [[MediaSynth.m4a]]): the ISO-BMFF walk's `soun`-hdlr dispatch, the
  * `mp4a` AudioSampleEntry (channelcount / samplesize / 16.16 sample
  * rate), the `esds` expandable-length descriptor chain
  * (objectTypeIndication 0x40, AAC-LC AudioSpecificConfig), and the
  * mdhd sample clock; video MP4 and garbage dead-letter; the q106
  * pipeline equals the closed-form arithmetic oracle. */
class Round16OpsSpec extends SparkSpec {

  test("m4a: sample entry + esds + mdhd fields recovered exactly") {
    val b = MediaSynth.m4a(9L, sr = 44100, channels = 2,
      totalSamples = 88200L, movieDurMs = 2000L, padLen = 17)
    val i = RiffCodecs.decodeM4a(b).get
    assert(i.channels == 2 && i.sampleRate == 44100)
    assert(i.bitsPerSample == 16)
    assert(i.objectTypeIndication == 0x40, "esds OTI must be MPEG-4 Audio")
    assert(i.aacObjectType == 2, "ASC audioObjectType must be AAC-LC")
    assert(i.totalSamples == 88200L)
    assert(i.durationMs == 2000L)
    assert(b.length == 332 + 17, s"writer arithmetic: ${b.length}")
  }

  test("m4a: every synth rate round-trips through the AAC table index") {
    Seq(48000, 44100, 32000, 16000, 8000).foreach { sr =>
      val b = MediaSynth.m4a(1L, sr, channels = 1,
        totalSamples = sr.toLong, movieDurMs = 1000L, padLen = 0)
      val i = RiffCodecs.decodeM4a(b).get
      assert(i.sampleRate == sr && i.durationMs == 1000L, s"sr=$sr")
    }
  }

  test("m4a: video MP4, garbage, and truncation dead-letter") {
    // a real VIDEO mp4 (the q99 synth) has no soun trak → None
    assert(RiffCodecs.decodeM4a(MediaSynth.mp4(4L, nf = 3, frameLen = 50)).isEmpty)
    assert(RiffCodecs.decodeM4a(Array.fill(64)(0x41.toByte)).isEmpty)
    assert(RiffCodecs.decodeM4a(Array.emptyByteArray).isEmpty)
    assert(RiffCodecs.decodeM4a(null).isEmpty)
    // truncation mid-moov: the walk stops cleanly (lying box size)
    val whole = MediaSynth.m4a(3L, 32000, 1, 32000L, 1000L, 0)
    assert(RiffCodecs.decodeM4a(
      java.util.Arrays.copyOfRange(whole, 0, 60)).isEmpty)
  }

  test("adts: header fields, frame walk, and both header forms recovered exactly") {
    val b = AudioCodecs.decodeAdts(
      MediaSynth.adts(5L, sr = 44100, channels = 2, frames = 40,
        payloadLen = 13)).get
    assert(b.channels == 2 && b.sampleRate == 44100)
    assert(b.aacObjectType == 2, "profile field must decode to AAC-LC")
    assert(b.frames == 40 && b.totalSamples == 40L * 1024)
    assert(b.durationMs == 40L * 1024 * 1000 / 44100)
    // the CRC-protected form: 9-byte headers, same fields recovered
    val crc = MediaSynth.adts(5L, 44100, 2, 40, 13, withCrc = true)
    assert(crc.length == 40 * (9 + 13), s"writer arithmetic: ${crc.length}")
    val c = AudioCodecs.decodeAdts(crc).get
    assert(c.frames == 40 && c.totalSamples == 40L * 1024 &&
      c.sampleRate == 44100)
    // channel_configuration 7 is the 7.1 layout = EIGHT channels
    // (ISO/IEC 14496-3 table 1.19), and the stream-consistency check
    // must compare raw configs, not mapped counts (a 7.1 stream walks
    // all its frames)
    val c71 = AudioCodecs.decodeAdts(
      MediaSynth.adts(5L, 48000, channels = 7, frames = 6, payloadLen = 9)).get
    assert(c71.channels == 8 && c71.frames == 6, s"got $c71")
  }

  test("adts: dispatch disambiguates the shared 0xFFF sync from MP3 on layer bits") {
    import spark.implicits._
    implicit val s = spark
    // one ADTS asset, one MP3 asset (the q103 synth family) — the
    // audio dispatcher must route each to its own walker
    val adts = MediaSynth.adtsAssetFor(7L)
    val mp3 = MediaSynth.audioAssetFor(2L) // even ids are MP3 in q103
    val got = Multimodal.decodeAudioInfo(
      Seq(adts, mp3).toDS()).collect().map(i => i.asset_id -> i.fmt).toMap
    assert(got(7L) == "aac", s"ADTS asset decoded as ${got(7L)}")
    assert(got(2L) == "mp3", s"MP3 asset decoded as ${got(2L)}")
    // and the raw walkers reject each other's bytes
    assert(AudioCodecs.decodeAdts(mp3.bytes).isEmpty)
    assert(AudioCodecs.decodeMp3(adts.bytes).isEmpty)
  }

  test("adts: garbage, truncation, and mid-stream parameter switches dead-letter or stop cleanly") {
    assert(AudioCodecs.decodeAdts(Array.fill(64)(0x41.toByte)).isEmpty)
    assert(AudioCodecs.decodeAdts(Array.emptyByteArray).isEmpty)
    assert(AudioCodecs.decodeAdts(null).isEmpty)
    val whole = MediaSynth.adts(3L, 32000, 1, 10, 11)
    // truncation mid-frame: the walk keeps the complete prefix
    val cut = java.util.Arrays.copyOfRange(whole, 0, 5 * (7 + 11) + 4)
    assert(AudioCodecs.decodeAdts(cut).get.frames == 5)
    // a parameter switch mid-stream stops at the last consistent frame
    val switched = whole ++ MediaSynth.adts(3L, 48000, 1, 4, 11)
    assert(AudioCodecs.decodeAdts(switched).get.frames == 10)
  }

  test("q107 pipeline: ADTS decode over synthesized assets equals the arithmetic oracle") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q107docs").toString
    (0L until 120L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.OpsQueries.q107MultimodalAdts(spark, dir)
      .collect().map { r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("fmt"), r.getAs[Long]("channels"),
            r.getAs[Long]("sample_rate"), r.getAs[Long]("n_units"),
            r.getAs[Long]("duration_ms"), r.getAs[Long]("n_bytes")))
      }.toMap
    assert(got.size == 120, s"got ${got.size} rows")
    (0L until 120L).foreach { id =>
      val sr = Array(48000L, 44100L, 32000L, 16000L, 8000L)((id % 5).toInt)
      val frames = 20 + id % 80
      val header = if (id % 3 == 0) 9 else 7
      val exp = ("aac", 1 + (id / 2) % 2, sr, frames * 1024,
        frames * 1024 * 1000 / sr, frames * (header + 5 + id % 20))
      assert(got(id) == exp, s"id=$id got ${got(id)} expected $exp")
    }
  }

  test("tiff: IFD walk recovers dims in BOTH byte orders; garbage and truncation dead-letter") {
    // little-endian and big-endian headers carry identical fields
    val ii = ImageCodecs.decodeTiff(MediaSynth.tiff(4L, 33, 21, 7, bigEndian = false)).get
    val mm = ImageCodecs.decodeTiff(MediaSynth.tiff(4L, 33, 21, 7, bigEndian = true)).get
    assert(ii == ImageCodecs.Dims(33, 21, "tiff"))
    assert(mm == ImageCodecs.Dims(33, 21, "tiff"))
    // LONG-typed (type 4) dimension entries, both byte orders — the
    // full 4-byte inline value, the common real-world encoding
    Seq(false, true).foreach { be =>
      val d = ImageCodecs.decodeTiff(
        MediaSynth.tiff(4L, 70000, 21, 0, bigEndian = be, longDims = true)).get
      assert(d == ImageCodecs.Dims(70000, 21, "tiff"), s"LONG dims, be=$be: $d")
    }
    // writer arithmetic: 8 + 2 + 5*12 + 4 + pad
    assert(MediaSynth.tiff(4L, 33, 21, 7, bigEndian = true).length == 74 + 7)
    // garbage, empty, null, wrong magic, truncated IFD all dead-letter
    assert(ImageCodecs.decodeTiff(Array.fill(64)(0x41.toByte)).isEmpty)
    assert(ImageCodecs.decodeTiff(Array.emptyByteArray).isEmpty)
    assert(ImageCodecs.decodeTiff(null).isEmpty)
    val whole = MediaSynth.tiff(4L, 33, 21, 0, bigEndian = false)
    assert(ImageCodecs.decodeTiff(
      java.util.Arrays.copyOfRange(whole, 0, 20)).isEmpty,
      "IFD truncated mid-entry-table must not decode")
    // an IFD carrying no dimension tags dead-letters (count-only walk)
    val noDims = whole.clone()
    // overwrite tag 256 -> 320, tag 257 -> 321 (little-endian u16 at
    // entry offsets 10 and 22)
    noDims(10) = (320 & 0xff).toByte; noDims(11) = (320 >> 8).toByte
    noDims(22) = (321 & 0xff).toByte; noDims(23) = (321 >> 8).toByte
    assert(ImageCodecs.decodeTiff(noDims).isEmpty)
    // a crafted IFD offset near Int.MaxValue must dead-letter, not
    // wrap the bounds check and crash the task (overflow regression)
    val crafted = whole.clone()
    crafted(4) = 0xfe.toByte; crafted(5) = 0xff.toByte
    crafted(6) = 0xff.toByte; crafted(7) = 0x7f.toByte
    assert(ImageCodecs.decodeTiff(crafted).isEmpty)
  }

  test("q110 pipeline: TIFF decode over synthesized assets equals the arithmetic oracle") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q110docs").toString
    (0L until 120L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.OpsQueries.q110MultimodalTiff(spark, dir)
      .collect().map { r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("fmt"), r.getAs[Int]("width"),
            r.getAs[Int]("height"), r.getAs[Long]("n_bytes")))
      }.toMap
    assert(got.size == 120, s"got ${got.size} rows")
    (0L until 120L).foreach { id =>
      val exp = ("tiff", (1 + id % 60).toInt, (1 + id % 45).toInt, 74 + id % 24)
      assert(got(id) == exp, s"id=$id got ${got(id)} expected $exp")
    }
  }

  test("avif/heic: the meta-fullbox spine walk recovers ispe dims; video MP4 and garbage dead-letter") {
    val a = ImageCodecs.decodeAvif(MediaSynth.avif(3L, "avif", 320, 240, 11)).get
    assert(a == ImageCodecs.Dims(320, 240, "avif"))
    val h = ImageCodecs.decodeAvif(MediaSynth.avif(3L, "heic", 64, 48, 0)).get
    assert(h == ImageCodecs.Dims(64, 48, "heic"))
    // writer arithmetic: ftyp 24 + meta 81 + mdat 8 + pad
    assert(MediaSynth.avif(3L, "avif", 320, 240, 11).length == 113 + 11)
    // a VIDEO mp4 shares the ftyp magic but not an image brand → None
    assert(ImageCodecs.decodeAvif(MediaSynth.mp4(4L, nf = 3, frameLen = 50)).isEmpty)
    assert(ImageCodecs.decodeAvif(Array.fill(64)(0x41.toByte)).isEmpty)
    assert(ImageCodecs.decodeAvif(Array.emptyByteArray).isEmpty)
    assert(ImageCodecs.decodeAvif(null).isEmpty)
    // truncation inside meta: the spine walk stops cleanly
    val whole = MediaSynth.avif(3L, "avif", 320, 240, 0)
    assert(ImageCodecs.decodeAvif(
      java.util.Arrays.copyOfRange(whole, 0, 40)).isEmpty)
    // the generic mif1 brand maps to the heif family
    assert(ImageCodecs.decodeAvif(
      MediaSynth.avif(3L, "mif1", 10, 12, 0)).get ==
      ImageCodecs.Dims(10, 12, "heif"))
    // a size==1 largesize box BEFORE meta (streaming-muxer layout) is
    // skipped via its 64-bit length, not treated as fatal: splice a
    // largesize mdat between ftyp (24 bytes) and the meta box
    val pad = 5
    val ftypEnd = 24
    val mdat = Array.concat(
      Array(0, 0, 0, 1).map(_.toByte), "mdat".getBytes("US-ASCII"),
      Array(0, 0, 0, 0, 0, 0, 0, (16 + pad)).map(_.toByte),
      Array.fill(pad)(0x55.toByte))
    val spliced = whole.take(ftypEnd) ++ mdat ++ whole.drop(ftypEnd)
    assert(ImageCodecs.decodeAvif(spliced).get ==
      ImageCodecs.Dims(320, 240, "avif"),
      "largesize box before meta must be skipped, not fatal")
  }

  test("q111 pipeline: AVIF/HEIC decode over synthesized assets equals the arithmetic oracle") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q111docs").toString
    (0L until 120L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.OpsQueries.q111MultimodalAvif(spark, dir)
      .collect().map { r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("fmt"), r.getAs[Int]("width"),
            r.getAs[Int]("height"), r.getAs[Long]("n_bytes")))
      }.toMap
    assert(got.size == 120, s"got ${got.size} rows")
    (0L until 120L).foreach { id =>
      val exp = (if (id % 2 == 0) "avif" else "heic",
        (1 + id % 64).toInt, (1 + id % 48).toInt, 113 + id % 20)
      assert(got(id) == exp, s"id=$id got ${got(id)} expected $exp")
    }
  }

  test("q106 pipeline: M4A decode over synthesized assets equals the arithmetic oracle") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q106docs").toString
    (0L until 120L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.OpsQueries.q106MultimodalM4a(spark, dir)
      .collect().map { r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("fmt"), r.getAs[Long]("channels"),
            r.getAs[Long]("sample_rate"), r.getAs[Long]("n_units"),
            r.getAs[Long]("duration_ms"), r.getAs[Long]("n_bytes")))
      }.toMap
    assert(got.size == 120, s"got ${got.size} rows")
    (0L until 120L).foreach { id =>
      val sr = Array(48000L, 44100L, 32000L, 16000L, 8000L)((id % 5).toInt)
      val n = 4000 + id % 9000
      val exp = ("m4a", 1 + (id / 2) % 2, sr, n, n * 1000 / sr, 332 + id % 32)
      assert(got(id) == exp, s"id=$id got ${got(id)} expected $exp")
    }
  }
}
