package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 OGG support ([[AudioCodecs.decodeOgg]] over
  * [[MediaSynth.oggVorbis]]/[[MediaSynth.oggOpus]]): the RFC 3533 page
  * walk + first-packet codec dispatch recover every identification-
  * header field, the last-page granule yields duration (48 kHz clock −
  * pre-skip for Opus), garbage/truncation dead-letters, and the q105
  * pipeline equals the closed-form arithmetic oracle. */
class Round15OpsSpec extends SparkSpec {

  test("ogg/vorbis: id header fields + last-page granule recovered; real page CRCs") {
    val b = MediaSynth.oggVorbis(6L, sr = 44100, channels = 2,
      totalSamples = 123456L, payloadLen = 40)
    val i = AudioCodecs.decodeOgg(b).get
    assert(i.codec == "vorbis" && i.channels == 2 && i.sampleRate == 44100)
    assert(i.totalGranules == 123456L)
    assert(i.durationMs == 123456L * 1000 / 44100)
    assert(b.length == 86 + 40, s"writer arithmetic: ${b.length}")
    // the page CRC must be REAL (q100 PNG discipline): flipping one
    // payload byte and recomputing over the stored pages must disagree
    // with the stored checksum — verify by recomputing page 1's CRC
    val page1 = java.util.Arrays.copyOfRange(b, 0, 58)
    val stored = java.nio.ByteBuffer.wrap(page1, 22, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    java.util.Arrays.fill(page1, 22, 26, 0.toByte)
    var crc = 0
    val table = Array.tabulate(256) { n =>
      var r = n << 24; var j = 0
      while (j < 8) { r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1; j += 1 }
      r
    }
    page1.foreach(x => crc = (crc << 8) ^ table(((crc >>> 24) ^ (x & 0xff)) & 0xff))
    assert(stored == crc, "page CRC must be the real RFC 3533 checksum")
  }

  test("ogg/opus: OpusHead fields, 48 kHz duration clock, pre-skip subtraction") {
    val b = MediaSynth.oggOpus(7L, channels = 1, preSkip = 312,
      inputSr = 16000, granule = 312L + 48L * 2500L, payloadLen = 30)
    val i = AudioCodecs.decodeOgg(b).get
    assert(i.codec == "opus" && i.channels == 1 && i.sampleRate == 16000)
    assert(i.preSkip == 312)
    assert(i.totalGranules == 312L + 48L * 2500L)
    assert(i.durationMs == 2500L, s"duration ${i.durationMs}")
    assert(b.length == 123 + 30, s"writer arithmetic: ${b.length}")
  }

  test("ogg garbage and truncation dead-letter") {
    val good = MediaSynth.oggVorbis(9L, 8000, 1, 5000L, 25)
    assert(AudioCodecs.decodeOgg(good.take(40)).isEmpty, "truncated id header")
    assert(AudioCodecs.decodeOgg("OggX-not-ogg".getBytes).isEmpty)
    assert(AudioCodecs.decodeOgg(null).isEmpty)
    // an OGG page carrying an unknown codec's first packet dead-letters
    val junkFirstPacket = good.clone()
    junkFirstPacket(28) = 'x'.toByte // corrupt the 0x01"vorbis" type byte
    assert(AudioCodecs.decodeOgg(junkFirstPacket).isEmpty)
    // a truncated TAIL still decodes from the complete prefix pages,
    // with the granule of the last complete page
    val headOnly = good.take(58)
    val i = AudioCodecs.decodeOgg(headOnly).get
    assert(i.codec == "vorbis" && i.totalGranules == 0L)
  }

  test("ogg fragmented id header (round 17): packet spliced across the page boundary reassembles") {
    // RFC 3533 §5-6: page 1's single lacing value is 255, the id
    // packet continues on page 2 (continued-packet flag 0x01) — legal,
    // never emitted by mainstream encoders, present in crawl audio
    val b = MediaSynth.oggVorbisSplitHeader(11L, sr = 22050, channels = 2,
      totalSamples = 44100L, payloadLen = 32)
    val i = AudioCodecs.decodeOgg(b).get
    assert(i.codec == "vorbis" && i.channels == 2 && i.sampleRate == 22050)
    assert(i.totalGranules == 44100L && i.durationMs == 2000L)
    // torn continuations dead-letter, in both flag directions:
    // (a) the stream ends mid-packet (continuation page missing)
    val page1Len = 27 + 1 + 255
    assert(AudioCodecs.decodeOgg(b.take(page1Len)).isEmpty,
      "headerless tail must dead-letter")
    // (b) the continuation page is NOT flagged continued — a torn
    // stream masquerading as a fresh packet boundary
    val unflagged = b.clone()
    unflagged(page1Len + 5) = 0.toByte
    assert(AudioCodecs.decodeOgg(unflagged).isEmpty,
      "unflagged continuation must dead-letter")
    // (c) a FLAGGED first page is equally torn
    val flaggedFirst = MediaSynth.oggVorbis(5L, 8000, 1, 100L, 10).clone()
    flaggedFirst(5) = (flaggedFirst(5) | 1).toByte
    assert(AudioCodecs.decodeOgg(flaggedFirst).isEmpty,
      "continued-flagged first page must dead-letter")
    // (d) a crafted endless all-255 chain hits the 64 KiB cap and
    // dead-letters instead of buffering without bound: build 300
    // pages of lacing [255] (never terminating)
    val chain = new java.io.ByteArrayOutputStream()
    (0 until 300).foreach { s =>
      val hdr = new Array[Byte](27 + 1 + 255)
      "OggS".getBytes.copyToArray(hdr, 0)
      hdr(4) = 0; hdr(5) = if (s == 0) 2 else 1
      hdr(26) = 1; hdr(27) = 255.toByte
      chain.write(hdr)
    }
    assert(AudioCodecs.decodeOgg(chain.toByteArray).isEmpty,
      "unbounded 255-chain must dead-letter at the cap")
    // and the single-page fast path is untouched
    val whole = MediaSynth.oggVorbis(6L, 44100, 2, 123456L, 40)
    assert(AudioCodecs.decodeOgg(whole).get.totalGranules == 123456L)
  }

  test("q105 pipeline: OGG decode over synthesized assets equals the arithmetic oracle") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q105docs").toString
    (0L until 120L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.OpsQueries.q105MultimodalOgg(spark, dir)
      .collect().map { r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("fmt"), r.getAs[Long]("channels"),
            r.getAs[Long]("sample_rate"), r.getAs[Long]("n_units"),
            r.getAs[Long]("duration_ms"), r.getAs[Long]("n_bytes")))
      }.toMap
    assert(got.size == 120, s"got ${got.size} rows")
    (0L until 120L).foreach { id =>
      val exp =
        if (id % 2 == 0) {
          val sr = 8000 + 100 * (id % 40)
          val n = 2000 + id % 3000
          ("vorbis", 1 + (id / 2) % 2, sr, n, n * 1000 / sr, 106 + id % 50)
        } else {
          val durMs = 10 + id % 200
          val granule = 312 + id % 100 + 48 * durMs
          ("opus", 1 + (id / 2) % 2,
            Array(8000L, 12000L, 16000L, 24000L, 48000L)((id % 5).toInt),
            granule, durMs, 139 + id % 40)
        }
      assert(got(id) == exp, s"id=$id got ${got(id)} expected $exp")
    }
  }
}
