package graft.ops

import graft.SparkSpec

/** Round-14 audio codecs: the MediaSynth MP3/FLAC writers against the
  * [[AudioCodecs]] header walks — every closed-form the q103 oracle
  * restates is asserted here directly on the bytes, plus the
  * dead-letter contract on garbage. */
class Round14OpsSpec extends SparkSpec {

  test("mp3 writer/parser: closed-form fields round-trip for 60 ids") {
    (0L until 120L by 2).foreach { id =>
      val brIdx = 1 + (id % 14).toInt
      val srIdx = (id % 3).toInt
      val nf = 1 + (id % 5).toInt
      val tag = (id % 17).toInt
      val mono = (id / 2) % 2 == 0
      val b = MediaSynth.mp3(id, brIdx, srIdx, nf, tag, mono)
      val kbps = AudioCodecs.Mp3Bitrates(brIdx)
      val sr = AudioCodecs.Mp3SampleRates(srIdx)
      val flen = 144 * kbps * 1000 / sr
      assert(b.length == 10 + tag + nf * flen, s"id=$id byte formula")
      val m = AudioCodecs.decodeMp3(b).getOrElse(fail(s"id=$id undecodable"))
      assert(m.frames == nf && m.sampleRate == sr && m.bitrateKbps == kbps, s"id=$id")
      assert(m.channels == (if (mono) 1 else 2), s"id=$id channels")
      assert(m.durationMs == nf.toLong * 1152 * 1000 / sr, s"id=$id duration")
    }
  }

  test("mp3 parser: ID3-less stream, truncated tail, garbage") {
    // sync at byte 0, no tag
    val bare = MediaSynth.mp3(7L, 5, 1, 3, 0, mono = true)
    assert(AudioCodecs.decodeMp3(bare).exists(_.frames == 3))
    // a truncated final frame stops the walk cleanly at 2 complete frames
    assert(AudioCodecs.decodeMp3(bare.dropRight(5)).exists(_.frames == 2))
    assert(AudioCodecs.decodeMp3("not audio at all".getBytes).isEmpty)
    assert(AudioCodecs.decodeMp3(Array[Byte]()).isEmpty)
    assert(AudioCodecs.decodeMp3(null).isEmpty)
  }

  test("flac writer/parser: closed-form fields round-trip for 60 ids") {
    (1L until 120L by 2).foreach { id =>
      val sr = 8000 + 100 * (id % 40).toInt
      val ch = 1 + ((id / 2) % 2).toInt
      val total = 1000 + id % 5000
      val pad = (id % 10).toInt
      val audio = 20 + (id % 64).toInt
      val b = MediaSynth.flac(id, sr, ch, 16, total, pad, audio)
      assert(b.length == 46 + pad + audio, s"id=$id byte formula")
      val f = AudioCodecs.decodeFlac(b).getOrElse(fail(s"id=$id undecodable"))
      assert(f.sampleRate == sr && f.channels == ch && f.bitsPerSample == 16)
      assert(f.totalSamples == total, s"id=$id samples")
      assert(f.durationMs == total * 1000L / sr, s"id=$id duration")
    }
  }

  test("flac parser: truncated block and garbage dead-letter") {
    val good = MediaSynth.flac(3L, 44100, 2, 16, 4000L, 4, 30)
    assert(AudioCodecs.decodeFlac(good.take(20)).isEmpty, "truncated STREAMINFO")
    assert(AudioCodecs.decodeFlac("fLaX-not-flac-at-all".getBytes).isEmpty)
    assert(AudioCodecs.decodeFlac(null).isEmpty)
  }

  test("decodeAudioInfo dispatches WAV + MP3 + FLAC in one pass; junk dead-letters") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val empty = Multimodal.MediaMeta(0, 0, 0L, 0, "?")
    val assets = Seq(
      Multimodal.MediaAsset(1L, "audio", MediaSynth.wavPcm16(8000, 500, 7), empty),
      MediaSynth.audioAssetFor(2L), // mp3
      MediaSynth.audioAssetFor(3L), // flac
      Multimodal.MediaAsset(4L, "audio", "garbage-bytes".getBytes, empty)
    ).toDS()
    val got = Multimodal.decodeAudioInfo(assets).collect()
      .map(i => i.asset_id -> i.fmt).toMap
    assert(got == Map(1L -> "wav", 2L -> "mp3", 3L -> "flac"),
      s"dispatch got $got")
    // the meta-fill path dispatches identically
    val meta = Multimodal.decodeAudio(assets).collect()
      .map(a => a.asset_id -> a.meta.format).toMap
    assert(meta == Map(1L -> "wav", 2L -> "mp3", 3L -> "flac"))
  }
}
