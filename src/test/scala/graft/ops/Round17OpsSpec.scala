package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-17 AIFF support ([[AudioCodecs.decodeAiff]] over
  * [[MediaSynth.aiff]]): the big-endian EA IFF 85 chunk walk recovers
  * every COMM field including the 80-bit extended-float sample rate,
  * AIFF-C parses with its compressionType, padded odd chunks hop
  * correctly, garbage/truncation dead-letters, and the q114 pipeline
  * equals the closed-form arithmetic oracle. */
class Round17OpsSpec extends SparkSpec {

  test("aiff: COMM fields + 80-bit extended rate recovered; closed-form size") {
    for (sr <- Seq(8000, 11025, 16000, 22050, 44100, 48000, 96000)) {
      val b = MediaSynth.aiff(7L, sr, channels = 2, frames = 4321)
      val i = AudioCodecs.decodeAiff(b).get
      assert(i.sampleRate == sr, s"rate $sr decoded as ${i.sampleRate}")
      assert(i.channels == 2 && i.bitsPerSample == 16)
      assert(i.sampleFrames == 4321L)
      assert(i.durationMs == 4321L * 1000 / sr)
      assert(i.compression == "NONE")
      assert(b.length == 54 + 4321 * 2 * 2, s"writer arithmetic: ${b.length}")
    }
  }

  test("aiff-c form, odd-chunk padding, truncation and garbage dead-letter") {
    // hand-build an AIFC: FORM/AIFC + a 3-byte ANNO chunk (odd — the
    // walk must hop its pad byte) + a 22-byte COMM with fourcc 'NONE'
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val ext = AudioCodecs.decodeAiff(
      MediaSynth.aiff(1L, 22050, 1, 10)).get // sanity anchor
    assert(ext.sampleRate == 22050)
    val rate80 = MediaSynth.aiff(1L, 22050, 1, 0).slice(
      12 + 8 + 8, 12 + 8 + 18) // the COMM's 80-bit rate bytes
    val anno = "ANNO".getBytes ++ be32(3) ++ Array[Byte](1, 2, 3, 0) // +pad
    val comm = "COMM".getBytes ++ be32(22) ++ be16(1) ++ be32(777) ++
      be16(16) ++ rate80 ++ "NONE".getBytes
    val body = "AIFC".getBytes ++ anno ++ comm
    val aifc = "FORM".getBytes ++ be32(body.length) ++ body
    val i = AudioCodecs.decodeAiff(aifc).get
    assert(i.channels == 1 && i.sampleFrames == 777L &&
      i.sampleRate == 22050 && i.compression == "NONE")
    // dead letters
    assert(AudioCodecs.decodeAiff(null).isEmpty)
    assert(AudioCodecs.decodeAiff("FORMxxxxWAVE".getBytes).isEmpty)
    val good = MediaSynth.aiff(3L, 16000, 1, 100)
    assert(AudioCodecs.decodeAiff(good.take(20)).isEmpty,
      "truncated before COMM")
    assert(AudioCodecs.decodeAiff(good.take(30)).isEmpty,
      "truncated inside COMM")
    // a COMM-less file walks to the end and dead-letters
    val ssndOnly = "FORM".getBytes ++ be32(12) ++ "AIFF".getBytes ++
      "SSND".getBytes ++ be32(0)
    assert(AudioCodecs.decodeAiff(ssndOnly).isEmpty)
  }

  test("globalRank = single-partition window row_number, at full parallelism") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("score", pmod(col("id") * 37 % 101, lit(101)).cast("double"))
      .repartition(16) // arbitrary input partitioning must not matter
    val order = Seq(col("score").desc, col("id").asc)
    val want = df.withColumn("rank",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Corpus.globalRank(df, order, "rank")
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // and the PLAN never funnels through a single partition (the
    // point) — at this toy size AQE may still coalesce post-shuffle,
    // so assert the plan shape, not the runtime partition count: the
    // sort is a RANGE exchange and the window partitions by _pid,
    // where a bare Window.orderBy plans Exchange SinglePartition
    val plan = Corpus.globalRank(df, order, "rank")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      "globalRank must not plan a single-partition exchange")
    assert(plan.contains("rangepartitioning"),
      "globalRank's sort must be a distributed range partitioning")
  }

  test("rankedHead = globalRank + filter(rank <= k), as a TakeOrdered plan") {
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("score", pmod(col("id") * 37 % 101, lit(101)).cast("double"))
      .repartition(16)
    val order = Seq(col("score").desc, col("id").asc)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = rows(Corpus.globalRank(df, order, "rank")
      .filter(col("rank") <= 20))
    val got = rows(Corpus.rankedHead(df, order, 20, "rank"))
    assert(got == want && got.size == 20)
    // the bounded head must never range-sort/cache the whole relation:
    // the plan is a TakeOrdered (per-task k-heap + driver merge)
    val plan = Corpus.rankedHead(df, order, 20, "rank")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "rankedHead must plan TakeOrderedAndProject, not a global sort")
    // k larger than the relation degrades to the full exact ranking
    val all = rows(Corpus.rankedHead(df, order, 10000, "rank"))
    assert(all == rows(Corpus.globalRank(df, order, "rank")))
  }

  test("q114 pipeline: AIFF decode over synthesized assets equals the arithmetic oracle") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    val assets = spark.range(0, 60).select(col("id")).as[Long]
      .map(MediaSynth.aiffAssetFor)
    val got = Multimodal.decodeAudioInfo(assets).collect()
    assert(got.length == 60, "every synthesized AIFF must decode")
    got.foreach { a =>
      val id = a.asset_id
      val sr = Array(8000, 11025, 16000, 22050, 44100)((id % 5).toInt)
      val frames = 1000 + id % 9000
      assert(a.fmt == "aiff" && a.channels == 1 + (id % 2).toInt)
      assert(a.sample_rate == sr && a.n_units == frames)
      assert(a.duration_ms == frames * 1000 / sr)
      assert(a.n_bytes == 54 + frames * (1 + id % 2) * 2)
    }
  }
}
