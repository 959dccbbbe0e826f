package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 gates: MediaSynth writer ↔ real codec walker round-trip
  * (the q98 surface), and the delta label store's merge-relabel
  * completeness on adversarial shapes the DedupStreamSpec ticks don't
  * produce. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private def expected(id: Long): (String, String, Int, Int, Long, Int, Long, Long, Long) =
    (id % 3).toInt match {
      case 0 =>
        val (w, h) = (1 + (id % 31).toInt, 1 + (id % 17).toInt)
        ("image", "bmp", w, h, 0L, 0, 0L, 0L, 54L + w * h)
      case 1 =>
        val n = 8 + (id % 33).toInt
        val mag = 50 + (id % 50).toInt
        ("audio", "wav", 0, 0, n.toLong * 1000 / 8000, 8000,
          (n + 3L) / 4, n.toLong * mag, 44L + 2 * n)
      case _ =>
        val nf = 1 + (id % 5).toInt
        val len = 64 + 2 * (id % 32).toInt
        ("video", "avi", 16 + (id % 9).toInt, 9 + (id % 7).toInt,
          40L * nf, 0, nf.toLong, nf.toLong * len, 100L + nf * (8 + len))
    }

  test("MediaSynth ↔ codec round-trip: every decoded column equals the synthesis arithmetic") {
    (0L until 200L).foreach { id =>
      val a = MediaSynth.assetFor(id)
      val (kind, fmt, w, h, durMs, rate, units, payload, nBytes) = expected(id)
      assert(a.kind == kind && a.bytes.length.toLong == nBytes,
        s"id=$id kind/${a.kind} n_bytes=${a.bytes.length} expected $kind/$nBytes")
      kind match {
        case "image" =>
          val d = ImageCodecs.decodeHeader(a.bytes).get
          assert((d.width, d.height, d.format) == ((w, h, fmt)), s"id=$id $d")
        case "audio" =>
          val wav = RiffCodecs.decodeWav(a.bytes).get
          assert((wav.sampleRate, wav.durationMs) == ((rate, durMs)), s"id=$id $wav")
          val wins = RiffCodecs.wavPcmWindows(a.bytes, 4, 4)
          assert(wins.size.toLong == units, s"id=$id windows=${wins.size}")
          assert(wins.map(_.sumAbs).sum == payload, s"id=$id sumAbs")
        case _ =>
          val avi = RiffCodecs.decodeAvi(a.bytes).get
          assert((avi.width, avi.height, avi.durationMs) == ((w, h, durMs)), s"id=$id $avi")
          assert(avi.frames.size.toLong == units &&
            avi.frames.map(_._2.toLong).sum == payload, s"id=$id frames")
      }
    }
  }

  test("q98 pipeline: Spark-side decode over synthesized assets equals the arithmetic oracle") {
    val dir = java.nio.file.Files.createTempDirectory("q98docs").toString
    (0L until 120L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.OpsQueries.q98MultimodalMeta(spark, dir)
      .collect().map { r =>
        r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3), r.getInt(4),
          r.getLong(5), r.getInt(6), r.getLong(7), r.getLong(8), r.getLong(9)))
      }.toMap
    assert(got.size == 120, s"expected 120 rows, got ${got.size}")
    (0L until 120L).foreach { id =>
      assert(got(id) == expected(id), s"id=$id got=${got(id)} want=${expected(id)}")
    }
  }

  test("foldLabels delta store: off-batch members of a merged root are relabelled via byComp") {
    val store = java.nio.file.Files.createTempDirectory("r12labels").toString
    import graft.streaming.DedupStream
    def fold(ids: Seq[Long], pairs: Seq[(Long, Long)], tag: String): Map[Long, Long] =
      DedupStream.foldLabels(ids.toDF("id"), pairs.toDF("id1", "id2"), store, tag)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // tick 1: {10,11,12} cluster to 10; {20,21} to 20; 30 singleton
    val l1 = fold(Seq(10L, 11L, 12L, 20L, 21L, 30L),
      Seq((10L, 11L), (11L, 12L), (20L, 21L)), "t1")
    assert(l1 == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L), l1.toString)
    // tick 2: a single pair (5, 21) merges root 20's cluster into 5 —
    // member 20 is NOT in the batch and not a pair endpoint, so only
    // the byComp members lookup can relabel it
    val l2 = fold(Seq(5L), Seq((5L, 21L)), "t2")
    assert(l2 == l1.map { case (k, v) => k -> (if (v == 20L) 5L else v) }
      + (5L -> 5L), l2.toString)
    // tick 3: chain merge across BOTH prior clusters via one pair each
    // (1,12) and (1,21): every member of 10's and 5's clusters must
    // land on 1, including off-batch members 10, 11, 20
    val l3 = fold(Seq(1L), Seq((1L, 12L), (1L, 21L)), "t3")
    assert(l3 == Map(1L -> 1L, 5L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 1L,
      20L -> 1L, 21L -> 1L, 30L -> 30L), l3.toString)
    // a re-seen id arriving pair-free must NOT regress its label
    // (blind singleton row loses to the existing minimum)
    val l4 = fold(Seq(20L, 40L), Seq.empty, "t4")
    assert(l4 == l3 + (40L -> 40L), l4.toString)
    // pair endpoints may reference ids never ingested: they enter the
    // labelling through the contraction
    val l5 = fold(Seq.empty[Long], Seq((40L, 99L)), "t5")
    assert(l5 == l4 + (99L -> 40L), l5.toString)
  }

  test("foldLabels: driver fast path and distributed fallback produce identical stores") {
    import graft.streaming.DedupStream
    // the same 4-tick accretion folded twice — once forced LOCAL
    // (threshold = MaxValue), once forced DISTRIBUTED (threshold = 0);
    // includes every shape the paths branch on: fresh singletons,
    // within-batch chains, merges of two existing clusters (off-batch
    // member relabel through byComp), re-seen pair-free ids, and
    // endpoints never ingested
    val ticks = Seq(
      (Seq(10L, 11L, 12L, 20L, 21L, 30L),
        Seq((10L, 11L), (11L, 12L), (20L, 21L)), "t1"),
      (Seq(5L), Seq((5L, 21L)), "t2"),
      (Seq(1L, 50L), Seq((1L, 12L), (1L, 21L)), "t3"),
      (Seq(20L, 60L), Seq((60L, 99L)), "t4"))
    def run(threshold: Int): Map[Long, Long] = {
      val store = java.nio.file.Files.createTempDirectory(s"r12dual$threshold").toString
      var out: org.apache.spark.sql.DataFrame = null
      ticks.foreach { case (ids, ps, tag) =>
        out = DedupStream.foldLabels(ids.toDF("id"), ps.toDF("id1", "id2"),
          store, tag, localFoldThreshold = threshold)
      }
      out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val local = run(Int.MaxValue)
    val dist = run(0)
    assert(local == dist, s"paths diverged:\nlocal $local\ndist  $dist")
    assert(local == Map(1L -> 1L, 5L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 1L,
      20L -> 1L, 21L -> 1L, 30L -> 30L, 50L -> 50L,
      60L -> 60L, 99L -> 60L), local.toString)
  }
}
