package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 gates: the q99 container trio — MediaSynth's JPEG /
  * MP4-sample-table / MKV-Xiph-lacing writers inverted by the real
  * codec walks ([[ImageCodecs.decodeJpeg]] marker scan,
  * [[RiffCodecs.decodeMp4]] stsz/stco/stsc chunk walk,
  * [[RiffCodecs.decodeMkv]] SimpleBlock lacing), plus the closed-form
  * byte-length arithmetic the DuckDB oracle restates. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  private def expected(id: Long): (String, String, Int, Int, Long, Long, Long, Long) =
    (id % 3).toInt match {
      case 0 =>
        val (w, h) = (8 + (id % 63).toInt, 8 + (id % 47).toInt)
        ("image", "jpeg", w, h, 0L, 0L, 0L, 45L + (10 + (id % 40)))
      case 1 =>
        val nf = 1 + (id % 5).toInt
        val len = 32 + 2 * (id % 20).toInt
        val sum = nf.toLong * len + nf.toLong * (nf - 1)
        ("video", "isom", 0, 0, 40L * nf, nf.toLong, sum, 196L + 4 * nf + sum)
      case _ =>
        val nf = 1 + (id % 4).toInt
        val len = 24 + 2 * (id % 40).toInt
        val sum = nf.toLong * len + nf.toLong * (nf - 1)
        ("video", "matroska", 16 + (id % 9).toInt, 9 + (id % 7).toInt,
          40L * nf, nf.toLong, sum, 78L + nf + sum)
    }

  test("q99 MediaSynth ↔ codec round-trip: JPEG marker scan, MP4 table walk, MKV lacing") {
    (0L until 240L).foreach { id =>
      val a = MediaSynth.extAssetFor(id)
      val (kind, fmt, w, h, durMs, units, payload, nBytes) = expected(id)
      assert(a.kind == kind && a.bytes.length.toLong == nBytes,
        s"id=$id kind/${a.kind} n_bytes=${a.bytes.length} expected $kind/$nBytes")
      fmt match {
        case "jpeg" =>
          val d = ImageCodecs.decodeHeader(a.bytes).get
          assert((d.width, d.height, d.format) == ((w, h, fmt)), s"id=$id $d")
        case "isom" =>
          val m = RiffCodecs.decodeMp4(a.bytes).get
          assert((m.brand, m.durationMs) == ((fmt, durMs)), s"id=$id $m")
          assert(m.frames.size.toLong == units &&
            m.frames.map(_._2.toLong).sum == payload, s"id=$id ${m.frames}")
          // the stsc chunk walk must preserve the stsz order: frame f
          // has length L+2f and its bytes are the synthesis pattern
          m.frames.zipWithIndex.foreach { case ((off, len), f) =>
            assert(len == 32 + 2 * (id % 20).toInt + 2 * f, s"id=$id f=$f len=$len")
            assert(a.bytes(off) == ((id + f) % 256).toByte, s"id=$id f=$f first byte")
          }
        case _ =>
          val m = RiffCodecs.decodeMkv(a.bytes).get
          assert((m.docType, m.width, m.height, m.durationMs, m.videoTracks) ==
            (("matroska", w, h, durMs, 1)), s"id=$id $m")
          assert(m.frames.size.toLong == units &&
            m.frames.map(_._2.toLong).sum == payload, s"id=$id ${m.frames}")
          // the Xiph lace must slice at the coded boundaries (last
          // frame implicit): same pattern check as MP4
          m.frames.zipWithIndex.foreach { case ((off, len), f) =>
            assert(len == 24 + 2 * (id % 40).toInt + 2 * f, s"id=$id f=$f len=$len")
            assert(a.bytes(off) == ((id + f) % 256).toByte, s"id=$id f=$f first byte")
          }
      }
    }
  }

  test("q100 MediaSynth ↔ codec round-trip: PNG IHDR, GIF LSD, WebP-VP8L packed dims") {
    (0L until 240L).foreach { id =>
      val a = MediaSynth.imgAssetFor(id)
      val (fmt, w, h, nBytes) = (id % 3).toInt match {
        case 0 => ("png", 1 + (id % 50).toInt, 1 + (id % 40).toInt,
          57L + 8 + (id % 32))
        case 1 => ("gif", 1 + (id % 30).toInt, 1 + (id % 25).toInt,
          18L + 4 + (id % 16))
        case _ => ("webp", 1 + (id % 20).toInt, 1 + (id % 15).toInt,
          25L + 7 + 2 * (id % 12))
      }
      assert(a.bytes.length.toLong == nBytes,
        s"id=$id n_bytes=${a.bytes.length} expected $nBytes")
      val d = ImageCodecs.decodeHeader(a.bytes).get
      assert((d.format, d.width, d.height) == ((fmt, w, h)), s"id=$id $d")
      // the PNG writer's CRCs must be REAL (a future checksum-aware
      // decoder must not break the gate): recompute and compare
      if (fmt == "png") {
        val c = new java.util.zip.CRC32()
        c.update(a.bytes, 12, 4 + 13) // "IHDR" + data
        val stored = java.nio.ByteBuffer.wrap(a.bytes, 29, 4).getInt
        assert(stored == c.getValue.toInt, s"id=$id IHDR crc")
      }
    }
  }

  test("q99 pipeline: Spark-side decode over synthesized assets equals the arithmetic oracle") {
    val dir = java.nio.file.Files.createTempDirectory("q99docs").toString
    (0L until 120L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.OpsQueries.q99MultimodalExt(spark, dir)
      .collect().map { r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("kind"), r.getAs[String]("fmt"),
            r.getAs[Int]("width"), r.getAs[Int]("height"),
            r.getAs[Long]("duration_ms"), r.getAs[Long]("n_units"),
            r.getAs[Long]("payload"), r.getAs[Long]("n_bytes")))
      }.toMap
    assert(got.size == 120, s"got ${got.size} rows")
    (0L until 120L).foreach { id =>
      val (kind, fmt, w, h, durMs, units, payload, nBytes) = expected(id)
      assert(got(id) == ((kind, fmt, w, h, durMs, units, payload, nBytes)),
        s"id=$id got ${got(id)}")
    }
  }

  test("q100 pipeline: PNG/GIF/WebP dims through the registered query") {
    val dir = java.nio.file.Files.createTempDirectory("q100docs").toString
    (0L until 90L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.OpsQueries.q100MultimodalImg(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("fmt"), r.getAs[Int]("width"),
          r.getAs[Int]("height"), r.getAs[Long]("n_bytes")))).toMap
    assert(got.size == 90)
    (0L until 90L).foreach { id =>
      val exp = (id % 3).toInt match {
        case 0 => ("png", 1 + (id % 50).toInt, 1 + (id % 40).toInt, 65L + id % 32)
        case 1 => ("gif", 1 + (id % 30).toInt, 1 + (id % 25).toInt, 22L + id % 16)
        case _ => ("webp", 1 + (id % 20).toInt, 1 + (id % 15).toInt, 32L + 2 * (id % 12))
      }
      assert(got(id) == exp, s"id=$id got ${got(id)} exp $exp")
    }
  }
}
