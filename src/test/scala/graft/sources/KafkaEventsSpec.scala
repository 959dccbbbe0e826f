package graft.sources

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Case-class twin of the Kafka source schema for MemoryStream — the
  * DataFrame it yields has the same column names/types as
  * `format("kafka")` output (top-level: local case classes can't
  * derive product encoders). */
final case class KRec(key: Array[Byte], value: Array[Byte], topic: String,
    partition: Int, offset: Long, timestamp: java.sql.Timestamp, timestampType: Int)

/** Contract spec for the Kafka-shaped event adapter: any DataFrame
  * with the Kafka source's fixed schema decodes into the SAME
  * RawActorEvent rows the DSv2 [[EpochEventSource]] emits — batch and
  * streaming (MemoryStream stands in for the broker; the schema is the
  * public `format("kafka")` contract, so a real deployment swaps the
  * source and keeps every downstream stage). */
class KafkaEventsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lines: Seq[String] = {
    val p = java.nio.file.Paths.get(s"${TestSpark.fixtures}/rawActorEvents.json")
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(p)).asScala.toSeq.filter(_.nonEmpty)
  }

  private def kafkaRows(values: Seq[Array[Byte]]) = {
    val rows = values.zipWithIndex.map { case (v, i) =>
      Row(null, v, "actor-events", i % 3, i.toLong,
        new java.sql.Timestamp(1700000000000L + i), 0)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), KafkaEvents.kafkaSourceSchema)
  }

  test("batch decode matches the DSv2 source row-for-row on the golden fixture") {
    val decoded = KafkaEvents.decode(kafkaRows(lines.map(_.getBytes("UTF-8"))))
    // same shape as the DSv2 source (nullability differs: from_json
    // fields are nullable by construction, the guard filter enforces it)
    assert(decoded.columns.toSeq ==
      graft.model.RawActorEvent.schema.fieldNames.toSeq)

    val events = java.nio.file.Files.createTempDirectory("kafka-eq").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.fixtures}/rawActorEvents.json"),
      java.nio.file.Paths.get(s"$events/epochs-4622129-4622139.json"))
    val head = s"$events/head.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(head),
      s"""{"Height":${4622139 + 940}}""")
    val dsv2 = spark.read.format("graft.sources.EpochEventSource")
      .option("path", events).option("headFile", head)
      .option("finalityEpochs", 940).load()

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("entries", to_json(col("entries")))
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(decoded.count() == 360)
    assert(canon(decoded).sameElements(canon(dsv2.toDF())))

    // the whole downstream pipeline is source-agnostic: CBOR decode +
    // pivot + ActiveDeal projection produce the golden 360 deals from
    // the Kafka-shaped stream, identical to the DSv2 path
    import graft.codec.EventCodec
    val dealsK = EventCodec.toActiveDeals(EventCodec.decodeBlockEvents(decoded))
    val dealsD = EventCodec.toActiveDeals(EventCodec.decodeBlockEvents(dsv2.toDF()))
    assert(dealsK.count() == 360)
    val ck = dealsK.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val cd = dealsD.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(ck.sameElements(cd), "ActiveDeal projection must match the DSv2 path")
  }

  test("malformed values dead-letter row-wise, never a task failure") {
    val junk: Seq[Array[Byte]] = Seq(
      Array[Byte](0, 1, 2, 3),                            // not JSON
      "{\"emitter\":\"f06\"".getBytes("UTF-8"),           // truncated
      "{\"height\":5}".getBytes("UTF-8"),                 // missing fields
      """{"emitter":"f06","height":7,"reverted":false,"entries":[{"Codec":81}]}"""
        .getBytes("UTF-8"),                               // entry missing fields
      "[]".getBytes("UTF-8"),                             // wrong JSON shape
      lines.head.getBytes("UTF-8"))                       // one good row
    val out = KafkaEvents.decode(kafkaRows(junk))
    assert(out.count() == 1)
    assert(out.select("emitter").as[String].head() == "f06")
  }

  test("streaming decode over a MemoryStream broker stand-in; finality gate composes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[KRec]
    mem.addData(lines.zipWithIndex.map { case (l, i) =>
      KRec(null, l.getBytes("UTF-8"), "actor-events", i % 3, i.toLong,
        new java.sql.Timestamp(1700000000000L + i), 0)
    }: _*)

    val q = KafkaEvents.decode(mem.toDF())
      .writeStream.format("memory").queryName("kafka_decoded")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("kafka_decoded")
    assert(got.count() == 360)
    assert(got.agg(min("height"), max("height")).as[(Int, Int)].head() ==
      ((4622129, 4622139)))

    // stream-side finality gate: head barely past the data clips it
    val gated = KafkaEvents.finalityGate(got, chainHead = 4622134 + 940, finalityEpochs = 940)
    assert(gated.agg(max("height")).as[Int].head() == 4622134)
    assert(gated.count() == 228) // same golden clip as the DSv2 gate
  }
}
