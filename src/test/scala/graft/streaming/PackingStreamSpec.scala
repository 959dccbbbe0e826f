package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class PackingStreamSpec extends SparkSpec {
  import PackingStream._

  private def runBatches(batches: Seq[Seq[PackDoc]], budget: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[PackDoc]
    val out = java.nio.file.Files.createTempDirectory("packed").toString
    val ckpt = java.nio.file.Files.createTempDirectory("packed-ckpt").toString
    batches.foreach { b =>
      mem.addData(b: _*)
      val q = greedyPackStream(mem.toDS(), budget)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset")))).toMap
  }

  test("packer state carries across micro-batches per stratum") {
    val got = runBatches(Seq(
      Seq(PackDoc(1, "s0", 1000), PackDoc(2, "s0", 900), PackDoc(10, "s1", 2000)),
      Seq(PackDoc(3, "s0", 500), PackDoc(11, "s1", 100))), budget = 2048)
    assert(got(1L) == ((0L, 0L)))
    assert(got(2L) == ((0L, 1000L)))
    // batch 2: s0 fill=1900, 1900+500 > 2048 → closes pack 0
    assert(got(3L) == ((1L, 0L)))
    // s1 packs independently: 2000+100 > 2048 → doc 11 opens pack 1
    assert(got(10L) == ((0L, 0L)))
    assert(got(11L) == ((1L, 0L)))
  }

  test("single over-budget document gets a pack to itself (batch invariants hold)") {
    val got = runBatches(Seq(
      Seq(PackDoc(1, "s0", 5000), PackDoc(2, "s0", 10))), budget = 2048)
    assert(got(1L) == ((0L, 0L)))   // alone in pack 0, over budget
    assert(got(2L) == ((1L, 0L)))   // next doc closes it
  }

  test("one batch matches the batch greedy packer exactly") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => PackDoc(i, s"s${i % 3}", 300 + (i % 7) * 150))
    val got = runBatches(Seq(docs), budget = 2048)
    val batch = graft.ops.Corpus.greedyPack(
      docs.toDF("doc_id", "stratum", "n_tok"),
      "stratum", col("n_tok"), budgetTokens = 2048, idCol = "doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset")))).toMap
    assert(got == batch)
  }
}
