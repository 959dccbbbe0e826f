package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shard delivery round-trip: the consumer-side acceptance check —
  * re-derive the manifest from the written data files and compare
  * row-for-row; restore training order from pos_in_shard. */
class ShardWriterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = (0L until 300L)
    .map(i => (i, s"doc $i body ${"x" * (i % 17).toInt}"))
    .toDF("doc_id", "text")

  test("writeShards: manifest matches a recount over the written data files") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val manifest = Corpus.writeShards(corpus, out, shardSize = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(manifest.keySet == (0L until 5L).toSet) // ceil(300/64) shards
    assert(manifest.values.map(_._1).sum == 300L)
    // last shard carries the remainder
    assert(manifest.values.map(_._1).toSeq.sorted == Seq(44L, 64L, 64L, 64L, 64L))

    // consumer acceptance: recount from the DATA FILES only (partition
    // dirs re-infer shard_id as int — cast back to the contract type)
    val back = spark.read.parquet(s"$out/data")
      .withColumn("shard_id", col("shard_id").cast("long"))
    val recount = back.groupBy("shard_id")
      .agg(count(lit(1)).as("n"),
        sum(ceil(length(col("text")) / lit(4.0)).cast("long")).as("tok"),
        sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")).as("cs"),
        min(struct(col("pos_in_shard").as("p"), col("doc_id").as("d"))).as("f"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getStruct(4).getLong(1)))).toMap
    assert(recount == manifest, "manifest must match the delivered bytes")

    // training order restores exactly from (shard_id, pos_in_shard)
    val restored = back.orderBy("shard_id", "pos_in_shard")
      .select("doc_id").as[Long].collect()
    val expected = Corpus.shuffleShards(corpus, 64)
      .orderBy("shard_id", "pos_in_shard").select("doc_id").as[Long].collect()
    assert(restored.sameElements(expected))

    // a tampered delivery (one doc's text altered) fails the checksum
    val tampered = back.withColumn("text",
      when(col("doc_id") === 7L, lit("EVIL")).otherwise(col("text")))
    val badCs = tampered.groupBy("shard_id")
      .agg(sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(badCs.exists { case (k, v) => manifest(k)._3 != v })
  }
}
