package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale rehearsal: synthesizes a 10× documents/embeddings corpus
  * from sf0.1 (the driver ships no sf1 testdata) and exercises the
  * paths whose scale behavior toy data cannot probe — hot-bucket caps,
  * DedupStream's per-tick pruning against a growing store, and the
  * corpus operators' global-index passes.
  *
  *   - documents ×10: copy 0 verbatim, copies 1–9 prefixed with a
  *     copy token — every original doc becomes a 10-member near-dup
  *     cluster (a re-crawled web corpus in miniature), so pair
  *     generation faces real duplication pressure, not noise.
  *   - embeddings ×10: deterministic per-copy additive jitter (keeps
  *     neighborhood structure; no artificial cosine point mass).
  *
  * Run: `sbt "Test/runMain graft.pipeline.ScaleRehearsal"` then
  * Bench with SPARK_GRAFT_SF_DIR=target/sf1. The DedupStream leg
  * prints per-tick seconds — the O(batch) claim is that tick time
  * stays flat as the store accumulates the previous ticks.
  */
object ScaleRehearsal {
  val SrcDir = "/root/testdata/sf0.1"
  val DestDir = "/root/repo/target/sf1"
  val Copies = 10

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scale-rehearsal")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$SrcDir/documents.parquet")
    val emb = spark.read.parquet(s"$SrcDir/embeddings.parquet")

    val bigDocs: DataFrame = (0 until Copies).map { c =>
      val t = if (c == 0) col("text") else concat(lit(s"c$c "), col("text"))
      docs.select(
        (col("doc_id") + lit(c.toLong * 100000000L)).as("doc_id"),
        t.as("text"), col("lang"), col("source"),
        length(t).cast("long").as("n_chars"))
    }.reduce(_ unionByName _)
    val bigEmb: DataFrame = (0 until Copies).map { c =>
      emb.select(
        (col("vec_id") + lit(c.toLong * 100000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + lit(0.01f * (c % 7)) * sin(col("vec_id") * lit(c) + i))
            .cast("float")).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)

    bigDocs.repartition(32).write.mode("overwrite")
      .parquet(s"$DestDir/documents.parquet")
    bigEmb.repartition(32).write.mode("overwrite")
      .parquet(s"$DestDir/embeddings.parquet")
    println(s"GEN documents=${spark.read.parquet(s"$DestDir/documents.parquet").count()} " +
      s"embeddings=${spark.read.parquet(s"$DestDir/embeddings.parquet").count()}")

    // DedupStream at 10x: ticks over 5k-doc batches of DISJOINT content
    // (each tick = all 10 copies of 1/10 of the originals). Emitted
    // pairs are constant per tick, so per-tick wall time must stay
    // FLAT as the store accumulates — the O(batch) pruning proof.
    // (Slicing by copy instead makes every tick near-dup ALL previous
    // ticks: emitted pairs then grow linearly by construction, which
    // measures the output, not the store read.)
    val store = java.nio.file.Files.createTempDirectory("sf1-dstore").toString
    val all = spark.read.parquet(s"$DestDir/documents.parquet")
      .select("doc_id", "text").persist()
    all.count()
    (0 until 10).foreach { c =>
      val batch = all.filter(pmod(col("doc_id") % 100000000L, lit(10)) === c)
      val t0 = System.nanoTime()
      val pairs = graft.streaming.DedupStream.step(
        batch, store, batchTag = s"tick$c")
      val n = pairs.count()
      pairs.unpersist()
      println(f"TICK $c%d pairs=$n%d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    // incremental exact-substring at 10x: same disjoint slicing; the
    // wins store accumulates ~2M window hashes, per-tick time must
    // stay flat (each tick's copies dedup within the tick)
    val sstore = java.nio.file.Files.createTempDirectory("sf1-wstore").toString
    (0 until 10).foreach { c =>
      val batch = all.filter(pmod(col("doc_id") % 100000000L, lit(10)) === c)
      val t0 = System.nanoTime()
      val spans = graft.streaming.DedupStream.substrStep(
        batch, sstore, batchTag = s"w$c")
      val n = spans.count()
      spans.unpersist()
      println(f"SUBSTR_TICK $c%d spans=$n%d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
