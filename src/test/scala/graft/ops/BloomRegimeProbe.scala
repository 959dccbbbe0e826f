package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Regime evidence for the Bloom decontaminator (q75 / q96): at which
  * (shingle order, corpus) does the single-pass bloom-pruned sweep
  * beat the plain exact sweep, and how close does its dense-regime
  * worst case sit to exact-sweep cost (the round-16 design's claim is
  * "one Bloom probe per posting" of overhead, no extra scans)?
  *
  * The testdata documents draw from a ~31-word vocabulary, so BIGRAM
  * overlap is dense by construction (every doc shares bigrams with
  * almost every other) — that is q75's regime: the probe prunes
  * almost nothing and the join does the work. Contamination screens
  * in production run 8-13-gram shingles (Brown et al. GPT-3 app. C use
  * 13-grams; The Pile uses 13-grams) precisely so that only REAL
  * duplicated passages collide — on this corpus an 8-gram shingle is
  * shared only through genuinely duplicated word runs, which is the
  * sparse regime the Bloom prefilter exists for.
  *
  * For each n in {2, 4, 8} this probe reports suspect density, then
  * interleaved A/B wall times (min of 3) for the exact sweep vs the
  * bloom path, asserting output equality.
  *
  * Run: sbt "Test/runMain graft.ops.BloomRegimeProbe /root/testdata/sf0.1"
  */
object BloomRegimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Queries.parallelFloor(
      spark.read.parquet(s"$dir/documents.parquet"))
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)

    for (n <- Seq(2, 4, 8)) {
      // suspect density at this order (the bloom path logs it too;
      // recompute it directly for the table)
      val cSh = Dedup.shingleHashes(corpus, n).select(col("id"), col("sh"))
      val bSh = Dedup.shingleHashes(bench, n).select(col("sh")).distinct()
      val suspects = cSh.join(bSh, "sh").select("id").distinct().count()
      val total = corpus.count()
      println(f"BLOOM n=$n suspects=$suspects/$total (${100.0 * suspects / total}%.2f%%)")

      val exactT = Array.fill(3)(0.0); val bloomT = Array.fill(3)(0.0)
      var rowsE = -1L; var rowsB = -1L
      for (i <- 0 until 3) {
        val t0 = System.nanoTime()
        rowsE = Dedup.contaminationPairs(corpus, bench, n, minIntersect = 4).count()
        exactT(i) = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val t1 = System.nanoTime()
        rowsB = Dedup.contaminationPairsBloom(corpus, bench, n, minIntersect = 4).count()
        bloomT(i) = (System.nanoTime() - t1) / 1e9
        spark.catalog.clearCache()
      }
      val eq = {
        val e = Dedup.contaminationPairs(corpus, bench, n, minIntersect = 4)
        val b = Dedup.contaminationPairsBloom(corpus, bench, n, minIntersect = 4)
        val cols = e.columns.map(col).toSeq
        e.select(cols: _*).exceptAll(b.select(cols: _*)).isEmpty &&
          b.select(cols: _*).exceptAll(e.select(cols: _*)).isEmpty
      }
      spark.catalog.clearCache()
      println(f"BLOOM n=$n exact=${exactT.min}%.2fs bloom=${bloomT.min}%.2fs " +
        f"rows=$rowsE/$rowsB equal=$eq")
    }
    spark.stop()
  }
}
