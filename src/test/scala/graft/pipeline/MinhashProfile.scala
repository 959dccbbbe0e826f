package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Stage-by-stage wall-clock breakdown of the q17 MinHash-LSH pipeline
  * (shingle → sign → band → estimator gate → exact verify), to aim the
  * optimization at the stage that actually pays. Not a test — run with
  * `Test/runMain graft.pipeline.MinhashProfile [sfDir]`. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = graft.queries.Queries.parallelFloor(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val (n, numHashes, bands, minJaccard) = (2, 64, 32, 0.5)

    val sh = Dedup.shingleHashes(docs, n).persist(MEMORY_AND_DISK)
    t("shingles")(sh.count())
    val sigs = Dedup.minhashSignatures(sh, numHashes).persist(MEMORY_AND_DISK)
    t("signatures")(sigs.count())
    val cands = Dedup.lshCandidatePairs(sigs, numHashes, bands)
      .persist(MEMORY_AND_DISK)
    t("candidates")(println("  n_cands=" + cands.count()))

    val s1 = sigs.toDF("id1" +: (0 until numHashes).map(i => s"a_$i"): _*)
    val s2 = sigs.toDF("id2" +: (0 until numHashes).map(i => s"b_$i"): _*)
    val estMatches = (0 until numHashes)
      .map(i => when(col(s"a_$i") === col(s"b_$i"), 1).otherwise(0))
      .reduce(_ + _)
    val sigma = math.sqrt(minJaccard * (1 - minJaccard) / numHashes)
    val gate = math.max(0.0, minJaccard - 2.5 * sigma) * numHashes
    val strong = cands.join(s1, "id1").join(s2, "id2")
      .withColumn("est_m", estMatches)
      .filter(col("est_m") >= gate)
      .select("id1", "id2")
      .persist(MEMORY_AND_DISK)
    t("estimator gate")(println("  n_strong=" + strong.count()))

    val sizes = sh.groupBy("id").agg(count(lit(1)).as("set_n"))
    val inter = strong
      .join(sh.as("s1"), col("id1") === col("s1.id"))
      .join(sh.as("s2"), col("id2") === col("s2.id") && col("s1.sh") === col("s2.sh"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("inter_n"))
    val fin = inter
      .join(sizes.select(col("id").as("id1"), col("set_n").as("n1")), "id1")
      .join(sizes.select(col("id").as("id2"), col("set_n").as("n2")), "id2")
      .withColumn("union_n", col("n1") + col("n2") - col("inter_n"))
      .filter(col("inter_n") >= col("union_n") * minJaccard)
    t("exact verify")(println("  n_pairs=" + fin.count()))

    t("end-to-end (operator, mbc=1)")(
      println("  n=" + Dedup.minhashDedupPairs(docs, n, numHashes, bands, minJaccard).count()))
    spark.catalog.clearCache()
    val v2 = t("end-to-end (operator, mbc=2)") {
      val d = Dedup.minhashDedupPairs(docs, n, numHashes, bands, minJaccard,
        minBandCollisions = 2)
      println("  n=" + d.count()); d
    }
    spark.catalog.clearCache()
    val v1 = Dedup.minhashDedupPairs(docs, n, numHashes, bands, minJaccard)
    println("PROF pairset diff (1 vs 2): " +
      v1.select("id1", "id2").exceptAll(v2.select("id1", "id2")).count() + " lost, " +
      v2.select("id1", "id2").exceptAll(v1.select("id1", "id2")).count() + " gained")
    spark.stop()
  }
}
