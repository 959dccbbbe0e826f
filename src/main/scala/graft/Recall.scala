package graft

import org.apache.spark.sql.SparkSession

/** Recall-evidence harness for the rows-only approximate ANN tiers:
  * measures recall@5 of q20 (LSH) / q30 (IVF) / q45 (PQ+re-rank) /
  * q65 (IVF-PQ fused) against q19's brute-force cosine ground truth on
  * the SAME query set, at whatever SF dir is supplied. The per-tier
  * specs assert thresholds; this main produces the committed numbers
  * (RECALL.md) so the quality of the approximate tiers is a recorded
  * artifact, not an act of faith.
  *
  * Usage: `sbt "runMain graft.Recall /root/testdata/sf0.1"` (or set
  * SPARK_GRAFT_SF_DIR). Emits one JSON line:
  * `{"sf":…,"truth_pairs":N,"recall":{"q20_lsh":r,…}}`.
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.queries.OpsQueries
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val truth = pairs(OpsQueries.q19CosineTopK(spark, sfDir))
    spark.catalog.clearCache()
    val tiers: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "q20_lsh" -> (OpsQueries.q20LshTopK _),
      "q30_ivf" -> (OpsQueries.q30IvfTopK _),
      "q45_pq" -> (OpsQueries.q45PqTopK _),
      "q65_ivfpq" -> (OpsQueries.q65IvfPqTopK _))
    val recalls = tiers.map { case (name, fn) =>
      val r = pairs(fn(spark, sfDir))
      spark.catalog.clearCache()
      name -> (if (truth.isEmpty) 0.0 else r.intersect(truth).size.toDouble / truth.size)
    }
    val body = recalls.map { case (n, r) => "\"" + n + "\":" + f"$r%.4f" }
      .mkString("{", ",", "}")
    spark.stop()
    println(s"""{"sf":"$sfDir","truth_pairs":${truth.size},"recall":$body}""")
  }
}
