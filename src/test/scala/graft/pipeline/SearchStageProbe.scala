package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage decomposition of one store-search leg: where do the
  * seconds actually go — scan, scoring map, per-pair dedup, window?
  * Diagnostic only (round-15 search-scale work); prints PROBE lines. */
object SearchStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-search-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val nq = sys.env.getOrElse("SPARK_GRAFT_SEARCH_NQ", "10000").toInt
    val copies = 8
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val emb = (0 until copies).map(c => emb0.select(
        (col("vec_id") + lit(c.toLong * 1000000000000L)).as("vec_id"),
        col("embedding"))).reduce(_ unionByName _)
    val queries = emb.orderBy(col("vec_id")).limit(nq)

    def wall[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%s wall=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }

    // replicate the IVF search pipeline piecewise against the shared store
    val store = s"${SearchScaleRehearsal.StoreRoot}/ivf"
    val centroids = graft.streaming.IvfStream.loadCentroids(spark, store)
    val qs = queries.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val probePairs = qs.flatMap { case (qid, qv) =>
      graft.ops.SimilaritySearch.nearestCellsOf(centroids, qv, 4).map(c => (qid, c)) }
    val vecOf = qs.map { case (id, v) => (id, v.toArray) }.toMap
    val byCell = probePairs.groupBy(_._2).map { case (c, arr) =>
      c -> arr.map { case (qid, _) => (qid, vecOf(qid)) } }
    val qBc = spark.sparkContext.broadcast(byCell)
    println(s"PROBE cells=${byCell.size} " +
      s"avg_probers=${probePairs.length / math.max(1, byCell.size)}")

    val stored = spark.read
      .schema("neighbor_id long, cell int, cvec array<float>")
      .option("recursiveFileLookup", "true").option("pathGlobFilter", "*.parquet")
      .parquet(s"$store/ivfvecs")
    val rows = wall("scan_count")(stored.count())
    println(s"PROBE stored_rows=$rows scan_parts=${stored.rdd.getNumPartitions}")

    val proj = stored.select(col("neighbor_id"), col("cell"), col("cvec"))
    def scoredOf(src: DataFrame) = src
      .as[(Long, Int, Array[Float])]
      .mapPartitions { it =>
        val qc = qBc.value
        val none = Array.empty[(Long, Array[Float])]
        it.flatMap { case (nid, cell, cvec) =>
          qc.getOrElse(cell, none).iterator.collect {
            case (qid, qv) if qid != nid => {
                val n = qv.length
                var dot = 0.0; var i = 0
                while (i < n) { dot += qv(i).toDouble * cvec(i).toDouble; i += 1 }
                var a = 0.0; i = 0
                while (i < n) { a += qv(i).toDouble * qv(i).toDouble; i += 1 }
                var b = 0.0; i = 0
                while (i < n) { b += cvec(i).toDouble * cvec(i).toDouble; i += 1 }
                (qid, nid, dot / (math.sqrt(a) * math.sqrt(b)))
              }
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")

    val balanced = proj.repartition(32)
    wall("score_only")(scoredOf(balanced).count())
    wall("score_dedup")(scoredOf(balanced)
      .groupBy("query_id", "neighbor_id").agg(max(col("cos")).as("cos")).count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    wall("score_dedup_window")(scoredOf(balanced)
      .groupBy("query_id", "neighbor_id").agg(max(col("cos")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5).count())
    wall("full_searchStore")(graft.streaming.IvfStream.searchStore(
      spark, store, queries, k = 5, nprobe = 4).count())
    spark.stop()
  }
}
