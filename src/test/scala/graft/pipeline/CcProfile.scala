package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown for the q46/q57/q81 cluster family at a given SF
  * dir: edge generation vs contraction vs the final labelling join —
  * and the distributed star contraction vs the driver union-find on
  * the SAME edge set, to keep [[graft.ops.ConnectedComponents]]'s
  * `localThreshold` an evidence-backed number rather than folklore.
  *
  * `sbt "Test/runMain graft.pipeline.CcProfile /root/repo/target/sf1"`
  */
object CcProfile {
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
      println(f"PROF $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = graft.queries.Queries.parallelFloor(
      spark.read.parquet(s"$sfDir/documents.parquet"))

    val edges = graft.ops.Dedup.ngramJaccardPairs(docs, n = 2,
      minIntersect = 8, blockCol = Some("source"), withSizes = false)
      .persist(MEMORY_AND_DISK)
    val nEdges = t("edges: generate+persist")(edges.count())
    println(s"PROF edge_rows $nEdges")

    var rounds = 0
    val compDist = t("cc: star contraction (forced)") {
      val c = graft.ops.ConnectedComponents.connectedComponents(
        edges, "id1", "id2", localThreshold = 0L,
        onRound = (r, n) => { rounds = r; println(s"PROF   round $r edges=$n") })
      c.count(); c
    }
    println(s"PROF contraction_rounds $rounds")

    val compLocal = t("cc: driver union-find (forced)") {
      val c = graft.ops.ConnectedComponents.connectedComponents(
        edges, "id1", "id2", localThreshold = Long.MaxValue)
      c.count(); c
    }

    t("identical labellings") {
      require(compDist.except(compLocal).isEmpty &&
        compLocal.except(compDist).isEmpty, "labellings diverged")
    }

    t("q46 tail: left join + coalesce") {
      docs.select(col("doc_id"))
        .join(compDist.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
        .count()
    }
    edges.unpersist()
    spark.stop()
  }
}
