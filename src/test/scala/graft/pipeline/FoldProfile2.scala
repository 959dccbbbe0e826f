package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Piecewise re-enactment of one foldLabels tick (q97 tick 0 shape) —
  * times each internal stage separately to localize the fixed cost.
  * `sbt "Test/runMain graft.pipeline.FoldProfile2 /root/testdata/sf0.1"` */
object FoldProfile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup
    val mad = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"FP2 $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = graft.queries.Queries.parallelFloor(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val fps = Dedup.simhashPortable(docs).persist(mad)
    fps.count()
    val allPairs = Dedup.simhashPairsBalanced(fps, maxDist = 3).persist(mad)
    allPairs.count()
    val batchIds = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id").cast("long").as("id"))
    val pairs = allPairs.filter(pmod(col("id1") + col("id2"), lit(3)) === 0)
    val parts = lit(64L)

    val ends = t("ends persist+collectParts") {
      val e = pairs.select(col("id1").cast("long").as("id"))
        .unionByName(pairs.select(col("id2").cast("long").as("id")))
        .filter(col("id").isNotNull).distinct().persist(mad)
      val ep = e.select(pmod(xxhash64(col("id")), parts).cast("int").as("li"))
        .distinct().collect().map(_.getInt(0)).toSet
      println(s"FP2 endParts ${ep.size}")
      e
    }
    // store empty at tick 0: prevT is an empty read
    val prevT = t("prevT agg count") {
      val p = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("component", org.apache.spark.sql.types.LongType))))
        .groupBy("id").agg(min("component").as("component")).persist(mad)
      p.count(); p
    }
    val contracted = t("updateComponents materialize") {
      val c = graft.ops.ConnectedComponents.updateComponents(prevT, pairs, "id1", "id2")
        .persist(mad)
      c.count(); c
    }
    val remap = t("remap collectParts") {
      val r = prevT.select(col("component").as("id")).distinct()
        .join(contracted, Seq("id"))
        .filter(col("component") =!= col("id"))
        .select(col("id").as("old_root"), col("component").as("new_root"))
        .persist(mad)
      r.select(pmod(xxhash64(col("old_root")), parts).cast("int"))
        .distinct().collect()
      r
    }
    val singles = batchIds.select(col("id")).distinct()
      .join(broadcast(contracted.select("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    val moved = contracted
    val store = java.nio.file.Files.createTempDirectory("fp2").toString
    t("byId write (repartition+partitionBy)") {
      moved.unionByName(singles)
        .withColumn("li", pmod(xxhash64(col("id")), parts).cast("int"))
        .repartition(col("li")).write.partitionBy("li")
        .mode("overwrite").parquet(s"$store/labels/byId/batch=t0")
    }
    t("byComp write") {
      moved.withColumn("lc", pmod(xxhash64(col("component")), parts).cast("int"))
        .repartition(col("lc")).write.partitionBy("lc")
        .mode("overwrite").parquet(s"$store/labels/byComp/batch=t0")
    }
    t("byId write UNPARTITIONED coalesce(1)") {
      moved.unionByName(singles).coalesce(1)
        .write.mode("overwrite").parquet(s"$store/labels/byId/batch=t0u")
    }
    spark.stop()
  }
}
