package graft.pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup
object ScratchStruct {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](l: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f
      println(f"PROF $l%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r }
    val docs = graft.queries.Queries.parallelFloor(
      spark.read.parquet("/root/repo/target/sf1/documents.parquet"))
    // current posting-list path
    t("posting-list edges") {
      val e = Dedup.ngramJaccardPairs(docs, 2, 8, blockCol = Some("source"), withSizes = false)
      println("  n=" + e.count())
    }
    spark.catalog.clearCache()
    // self-join path
    t("self-join edges") {
      val words = split(col("text"), " ")
      val grams = array_distinct(filter(
        zip_with(words, slice(words, lit(2), size(words)),
          (a, b) => when(b.isNotNull, xxhash64(a, b))), g => g.isNotNull))
      val sh = docs.select(col("doc_id").as("id"), col("source").as("block"),
        explode(grams).as("sh"))
      val a = sh.toDF("id1", "block", "sh")
      val b = sh.toDF("id2", "block", "sh")
      val e = a.join(b, Seq("block", "sh"))
        .filter(col("id1") < col("id2"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("inter_n"))
        .filter(col("inter_n") >= 8)
      println("  n=" + e.count())
    }
    spark.stop()
  }
}
