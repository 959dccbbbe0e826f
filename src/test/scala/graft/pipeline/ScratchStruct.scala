package graft.pipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{ConnectedComponents, Dedup}
object ScratchStruct {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](l: String)(f: => A): A = { val t0 = System.nanoTime(); val r = f
      println(f"PROF $l%-20s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r }
    val docs = graft.queries.Queries.parallelFloor(
      spark.read.parquet("/root/repo/target/sf1/documents.parquet"))
    val edges = Dedup.ngramJaccardPairs(docs, n = 2, minIntersect = 8,
      blockCol = Some("source"), withSizes = false)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("edges")(println("  n_edges=" + edges.count()))
    val comp = t("cc")(ConnectedComponents.connectedComponents(edges, "id1", "id2"))
    t("cc materialize")(println("  n_comp=" + comp.count()))
    spark.stop()
  }
}
