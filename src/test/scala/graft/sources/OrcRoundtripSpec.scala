package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ORC source/sink parity: the columnar-format surface beyond parquet —
  * lossless roundtrip, filter pushdown, column pruning. */
class OrcRoundtripSpec extends SparkSpec {

  test("documents roundtrip through ORC with pushdown and pruning intact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    docs.write.mode("overwrite").orc(s"$dir/docs")

    val back = spark.read.orc(s"$dir/docs")
    assert(back.schema == docs.schema, "ORC must preserve the schema exactly")
    val a = docs.orderBy("doc_id").collect()
    val b = back.orderBy("doc_id").collect()
    assert(a.sameElements(b), "roundtrip must be lossless")

    // filter pushdown + column pruning reach the ORC scan
    val q = back.filter(col("doc_id") < 100).select("doc_id", "source")
    q.collect()
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("doc_id"),
      s"filter not pushed to ORC scan:\n$scan")
    assert(scan.contains("ReadSchema") && !scan.contains("text"),
      s"ORC scan reads pruned-away columns:\n$scan")
  }
}
