package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // power-law: one hot key with 10k rows, 50 cold keys with 10 each
  lazy val skewed = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
    (1 to 50).flatMap(k => (1 to 10).map(i => (s"cold$k", i.toDouble))))
    .toDF("key", "value")

  test("saltedSum equals the direct aggregation") {
    val direct = skewed.groupBy("key")
      .agg(sum("value").as("sum"), count(lit(1)).as("count"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedSum(skewed, col("key"), col("value"), 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("saltedJoin equals the direct join") {
    val dim = (Seq("hot") ++ (1 to 50).map(k => s"cold$k"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "dim_id")
    val direct = skewed.join(dim, "key")
      .groupBy("key").agg(count(lit(1)).as("n"), sum("dim_id").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedJoin(skewed, dim, "key", 8)
      .groupBy("key").agg(count(lit(1)).as("n"), sum("dim_id").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
