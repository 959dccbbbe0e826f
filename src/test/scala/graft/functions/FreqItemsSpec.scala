package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  test("Misra-Gries guarantee: every item above n/k survives as candidate") {
    val rnd = new scala.util.Random(5)
    // zipfian-ish stream: 3 heavy items + long tail, shuffled
    val heavy = Seq.fill(5000)("alpha") ++ Seq.fill(3000)("beta") ++ Seq.fill(1500)("gamma")
    val tail = (0 until 10000).map(i => s"tail${rnd.nextInt(5000)}")
    val items = rnd.shuffle(heavy ++ tail).toDF("item")
    val n = items.count()
    val k = 50
    val cands = items.repartition(8)
      .agg(FreqItemsAgg.freqItems(col("item"), k)).collect()(0).getSeq[String](0).toSet
    // exact counts of items above n/k
    val mustSurvive = items.groupBy("item").count()
      .filter(col("count") > n / k).collect().map(_.getString(0)).toSet
    assert(mustSurvive.nonEmpty)
    assert(mustSurvive.subsetOf(cands),
      s"missing: ${mustSurvive -- cands}; cands size ${cands.size}")
    assert(cands.size <= 2 * k) // partial aggregation can double before final merge shrink
  }

  test("sketch is mergeable across partitionings (same guarantee)") {
    val items = ((1 to 900).map(_ => "x") ++ (1 to 100).map(i => s"y$i")).toDF("item")
    for (parts <- Seq(1, 4, 16)) {
      val c = items.repartition(parts)
        .agg(FreqItemsAgg.freqItems(col("item"), 10)).collect()(0).getSeq[String](0)
      assert(c.contains("x"), s"parts=$parts")
    }
  }
}
