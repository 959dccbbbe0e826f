package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("binned interval join equals the naive BETWEEN join, boundaries inclusive") {
    val rnd = new scala.util.Random(5)
    // intervals of wildly mixed lengths (some spanning many bins)
    val intervals = (0 until 40).map { i =>
      val start = rnd.nextInt(100000).toLong
      (i % 4L, i.toLong, ts(start), ts(start + 60L + rnd.nextInt(20000)))
    }.toDF("k", "iv_id", "start_ts", "end_ts")
    val points = (0 until 400).map { i =>
      (i % 5L, i.toLong, ts(rnd.nextInt(120000).toLong))
    }.toDF("k", "p_id", "p_ts")

    def pairs(df: org.apache.spark.sql.DataFrame) = df.select("p_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pairs(points.join(intervals, Seq("k"))
      .filter(col("p_ts").between(col("start_ts"), col("end_ts"))))
    val binned = pairs(RangeJoin.binnedIntervalJoin(
      points, intervals, Seq("k"), "p_ts", "start_ts", "end_ts", binSeconds = 600))
    assert(binned == naive)
    assert(naive.nonEmpty)

    // exact boundary points match on both ends (inclusive BETWEEN)
    val iv = Seq((1L, 7L, ts(1000), ts(2000))).toDF("k", "iv_id", "start_ts", "end_ts")
    val edge = Seq((1L, 1L, ts(1000)), (1L, 2L, ts(2000)),
      (1L, 3L, ts(999)), (1L, 4L, ts(2001)), (2L, 5L, ts(1500)))
      .toDF("k", "p_id", "p_ts")
    val got = pairs(RangeJoin.binnedIntervalJoin(
      edge, iv, Seq("k"), "p_ts", "start_ts", "end_ts", binSeconds = 100))
    assert(got == Set((1L, 7L), (2L, 7L)), s"got $got")
  }

  test("a point never duplicates across an interval's many bins") {
    val iv = Seq((1L, 9L, ts(0), ts(100000))).toDF("k", "iv_id", "start_ts", "end_ts")
    val p = Seq((1L, 1L, ts(50000))).toDF("k", "p_id", "p_ts")
    val out = RangeJoin.binnedIntervalJoin(
      p, iv, Seq("k"), "p_ts", "start_ts", "end_ts", binSeconds = 60)
    assert(out.count() == 1L) // interval spans ~1667 bins; still one row
  }
}
