package graft.queries

import graft.SparkSpec

/** q86 composition invariants (the oracle hash-gates the values; this
  * pins the internal consistency for refactors between gate runs). */
class CorpusPipelineSpec extends SparkSpec {

  test("q86: kept = AND of the stage booleans; benchmark docs never kept") {
    val out = OpsQueries.q86CorpusPipeline(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, ex, nd, cl, q, kept) = (r.getLong(0), r.getBoolean(1),
        r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))
      assert(kept == (ex && nd && cl && q), s"doc $id: kept != AND of stages")
      if (id % 50 == 0) assert(!cl, s"benchmark doc $id must not be clean")
    }
    assert(out.exists(_.getBoolean(5)), "a non-empty corpus must survive")
    assert(out.exists(r => !r.getBoolean(5)), "some docs must be filtered")
  }
}
