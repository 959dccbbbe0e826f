package graft.ops

import graft.SparkSpec

/** Gopher-rule gate: hand-computed stats and exact threshold
  * boundaries (the cross-multiplied integer predicates must flip at
  * precisely the paper's ratios, with no float fuzz). */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: (Long, String)*) =
    TextAnalysis.gopherRules(texts.toDF("doc_id", "text"), minWords = 4)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("hand-computed stats and rule booleans") {
    val out = run(
      // 6 words, lens 3+1+3+2+3+3=15, 'the' x2 + 'a' -> 2 distinct stops,
      // top word 'the' x2 -> 5*2 > 6 fails r_rep
      1L -> "the a the of row row",
      // 5 distinct 3-char words incl 2 stopwords, top=1: all pass
      2L -> "the and row fox dog")
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_words") == 6L)
    assert(r1.getAs[Long]("sum_word_len") == 15L)
    assert(r1.getAs[Long]("n_distinct_words") == 4L)
    assert(r1.getAs[Long]("top_word_n") == 2L)
    assert(r1.getAs[Long]("n_stop_distinct") == 3L) // the, a, of
    assert(r1.getAs[Boolean]("r_word_count"))
    assert(!r1.getAs[Boolean]("r_mean_len")) // 3*6=18 > 15
    assert(r1.getAs[Boolean]("r_stop"))
    assert(!r1.getAs[Boolean]("r_rep")) // 5*2=10 > 6
    assert(!r1.getAs[Boolean]("kept"))
    val r2 = out(2L)
    assert(r2.getAs[Long]("top_word_n") == 1L)
    assert(r2.getAs[Boolean]("r_mean_len")) // 3*5=15 = sum(3*5)=15
    assert(r2.getAs[Boolean]("kept"))
  }

  test("thresholds flip exactly at the paper ratios") {
    val out = run(
      // exactly minWords=4 words of length 3 -> word count + mean len
      // sit ON both lower bounds
      10L -> "the and fox dog",
      // 3 words: below minWords
      11L -> "the and fox",
      // top word exactly 20% of 5 -> r_rep passes at equality
      12L -> "the zz and fox dog",
      // top word 2 of 5 -> 10 > 5 fails
      13L -> "the the and fox dog")
    assert(out(10L).getAs[Boolean]("r_word_count"))
    assert(out(10L).getAs[Boolean]("r_mean_len"))
    assert(!out(11L).getAs[Boolean]("r_word_count"))
    assert(out(12L).getAs[Boolean]("r_rep")) // 5*1 = 5 = n_words
    assert(!out(13L).getAs[Boolean]("r_rep")) // 5*2 = 10 > 5
  }

  test("empty and whitespace-only text survives with zero stats") {
    val out = run(20L -> "", 21L -> "   ")
    for (id <- Seq(20L, 21L)) {
      assert(out(id).getAs[Long]("n_words") == 0L)
      assert(out(id).getAs[Long]("top_word_n") == 0L)
      assert(!out(id).getAs[Boolean]("kept")) // fails word count
    }
  }
}
