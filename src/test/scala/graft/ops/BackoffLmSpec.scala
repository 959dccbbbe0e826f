package graft.ops

import graft.SparkSpec

/** Stupid-backoff scoring gate: every tier of the backoff chain
  * (trigram / bigram / unigram / OOV floor) hit by a hand-computed
  * fixture, plus the short-document zero case. */
class BackoffLmSpec extends SparkSpec {
  import spark.implicits._

  // reference "a b c a b d": n3(abc)=1, ctx(ab)=2; n2(ab)=2; n1(a)=2,
  // N=6 — each scored doc isolates one backoff tier
  private val ref = Seq((100L, "a b c a b d")).toDF("doc_id", "text")
  private val a = 0.4

  private def scores(docs: (Long, String)*): Map[Long, (Long, Double)] =
    TextAnalysis.stupidBackoffScores(docs.toDF("doc_id", "text"), ref)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("each backoff tier scores as hand-computed") {
    val out = scores(
      1L -> "a b c x", // ln(1/2) + OOV ln(a²/6)   (trigram, then floor)
      2L -> "x a b",   // bigram tier: ln(a·n2(ab)/n1(a)) = ln(a·2/2)
      3L -> "x y a",   // unigram tier: ln(a²·n1(a)/6)
      4L -> "a b")     // no trigrams
    assert(out(1L)._1 == 2L)
    assert(out(1L)._2 == r6(math.log(1.0 / 2) + math.log(a * a / 6)))
    assert(out(2L)._1 == 1L)
    assert(out(2L)._2 == r6(math.log(a * 2 / 2.0)))
    assert(out(3L)._2 == r6(math.log(a * a * 2 / 6.0)))
    assert(out(4L) == ((0L, 0.0)))
  }

  test("reference documents score their own trigram probabilities") {
    // "c a b": n3(cab)=1, ctx(ca)=1 -> ln(1) = 0
    val out = scores(5L -> "c a b")
    assert(out(5L) == ((1L, 0.0)))
  }

  test("higher reference overlap scores higher") {
    val out = scores(6L -> "a b c a b d", 7L -> "q w e r t y")
    assert(out(6L)._2 > out(7L)._2)
  }
}
