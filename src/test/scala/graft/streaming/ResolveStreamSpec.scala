package graft.streaming

import graft.SparkSpec
import graft.model.{PayloadRetrievabilityState => St}
import ResolveStream._

class ResolveStreamSpec extends SparkSpec {

  val day: Long = 24L * 60 * 60 * 1000
  val t0 = 1700000000000L

  test("pure transitions mirror the reference state machine exactly") {
    val init = DealResolveState(St.NotQueried, None, None)
    // found on first try
    assert(transition(init, ResolveAttempt("k", Some("bafy"), t0))
      .contains(DealResolveState(St.Resolved, Some("bafy"), Some(t0))))
    // miss, miss-after-gate, then terminal
    val u1 = transition(init, ResolveAttempt("k", None, t0)).get
    assert(u1.state == St.Unresolved)
    // within 3 days: gated, no transition
    assert(transition(u1, ResolveAttempt("k", None, t0 + day)).isEmpty)
    assert(transition(u1, ResolveAttempt("k", Some("bafy"), t0 + day)).isEmpty)
    // after 3 days, second miss → terminal
    val u2 = transition(u1, ResolveAttempt("k", None, t0 + 4 * day)).get
    assert(u2.state == St.TerminallyUnretrievable)
    // terminal states never transition
    assert(transition(u2, ResolveAttempt("k", Some("bafy"), t0 + 30 * day)).isEmpty)
    val res = DealResolveState(St.Resolved, Some("x"), Some(t0))
    assert(transition(res, ResolveAttempt("k", None, t0 + 30 * day)).isEmpty)
    // unresolved deal resolved on a later retry
    val u3 = transition(u1, ResolveAttempt("k", Some("bafy"), t0 + 4 * day)).get
    assert(u3.state == St.Resolved && u3.payloadCid.contains("bafy"))
  }

  test("flatMapGroupsWithState applies ordered attempts per key") {
    import spark.implicits._
    val attempts = Seq(
      // key A: miss, gated retry (ignored), late miss → terminal
      ResolveAttempt("A", None, t0),
      ResolveAttempt("A", None, t0 + day),
      ResolveAttempt("A", None, t0 + 4 * day),
      // key B: found immediately
      ResolveAttempt("B", Some("bafyB"), t0),
      // key C: miss then found after the gate
      ResolveAttempt("C", None, t0),
      ResolveAttempt("C", Some("bafyC"), t0 + 5 * day)
    ).toDS()
    val updates = ResolveStream(attempts).collect()
      .groupBy(_.dealKey).view.mapValues(_.sortBy(_.lastAttemptMs).toList).toMap

    assert(updates("A").map(_.state) ==
      List(St.Unresolved, St.TerminallyUnretrievable))
    assert(updates("B").map(_.state) == List(St.Resolved))
    assert(updates("C").map(_.state) == List(St.Unresolved, St.Resolved))
    assert(updates("C").last.payloadCid.contains("bafyC"))
  }
}
