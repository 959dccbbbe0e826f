package graft.streaming

import graft.model.{PayloadRetrievabilityState => St}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The payload-retrievability state machine (ST6) as a stateful
  * streaming operator: `flatMapGroupsWithState` keyed by the deal's
  * natural key.
  *
  * The reference advances per-deal state in a polling loop with a 3-day
  * retry gate (backend/lib/resolve-payload-cids.js:40-52, gate at :20,
  * :64). The batch formulation (state.ResolvePayloadCids) matches those
  * semantics exactly; this operator is the Spark-native alternative for
  * a live deployment — per-key state lives in the state store instead of
  * being rescanned from the table each tick, so a 10^9-deal state table
  * never re-enters the plan.
  *
  * Transitions (identical to the batch path):
  *   found               → Resolved              (terminal)
  *   miss, 1st attempt   → Unresolved
  *   miss, 2nd attempt   → TerminallyUnretrievable (terminal)
  *   attempt within 3 days of the last          → ignored
  */
object ResolveStream {

  /** One lookup attempt arriving on the stream: the deal key, what the
    * piece indexer returned (None = miss), and the attempt time. */
  final case class ResolveAttempt(
      dealKey: String,
      payloadCid: Option[String],
      attemptAtMs: Long)

  /** Per-deal streaming state. */
  final case class DealResolveState(
      state: String,
      payloadCid: Option[String],
      lastAttemptMs: Option[Long])

  /** Emitted on every state change. */
  final case class ResolveUpdate(
      dealKey: String,
      state: String,
      payloadCid: Option[String],
      lastAttemptMs: Long)

  val ThreeDaysMs: Long = 3L * 24 * 60 * 60 * 1000

  /** Pure transition — unit-testable without Spark. */
  def transition(
      current: DealResolveState,
      attempt: ResolveAttempt): Option[DealResolveState] = {
    val terminal = current.state == St.Resolved ||
      current.state == St.TerminallyUnretrievable
    val gated = current.lastAttemptMs.exists(last =>
      attempt.attemptAtMs - last < ThreeDaysMs)
    if (terminal || gated) None
    else attempt.payloadCid match {
      case Some(cid) => Some(DealResolveState(
        St.Resolved, Some(cid), Some(attempt.attemptAtMs)))
      case None =>
        val next = if (current.lastAttemptMs.isDefined)
          St.TerminallyUnretrievable else St.Unresolved
        Some(DealResolveState(next, None, Some(attempt.attemptAtMs)))
    }
  }

  private def flatMapFunc(
      key: String,
      attempts: Iterator[ResolveAttempt],
      state: GroupState[DealResolveState]): Iterator[ResolveUpdate] = {
    var cur = state.getOption.getOrElse(
      DealResolveState(St.NotQueried, None, None))
    val out = Vector.newBuilder[ResolveUpdate]
    attempts.toSeq.sortBy(_.attemptAtMs).foreach { a =>
      transition(cur, a).foreach { next =>
        cur = next
        out += ResolveUpdate(key, next.state, next.payloadCid, a.attemptAtMs)
      }
    }
    state.update(cur)
    out.result().iterator
  }

  /** Wire the operator over a (possibly streaming) Dataset of attempts.
    * Works identically in batch mode — Spark runs flatMapGroupsWithState
    * over grouped data with transient state. */
  def apply(attempts: Dataset[ResolveAttempt]): Dataset[ResolveUpdate] = {
    implicit val stEnc = Encoders.product[DealResolveState]
    implicit val outEnc = Encoders.product[ResolveUpdate]
    implicit val strEnc = Encoders.STRING
    attempts
      .groupByKey(_.dealKey)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(flatMapFunc)
  }
}
