package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming token-budget sequence packing: the close-on-overflow greedy
  * packer ([[graft.ops.Corpus.greedyPack]]) as a stateful streaming
  * operator, so a corpus can be packed INCREMENTALLY as documents land
  * instead of re-running a batch layout over the whole table.
  *
  * Greedy bin state is one `(pack, fill)` pair per stratum —
  * `flatMapGroupsWithState` keyed by stratum keeps exactly that in the
  * state store, so the operator scales to any number of strata (state
  * is O(strata), never O(documents)) and a restart resumes packing from
  * the checkpoint without touching already-packed output.
  *
  * Determinism contract: documents pack in (micro-batch, doc_id) order —
  * within a batch each stratum's group is sorted by id (bounded by the
  * micro-batch, not the corpus), across batches by arrival. A pack never
  * exceeds `budgetTokens` except a single over-budget document, which
  * gets a pack to itself — identical invariants to the batch operator,
  * verified by the equivalence spec.
  */
object PackingStream {

  /** One document arriving on the stream. */
  final case class PackDoc(doc_id: Long, stratum: String, n_tok: Long)

  /** The document's assigned slot, emitted exactly once on arrival. */
  final case class PackedDoc(
      doc_id: Long, stratum: String, pack_id: Long, pack_offset: Long)

  /** Per-stratum packer state: the open pack and its fill. */
  final case class PackState(pack: Long, fill: Long)

  private def packGroup(
      stratum: String,
      docs: Iterator[PackDoc],
      state: GroupState[PackState],
      budgetTokens: Int): Iterator[PackedDoc] = {
    var st = state.getOption.getOrElse(PackState(0L, 0L))
    // sort within the micro-batch for a deterministic layout; the buffer
    // is bounded by the batch, never the corpus
    val out = docs.toArray.sortBy(_.doc_id).map { d =>
      if (st.fill > 0 && st.fill + d.n_tok > budgetTokens)
        st = PackState(st.pack + 1, 0L)
      val assigned = PackedDoc(d.doc_id, stratum, st.pack, st.fill)
      st = PackState(st.pack, st.fill + d.n_tok)
      assigned
    }
    state.update(st)
    out.iterator
  }

  /** Pack a document stream into token-budget sequences per stratum.
    * Append-mode output: each document's assignment is final when
    * emitted (greedy never revisits a closed pack). */
  def greedyPackStream(
      docs: Dataset[PackDoc], budgetTokens: Int): Dataset[PackedDoc] = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.stratum)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        packGroup(_, _, _, budgetTokens))
  }
}
