package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the step that turns
  * near-dup PAIRS (n-gram Jaccard, MinHash, SimHash, embedding cosine)
  * into dedup CLUSTERS, so "keep one representative per cluster" is one
  * more groupBy.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC '14) — the
  * published shuffle-only formulation that converges in O(log² n)
  * rounds on any graph shape (min-label propagation needs O(diameter)
  * rounds, which a 100 TB chain-shaped dup graph cannot afford).
  *
  * Scale design: each round is two min-aggregations and two joins on
  * the edge relation — never a `collect_set` of a node's adjacency, so
  * a hot node (a boilerplate document paired with millions) never
  * materializes its neighbor list in one task; the edge relation stays
  * hash-partitioned by node throughout. Convergence is detected by an
  * order-insensitive (count, sum-of-hash) checksum — one tiny agg per
  * round, no edge-set diff join. Each round the edge set is
  * `localCheckpoint`ed: caching alone is NOT enough for an iterative
  * plan — every round's logical plan references the previous round's
  * several times (sym + both stars), so without lineage truncation the
  * analyzer re-walks an exponentially growing tree and the job stalls
  * long before the data does. (A production deployment on unreliable
  * executors would use reliable `checkpoint` to durable storage
  * instead; same call site.)
  */
object ConnectedComponents {

  /** Both directions of an edge relation, duplicates kept — the stars'
    * min-aggregations are duplicate-insensitive, so the mid-round
    * symmetrization skips the distinct (one less shuffle per round). */
  private def symAll(e: DataFrame): DataFrame =
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))

  /** ORIENTED canonical form: one row per undirected edge, src > dst.
    * The edge relation is carried oriented between rounds — the
    * symmetric closure is recovered by `symAll` (a union, no shuffle)
    * exactly where a star needs both directions, while every
    * per-round SHUFFLE (the dedup distinct, the checkpoint
    * materialization, the convergence checksum) moves half the rows of
    * the symmetric form. Both star outputs already satisfy src > dst
    * (large-star points larger nodes at minima, small-star points
    * smaller neighbors at a yet-smaller minimum), so the
    * least/greatest projection is a no-op there in practice — kept for
    * the invariant, it costs one codegen'd map-side projection. */
  private def orient(e: DataFrame): DataFrame =
    e.select(greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst")).distinct()

  /** Large-star: every node u points its LARGER neighbors at
    * m(u) = min(N(u) ∪ {u}). */
  private def largeStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src"), least(col("src"), col("mn")).as("m"))
    e.join(m, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** Small-star: every node u points its SMALLER neighbors (and itself)
    * at m(u) = min of those neighbors. */
  private def smallStar(e: DataFrame): DataFrame = {
    val small = e.filter(col("dst") < col("src"))
    val m = small.groupBy("src").agg(min("dst").as("m"))
    val leaves = small.join(m, "src")
      .filter(col("dst") =!= col("m"))
      .select(col("dst").as("src"), col("m").as("dst"))
    val self = m.select(col("src"), col("m").as("dst"))
    leaves.union(self)
  }

  /** Component label (= the component's minimum node id) for every node
    * that appears in `edges`. Output columns: (id, component).
    *
    * @param edges pair relation; self-pairs and duplicates tolerated
    * @param maxIter hard cap — hitting it throws rather than returning
    *   a half-contracted labelling. The default covers the ~2·log₂ n
    *   rounds seen in practice with a wide margin (n = 2^30 ⇒ ~60);
    *   the PROVEN worst-case bound is O(log² n), so an adversarially
    *   deep graph may need the cap raised — the exception says so
    *   rather than guessing.
    * @param onRound telemetry hook, called after every contraction round
    *   with (round, canonical UNDIRECTED edge count — one per edge, not
    *   per direction) — the count is the checksum's own aggregate, so
    *   observing convergence costs nothing extra. A
    *   100 TB run wires this to its metrics sink; a stalling contraction
    *   is visible long before maxIter throws.
    * @param localThreshold adaptive small-graph fast path: when the
    *   canonical UNDIRECTED edge count (known from the first checksum,
    *   before any round runs) is at or under this bound, solve with one
    *   collect + union-find on the driver instead of paying ~4 Spark
    *   jobs × O(log n) rounds of scheduler floor. Same contract as
    *   Spark's own broadcast-join threshold: a deliberately bounded
    *   driver materialization (16 bytes/edge ⇒ ≤ ~8 MB at the default
    *   2¹⁹) that removes the fixed cost exactly where distribution
    *   buys nothing. The default is 2¹⁹ UNDIRECTED edges — the same
    *   effective bound the pre-oriented code's 2²⁰ symmetric-row
    *   threshold admitted, and safely under the ~1e6-edge crossover
    *   where the driver union-find's boxed-Long HashMap starts losing
    *   to distributed contraction (CcProfile evidence in BENCH_NOTES).
    *   A near-dup edge set is tiny relative to its corpus —
    *   at 100 TB the pair GENERATION is the distributed workload, and
    *   whichever side of this bound its output lands on gets the right
    *   execution. Set to 0 to force distributed contraction.
    */
  def connectedComponents(
      edges: DataFrame,
      idCol1: String = "id1",
      idCol2: String = "id2",
      maxIter: Int = 100,
      onRound: (Int, Long) => Unit = (_, _) => (),
      localThreshold: Long = 1L << 19): DataFrame = {
    // labels are MIN node ids, so ids must be genuinely INTEGRAL — a
    // string id would ANSI-throw in the cast below, and a fractional
    // type (double/decimal) would silently truncate, merging distinct
    // node ids (1.2 and 1.7 → 1); callers bridge via xxhash64 first
    Seq(idCol1, idCol2).foreach { c =>
      val ok = edges.schema(c).dataType match {
        case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
        case _ => false
      }
      require(ok,
        s"connectedComponents needs integral node ids; '$c' is " +
          s"${edges.schema(c).dataType.simpleString} — hash string keys " +
          "to long (e.g. xxhash64), and never use fractional ids " +
          "(cast('long') would silently truncate distinct ids together)")
    }
    var e = orient(
      edges.select(col(idCol1).cast("long").as("src"), col(idCol2).cast("long").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .filter(col("src") =!= col("dst")))
      .localCheckpoint(true)

    def checksum(df: DataFrame): (Long, Long) = {
      // mod keeps each addend under 2^30 so the ANSI-mode sum stays
      // exact (no overflow) up to ~2^33 edges; order-insensitive,
      // paired with the exact count
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("src"), col("dst")) % 1000000007L)).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var prevSum = checksum(e)
    if (prevSum._1 <= localThreshold)
      return localUnionFind(e)
    var iter = 0
    var converged = false
    while (!converged) {
      iter += 1
      if (iter > maxIter)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds — " +
            "still contracting; re-run with a larger maxIter")
      // eager localCheckpoint: materializes the round AND truncates the
      // logical plan so the next round starts from a leaf relation
      val next = orient(smallStar(symAll(largeStar(symAll(e))))).localCheckpoint(true)
      val nextSum = checksum(next)
      onRound(iter, nextSum._1)
      // adaptive mid-contraction switch: star rounds collapse the edge
      // set geometrically (a 4.4M-edge near-dup graph drops to ~100k
      // after ONE round — CcProfile), so the later rounds pay ~4 Spark
      // jobs of scheduler floor to move kilobytes. Each round preserves
      // connectivity and the non-isolated node set exactly, so finishing
      // under the same bound with the driver union-find is the identical
      // labelling at a fraction of the fixed cost. localThreshold=0
      // still forces every round distributed (spec hook).
      if (nextSum._1 <= localThreshold)
        return localUnionFind(next)
      // the checksum is probabilistic (a collision between two DISTINCT
      // successive edge sets would stop the contraction half-done), so a
      // checksum match is only the trigger: confirm with one exact
      // containment check. Counts are exact and equal at this point, so
      // next ⊆ e ⟺ next == e — one except(), paid once per run (plus
      // once per collision, which at ~2⁻³⁰ per round never happens).
      converged = nextSum == prevSum && next.except(e).isEmpty
      e = next // previous round's checkpoint RDD is released by the ContextCleaner
      prevSum = nextSum
    }
    // final star over the symmetric closure: every non-min node has its
    // component min as a smaller neighbor; the min node maps to itself
    // (it appears only as `dst` in the oriented set, so the
    // symmetrization here is what gives it a row)
    val out = symAll(e).groupBy("src").agg(min("dst").as("mn"))
      .select(col("src").as("id"), least(col("src"), col("mn")).as("component"))
    out
  }

  /** INCREMENTAL component maintenance — fold a batch of NEW pairs into
    * an existing labelling without re-reading the historical pair set.
    * A labelling IS a spanning star of its graph (id → component), so
    * contracting (labels-as-edges ∪ new pairs) yields exactly the
    * components of (history ∪ batch): the relational form of union-find
    * "union by existing roots". Cost scales with |labels| + |batch|,
    * never with the historical pair count — the property a streaming
    * dedup pipeline needs when clusters accrete across weeks of ticks.
    * Labels relabel downward only (merged components take the overall
    * minimum, consistent with [[connectedComponents]]).
    *
    * Output covers every id seen in `labels` OR the batch; singleton
    * components (self-labelled, untouched by the batch) are preserved.
    *
    * Iterative callers (a tick loop folding batch after batch) must
    * `localCheckpoint` the returned labelling between ticks: each
    * output's logical plan nests its input's, and without lineage
    * truncation the analyzer re-walks an exponentially growing tree —
    * the same pathology the contraction loop checkpoints away
    * (measured in the ScaleRehearsal CC_TICK leg: 1.5→72 s/tick with
    * persist alone, flat with checkpoint). */
  def updateComponents(
      labels: DataFrame,
      newEdges: DataFrame,
      idCol1: String = "id1",
      idCol2: String = "id2",
      localThreshold: Long = 1L << 19): DataFrame = {
    val le = labels.select(col("id").cast("long").as("id1"),
      col("component").cast("long").as("id2"))
    val ne = newEdges.select(col(idCol1).cast("long").as("id1"),
      col(idCol2).cast("long").as("id2"))
    val cc = connectedComponents(le.union(ne), "id1", "id2",
      localThreshold = localThreshold)
    // self-labelled singletons fall out of the edge-only contraction
    // (self-pairs are filtered at entry); restore them, plus any
    // batch-side self-pairs introducing genuinely new singleton ids.
    // labels' component column rides along too: connectedComponents-
    // produced labellings are self-covering (every component value is
    // also an id), but a caller-supplied labelling need not be — and
    // a component-only node must survive into the output rather than
    // silently vanish.
    val ids = labels.select(col("id"))
      .union(labels.select(col("component").as("id")))
      .union(ne.select(col("id1").as("id")))
      .union(ne.select(col("id2").as("id")))
      .distinct()
    ids.join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Small-graph solve: path-halving union-find over the collected edge
    * list, labels = component minima (identical semantics to the star
    * contraction). Bounded by `localThreshold` at the call site. */
  private def localUnionFind(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val pairs = e.select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = new scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) {
        val p = parent(r)
        parent(r) = parent.getOrElse(p, p) // path halving
        r = parent(r)
      }
      r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      // union by MIN root so the final label is the component minimum
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val rows = parent.keysIterator.map(id => (id, find(id))).toSeq
    import spark.implicits._
    rows.toDF("id", "component")
  }
}
