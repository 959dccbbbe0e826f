package graft.ops

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Forces the DISTRIBUTED star contraction (localThreshold = 0) so
    * these suites keep exercising the scale path; the adaptive local
    * fast path is covered by its own equivalence test below. */
  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.connectedComponents(edges.toDF("id1", "id2"),
        localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference labelling: driver-side union-find. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // normalize every root to the component MINIMUM
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  test("chain graph contracts to the minimum label (worst case for propagation)") {
    val chain = (1L until 64L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got == (1L to 64L).map(_ -> 1L).toMap)
  }

  test("disjoint components keep separate labels; self-pairs and dups tolerated") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L), (21L, 20L), (30L, 30L), (10L, 11L))
    val got = run(edges)
    assert(got(10L) == 10L && got(11L) == 10L && got(12L) == 10L)
    assert(got(20L) == 20L && got(21L) == 20L)
    // a pure self-pair carries no edge: node 30 does not appear
    assert(!got.contains(30L))
  }

  test("matches union-find on seeded random graphs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 300).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
        .filter { case (a, b) => a != b }
      assert(run(edges) == unionFind(edges), s"seed $seed")
    }
  }

  test("fractional node ids are rejected; int ids cast up cleanly") {
    // double/decimal ids would cast('long')-truncate: 1.2 and 1.7 merge
    // into node 1 — reject at the door instead
    val frac = Seq((1.2, 1.7)).toDF("id1", "id2")
    val ex = intercept[IllegalArgumentException] {
      ConnectedComponents.connectedComponents(frac)
    }
    assert(ex.getMessage.contains("integral"))
    val ok = ConnectedComponents.connectedComponents(
        Seq((1, 2), (2, 3)).toDF("id1", "id2"), localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("adaptive local fast path equals distributed contraction; telemetry fires distributed-only") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 500).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("id1", "id2")
    val rounds = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    val local = ConnectedComponents.connectedComponents(df,
        onRound = (i, n) => rounds += ((i, n)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rounds.isEmpty, "small graph must take the local path — no rounds run")
    val dist = ConnectedComponents.connectedComponents(df,
        onRound = (i, n) => rounds += ((i, n)), localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
    assert(local == unionFind(edges))
    assert(rounds.nonEmpty, "distributed contraction reports per-round telemetry")
    assert(rounds.map(_._1).toList == (1 to rounds.size).toList)
    assert(rounds.forall(_._2 > 0))

    // mid-contraction switch: a threshold between the round-1 edge
    // count and the initial count makes round 1 run distributed, then
    // the geometric collapse hands the rest to the driver union-find —
    // identical labels, exactly one telemetry round
    val afterRound1 = rounds.head._2
    val midRounds = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    val mid = ConnectedComponents.connectedComponents(df,
        onRound = (i, n) => midRounds += ((i, n)), localThreshold = afterRound1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mid == dist, "mid-contraction local finish must match")
    assert(midRounds.size < rounds.size,
      s"switch must cut rounds: ${midRounds.size} vs ${rounds.size}")
  }

  test("updateComponents: incremental batches converge to the batch answer") {
    val rnd = new scala.util.Random(13)
    val edges = (1 to 400).map(_ => (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter { case (a, b) => a != b }
    val (h1, h2) = edges.partition { case (a, b) => (a + b) % 2 == 0 }
    val full = ConnectedComponents.connectedComponents(edges.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val labels0 = ConnectedComponents.connectedComponents(h1.toDF("id1", "id2"))
    val updated = ConnectedComponents.updateComponents(labels0, h2.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every node of the full graph is labelled identically
    assert(full.forall { case (id, c) => updated.get(id).contains(c) },
      "incremental labelling must match the batch labelling")
    // chain-merge case: two components joined ONLY by the new batch
    val chainLabels = ConnectedComponents.connectedComponents(
      Seq((1L, 2L), (10L, 11L)).toDF("id1", "id2"))
    val merged = ConnectedComponents.updateComponents(chainLabels,
        Seq((2L, 10L)).toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L))
    // singleton preservation: a self-labelled id untouched by the batch
    val single = ConnectedComponents.updateComponents(
        Seq((7L, 7L)).toDF("id", "component"),
        Seq((1L, 2L)).toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(single == Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
  }
}
