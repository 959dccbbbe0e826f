package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental near-dup on ingest: cross-batch detection, no history
  * re-pairing, agreement with the batch LSH sweep. */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))

  private val base = (0 until 40).map(i => s"w${i}x")
  // near-dup: 36/40 words shared → bigram Jaccard ≈ 0.8
  private val mutated = base.take(36) ++ Seq("q1", "q2", "q3", "q4")

  test("a near-dup arriving in a later batch is flagged against history, exactly once") {
    val store = java.nio.file.Files.createTempDirectory("dstore").toString
    val b1 = Seq(
      doc(1L, base),
      doc(2L, (100 until 140).map(i => s"z$i"))).toDF("doc_id", "text")
    val b2 = Seq(
      doc(3L, mutated),
      doc(4L, (200 until 240).map(i => s"y$i"))).toDF("doc_id", "text")

    val p1 = DedupStream.step(b1, store)
    assert(p1.count() == 0, "unrelated batch-1 docs must not pair")
    p1.unpersist()

    val p2rows = DedupStream.step(b2, store).collect()
    val p2 = p2rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 == Set((1L, 3L)), s"got ${p2.mkString(",")}")
    assert(p2rows.head.getDouble(2) >= 0.5)

    // batch 3 re-detects against BOTH history batches, but old×old
    // pairs (1,3) must not re-emit
    val b3 = Seq(doc(5L, base.take(38) ++ Seq("r1", "r2"))).toDF("doc_id", "text")
    val p3 = DedupStream.step(b3, store, batchTag = "b3").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p3 == Set((1L, 5L), (3L, 5L)), s"got ${p3.mkString(",")}")

    // REPLAY of batch 3 (same tag): store must not grow, pairs identical
    // — as a MULTISET (duplicate sig rows would duplicate pair rows)
    val sigsBefore = spark.read.parquet(s"$store/sigs/batch=b3").count()
    val replayRows = DedupStream.step(b3, store, batchTag = "b3").collect()
    assert(replayRows.length == p3.size, s"row multiset grew: ${replayRows.length}")
    val replay = replayRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay == p3, "replayed batch must emit the same pairs")
    assert(spark.read.parquet(s"$store/sigs/batch=b3").count() == sigsBefore,
      "replay must overwrite its own commit, not append duplicates")
    val allSigs = spark.read.parquet(s"$store/sigs").count()
    assert(allSigs == 5L, s"one signature row per doc, got $allSigs")
  }

  test("incremental sweep over split batches = batch sweep over the union") {
    val store = java.nio.file.Files.createTempDirectory("dstore2").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val inc1 = DedupStream.step(half1, store).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc2 = DedupStream.step(half2, store).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((inc1 & inc2).isEmpty, "a pair must emit in exactly one batch")

    val cfg = DedupStream.Config()
    val batchPairs = {
      val sigs = Dedup.minhashSignatures(
        Dedup.shingleHashes(docs, cfg.n),
        cfg.numHashes, cfg.seed)
      val cands = Dedup.lshCandidatePairs(sigs, cfg.numHashes, cfg.bands)
      val s1 = sigs.toDF(sigs.columns.map(c => if (c == "id") "id1" else s"a_$c"): _*)
      val s2 = sigs.toDF(sigs.columns.map(c => if (c == "id") "id2" else s"b_$c"): _*)
      val agree = (0 until cfg.numHashes)
        .map(i => when(col(s"a_mh_$i") === col(s"b_mh_$i"), 1).otherwise(0))
        .reduce(_ + _)
      cands.join(s1, "id1").join(s2, "id2")
        .withColumn("est", agree.cast("double") / cfg.numHashes)
        .filter(col("est") >= cfg.minAgree)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert((inc1 ++ inc2) == batchPairs,
      s"incremental=${(inc1 ++ inc2).size} batch=${batchPairs.size}")
    spark.catalog.clearCache()
  }

  test("incremental simhash: cross-batch detection, no old×old re-pairing, replay idempotent, batch-equivalent on the union") {
    val store = java.nio.file.Files.createTempDirectory("dsim").toString
    // 200-word base: simhash votes are sums over ~199 ±1 feature bits,
    // so a one-feature edit moves few bits (measured: drop-last → Hamming
    // 1, append-one → 2; their pair ≤ 3 by the Hamming triangle
    // inequality) — small docs flip too many near-zero votes for a
    // stable ≤3 fixture
    val base200 = (0 until 200).map(i => s"w${i}x")
    val b1 = Seq(
      doc(1L, base200),
      doc(2L, (1000 until 1200).map(i => s"z$i"))).toDF("doc_id", "text")
    val b2 = Seq(
      doc(3L, base200.dropRight(1)),
      doc(4L, (2000 until 2200).map(i => s"y$i"))).toDF("doc_id", "text")

    val p1 = DedupStream.simhashStep(b1, store)
    assert(p1.count() == 0, "unrelated batch-1 docs must not pair")
    p1.unpersist()
    val p2 = DedupStream.simhashStep(b2, store, batchTag = "b2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p2 == Set((1L, 3L)), s"got ${p2.mkString(",")}")

    // replay of batch 2: same pairs, store commit overwritten not grown
    val fpsBefore = spark.read.parquet(s"$store/fps/batch=b2").count()
    val replay = DedupStream.simhashStep(b2, store, batchTag = "b2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay == p2, "replayed batch must emit the same pairs")
    assert(spark.read.parquet(s"$store/fps/batch=b2").count() == fpsBefore)

    // batch 3 pairs with history but old×old never re-emits
    val b3 = Seq(doc(5L, base200 :+ "extra")).toDF("doc_id", "text")
    val p3 = DedupStream.simhashStep(b3, store, batchTag = "b3").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p3 == Set((1L, 5L), (3L, 5L)), s"got ${p3.mkString(",")}")

    // incremental union = one-shot batch sweep over all docs
    val all = b1.unionByName(b2).unionByName(b3)
    val batchPairs = Dedup.simhashPairs(Dedup.simhashPortable(all), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((p2 ++ p3) == batchPairs,
      s"incremental ${(p2 ++ p3).mkString(",")} != batch ${batchPairs.mkString(",")}")

    // a minhash store cannot be read as a simhash store (family marker)
    val mstore = java.nio.file.Files.createTempDirectory("dsim2").toString
    DedupStream.step(b1, mstore).unpersist()
    val ex = intercept[IllegalArgumentException](DedupStream.simhashStep(b2, mstore))
    assert(ex.getMessage.contains("parts/family"))
  }

  test("incremental exact dedup: cross-batch keeper, within-batch min id, replay idempotent, no old×old, family guard") {
    val store = java.nio.file.Files.createTempDirectory("estore").toString
    val b1 = Seq(
      doc(1L, base),
      doc(2L, (100 until 140).map(i => s"z$i"))).toDF("doc_id", "text")
    // 3 duplicates 1 (cross-batch); 5 and 4 duplicate each other
    // (within-batch → min id 4 keeps); 6 is fresh
    val b2 = Seq(
      doc(3L, base),
      doc(4L, (300 until 340).map(i => s"v$i")),
      doc(5L, (300 until 340).map(i => s"v$i")),
      doc(6L, (400 until 440).map(i => s"u$i"))).toDF("doc_id", "text")

    val p1 = DedupStream.exactStep(b1, store)
    assert(p1.count() == 0, "all batch-1 content is first-seen")
    p1.unpersist()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = pairs(DedupStream.exactStep(b2, store, batchTag = "b2"))
    assert(p2 == Set((3L, 1L), (5L, 4L)), s"got ${p2.mkString(",")}")

    // replay: identical output, commit overwritten not grown
    val before = spark.read.parquet(s"$store/hashes/batch=b2").count()
    val replay = pairs(DedupStream.exactStep(b2, store, batchTag = "b2"))
    assert(replay == p2, "replayed batch must emit the same keeper mapping")
    assert(spark.read.parquet(s"$store/hashes/batch=b2").count() == before,
      "replay must overwrite its own commit")
    // store state: one row per DISTINCT content, none for duplicates
    assert(spark.read.parquet(s"$store/hashes").count() == 4L)

    // batch 3: duplicate of batch-2 content keeps batch-2's WINNER as
    // keeper (arrival order, transitively stable); old×old never re-emits
    val b3 = Seq(doc(7L, (300 until 340).map(i => s"v$i"))).toDF("doc_id", "text")
    val p3 = pairs(DedupStream.exactStep(b3, store, batchTag = "b3"))
    assert(p3 == Set((7L, 4L)), s"got ${p3.mkString(",")}")

    // a minhash store cannot be read as an exact store (family marker)
    val mstore = java.nio.file.Files.createTempDirectory("estore2").toString
    DedupStream.step(b1, mstore).unpersist()
    val ex = intercept[IllegalArgumentException](DedupStream.exactStep(b2, mstore))
    assert(ex.getMessage.contains("parts/family"))
  }

  test("incremental span dedup: arrival order wins, replay idempotent, batch-equivalent on one batch") {
    val store = java.nio.file.Files.createTempDirectory("sstore").toString
    val b1 = Seq(
      (1L, (0 until 30).map(i => s"a$i").mkString(" ")),
      (2L, (0 until 30).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    // doc 3 repeats doc 1's first 20 words (spans 0 and 1) then fresh text
    val b2 = Seq(
      (3L, ((0 until 20).map(i => s"a$i") ++ (0 until 10).map(i => s"c$i")).mkString(" "))
    ).toDF("doc_id", "text")

    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val s1 = toMap(DedupStream.spanStep(b1, store, batchTag = "b1").collect())
    // single-batch incremental == the batch operator on the same input
    val batchRef = graft.ops.Dedup.spanDedup(b1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(s1 == batchRef)
    assert(s1(1L) == ((3L, 3L, s1(1L)._3)))

    val s2 = toMap(DedupStream.spanStep(b2, store, batchTag = "b2").collect())
    // spans 0-1 of doc 3 are duplicates of batch-1 history; span 2 is new
    assert(s2(3L)._1 == 3L, "three spans total")
    assert(s2(3L)._2 == 1L, s"only the fresh span is kept, got ${s2(3L)}")

    // replay of batch 2: same stats, store unchanged
    val replay = toMap(DedupStream.spanStep(b2, store, batchTag = "b2").collect())
    assert(replay == s2)
    val stored = spark.read.parquet(s"$store/spans").count()
    // 3 spans/doc x 2 docs in b1 + 1 fresh span in b2
    assert(stored == 7L, s"span store rows: $stored")
  }

  test("history reads prune to the batch's key partitions (poisoned foreign partitions never opened)") {
    import java.nio.file.{Files, Paths}
    val store = Files.createTempDirectory("dprune").toString
    val b1 = Seq(
      doc(1L, base),
      doc(2L, (100 until 140).map(i => s"z$i"))).toDF("doc_id", "text")
    DedupStream.step(b1, store, batchTag = "b1").unpersist()

    val cfg = DedupStream.Config()
    val b2 = Seq(doc(3L, mutated)).toDF("doc_id", "text")
    // batch 2's bucket-partition set, via the operator's own hash chain
    val sigs2 = Dedup.minhashSignatures(
      Dedup.shingleHashes(b2, cfg.n),
      cfg.numHashes, cfg.seed)
    val pb2 = Dedup.bandBuckets(sigs2, cfg.numHashes, cfg.bands)
      .select(pmod(xxhash64(col("band"), col("bucket")), lit(cfg.storeParts.toLong))
        .cast("int").as("pb"))
      .distinct().collect().map(_.getInt(0)).toSet

    // poison every bucket partition batch 2 cannot touch: an unpruned
    // read would hit the junk file and fail on a missing parquet footer
    val foreign = new java.io.File(s"$store/buckets/batch=b1").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("pb="))
      .filterNot(d => pb2.contains(d.getName.stripPrefix("pb=").toInt))
    assert(foreign.nonEmpty, "need at least one bucket partition foreign to batch 2")
    foreign.foreach(d =>
      Files.write(Paths.get(d.getPath, "part-poison.parquet"), "not parquet".getBytes))
    // signature partitions prune to CANDIDATE ids {1,3} (ps = id mod 64):
    // doc 2's ps=2 partition must never be opened
    Files.write(Paths.get(s"$store/sigs/batch=b1/ps=2", "part-poison.parquet"),
      "not parquet".getBytes)

    val pairs = DedupStream.step(b2, store, batchTag = "b2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)), s"got ${pairs.mkString(",")}")
  }

  test("compaction folds history into one commit; answers, pruning and manifest authority hold") {
    import java.nio.file.{Files, Paths}
    val store = Files.createTempDirectory("dcompact").toString
    val b1 = Seq(
      doc(1L, base),
      doc(2L, (100 until 140).map(i => s"z$i"))).toDF("doc_id", "text")
    val b2 = Seq(
      doc(3L, mutated),
      doc(4L, (200 until 240).map(i => s"y$i"))).toDF("doc_id", "text")
    DedupStream.step(b1, store, batchTag = "b1").unpersist()
    DedupStream.step(b2, store, batchTag = "b2").unpersist()

    DedupStream.compact(spark, store, gcGraceMs = 0L)
    Seq("buckets", "sigs").foreach { sub =>
      val commits = new java.io.File(s"$store/$sub").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      assert(commits.length == 1 && commits.head.getName.startsWith("batch=compact-"),
        s"$sub: ${commits.map(_.getName).mkString(",")}")
    }

    // the manifest is authoritative: a stray un-published dir full of
    // junk must be invisible to readers
    val stray = new java.io.File(s"$store/sigs/batch=stray"); stray.mkdirs()
    Files.write(Paths.get(stray.getPath, "junk.parquet"), "not parquet".getBytes)

    // pruning survives compaction: candidate ids for batch 3 are
    // {1,3,5} (ps = id mod 64) — doc 2/4's partitions stay unopened
    Seq(2, 4).foreach { ps =>
      val dir = new java.io.File(s"$store/sigs").listFiles()
        .filter(_.getName.startsWith("batch=compact-")).head
      Files.write(Paths.get(s"${dir.getPath}/ps=$ps", "poison.parquet"),
        "not parquet".getBytes)
    }

    // detection against the FOLDED history: doc 5 near-dups 1 and 3
    val b3 = Seq(doc(5L, base.take(38) ++ Seq("r1", "r2"))).toDF("doc_id", "text")
    val p3 = DedupStream.step(b3, store, batchTag = "b3").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p3 == Set((1L, 5L), (3L, 5L)), s"got ${p3.mkString(",")}")

    // compaction itself reads every partition (it is the full fold) —
    // clear the pruning poison before folding again
    Seq(2, 4).foreach { ps =>
      val dir = new java.io.File(s"$store/sigs").listFiles()
        .filter(_.getName.startsWith("batch=compact-")).head
      Files.delete(Paths.get(s"${dir.getPath}/ps=$ps", "poison.parquet"))
    }
    // a second compaction folds the post-compaction commit in too,
    // and its GC sweep collects the un-manifested stray dir
    DedupStream.compact(spark, store, gcGraceMs = 0L)
    val after = new java.io.File(s"$store/buckets").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(after.length == 1)
    assert(!stray.exists(), "GC must collect dirs the manifest does not list")
    val p4 = DedupStream.step(
        Seq(doc(6L, (300 until 340).map(i => s"q$i"))).toDF("doc_id", "text"),
        store, batchTag = "b4")
      .collect()
    assert(p4.isEmpty, "unrelated doc must not pair against compacted history")

    // checkpoint rollback: a batch REPLAYED after its commit was folded
    // must emit the same pairs, and its rewritten dirs must stay
    // invisible (re-publishing would double its rows beside the
    // compacted copy — the folded ledger suppresses exactly that)
    // (the replay also re-finds (3,5): doc 5 entered the store after
    // b2's original run, and a rollback-behind-the-store replay always
    // sees later docs as history — pre-existing rollback semantics,
    // orthogonal to compaction)
    val replayRows = DedupStream.step(b2, store, batchTag = "b2").collect()
    val replay = replayRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay.contains((1L, 3L)) && replayRows.length == replay.size,
      s"got ${replayRows.mkString(",")}")
    val p5 = DedupStream.step(
        Seq(doc(7L, base.take(37) ++ Seq("s1", "s2", "s3"))).toDF("doc_id", "text"),
        store, batchTag = "b5").collect()
    // doc 7 near-dups 1, 3, 5; each pair exactly ONCE (a resurrected
    // b2 commit would duplicate the (3,7) row via doubled signatures)
    assert(p5.map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        == Seq((1L, 7L), (3L, 7L), (5L, 7L)),
      s"got ${p5.mkString(",")}")
  }

  test("span replay after compaction keeps its original stats") {
    import java.nio.file.Files
    val store = Files.createTempDirectory("scompact").toString
    val b1 = Seq(
      (1L, (0 until 30).map(i => s"a$i").mkString(" ")),
      (2L, (0 until 30).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    val b2 = Seq(
      (3L, ((0 until 20).map(i => s"a$i") ++ (0 until 10).map(i => s"c$i")).mkString(" "))
    ).toDF("doc_id", "text")
    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    DedupStream.spanStep(b1, store, batchTag = "s1").unpersist()
    val orig = toMap(DedupStream.spanStep(b2, store, batchTag = "s2").collect())

    DedupStream.compact(spark, store)
    // rollback-behind-compaction: the batch's own claims now live in
    // the folded commit; replay must re-claim them, not zero out
    val replay = toMap(DedupStream.spanStep(b2, store, batchTag = "s2").collect())
    assert(replay == orig, s"replay $replay != original $orig")
    // and a later batch still dedups against the folded history
    val b3 = Seq((4L, (0 until 10).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val s3 = toMap(DedupStream.spanStep(b3, store, batchTag = "s3").collect())
    assert(s3(4L) == ((1L, 0L, 0L)), s"doc 3's span must stay claimed: ${s3(4L)}")
  }

  test("incremental exact-substring: batch-equivalent on one batch, unaligned cross-batch spans, arrival order, replay idempotent") {
    val store = java.nio.file.Files.createTempDirectory("substr").toString
    val w1 = (0 until 30).map(i => s"a$i")
    def spanSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // single batch over the whole input == the batch operator exactly
    val b1 = Seq(
      (1L, w1.mkString(" ")),
      (2L, ((0 until 3).map(i => s"x$i") ++ w1.slice(5, 20)).mkString(" "))
    ).toDF("doc_id", "text")
    val inc1 = spanSet(DedupStream.substrStep(b1, store, batchTag = "s1").collect())
    val ref = spanSet(graft.ops.Dedup.exactSubstrSpans(b1).collect())
    assert(inc1 == ref && inc1 == Set((2L, 4L, 18L, 6L)), s"got $inc1 vs $ref")

    // cross-batch at an UNALIGNED offset: doc 9's tokens 8..17 copy
    // doc 1's a10..a19 (batch-1 history), one stride-1 window at p=8
    val b2 = Seq(
      (9L, ((0 until 7).map(i => s"y$i") ++ w1.slice(10, 20) ++
        (0 until 5).map(i => s"z$i")).mkString(" "))).toDF("doc_id", "text")
    val inc2 = spanSet(DedupStream.substrStep(b2, store, batchTag = "s2").collect())
    assert(inc2 == Set((9L, 8L, 17L, 1L)), s"got $inc2")

    // arrival order wins: a LOWER id arriving later still dedups
    // against the earlier higher-id history (re-crawl semantics)
    val b3 = Seq((0L, w1.mkString(" "))).toDF("doc_id", "text")
    val inc3 = spanSet(DedupStream.substrStep(b3, store, batchTag = "s3").collect())
    assert(inc3 == Set((0L, 1L, 30L, 21L)), s"got $inc3")

    // replay of batch 2 (same tag): identical spans, store unchanged
    val before = spark.read.parquet(s"$store/wins").count()
    val replay = spanSet(DedupStream.substrStep(b2, store, batchTag = "s2").collect())
    assert(replay == inc2)
    assert(spark.read.parquet(s"$store/wins").count() == before,
      "replay must overwrite its own commit, not append")

    // compaction folds the wins store without changing answers
    DedupStream.compact(spark, store)
    val b4 = Seq((20L, w1.slice(0, 12).mkString(" "))).toDF("doc_id", "text")
    val inc4 = spanSet(DedupStream.substrStep(b4, store, batchTag = "s4").collect())
    assert(inc4 == Set((20L, 1L, 12L, 3L)), s"got $inc4")
  }

  test("substrStep: shuffle-semi fallback tier equals the broadcast tier; a recurring doc id cannot inflate later spans") {
    val w1 = (0 until 30).map(i => s"a$i")
    def spanSet(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // two identical stores; one tick forced onto the fallback tier
    // (prefilterBroadcastLimit below the batch's distinct hash count):
    // the history prefilter degrades from broadcast to a SHUFFLE
    // semi-join, never to an unfiltered store scan — answers identical
    val sA = java.nio.file.Files.createTempDirectory("substrA").toString
    val sB = java.nio.file.Files.createTempDirectory("substrB").toString
    val b1 = Seq((1L, w1.mkString(" "))).toDF("doc_id", "text")
    val b2 = Seq(
      (9L, ((0 until 7).map(i => s"y$i") ++ w1.slice(10, 20)).mkString(" "))
    ).toDF("doc_id", "text")
    DedupStream.substrStep(b1, sA, batchTag = "s1").unpersist()
    DedupStream.substrStep(b1, sB, batchTag = "s1").unpersist()
    val broadcastTier = spanSet(DedupStream.substrStep(b2, sA, batchTag = "s2").collect())
    val fallbackTier = spanSet(DedupStream.substrStep(
      b2, sB, batchTag = "s2", prefilterBroadcastLimit = 1L).collect())
    assert(fallbackTier == broadcastTier && fallbackTier == Set((9L, 8L, 17L, 1L)),
      s"got fallback=$fallbackTier broadcast=$broadcastTier")

    // a doc id genuinely recurring in a LATER batch folds its hashes a
    // second time with the same keeper (the replay rule drops its own
    // history, so the windows look new) — duplicate (h, keeper) store
    // rows are thus legal, and must not multiply marked rows in later
    // ticks (the mark join is against DISTINCT history hashes)
    assert(DedupStream.substrStep(b1, sA, batchTag = "s3").collect().isEmpty,
      "a recurring doc dedups against nothing but itself")
    val b4 = Seq((7L, w1.mkString(" "))).toDF("doc_id", "text")
    val s4 = spanSet(DedupStream.substrStep(b4, sA, batchTag = "s4").collect())
    assert(s4 == Set((7L, 1L, 30L, 21L)),
      s"duplicate store rows must not inflate n_windows: $s4")
  }

  test("first compaction adopts only _SUCCESS commits; a crashed partial write is GC'd and replay restores it") {
    val store = java.nio.file.Files.createTempDirectory("dadopt").toString
    val b1 = Seq(
      doc(1L, base),
      doc(2L, (100 until 140).map(i => s"z$i"))).toDF("doc_id", "text")
    val b1b = Seq(doc(5L, (500 until 540).map(i => s"u$i"))).toDF("doc_id", "text")
    val b2 = Seq(doc(3L, (300 until 340).map(i => s"v$i"))).toDF("doc_id", "text")
    DedupStream.step(b1, store, batchTag = "b1").unpersist()
    DedupStream.step(b1b, store, batchTag = "b1b").unpersist()
    DedupStream.step(b2, store, batchTag = "b2").unpersist()

    // simulate b2's tick crashing mid-store-write: tasks committed some
    // files but the job never did — no _SUCCESS, data partitions missing
    val conf = spark.sparkContext.hadoopConfiguration
    Seq("buckets", "sigs").foreach { sub =>
      val p = new org.apache.hadoop.fs.Path(s"$store/$sub/batch=b2")
      val fs = p.getFileSystem(conf)
      fs.delete(new org.apache.hadoop.fs.Path(p, "_SUCCESS"), false)
      fs.listStatus(p).filter(_.isDirectory).foreach(s => fs.delete(s.getPath, true))
    }

    DedupStream.compact(spark, store)

    def names(sub: String, file: String): Set[String] = {
      val f = new java.io.File(s"$store/$sub/$file")
      if (!f.exists()) Set.empty
      else {
        val src = scala.io.Source.fromFile(f)
        try src.getLines().map(_.trim).filter(_.nonEmpty).toSet finally src.close()
      }
    }
    Seq("buckets", "sigs").foreach { sub =>
      // the partial dir must be neither adopted, nor marked folded
      // (folded would suppress the replay's rewrite forever), and the
      // GC sweep collects it once the manifest is in authority
      assert(!names(sub, "_MANIFEST").contains("batch=b2"), s"$sub adopted the partial commit")
      assert(!names(sub, "_FOLDED").contains("batch=b2"), s"$sub folded the partial commit")
      assert(!new java.io.File(s"$store/$sub/batch=b2").exists(),
        s"$sub: GC must collect the unadopted partial dir")
      assert(names(sub, "_FOLDED") == Set("batch=b1", "batch=b1b"),
        s"$sub: complete commits fold normally: ${names(sub, "_FOLDED")}")
    }

    // the checkpoint replay of batch 2 rewrites AND publishes cleanly
    assert(DedupStream.step(b2, store, batchTag = "b2").collect().isEmpty)
    Seq("buckets", "sigs").foreach { sub =>
      assert(names(sub, "_MANIFEST").contains("batch=b2"),
        s"$sub: replayed commit must become visible again") }

    // and doc 3's history is fully restored: a near-dup pairs against it
    val b3 = Seq(doc(4L, (300 until 336).map(i => s"v$i") ++ Seq("q1", "q2", "q3", "q4")))
      .toDF("doc_id", "text")
    val p3 = DedupStream.step(b3, store, batchTag = "b3").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p3 == Set((3L, 4L)), s"got ${p3.mkString(",")}")
  }

  test("store meta guard: parts drift and unmarked stores fail loudly") {
    import java.nio.file.{Files, Paths}
    val store = Files.createTempDirectory("dguard").toString
    val b = Seq(doc(1L, base)).toDF("doc_id", "text")
    DedupStream.step(b, store, batchTag = "b1").unpersist()
    // config drift: pruned reads would silently skip history
    val drifted = intercept[IllegalArgumentException] {
      DedupStream.step(b, store, DedupStream.Config(storeParts = 256), batchTag = "b2")
    }
    assert(drifted.getMessage.contains("rebuild"), drifted.getMessage)
    // a store with commits but no marker: unknown layout/key family
    Files.delete(Paths.get(store, "_PARTS"))
    val unmarked = intercept[IllegalArgumentException] {
      DedupStream.step(b, store, batchTag = "b3")
    }
    assert(unmarked.getMessage.contains("_PARTS"), unmarked.getMessage)
  }

  test("span store reads prune to the batch's hash partitions") {
    import java.nio.file.{Files, Paths}
    val store = Files.createTempDirectory("sprune").toString
    val b1 = Seq(
      (1L, (0 until 30).map(i => s"a$i").mkString(" ")),
      (2L, (0 until 30).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    DedupStream.spanStep(b1, store, batchTag = "b1").unpersist()

    // batch 2 is a single 10-word doc → exactly one span, whose store
    // partition is computable with the operator's own hash chain
    val spanText = (0 until 10).map(i => s"c$i").mkString(" ")
    val ph2 = spark.range(1)
      .select(pmod(xxhash64(md5(lit(spanText))), lit(64L)).cast("int").as("ph"))
      .head().getInt(0)
    val foreign = new java.io.File(s"$store/spans/batch=b1").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ph="))
      .filterNot(_.getName == s"ph=$ph2")
    assert(foreign.nonEmpty, "need at least one span partition foreign to batch 2")
    foreign.foreach(d =>
      Files.write(Paths.get(d.getPath, "part-poison.parquet"), "not parquet".getBytes))

    val b2 = Seq((3L, spanText)).toDF("doc_id", "text")
    val out = DedupStream.spanStep(b2, store, batchTag = "b2").collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L && out.head.getLong(2) == 1L,
      s"fresh single-span doc must keep its span: ${out.mkString(",")}")
  }

  test("streaming wrapper: files in, pair parquet out") {
    val root = java.nio.file.Files.createTempDirectory("dstream").toString
    val docsDir = s"$root/docs"
    new java.io.File(docsDir).mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = true)))

    def stage(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(name).toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$docsDir/$name.parquet"))
    }
    def tick(): Unit = {
      val q = DedupStream.start(spark, docsDir, schema,
        s"$root/store", s"$root/pairs", s"$root/ckpt",
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }

    stage("b1", Seq(doc(1L, base), doc(2L, (300 until 340).map(i => s"v$i"))))
    tick()
    stage("b2", Seq(doc(3L, mutated)))
    tick()
    val pairs = spark.read.parquet(s"$root/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L)), s"got ${pairs.mkString(",")}")
  }

  test("clusterStep: labels accrete across ticks, equal batch CC, replay idempotent, compactable") {
    val store = java.nio.file.Files.createTempDirectory("dclu").toString
    // 200-word family (see the simhashStep spec for why small docs
    // can't hold a stable Hamming ≤ 3): docs 1/3/5 are one component,
    // 2 and 4 are singletons
    val base200 = (0 until 200).map(i => s"w${i}x")
    val b1 = Seq(
      doc(1L, base200),
      doc(2L, (1000 until 1200).map(i => s"z$i"))).toDF("doc_id", "text")
    val b2 = Seq(
      doc(3L, base200.dropRight(1)),
      doc(4L, (2000 until 2200).map(i => s"y$i"))).toDF("doc_id", "text")
    val b3 = Seq(doc(5L, base200 :+ "extra")).toDF("doc_id", "text")

    def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val l1 = labelMap(DedupStream.clusterStep(b1, store, batchTag = "c1"))
    assert(l1 == Map(1L -> 1L, 2L -> 2L), l1.toString)
    val l2 = labelMap(DedupStream.clusterStep(b2, store, batchTag = "c2"))
    assert(l2 == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 4L), l2.toString)
    val l3 = labelMap(DedupStream.clusterStep(b3, store, batchTag = "c3"))

    // stream=batch equivalence: the accreted labelling equals the batch
    // composition (one-shot pairs over the union, CC, singletons kept)
    val all = b1.unionByName(b2).unionByName(b3)
    val batchPairs = Dedup.simhashPairs(Dedup.simhashPortable(all), maxDist = 3)
    val cc = graft.ops.ConnectedComponents
      .connectedComponents(batchPairs, "id1", "id2")
    val expected = labelMap(
      all.select(col("doc_id").cast("long").as("id")).distinct()
        .join(cc, Seq("id"), "left")
        .select(col("id"), coalesce(col("component"), col("id")).as("component")))
    assert(l3 == expected, s"stream $l3 != batch $expected")

    // replay of the last tick: same labels, no new delta commit
    def byIdDirs = new java.io.File(s"$store/labels/byId").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val dirsBefore = byIdDirs
    val replay = labelMap(DedupStream.clusterStep(b3, store, batchTag = "c3"))
    assert(replay == l3, "replayed tick must emit the same labelling")
    assert(byIdDirs == dirsBefore, "replay must not add a commit")

    // compaction: both sub-stores fold to one resolved commit each
    // (stale pre-merge rows dropped); labels unchanged — grace 0 pins
    // the physical single-commit layout (the pre-round-18 behavior)
    DedupStream.compactLabels(spark, store, gcGraceMs = 0L)
    val dirs = byIdDirs
    assert(dirs.size == 1 && dirs.head.startsWith("batch=compact-"), dirs.toString)
    val after = labelMap(DedupStream.latestLabels(spark, store))
    assert(after == l3, "compaction must not change the labelling")
    // and the NEXT tick reads the compacted store as history
    val b4 = Seq(doc(6L, (3000 until 3200).map(i => s"u$i"))).toDF("doc_id", "text")
    val l4 = labelMap(DedupStream.clusterStep(b4, store, batchTag = "c4"))
    assert(l4 == l3 + (6L -> 6L), l4.toString)

    // the ADVICE-flagged scenario: a tick published its delta but the
    // streaming checkpoint commit was lost, compactLabels ran between
    // ticks, THEN the replay fires. Tag exclusion cannot reach inside
    // the compacted commit, so the replay folds against history that
    // already contains its own contribution — min-wins makes that a
    // no-op rather than a labelling wipe.
    DedupStream.compactLabels(spark, store)
    val replayed = labelMap(DedupStream.clusterStep(b4, store, batchTag = "c4"))
    assert(replayed == l4,
      "replay after compaction must preserve the full labelling")
    val replayedAgain = labelMap(DedupStream.clusterStep(b3, store, batchTag = "c3"))
    assert(replayedAgain == l4,
      "an OLDER tick replayed after compaction must not regress labels")
  }

  test("clusterStep: a torn label commit (crash mid-write, no _SUCCESS) is never adopted and GC'd") {
    val store = java.nio.file.Files.createTempDirectory("dclu2").toString
    val b1 = Seq(doc(1L, (0 until 200).map(i => s"w${i}x"))).toDF("doc_id", "text")
    DedupStream.clusterStep(b1, store, batchTag = "k1")
    // simulate a tick that crashed mid-byId-write: task-committed
    // parquet but no job _SUCCESS marker, and a POISONED label value
    Seq((1L, 999L)).toDF("id", "component")
      .withColumn("li", lit(0)).repartition(col("li"))
      .write.partitionBy("li").parquet(s"$store/labels/byId/batch=torn")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$store/labels/byId/batch=torn/_SUCCESS"))
    // compaction's adoption gate refuses the torn dir (no _SUCCESS)
    // and GC collects it; the poisoned row never reaches the manifest
    DedupStream.compactLabels(spark, store)
    val dirs = new java.io.File(s"$store/labels/byId").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("batch=k1"), dirs.toString)
    val labels = DedupStream.latestLabels(spark, store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L), s"torn commit leaked: $labels")
  }

  test("compactLabels: heals byId/byComp divergence from a mid-fold crash + abandoned checkpoint") {
    val store = java.nio.file.Files.createTempDirectory("dcrash").toString
    def fold(tag: String, ids: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] =
      DedupStream.foldLabels(ids.toDF("id"), pairs.toDF("id1", "id2"), store, tag)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fold("t1", Seq(1L, 2L, 3L), Seq((2L, 3L)))   // {2,3} → root 2
    fold("t2", Seq(1L), Seq((1L, 2L)))            // root 2 merges into 1
    // crash between the two t2 publishes: byId committed, byComp did
    // not (manifest-less store — visibility is the listing, so
    // deleting the dir IS the crash state); the checkpoint is then
    // abandoned, so tag t2 never replays
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(s"$store/labels/byComp/batch=t2"))
    // the documented restart contract: compactLabels detects the
    // commit-set divergence (byComp has < 2 commits — the size gate
    // alone would skip it) and rebuilds byComp from byId's labelling
    DedupStream.compactLabels(spark, store)
    // a later merge of root 1 must carry the OFF-BATCH members 2 and 3
    // (their relabel rows lived only in the lost byComp commit)
    val healed = fold("t3", Seq(0L), Seq((0L, 1L)))
    assert(healed == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L),
      s"stranded members after repair: $healed")
  }

  test("startClusters: files in, durable labelling maintained across restarts") {
    val root = java.nio.file.Files.createTempDirectory("dcluw").toString
    val docsDir = s"$root/docs"
    new java.io.File(docsDir).mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = true)))
    def stage(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(name).toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$docsDir/$name.parquet"))
    }
    def tick(): Unit = {
      val q = DedupStream.startClusters(spark, docsDir, schema,
        s"$root/store", s"$root/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination()
    }
    val base200 = (0 until 200).map(i => s"w${i}x")
    stage("b1", Seq(doc(1L, base200), doc(2L, (1000 until 1200).map(i => s"z$i"))))
    tick()
    stage("b2", Seq(doc(3L, base200.dropRight(1))))
    tick() // a SEPARATE query run resuming the same checkpoint
    val labels = DedupStream.latestLabels(spark, s"$root/store")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 2L, 3L -> 1L), labels.toString)
  }
}
