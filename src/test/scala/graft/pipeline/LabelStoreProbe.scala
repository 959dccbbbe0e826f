package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evidence harness for the DELTA label store
  * ([[graft.streaming.DedupStream.foldLabels]]) — the two claims the
  * round-11 full-snapshot design could not make:
  *
  *   1. TICK WALL FLAT IN |labels|: seed stores of 50k / 500k / 5M
  *      accreted labels (100×–1000× an 8k-doc batch), then fold
  *      identical 8k-id ticks with a realistic merge rate (~50 pairs,
  *      half touching existing clusters) into each. Per-tick wall must
  *      not scale with the corpus — the fold reads only pair-endpoint
  *      partitions and merged-root members, and writes only the batch
  *      + merge-affected rows.
  *   2. BOUNDED LONG RUN: 120 consecutive ticks with compaction every
  *      16 (the startClusters `compactEvery` path) must keep the
  *      visible commit count ≤ the compaction window and the labelling
  *      exact at the end.
  *
  * `sbt "Test/runMain graft.pipeline.LabelStoreProbe"`
  */
object LabelStoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.DedupStream

    def ids(from: Long, n: Long): DataFrame =
      spark.range(from, from + n).select(col("id"))

    // clusters of 4 among the seed ids: pairs (4k+j, 4k), j = 1..3
    def seedPairs(n: Long): DataFrame =
      spark.range(0L, n).filter(col("id") % 4 =!= 0)
        .select(col("id").as("id1"), (col("id") - col("id") % 4).as("id2"))

    // one 8k-id tick at `from`: 25 batch-internal pairs + 25 batch docs
    // each BRIDGING two distinct seed clusters — the shape that merges
    // two existing components (root = the smaller), so the larger
    // root's off-batch members must relabel through byComp every tick.
    // Cluster offsets advance with k so each tick merges fresh pairs.
    def tickBatch(from: Long, k: Int): (DataFrame, DataFrame) = {
      val b = ids(from, 8000L)
      val internal = spark.range(from, from + 25L)
        .select(col("id").as("id1"), (col("id") + 100L).as("id2"))
      val bridge = spark.range(0L, 25L)
        .select((col("id") + from + 500L).as("d"),
          ((col("id") + 25L * k) * 32L).as("rootA"))
        .select(col("d"), col("rootA"), (col("rootA") + 16L).as("rootB"))
      val intoSeed = bridge.select(col("d").as("id1"), col("rootA").as("id2"))
        .unionByName(bridge.select(col("d").as("id1"), col("rootB").as("id2")))
      (b, internal.unionByName(intoSeed))
    }

    Seq(50000L, 500000L, 5000000L).foreach { n =>
      val store = java.nio.file.Files.createTempDirectory(s"lsp$n").toString
      val t0 = System.nanoTime()
      DedupStream.foldLabels(ids(0L, n), seedPairs(n), store, "seed")
      println(f"LABEL_SEED n=$n%d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      (0 until 8).foreach { k =>
        val (b, p) = tickBatch(n + 100000L * (k + 1), k)
        val t1 = System.nanoTime()
        DedupStream.foldLabels(b, p, store, s"t$k")
        println(f"LABEL_TICK labels=$n%d tick=$k%d sec=${(System.nanoTime() - t1) / 1e9}%.2f")
      }
      val t2 = System.nanoTime()
      val total = DedupStream.latestLabels(spark, store).count()
      println(f"LABEL_RESOLVE labels=$n%d rows=$total%d " +
        f"sec=${(System.nanoTime() - t2) / 1e9}%.2f")
      // spot-check: tick 0's first bridge merged seed clusters rooted
      // at 0 and 16 — 16's off-batch members must carry label 0 now
      val merged = DedupStream.latestLabels(spark, store)
        .filter(col("id").isin(16L, 17L, 19L)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      require(merged == Map(16L -> 0L, 17L -> 0L, 19L -> 0L),
        s"bridged seed cluster mislabelled: $merged")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(store))
    }

    // GIANT-CLUSTER RELABEL FALLBACK (round-12 verdict Next #3): one
    // tick merges a component with > 2^16 members downward — the
    // membersExtra limit-guard must overflow (membersLocal = None) and
    // the relabel must run DISTRIBUTED, never transiting the driver.
    // Fallback taken ⟺ the tick's commits are hash-PARTITIONED (li=*/
    // lc=* subdirs), not L0 single files.
    {
      val store = java.nio.file.Files.createTempDirectory("lspgiant").toString
      val giantN = 100000L // > 2^16 = 65536 members
      val base = 1000000L
      // one component: members base..base+giantN-1 rooted at `base`
      val giantPairs = spark.range(base + 1, base + giantN)
        .select(col("id").as("id1"), lit(base).as("id2"))
      val t0 = System.nanoTime()
      DedupStream.foldLabels(
        ids(base, giantN), giantPairs, store, "giantseed")
      println(f"GIANT_SEED members=$giantN%d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      // the merging tick: new doc 5 bridges into the giant root — new
      // root 5 < base, so ALL giantN off-batch members must relabel
      val t1 = System.nanoTime()
      DedupStream.foldLabels(
        ids(5L, 1L),
        spark.range(1).select(lit(5L).as("id1"), lit(base).as("id2")),
        store, "giantmerge")
      val mergeSec = (System.nanoTime() - t1) / 1e9
      val tickDir = new java.io.File(s"$store/labels/byId/batch=giantmerge")
      val partitionedWrite = tickDir.listFiles()
        .exists(f => f.isDirectory && f.getName.startsWith("li="))
      println(f"GIANT_MERGE sec=$mergeSec%.2f distributed_relabel=$partitionedWrite")
      require(partitionedWrite,
        "giant merge took the L0 path — the > 2^16-member fallback never ran")
      // final_equal_batch: every giant member + doc 5 must land on
      // component 5 (the batch CC answer over the union of all pairs)
      val labels = DedupStream.latestLabels(spark, store)
      val on5 = labels.filter(col("component") === 5L).count()
      val stray = labels.filter(col("component") =!= 5L).count()
      println(s"GIANT_EQUAL on5=$on5 stray=$stray equal_batch=${on5 == giantN + 1 && stray == 0}")
      require(on5 == giantN + 1 && stray == 0,
        s"giant relabel wrong: $on5 on component 5, $stray stray")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(store))
    }

    // long run: 120 ticks of 1k ids, compacting every 16 like
    // startClusters does; commit listing must stay bounded. At every
    // compaction boundary (round-12 verdict Next #7) measure the
    // latestLabels READER cost just before and just after the fold:
    // the L0 design's claim is that pruned reads degrade by at most
    // `compactEvery` small files between compactions.
    {
      val store = java.nio.file.Files.createTempDirectory("lsplong").toString
      def commitDirs: Int = new java.io.File(s"$store/labels/byId").listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("batch="))
      def readWall(): (Long, Double) = {
        val t = System.nanoTime()
        val n = DedupStream.latestLabels(spark, store).count()
        (n, (System.nanoTime() - t) / 1e9)
      }
      val t0 = System.nanoTime()
      (0 until 120).foreach { k =>
        val from = 10000000L + 1000L * k
        val b = ids(from, 1000L)
        val p = spark.range(from, from + 10L)
          .select(col("id").as("id1"), (col("id") + 500L).as("id2"))
        DedupStream.foldLabels(b, p, store, s"L$k")
        if ((k + 1) % 16 == 0) {
          val (rowsB, secB) = readWall()
          val dirsB = commitDirs
          DedupStream.compactLabels(spark, store)
          val (rowsA, secA) = readWall()
          val dirsA = commitDirs
          println(f"LABEL_READCOST tick=${k + 1}%d pre(dirs=$dirsB%d " +
            f"rows=$rowsB%d sec=$secB%.2f) post(dirs=$dirsA%d rows=$rowsA%d sec=$secA%.2f)")
          require(dirsB <= 17, s"pre-compaction commit listing unbounded: $dirsB")
          require(dirsA == 1, s"post-compaction should be one commit: $dirsA")
          require(rowsA == rowsB, s"compaction changed the labelling: $rowsB -> $rowsA")
        }
      }
      val commits = commitDirs
      val rows = DedupStream.latestLabels(spark, store).count()
      println(f"LABEL_LONGRUN ticks=120 commit_dirs=$commits%d rows=$rows%d " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      require(commits <= 17, s"commit listing unbounded: $commits dirs")
      require(rows == 120000L, s"labelling lost rows: $rows")
    }
    spark.stop()
  }
}
