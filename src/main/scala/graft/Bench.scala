package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: session/codegen/file-index initialization should
    // not be billed to whichever query happens to run first
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // per-query MIN over `runs` executions: this host shows 3-20x CPU
    // steal on single runs — the minimum is the only statistic that
    // tracks the engine rather than the noisy neighbor
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    // local-iteration filter: comma-separated query names; unset = all
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // DUAL steal index ([[Canary]]): the CPU canary (fixed zero-data
    // codegen workload) and the IO canary (fixed ~200 MB parquet scan +
    // full shuffle), each timed before, midway through, and after the
    // suite; the MEDIANs are this run's host-contention factors. The
    // pair exists because round 15 proved the CPU canary blind to
    // disk/page-cache contention (q96 at 47.95 s on unchanged code at
    // cpu-canary 0.29) — a wall-clock swing now self-adjudicates: cpu
    // moved → steal; io moved → disk; neither → code.
    def canaryOnce(): Double = Canary.cpuOnce(spark)
    canaryOnce() // untimed codegen warm-up for the canary's own plan
    Canary.ensureIoFixture(spark)
    Canary.ioOnce(spark) // untimed warm-up (fixture into page cache)
    val canaries = scala.collection.mutable.ArrayBuffer(canaryOnce())
    val ioCanaries = scala.collection.mutable.ArrayBuffer(Canary.ioOnce(spark))
    val mid = math.max(1, selected.size / 2)
    val results = selected.zipWithIndex.map { case ((name, fn), qi) =>
      if (qi == mid) { canaries += canaryOnce(); ioCanaries += Canary.ioOnce(spark) }
      val dt = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // a failed run must never win the min — it would report a
        // fast-failing execution as the query's official time
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val d = (System.nanoTime() - t0) / 1e9
        // operators cache intermediates (shingle relations etc.);
        // release between runs so one query's cache doesn't tax the next
        spark.catalog.clearCache()
        if (ok) d else Double.MaxValue
      }.min
      // every run failed → report the -1 sentinel, not Double.MaxValue
      name -> (if (dt == Double.MaxValue) -1.0 else dt)
    }.toMap
    canaries += canaryOnce()
    ioCanaries += Canary.ioOnce(spark)
    val canarySec = canaries.sorted.apply(canaries.size / 2)
    val ioCanarySec = ioCanaries.sorted.apply(ioCanaries.size / 2)
    // The driver captures only the LAST 2000 chars of stdout, and sbt
    // appends a ~80-char "[success] ... completed" line after ours — so
    // the stdout line must stay under ~1900 chars or its head is clipped
    // (BENCH_r08 lost its opening brace exactly this way: tail had all 74
    // entries but "parsed" stayed null). 10 ms precision + basename sf
    // bring a 74-query line to ~1850; the file artifact keeps 0.1 ms.
    def fmt(v: Double, prec: Int): String =
      if (v < 0) "-1"
      else {
        // strip trailing zeros ("0.30"→"0.3", "35.00"→"35") — still
        // valid JSON numbers, ~1 char/query back on a 74-entry line
        val s = String.format(s"%.${prec}f", Double.box(v))
        if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
      }
    def jsonLine(prec: Int, sf: String, shortKeys: Boolean = false): String = {
      // stdout uses the bare "qNN" keys (the driver contract's own
      // example form — {"q1":sec}): at 95 queries even a 0-dp line with
      // full names is ~2070 chars and the driver's 2000-char tail
      // capture would clip the HEAD (the BENCH_r08 failure). Short keys
      // bring 2-dp to ~1200 chars; the file artifact keeps full names.
      def key(k: String): String = if (shortKeys) k.takeWhile(_ != '_') else k
      // two registry names sharing a qNN prefix would silently emit
      // duplicate JSON keys (last-one-wins on the driver side) — fail
      // the bench instead so the collision is fixed at naming time
      val shortened = results.keys.toSeq.map(key)
      require(shortened.distinct.size == shortened.size,
        "bench stdout keys collide after prefix-shortening: " +
          shortened.groupBy(identity).filter(_._2.size > 1).keys.mkString(", "))
      val qs = results.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + key(k) + "\":" + fmt(v, prec) }
        .mkString("{", ",", "}")
      // failed queries (-1 sentinel) stay visible per-query but are
      // excluded from the total
      val total = results.values.filter(_ >= 0).sum
      // "runs" self-describes the statistic each per-query number carries
      // (min over N executions) so round-over-round readers never compare
      // a min-of-3 against a steal-inflated single run unknowingly
      // the headline total keeps 2 dp at every tier — only the
      // per-query map degrades (the 4-dp file artifact is authoritative)
      s"""{"metric":"total","value":${fmt(total, math.max(prec, 2))},"unit":"sec","runs":$runs,"stat":"min","canary_sec":${fmt(canarySec, 2)},"io_canary_sec":${fmt(ioCanarySec, 2)},"queries":$qs,"sf":"$sf"}"""
    }
    // adaptive precision: if the suite grows enough that even the
    // compact form would clip, degrade stdout to 1 dp (0.1 s) rather
    // than lose the line's head — the file artifact keeps 0.1 ms
    val sfTag = new java.io.File(sfDir).getName
    // 84 queries outgrew even 1 dp (~1950 chars) — degrade stdout to
    // whole seconds before ever letting the head clip; the file
    // artifact below always keeps 0.1 ms
    val line = Seq(2, 1, 0).map(jsonLine(_, sfTag, shortKeys = true))
      .find(_.length <= 1900)
      .getOrElse(jsonLine(0, sfTag, shortKeys = true))
    // belt-and-braces artifact: the full-precision JSON also lands in a
    // file so round-over-round comparisons never depend on stdout capture
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_last.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), jsonLine(4, sfDir) + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] artifact write failed: $e") }
    // stop Spark BEFORE printing: the compact JSON must be the LAST
    // stdout line (driver contract — BENCH_r07 captured a clipped tail
    // because shutdown logging followed the metric line)
    spark.stop()
    println(line)
    System.out.flush()
  }
}
