package graft.functions

import graft.SparkSpec
import graft.ops.TextAnalysis

class GraftFunctionsSpec extends SparkSpec {

  test("the full scalar surface is reachable from spark.sql") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  epoch_to_timestamp(0) AS genesis,
        |  timestamp_to_epoch(timestamp'2020-08-24 22:00:30') AS e1,
        |  cbor_decode_long('GwAAAAgAAAAA') AS big,
        |  cbor_decode_cid('2CpYKAABgeIDkiAgR4YG+O8RvPGtJY29gurIsQs2sjrcDHTDje72xmhxxCY=') AS cid,
        |  graft_language_id('the quick brown fox jumps over the lazy dog in the hills') AS lang,
        |  graft_fingerprint64('hello') AS fp,
        |  vector_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS dot,
        |  vector_sq(array(3.0f, 4.0f)) AS sq,
        |  cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS cos,
        |  scrub_pii('mail a@b.co ip 10.0.0.1 card 4111111111111111') AS scrubbed,
        |  scrub_pii('short 12 run', 2) AS scrubbed2
        |""".stripMargin).collect()(0)
    assert(row.getAs[java.sql.Timestamp]("genesis").getTime == 1598306400000L)
    assert(row.getAs[Int]("e1") == 1) // genesis + 30s = epoch 1
    assert(row.getAs[Long]("big") == 34359738368L)
    assert(row.getAs[String]("cid").startsWith("baga6ea4seaq"))
    assert(row.getAs[String]("lang") == "en")
    assert(row.getAs[Long]("fp") == TextAnalysis.fingerprint64("hello"))
    assert(row.getAs[Double]("dot") == 11.0)
    assert(row.getAs[Double]("sq") == 25.0)
    assert(row.getAs[Double]("cos") == 1.0)
    assert(row.getAs[String]("scrubbed") == "mail <EMAIL> ip <IP> card <NUM>")
    assert(row.getAs[String]("scrubbed2") == "short <NUM> run")
    // expression registration, not a UDF: the plan must stay UDF-free
    val plan = spark.sql("SELECT scrub_pii('x 1234')").queryExecution
      .executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
  }

  test("extensions class injects native functions into a fresh session") {
    val s2 = spark.newSession()
    new GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions)
    // injection path via conf: build directly on the live session instead
    GraftFunctions.registerAll(s2)
    assert(s2.sql("SELECT vector_dot(array(1.0f), array(2.0f)) v").collect()(0)
      .getDouble(0) == 2.0)
  }

  test("epoch round-trip property over a range") {
    (-5000L to 5000L by 37).foreach { e =>
      val ts = EpochFunctions.epochToUnix(e)
      assert(EpochFunctions.unixToEpoch(ts) == e)
      assert(EpochFunctions.unixToEpoch(ts + 29) == e)
      assert(EpochFunctions.unixToEpoch(ts + 30) == e + 1)
    }
  }

  test("optimizer rule de-UDFs cosine_sim into the native codegen'd tree") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    val rnd = new scala.util.Random(3)
    val dir = java.nio.file.Files.createTempDirectory("cosudf").toString
    ((0 until 50).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat()), Seq.fill(16)(rnd.nextFloat()))
    } :+ ((99L, Seq.fill(16)(0f), Seq.fill(16)(rnd.nextFloat()))) // zero vector → NaN
      :+ ((98L, Seq.fill(16)(rnd.nextFloat()), Seq.fill(9)(rnd.nextFloat()))) // ragged
    ).toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    // file-backed, so ConvertToLocalRelation cannot pre-evaluate the
    // projection and hide the rewrite from the plan assertion
    val df = spark.read.parquet(dir)
    df.createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT id, cosine_sim(a, b) AS cos FROM vecs")
    // the ScalaUDF must be gone from the optimized plan...
    val udfsLeft = out.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
    })
    assert(udfsLeft.isEmpty, s"ScalaUDF survived optimization: $udfsLeft")
    assert(out.queryExecution.optimizedPlan.toString.contains("vectordot"))
    // ...and the native tree must be bit-identical to the UDF body
    // (same index-order double accumulation, IEEE division)
    val got = out.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1), r.getSeq[Float](2)))
    rows.foreach { case (id, a, b) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      // dot over the common prefix, norms over each full array — the
      // declared semantics of both the UDF and the native tree
      (0 until math.min(a.length, b.length)).foreach(i => dot += a(i).toDouble * b(i).toDouble)
      a.foreach(v => na += v.toDouble * v.toDouble)
      b.foreach(v => nb += v.toDouble * v.toDouble)
      val expect = dot / (math.sqrt(na) * math.sqrt(nb))
      assert(java.lang.Double.doubleToLongBits(got(id)) ==
        java.lang.Double.doubleToLongBits(expect), s"id=$id")
    }
    // the zero-vector row: the UDF's 0.0/0.0 — NaN, not NULL
    assert(got(99L).isNaN, s"zero vector must be NaN, got ${got(99L)}")
  }

  test("HyperplaneKeys: fused multi-table keys equal the per-table VectorDot composition") {
    import graft.ops.SimilaritySearch
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dim = 64; val planes = 6; val seed = 7L; val tables = 3
    val rnd = new scala.util.Random(41)
    val vecs = ((0L until 40L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)) :+
      ((98L, Array.fill(16)(1.0f).toSeq)) :+      // short vector
      ((99L, Array.fill[Float](dim)(0f).toSeq)))  // zero vector: all dots 0 >= 0
      .toDF("vec_id", "embedding")
    val flat = SimilaritySearch.tablePlanesFlat(dim, planes, seed, tables)
    val fused = vecs.select(col("vec_id"),
        posexplode(graft.functions.VectorExpressions.hyperplaneKeys(
          col("embedding"), flat, planes, dim)).as(Seq("tbl", "key")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(fused.size == 42 * tables)
    (0 until tables).foreach { t =>
      val single = vecs.select(col("vec_id"),
          SimilaritySearch.hyperplaneKey(
            col("embedding"), dim, planes, seed + 1000003L * t).as("key"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      single.foreach { case (id, k) =>
        assert(fused((id, t)) == k, s"vec $id table $t: fused ${fused((id, t))} vs $k")
      }
    }
    // zero vector: every dot is 0.0 >= 0 → all bits set
    assert(fused((99L, 0)) == (1 << planes) - 1)
    // interpreted path agrees with codegen (eval via a filter that
    // Catalyst constant-folds away would be cheating — use a fresh
    // non-codegen projection instead)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = vecs.select(col("vec_id"),
          posexplode(graft.functions.VectorExpressions.hyperplaneKeys(
            col("embedding"), flat, planes, dim)).as(Seq("tbl", "key")))
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
      assert(interp == fused, "interpreted HyperplaneKeys must match codegen")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
