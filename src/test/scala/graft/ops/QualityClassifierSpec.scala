package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained quality classifier: separation on a learnable label,
  * deterministic refits (the property the q64 oracle fixture rests
  * on), scoring arithmetic vs a driver-side reference, and edge
  * cases. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val labeled =
    docs.withColumn("label", (col("lang") === "en").cast("double"))

  test("separates a separable corpus; orders the real seed class correctly") {
    // disjoint-vocabulary classes: the classifier must drive them to
    // the sigmoid rails — this gates the OPERATOR's power independent
    // of how much signal the shared-vocabulary testdata carries
    val rnd = new scala.util.Random(5)
    val synth = ((0 until 100).map(i =>
        (i.toLong, (0 until 30).map(_ => s"good${rnd.nextInt(20)}").mkString(" "), 1.0)) ++
      (100 until 200).map(i =>
        (i.toLong, (0 until 30).map(_ => s"bad${rnd.nextInt(20)}").mkString(" "), 0.0)))
      .toDF("doc_id", "text", "label")
    val ms = QualityClassifier.fit(synth, "label", vocabSize = 64)
    val means = QualityClassifier.score(synth, ms)
      .join(synth.select("doc_id", "label"), "doc_id")
      .groupBy("label").agg(avg("quality").as("q"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(means(1.0) > 0.9 && means(0.0) < 0.1, s"got $means")

    // the real corpus shares ONE vocabulary across langs (langid-style
    // distributional signal only) — require the correct ORDERING, not
    // a separation the data cannot support
    val m = QualityClassifier.fit(labeled, "label", vocabSize = 256)
    val real = QualityClassifier.score(docs, m)
      .join(labeled.select("doc_id", "label"), "doc_id")
      .groupBy("label").agg(avg("quality").as("q"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(real(1.0) > real(0.0) + 0.02,
      s"seed class must score above the rest: $real")
  }

  test("refit is deterministic — the oracle-fixture contract") {
    val m1 = QualityClassifier.fit(labeled, "label", vocabSize = 256)
    val m2 = QualityClassifier.fit(labeled, "label", vocabSize = 256)
    assert(m1.vocab.sameElements(m2.vocab))
    assert(m1.intercept == m2.intercept)
    assert(m1.weights.zip(m2.weights).forall { case (a, b) => a == b })
  }

  test("distributed scoring equals the driver-side linear model") {
    val m = QualityClassifier.fit(labeled, "label", vocabSize = 256)
    val idx = m.vocab.zipWithIndex.toMap
    val w = m.weights
    val byId = QualityClassifier.score(docs, m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    docs.select("doc_id", "text").limit(20).collect().foreach { r =>
      val z = r.getString(1).split(" ").filter(_.nonEmpty)
        .map(t => idx.get(t).map(w).getOrElse(0.0)).sum
      val expected = 1.0 / (1.0 + math.exp(-(z + m.intercept)))
      assert(math.abs(byId(r.getLong(0)) - expected) < 1e-9,
        s"doc ${r.getLong(0)}: ${byId(r.getLong(0))} vs $expected")
    }
  }

  test("a doc with no vocabulary words scores sigmoid(intercept)") {
    val m = QualityClassifier.fit(labeled, "label", vocabSize = 256)
    val oov = Seq((999999L, "zzzznotaword qqqqnotaword"), (999998L, ""))
      .toDF("doc_id", "text")
    val base = 1.0 / (1.0 + math.exp(-m.intercept))
    QualityClassifier.score(oov, m).collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - base) < 1e-12) }
  }
}
