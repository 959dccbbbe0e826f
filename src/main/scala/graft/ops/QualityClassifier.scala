package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier — the standard LLM-corpus
  * filtering operator (a linear classifier over bag-of-words features
  * scoring "does this look like the reference corpus", the CCNet /
  * GPT-3 quality-filter recipe: train on a trusted seed vs the crawl,
  * keep documents above a score threshold).
  *
  * Spark-first shape, same bounded-model argument as [[Bpe]] and the
  * PQ codebook: the MODEL is vocabulary-sized, never corpus-sized.
  *   - Vocabulary: top-`vocabSize` words by document frequency (one
  *     distributed aggregation; deterministic count-desc/word-asc
  *     order).
  *   - Training: MLlib `LogisticRegression` (deterministic LBFGS, no
  *     sampling) over `CountVectorizerModel` features — per-iteration
  *     cost is one treeAggregate over the corpus, state is O(vocab).
  *   - SCORING IS UDF-FREE: the fitted (word, weight) table broadcast-
  *     joins the exploded corpus and a per-doc sum + sigmoid finishes
  *     the job — pure codegen'd DataFrame ops, `Σ_occurrences w(word)`
  *     being exactly the linear model's `w·x` for count features. This
  *     is also what makes the operator DuckDB-oracle-able (q64): the
  *     oracle re-derives the same join/sum/sigmoid in ANSI SQL from the
  *     dumped weight fixture.
  *
  * reference analog: none — corpus curation is part of the extended
  * training-data surface.
  */
object QualityClassifier {

  /** Fitted model: vocabulary-aligned weights + intercept. Bounded by
    * `vocabSize` — safe to hold on the driver and broadcast. */
  final case class Model(
      vocab: Array[String], weights: Array[Double], intercept: Double) {
    require(vocab.length == weights.length, "vocab/weights misaligned")
    /** The (word, weight) relation scoring and the oracle share. */
    def weightTable(spark: SparkSession): DataFrame = {
      import spark.implicits._
      vocab.zip(weights).toSeq.toDF("word", "weight")
    }
  }

  /** Top-`vocabSize` words by DOCUMENT frequency, deterministic
    * (count desc, word asc) — one distributed aggregation, driver
    * state bounded by the vocabulary. */
  def fitVocab(
      df: DataFrame, vocabSize: Int, textCol: String = "text"): Array[String] =
    df.select(explode(array_distinct(split(col(textCol), " "))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("word").asc)
      .limit(vocabSize)
      .select("word").collect().map(_.getString(0))

  /** Train on `labelCol` (0.0/1.0). No regularization by default: the
    * oracle fixture pins exact weights, and determinism matters more
    * than shrinkage at the gate; production corpora set `regParam`. */
  def fit(
      df: DataFrame, labelCol: String,
      vocabSize: Int = 4096, textCol: String = "text",
      maxIter: Int = 50, regParam: Double = 0.0): Model = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.CountVectorizerModel
    val vocab = fitVocab(df, vocabSize, textCol)
    val cv = new CountVectorizerModel(vocab)
      .setInputCol("words").setOutputCol("features")
    val feats = cv.transform(df.select(
      col(labelCol).cast("double").as("label"),
      filter(split(col(textCol), " "), w => length(w) > 0).as("words")))
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setStandardization(false)
    val m = lr.fit(feats)
    Model(vocab, m.coefficients.toArray, m.intercept)
  }

  /** Score every document: sigmoid(intercept + Σ_word-occurrence w).
    * Broadcast dim join + one per-doc aggregation — no UDF, no vector
    * materialization; a doc with no vocabulary words scores
    * sigmoid(intercept) (LEFT join + coalesce). */
  def score(
      df: DataFrame, model: Model,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val wt = broadcast(model.weightTable(df.sparkSession))
    val words = df.select(col(idCol),
        explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val z = words.join(wt, Seq("word"))
      .groupBy(idCol).agg(sum(col("weight")).as("z"))
    df.select(col(idCol)).join(z, Seq(idCol), "left")
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("z"), lit(0.0)) + lit(model.intercept)))))
          .as("quality"))
  }
}
