package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based corpus quality filtering — the GPT-3/LLaMA recipe
  * (Brown et al. 2020 §A; Touvron et al. 2023): train a LINEAR
  * classifier to separate a trusted reference corpus from raw crawl
  * text over hashed bag-of-words features, then keep crawl documents
  * the model scores as reference-like. The published stack is
  * fastText/regression over n-gram hashes; this is the same
  * construction on Spark primitives:
  *
  *  - features: the hashing trick (Weinberger et al. 2009) via
  *    MLlib's `HashingTF` — murmur3(token) mod D, a NARROW per-row
  *    map with a fixed D-dim sparse output, no vocabulary state at
  *    all (the property that makes it work at 100 TB: no vocab
  *    broadcast, no OOV path, any executor can featurize any shard);
  *  - training: MLlib `LogisticRegression` (L-BFGS) — each iteration
  *    is one `treeAggregate` gradient pass over the corpus, i.e.
  *    partial-aggregated map-side like every other agg in this repo,
  *    with only the D-dim gradient on the exchange;
  *  - scoring: the fitted coefficient vector rides to executors as a
  *    broadcast closure and scoring fuses into the scan — the 100 TB
  *    corpus pass is embarrassingly parallel.
  *
  * Everything is driver-bounded by D (model size), never by corpus
  * or vocabulary size.
  */
object QualityClassifier {

  /** Featurize: tokens → D-dim hashed term-frequency vector. */
  private def featurize(docs: DataFrame, textCol: String, dims: Int): DataFrame = {
    val tf = new HashingTF().setInputCol("__toks").setOutputCol("features")
      .setNumFeatures(dims)
    tf.transform(docs.withColumn("__toks", TextFunctions.tokens(col(textCol))))
  }

  /** Fit the reference-vs-crawl separator. `labelCol` must be 0.0/1.0
    * (1 = reference/high quality).
    */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            dims: Int = 4096, maxIter: Int = 30, reg: Double = 1e-4): LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(reg)
      .setLabelCol(labelCol).setFeaturesCol("features")
      .fit(featurize(docs, textCol, dims))

  /** Per-document quality probability in [0,1] (P of class 1) as
    * `quality_prob`, plus the hard `predicted` label. The model's
    * coefficients broadcast inside the transform closure — scoring
    * is a narrow pass.
    */
  def score(model: LogisticRegressionModel, docs: DataFrame, textCol: String,
            dims: Int = 4096): DataFrame =
    model.transform(featurize(docs, textCol, dims))
      // vector_to_array is MLlib's OWN bridge function (not a
      // hand-rolled UDF) — the repo's no-UDF rule is about per-row
      // lambdas where builtins exist
      .withColumn("quality_prob",
        element_at(org.apache.spark.ml.functions.vector_to_array(col("probability")), 2))
      .withColumn("predicted", col("prediction").cast("long"))
      .drop("__toks", "features", "rawPrediction", "probability", "prediction")

  /** The filtered corpus: docs scoring ≥ threshold. */
  def filterDocs(model: LogisticRegressionModel, docs: DataFrame, textCol: String,
                 threshold: Double, dims: Int = 4096): DataFrame =
    score(model, docs, textCol, dims).filter(col("quality_prob") >= threshold)
}
