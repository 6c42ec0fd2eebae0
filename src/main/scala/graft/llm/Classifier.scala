package graft.llm

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned quality classification — the fastText-style third filter of
  * the standard cleaning stack (after heuristic signals and LM
  * perplexity): a linear model over hashed word-n-gram counts, trained
  * on whatever labels the pipeline trusts (heuristic-score distillation,
  * a curated seed set, LLM judgments) and scored DISTRIBUTED over the
  * full corpus. Public recipe throughout (Joulin et al. 2016 "Bag of
  * Tricks"; CCNet/LLaMA-style quality filtering).
  *
  * The split of labor is the [[graft.tubes.Tube]] pattern: TRAINING runs
  * wherever spark.ml puts it (the model is metadata — dim+1 doubles) and
  * is NOT part of the determinism contract; SCORING is, and it is pinned
  * by construction: exported coefficients quantize to 1e-6 ticks
  * (`floor(x·1e6 + 0.5)`, exact longs), a document's logit is the
  * intercept ticks plus the SUM OVER GRAM INSTANCES of its bucket's
  * coefficient ticks — pure integer arithmetic, immune to float
  * summation order, replayable by any engine from (text, exported
  * ticks). Features are the EXACT [[Pipeline.importanceWeights]] gram
  * space (word n-gram instances, md5-hashed into `dim` buckets), so the
  * classifier shares DSIR's native `graft_gram_buckets` fast path and
  * its oracle convention.
  *
  * Scale shape: scoring is one codegen'd projection (per-row gram fold
  * probing a `dim`-sized literal array) — zero shuffle at any corpus
  * size; training runs on a labeled SAMPLE by design (labels are the
  * scarce thing), and its one aggregation-like step is spark.ml's own
  * treeAggregate over the sample.
  */
object Classifier {

  /** Exported model: quantized 1e-6 coefficient ticks, index = bucket.
    * The scoring contract is a pure function of (text, this).
    */
  final case class TextClassifierModel(dim: Int, ns: Seq[Int],
                                       interceptTicks: Long,
                                       coefTicks: Array[Long])

  /** Fit a logistic-regression quality classifier on `labelCol` (0/1)
    * over hashed-gram count features. Standardization off — the exported
    * coefficients must apply to RAW counts (standardized fits fold the
    * scaling into unexported per-feature factors).
    */
  def fit(docs: DataFrame, idCol: String, textCol: String, labelCol: String,
          dim: Int = 512, ns: Seq[Int] = Seq(1, 2),
          maxIter: Int = 50, regParam: Double = 1e-4): TextClassifierModel = {
    require(dim > 0 && dim <= (1 << 20), "Classifier.fit: dim must be in (0, 2^20]")
    require(ns.nonEmpty && ns.forall(_ > 0), "Classifier.fit: ns must be positive")
    // bucket-instance array → sparse count vector; row-local, so the one
    // UDF in this file runs on the labeled SAMPLE only, never the corpus
    val toVec = udf((bs: Seq[Long]) => {
      val m = scala.collection.mutable.HashMap.empty[Int, Double]
      bs.foreach(b => m.update(b.toInt, m.getOrElse(b.toInt, 0.0) + 1.0))
      Vectors.sparse(dim, m.toSeq.sortBy(_._1))
    })
    val train = docs.select(
      col(labelCol).cast("double").as("label"),
      toVec(Pipeline.gramBuckets(col(textCol), ns, dim)).as("features"))
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setStandardization(false).setFitIntercept(true)
    val m = lr.fit(train)
    def ticks(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    TextClassifierModel(dim, ns, ticks(m.intercept),
      m.coefficients.toArray.map(ticks))
  }

  /** Integer-tick logit of `text` under `model` — the pinned scoring
    * contract (see object doc). Exposed as a Column so callers can
    * compose it into any projection.
    */
  def logitTicks(text: Column, model: TextClassifierModel): Column = {
    val ticksArr = array(model.coefTicks.map(lit): _*)
    aggregate(
      Pipeline.gramBuckets(text, model.ns, model.dim),
      lit(model.interceptTicks),
      (acc, b) => acc + element_at(ticksArr, (b + 1).cast("int")))
  }

  /** Score a corpus: `(idCol, logit_ticks, score, pred)` — `score` the
    * tick logit as a double (ticks/1e6), `pred` the logit>0 decision.
    * One codegen'd projection, zero shuffle.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: TextClassifierModel): DataFrame = {
    val lt = logitTicks(col(textCol), model)
    docs.select(col(idCol), lt.as("logit_ticks"),
      (lt / 1e6).as("score"), (lt > 0).as("pred"))
  }
}
