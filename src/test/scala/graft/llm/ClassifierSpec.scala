package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("logitTicks: pinned integer-tick scoring — intercept plus one tick " +
    "lookup per gram INSTANCE (unigrams + bigrams)") {
    // dim 4: every gram lands in a known bucket via md5Hash32 % 4
    val m = Classifier.TextClassifierModel(4, Seq(1, 2), 1000000L,
      Array(1L, 10L, 100L, 1000L))
    def bucket(g: String): Int =
      (java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(g).take(8), 16) % 4).toInt
    val text = "a b a"
    val grams = Seq("a", "b", "a", "a b", "b a") // instances, not distinct
    val expected = 1000000L + grams.map(g => m.coefTicks(bucket(g))).sum
    val got = Seq(text).toDF("t")
      .select(Classifier.logitTicks(col("t"), m)).collect().head.getLong(0)
    assert(got === expected)
  }

  test("fit + score: learns a lexically separable label and the score " +
    "column is exactly ticks/1e6") {
    val good = (1L to 40L).map(i => (i, s"alpha beta gamma delta token$i", 1.0))
    val bad = (41L to 80L).map(i => (i, s"zzz qqq xxx junk$i spam", 0.0))
    val docs = (good ++ bad).toDF("doc_id", "text", "label")
    val model = Classifier.fit(docs, "doc_id", "text", col("label"), dim = 64)
    val out = Classifier.score(docs, "doc_id", "text", model).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // separable vocabulary → every doc classified correctly
    assert((1L to 40L).forall(byId(_).getBoolean(3)))
    assert((41L to 80L).forall(!byId(_).getBoolean(3)))
    out.foreach { r =>
      assert(r.getDouble(2) === r.getLong(1) / 1e6)
    }
  }

  test("trainingSample: exactly min(cap, |label|) per label, deterministic " +
    "across re-runs and partitionings, and the exact-k hash-order rows") {
    val docs = (1L to 90L).map(i => (i, s"doc $i", if (i <= 60) 1.0 else 0.0))
      .toDF("doc_id", "text", "label")
    val s1 = Classifier.trainingSample(docs, "doc_id", col("label"), "label",
      20, seed = 7L)
    val counts = s1.groupBy("label").count().as[(Double, Long)].collect().toMap
    assert(counts === Map(1.0 -> 20L, 0.0 -> 20L))
    // cap above the stratum size keeps every row
    val all = Classifier.trainingSample(docs, "doc_id", col("label"), "label",
      100, seed = 7L)
    assert(all.count() === 90L)
    // deterministic: same ids regardless of input partitioning
    val s2 = Classifier.trainingSample(docs.repartition(7), "doc_id",
      col("label"), "label", 20, seed = 7L)
    val ids1 = s1.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 === s2.select("doc_id").as[Long].collect().sorted.toSeq)
    // with the pre-sample covering the corpus (160 > 90), exactly the
    // sampleExactK construction on the narrow projection
    val expect = Pipeline.sampleExactK(
        docs.select(col("doc_id"), col("label")), "doc_id", "label", 20, 7L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 === expect)
    // schema passthrough: the labeled full row, no helper columns
    assert(s1.columns.toSeq === docs.columns.toSeq)
  }

  test("trainingSample presample: a binding presampleFactor composes as " +
    "uniform id exact-k then per-label exact-k, and factor 0 disables it") {
    val docs = (1L to 900L).map(i => (i, s"doc $i", (i % 3 == 0).compareTo(false).toDouble))
      .toDF("doc_id", "text", "label")
    val got = Classifier.trainingSample(docs, "doc_id", col("label"), "label",
        10, seed = 5L, presampleFactor = 4)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // explicit two-stage composition
    val preIds = Pipeline.sampleExactK(
        docs.select(col("doc_id")).withColumn("_cls_all", lit(1)),
        "doc_id", "_cls_all", 40, 5L)
      .select(col("doc_id"))
    val pool = docs.join(broadcast(preIds.withColumnRenamed("doc_id", "_p")),
      col("doc_id") === col("_p"), "left_semi")
    val expect = Pipeline.sampleExactK(
        pool.select(col("doc_id"), col("label")), "doc_id", "label", 10, 5L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === expect)
    // per-label counts bounded by the cap AND the pre-sample's strata
    val byLabel = Classifier.trainingSample(docs, "doc_id", col("label"),
        "label", 10, seed = 5L, presampleFactor = 4)
      .groupBy("label").count().as[(Double, Long)].collect().toMap
    assert(byLabel.values.forall(_ <= 10L) && byLabel.values.sum <= 20L)
    // factor 0 = label-the-corpus semantics (the old construction)
    val noPre = Classifier.trainingSample(docs, "doc_id", col("label"),
        "label", 10, seed = 5L, presampleFactor = 0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val noPreExpect = Pipeline.sampleExactK(
        docs.select(col("doc_id"), col("label")), "doc_id", "label", 10, 5L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(noPre === noPreExpect)
  }

  test("trainingSample: a DERIVED label expression evaluates on the " +
    "pre-sample pool, never corpus-wide (the one full pass is id-only)") {
    val docs = (1L to 400L).map(i => (i, s"w$i " * (i % 5).toInt))
      .toDF("doc_id", "text")
    val evals = spark.sparkContext.longAccumulator("labelEvals")
    val labelUdf = udf((t: String) => { evals.add(1L); if (t.length > 6) 1.0 else 0.0 })
    val out = Classifier.trainingSample(docs, "doc_id", labelUdf(col("text")),
      "label", 10, seed = 1L, presampleFactor = 4)
    assert(out.count() <= 20L)
    // the label ran on (at most) the 80-doc pre-sample, not all 400 —
    // allow re-evaluation slack from the two window phases, but far
    // below corpus size
    assert(evals.value <= 240L, s"label evaluated ${evals.value} times")
  }

  test("cleanCorpus with a classifier == cleanCorpus then filtered by the " +
    "model's pred (the learned stage composes as one more predicate)") {
    val good = (1L to 30L).map(i =>
      (i, s"the quick brown fox jumps over the lazy dog number$i here."))
    val spam = (31L to 60L).map(i =>
      (i, s"the best cheap deals buy now click here offer$i win prizes."))
    val docs = (good ++ spam).toDF("doc_id", "text")
    val bench = Seq((9999L, "benchmark question text")).toDF("doc_id", "text")
    val model = Classifier.fit(docs, "doc_id", "text",
      (col("doc_id") <= 30L).cast("double"), dim = 64)
    val base = Pipeline.cleanCorpus(docs, bench, "doc_id", "text",
      minQuality = 0.0, maxTopWordFrac = 1.0)
    val withCls = Pipeline.cleanCorpus(docs, bench, "doc_id", "text",
      minQuality = 0.0, maxTopWordFrac = 1.0, classifier = Some(model))
    val scored = Classifier.score(docs, "doc_id", "text", model)
      .filter(col("pred")).select("doc_id")
    val expect = base.join(scored, Seq("doc_id"), "left_semi")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val got = withCls.select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === expect)
    // and the model actually bites: the spam half is gone
    assert(got.forall(_ <= 30L) && got.nonEmpty)
  }

  test("fit with trainCapPerLabel: bounded training still separates a " +
    "lexically separable label over the FULL corpus") {
    val good = (1L to 200L).map(i => (i, s"alpha beta gamma delta token$i", 1.0))
    val bad = (201L to 400L).map(i => (i, s"zzz qqq xxx junk$i spam", 0.0))
    val docs = (good ++ bad).toDF("doc_id", "text", "label")
    val model = Classifier.fit(docs, "doc_id", "text", col("label"), dim = 64,
      trainCapPerLabel = 25, sampleSeed = 3L)
    val out = Classifier.score(docs, "doc_id", "text", model).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert((1L to 200L).forall(byId(_).getBoolean(3)))
    assert((201L to 400L).forall(!byId(_).getBoolean(3)))
  }
}
