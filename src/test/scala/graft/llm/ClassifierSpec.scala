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
    val model = Classifier.fit(docs, "doc_id", "text", "label", dim = 64)
    val out = Classifier.score(docs, "doc_id", "text", model).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // separable vocabulary → every doc classified correctly
    assert((1L to 40L).forall(byId(_).getBoolean(3)))
    assert((41L to 80L).forall(!byId(_).getBoolean(3)))
    out.foreach { r =>
      assert(r.getDouble(2) === r.getLong(1) / 1e6)
    }
  }
}
