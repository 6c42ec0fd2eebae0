package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps the smallest id per identical key with dup_count") {
    val docs = Seq(
      (1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"), (5L, "ccc"),
    ).toDF("doc_id", "text")
    val out = Dedup.exact(docs, "doc_id", Seq("text"))
      .select("doc_id", "dup_count").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 2L -> 1L, 5L -> 1L))
  }

  test("charShingles: distinct n-grams; short text yields itself") {
    def sh(t: String, n: Int): Seq[String] =
      Seq(t).toDF("text").select(Dedup.charShingles(col("text"), n)).as[Seq[String]].head()
    assert(sh("abcab", 3) === Seq("abc", "bca", "cab"))
    assert(sh("ab", 3) === Seq("ab"))
  }

  test("minhash signatures: identical sets match, disjoint sets differ") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "zzzz qqqq kkkk wwww vvvv uuuu"),
    ).toDF("doc_id", "text")
    val base = docs.select(col("doc_id"),
      array_distinct(Dedup.ngramHashes(col("text"), 5)).as("sh"))
    val sigs = Dedup.minhashSignature(base, "sh", 16).drop("sh").collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
  }

  test("minhashLsh finds near-duplicate pairs and skips dissimilar ones") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "completely different content about spark distributed query planning"),
      (4L, "completely different content about spark distributed query planning"),
      (5L, "nothing like any other document in this tiny corpus whatsoever"),
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", shingleLen = 4,
        numHashes = 16, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((3L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("ngramJaccard: hot-gram cap drops boilerplate blocks without changing the pair set") {
    // sf0.001 documents: real duplicate clusters + shared boilerplate
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pairs(maxDf: Int) =
      Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, blockMod = 8,
          threshold = 0.5, minShared = 2, maxDocFreq = maxDf)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = pairs(128)
    val uncapped = pairs(Int.MaxValue)
    assert(capped === uncapped)
    assert(capped.nonEmpty)
  }

  test("minhashCoeff is deterministic and within safe ranges") {
    val (a1, b1) = Dedup.minhashCoeff(3)
    val (a2, b2) = Dedup.minhashCoeff(3)
    assert((a1, b1) === ((a2, b2)))
    (0 until 32).foreach { k =>
      val (a, b) = Dedup.minhashCoeff(k)
      assert(a >= 1 && a < 2147483647L && b >= 0 && b < 2147483647L)
    }
  }
}
