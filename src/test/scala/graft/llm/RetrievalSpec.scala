package graft.llm

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "apple banana apple"),          // tf(apple)=2, short
    (1L, "apple cherry cherry cherry"),  // tf(apple)=1
    (2L, "banana banana banana banana"), // no apple
    (3L, "durian durian durian"),        // no query terms at all
    (4L, "apple")                        // tf=1, shortest doc
  ).toDF("doc_id", "text")

  test("bm25TopK ranks by tf with length normalization; term-free docs never appear") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq(0L -> Seq("apple")), k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val ids = out.map(_._1).toSeq
    assert(!ids.contains(3L) && !ids.contains(2L), "docs without the term score nothing")
    assert(ids.head === 0L, "highest tf wins")
    // doc 4 (tf=1, dl=1) beats doc 1 (tf=1, dl=4): shorter doc, same tf
    assert(ids.indexOf(4L) < ids.indexOf(1L), s"length normalization: $ids")
    assert(out.map(_._3).toSeq === (1L to ids.length).toSeq, "ranks are 1..n")
  }

  test("bm25TopK: multi-term queries sum per-term contributions (integer ticks)") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq(0L -> Seq("apple"), 1L -> Seq("apple", "banana")), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val q0 = out.filter(_._1 == 0L).map(t => t._2 -> t._3).toMap
    val q1 = out.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
    // doc 0 has both terms: its two-term score strictly exceeds apple-only
    assert(q1(0L) > q0(0L))
    // doc 4 has only apple: identical contribution in both queries
    assert(q1(4L) === q0(4L))
    // banana-only doc 2 appears for q1 but not q0
    assert(q1.contains(2L) && !q0.contains(2L))
  }

  test("bm25TopK is partitioning-independent (exact two-phase top-k)") {
    val qs = Seq(0L -> Seq("apple", "banana"), 1L -> Seq("cherry"))
    val a = Retrieval.bm25TopK(docs, "doc_id", "text", qs, 3).collect().toSet
    val b = Retrieval.bm25TopK(docs.repartition(7), "doc_id", "text", qs, 3).collect().toSet
    assert(a === b)
  }
}
