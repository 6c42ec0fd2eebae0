package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def md5_32(s: String): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(8), 16)

  test("hashEmbed: hand-computed signed bucket votes for every gram " +
    "instance, unigrams + bigrams") {
    val dim = 8
    val text = "a b a"
    val grams = Seq("a", "b", "a", "a b", "b a")
    val expect = new Array[Int](dim)
    grams.foreach { g =>
      val h = md5_32(g)
      expect((h % dim).toInt) += (if ((h / dim) % 2 == 0) 1 else -1)
    }
    val got = Seq(text).toDF("text")
      .select(Embeddings.hashEmbed(col("text"), Seq(1, 2), dim))
      .as[Seq[Int]].collect().head
    assert(got === expect.toSeq)
  }

  test("hashedEmbeddings: vec is the L2-normalized embedding (unit norm " +
    "when nonzero), norm matches the integer sum of squares, and the " +
    "vector feeds the Similarity stack's array<double> contract") {
    val docs = (1L to 50L)
      .map(i => (i, s"alpha beta w$i " * ((i % 4) + 1).toInt))
      .toDF("doc_id", "text")
    val out = Embeddings.hashedEmbeddings(docs, "doc_id", "text", dim = 32)
    assert(out.columns.toSeq === Seq("doc_id", "emb", "norm", "vec"))
    val rows = out.collect()
    assert(rows.length === 50)
    rows.foreach { r =>
      val emb = r.getSeq[Int](1)
      val norm = r.getDouble(2)
      val vec = r.getSeq[Double](3)
      assert(emb.length === 32 && vec.length === 32)
      val n = math.sqrt(emb.map(c => c.toLong * c).sum.toDouble)
      assert(math.abs(norm - n) < 1e-6)
      if (n > 0) {
        val vnorm = math.sqrt(vec.map(x => x * x).sum)
        assert(math.abs(vnorm - 1.0) < 1e-3, s"vec norm $vnorm")
      }
    }
    // composes with the vector stack: brute-force cosine top-k over the
    // generated vectors runs and returns k rows per query id
    val emb = out.select(col("doc_id").as("vec_id"),
      col("vec").as("embedding"))
    val top = Similarity.topK(emb, "vec_id", "embedding", Seq(1L, 2L), k = 3)
    assert(top.groupBy("q_id").count().collect().forall(_.getLong(1) === 3L))
  }

  test("hashedEmbeddings: identical texts embed identically; disjoint " +
    "vocabularies embed differently") {
    val docs = Seq((1L, "x y z"), (2L, "x y z"), (3L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val rows = Embeddings.hashedEmbeddings(docs, "doc_id", "text", dim = 32)
      .orderBy("doc_id").collect()
    assert(rows(0).getSeq[Int](1) === rows(1).getSeq[Int](1))
    assert(rows(0).getSeq[Int](1) !== rows(2).getSeq[Int](1))
  }
}
