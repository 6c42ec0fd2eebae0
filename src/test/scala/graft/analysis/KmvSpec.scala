package graft.analysis

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val Seed = 7L
  private val K = 16

  private def rows = (1L to 500L).map(i =>
    (i, if (i % 3 == 0) "a" else "b",
      if (i % 97 == 0) None else Some(math.sin(i.toDouble) * 100.0)))
    .toDF("id", "g", "v")

  private def whole = Sketches.kmvSketch(rows, Seq("g"), col("id"), col("v"), K, Seed)

  test("kmvSketch keeps the k smallest (hash, id) rows per group, nulls dropped") {
    val got = whole.as[(String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    // reference: hash every non-null row the same way, sort, take k
    val h = graft.llm.Dedup.md5Hash32(concat_ws("|", col("id"), lit(Seed)))
    val ref = rows.filter(col("v").isNotNull)
      .select(col("g"), h.as("h"), col("id")).as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(
        _.map(r => (r._2, r._3)).sorted.take(K).toSet).toMap
    assert(got === ref)
  }

  test("merge of disjoint halves is bit-identical to the whole-data sketch") {
    val a = Sketches.kmvSketch(rows.filter($"id" % 2 === 0), Seq("g"), col("id"), col("v"), K, Seed)
    val b = Sketches.kmvSketch(rows.filter($"id" % 2 === 1), Seq("g"), col("id"), col("v"), K, Seed)
    val merged = Sketches.kmvMerge(Seq(a, b), Seq("g"), K)
      .orderBy("g", "kmv_h", "kmv_id").collect()
    assert(merged === whole.orderBy("g", "kmv_h", "kmv_id").collect())
  }

  test("three-way merge and merge-of-merges agree with the whole sketch") {
    val parts = (0 until 3).map(i =>
      Sketches.kmvSketch(rows.filter($"id" % 3 === i), Seq("g"), col("id"), col("v"), K, Seed))
    val flat = Sketches.kmvMerge(parts, Seq("g"), K)
    val nested = Sketches.kmvMerge(
      Seq(Sketches.kmvMerge(parts.take(2), Seq("g"), K), parts(2)), Seq("g"), K)
    val w = whole.orderBy("g", "kmv_h", "kmv_id").collect()
    assert(flat.orderBy("g", "kmv_h", "kmv_id").collect() === w)
    assert(nested.orderBy("g", "kmv_h", "kmv_id").collect() === w)
  }

  test("kmvQuantiles equals the pinned formula applied to the sampled values") {
    val ps = Seq(0.25, 0.5, 0.9)
    val got = Sketches.kmvQuantiles(whole, Seq("g"), ps)
      .orderBy("g", "p").as[(String, Double, Double)].collect()
    val ref = Stats.quantiles(whole, Seq("g"), col("kmv_v"), ps)
      .orderBy("g", "p").as[(String, Double, Double)].collect()
    assert(got === ref)
    assert(got.length === 2 * ps.length)
  }

  test("a sketch never exceeds k rows per group; small groups keep all rows") {
    val tiny = Seq((1L, "x", 1.0), (2L, "x", 2.0)).toDF("id", "g", "v")
    assert(Sketches.kmvSketch(tiny, Seq("g"), col("id"), col("v"), K, Seed).count() === 2)
    val counts = whole.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ <= K))
  }
}
