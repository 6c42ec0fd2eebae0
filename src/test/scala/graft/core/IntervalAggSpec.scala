package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IntervalAggSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random fixture: inclusive-bound intervals with
  // touching endpoints, nesting, duplicates, and zero-length rows
  private def ivs(n: Int, span: Long) = (1 to n).map { i =>
    val s = (i * 2654435761L) % span
    val len = (i * 40503L) % (span / 4)
    (i.toLong, s, s + len, (i % 7).toLong + 1)
  }.toDF("iid", "s", "e", "m")

  private def wins(n: Int, span: Long) = (1 to n).map { i =>
    val s = (i * 97654321L) % span
    val len = (i * 31L) % (span / 3)
    (i.toLong, s, s + len)
  }.toDF("wid", "ws", "we")

  private def brute(w: org.apache.spark.sql.DataFrame,
                    iv: org.apache.spark.sql.DataFrame) =
    w.crossJoin(iv)
      .filter(col("s") <= col("we") && col("e") >= col("ws"))
      .groupBy("wid")
      .agg(count(lit(1)).as("n_overlaps"), sum(col("m")).as("measure_sum"),
        sum(least(col("we"), col("e")) - greatest(col("ws"), col("s")))
          .as("overlap_len"))
      .select("wid", "n_overlaps", "measure_sum", "overlap_len")

  test("overlapStats == brute-force join+aggregate on a mixed fixture") {
    val iv = ivs(400, 100000L)
    val w = wins(150, 100000L)
    val got = IntervalAgg.overlapStats(w, iv, Seq("wid"),
        col("ws"), col("we"), col("s"), col("e"), col("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = brute(w, iv)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === want)
  }

  test("overlapStats handles inclusive touching bounds and point intervals exactly") {
    // window [10,20]; intervals touching each edge and a point inside
    val iv = Seq((1L, 0L, 10L, 5L),   // touches start: overlap_len 0, counts
      (2L, 20L, 30L, 7L),             // touches end: overlap_len 0, counts
      (3L, 15L, 15L, 1L),             // zero-length inside: counts, len 0
      (4L, 0L, 9L, 9L),               // ends just before: out
      (5L, 21L, 30L, 9L)              // starts just after: out
    ).toDF("iid", "s", "e", "m")
    val w = Seq((1L, 10L, 20L)).toDF("wid", "ws", "we")
    val r = IntervalAgg.overlapStats(w, iv, Seq("wid"),
      col("ws"), col("we"), col("s"), col("e"), col("m")).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((3L, 13L, 0L)))
  }

  test("overlapStats: windows with no overlap are absent; empty intervals give empty output") {
    val iv = Seq((1L, 0L, 5L, 2L)).toDF("iid", "s", "e", "m")
    val w = Seq((1L, 10L, 20L), (2L, 3L, 4L)).toDF("wid", "ws", "we")
    val r = IntervalAgg.overlapStats(w, iv, Seq("wid"),
      col("ws"), col("we"), col("s"), col("e"), col("m")).collect()
    assert(r.map(_.getLong(0)).toSet === Set(2L))
    val empty = IntervalAgg.overlapStats(w, iv.limit(0), Seq("wid"),
      col("ws"), col("we"), col("s"), col("e"), col("m")).collect()
    assert(empty.isEmpty)
  }

  test("overlapStats is bin-count independent and rejects inverted rows") {
    val iv = ivs(200, 50000L)
    val w = wins(80, 50000L)
    val a = IntervalAgg.overlapStats(w, iv, Seq("wid"),
      col("ws"), col("we"), col("s"), col("e"), col("m"), bins = 1).collect().toSet
    val b = IntervalAgg.overlapStats(w, iv, Seq("wid"),
      col("ws"), col("we"), col("s"), col("e"), col("m"), bins = 7777).collect().toSet
    assert(a === b)
    val ex = intercept[Exception] {
      IntervalAgg.overlapStats(w,
        Seq((1L, 10L, 5L, 1L)).toDF("iid", "s", "e", "m"), Seq("wid"),
        col("ws"), col("we"), col("s"), col("e"), col("m")).collect()
    }
    assert(ex.getMessage.contains("inverted") ||
      Option(ex.getCause).exists(_.getMessage.contains("inverted")))
  }

  test("overlapStats plans with no join wider than the probe rows (no pair stage)") {
    val iv = ivs(300, 80000L)
    val w = wins(100, 80000L)
    val plan = IntervalAgg.overlapStats(w, iv, Seq("wid"),
        col("ws"), col("we"), col("s"), col("e"), col("m"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"pair-shaped plan leaked:\n$plan")
  }
}
