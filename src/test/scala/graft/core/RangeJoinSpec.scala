package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points =
    Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 99L), (5L, 100L), (6L, 101L),
      (7L, 250L), (8L, -7L), (9L, 0L)).toDF("pid", "t")

  private def intervals =
    Seq((10L, 0L, 20L), (11L, 10L, 10L), (12L, 95L, 105L), (13L, 240L, 260L),
      (14L, -10L, -1L), (15L, 400L, 410L)).toDF("iid", "s", "e")

  private def naive = points.join(intervals,
      col("t") >= col("s") && col("t") <= col("e"))
    .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("pointInInterval equals the naive theta-join at several bin widths") {
    for (w <- Seq(1L, 3L, 10L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals,
          col("t"), col("s"), col("e"), binWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.toSet === naive, s"binWidth=$w")
      // a point meets each interval in exactly one bin: no duplicates
      assert(got.length === got.toSet.size, s"binWidth=$w produced duplicate pairs")
    }
  }

  test("auto bin width (the default) reproduces the same result") {
    val got = RangeJoin.pointInInterval(points, intervals, col("t"), col("s"), col("e"))
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(got.toSet === naive)
    assert(got.length === got.toSet.size)
  }

  test("negative epochs bin correctly (floorDiv, not truncate-toward-zero)") {
    val got = RangeJoin.pointInInterval(points, intervals,
        col("t"), col("s"), col("e"), binWidth = 4L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got.contains((8L, 14L))) // pid 8 (t=-7) in iid 14 [-10,-1]
  }

  test("plan is an equi-join on the bin key, not a nested-loop join") {
    val plan = RangeJoin.pointInInterval(points, intervals,
        col("t"), col("s"), col("e"), binWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested-loop plan:\n$plan")
  }

  test("an interval spanning more than maxBinsPerInterval bins fails loudly") {
    val wide = Seq((20L, 0L, 10000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, wide, col("t"), col("s"), col("e"),
        binWidth = 1L, maxBinsPerInterval = 100).count()
    }
    assert(ex.getMessage.contains("maxBinsPerInterval") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxBinsPerInterval")))
  }

  test("an inverted interval (end < start) fails loudly instead of exploding") {
    // a descending sequence(start, stop) would otherwise generate an
    // unbounded bin list UNDER the > maxBins guard (nBins <= 0)
    val inverted = Seq((21L, 10000L, 0L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, inverted, col("t"), col("s"), col("e"),
        binWidth = 1L, maxBinsPerInterval = 100).count()
    }
    assert(ex.getMessage.contains("invalid bin count") ||
      Option(ex.getCause).exists(_.getMessage.contains("invalid bin count")))
    val ex2 = intercept[Exception] {
      RangeJoin.intervalOverlap(Seq((1L, 5L, 2L)).toDF("xid", "xs", "xe"),
        Seq((2L, 0L, 10L)).toDF("yid", "ys", "ye"),
        col("xs"), col("xe"), col("ys"), col("ye"),
        binWidth = 1L, maxBinsPerInterval = 100).count()
    }
    assert(ex2.getMessage.contains("invalid bin count") ||
      Option(ex2.getCause).exists(_.getMessage.contains("invalid bin count")))
  }

  test("reserved working column and overlapping names are rejected") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumnRenamed("pid", "iid"), intervals,
        col("t"), col("s"), col("e"), binWidth = 1L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumn("_bin", lit(1)), intervals,
        col("t"), col("s"), col("e"), binWidth = 1L)
    }
  }

  // --- intervalOverlap ---

  private def lIv =
    Seq((1L, 0L, 20L), (2L, 10L, 10L), (3L, 95L, 105L), (4L, 240L, 260L),
      (5L, -10L, -1L), (6L, 400L, 410L), (7L, 30L, 35L)).toDF("aid", "as", "ae")

  private def rIv =
    Seq((10L, 5L, 12L), (11L, 20L, 29L), (12L, 100L, 100L), (13L, 250L, 480L),
      (14L, -20L, -15L), (15L, 36L, 40L), (16L, -5L, 2L)).toDF("bid", "bs", "be")

  private def naiveOverlap = lIv.join(rIv,
      col("as") <= col("be") && col("bs") <= col("ae"))
    .select("aid", "bid").as[(Long, Long)].collect().toSet

  test("intervalOverlap equals the naive theta-join at several bin widths, duplicate-free") {
    assert(naiveOverlap.nonEmpty)
    for (w <- Seq(1L, 3L, 10L, 1000L)) {
      val got = RangeJoin.intervalOverlap(lIv, rIv,
          col("as"), col("ae"), col("bs"), col("be"), binWidth = w)
        .select("aid", "bid").as[(Long, Long)].collect()
      assert(got.toSet === naiveOverlap, s"binWidth=$w")
      // the canonical-bin rule keeps each pair exactly once: no distinct needed
      assert(got.length === got.toSet.size, s"binWidth=$w produced duplicate pairs")
    }
  }

  test("intervalOverlap auto bin width (the default) reproduces the same result") {
    val got = RangeJoin.intervalOverlap(lIv, rIv,
        col("as"), col("ae"), col("bs"), col("be"))
      .select("aid", "bid").as[(Long, Long)].collect()
    assert(got.toSet === naiveOverlap)
    assert(got.length === got.toSet.size)
  }

  test("touching endpoints overlap (inclusive bounds) and same-bin non-overlaps are excluded") {
    // as=30..35 touches nothing in rIv except via exact bounds checks:
    // bid 15 [36,40] does NOT overlap [30,35] even inside one wide bin
    val got = RangeJoin.intervalOverlap(lIv, rIv,
        col("as"), col("ae"), col("bs"), col("be"), binWidth = 1000L)
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(!got.contains((7L, 15L)),
      "bin-granular false positive: [30,35] vs [36,40] do not overlap")
    // bid 11 [20,29] touches aid 1 [0,20] exactly at 20 — inclusive
    assert(got.contains((1L, 11L)))
  }

  test("intervalOverlap plans as an equi-join, not a nested-loop join") {
    val plan = RangeJoin.intervalOverlap(lIv, rIv,
        col("as"), col("ae"), col("bs"), col("be"), binWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval overlap fell back to a nested-loop plan:\n$plan")
  }

  test("intervalOverlap rejects over-wide intervals, reserved and shared names") {
    val ex = intercept[Exception] {
      RangeJoin.intervalOverlap(lIv, Seq((9L, 0L, 100000L)).toDF("bid", "bs", "be"),
        col("as"), col("ae"), col("bs"), col("be"),
        binWidth = 1L, maxBinsPerInterval = 100).count()
    }
    assert(ex.getMessage.contains("maxBinsPerInterval") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxBinsPerInterval")))
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(lIv.withColumnRenamed("aid", "bid"), rIv,
        col("as"), col("ae"), col("bs"), col("be"), binWidth = 1L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(lIv.withColumn("_bin", lit(1)), rIv,
        col("as"), col("ae"), col("bs"), col("be"), binWidth = 1L)
    }
  }
}
