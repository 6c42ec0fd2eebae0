package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-bucketed range joins — the equi-join rewrite of `point BETWEEN
  * start AND end`.
  *
  * Spark has no inequality-join strategy: a bare
  * `points.join(intervals, p >= s && p <= e)` plans as a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side
  * fits in a broadcast) — O(|points| × |intervals|) comparisons and a
  * single-task collapse at scale. The standard rewrite quantizes time
  * into fixed-width bins: every interval explodes to the bins it
  * overlaps, every point maps to the ONE bin containing it, and the
  * join becomes a plain shuffle equi-join on the bin key with the exact
  * range predicate evaluated bin-locally. Because a point lives in
  * exactly one bin, each qualifying (point, interval) pair meets in
  * exactly one bin — the join needs NO distinct afterwards, which is
  * what keeps the shape shuffle-minimal.
  *
  * Cost model: the interval side is duplicated `len/binWidth + 1` times
  * (its bin fan-out); per-bin work is |points in bin| × |intervals
  * overlapping bin|. `autoBinWidth` picks the median interval length —
  * fan-out ≈ 2 — which is the right default whenever interval lengths
  * are unimodal; callers with a known grid (sessions, SLA windows) pass
  * it explicitly. Either way the RESULT is bin-width independent: the
  * width tunes the plan, never the answer.
  *
  * Reference scope: jee51/tabata has no join surface at all (opset.py
  * keeps one frame per record); this operator is part of the
  * training-data/event-analytics surface the builder brief adds
  * (incident attribution, time-window feature joins, as-of-style
  * enrichment at scale).
  */
object RangeJoin {

  /** Median interval length in the same units as the bounds, from one
    * metadata-sized aggregation — the auto bin width. Clamped to ≥ 1.
    */
  def autoBinWidth(intervals: DataFrame, startCol: Column, endCol: Column): Long = {
    val row = intervals.agg(
      percentile_approx(endCol.cast("long") - startCol.cast("long"), lit(0.5), lit(10000))
        .as("m")).head()
    if (row.isNullAt(0)) 1L else math.max(1L, row.getLong(0))
  }

  /** All (point row × interval row) combinations with
    * `start <= point <= end` (inclusive both ends), as the concatenation
    * of both sides' columns. Column names must be disjoint; `_bin` is
    * reserved. Bounds and the point must be integral (epoch micros,
    * ticks — never float time).
    *
    * `binWidth <= 0` derives the width from the data via
    * [[autoBinWidth]]. `maxBinsPerInterval` bounds the interval fan-out:
    * one pathological open-ended interval would otherwise explode to an
    * executor-killing bin sequence — such rows FAIL LOUDLY
    * (`raise_error`) rather than silently ballooning the plan; callers
    * with genuinely huge intervals raise the cap or widen the bins.
    *
    * Plan shape: ONE shuffle pair (both sides exchange on `_bin`), the
    * range predicate fused into the join, no post-join distinct (a
    * point's single bin meets each interval once). Hot bins (bursty
    * time ranges) are data skew on the bin key — AQE's skew-join split
    * handles the join-side imbalance because the predicate is pure
    * equi-join; no salting needed.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: Column, startCol: Column, endCol: Column,
                      binWidth: Long = 0L,
                      maxBinsPerInterval: Int = 4096): DataFrame = {
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"RangeJoin.pointInInterval: column names must be disjoint, both sides have ${overlap.mkString(", ")}")
    Salting.requireFreeColumns(points, Seq("_bin"), "pointInInterval(points)")
    Salting.requireFreeColumns(intervals, Seq("_bin"), "pointInInterval(intervals)")
    val w = if (binWidth > 0) binWidth else autoBinWidth(intervals, startCol, endCol)
    val s = startCol.cast("long")
    val e = endCol.cast("long")
    val p = pointCol.cast("long")
    // floorDiv semantics for negative epochs: Spark's `div` truncates
    // toward zero, so pre-epoch micros would land one bin high; `floor`
    // over double is exact here because bins (≤ 2^52) fit a double.
    def binOf(c: Column): Column = floor(c.cast("double") / lit(w.toDouble)).cast("long")
    val nBins = binOf(e) - binOf(s) + lit(1L)
    // nBins < 1 = inverted interval (end < start, swapped columns or
    // corrupt rows): it can never match, but `sequence(start, stop)` with
    // start > stop generates a DESCENDING bin list of unbounded length —
    // exactly the fan-out this guard exists to catch — so it fails loudly
    // too instead of silently ballooning the plan
    val iv = intervals.withColumn("_bin",
      explode(when(nBins > lit(maxBinsPerInterval.toLong) || nBins < lit(1L),
          raise_error(concat(
            lit(s"pointInInterval: interval spans an invalid bin count ("), nBins,
            lit(s" bins of width $w — inverted end < start, or wider than maxBinsPerInterval=$maxBinsPerInterval)"))))
        .otherwise(sequence(binOf(s), binOf(e)))))
    val pt = points.withColumn("_bin", binOf(p))
    pt.join(iv, pt("_bin") === iv("_bin") && p >= s && p <= e).drop("_bin")
  }

  /** All (left row × right row) combinations whose intervals OVERLAP —
    * `ls <= re AND rs <= le`, all bounds inclusive — as the
    * concatenation of both sides' columns. Column names must be
    * disjoint; `_bin` is reserved; bounds must be integral.
    *
    * Same bin-bucketed equi-join rewrite as [[pointInInterval]], with
    * the duplicate-elimination trick adapted to two exploded sides: both
    * intervals explode to every bin they cover, so a qualifying pair
    * would meet once per SHARED bin — instead of a post-join distinct
    * (a full extra shuffle of the output), the join keeps a pair only in
    * its CANONICAL bin, the bin containing `greatest(ls, rs)` (the
    * overlap start). That point lies inside both intervals whenever they
    * overlap — `greatest(ls,rs) <= le` and `<= re` are exactly the two
    * halves of the overlap predicate — so the canonical bin is always
    * among the shared bins, and it is unique by construction: each pair
    * survives exactly once, no distinct needed. The exact overlap
    * predicate still rides the join (canonical-bin equality alone is
    * bin-granular: `rs > le` inside one bin would slip through).
    *
    * `binWidth <= 0` derives the width from the data as the LARGER of
    * the two sides' median interval lengths — that bounds the
    * typically-longer side's fan-out near 2 while the shorter side's
    * fan-out stays ≤ 2 by construction (an interval shorter than the bin
    * covers at most 2 bins). Fan-out cost and skew behavior are
    * otherwise identical to [[pointInInterval]]: hot bins are pure
    * equi-join skew, AQE splits them, result is bin-width independent.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStartCol: Column, lEndCol: Column,
                      rStartCol: Column, rEndCol: Column,
                      binWidth: Long = 0L,
                      maxBinsPerInterval: Int = 4096): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"RangeJoin.intervalOverlap: column names must be disjoint, both sides have ${overlap.mkString(", ")}")
    Salting.requireFreeColumns(left, Seq("_bin"), "intervalOverlap(left)")
    Salting.requireFreeColumns(right, Seq("_bin"), "intervalOverlap(right)")
    val w =
      if (binWidth > 0) binWidth
      else math.max(autoBinWidth(left, lStartCol, lEndCol),
        autoBinWidth(right, rStartCol, rEndCol))
    val (ls, le) = (lStartCol.cast("long"), lEndCol.cast("long"))
    val (rs, re) = (rStartCol.cast("long"), rEndCol.cast("long"))
    def binOf(c: Column): Column = floor(c.cast("double") / lit(w.toDouble)).cast("long")
    def explodeBins(df: DataFrame, s: Column, e: Column, side: String): DataFrame = {
      val nBins = binOf(e) - binOf(s) + lit(1L)
      // nBins < 1 = inverted interval — same loud failure as
      // pointInInterval (a descending `sequence` would explode unbounded)
      df.withColumn("_bin",
        explode(when(nBins > lit(maxBinsPerInterval.toLong) || nBins < lit(1L),
            raise_error(concat(
              lit(s"intervalOverlap($side): interval spans an invalid bin count ("), nBins,
              lit(s" bins of width $w — inverted end < start, or wider than maxBinsPerInterval=$maxBinsPerInterval)"))))
          .otherwise(sequence(binOf(s), binOf(e)))))
    }
    val lv = explodeBins(left, ls, le, "left")
    val rv = explodeBins(right, rs, re, "right")
    // canonical-bin equality picks the ONE shared bin that keeps an
    // overlapping pair; the exact predicate decides overlap itself
    lv.join(rv, lv("_bin") === rv("_bin") &&
        binOf(greatest(ls, rs)) === lv("_bin") && ls <= re && rs <= le)
      .drop("_bin")
  }
}
