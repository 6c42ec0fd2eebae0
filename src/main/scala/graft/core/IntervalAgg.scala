package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregated interval-overlap statistics WITHOUT materializing pairs —
  * the prefix-sum (sweep) rewrite of
  * `windows JOIN intervals ON overlap GROUP BY window`.
  *
  * [[RangeJoin.intervalOverlap]] produces the pair rows, which is the
  * right operator when the caller needs them — but when the query only
  * AGGREGATES per window (count / sum(measure) / sum(overlap length)),
  * the pair set is pure intermediate state, and it is the one thing in
  * the plan that grows QUADRATICALLY with density: doubling event rate
  * doubles both the windows and the intervals each window overlaps. At
  * 100 TB the pair stage is the bottleneck no bin width can fix.
  *
  * The sweep form computes every per-window aggregate from PREFIX SUMS
  * over the interval endpoints, O(W + P) total, no pairs ever:
  * with `S^m(t)` = Σ measure m over intervals with `start ≤ t` and
  * `E^m(t)` = the same over `end ≤ t` (m ∈ {count, measure, start,
  * end}), the intervals overlapping `[ws, we]` (`start ≤ we AND
  * end ≥ ws`, all bounds inclusive) are the set difference
  * `{start ≤ we} \ {end ≤ ws−1}` — the subtracted set is nested inside
  * the first because `end ≤ ws−1` implies `start ≤ end < ws ≤ we`. So
  *
  *   n        = S^c(we) − E^c(ws−1)
  *   Σ m      = S^m(we) − E^m(ws−1)
  *   Σ end    = S^e(we) − E^e(ws−1),  Σ start = S^s(we) − E^s(ws−1)
  *
  * and the clipped overlap length Σ min(we,end) − max(ws,start)
  * decomposes into those plus two STRADDLER corrections (intervals
  * crossing a probe point t form the nested difference
  * `{start ≤ t} \ {end ≤ t}`):
  *
  *   over(we)  = [S^e(we) − E^e(we)] − we·[S^c(we) − E^c(we)]
  *   under(ws) = ws·[S^c(ws−1) − E^c(ws−1)] − [S^s(ws−1) − E^s(ws−1)]
  *   Σ overlap = (Σ end − over(we)) − (Σ start + under(ws))
  *
  * Distribution: a prefix sum is a global order — the scalable form is
  * the two-level split. Endpoint and probe rows bucket by a time bin;
  * per-bin totals (≤ `bins` rows, metadata) take an exclusive running
  * sum in one tiny window; within each bin one partitioned window
  * accumulates rows ordered by `(t, is-probe)` (endpoints sort before
  * probes at equal t, matching the inclusive bounds); a probe's absolute
  * prefix = bin offset + in-bin running sum. Cost: two exchanges of
  * SKINNY endpoint/probe rows (2·P + 2·W of them) + one probe-count
  * exchange — independent of the pair count, the property that survives
  * a 100× density scale-up. Endpoint sums accumulate in DECIMAL(38,0)
  * (micros × millions of rows overflow BIGINT); the per-window
  * DIFFERENCES are output-sized and return to BIGINT.
  *
  * Contract: all bounds integral (epoch micros, ticks); both interval
  * ends inclusive; intervals or windows with NULL bounds are dropped;
  * inverted rows (end < start) FAIL LOUDLY like [[RangeJoin]]; windows
  * with zero overlaps are absent from the output (inner-join
  * semantics); `measureCol` must be non-null on kept interval rows
  * (sum semantics follow SQL otherwise). Output:
  * `(windowCols…, n_overlaps, measure_sum, overlap_len)`.
  *
  * Reference scope: like RangeJoin this extends the reference's surface
  * (jee51/tabata has no join layer); it is the aggregation-shaped twin
  * the event-attribution queries actually run.
  */
object IntervalAgg {

  private val Dec = "decimal(38,0)"

  def overlapStats(windows: DataFrame, intervals: DataFrame,
                   windowCols: Seq[String],
                   wStartCol: Column, wEndCol: Column,
                   iStartCol: Column, iEndCol: Column,
                   measureCol: Column,
                   bins: Int = 1024): DataFrame = {
    require(windowCols.nonEmpty, "overlapStats: windowCols must be non-empty")
    require(bins >= 1 && bins <= (1 << 20), "overlapStats: bins must be in [1, 2^20]")
    val reserved = Seq("_t", "_p", "_bin", "_ws", "_we",
      "cs", "ts", "aes", "ass", "ce", "te", "aee", "ase",
      "n_overlaps", "measure_sum", "overlap_len")
    val clash = windowCols.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"overlapStats: window column(s) ${clash.mkString(", ")} collide with working/output names")

    // ---- interval endpoint rows: 8 running measures, zero-padded ----
    val iv = intervals
      .select(iStartCol.cast("long").as("_s"), iEndCol.cast("long").as("_e"),
        measureCol.cast("long").as("_m"))
      .filter(col("_s").isNotNull && col("_e").isNotNull)
      .withColumn("_e", when(col("_e") < col("_s"),
          raise_error(concat(lit("overlapStats: inverted interval (end "), col("_e"),
            lit(" < start "), col("_s"), lit(")"))).cast("long"))
        .otherwise(col("_e")))
    val zero = lit(0).cast(Dec)
    def dec(c: Column) = c.cast(Dec)
    // both endpoint rows of an interval come out of ONE scan (explode of
    // a 2-struct array) — a union of two selects would read the interval
    // source twice
    val endpoints = iv.select(explode(array(
        struct(col("_s").as("_t"), lit(0).as("_p"),
          dec(lit(1)).as("cs"), dec(col("_m")).as("ts"), dec(col("_e")).as("aes"),
          dec(col("_s")).as("ass"), zero.as("ce"), zero.as("te"), zero.as("aee"),
          zero.as("ase")),
        struct(col("_e").as("_t"), lit(0).as("_p"),
          zero.as("cs"), zero.as("ts"), zero.as("aes"), zero.as("ass"),
          dec(lit(1)).as("ce"), dec(col("_m")).as("te"), dec(col("_e")).as("aee"),
          dec(col("_s")).as("ase")))).as("r"))
      .select(col("r.*"))

    // ---- probe rows: two per window (at we, and at ws-1) ----
    val wids = windowCols.map(col)
    val wv = windows
      .select(wids ++ Seq(wStartCol.cast("long").as("_ws"),
        wEndCol.cast("long").as("_we")): _*)
      .filter(col("_ws").isNotNull && col("_we").isNotNull)
      .withColumn("_we", when(col("_we") < col("_ws"),
          raise_error(concat(lit("overlapStats: inverted window (end "), col("_we"),
            lit(" < start "), col("_ws"), lit(")"))).cast("long"))
        .otherwise(col("_we")))
    val measure0 = Seq("cs", "ts", "aes", "ass", "ce", "te", "aee", "ase")
      .map(n => zero.as(n))
    // same single-scan trick for the two probes of each window
    val probes2 = wv.select(Seq(explode(array(
        struct(col("_we").as("_t"), lit(1).as("_p")),
        struct((col("_ws") - 1).as("_t"), lit(2).as("_p")))).as("r")) ++
        wids ++ Seq(col("_ws"), col("_we")): _*)
      .select(Seq(col("r._t").as("_t"), col("r._p").as("_p")) ++ measure0 ++
        wids.map(c => c) ++ Seq(col("_ws"), col("_we")): _*)
    val nullWid = windowCols.map(n => lit(null).as(n))
    val evAll = endpoints
      .select(Seq(col("_t"), col("_p")) ++
        Seq("cs", "ts", "aes", "ass", "ce", "te", "aee", "ase").map(col) ++
        nullWid ++ Seq(lit(null).cast("long").as("_ws"),
          lit(null).cast("long").as("_we")): _*)
    val all = evAll.unionByName(probes2)

    // ---- time bin: parallelism only — the result is bin-independent ----
    val rng = all.agg(min(col("_t")).as("mn"), max(col("_t")).as("mx")).head()
    if (rng.isNullAt(0))
      return wv.limit(0).select(wids ++ Seq(lit(0L).as("n_overlaps"),
        lit(0L).as("measure_sum"), lit(0L).as("overlap_len")): _*)
    val (tMin, tMax) = (rng.getLong(0), rng.getLong(1))
    val binW = math.max(1L, (tMax - tMin) / bins + 1)
    val binned = all.withColumn("_bin", ((col("_t") - lit(tMin)) / lit(binW))
      .cast("long"))

    val ms = Seq("cs", "ts", "aes", "ass", "ce", "te", "aee", "ase")

    // ---- per-bin EXCLUSIVE offsets: metadata-sized (≤ bins+1 rows) ----
    val wBins = Window.orderBy(col("_bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = binned.groupBy(col("_bin"))
      .agg(ms.map(m => sum(col(m)).as(m)).head, ms.tail.map(m => sum(col(m)).as(m)): _*)
      .select(Seq(col("_bin")) ++
        ms.map(m => coalesce(sum(col(m)).over(wBins), zero).as(s"o_$m")): _*)

    // ---- in-bin running sums; endpoints (_p=0) sort before probes ----
    val wIn = Window.partitionBy(col("_bin")).orderBy(col("_t"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = binned.select(
      Seq(col("_bin"), col("_p"), col("_ws"), col("_we")) ++ wids ++
        ms.map(m => sum(col(m)).over(wIn).as(m)): _*)
    val probes = run.filter(col("_p") > 0)
      .join(broadcast(offsets), Seq("_bin"))
      .select(Seq(col("_p"), col("_ws"), col("_we")) ++ wids ++
        ms.map(m => (col(m) + col(s"o_$m")).as(m)): _*)

    // ---- fold the two probes of each window and apply the identities ----
    def at(p: Int, m: String) = max(when(col("_p") === p, col(m)))
    val agg = probes.groupBy(wids: _*).agg(
      min(col("_ws")).as("_ws"),
      Seq(min(col("_we")).as("_we")) ++
        ms.flatMap(m => Seq(at(1, m).as(s"${m}_hi"), at(2, m).as(s"${m}_lo"))): _*)
    val wsD = dec(col("_ws"))
    val weD = dec(col("_we"))
    val n = col("cs_hi") - col("ce_lo")
    val msum = col("ts_hi") - col("te_lo")
    val sumAe = col("aes_hi") - col("aee_lo")
    val sumAs = col("ass_hi") - col("ase_lo")
    val over = (col("aes_hi") - col("aee_hi")) - weD * (col("cs_hi") - col("ce_hi"))
    val under = wsD * (col("cs_lo") - col("ce_lo")) - (col("ass_lo") - col("ase_lo"))
    agg
      .withColumn("n_overlaps", n.cast("long"))
      .withColumn("measure_sum", msum.cast("long"))
      .withColumn("overlap_len", ((sumAe - over) - (sumAs + under)).cast("long"))
      .filter(col("n_overlaps") > 0)
      .select(wids ++ Seq(col("n_overlaps"), col("measure_sum"),
        col("overlap_len")): _*)
  }
}
