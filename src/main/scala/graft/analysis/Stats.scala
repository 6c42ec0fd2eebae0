package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order statistics with a PINNED interpolation formula, so independent
  * engines reproduce the result bit-for-bit — `percentile_approx` (and
  * every engine's `quantile_cont`) is free to differ in accumulation
  * details; this one is the contract:
  *
  *   rank = p·(n−1)   (double; both factors exact),
  *   lo = ⌊rank⌋, frac = rank − lo,
  *   q  = v[lo] + (v[lo+1] − v[lo])·frac   (0-based sorted order,
  *        v[lo+1] falling back to v[lo] at the top edge)
  *
  * — the standard linear-interpolation definition (type-7 in the
  * Hyndman–Fan taxonomy), evaluated in exactly this operation order.
  * Ties cost nothing: equal values make the sorted-value sequence
  * deterministic regardless of row order.
  */
object Stats {

  /** The Stats-family broadcast switch: every per-group metadata table
    * in this file (bounds, bin counts, located targets, needed bins,
    * clip/scale bounds, bucket boundaries) is one-to-few rows PER
    * GROUP, so for the usual dozens-to-thousands of groups a forced
    * `broadcast()` is right — the corpus never shuffles for a lookup.
    * But the tables grow with group cardinality (worst: groups × nBins
    * cumulative rows), and with MILLIONS of group keys (per-domain,
    * per-user) a forced broadcast is a driver/executor OOM where a
    * shuffle join merely slows down.
    *
    * `Auto` — the default since round 15 — derives the flip from the
    * data: ONE capped distinct-count probe of the group columns at plan
    * build (`limit(max+1)`, so the probe job transfers at most
    * [[AutoBroadcastMaxGroups]]+1 rows), broadcast iff the cardinality
    * fits. The probe is an EAGER narrow job (group columns only,
    * map-side-combined distinct) — callers who know their cardinality
    * pass `Force`/`Never` and pay nothing. Results are bit-identical
    * under all three modes — the hint is a plan device, never
    * semantics (pinned by StatsSpec's three-mode twin).
    */
  sealed trait Bcast
  object Bcast {
    /** Probe group cardinality once, broadcast iff ≤ [[AutoBroadcastMaxGroups]]. */
    case object Auto extends Bcast
    /** Always hint broadcast (the pre-round-15 default). */
    case object Force extends Bcast
    /** Never hint; Catalyst/AQE picks the join. */
    case object Never extends Bcast
  }

  /** `Auto` flip point. 32k groups keeps the O(groups) tables (bounds,
    * targets) at single-digit MB; the O(groups × occupied-bins)
    * cumulative tables are the real risk and they grow past broadcast
    * comfort right around this cardinality at the default nBins.
    */
  val AutoBroadcastMaxGroups: Int = 32768

  private def resolveBcast(mode: Bcast, probe: DataFrame,
                           groupCols: Seq[String]): Boolean = mode match {
    case Bcast.Force => true
    case Bcast.Never => false
    case Bcast.Auto =>
      groupCols.isEmpty || {
        val n = probe.select(groupCols.map(col): _*).distinct()
          .limit(AutoBroadcastMaxGroups + 1).count()
        n <= AutoBroadcastMaxGroups
      }
  }

  private def hint(df: DataFrame, bcast: Boolean): DataFrame =
    if (bcast) broadcast(df) else df

  /** Exact interpolated quantiles of `valueCol` per group: one row per
    * `(groupCols…, p)` with `q` rounded to 6.
    *
    * Plan shape — two-pass crossing-bin extraction, NO full per-group
    * sort (the round-12 exactness premium, closed): pass 1 aggregates
    * per-group min/max/n, pass 2 aggregates equal-width bin counts
    * (both map-side combined to ≤ groups × nBins rows before any
    * exchange — the [[binnedQuantiles]] count table, reused here to
    * LOCATE rather than approximate). Each target rank `p·(n−1)` needs
    * the order statistics at ⌊rank⌋ and ⌊rank⌋+1; the cumulative bin
    * table pins each one to its crossing bin and an in-bin offset, so
    * pass 3 sorts ONLY the crossing-bin rows (expected n/nBins per
    * needed bin, ≤ 2·|ps| bins per group) under a (group, bin) window.
    * Bin membership is a pure function of the value, so per-bin sorted
    * order concatenates to global sorted order and ties (equal values,
    * equal bin) cannot perturb the extracted value — the result is
    * bit-identical to a full per-group sort, at a vanishing fraction of
    * its cost when groups are corpus-sized.
    *
    * NULLs are DROPPED before ranking (standard quantile semantics) —
    * otherwise nulls would count into n and rank differently across
    * engines, silently breaking the cross-engine contract. NULL group
    * KEYS are dropped too (the bin-count passes are equi-joins on the
    * group columns, standard SQL null semantics) — group keys must be
    * non-null, the same contract [[equiDepthHistogram]] always had.
    * Values must be FINITE: a ±Inf value makes the bin width
    * ill-defined (engines disagree on Inf/Inf), and NaN never had a
    * portable rank. `ps` is expected metadata-sized (the locator join
    * compares ≤ 2·|ps| targets against ≤ nBins count rows per group);
    * thousands of ps on thousands of bins would make locating cost what
    * sorting saved — use [[quantilesSorted]] there.
    *
    * `broadcastBounds` (default [[Bcast.Auto]]) picks the join plan for
    * the per-group metadata tables from a one-job cardinality probe;
    * `Force`/`Never` skip the probe when the caller knows the group
    * cardinality. Same result under every mode (see [[Bcast]]).
    */
  def quantiles(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                ps: Seq[Double], nBins: Int = 4096,
                broadcastBounds: Bcast = Bcast.Auto): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "quantiles: ps must be within [0, 1]")
    require(nBins >= 2 && nBins <= 65536,
      "quantiles: nBins must be in [2, 65536]")
    val reserved = Seq("_v", "_mn", "_mx", "_n", "_bin", "_c", "_cum",
      "_rank", "_lo", "_frac", "_idx", "_w", "_j", "p", "q")
    val clash = groupCols.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"quantiles: group column(s) ${clash.mkString(", ")} collide with working names")
    val bb = resolveBcast(broadcastBounds, df, groupCols)
    val gs = groupCols.map(col)
    val v = df.select(gs :+ valueCol.cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
    // Pass 1: per-group bounds + count (map-side combined to one row/group).
    val bounds = v.groupBy(gs: _*)
      .agg(min(col("_v")).as("_mn"), max(col("_v")).as("_mx"),
        count(lit(1)).as("_n"))
    val width = (col("_mx") - col("_mn")) / lit(nBins.toDouble)
    val binOf = when(col("_mx") === col("_mn"), lit(0L))
      .otherwise(least(floor((col("_v") - col("_mn")) / width).cast("long"),
        lit(nBins - 1L)))
    // Pass 2: bin counts (map-side combined to ≤ groups × nBins rows).
    val cnts = v.join(hint(bounds, bb), groupCols)
      .withColumn("_bin", binOf)
      .groupBy(gs :+ col("_bin"): _*).agg(count(lit(1)).as("_c"))
    val cum = cnts.withColumn("_cum",
      sum(col("_c")).over(Window.partitionBy(gs: _*).orderBy(col("_bin"))))
    // Targets: (group, p) → the global 0-based indices ⌊rank⌋ ("a") and
    // ⌊rank⌋+1 ("b", only when it exists). Identical operation order to
    // the pinned formula: rank = p·(n−1) as double, lo = floor, frac =
    // rank − lo (long→double promotion), so the hash cannot move.
    val targets = bounds
      .select(gs ++ Seq(col("_n"),
        explode(array(ps.map(lit): _*)).as("p")): _*)
      .withColumn("_rank", col("p") * (col("_n") - 1).cast("double"))
      .withColumn("_lo", floor(col("_rank")))
      .withColumn("_frac", col("_rank") - col("_lo"))
      .select(gs ++ Seq(col("p"), col("_frac"), col("_n"),
        explode(array(
          struct(col("_lo").as("_idx"), lit("a").as("_w")),
          struct((col("_lo") + 1).as("_idx"), lit("b").as("_w")))).as("_t")): _*)
      .select(gs ++ Seq(col("p"), col("_frac"),
        col("_t._idx").as("_idx"), col("_t._w").as("_w"), col("_n")): _*)
      .filter(col("_idx") <= col("_n") - 1)
      .drop("_n")
    // Locate each target index's crossing bin + in-bin offset over the
    // metadata-sized cumulative table: cumBefore ≤ idx < cum is unique.
    val cumR = cum.select(
      (groupCols.map(g => col(g).as(s"__g_$g")) ++
        Seq(col("_bin"), col("_c"), col("_cum"))): _*)
    val located = targets.join(hint(cumR, bb),
        groupCols.map(g => col(g) === col(s"__g_$g")).reduce(_ && _) &&
          (col("_cum") - col("_c")) <= col("_idx") && col("_idx") < col("_cum"))
      .withColumn("_j", col("_idx") - (col("_cum") - col("_c")))
      .select(gs ++ Seq(col("_bin"), col("_j"), col("p"), col("_frac"), col("_w")): _*)
    val needed = located.select(gs :+ col("_bin"): _*).distinct()
    // Pass 3: restrict the corpus to needed bins (broadcast semi-shaped
    // join), sort ONLY those rows under a (group, bin) window, and pull
    // the located offsets.
    val wBin = Window.partitionBy(gs :+ col("_bin"): _*).orderBy(col("_v"))
    val crossing = v.join(hint(bounds, bb), groupCols)
      .withColumn("_bin", binOf)
      .join(hint(needed, bb), groupCols :+ "_bin")
      .withColumn("_j", row_number().over(wBin) - lit(1L))
      .select(gs ++ Seq(col("_bin"), col("_j"), col("_v")): _*)
    crossing.join(hint(located, bb), groupCols ++ Seq("_bin", "_j"))
      .groupBy(gs :+ col("p"): _*)
      .agg(
        min(when(col("_w") === "a", col("_v"))).as("_a"),
        min(when(col("_w") === "b", col("_v"))).as("_b"),
        min(col("_frac")).as("_f"))
      .withColumn("q",
        round(col("_a") + (coalesce(col("_b"), col("_a")) - col("_a")) * col("_f"), 6))
      .select(gs ++ Seq(col("p"), col("q")): _*)
  }

  /** [[quantiles]] for METADATA-SIZED inputs (a sketch, a sample, a
    * boundary table — anything already reduced to ≲ thousands of rows
    * per group): the classic one-window plan — rank every row in one
    * in-partition sort, keep the two candidates per (group, p),
    * aggregate. Identical pinned type-7 result to [[quantiles]] (same
    * formula, same operation order, same rounding — callers may swap
    * freely without moving a hash); different cost model: the full sort
    * is FREE at sketch size while the crossing-bin plan's three scans +
    * locator joins are pure overhead there (measured: the kmv sketch
    * rows regressed 0.6 → 1.6 s on the two-pass plan at sf0.1). Use
    * [[quantiles]] when groups are corpus-sized, this when the input is
    * already small by construction.
    */
  def quantilesSorted(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "quantilesSorted: ps must be within [0, 1]")
    val gs = groupCols.map(col)
    val w = Window.partitionBy(gs: _*).orderBy(col("_v"))
    val wAll = Window.partitionBy(gs: _*)
    // NULLs dropped before ranking — same contract as [[quantiles]]
    val ranked = df
      .select(gs :+ valueCol.cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
      .withColumn("_i", row_number().over(w) - 1)
      .withColumn("_n", count(lit(1)).over(wAll))
    val cand = ranked
      .select(gs ++ Seq(col("_v"), col("_i"), col("_n"),
        explode(array(ps.map(lit): _*)).as("p")): _*)
      .withColumn("_rank", col("p") * (col("_n") - 1).cast("double"))
      .withColumn("_lo", floor(col("_rank")))
      .filter(col("_i") === col("_lo") || col("_i") === col("_lo") + 1)
    cand
      .groupBy(gs :+ col("p"): _*)
      .agg(
        min(when(col("_i") === col("_lo"), col("_v"))).as("_a"),
        min(when(col("_i") === col("_lo") + 1, col("_v"))).as("_b"),
        min(col("_rank") - col("_lo")).as("_frac"))
      .withColumn("q",
        round(col("_a") + (coalesce(col("_b"), col("_a")) - col("_a")) * col("_frac"), 6))
      .select(gs ++ Seq(col("p"), col("q")): _*)
  }

  /** Deterministic APPROXIMATE quantiles via fixed-count equi-width
    * value bins — the documented swap for [[quantiles]] when groups are
    * corpus-sized and a bounded rank error is acceptable, made
    * hash-gradeable the same way [[Sketches.kmvQuantiles]] is: the
    * estimator is a PINNED pure function of the data, so two engines
    * agree bit-for-bit on the estimate even though it approximates the
    * exact answer.
    *
    * Estimator (pinned): per group, bin the non-null values into
    * `nBins` equal-width bins over [min, max]
    * (`bin = min(⌊(v−mn)/w⌋, nBins−1)`, `w = (mx−mn)/nBins`; all values
    * in bin 0 when mx == mn), take the type-7 rank `r = p·(n−1)`, find
    * the unique bin with `cumBefore ≤ r < cum`, and interpolate
    * uniformly inside it:
    * `q = mn + w·(bin + (r − cumBefore)/cnt)`, rounded to 6.
    * Rank error is bounded by the crossing bin's mass (a value moved
    * anywhere within its bin cannot cross a bin edge), which the spec
    * pins against the exact [[quantiles]] on random data.
    *
    * Plan shape — the reason this exists: NO sort anywhere, not even a
    * crossing-bin one. Two data scans (min/max, then bin counts), BOTH
    * map-side combined to ≤ groups × nBins rows before any exchange;
    * the cumulative pass and probe selection run over that
    * metadata-sized bin table. The exact [[quantiles]] pays a third
    * scan plus a narrow crossing-bin sort; this estimator answers from
    * the count table alone — the two-scan floor for a rank statistic.
    */
  /** The pinned bin-assignment rule shared by every binned path (batch
    * AND streaming — [[graft.streaming.StreamOps.streamingBinCounts]]
    * reuses it so stream and batch agree on what a bin is): expects
    * `_v`, `_mn`, `_mx` in scope.
    */
  private[graft] def binIndex(nBins: Int): Column =
    when(col("_mx") === col("_mn"), lit(0L))
      .otherwise(least(
        floor((col("_v") - col("_mn")) /
          ((col("_mx") - col("_mn")) / lit(nBins.toDouble))).cast("long"),
        lit(nBins - 1L)))

  def binnedQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                      ps: Seq[Double], nBins: Int = 4096,
                      broadcastBounds: Bcast = Bcast.Auto): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "binnedQuantiles: ps must be within [0, 1]")
    require(nBins >= 2 && nBins <= 65536,
      "binnedQuantiles: nBins must be in [2, 65536]")
    val bb = resolveBcast(broadcastBounds, df, groupCols)
    val gs = groupCols.map(col)
    val v = df.select(gs :+ valueCol.cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
    val bounds = v.groupBy(gs: _*)
      .agg(min(col("_v")).as("_mn"), max(col("_v")).as("_mx"))
    val cnts = v.join(hint(bounds, bb), groupCols)
      .withColumn("_bin", binIndex(nBins))
      .groupBy(gs :+ col("_bin"): _*).agg(count(lit(1)).as("_c"))
    binnedQuantilesFromCounts(cnts, bounds, groupCols, ps, nBins,
      if (bb) Bcast.Force else Bcast.Never)
  }

  /** The estimator half of [[binnedQuantiles]], answering from an
    * already-built `(groupCols…, _bin, _c)` count table plus its
    * `(groupCols…, _mn, _mx)` bounds — IDENTICAL pinned formula (the
    * batch operator routes through here), factored out so a count table
    * maintained ELSEWHERE (a streaming stateful aggregation, a landed
    * artifact fold) grades against the same oracle. The count table is
    * register-bounded (≤ groups × nBins rows), which is the whole
    * streaming story: the state a stream must carry is this table, and
    * nothing about the data's row count.
    */
  def binnedQuantilesFromCounts(cnts: DataFrame, bounds: DataFrame,
                                groupCols: Seq[String], ps: Seq[Double],
                                nBins: Int,
                                broadcastBounds: Bcast = Bcast.Auto): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "binnedQuantilesFromCounts: ps must be within [0, 1]")
    val bb = resolveBcast(broadcastBounds, cnts, groupCols)
    val gs = groupCols.map(col)
    val width = (col("_mx") - col("_mn")) / lit(nBins.toDouble)
    val wOrd = Window.partitionBy(gs: _*).orderBy(col("_bin"))
    val wAll = Window.partitionBy(gs: _*)
    val cum = cnts
      .withColumn("_cum", sum(col("_c")).over(wOrd))
      .withColumn("_n", sum(col("_c")).over(wAll))
    cum
      .select(gs ++ Seq(col("_bin"), col("_c"), col("_cum"), col("_n"),
        explode(array(ps.map(lit): _*)).as("p")): _*)
      .withColumn("_r", col("p") * (col("_n") - 1).cast("double"))
      // unique crossing bin: cumBefore <= r < cum (empty bins are absent
      // from the count table, so cnt > 0 in the kept row by construction)
      .filter((col("_cum") - col("_c")).cast("double") <= col("_r") &&
        col("_r") < col("_cum").cast("double"))
      .join(hint(bounds, bb), groupCols)
      .withColumn("q", round(col("_mn") + width *
        (col("_bin").cast("double") +
          (col("_r") - (col("_cum") - col("_c")).cast("double")) /
            col("_c").cast("double")), 6))
      .select(gs ++ Seq(col("p"), col("q")): _*)
  }

  /** Weighted quantiles of `valueCol` per group under `weightCol`, the
    * importance-sampling / score-threshold primitive (e.g. "the value
    * below which p of the corpus's WEIGHT MASS lies" for DSIR-style
    * selection): one row per `(groupCols…, p)` with `q` = the smallest
    * value whose cumulative weight reaches `p·W` (the lower weighted
    * quantile — a SELECTED data value, no interpolation, so the result
    * is portable by construction).
    *
    * Pinned estimator: weights quantize to 1e-6 BIGINT ticks
    * (`round(w·1e6)`, half-up) so every cumulative sum is INTEGER
    * arithmetic — immune to float summation order, the same tick
    * discipline as [[graft.dsp.SignalOps.outliers]] and PageRank. The
    * target is `t = max(p·W_ticks, 1)` evaluated in double (the `max`
    * pins p = 0 to "the smallest value carrying positive weight" and is
    * a no-op for every t in (0, 1]); `q_p = min{v : cumTicks(v) ≥ t}`
    * where cumTicks is over per-VALUE weight sums (ties collapse before
    * the cumulative, so row order cannot matter); q rounds to 6.
    * Zero-weight rows are never selected; a group whose total weight is
    * zero vanishes. Weights must be ≥ 0 and ≤ 9e12 — a negative weight
    * makes cumulative mass non-monotone, a larger one overflows the
    * long tick range; both raise at RUN TIME on the RAW double, before
    * quantization (raise_error in the corpus pass, the
    * [[graft.core.RangeJoin]] guard convention), so a weight in
    * (−5e-7, 0) cannot round to 0 ticks and slip through.
    * NULL values/weights drop like [[quantiles]]; same finite-value and
    * metadata-sized-`ps` contract.
    *
    * Plan shape — collapse to the PER-VALUE table first, then the
    * [[quantiles]] crossing-bin recipe on weight mass: the corpus is
    * touched by ONE map-side-combined aggregation to (group, value,
    * ticks) — the definition's own domain, and on real measure columns
    * (bounded precision) orders of magnitude smaller than the row count
    * (17.8k distinct values over 10M sf10 event rows, measured) — and
    * every later stage (bounds, bin sums, cumulative, locate,
    * crossing-bin selection) runs over that table. High-cardinality
    * values stay safe: the crossing-bin locate still means no per-group
    * sort of the value table; only crossing-bin values feed the in-bin
    * cumulative. Rewriting from raw-row bin sums to the per-value-first
    * shape took the sf10 cell 2.70 → sub-second-class (the raw shape
    * paid three corpus scans for a table the first combine collapses).
    */
  def weightedQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                        weightCol: Column, ps: Seq[Double],
                        nBins: Int = 4096,
                        broadcastBounds: Bcast = Bcast.Auto,
                        scope: graft.core.CacheScope =
                          graft.core.CacheScope.session): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "weightedQuantiles: ps must be within [0, 1]")
    require(nBins >= 2 && nBins <= 65536,
      "weightedQuantiles: nBins must be in [2, 65536]")
    val reserved = Seq("_v", "_w", "_mn", "_mx", "_tw", "_bin", "_c", "_cum",
      "_t", "_j", "_cv", "p", "q")
    val clash = groupCols.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"weightedQuantiles: group column(s) ${clash.mkString(", ")} collide with working names")
    val gs = groupCols.map(col)
    // THE one corpus pass: per-(group, value) tick sums, map-side
    // combined — the definition's own domain, every later stage runs
    // over this table. The negative-weight guard rides the same pass.
    // Loud run-time guards on the RAW double, before tick quantization —
    // a weight in (−5e-7, 0) would otherwise round to 0 ticks and pass
    // silently despite violating the ≥ 0 contract, and |w| beyond the
    // long tick range (~9.2e12 after ×1e6) would silently overflow the
    // cast (advisor, round 13).
    val wRaw = weightCol.cast("double")
    // NaN first: both range comparisons are false for NaN, so without
    // this branch a NaN weight would quantize to 0 ticks and silently
    // drop its row's mass despite the loud-guard contract (advisor,
    // round 14).
    val wTicks = when(isnan(wRaw),
        raise_error(lit("weightedQuantiles: NaN weight")))
      .when(wRaw < 0,
        raise_error(concat(lit("weightedQuantiles: negative weight "),
          wRaw.cast("string"))))
      .when(wRaw > 9.0e12,
        raise_error(concat(lit("weightedQuantiles: weight overflows 1e-6 ticks: "),
          wRaw.cast("string"))))
      .otherwise(round(wRaw * lit(1e6)).cast("long"))
    // CACHED (via `scope`, the [[graft.core.CacheScope]] convention):
    // five downstream stages consume pv (bounds, bin sums, total mass,
    // needed-bin restriction, crossing-bin cumulative), and Spark's
    // exchange reuse does not deduplicate them — uncached, the plan
    // re-scans the CORPUS once per consumer (measured: 8 FileScans at
    // sf0.1, the entire reason this row trailed a single-scan oracle).
    // The cached table is per-(group, value) — bounded by distinct
    // measure values, not rows (17.8k at sf10) — so storage is
    // metadata-sized by the same argument that made it the plan's hub.
    val pv = scope.cache(df
      .select(gs ++ Seq(valueCol.cast("double").as("_v"), wTicks.as("_w")): _*)
      .filter(col("_v").isNotNull && col("_w").isNotNull)
      .groupBy(gs :+ col("_v"): _*).agg(sum(col("_w")).as("_cv")))
    // Auto-probe over the CACHED per-(group, value) table: its
    // materialization is the corpus pass the plan pays anyway, so the
    // cardinality probe costs one metadata-sized job on top
    val bb = resolveBcast(broadcastBounds, pv, groupCols)
    val bounds = pv.groupBy(gs: _*)
      .agg(min(col("_v")).as("_mn"), max(col("_v")).as("_mx"),
        sum(col("_cv")).as("_tw"))
      .filter(col("_tw") > 0)
    val width = (col("_mx") - col("_mn")) / lit(nBins.toDouble)
    val binOf = when(col("_mx") === col("_mn"), lit(0L))
      .otherwise(least(floor((col("_v") - col("_mn")) / width).cast("long"),
        lit(nBins - 1L)))
    val cnts = pv.join(hint(bounds, bb), groupCols)
      .withColumn("_bin", binOf)
      .groupBy(gs :+ col("_bin"): _*).agg(sum(col("_cv")).as("_c"))
    val cum = cnts.withColumn("_cum",
      sum(col("_c")).over(Window.partitionBy(gs: _*).orderBy(col("_bin"))))
    // target mass per (group, p), double like the oracle: t = max(p·W, 1)
    val targets = bounds
      .select(gs ++ Seq(col("_tw"), explode(array(ps.map(lit): _*)).as("p")): _*)
      .withColumn("_t", greatest(col("p") * col("_tw").cast("double"), lit(1.0)))
      .select(gs ++ Seq(col("p"), col("_t")): _*)
    // crossing bin: first bin whose running mass reaches t
    val cumR = cum.select(
      (groupCols.map(g => col(g).as(s"__g_$g")) ++
        Seq(col("_bin"), col("_c"), col("_cum"))): _*)
    val located = targets.join(hint(cumR, bb),
        groupCols.map(g => col(g) === col(s"__g_$g")).reduce(_ && _) &&
          (col("_cum") - col("_c")).cast("double") < col("_t") &&
          col("_t") <= col("_cum").cast("double"))
      .select(gs ++ Seq(col("_bin"), col("p"), col("_t"),
        (col("_cum") - col("_c")).as("_base")): _*)
    val needed = located.select(gs :+ col("_bin"): _*).distinct()
    // final stage: the in-bin cumulative over ONLY the crossing-bin
    // slice of the per-value table
    val wVal = Window.partitionBy(gs :+ col("_bin"): _*).orderBy(col("_v"))
    val crossing = pv.join(hint(bounds, bb), groupCols)
      .withColumn("_bin", binOf)
      .join(hint(needed, bb), groupCols :+ "_bin")
      .withColumn("_j", sum(col("_cv")).over(wVal))
    crossing.join(hint(located, bb), groupCols :+ "_bin")
      .filter((col("_base") + col("_j")).cast("double") >= col("_t"))
      .groupBy(gs :+ col("p"): _*)
      .agg(round(min(col("_v")), 6).as("q"))
      .select(gs ++ Seq(col("p"), col("q")): _*)
  }

  /** Winsorize `valueCol` per group: clip to the exact type-7
    * [pLo, pHi] quantiles of its own group — the standard outlier-clip
    * before training (feature robustness / reward clipping / score
    * normalization). Returns `df`'s columns plus `outCol` = the clipped
    * double; NULL values stay NULL (a NULL must not become a bound —
    * pinned with an explicit null gate because both engines'
    * least/greatest SKIP nulls rather than propagate them). Group keys
    * must be non-null (broadcast equi-join, the [[quantiles]]
    * contract); a group too small for meaningful tails still clips
    * exactly (p interpolates its pinned formula regardless).
    *
    * Plan shape: the [[quantiles]] passes (no full per-group sort) +
    * ONE broadcast join of the metadata-sized (group, lo, hi) bound
    * table back onto the corpus — the corpus never shuffles for the
    * clip itself.
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                outCol: String, pLo: Double, pHi: Double,
                broadcastBounds: Bcast = Bcast.Auto): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"winsorize: need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    require(!df.columns.contains(outCol),
      s"winsorize: output column $outCol already exists in the input")
    val wClash = df.columns.toSet.intersect(Set("_qlo", "_qhi"))
    require(wClash.isEmpty,
      s"winsorize: input column(s) ${wClash.mkString(", ")} collide with working names")
    val bb = resolveBcast(broadcastBounds, df, groupCols)
    val gs = groupCols.map(col)
    val qs = quantiles(df, groupCols, valueCol, Seq(pLo, pHi),
        broadcastBounds = if (bb) Bcast.Force else Bcast.Never)
      .groupBy(gs: _*)
      .agg(min(when(col("p") === pLo, col("q"))).as("_qlo"),
        max(when(col("p") === pHi, col("q"))).as("_qhi"))
    df.join(hint(qs, bb), groupCols)
      .withColumn(outCol,
        when(valueCol.isNotNull,
          least(greatest(valueCol.cast("double"), col("_qlo")), col("_qhi"))))
      .drop("_qlo", "_qhi")
  }

  /** Robust-scale `valueCol` per group: `(v − median) / IQR` with the
    * exact type-7 [p25, p50, p75] of its own group — the
    * outlier-insensitive feature standardization (sklearn's
    * RobustScaler semantics), the scaling you use where a z-score's
    * mean/std would be dragged by the tails the pipeline hasn't clipped
    * yet. Returns `df`'s columns plus `outCol` (rounded 6). Pinned
    * edges: NULL values stay NULL; a ZERO-IQR group (≥ half the mass on
    * one value) yields NULL — a 0/0 convention two engines would
    * otherwise disagree on, and an honest "this group has no robust
    * scale" signal. Group keys non-null, the [[quantiles]] contract.
    *
    * Plan shape: the [[quantiles]] passes + ONE broadcast join of the
    * metadata-sized (group, med, iqr) table — the corpus never shuffles
    * for the scaling itself, same shape as [[winsorize]].
    */
  def robustScale(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                  outCol: String,
                  broadcastBounds: Bcast = Bcast.Auto): DataFrame = {
    require(!df.columns.contains(outCol),
      s"robustScale: output column $outCol already exists in the input")
    val rClash = df.columns.toSet.intersect(Set("_q1", "_med", "_q3"))
    require(rClash.isEmpty,
      s"robustScale: input column(s) ${rClash.mkString(", ")} collide with working names")
    val bb = resolveBcast(broadcastBounds, df, groupCols)
    val gs = groupCols.map(col)
    val qs = quantiles(df, groupCols, valueCol, Seq(0.25, 0.5, 0.75),
        broadcastBounds = if (bb) Bcast.Force else Bcast.Never)
      .groupBy(gs: _*)
      .agg(min(when(col("p") === 0.25, col("q"))).as("_q1"),
        min(when(col("p") === 0.5, col("q"))).as("_med"),
        max(when(col("p") === 0.75, col("q"))).as("_q3"))
    df.join(hint(qs, bb), groupCols)
      .withColumn(outCol,
        when(valueCol.isNotNull && col("_q3") =!= col("_q1"),
          round((valueCol.cast("double") - col("_med")) / (col("_q3") - col("_q1")), 6)))
      .drop("_q1", "_med", "_q3")
  }

  /** Equi-depth histogram of `valueCol` per group: `nBuckets` buckets
    * bounded by the PINNED interior quantiles (p = i/nBuckets), one row
    * per non-empty `(groupCols…, bucket)` with the bucket's row count
    * and observed `[lo, hi]` (rounded 6). The bucket rule is pinned too:
    * a value equal to a boundary goes UP (`bucket = #{q_j : v ≥ q_j}`),
    * so ties at a boundary land identically in any engine. Heavy ties
    * make buckets uneven by nature (an equi-depth histogram cannot split
    * a tie group); NULL values are dropped like [[quantiles]].
    *
    * This is the feature-discretization / data-profiling primitive
    * (quantile binning): the boundary table is metadata-sized
    * (groups × (nBuckets−1)) and BROADCAST into one assignment scan —
    * the corpus never shuffles for the assignment, only for the
    * final (group, bucket) count, which map-side combines. The exact
    * boundary computation pays [[quantiles]]'s crossing-bin passes;
    * corpus-sized groups that tolerate approximation swap in
    * `approx_percentile` boundaries upstream.
    */
  def equiDepthHistogram(df: DataFrame, groupCols: Seq[String],
                         valueCol: Column, nBuckets: Int,
                         broadcastBounds: Bcast = Bcast.Auto): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 4096,
      "equiDepthHistogram: nBuckets must be in [2, 4096]")
    val reserved = Seq("_v", "_qs", "bucket", "n", "lo", "hi")
    val clash = groupCols.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"equiDepthHistogram: group column(s) ${clash.mkString(", ")} collide with output/working names")
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val bb = resolveBcast(broadcastBounds, df, groupCols)
    val gs = groupCols.map(col)
    val bounds = quantiles(df, groupCols, valueCol, ps,
        broadcastBounds = if (bb) Bcast.Force else Bcast.Never)
      .groupBy(gs: _*).agg(sort_array(collect_list(col("q"))).as("_qs"))
    df.select(gs :+ valueCol.cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
      .join(hint(bounds, bb), groupCols)
      .withColumn("bucket",
        size(filter(col("_qs"), b => col("_v") >= b)).cast("long"))
      .groupBy(gs :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n"),
        round(min(col("_v")), 6).as("lo"),
        round(max(col("_v")), 6).as("hi"))
  }
}
