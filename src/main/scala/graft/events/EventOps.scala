package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.core.Salting

/** Batch event-log analytics over the long `events` table: gap-based
  * sessionization and ordered-step funnel analysis — the two classic
  * user-activity operators every telemetry/clickstream pipeline runs
  * before any modeling. Both are single-shuffle by construction: the
  * only exchange is the hash partition on the user key, and every
  * subsequent window/aggregation reuses that partitioning (Spark's
  * `ClusteredDistribution(user, …)` is satisfied by
  * `HashPartitioning(user)`), so at 100 TB the cost is one shuffle of
  * the projected columns, parallelism = user count.
  *
  * All arithmetic is INTEGER epoch-micros end to end — session ids,
  * counts, bounds, and durations are exact BIGINTs, so the DuckDB
  * oracle twins hash-match with no float-rounding surface at all.
  */
object EventOps {

  /** Event time as epoch MICROS (long), branching on the stored type the
    * same way `stream_counts` does: the ns-vintage events.parquet reads
    * as LONG nanos under `nanosAsLong` (→ integer div 1000), the
    * us-vintage reads as timestamp (→ `unix_micros`). Anything else is
    * schema drift and fails loudly rather than as a wrong-but-plausible
    * timeline.
    */
  def eventMicros(events: DataFrame, tsCol: String): Column =
    events.schema(tsCol).dataType match {
      case LongType => expr(s"$tsCol div 1000")
      case TimestampType | TimestampNTZType => unix_micros(col(tsCol).cast("timestamp"))
      case other => throw new IllegalArgumentException(
        s"eventMicros: unsupported $tsCol type $other — expected LONG (nanos " +
          "vintage), TIMESTAMP, or TIMESTAMP_NTZ")
    }

  /** Gap-based sessionization: a user's events sorted by time split into
    * sessions wherever consecutive events are more than `gapUs` micros
    * apart. Returns one row per session: `(user, session_id, n_events,
    * start_us, end_us, dur_us)` with `session_id` numbered 1.. per user
    * in time order.
    *
    * Plan shape: ONE shuffle (the window partition on `userCol`); the
    * session-break flag is a `lag` diff, the session id its running sum
    * over the same window frame, and the per-session rollup reuses the
    * user partitioning — three operators, one exchange. `tieCol` breaks
    * equal-timestamp orderings deterministically (an event id); sessions
    * are unbounded in span by design (a session is CLOSED by a gap, not
    * by length), which is the standard semantics and keeps state
    * row-local.
    */
  def sessionize(events: DataFrame, userCol: String, microsCol: Column,
                 tieCol: String, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col("_tus"), col(tieCol))
    events
      .withColumn("_tus", microsCol)
      .withColumn("_brk",
        when(col("_tus") - lag(col("_tus"), 1).over(w) > gapUs || lag(col("_tus"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("_tus")).as("start_us"),
        max(col("_tus")).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))
  }

  /** Ordered-step funnel: per user, the first time each step type is
    * reached AFTER the previous step's time (`t1 = min t of step1;
    * t2 = min t of step2 with t > t1; …`). Returns one row per user with
    * one nullable epoch-micros column per step plus `reached` = number
    * of leading non-null steps.
    *
    * Plan shape: one shuffle on `userCol`, then a CHAIN of window
    * selects (step k's conditional min references step k-1's column) —
    * all over the same user partitioning, so Spark stacks WindowExec
    * passes with no further exchange, and the final per-user dedup
    * (`groupBy(user).agg(min …)` over per-user-constant columns) reuses
    * it too. Steps are a handful by nature; the chain length is the
    * funnel depth, not the data size.
    */
  def funnel(events: DataFrame, userCol: String, microsCol: Column,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    val w = Window.partitionBy(userCol)
    val base = events.withColumn("_tus", microsCol)
    val named = steps.map(s => s -> s"t_$s")
    val stepped = named.zipWithIndex.foldLeft(base) {
      case (df, ((step, out), i)) =>
        val hit = col(typeCol) === step &&
          (if (i == 0) lit(true) else col("_tus") > col(named(i - 1)._2))
        df.withColumn(out, min(when(hit, col("_tus"))).over(w))
    }
    val reached = named.reverse.foldLeft(lit(0L)) {
      case (tail, (_, out)) => when(col(out).isNotNull, tail + 1L).otherwise(tail)
    }
    // `reached` counts LEADING non-nulls: the fold builds
    // when(t1 set, 1 + when(t2 set, 1 + …)) from the inside out, and a
    // null step k forces t_{k+1} null too (its condition references it),
    // so leading-count = total-count of non-nulls.
    stepped.groupBy(col(userCol))
      .agg(min(col(named.head._2)).as(named.head._2),
        named.tail.map { case (_, out) => min(col(out)).as(out) }: _*)
      .withColumn("reached", reached)
  }

  /** CDC-style latest-record compaction: one row per key tuple holding
    * the payload of that key's LAST event — max `(micros, tieCol)`, so
    * equal-timestamp ties break deterministically. Returns
    * `(keyCols…, last_us, tieCol, valueCols…)`.
    *
    * Plan shape: aggregation-shaped on purpose — `max` of a struct whose
    * leading fields are the ordering and whose tail carries the payload,
    * so it map-side combines and shuffles ONE candidate row per key per
    * partition. The window formulation (`row_number() = 1`) every SQL
    * cookbook reaches for shuffles and sorts EVERY raw row instead; at a
    * 100 TB changelog the struct-max is the difference between a
    * compaction that runs and one that spills.
    */
  def latestSnapshot(events: DataFrame, keyCols: Seq[String], microsCol: Column,
                     tieCol: String, valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "latestSnapshot: at least one key column")
    val carried = tieCol +: valueCols
    events
      .withColumn("_tus", microsCol)
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(col("_tus").as("_tus") +: carried.map(col): _*)).as("_m"))
      .select(keyCols.map(col) ++ (col("_m._tus").as("last_us") +:
        carried.map(c => col(s"_m.$c").as(c))): _*)
  }

  /** Cohort retention: users cohorted by the UTC day of their first
    * event; each cell counts the distinct users of cohort `cohort_day`
    * active `day_offset` days later. Returns
    * `(cohort_day, day_offset, n_users)` with days as integer epoch-day
    * indexes (micros div 86400e6 — exact BIGINTs, like everything here).
    *
    * Plan shape: TWO exchanges total, no join, no window. One groupBy on
    * the user collapses raw events to each user's distinct active-day
    * SET (`collect_set` partial-aggregates, so the map side eats the
    * event volume — at 10M events over 15k users × 30 days that is a
    * ~20× pre-shuffle collapse, growing with per-user event density; the
    * set is bounded by the calendar, ≤ 366 longs per user-year, never by
    * events). The cohort day is then `array_min` of the set — a row-local
    * read, which is what eliminates the separate per-user min aggregation
    * AND the cohort join of the previous shape (three exchanges → two);
    * the final cell count shuffles only the (cohort, offset) grid.
    * Events with a NULL time are ignored (`collect_set` drops nulls); a
    * user with only null times contributes no cell.
    */
  /** Generic backward as-of join: every left row picks up the LATEST
    * right sample per `keyCols` with `right time <= left time` (equal
    * times match — ≤, not <), optionally only when the match is at most
    * `toleranceUs` micros old. Returns all left columns plus each
    * requested right column as `<name><suffix>` and the matched right
    * time as `t<suffix>` — all suffixed columns NULL when no
    * (in-tolerance) sample precedes the row.
    *
    * Plan shape: NO join at all. Both sides union under a source marker
    * and ONE window partitioned on the keys fills every requested column
    * with `last(_, ignoreNulls)` — one shuffle of the projected columns,
    * parallelism = key count, identical cost at any right/left size
    * ratio. This is the scalable shape for the classic time-series
    * enrichment (quotes→trades, sensor→event): a range/inequality join
    * here would plan as BroadcastNestedLoopJoin, and even the
    * bin-bucketed rewrite (RangeJoin) shuffles interval copies — the
    * union-window form moves each row exactly once. (Opset.asof at
    * core/Opset.scala:141 is the per-record signal-table instance of the
    * same construction; this is the keyed event-table generalization
    * with tolerance.)
    *
    * Contract (same as Opset.asof): the right side must have at most one
    * sample per (keys, time) — pre-aggregate ties upstream (e.g. a
    * struct-max winner) or the fill is order-dependent — and its value
    * columns must be NON-NULL (a null right value would hold the
    * previous non-null value forward instead of aligning the null;
    * encode missingness as an absent row or a struct field). Right rows
    * with a NULL time are dropped; a LEFT row with a NULL time sorts
    * before every sample (nulls-first window order) and comes back with
    * null refs — it is kept, not dropped, because the left side is the
    * caller's table. `_t` and `_src` are reserved.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftMicros: Column, rightMicros: Column,
               valueCols: Seq[String], toleranceUs: Long = Long.MaxValue,
               suffix: String = "_ref",
               direction: String = "backward"): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin: at least one key column")
    require(valueCols.nonEmpty, "asofJoin: no right columns requested")
    require(toleranceUs >= 0, "asofJoin: negative tolerance")
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward or forward, got $direction")
    // forward ("earliest right sample AT OR AFTER each left row") is the
    // backward algorithm on NEGATED times — same window, same equal-time
    // inclusivity; only the fill ordering and the age sign flip
    val sign = if (direction == "forward") -1L else 1L
    val outCols = valueCols.map(c => s"$c$suffix")
    val tRef = s"t$suffix"
    val leftCols = left.columns.toSeq
    val clash = leftCols.toSet.intersect((outCols :+ tRef).toSet)
    require(clash.isEmpty,
      s"asofJoin: suffixed column(s) ${clash.toSeq.sorted.mkString(", ")} collide with left schema")
    Salting.requireFreeColumns(left, Seq("_t", "_src"), "asofJoin(left)")
    Salting.requireFreeColumns(right, Seq("_t", "_src"), "asofJoin(right)")
    val keySet = keyCols.toSet
    val r = right.filter(rightMicros.isNotNull)
      .select(keyCols.map(col) ++
        Seq((rightMicros.cast("long") * lit(sign)).as("_t")) ++
        valueCols.map(col): _*)
    // aligned union: right rows sort BEFORE left rows at equal _t
    // (src 0 < 1), so an equal-time right sample is already visible
    val lAligned = left.select(
      leftCols.map(col) ++
        Seq((leftMicros.cast("long") * lit(sign)).as("_t"), lit(1).as("_src")) ++
        valueCols.zip(outCols).map { case (v, o) =>
          lit(null).cast(r.schema(v).dataType).as(o) } :+
        lit(null).cast("long").as(tRef): _*)
    val rAligned = r.select(
      keyCols.map(col) ++
        leftCols.filterNot(keySet).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("_t"), lit(0).as("_src")) ++
        valueCols.zip(outCols).map { case (v, o) => col(v).as(o) } :+
        (col("_t") * lit(sign)).as(tRef): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = (outCols :+ tRef).foldLeft(lAligned.unionByName(rAligned)) {
      (d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    // tolerance: age = signed-time difference, non-negative by
    // construction in BOTH directions (t_ref carries the TRUE right time
    // while _t is the signed sort key: lt = sign*_t), so the comparison
    // never overflows even at the MaxValue default
    val keep = col(tRef).isNotNull &&
      (col("_t") - lit(sign) * col(tRef)) <= lit(toleranceUs)
    val gated = (outCols :+ tRef).foldLeft(filled) { (d, c) =>
      d.withColumn(c, when(keep, col(c))) }
    gated.filter(col("_src") === 1).drop("_t", "_src")
  }

  def retention(events: DataFrame, userCol: String, microsCol: Column): DataFrame = {
    val daySets = events
      .select(col(userCol), microsCol.as("_tus"))
      .select(col(userCol), expr("_tus div 86400000000").as("_day"))
      .groupBy(col(userCol)).agg(collect_set(col("_day")).as("_days"))
    daySets
      .select(array_min(col("_days")).as("_c0"), explode(col("_days")).as("_day"))
      .groupBy(col("_c0").as("cohort_day"),
        (col("_day") - col("_c0")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
