package graft.events

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  // (user, event_id, micros): user 1 has two sessions split by a >10-gap,
  // user 2 one single-event session, user 3 exact-gap boundary (NOT split)
  private def ev = Seq(
    (1L, 1L, 100L), (1L, 2L, 105L), (1L, 3L, 200L), (1L, 4L, 203L),
    (2L, 5L, 50L),
    (3L, 6L, 10L), (3L, 7L, 20L)
  ).toDF("user_id", "event_id", "tus")

  test("sessionize: gap splits, boundary gap does not, ids number in time order") {
    val out = EventOps.sessionize(ev, "user_id", col("tus"), "event_id", gapUs = 10L)
      .orderBy("user_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out === Array(
      (1L, 1L, 2L, 100L, 105L, 5L),   // 100,105 (gap 5 ≤ 10 holds)
      (1L, 2L, 2L, 200L, 203L, 3L),   // 200,203 after the 95 gap
      (2L, 1L, 1L, 50L, 50L, 0L),
      (3L, 1L, 2L, 10L, 20L, 10L)))   // gap == gapUs is NOT a break (strict >)
  }

  test("sessionize is partitioning-independent") {
    val a = EventOps.sessionize(ev, "user_id", col("tus"), "event_id", 10L)
      .collect().toSet
    val b = EventOps.sessionize(ev.repartition(7), "user_id", col("tus"), "event_id", 10L)
      .collect().toSet
    assert(a === b)
  }

  test("funnel: steps must advance in time; reached counts leading hits") {
    val e = Seq(
      // user 1: full funnel in order
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L),
      // user 2: click BEFORE the first view — step 2 unreached
      (2L, "click", 5L), (2L, "view", 10L),
      // user 3: view+click, the buy ties click's time (strict >: unreached)
      (3L, "view", 1L), (3L, "click", 7L), (3L, "buy", 7L),
      // user 4: no step-1 event at all
      (4L, "buy", 3L)
    ).toDF("user_id", "event_type", "tus")
    val out = EventOps.funnel(e, "user_id", col("tus"), "event_type",
        Seq("view", "click", "buy"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
    assert(out === Array(
      (1L, Some(10L), Some(20L), Some(30L), 3L),
      (2L, Some(10L), None, None, 1L),
      (3L, Some(1L), Some(7L), None, 2L),
      (4L, None, None, None, 0L)))
  }

  test("sessionize plan: exactly one exchange (window + rollup share the user hash)") {
    val plan = EventOps.sessionize(ev, "user_id", col("tus"), "event_id", 10L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 shuffle, plan:\n$plan")
  }

  test("funnel plan: exactly one exchange for the whole step chain") {
    val e = Seq((1L, "view", 10L)).toDF("user_id", "event_type", "tus")
    val plan = EventOps.funnel(e, "user_id", col("tus"), "event_type",
        Seq("view", "click", "buy"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 shuffle, plan:\n$plan")
  }

  // one day = 86_400_000_000 µs; users cohort by first-event day
  private val Day = 86400000000L

  test("retention: cohort by first-event day, distinct users per offset cell") {
    val e = Seq(
      // user 1: first on day 0, active days 0, 0 (twice), 2
      (1L, 0L), (1L, 10L), (1L, 2 * Day + 5),
      // user 2: first on day 0, active day 1
      (2L, 100L), (2L, Day + 3),
      // user 3: first on day 1 only
      (3L, Day + 50L)
    ).toDF("user_id", "tus")
    val out = EventOps.retention(e, "user_id", col("tus"))
      .orderBy("cohort_day", "day_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array(
      (0L, 0L, 2L),  // users 1, 2 on their first day
      (0L, 1L, 1L),  // user 2
      (0L, 2L, 1L),  // user 1
      (1L, 0L, 1L))) // user 3's cohort
  }

  test("retention is partitioning-independent") {
    val e = Seq((1L, 0L), (1L, Day), (2L, 5L)).toDF("user_id", "tus")
    assert(EventOps.retention(e, "user_id", col("tus")).collect().toSet ===
      EventOps.retention(e.repartition(7), "user_id", col("tus")).collect().toSet)
  }

  test("latestSnapshot keeps the max-(time, tie) payload per key") {
    val e = Seq(
      (1L, "a", 10L, 100L, 1.0), (1L, "a", 20L, 101L, 2.0), // later ts wins
      (1L, "b", 5L, 102L, 3.0),
      (2L, "a", 20L, 103L, 4.0), (2L, "a", 20L, 104L, 5.0)  // ts tie: max id wins
    ).toDF("user_id", "event_type", "tus", "event_id", "value")
    val out = EventOps.latestSnapshot(e, Seq("user_id", "event_type"),
        col("tus"), "event_id", Seq("value"))
      .orderBy("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out === Array(
      (1L, "a", 20L, 101L, 2.0),
      (1L, "b", 5L, 102L, 3.0),
      (2L, "a", 20L, 104L, 5.0)))
  }

  test("latestSnapshot plan: aggregation-shaped, no window sort") {
    val e = Seq((1L, "a", 10L, 100L, 1.0))
      .toDF("user_id", "event_type", "tus", "event_id", "value")
    val plan = EventOps.latestSnapshot(e, Seq("user_id", "event_type"),
        col("tus"), "event_id", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no WindowExec, plan:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, s"plan:\n$plan")
  }

  test("retention plan: aggregation-shaped — no window, first agg combines map-side") {
    val e = Seq((1L, 0L)).toDF("user_id", "tus")
    val plan = EventOps.retention(e, "user_id", col("tus"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"the cohort min must be an aggregation, not a per-user sort:\n$plan")
    // the (user, day) collapse must run partial+final (map-side combine
    // eats the event volume before the only data-sized exchange)
    assert("HashAggregate".r.findAllIn(plan).length >= 4, s"plan:\n$plan")
  }

  // --- asofJoin ---

  private def trades = Seq(
    (1L, 10L, 100L), (1L, 11L, 150L), (1L, 12L, 199L), (1L, 13L, 300L),
    (2L, 20L, 50L),
    (3L, 30L, 10L)
  ).toDF("user_id", "trade_id", "tus")

  private def quotes = Seq(
    (1L, 100L, 7L), (1L, 150L, 8L), (1L, 200L, 9L),
    (2L, 60L, 5L)
    // user 3: no quotes at all
  ).toDF("user_id", "qus", "px")

  test("asofJoin: latest sample at or before each row; equal times match; no-sample rows null") {
    val out = EventOps.asofJoin(trades, quotes, Seq("user_id"),
        col("tus"), col("qus"), Seq("px"))
      .orderBy("trade_id")
      .select("trade_id", "px_ref", "t_ref")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(out === Array(
      (10L, Some(7L), Some(100L)),   // equal time matches (≤, not <)
      (11L, Some(8L), Some(150L)),
      (12L, Some(8L), Some(150L)),   // 199 < 200: the later quote not visible
      (13L, Some(9L), Some(200L)),
      (20L, None, None),             // user 2's quote is in the future
      (30L, None, None)))            // user 3 has no quotes
  }

  test("asofJoin tolerance nulls out stale matches") {
    val out = EventOps.asofJoin(trades, quotes, Seq("user_id"),
        col("tus"), col("qus"), Seq("px"), toleranceUs = 60L)
      .orderBy("trade_id")
      .select("trade_id", "px_ref")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    // trade 13 at 300 matched quote at 200: age 100 > 60 → null
    assert(out.toMap === Map(10L -> Some(7L), 11L -> Some(8L), 12L -> Some(8L),
      13L -> None, 20L -> None, 30L -> None))
  }

  test("asofJoin is partitioning-independent and join-free (one exchange)") {
    val a = EventOps.asofJoin(trades, quotes, Seq("user_id"),
        col("tus"), col("qus"), Seq("px")).collect().toSet
    val b = EventOps.asofJoin(trades.repartition(7), quotes.repartition(5),
        Seq("user_id"), col("tus"), col("qus"), Seq("px")).collect().toSet
    assert(a === b)
    val plan = EventOps.asofJoin(trades, quotes, Seq("user_id"),
        col("tus"), col("qus"), Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofJoin must not plan a join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      s"expected ONE exchange (the key window):\n$plan")
  }

  test("asofJoin forward: earliest sample at or after each row; tolerance gates") {
    val out = EventOps.asofJoin(trades, quotes, Seq("user_id"),
        col("tus"), col("qus"), Seq("px"), direction = "forward")
      .orderBy("trade_id")
      .select("trade_id", "px_ref", "t_ref")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(out === Array(
      (10L, Some(7L), Some(100L)),   // equal time matches forward too
      (11L, Some(8L), Some(150L)),
      (12L, Some(9L), Some(200L)),   // the NEXT quote, 1 us ahead
      (13L, None, None),             // nothing after 300
      (20L, Some(5L), Some(60L)),    // forward finds user 2's future quote
      (30L, None, None)))
    val tol = EventOps.asofJoin(trades, quotes, Seq("user_id"),
        col("tus"), col("qus"), Seq("px"), toleranceUs = 5L, direction = "forward")
      .orderBy("trade_id").select("trade_id", "px_ref")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    // user 2's match is 10 us ahead: over the 5 us tolerance
    assert(tol.toMap === Map(10L -> Some(7L), 11L -> Some(8L), 12L -> Some(9L),
      13L -> None, 20L -> None, 30L -> None))
  }

  test("asofJoin drops null right times and rejects colliding/reserved names") {
    val qn = Seq((1L, Option.empty[Long], 99L), (1L, Some(100L), 7L))
      .toDF("user_id", "qus", "px")
    val out = EventOps.asofJoin(trades.filter(col("trade_id") === 10L), qn,
        Seq("user_id"), col("tus"), col("qus"), Seq("px"))
      .select("px_ref").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(7L))
    intercept[IllegalArgumentException] {
      EventOps.asofJoin(trades.withColumn("px_ref", lit(1)), quotes,
        Seq("user_id"), col("tus"), col("qus"), Seq("px"))
    }
    intercept[IllegalArgumentException] {
      EventOps.asofJoin(trades.withColumn("_src", lit(1)), quotes,
        Seq("user_id"), col("tus"), col("qus"), Seq("px"))
    }
  }
}
