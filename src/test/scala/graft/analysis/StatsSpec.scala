package graft.analysis

import org.apache.spark.sql.functions._
import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("quantiles: pinned type-7 interpolation, hand-checked") {
    // group g: values 1..5 → p50 = 3.0; p90: rank 3.6 → 4 + 0.6*(5-4) = 4.6
    // group h: single value → every p returns it
    val df = ((1 to 5).map(v => ("g", v.toDouble)) :+ ("h", 7.0)).toDF("k", "v")
    val out = Stats.quantiles(df, Seq("k"), col("v"), Seq(0.5, 0.9))
      .orderBy("k", "p")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out === Array(
      ("g", 0.5, 3.0), ("g", 0.9, 4.6),
      ("h", 0.5, 7.0), ("h", 0.9, 7.0)))
  }

  test("quantiles: p=0 and p=1 hit the exact min/max") {
    val df = Seq(("g", 2.0), ("g", 9.0), ("g", 4.0)).toDF("k", "v")
    val out = Stats.quantiles(df, Seq("k"), col("v"), Seq(0.0, 1.0))
      .orderBy("p").collect().map(_.getDouble(2))
    assert(out === Array(2.0, 9.0))
  }

  test("quantiles: duplicated values keep the result deterministic") {
    val df = Seq.fill(4)(("g", 5.0)).toDF("k", "v")
    val out = Stats.quantiles(df.repartition(3), Seq("k"), col("v"), Seq(0.25, 0.75))
      .collect().map(_.getDouble(2))
    assert(out === Array(5.0, 5.0))
  }

  test("quantiles: NULL values are dropped before ranking (advisor fix, round 11)") {
    val df = Seq(("g", Option(1.0)), ("g", Option(2.0)), ("g", Option(3.0)),
      ("g", Option.empty[Double]), ("h", Option.empty[Double])).toDF("k", "v")
    val out = Stats.quantiles(df, Seq("k"), col("v"), Seq(0.0, 0.5, 1.0))
      .orderBy("k", "p").collect()
    // g: the null neither ranks first (Spark window default) nor counts
    // into n — quantiles are over the 3 non-null values exactly
    assert(out.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq ===
      Seq(("g", 0.0, 1.0), ("g", 0.5, 2.0), ("g", 1.0, 3.0)))
    // h: all-null group vanishes rather than emitting null quantiles
    assert(!out.exists(_.getString(0) == "h"))
  }

  test("quantiles plan: no full per-group sort — the only data sort is windowed by (group, bin)") {
    val df = Seq(("g", 1.0)).toDF("k", "v")
    val plan = Stats.quantiles(df, Seq("k"), col("v"), Seq(0.5))
      .queryExecution.executedPlan.toString
    // every Sort over _v must be partition-scoped to the crossing bin:
    // its sort key list carries _bin before _v (the (group, bin) window),
    // never a bare (group, _v) global order
    val sortsOnV = plan.linesIterator.filter(l =>
      l.contains("Sort [") && l.contains("_v")).toSeq
    assert(sortsOnV.nonEmpty, s"expected a crossing-bin window sort:\n$plan")
    sortsOnV.foreach { l =>
      assert(l.indexOf("_bin") >= 0 && l.indexOf("_bin") < l.indexOf("_v"),
        s"data sort must be bin-scoped, got: $l\nplan:\n$plan")
    }
    // the needed-bin restriction broadcasts — the corpus never shuffles
    // to meet the metadata-sized locator tables
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  test("quantiles: two-pass crossing-bin plan matches a full-sort reference bit-for-bit") {
    // skewed, tie-heavy data across several groups, awkward bin edges
    val vals = (1 to 4000).map { i =>
      val g = "g" + (i % 3)
      val v = if (i % 7 == 0) 42.0 else ((i * 2654435761L) % 9973L).toDouble / 7.0
      (g, v)
    }
    val df = vals.toDF("k", "v").repartition(5)
    val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0)
    val got = Stats.quantiles(df, Seq("k"), col("v"), ps, nBins = 64)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byG = vals.groupBy(_._1).map { case (g, rows) => g -> rows.map(_._2).sorted }
    for ((g, sorted) <- byG; p <- ps) {
      val rank = p * (sorted.size - 1)
      val lo = math.floor(rank).toInt
      val frac = rank - lo
      val a = sorted(lo)
      val b = if (lo + 1 <= sorted.size - 1) sorted(lo + 1) else a
      val want = BigDecimal(a + (b - a) * frac)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got((g, p)) === want, s"g=$g p=$p")
    }
  }

  test("quantilesSorted == quantiles bit-for-bit (the swap-freely contract)") {
    val vals = (1 to 3000).map { i =>
      ("g" + (i % 4), if (i % 11 == 0) -3.5 else ((i * 1103515245L) % 4999L).toDouble / 3.0)
    }
    val df = vals.toDF("k", "v").repartition(7)
    val ps = Seq(0.0, 0.1, 0.5, 0.95, 1.0)
    val a = Stats.quantiles(df, Seq("k"), col("v"), ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val b = Stats.quantilesSorted(df, Seq("k"), col("v"), ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(a === b)
  }

  // --- weightedQuantiles ---

  test("weightedQuantiles: hand-checked mass thresholds, ties collapse, zero weights never selected") {
    // g: values 1..4 with weights 1,1,2,4 (W=8 -> 8M ticks).
    //   p=0.25 -> t=2M: cum(1)=1M, cum(2)=2M -> q=2
    //   p=0.5  -> t=4M: cum(3)=4M -> q=3
    //   p=1.0  -> t=8M: cum(4)=8M -> q=4
    //   p=0.0  -> t=max(0,1)=1 -> q=1 (smallest positively weighted)
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 2.0), ("g", 4.0, 4.0),
      ("z", 5.0, 0.0)).toDF("k", "v", "w")
    val out = Stats.weightedQuantiles(df, Seq("k"), col("v"), col("w"),
        Seq(0.0, 0.25, 0.5, 1.0))
      .orderBy("k", "p")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out === Array(("g", 0.0, 1.0), ("g", 0.25, 2.0), ("g", 0.5, 3.0), ("g", 1.0, 4.0)))
    // the all-zero-weight group z vanished entirely
  }

  test("weightedQuantiles: uniform weights ~ unweighted rank; reference equality on skewed data") {
    val vals = (1 to 2500).map { i =>
      val g = "g" + (i % 2)
      (g, ((i * 2654435761L) % 8009L).toDouble, (i % 5 + 1).toDouble)
    }
    val df = vals.toDF("k", "v", "w").repartition(6)
    val ps = Seq(0.1, 0.5, 0.9, 0.99)
    val got = Stats.weightedQuantiles(df, Seq("k"), col("v"), col("w"), ps, nBins = 128)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    for (g <- Seq("g0", "g1"); p <- ps) {
      val rows = vals.filter(_._1 == g).map(r => (r._2, math.round(r._3 * 1e6)))
        .groupBy(_._1).map { case (v, xs) => (v, xs.map(_._2).sum) }.toSeq.sortBy(_._1)
      val w = rows.map(_._2).sum
      val t = math.max(p * w, 1.0)
      var cum = 0L
      val want = rows.collectFirst { case (v, cw) if { cum += cw; cum >= t } => v }.get
      assert(got((g, p)) === BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"g=$g p=$p")
    }
  }

  test("weightedQuantiles: negative weight raises at run time") {
    val df = Seq(("g", 1.0, 2.0), ("g", 2.0, -0.5)).toDF("k", "v", "w")
    val e = intercept[Exception] {
      Stats.weightedQuantiles(df, Seq("k"), col("v"), col("w"), Seq(0.5)).collect()
    }
    assert(e.getMessage.contains("negative weight") ||
      Option(e.getCause).exists(_.getMessage.contains("negative weight")))
  }

  test("weightedQuantiles: guard fires on the RAW double — a weight in (-5e-7, 0) " +
    "cannot round to 0 ticks and slip through (advisor fix, round 13)") {
    val df = Seq(("g", 1.0, 2.0), ("g", 2.0, -1e-7)).toDF("k", "v", "w")
    val e = intercept[Exception] {
      Stats.weightedQuantiles(df, Seq("k"), col("v"), col("w"), Seq(0.5)).collect()
    }
    assert(e.getMessage.contains("negative weight") ||
      Option(e.getCause).exists(_.getMessage.contains("negative weight")))
  }

  test("weightedQuantiles: weight beyond the long tick range raises instead of overflowing") {
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1e13)).toDF("k", "v", "w")
    val e = intercept[Exception] {
      Stats.weightedQuantiles(df, Seq("k"), col("v"), col("w"), Seq(0.5)).collect()
    }
    assert(e.getMessage.contains("overflows") ||
      Option(e.getCause).exists(_.getMessage.contains("overflows")))
  }

  test("broadcastBounds = Never: every Stats operator is bit-identical on both plan " +
    "shapes at high group cardinality, with zero broadcast exchanges in the plan") {
    // 2,000 group keys × a handful of rows each — the per-domain/per-user
    // regime where a forced broadcast of the groups × nBins cumulative
    // table is the scale hazard the escape hatch exists for.
    val df = (1 to 12000).map { i =>
      ("d" + (i % 2000), ((i * 2654435761L) % 997L).toDouble, (i % 3 + 1).toDouble)
    }.toDF("k", "v", "w").repartition(8)
    val ps = Seq(0.25, 0.9)
    // disable auto-broadcast so the unhinted shape genuinely shuffles —
    // otherwise Catalyst re-adds the broadcast from size stats and the
    // twin proves nothing
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val hinted = Stats.quantiles(df, Seq("k"), col("v"), ps, 64).collect().toSet
      val plain = Stats.quantiles(df, Seq("k"), col("v"), ps, 64,
        broadcastBounds = Stats.Bcast.Never)
      assert(plain.collect().toSet === hinted)
      val plan = plain.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"escape hatch left a broadcast in the plan:\n$plan")
      val wq = Stats.weightedQuantiles(df, Seq("k"), col("v"), col("w"), ps, 64)
        .collect().toSet
      assert(Stats.weightedQuantiles(df, Seq("k"), col("v"), col("w"), ps, 64,
        broadcastBounds = Stats.Bcast.Never).collect().toSet === wq)
      val win = Stats.winsorize(df, Seq("k"), col("v"), "vw", 0.1, 0.9)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(3))).toSet
      assert(Stats.winsorize(df, Seq("k"), col("v"), "vw", 0.1, 0.9,
          broadcastBounds = Stats.Bcast.Never)
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(3))).toSet === win)
      val hist = Stats.equiDepthHistogram(df, Seq("k"), col("v"), 4).collect().toSet
      assert(Stats.equiDepthHistogram(df, Seq("k"), col("v"), 4,
        broadcastBounds = Stats.Bcast.Never).collect().toSet === hist)
      // the third mode: Force == Auto == Never on values (Auto is the
      // default used in the unsuffixed calls above)
      assert(Stats.quantiles(df, Seq("k"), col("v"), ps, 64,
        broadcastBounds = Stats.Bcast.Force).collect().toSet === hinted)
    }
  }

  test("Bcast.Auto flips the plan on group cardinality: broadcast below the " +
    "threshold, shuffle join above it") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 100 groups — far below AutoBroadcastMaxGroups: hints applied
      val small = spark.range(1000)
        .select((col("id") % 100).as("k"), (col("id") % 17).cast("double").as("v"))
      val planSmall = Stats.quantiles(small, Seq("k"), col("v"), Seq(0.5), 16)
        .queryExecution.executedPlan.toString
      assert(planSmall.contains("BroadcastExchange"), planSmall)
      // 40,000 groups — above the 32,768 threshold: no broadcast anywhere
      val big = spark.range(40000)
        .select(col("id").as("k"), (col("id") % 17).cast("double").as("v"))
      val planBig = Stats.quantiles(big, Seq("k"), col("v"), Seq(0.5), 16)
        .queryExecution.executedPlan.toString
      assert(!planBig.contains("BroadcastExchange"), planBig)
    }
  }

  // --- winsorize ---

  test("winsorize: clips to the exact group quantiles, NULLs stay NULL") {
    val df = ((1 to 100).map(i => ("g", Some(i.toDouble))) :+ ("g", Option.empty[Double]))
      .toDF("k", "v")
    val qs = Stats.quantiles(df, Seq("k"), col("v"), Seq(0.1, 0.9))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val out = Stats.winsorize(df, Seq("k"), col("v"), "vw", 0.1, 0.9).collect()
    assert(out.length === 101)
    out.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2), "null value must stay null")
      else {
        val v = r.getDouble(1); val c = r.getDouble(2)
        assert(c === math.min(math.max(v, qs(0.1)), qs(0.9)), s"v=$v")
      }
    }
    // interior values untouched, tails pinned to the bounds
    val clipped = out.filter(r => !r.isNullAt(1)).map(_.getDouble(2))
    assert(clipped.min === qs(0.1) && clipped.max === qs(0.9))
  }

  test("winsorize plan: bound table broadcasts — the corpus never shuffles for the clip") {
    val df = (1 to 50).map(i => ("g", i.toDouble)).toDF("k", "v")
    val plan = Stats.winsorize(df, Seq("k"), col("v"), "vw", 0.05, 0.95)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }

  // --- robustScale ---

  test("robustScale: (v - median)/IQR against hand-computed bounds; zero-IQR and NULLs gate to NULL") {
    val df = ((1 to 100).map(i => ("g", Some(i.toDouble))) :+ ("g", Option.empty[Double]))
      .toDF("k", "v")
    val qs = Stats.quantiles(df, Seq("k"), col("v"), Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val out = Stats.robustScale(df, Seq("k"), col("v"), "vr").collect()
    assert(out.length === 101)
    out.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2))
      else {
        val v = r.getDouble(1)
        val want = BigDecimal((v - qs(0.5)) / (qs(0.75) - qs(0.25)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(2) === want, s"v=$v")
      }
    }
    // constant group: IQR = 0 -> every scaled value is NULL, rows survive
    val const = Seq.fill(20)(("c", 5.0)).toDF("k", "v")
    val oc = Stats.robustScale(const, Seq("k"), col("v"), "vr").collect()
    assert(oc.length === 20 && oc.forall(_.isNullAt(2)))
  }

  // --- equiDepthHistogram ---

  test("equiDepthHistogram: 1..100 into 4 buckets is a perfect 25/25/25/25") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val h = Stats.equiDepthHistogram(df, Seq("k"), col("v"), 4)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(h === Array(
      (0L, 25L, 1.0, 25.0), (1L, 25L, 26.0, 50.0),
      (2L, 25L, 51.0, 75.0), (3L, 25L, 76.0, 100.0)))
  }

  test("equiDepthHistogram: boundary-equal values go UP; counts always total n") {
    // 8 values, 2 buckets: median boundary = 4.5 interpolated... use ties:
    // all-equal values collapse into the TOP bucket (v >= q for every row)
    val ties = Seq.fill(10)(("g", 7.0)).toDF("k", "v")
    val ht = Stats.equiDepthHistogram(ties, Seq("k"), col("v"), 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ht === Array((1L, 10L)))
    val mixed = (1 to 37).map(i => ("g", (i % 5).toDouble)).toDF("k", "v")
    val total = Stats.equiDepthHistogram(mixed, Seq("k"), col("v"), 3)
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(total === 37L)
  }

  test("equiDepthHistogram drops NULLs, is partitioning-independent, assignment broadcasts") {
    val df = ((1 to 60).map(i => ("a", Some(i.toDouble))) ++
      Seq(("a", Option.empty[Double])) ++
      (1 to 30).map(i => ("b", Some(i * 2.0)))).toDF("k", "v")
    val h1 = Stats.equiDepthHistogram(df, Seq("k"), col("v"), 5).collect().toSet
    val h2 = Stats.equiDepthHistogram(df.repartition(7), Seq("k"), col("v"), 5)
      .collect().toSet
    assert(h1 === h2)
    assert(h1.toSeq.map(r => r.getLong(2)).sum === 90L) // the null never counts
    val plan = Stats.equiDepthHistogram(df, Seq("k"), col("v"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"boundary assignment must broadcast, not shuffle the corpus:\n$plan")
  }

  // --- binnedQuantiles ---

  test("binnedQuantiles: rank error bounded by the crossing bin's mass") {
    // deterministic pseudo-random data (no RNG seed dependence): a
    // lagged multiplicative hash gives a skewed, tie-free value set
    val vals = (1 to 5000).map(i => ("g", ((i * 2654435761L) % 100003L).toDouble))
    val df = vals.toDF("k", "v")
    val ps = Seq(0.1, 0.5, 0.9, 0.99)
    val nBins = 256
    val est = Stats.binnedQuantiles(df, Seq("k"), col("v"), ps, nBins)
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toMap
    val sorted = vals.map(_._2).sorted
    val n = sorted.size
    ps.foreach { p =>
      val q = est(p)
      // rank of the estimate vs the target rank: within one bin's mass
      val target = p * (n - 1)
      val rankLo = sorted.count(_ < q)   // rank range the estimate lands in
      val rankHi = sorted.count(_ <= q)
      // bin mass bound: values span ~100003 over 256 bins; count the
      // actual crossing-bin mass for the strict bound
      val width = (sorted.last - sorted.head) / nBins
      val bin = math.min(((q - sorted.head) / width).toInt, nBins - 1)
      val lo = sorted.head + bin * width
      val mass = sorted.count(x => x >= lo && x < lo + width) + 1
      assert(target >= rankLo - mass && target <= rankHi + mass,
        s"p=$p q=$q target=$target rank=[$rankLo,$rankHi] mass=$mass")
    }
  }

  test("binnedQuantiles: exact on a constant group, tracks quantiles on uniform data") {
    val const = Seq.fill(50)(("c", 7.25)).toDF("k", "v")
    val qc = Stats.binnedQuantiles(const, Seq("k"), col("v"), Seq(0.5)).head()
    assert(qc.getDouble(2) === 7.25)
    // uniform 1..10000: the binned estimate and exact type-7 agree to a
    // fraction of a bin (uniform data makes in-bin interpolation exact
    // up to edge effects)
    val uni = (1 to 10000).map(i => ("u", i.toDouble)).toDF("k", "v")
    val ps = Seq(0.25, 0.5, 0.75)
    val exact = Stats.quantiles(uni, Seq("k"), col("v"), ps)
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toMap
    val binned = Stats.binnedQuantiles(uni, Seq("k"), col("v"), ps, 1024)
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toMap
    ps.foreach { p =>
      assert(math.abs(exact(p) - binned(p)) <= 10000.0 / 1024 + 1,
        s"p=$p exact=${exact(p)} binned=${binned(p)}")
    }
  }

  test("binnedQuantiles: NULLs dropped, partitioning-independent, no per-group sort of the data") {
    val df = ((1 to 500).map(i => ("a", Some((i * 37 % 211).toDouble))) ++
      Seq(("a", Option.empty[Double])) ++
      (1 to 300).map(i => ("b", Some((i * 13 % 97).toDouble)))).toDF("k", "v")
    val q1 = Stats.binnedQuantiles(df, Seq("k"), col("v"), Seq(0.5, 0.9), 64)
      .collect().toSet
    val q2 = Stats.binnedQuantiles(df.repartition(11), Seq("k"), col("v"),
      Seq(0.5, 0.9), 64).collect().toSet
    assert(q1 === q2 && q1.size === 4)
    // the plan must have NO data-sized sort: the only Sort allowed is the
    // window over the <= groups x nBins count table (below both exchanges)
    val plan = Stats.binnedQuantiles(df, Seq("k"), col("v"), Seq(0.5), 64)
      .queryExecution.executedPlan.toString
    val aggBeforeSort = plan.linesIterator.indexWhere(_.contains("HashAggregate")) >= 0
    assert(aggBeforeSort, s"expected aggregation-shaped plan:\n$plan")
  }
}
