package graft.analysis

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** Reference md5-prefix hash, mirroring Dedup.md5Hash32. */
  private def refHash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("hllRegisters matches a per-key reference computation") {
    val keys = (1 to 200).map(i => s"k$i")
    val regs = Sketches.hllRegisters(keys.map(("g", _)).toDF("g", "k"), Seq("g"), col("k"), p = 9)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val expected = keys.map(refHash).groupBy(_ >> 23).map { case (b, hs) =>
      b -> hs.map { h =>
        val rem = h & ((1L << 23) - 1)
        if (rem == 0) 24 else 24 - java.lang.Long.toBinaryString(rem).length
      }.max
    }
    assert(regs === expected)
  }

  test("hllRegisters ignores NULL keys (advisor fix, round 11)") {
    val df = Seq(("g", Option("a")), ("g", Option("b")), ("g", Option.empty[String]))
      .toDF("g", "k")
    val withNull = Sketches.hllRegisters(df, Seq("g"), col("k"), p = 9).collect()
    val without = Sketches.hllRegisters(df.filter(col("k").isNotNull),
      Seq("g"), col("k"), p = 9).collect()
    assert(withNull.toSet === without.toSet, "a null key must not mint a register row")
    assert(withNull.forall(!_.anyNull))
  }

  test("estimate lands within the published error band on 20k distinct keys") {
    val df = (1 to 20000).map(i => ("g", s"key-$i")).toDF("g", "k")
    val est = Sketches.hll(df, Seq("g"), col("k"), 9)
      .select("distinct_est").as[Double].head()
    // rse ≈ 1.04/√512 = 4.6%; allow 3σ
    assert(math.abs(est - 20000) / 20000.0 < 0.14, s"est=$est")
  }

  test("linear-counting branch engages for tiny cardinalities") {
    val df = (1 to 40).map(i => ("g", s"x$i")).toDF("g", "k")
    val row = Sketches.hll(df, Seq("g"), col("k"), 9).head()
    assert(row.getAs[Long]("zeros") > 400L)
    assert(math.abs(row.getAs[Double]("distinct_est") - 40.0) < 6.0)
  }

  test("register merge equals the sketch of the unioned data") {
    val a = (1 to 500).map(i => ("g", s"k$i")).toDF("g", "k")
    val b = (300 to 900).map(i => ("g", s"k$i")).toDF("g", "k")
    val merged = Sketches.hllEstimate(
      Sketches.hllMergeRegisters(
        Seq(Sketches.hllRegisters(a, Seq("g"), col("k")),
          Sketches.hllRegisters(b, Seq("g"), col("k"))), Seq("g")), Seq("g"))
    val direct = Sketches.hll(a.unionAll(b), Seq("g"), col("k"))
    assert(merged.collect().toSeq === direct.collect().toSeq)
  }

  test("duplicate keys do not move the sketch") {
    val once = (1 to 1000).map(i => ("g", s"k$i"))
    val e1 = Sketches.hll(once.toDF("g", "k"), Seq("g"), col("k")).collect().toSeq
    val e2 = Sketches.hll((once ++ once ++ once).toDF("g", "k"), Seq("g"), col("k"))
      .collect().toSeq
    assert(e1 === e2)
  }

  test("plan: both aggregations map-side combine; shuffles carry register rows only") {
    val df = (1 to 100).map(i => ("g", s"k$i")).toDF("g", "k")
    val plan = Sketches.hll(df, Seq("g"), col("k")).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 2, s"plan:\n$plan")
  }

  test("bloom: zero false negatives; disjoint keys mostly rejected") {
    val build = (1 to 1000).map(i => Tuple1(s"in-$i")).toDF("k")
    val words = Sketches.bloomWords(build, col("k"), mBits = 16384, k = 4)
    val probeIn = Sketches.bloomProbe(build, col("k"), "hit", words, 16384, 4)
    assert(probeIn.filter(!col("hit")).count() === 0L, "a false negative breaks the contract")
    val out = (1 to 1000).map(i => Tuple1(s"out-$i")).toDF("k")
    val fp = Sketches.bloomProbe(out, col("k"), "hit", words, 16384, 4)
      .filter(col("hit")).count()
    // fp rate ≈ (1 - e^{-kn/m})^k ≈ 4.4% at n=1000, m=16384, k=4; 3x slack
    assert(fp < 150, s"false-positive rate implausibly high: $fp/1000")
  }

  test("bloom probe keeps every input column and adds only the verdict") {
    val build = Seq(Tuple1("a")).toDF("k")
    val words = Sketches.bloomWords(build, col("k"), 320, 2)
    val probe = Seq(("a", 1L), ("b", 2L)).toDF("k", "payload")
    val out = Sketches.bloomProbe(probe, col("k"), "hit", words, 320, 2)
    assert(out.columns.toSeq === Seq("k", "payload", "hit"))
    val m = out.collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(m("a") === true)
  }

  test("cms never undercounts; exact at generous width; estimates track truth") {
    val rnd = new scala.util.Random(3)
    // Zipf-ish: key i appears ~ 1000/i times
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"key-$i"))
    val df = rows.map(Tuple1(_)).toDF("k")
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val counters = Sketches.cmsCounters(df, col("k"), width = 64, depth = 4)
    val est = Sketches.cmsEstimate(truth.keys.toSeq.map(Tuple1(_)).toDF("k"),
        col("k"), "est", counters, 64, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"$k undercounted: ${est(k)} < $t")
    }
    // generous width → no collisions → exact
    val wide = Sketches.cmsCounters(df, col("k"), width = 4096, depth = 4)
    val exact = Sketches.cmsEstimate(truth.keys.toSeq.map(Tuple1(_)).toDF("k"),
        col("k"), "est", wide, 4096, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact === truth)
  }

  test("cms weighted build == per-instance build") {
    val inst = (1 to 500).map(i => Tuple1(s"k${i % 23}")).toDF("k")
    val grouped = inst.groupBy("k").count()
    val a = Sketches.cmsCounters(inst, col("k"), 64, 4).collect().toSet
    val b = Sketches.cmsCountersWeighted(grouped, col("k"), col("count"), 64, 4)
      .collect().toSet
    assert(a === b)
  }

  test("cms counters merge by sum: merged == sketch of the union") {
    val a = (1 to 400).map(i => Tuple1(s"k${i % 37}")).toDF("k")
    val b = (1 to 300).map(i => Tuple1(s"k${i % 11}")).toDF("k")
    val merged = Sketches.cmsMerge(Seq(
      Sketches.cmsCounters(a, col("k"), 64, 3),
      Sketches.cmsCounters(b, col("k"), 64, 3)))
    val direct = Sketches.cmsCounters(a.unionAll(b), col("k"), 64, 3)
    assert(merged.collect().toSet === direct.collect().toSet)
  }

  test("bloom word tables merge by bit_or: merged == filter of the union") {
    val a = (1 to 60).map(i => Tuple1(s"x$i")).toDF("k")
    val b = (40 to 100).map(i => Tuple1(s"x$i")).toDF("k") // overlapping halves
    val merged = Sketches.bloomMerge(Seq(
      Sketches.bloomWords(a, col("k"), 640, 3),
      Sketches.bloomWords(b, col("k"), 640, 3)))
    val direct = Sketches.bloomWords(a.unionAll(b), col("k"), 640, 3)
    assert(merged.collect().toSet === direct.collect().toSet)
  }

  test("bloom probe plan: broadcast lookups only, no shuffle on the probe side") {
    val build = (1 to 100).map(i => Tuple1(s"x$i")).toDF("k")
    val words = Sketches.bloomWords(build, col("k"), 3200, 4)
    val probe = (1 to 50).map(i => Tuple1(s"y$i")).toDF("k")
    val plan = Sketches.bloomProbe(probe, col("k"), "hit", words, 3200, 4)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length === 4, s"plan:\n$plan")
    // the only exchanges allowed are inside the broadcast (filter build) side
    assert(!plan.contains("SortMergeJoin"), s"probe must never co-shuffle:\n$plan")
  }
}
