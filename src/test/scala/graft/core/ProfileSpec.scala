package graft.core

import java.sql.Timestamp
import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: one row per column with type-appropriate stats") {
    // 2024-01-01T00:00:00Z / 2024-01-02T00:00:00Z as epoch millis — no
    // JVM-default-timezone dependence
    val t1 = new Timestamp(1704067200000L)
    val t2 = new Timestamp(1704153600000L)
    val df = Seq(
      (1L, Option(2.5), "ab", t1),
      (2L, Option.empty[Double], "abcd", t2),
      (2L, Option(4.0), "a", t1)
    ).toDF("id", "x", "s", "t")
    val out = Profile.profile(df).collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("id", "s", "t", "x"))
    val id = out("id")
    assert(id.getAs[Long]("n_rows") === 3L)
    assert(id.getAs[Long]("n_null") === 0L)
    assert(id.getAs[Long]("n_distinct") === 2L)
    assert(id.getAs[Double]("min_num") === 1.0)
    assert(id.getAs[Double]("max_num") === 2.0)
    assert(id.isNullAt(id.fieldIndex("min_len")))
    val x = out("x")
    assert(x.getAs[Long]("n_null") === 1L)
    assert(x.getAs[Long]("n_distinct") === 2L)
    assert(x.getAs[Double]("min_num") === 2.5)
    assert(x.getAs[Double]("max_num") === 4.0)
    val s_ = out("s")
    assert(s_.getAs[Long]("min_len") === 1L)
    assert(s_.getAs[Long]("max_len") === 4L)
    assert(s_.isNullAt(s_.fieldIndex("min_num")))
    val t = out("t")
    assert(t.getAs[Double]("min_num") === 1.7040672e15)
    assert(t.getAs[Double]("max_num") === 1.7041536e15)
    assert(t.getAs[Long]("n_distinct") === 2L)
  }

  test("profile of an empty table: zero counts, null bounds") {
    val out = Profile.profile(Seq.empty[(Long, String)].toDF("id", "s")).collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Long]("n_rows") == 0L))
    assert(out.forall(_.getAs[Long]("n_distinct") == 0L))
    assert(out.forall(r =>
      r.isNullAt(r.fieldIndex("min_num")) && r.isNullAt(r.fieldIndex("min_len"))))
  }

  test("profile rows come back in column-name order") {
    val df = Seq((1, "z")).toDF("zz", "aa")
    assert(Profile.profile(df).collect().map(_.getString(0)).toSeq === Seq("aa", "zz"))
  }

  test("profileApprox: estimates track exact counts; bounds/nulls exact; " +
    "unsupported types get null estimate") {
    import org.apache.spark.sql.functions._
    val df = spark.range(2000)
      .select(col("id"), (col("id") % 37).as("small"),
        concat(lit("s"), (col("id") % 500).cast("string")).as("s"),
        when(col("id") % 10 === 0, lit(null).cast("double"))
          .otherwise(col("id").cast("double") / 4).as("x"),
        array(col("id")).as("arr")) // unsupported type
    val out = Profile.profileApprox(df).collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("arr", "id", "s", "small", "x"))
    // HLL at p=9 has rse ~1.04/sqrt(512) ≈ 4.6%; allow 4 sigma
    def estOf(c: String): Double = out(c).getAs[Double]("distinct_est")
    assert(math.abs(estOf("id") - 2000) <= 2000 * 0.20)
    assert(math.abs(estOf("small") - 37) <= 8)
    assert(math.abs(estOf("s") - 500) <= 500 * 0.20)
    assert(out("x").getAs[Long]("n_null") === 200L)
    assert(out("x").getAs[Double]("max_num") === 1999.0 / 4)
    assert(out("s").getAs[Long]("min_len") === 2L)
    assert(out("s").getAs[Long]("max_len") === 4L)
    assert(out("arr").isNullAt(out("arr").fieldIndex("distinct_est")))
    assert(out("arr").getAs[Long]("n_rows") === 2000L)
  }

  test("profileApprox: numeric distinctness is at 1e-6 tick resolution, " +
    "and an empty table still yields one row per column") {
    import org.apache.spark.sql.functions._
    // two values closer than 1e-6 collapse to one tick
    val df = Seq(1.0000001, 1.00000011, 2.0).toDF("v")
    val est = Profile.profileApprox(df).collect().head.getAs[Double]("distinct_est")
    assert(est === 2.003916) // 2 ticks through the pinned estimator
    val empty = Profile.profileApprox(Seq.empty[(Long, String)].toDF("id", "s")).collect()
    assert(empty.length === 2)
    assert(empty.forall(_.getAs[Long]("n_rows") == 0L))
    assert(empty.forall(_.getAs[Double]("distinct_est") == 0.0))
  }

  test("TIMESTAMP_NTZ bounds are naive-as-UTC micros, session-zone-independent") {
    import org.apache.spark.sql.functions._
    // 2024-01-15 12:00:00 naive → 1705320000000000 µs when read as UTC
    val naiveUs = 1705320000000000L
    val df = spark.range(1)
      .select(to_timestamp_ntz(lit("2024-01-15 12:00:00")).as("tn"))
    def minNum(): Double =
      Profile.profile(df).collect().head.getAs[Double]("min_num")
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "UTC")
      assert(minNum() === naiveUs.toDouble)
      // the round-10 defect: under a non-UTC session zone, the plain
      // NTZ→timestamp cast shifted the bound by the zone offset
      spark.conf.set(tzKey, "America/New_York")
      assert(minNum() === naiveUs.toDouble)
      spark.conf.set(tzKey, "Asia/Kolkata") // non-whole-hour offset
      assert(minNum() === naiveUs.toDouble)
    } finally spark.conf.set(tzKey, saved)
  }
}
