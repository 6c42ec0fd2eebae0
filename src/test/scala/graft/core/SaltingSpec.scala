package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted dedup equals the plain groupBy result under heavy skew") {
    // one hot key with 5000 rows, 50 cold keys with a handful each
    val hot = (0 until 5000).map(i => (i.toLong, "HOT"))
    val cold = (0 until 50).flatMap(k => (0 until 3).map(j => (10000L + k * 10 + j, s"cold_$k")))
    val df = (hot ++ cold).toDF("doc_id", "text")

    val salted = Salting.saltedDedupExact(df, "doc_id", Seq("text"), salts = 8)
      .select("doc_id", "dup_count").as[(Long, Long)].collect().toMap
    val plain = df.groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
      .select("doc_id", "dup_count").as[(Long, Long)].collect().toMap

    assert(salted === plain)
    assert(salted(0L) === 5000L) // hot key winner id 0, full count recovered
  }

  test("dropOverCap: unhit returns the input plan unchanged; firing drops whole groups") {
    val df = ((1 to 40).map(i => (i.toLong, "mega")) ++
      Seq((101L, "small"), (102L, "small"), (103L, "lone"))).toDF("id", "k")
    // unhit: the SAME DataFrame reference comes back — zero plan overhead
    val unhit = Salting.dropOverCap(df, Seq("k"), cap = 100, what = "spec")
    assert(unhit eq df)
    // firing: the over-cap group vanishes entirely; under-cap groups intact
    val kept = Salting.dropOverCap(df, Seq("k"), cap = 10, what = "spec")
      .select("id").as[Long].collect().toSet
    assert(kept === Set(101L, 102L, 103L))
    // cap boundary is strict >: a group of exactly `cap` rows survives
    val atCap = Salting.dropOverCap(df, Seq("k"), cap = 40, what = "spec")
      .select("id").as[Long].collect().toSet
    assert(atCap.size === 43)
  }

  test("dropOverCap: cap fires are recorded in the census registry, unhit runs are not") {
    val df = ((1 to 40).map(i => (i.toLong, "mega")) ++
      Seq((101L, "small"), (102L, "small"))).toDF("id", "k")
    Salting.clearDropEvents()
    Salting.dropOverCap(df, Seq("k"), cap = 100, what = "regspec-quiet")
    assert(Salting.recordedDropEvents.isEmpty)
    Salting.dropOverCap(df, Seq("k"), cap = 10, what = "regspec-fire").count()
    val fired = Salting.recordedDropEvents
    assert(fired.size === 1)
    assert(fired.head === Salting.DropEvent("regspec-fire", 1L, 40L))
    Salting.clearDropEvents()
  }

  test("dropOverCap == independent size-filter formulation on generated skewed data") {
    // seeded generator: Zipf-ish key skew (key j gets ~N/j rows) so caps
    // land strictly inside the size distribution, not at its edges
    import org.scalacheck.{Gen, rng}
    def sampled[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, rng.Seed(seed + i)))
    val genKey = Gen.frequency((1 to 12).map(j => (120 / j, Gen.const(s"k$j"))): _*)
    val rows = sampled(genKey, 600, 42L).zipWithIndex.map { case (k, i) => (i.toLong, k) }
    val df = rows.toDF("id", "k")
    for (cap <- Seq(1, 7, 40, 150, 1000)) {
      val got = Salting.dropOverCap(df, Seq("k"), cap, s"prop cap=$cap")
        .select("id").as[Long].collect().toSet
      val sizes = rows.groupBy(_._2).map { case (k, rs) => k -> rs.size }
      val want = rows.filter { case (_, k) => sizes(k) <= cap }.map(_._1).toSet
      assert(got === want, s"cap=$cap")
    }
  }

  test("salted dedup == plain groupBy on generated corpora (any skew, any salts)") {
    import org.scalacheck.{Gen, rng}
    def sampled[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, rng.Seed(seed + i)))
    val genText = Gen.frequency(
      5 -> Gen.const("HOT"),
      3 -> Gen.oneOf("a", "b", "c"),
      2 -> Gen.alphaNumStr.map(_.take(6)),
    )
    for ((seed, salts) <- Seq((1L, 1), (2L, 3), (3L, 32))) {
      val df = sampled(genText, 400, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val salted = Salting.saltedDedupExact(df, "doc_id", Seq("text"), salts)
        .select("doc_id", "dup_count").as[(Long, Long)].collect().toMap
      val plain = df.groupBy("text")
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
        .select("doc_id", "dup_count").as[(Long, Long)].collect().toMap
      assert(salted === plain, s"seed=$seed salts=$salts")
    }
  }

  test("skewJoin == plain inner join on hot-keyed data, at any salt count") {
    // one viral key with 2000 rows, a long tail of singletons
    val left = ((1 to 2000).map(i => (42L, i.toLong)) ++
      (1 to 200).map(i => (i.toLong + 100, i.toLong))).toDF("k", "seq")
    val right = (1 to 300).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val plain = left.join(right, Seq("k")).collect().toSet
    for (salts <- Seq(1, 4, 16)) {
      val salted = Salting.skewJoin(left, right, Seq("k"),
        Seq(col("k"), col("seq")), salts).collect().toSet
      assert(salted === plain, s"salts=$salts")
    }
  }

  test("skewJoin spreads the hot key's rows over the salt space") {
    val left = (1 to 1000).map(i => (42L, i.toLong)).toDF("k", "seq")
    val spread = left
      .withColumn("_salt", pmod(xxhash64(col("k"), col("seq")), lit(8)).cast("int"))
      .groupBy("_salt").count()
    assert(spread.count() === 8)
    assert(spread.agg(max("count")).head().getLong(0) < 1000)
  }

  test("partial aggregation spreads the hot key over the salt space") {
    val hot = (0 until 1000).map(i => (i.toLong, "HOT")).toDF("doc_id", "text")
    val partials = hot.withColumn("_salt", pmod(xxhash64(col("doc_id")), lit(8)))
      .groupBy("text", "_salt").count()
    assert(partials.count() === 8) // all 8 salt buckets hit
    assert(partials.agg(max("count")).head().getLong(0) < 1000)
  }

  test("reserved working-column names FAIL instead of silently changing results") {
    val withSalt = Seq((1L, 0)).toDF("k", "_salt")
    val plain = Seq((1L, 2L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Salting.skewJoin(withSalt, plain, Seq("k"), Seq(col("k")), 4)
    }
    intercept[IllegalArgumentException] {
      Salting.skewJoin(plain, withSalt, Seq("k"), Seq(col("k")), 4)
    }
    intercept[IllegalArgumentException] {
      Salting.saltedAggregate(withSalt, Seq("k"), col("k"), 4,
        Seq(count(lit(1)).as("_c")), Seq(sum(col("_c")).as("n")))
    }
    intercept[IllegalArgumentException] {
      TopK.perKey(Seq((1L, 2L, 3L)).toDF("k", "_rn", "v"), Seq("k"), Seq(col("v")), 2)
    }
    intercept[IllegalArgumentException] { // an existing `rank` would be overwritten
      TopK.perKey(Seq((1L, 2L, 3L)).toDF("k", "rank", "v"), Seq("k"), Seq(col("v")), 2)
    }
  }
}
