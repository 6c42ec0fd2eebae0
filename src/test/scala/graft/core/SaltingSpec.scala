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

  test("partial aggregation spreads the hot key over the salt space") {
    val hot = (0 until 1000).map(i => (i.toLong, "HOT")).toDF("doc_id", "text")
    val partials = hot.withColumn("_salt", pmod(xxhash64(col("doc_id")), lit(8)))
      .groupBy("text", "_salt").count()
    assert(partials.count() === 8) // all 8 salt buckets hit
    assert(partials.agg(max("count")).head().getLong(0) < 1000)
  }
}
